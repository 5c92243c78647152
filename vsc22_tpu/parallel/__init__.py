"""Device-mesh parallelism utilities (the NCCL/DDP replacement).

The reference's distributed runtime is torch.distributed + NCCL (SURVEY §2.8):
DDP data parallelism, a packed all_gather for the global contrastive loss,
DistributedSampler data sharding, and rank-0 npz shard merges. Here the same
roles are played by `jax.sharding`:

- a global `Mesh` with ``data`` (batch / reference-corpus rows) and ``model``
  (tensor-parallel) axes;
- batch sharding via NamedSharding on the data axis — the cross-device
  embedding gather of the global InfoNCE loss is *induced* by computing the
  full similarity matrix under jit (XLA inserts the all-gather over ICI);
- parameter tensor-sharding rules for the wide transformer GEMMs;
- `shard_map` where explicit per-device control is needed (retrieval top-k).
"""

from vsc22_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    infer_param_spec,
    param_shardings,
    replicated,
)
