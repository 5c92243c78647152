"""Mesh construction and sharding-rule inference.

TPU mapping: the ``data`` axis is laid out over the slower/outer dimension and
``model`` over the inner dimension so tensor-parallel collectives
(all-reduce of activation shards inside every block) ride the fastest ICI
links, while data-parallel gradient reductions amortize over the step.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Create a mesh over all (or the given) devices.

    Defaults to a 1-D data mesh (model axis of size 1) which is the right
    layout for the ≤200M-param descriptor models — they fit per-chip, so
    tensor parallelism is opt-in via an explicit shape like (4, 2).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    return Mesh(devices.reshape(shape), axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Tensor-parallel parameter rules for the transformer backbones.
#
# Megatron-style: the QKV / MLP-up projections are column-sharded (output dim
# over 'model'), the attention-out / MLP-down projections are row-sharded
# (input dim over 'model'); XLA inserts the block-level all-reduces. Anything
# not matched is replicated. Rules are name-based so they apply to any of our
# Flax backbones without touching model code.
# ---------------------------------------------------------------------------

# Kernels named .../<tag>/kernel (Dense) or .../<tag>_kernel (flat Mlp params).
_COL_SHARDED = ("qkv", "fc1", "proj")  # 'proj' = GeM head 1x1 projection
_ROW_SHARDED = ("fc2",)  # (attn/proj also row-shards, matched via 'proj' col first)


def infer_param_spec(path: Tuple[str, ...], value) -> P:
    """Map a parameter path to a PartitionSpec over the 'model' axis."""
    name = "/".join(str(p) for p in path)
    ndim = getattr(value, "ndim", 0)
    if ndim < 2 or not name.endswith("kernel"):
        return P()  # biases, norms, embeddings: replicated
    if any(f"{tag}/kernel" in name or name.endswith(f"{tag}_kernel") for tag in _ROW_SHARDED) or (
        "attn/proj/kernel" in name
    ):
        spec = [None] * ndim
        spec[-2] = "model"
        return P(*spec)
    if any(f"{tag}/kernel" in name or name.endswith(f"{tag}_kernel") for tag in _COL_SHARDED):
        spec = [None] * ndim
        spec[-1] = "model"
        return P(*spec)
    return P()


def param_shardings(mesh: Mesh, params):
    """Build a NamedSharding pytree for a parameter pytree.

    With a size-1 (or absent) 'model' axis every spec degenerates to
    replication, so the same code path serves pure data parallelism.
    """
    if "model" not in mesh.axis_names or mesh.shape.get("model", 1) == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def to_sharding(path, value):
        spec = infer_param_spec(tuple(k.key for k in path), value)
        # Only shard dims that divide evenly; otherwise replicate.
        for dim, ax in enumerate(spec):
            if ax is not None and value.shape[dim] % mesh.shape["model"]:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)
