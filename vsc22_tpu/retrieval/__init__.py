"""Retrieval core: similarity search over the device mesh (FAISS replacement).

The reference delegates k-NN and adaptive range search to FAISS
(D1/infer/vsc/{index,exhaustive_search}.py). Here the same contracts are
implemented TPU-natively:

- descriptors are packed into dense device arrays (`packed.PackedFeatures`);
- similarity is a tiled bf16/f32 GEMM on the MXU;
- "global-k budget" search (the VSC-rules retrieval mode) is an exact global
  top-k over the Q×R similarity matrix, computed by per-tile `lax.top_k`
  + adaptive-threshold refinement (`search.global_topk_search`);
- plain k-NN is per-row `lax.top_k` (`search.knn_search`);
- multi-chip: reference shards ride the mesh's data axis via `shard_map`,
  local top-k results are all-gathered and re-reduced.
"""

from vsc22_tpu.retrieval.index import (  # noqa: F401
    CandidateGeneration,
    MaxScoreAggregation,
    VideoIndex,
)
from vsc22_tpu.retrieval.packed import PackedFeatures  # noqa: F401
from vsc22_tpu.retrieval.search import global_topk_search, knn_search  # noqa: F401
