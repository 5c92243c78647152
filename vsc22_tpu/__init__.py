"""vsc22_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video copy detection framework.

A from-scratch rebuild of the capabilities of the VSC 2022 winning submission
(FeipengMa6/VSC22-Submission, 1st place on both the Descriptor and Matching
tracks), re-designed TPU-first:

- descriptors: Flax backbones (ViT+GeM, SwinV2+GeM, CLIP) run as large batched
  bf16 forward passes on the MXU;
- retrieval: the FAISS inner-product index is replaced by sharded GEMM + top-k
  over a `jax.sharding.Mesh`;
- score normalization, similarity maps and temporal alignment are pure array
  programs (`lax.scan` wavefronts) instead of numba/tslearn/networkx;
- training: global-batch contrastive InfoNCE whose cross-device all-gather is
  induced by sharding annotations under `jax.jit`;
- the host runtime (frame store, decode, submission I/O) lives in
  `vsc22_tpu.data` with native C++ components where the reference used
  LMDB/ffmpeg/OpenCV.

Layer map mirrors SURVEY.md §1 of the reference analysis.
"""

__version__ = "0.1.0"

# Keep freed pages resident: the serving hosts fault fresh pages in at
# ~140 MB/s, so glibc's munmap-on-free made every large numpy temp a
# page-fault storm (see utils/hostmem.py). Applied at import so every
# entry point (pipelines, bench, eval scripts) benefits.
from vsc22_tpu.utils.hostmem import tune_host_allocator as _tune_host_allocator

_tune_host_allocator()

from vsc22_tpu.core.types import (  # noqa: F401
    CandidatePair,
    Match,
    PairMatch,
    PairMatches,
    VideoFeature,
    VideoMetadata,
)
from vsc22_tpu.core.storage import load_features, store_features  # noqa: F401
