"""Temporal alignment: copied-segment localization over frame-sim matrices.

Parity targets (reference, for cross-checking — original implementations):
  - DTW/DP/TN/HV algorithms:  D1/infer/vcsl/vta.py:130-429
  - Localization glue:        D1/infer/vsc/baseline/localization.py:38-95

The reference delegates to numba (DP fill), tslearn (DTW), networkx (TN
longest path) and a multiprocessing pool. Here the dense matrix fills are
formulated as row scans with an associative prefix trick (vectorizable, and
JAX-scannable on device), graph work is a topological-order longest-path in
plain numpy, and similarity maps are device GEMMs.
"""

from vsc22_tpu.align.vta import build_vta_model  # noqa: F401
from vsc22_tpu.align.localization import (  # noqa: F401
    VCSLLocalization,
    VCSLLocalizationCandidateScore,
    VCSLLocalizationMaxSim,
)
