"""Matching track: similarity-matrix candidates, classify filter, SAM decode.

Parity targets (reference, for cross-checking — original implementations):
  - sim-matrix generation + split-segment selection: M1/train/utils.py,
    M1/infer/src/utils.py:20-75
  - heatmap decode (connected components + RANSAC): M1/infer/src/utils.py:77-119
  - end-to-end inference: M1/infer/infer_matching.py
"""

from vsc22_tpu.matching.decode import generate_matching_result  # noqa: F401
from vsc22_tpu.matching.simmat import (  # noqa: F401
    candidate_sim_matrices,
    pad_sim_matrix,
    select_best_split_segment,
)
