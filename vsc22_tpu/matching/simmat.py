"""Similarity-matrix construction for the matching track.

Parity target (reference, for cross-checking — original implementation):
  M1/infer/src/utils.py:20-75 and M1/train/utils.py:27-77:
  - when FSD split a query into k segments (len(qfeat) = k * num_frames),
    keep the segment whose top-10 max similarities to the ref are highest;
  - each candidate contributes its sim matrix AND the transpose as a second
    sample (the classify model sees both orientations);
  - classify inputs are zero-padded square "images" with the matrix stacked
    3x as channels (M1/train/dataset.py), refine inputs 224x224 at infer.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def select_best_split_segment(
    qfeat: np.ndarray, rfeat: np.ndarray, num_frames: int
) -> np.ndarray:
    """Pick the FSD split segment with the highest mean of top-10 max sims."""
    if num_frames == len(qfeat):
        return qfeat
    sim_mat = qfeat @ rfeat.T
    best_score, best = -np.inf, qfeat[:num_frames]
    for start in range(0, len(qfeat), num_frames):
        maxs = np.sort(sim_mat[start : start + num_frames].max(axis=1))
        score = maxs[-10:].mean()
        if score > best_score:
            best_score, best = score, qfeat[start : start + num_frames]
    return best


def candidate_sim_matrices(
    query: Dict[str, np.ndarray],
    ref: Dict[str, np.ndarray],
    candidates: Sequence[Tuple[str, str, float]],
    query_video_len_map: Dict[str, int],
) -> Tuple[List[np.ndarray], List[List]]:
    """Per candidate: (sim matrix, transposed sim matrix) + info rows."""
    features: List[np.ndarray] = []
    infos: List[List] = []
    for qid, rid, score in candidates:
        qfeat = select_best_split_segment(query[qid], ref[rid], query_video_len_map[qid])
        rfeat = ref[rid]
        sim = qfeat @ rfeat.T
        features.append(sim)
        infos.append([qid, rid, score])
        features.append(sim.T.copy())
        infos.append([qid, rid, score])
    return features, infos


def pad_sim_matrix(sim: np.ndarray, size: int, channels: int = 3) -> np.ndarray:
    """Zero-pad/truncate to [size, size, channels] (matrix stacked as channels)."""
    out = np.zeros((size, size, channels), np.float32)
    h = min(sim.shape[0], size)
    w = min(sim.shape[1], size)
    out[:h, :w, :] = sim[:h, :w, None]
    return out
