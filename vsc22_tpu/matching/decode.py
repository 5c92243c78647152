"""SAM heatmap decoding: connected components + weighted RANSAC line fits.

Parity target (reference, for cross-checking — original implementation):
  M1/infer/src/utils.py:77-119 (`generate_matching_result`):
  - binarize the heatmap at `threshold`;
  - 8-connected components; components with >10 pixels are fitted
    individually (together with all remaining small/unlabeled points);
    if none, all above-threshold points form one component;
  - per component: RANSAC-fit r = f(q) weighted by score^2 (residual 2,
    max_trials 200, seed 2023); keep positive slopes with >5 inliers within
    |residual| < 1 spanning >3 distinct rows and columns;
  - segment = inlier bounding box; score = max(sim) - std(sim)*std_ratio -
    (max(slope, 1/slope) - 1)/10;
  - three (threshold, std_ratio) operating points are unioned downstream
    ((0.35,0.5), (0.1,1.25), (0.001,2) — M1/infer/infer_matching.py:282-293).

Connected components use scipy.ndimage.label with 8-connectivity (same
labeling semantics as cv2.connectedComponentsWithStats(connectivity=8)).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
from scipy import ndimage

DECODE_SETTINGS: Tuple[Tuple[float, float], ...] = ((0.35, 0.5), (0.1, 1.25), (0.001, 2.0))
_EIGHT_CONN = np.ones((3, 3), np.int32)


def generate_matching_result(
    res_list: Sequence[Tuple[str, str, np.ndarray, np.ndarray]],
    threshold: float = 0.05,
    std_ratio: float = 2.0,
) -> List[List]:
    """Decode per-pair heatmaps into [qid, rid, qs, rs, qe, re, score] rows.

    `res_list` entries are (query_id, ref_id, heatmap, original_sim) — the
    score statistics are computed on `heatmap` (reference passes the SAM
    probability map as sim_mat and the raw sim as sim_mat_org, unused).
    """
    from sklearn.linear_model import RANSACRegressor

    match_res: List[List] = []
    for qid, rid, sim_mat, _sim_org in res_list:
        qmat = sim_mat > threshold
        binary = qmat.astype(np.uint8)
        conn_label, num_label = ndimage.label(binary, structure=_EIGHT_CONN)
        # One bincount pass instead of a full-array scan per label (noisy
        # heatmaps produce hundreds of components; semantics identical).
        counts = np.bincount(conn_label.ravel(), minlength=num_label + 1)
        big = np.flatnonzero(counts > 10)
        big = big[big > 0]
        label_cnt: Dict[int, int] = {int(i): int(counts[i]) for i in big}
        if label_cnt:
            qmat[np.isin(conn_label, big)] = False  # handled individually
        else:
            conn_label = qmat.astype(np.int32)
            label_cnt[1] = int(conn_label.sum())

        pair_results = []
        for i in label_cnt:
            x, y = np.where((conn_label == i) | qmat)
            if len(set(x)) > 3:
                ransac = RANSACRegressor(
                    max_trials=200, random_state=2023, residual_threshold=2
                )
                prob = sim_mat[x, y]
                ransac.fit(x[:, None], y[:, None], sample_weight=np.square(prob))
                pred = ransac.predict(x[:, None]).flatten()
                qualify = np.abs(y - pred) < 1
                coef = float(ransac.estimator_.coef_[0][0])
                if coef <= 0:
                    continue
                coef = max(1 / coef, coef)
                if (
                    qualify.sum() > 5
                    and len(set(x[qualify])) > 3
                    and len(set(y[qualify])) > 3
                ):
                    qs, qe = int(x[qualify][0]), int(x[qualify][-1])
                    rs, re = int(y[qualify][0]), int(y[qualify][-1])
                    top_sim = sim_mat[x[qualify], y[qualify]]
                    score = float(
                        top_sim.max() - top_sim.std() * std_ratio - abs(coef - 1) / 10
                    )
                    pair_results.append([qs, rs, qe, re, score])
        for qs, rs, qe, re, score in pair_results:
            match_res.append([qid, rid, qs, rs, qe, re, score])
    return match_res


def decode_all_settings(
    res_list: Sequence[Tuple[str, str, np.ndarray, np.ndarray]],
    settings: Sequence[Tuple[float, float]] = DECODE_SETTINGS,
) -> List[List]:
    """Union of the decode operating points, deduplicated by max score
    (reference: infer_matching.py:282-293 union + groupby-max)."""
    best: Dict[Tuple, float] = {}
    for threshold, std_ratio in settings:
        for qid, rid, qs, rs, qe, re, score in generate_matching_result(
            res_list, threshold=threshold, std_ratio=std_ratio
        ):
            key = (qid, rid, qs, rs, qe, re)
            best[key] = max(best.get(key, -np.inf), score)
    return [[*key, score] for key, score in best.items()]
