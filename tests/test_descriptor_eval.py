"""End-to-end descriptor-track smoke: planted copies -> high µAP."""

import numpy as np
import pandas as pd
import pytest

from vsc22_tpu.core.storage import store_features
from vsc22_tpu.core.types import Match, VideoFeature
from vsc22_tpu.pipelines import descriptor_eval


def normalize(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def synthetic_corpus(tmp_path_factory):
    """20 queries / 40 refs; queries 0..9 copy a span of ref i (+ noise)."""
    tmp = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(42)
    dim = 32
    refs, queries, gt = [], [], []
    for i in range(40):
        refs.append(
            VideoFeature(
                video_id=f"R{i:06d}",
                feature=normalize(rng.normal(size=(30, dim))).astype(np.float32),
                timestamps=np.arange(30, dtype=np.float32),
            )
        )
    for i in range(20):
        feat = normalize(rng.normal(size=(25, dim))).astype(np.float32)
        if i < 10:
            # Copy ref i frames 5:15 into query frames 8:18, lightly noised.
            span = refs[i].feature[5:15] + 0.05 * rng.normal(size=(10, dim))
            feat[8:18] = normalize(span).astype(np.float32)
            gt.append(
                Match(
                    query_id=f"Q{i:06d}",
                    ref_id=f"R{i:06d}",
                    score=1.0,
                    query_start=8.0,
                    query_end=18.0,
                    ref_start=5.0,
                    ref_end=15.0,
                )
            )
        queries.append(
            VideoFeature(
                video_id=f"Q{i:06d}",
                feature=feat,
                timestamps=np.arange(25, dtype=np.float32),
            )
        )
    # Independent noise corpus for score normalization.
    noise = [
        VideoFeature(
            video_id=f"R{900 + i:06d}",
            feature=normalize(rng.normal(size=(30, dim))).astype(np.float32),
            timestamps=np.arange(30, dtype=np.float32),
        )
        for i in range(20)
    ]
    q_path, r_path, n_path = tmp / "q.npz", tmp / "r.npz", tmp / "noise.npz"
    store_features(str(q_path), queries)
    store_features(str(r_path), refs)
    store_features(str(n_path), noise)
    gt_path = tmp / "gt.csv"
    Match.write_csv(gt, str(gt_path))
    return tmp, str(q_path), str(r_path), str(n_path), str(gt_path)


def test_end_to_end_descriptor_eval(synthetic_corpus):
    tmp, q, r, noise, gt = synthetic_corpus
    out = tmp / "out"
    result = descriptor_eval.run(
        query_features=q,
        ref_features=r,
        output_path=str(out),
        score_norm_features=noise,
        ground_truth=gt,
    )
    assert result.candidate_uap is not None
    # Planted copies are near-exact: retrieval must nail them.
    assert result.candidate_uap > 0.9
    # Localization should produce overlapping segments for most planted pairs.
    assert result.segment_ap > 0.3
    # Output files exist and parse.
    cands = pd.read_csv(result.candidate_file)
    assert {"query_id", "ref_id", "score"} <= set(cands.columns)
    matches = pd.read_csv(result.match_file)
    assert len(matches) >= 5


def test_end_to_end_without_score_norm(synthetic_corpus):
    tmp, q, r, noise, gt = synthetic_corpus
    out = tmp / "out_nosn"
    result = descriptor_eval.run(
        query_features=q,
        ref_features=r,
        output_path=str(out),
        ground_truth=gt,
    )
    assert result.candidate_uap > 0.9
