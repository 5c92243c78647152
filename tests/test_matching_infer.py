"""Matching inference pipeline: recall, ensembles, end-to-end mechanics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Minute-plus on the 1-core CI host: excluded from the default dev loop
# (pytest -m 'not slow and not heavy'); run via the heavy tier.
pytestmark = pytest.mark.heavy
from numpy.testing import assert_allclose

from vsc22_tpu.core.types import VideoFeature
from vsc22_tpu.models.hrnet import sam_hrnet_tiny_test
from vsc22_tpu.models.mobilenetv3 import mobilenetv3_small
from vsc22_tpu.pipelines.matching_infer import (
    ClassifyEnsemble,
    RefineEnsemble,
    matching_inference,
    recall_candidates,
)
from vsc22_tpu.retrieval.search import SimilaritySearcher


def normed(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_threshold_search_exact():
    rng = np.random.default_rng(0)
    q = normed(rng.standard_normal((37, 16)).astype(np.float32))
    r = normed(rng.standard_normal((211, 16)).astype(np.float32))
    searcher = SimilaritySearcher(r)
    rows, cols, scores = searcher.threshold_search(q, 0.3, k0=4)  # force doubling
    sims = q @ r.T
    expect = np.argwhere(sims > 0.3)
    got = set(zip(rows.tolist(), cols.tolist()))
    assert got == {(int(a), int(b)) for a, b in expect}
    for row, col, s in zip(rows, cols, scores):
        assert abs(sims[row, col] - s) < 1e-5


def test_threshold_search_dense_row_rescans_only_overflow():
    """One dense row (near-duplicates of many refs) forces deep doubling;
    sparse rows must resolve at the initial width and all hits stay exact.
    Regression for the former full-[nq, k] array growth."""
    rng = np.random.default_rng(7)
    base = normed(rng.standard_normal((1, 16)).astype(np.float32))
    r = normed(
        np.concatenate(
            [
                base + 0.01 * rng.standard_normal((500, 16)),  # dense cluster
                rng.standard_normal((300, 16)),
            ]
        ).astype(np.float32)
    )
    q = np.concatenate(
        [base, normed(rng.standard_normal((9, 16)).astype(np.float32))]
    ).astype(np.float32)
    searcher = SimilaritySearcher(r)
    rows, cols, scores = searcher.threshold_search(q, 0.9, k0=8)
    sims = q @ r.T
    expect = np.argwhere(sims > 0.9)
    assert set(zip(rows.tolist(), cols.tolist())) == {
        (int(a), int(b)) for a, b in expect
    }
    assert np.all(np.diff(rows) >= 0)  # grouped by row
    np.testing.assert_allclose(scores, sims[rows, cols], atol=1e-5)


def make_corpus():
    rng = np.random.default_rng(1)
    refs, queries = [], []
    for i in range(6):
        refs.append(
            VideoFeature(
                video_id=f"R{i:06d}",
                feature=normed(rng.standard_normal((20, 16))).astype(np.float32),
                timestamps=np.arange(20.0),
            )
        )
    for i in range(3):
        feat = normed(rng.standard_normal((15, 16))).astype(np.float32)
        if i == 0:
            feat[5:12] = refs[0].feature[3:10]  # planted copy
        queries.append(
            VideoFeature(video_id=f"Q{i:06d}", feature=feat, timestamps=np.arange(15.0))
        )
    return queries, refs


def test_recall_candidates_finds_planted_pair():
    queries, refs = make_corpus()
    candidates = recall_candidates(queries, refs, threshold=0.9)
    assert candidates[0][0] == "Q000000" and candidates[0][1] == "R000000"
    assert candidates[0][2] > 0.99


def test_recall_device_aggregation_matches_hit_list_path():
    """The dense video-pair segment-max path must reproduce the
    threshold-search + host-scatter aggregation exactly (same pairs, same
    scores, same sort order)."""
    from vsc22_tpu.retrieval.packed import PackedFeatures
    from vsc22_tpu.retrieval.search import video_pair_max_scores

    queries, refs = make_corpus()
    fast = recall_candidates(queries, refs, threshold=-0.1)

    packed_r = PackedFeatures.from_video_features(refs)
    packed_q = PackedFeatures.from_video_features(queries)
    searcher = SimilaritySearcher(packed_r.features[: packed_r.num_rows])
    rows, cols, scores = searcher.threshold_search(
        packed_q.features[: packed_q.num_rows], -0.1
    )
    q_vid = packed_q.video_idx[rows].astype(np.int64)
    r_vid = packed_r.video_idx[cols].astype(np.int64)
    keys = q_vid * len(packed_r.video_ids) + r_vid
    uniq, inv = np.unique(keys, return_inverse=True)
    best = np.full(uniq.shape[0], -np.inf, np.float64)
    np.maximum.at(best, inv, scores)
    uq, ur = np.divmod(uniq, len(packed_r.video_ids))
    slow = [
        (packed_q.video_ids[int(a)], packed_r.video_ids[int(b)], float(s))
        for a, b, s in zip(uq, ur, best)
    ]
    slow.sort(key=lambda t: -t[2])

    assert len(fast) == len(slow)
    for (fq, fr, fs), (sq, sr, ss) in zip(fast, slow):
        assert (fq, fr) == (sq, sr)
        np.testing.assert_allclose(fs, ss, rtol=0, atol=2e-5)

    # multi-chunk accumulation covers the same pairs
    mat = video_pair_max_scores(
        packed_q.features, packed_q.video_idx,
        packed_r.features, packed_r.video_idx,
        len(packed_q.video_ids), len(packed_r.video_ids), row_chunk=64,
    )
    assert int((mat > -0.1).sum()) == len(fast)


@pytest.fixture(scope="module")
def tiny_ensembles():
    cls_models = []
    for seed in (0, 1):
        m = mobilenetv3_small(num_classes=2)
        v = m.init(jax.random.PRNGKey(seed), jnp.zeros((1, 160, 160, 3)), train=False)
        cls_models.append((m, v))
    ref_models = []
    for seed in (2, 3):
        m = sam_hrnet_tiny_test()
        v = m.init(jax.random.PRNGKey(seed), jnp.zeros((1, 224, 224, 3)), train=False)
        ref_models.append((m, v))
    return ClassifyEnsemble(cls_models, batch=8), RefineEnsemble(ref_models, batch=4)


def test_classify_ensemble_outputs_probs(tiny_ensembles):
    classify, _ = tiny_ensembles
    rng = np.random.default_rng(2)
    sims = [rng.random((30, 40)).astype(np.float32) for _ in range(5)]
    probs = classify.predict(sims)
    assert probs.shape == (5,)
    assert ((probs >= 0) & (probs <= 1)).all()
    assert classify.predict([]).shape == (0,)


def test_refine_ensemble_shapes_and_tta(tiny_ensembles):
    _, refine = tiny_ensembles
    rng = np.random.default_rng(3)
    q = normed(rng.standard_normal((30, 16))).astype(np.float32)
    r = normed(rng.standard_normal((50, 16))).astype(np.float32)
    out = refine.predict([("Q1", "R1", q, r)])
    assert len(out) == 1
    qid, rid, prob, raw = out[0]
    assert prob.shape == (30, 50)
    assert raw.shape == (30, 50)
    assert ((prob >= 0) & (prob <= 1)).all()
    assert_allclose(raw, (q @ r.T)[:30, :50], atol=1e-5)


def test_matching_inference_end_to_end(tiny_ensembles):
    classify, refine = tiny_ensembles
    queries, refs = make_corpus()
    sn_queries = [dataclasses.replace(v) for v in queries]
    sn_refs = [dataclasses.replace(v) for v in refs]
    len_map = {v.video_id: len(v) for v in queries}
    rows = matching_inference(
        queries,
        refs,
        sn_queries,
        sn_refs,
        len_map,
        classify,
        refine,
        cls_threshold=0.0,  # untrained filter: let everything through
    )
    # Structural checks: valid schema, dedup, finite scores.
    for qid, rid, qs, qe, rs, re, score in rows:
        assert qid.startswith("Q") and rid.startswith("R")
        assert qe >= qs and re >= rs
        assert np.isfinite(score)
    keys = {tuple(r[:6]) for r in rows}
    assert len(keys) == len(rows)
