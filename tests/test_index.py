"""VideoIndex / CandidateGeneration conformance (reference test_{index,candidates}.py)."""

import numpy as np
import pytest

from vsc22_tpu.core.types import CandidatePair, VideoFeature
from vsc22_tpu.retrieval.index import CandidateGeneration, MaxScoreAggregation, VideoIndex


def normed(x):
    x = np.asarray(x, np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture
def identity_corpus():
    """Three 3-frame videos with mutually distinguishable unit features."""
    rng = np.random.default_rng(11)
    feats = normed(rng.standard_normal((9, 16))).reshape(3, 3, 16)
    queries = [
        VideoFeature(video_id=f"Q{i:06d}", feature=feats[i], timestamps=np.arange(3.0))
        for i in range(3)
    ]
    refs = [
        VideoFeature(video_id=f"R{i:06d}", feature=feats[i], timestamps=np.arange(3.0))
        for i in range(3)
    ]
    return queries, refs


@pytest.mark.parametrize("global_k", [9, -1])
def test_video_index_identity_retrieval(identity_corpus, global_k):
    queries, refs = identity_corpus
    index = VideoIndex(16)
    index.add(refs)
    results = index.search(queries, global_k)
    # Self-similarity of unit vectors is maximal: top matches pair Qi with Ri.
    best = {}
    for pm in results:
        top = max(m.score for m in pm.matches)
        cur = best.get(pm.query_id)
        if cur is None or top > cur[1]:
            best[pm.query_id] = (pm.ref_id, top)
    for qid, (rid, _) in best.items():
        assert qid[1:] == rid[1:]


def test_candidate_generation_ordering():
    """Hand-built one-hot features, exact expected scores (reference fixture)."""
    queries = [
        VideoFeature(
            video_id=1,
            feature=np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32),
            timestamps=np.array([0.0, 1.0, 2.0]),
        )
    ]
    refs = [
        VideoFeature(
            video_id=5,
            feature=np.array(
                [[0, 0, 0], [0, 0, 0], [0, 1, 0], [0, 2, 0], [0, 0, 0]], np.float32
            ),
            timestamps=np.array([2.0, 4.0, 6.0, 8.0, 10.0]),
        ),
        VideoFeature(
            video_id=8,
            feature=np.array([[0, 0, 0], [1, 0, 0], [1, 0, 0]], np.float32),
            timestamps=np.array([[0.0, 5.0], [5.0, 10.0], [10.0, 15.0]]),
        ),
        VideoFeature(
            video_id=10,
            feature=np.array([[0, 0, 0], [0, 0, 0.25], [0, 0, 0]], np.float32),
            timestamps=np.array([0.0, 0.1, 0.2]),
        ),
    ]
    cg = CandidateGeneration(refs, MaxScoreAggregation())
    candidates = cg.query(queries, 2 * 3)
    assert len(candidates) == 3
    assert candidates == [
        CandidatePair(query_id=1, ref_id=5, score=2.0),
        CandidatePair(query_id=1, ref_id=8, score=1.0),
        CandidatePair(query_id=1, ref_id=10, score=0.25),
    ]


def test_interval_timestamps_propagate():
    queries = [
        VideoFeature(
            video_id="Q000001",
            feature=np.array([[1.0, 0.0]], np.float32),
            timestamps=np.array([3.0]),
        )
    ]
    refs = [
        VideoFeature(
            video_id="R000002",
            feature=np.array([[1.0, 0.0]], np.float32),
            timestamps=np.array([[5.0, 6.0]]),
        )
    ]
    index = VideoIndex(2)
    index.add(refs)
    [pm] = index.search(queries, 1)
    assert pm.matches[0].query_timestamps == (3.0, 3.0)
    assert pm.matches[0].ref_timestamps == (5.0, 6.0)


def test_dim_mismatch_rejected():
    index = VideoIndex(4)
    with pytest.raises(ValueError):
        index.add(
            [
                VideoFeature(
                    video_id="R000001",
                    feature=np.zeros((2, 3), np.float32),
                    timestamps=np.arange(2.0),
                )
            ]
        )


def test_sharded_index_matches_single_device(identity_corpus, cpu_mesh):
    queries, refs = identity_corpus
    single = VideoIndex(16)
    single.add(refs)
    sharded = VideoIndex(16, mesh=cpu_mesh)
    sharded.add(refs)
    res1 = {(p.query_id, p.ref_id): sorted(m.score for m in p.matches) for p in single.search(queries, 20)}
    res8 = {(p.query_id, p.ref_id): sorted(m.score for m in p.matches) for p in sharded.search(queries, 20)}
    assert res1.keys() == res8.keys()
    for key in res1:
        np.testing.assert_allclose(res1[key], res8[key], atol=1e-5)
