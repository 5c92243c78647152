"""Score-normalization conformance vs. a direct numpy oracle of the semantics."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from vsc22_tpu.core.types import VideoFeature
from vsc22_tpu.retrieval.score_norm import (
    query_score_normalize,
    ref_score_normalize,
    score_normalize,
)


def make_vfs(prefix, counts, dim, seed):
    rng = np.random.default_rng(seed)
    return [
        VideoFeature(
            video_id=f"{prefix}{i:06d}",
            feature=rng.standard_normal((n, dim)).astype(np.float32),
            timestamps=np.arange(n, dtype=np.float32),
        )
        for i, n in enumerate(counts)
    ]


def oracle_bias(q_feats, noise, beta, nk):
    """Reference semantics: -beta * mean of top-nk inner products to noise."""
    sims = q_feats @ noise.T
    top = -np.sort(-sims, axis=1)[:, :nk]
    return -beta * top.mean(axis=1, keepdims=True)


@pytest.mark.parametrize("beta,nk", [(1.0, 1), (1.2, 1), (1.5, 10)])
def test_score_normalize_oracle(beta, nk):
    dim = 32
    queries = make_vfs("Q", [4, 7], dim, 1)
    refs = make_vfs("R", [5, 3], dim, 2)
    noise = make_vfs("N", [20, 15], dim, 3)

    adapted_q, adapted_r = score_normalize(queries, refs, noise, beta=beta, nk=nk)

    # Oracle: delete min-var dim of noise, L2-normalize everything, compute bias.
    noise_stack = np.concatenate([n.feature for n in noise])
    low_var = noise_stack.var(axis=0).argmin()

    def prep(x):
        x = np.delete(x, low_var, axis=1)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    noise_prepped = np.concatenate([prep(n.feature) for n in noise])
    for q, aq in zip(queries, adapted_q):
        qp = prep(q.feature)
        bias = oracle_bias(qp, noise_prepped, beta, nk)
        assert aq.feature.shape == (len(q), dim)  # -1 dim, +1 bias dim
        assert_allclose(aq.feature[:, :-1], qp, atol=1e-6)
        # bias tolerance covers the f16 operand shipping in row_max_gemm
        assert_allclose(aq.feature[:, -1:], bias, atol=1e-3)
    for r, ar in zip(refs, adapted_r):
        assert_allclose(ar.feature[:, -1], 1.0)
        assert_allclose(ar.feature[:, :-1], prep(r.feature), atol=1e-6)

    # The appended dims realize sim + bias under plain inner product.
    q0, r0 = adapted_q[0].feature, adapted_r[0].feature
    expect = prep(queries[0].feature) @ prep(refs[0].feature).T + oracle_bias(
        prep(queries[0].feature), noise_prepped, beta, nk
    )
    assert_allclose(q0 @ r0.T, expect, atol=1e-3)


def test_score_normalize_rejects_overlap():
    refs = make_vfs("R", [3], 8, 1)
    with pytest.raises(ValueError):
        score_normalize(make_vfs("Q", [3], 8, 0), refs, refs)


def test_query_score_normalize_ved_gating():
    dim = 16
    queries = make_vfs("Q", [4, 4], dim, 5)
    noise = make_vfs("N", [30], dim, 6)
    scores = {"Q000000": 0.9, "Q000001": 0.0}  # second video gated off
    adapted = query_score_normalize(
        queries, noise, video_scores=scores, beta=1.2, nk=1, low_var_dim=0
    )
    assert (adapted[1].feature[:, -1] == -100.0).all()
    assert (adapted[0].feature[:, -1] > -100.0).all()
    # low_var_dim=0 convention: first dim removed, not the min-variance one.
    assert adapted[0].feature.shape[1] == dim


def test_ref_score_normalize_appends_ones():
    dim = 16
    refs = make_vfs("R", [4], dim, 7)
    noise = make_vfs("N", [30], dim, 8)
    adapted = ref_score_normalize(refs, noise)
    assert adapted[0].feature.shape == (4, dim)
    assert_allclose(adapted[0].feature[:, -1], 1.0)
    assert_allclose(
        np.linalg.norm(adapted[0].feature[:, :-1], axis=1), 1.0, atol=1e-6
    )
