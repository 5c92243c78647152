"""ops/pallas_topk: fused GEMM + per-block top-e extraction (interpret mode).

On hardware this kernel runs behind `ops/kernel_gate` canaries; here its
semantics are pinned on CPU via `interpret=True` against a numpy oracle —
exact recovery when e >= k, the truncation-bound certificate, tail-column
masking, and the kk < k padding branch. Also smoke-covers
utils/benchmark's relay-safe timers (used by every perf script).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vsc22_tpu.ops.pallas_topk import NEG_INF, extract_topk, split_bf16

TILE_Q, TILE_R, D = 8, 128, 64


def _inputs(nq=16, nr=256, num_valid=None, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((nq, D)).astype(np.float32)
    r = rng.standard_normal((nr, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    r /= np.linalg.norm(r, axis=1, keepdims=True)
    nv = nr if num_valid is None else num_valid
    qh, ql = split_bf16(q)
    rh, rl = split_bf16(r)
    sims = q @ r.T
    sims[:, nv:] = NEG_INF
    return (qh, ql, rh, rl, jnp.full((1, 1), nv, jnp.int32)), sims


def test_split_bf16_reconstructs():
    x = np.random.default_rng(1).standard_normal((32, D)).astype(np.float32)
    hi, lo = split_bf16(x)
    assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
    rec = np.asarray(hi, np.float32) + np.asarray(lo, np.float32)
    # Two chained bf16 mantissas carry ~16 bits: relative error ~2^-16.
    assert np.abs(rec - x).max() < 2 ** -15 * np.abs(x).max()


def test_exact_topk_when_e_covers_k():
    """Each reference block contributes at most k rows of the global row
    top-k, so e == k surfaces every one of them: results must equal the
    brute-force top-k exactly (scores to accumulation rounding)."""
    args, sims = _inputs()
    k = 4
    s, i, bound = extract_topk(*args, e=k, tile_q=TILE_Q, tile_r=TILE_R,
                               k=k, interpret=True)
    s, i, bound = map(np.asarray, (s, i, bound))
    order = np.argsort(-sims, axis=1)[:, :k]
    np.testing.assert_array_equal(i, order)
    np.testing.assert_allclose(
        s, np.take_along_axis(sims, order, axis=1), atol=1e-5
    )


def test_certificate_bound_dominates_unsurfaced_entries():
    """`bound` must upper-bound every corpus entry the block extraction did
    NOT surface — the exactness certificate retrieval.search rescans on."""
    args, sims = _inputs(seed=2)
    e, k = 2, 4
    s, i, bound = extract_topk(*args, e=e, tile_q=TILE_Q, tile_r=TILE_R,
                               k=k, interpret=True)
    s, i, bound = map(np.asarray, (s, i, bound))
    for row in range(sims.shape[0]):
        unsurfaced = np.delete(sims[row], i[row])
        assert unsurfaced.max() <= bound[row] + 1e-5


def test_num_valid_masks_tail_columns():
    nv = 200  # refs 200..255 are padding
    args, sims = _inputs(num_valid=nv, seed=3)
    k = 4
    s, i, _ = extract_topk(*args, e=k, tile_q=TILE_Q, tile_r=TILE_R,
                           k=k, interpret=True)
    assert np.asarray(i).max() < nv
    order = np.argsort(-sims, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(i), order)


def test_pads_when_blocks_yield_fewer_than_k():
    """nb*e < k: the merge pads with NEG_INF scores / zero indices rather
    than inventing candidates."""
    args, sims = _inputs()
    e, k = 2, 8  # nb = 256/128 = 2 -> kk = 4 real candidates
    s, i, _ = extract_topk(*args, e=e, tile_q=TILE_Q, tile_r=TILE_R,
                           k=k, interpret=True)
    s, i = np.asarray(s), np.asarray(i)
    assert (s[:, 4:] == NEG_INF).all()
    assert (i[:, 4:] == 0).all()
    assert (s[:, :4] > NEG_INF).all()


class TestBenchmarkTimers:
    def test_roundtrip_floor_positive(self):
        from vsc22_tpu.utils.benchmark import roundtrip_floor

        f = roundtrip_floor(n=2)
        assert 0 < f < 5.0

    def test_time_scanned_amortizes(self):
        from vsc22_tpu.utils.benchmark import time_scanned

        x = jnp.ones((8, 8), jnp.float32)
        sec = time_scanned(lambda a: a @ a, (x,), iters=4, repeats=1)
        assert 0 < sec < 5.0
