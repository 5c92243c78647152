"""Fused GEMM + per-block top-e candidate extraction for corpus retrieval.

The hot op of the FAISS-replacement search (`retrieval.search`): for every
query row, surface the top `e` entries of each `tile_r`-wide reference block
of the Q x R inner-product matrix, plus each block's e-th score (the exact
truncation bound used by the caller's certificate — see
`retrieval.search._row_topk_impl`).

Why a kernel: the XLA fast scan materializes each [Tq, ref_tile] similarity
block in HBM and the iterative e-peel re-reads (and re-writes) it e times —
at reference scale (~320k x 1.28M, D1/README.md corpus) that HBM traffic
dominates the GEMM roughly tenfold. Here the block GEMM and the peel run
back-to-back in VMEM; the similarity block never touches HBM, so the op is
MXU-bound.

Precision: Mosaic supports neither f16 operands nor the HIGH precision
tier, so the f32xf32 -> f32 GEMM is decomposed manually into the standard
bf16x3 form (hi/lo splits, three MXU passes) — the same algorithm XLA uses
for `Precision.HIGH`, so scores agree with the XLA scan path to float-
rounding of the accumulation order (~1e-6 on unit vectors). The split is
done once in XLA (`split_bf16`) and the hi/lo pairs live in HBM; total
footprint equals the f32 original.

Output layout: scores/indices are [nb, e, Nq] (block = (1, e, tile_q)) so
each grid step writes one full block — no dynamic minor-dim stores. The
merge helper transposes to [Nq, nb*e], takes the row top-k, and derives the
certificate bound = max over blocks of the e-th extracted score.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


@jax.jit
def split_bf16(x):
    """Split f32 [N, D] into (hi, lo) bf16 so hi + lo ~= x (bf16x3 operands)."""
    x = x.astype(jnp.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _extract_kernel(nv_ref, qh_ref, ql_ref, rh_ref, rl_ref, s_ref, i_ref,
                    *, e: int, tile_r: int):
    rj = pl.program_id(0)
    qh = qh_ref[:]
    ql = ql_ref[:]
    rh = rh_ref[:]
    dn = (((1,), (1,)), ((), ()))
    # bf16x3: hi*hi + hi*lo + lo*hi (f32 accumulate) == Precision.HIGH
    sims = jax.lax.dot_general(qh, rh, dn, preferred_element_type=jnp.float32)
    sims += jax.lax.dot_general(qh, rl_ref[:], dn, preferred_element_type=jnp.float32)
    sims += jax.lax.dot_general(ql, rh, dn, preferred_element_type=jnp.float32)

    col0 = rj * tile_r
    col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    sims = jnp.where(col0 + col < nv_ref[0, 0], sims, NEG_INF)

    es, ei = [], []
    cur = sims
    for _ in range(e):
        m = jnp.max(cur, axis=1)
        a = jnp.argmax(cur, axis=1).astype(jnp.int32)
        es.append(m)
        ei.append(a + col0)
        cur = jnp.where(col == a[:, None], NEG_INF, cur)
    s_ref[0] = jnp.stack(es, axis=0)  # [e, tile_q], descending per column
    i_ref[0] = jnp.stack(ei, axis=0)


@functools.partial(
    jax.jit, static_argnames=("e", "tile_q", "tile_r", "k", "interpret")
)
def extract_topk(qh, ql, rh, rl, num_valid, *, e: int, tile_q: int,
                 tile_r: int, k: int, interpret: bool = False):
    """Per-row top-k candidates of `q @ refs.T` via fused block extraction.

    qh/ql: [Nq_pad, D] bf16 query splits (Nq_pad % tile_q == 0);
    rh/rl: [Nr_pad, D] bf16 ref splits (Nr_pad % tile_r == 0);
    num_valid: [1, 1] int32 — rows of refs at index >= num_valid score -inf.

    Returns (scores [Nq_pad, k], indices [Nq_pad, k], bound [Nq_pad]) where
    `bound` exactly upper-bounds every corpus entry not surfaced by the
    block extraction (callers rescan rows with bound >= kth; see
    retrieval.search.SimilaritySearcher.row_topk).
    """
    nq, d = qh.shape
    nr = rh.shape[0]
    nb = nr // tile_r
    grid = (nb, nq // tile_q)
    s_blocks, i_blocks = pl.pallas_call(
        functools.partial(_extract_kernel, e=e, tile_r=tile_r),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda rj, qi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_q, d), lambda rj, qi: (qi, 0)),
            pl.BlockSpec((tile_q, d), lambda rj, qi: (qi, 0)),
            pl.BlockSpec((tile_r, d), lambda rj, qi: (rj, 0)),
            pl.BlockSpec((tile_r, d), lambda rj, qi: (rj, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, e, tile_q), lambda rj, qi: (rj, 0, qi)),
            pl.BlockSpec((1, e, tile_q), lambda rj, qi: (rj, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, e, nq), jnp.float32),
            jax.ShapeDtypeStruct((nb, e, nq), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(num_valid, qh, ql, rh, rl)

    # Merge: row top-k over the nb*e surfaced candidates + certificate bound.
    s_flat = s_blocks.reshape(nb * e, nq).T  # [Nq, nb*e]
    i_flat = i_blocks.reshape(nb * e, nq).T
    kk = min(k, nb * e)
    s, pos = jax.lax.top_k(s_flat, kk)
    i = jnp.take_along_axis(i_flat, pos, axis=1)
    if kk < k:
        s = jnp.concatenate([s, jnp.full((nq, k - kk), NEG_INF, s.dtype)], axis=1)
        i = jnp.concatenate([i, jnp.zeros((nq, k - kk), i.dtype)], axis=1)
    bound = jnp.max(s_blocks[:, e - 1, :], axis=0)  # [Nq]
    return s, i, bound
