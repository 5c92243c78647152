"""Pallas TPU kernels for similarity reductions.

`row_max_gemm(q, r)` computes max_j (q_i · r_j) without materializing the
[Nq, Nr] similarity matrix in HBM — the hot op of CSLS score normalization
(nk=1: bias(query) = -beta * max similarity to the noise corpus,
D1/infer/vsc/baseline/score_normalization.py:94-96) and of the frame
near-duplicate statistics. The kernel tiles both operand matrices through
VMEM, runs the [TQ, D] x [D, TR] block GEMM on the MXU, and keeps a running
row-max accumulator in the output block (revisited across the inner grid
dimension).

On non-TPU backends the kernel runs in Pallas interpret mode (slow but
correct) — tests exercise it on the CPU mesh; `jnp.max(q @ r.T)` fallbacks
guard very small inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _row_max_kernel(q_ref, r_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, NEG_INF)

    sims = jax.lax.dot_general(
        q_ref[:],
        r_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST keeps full precision of the f16-shipped operands (the
        # f16->f32 cast happens in XLA before the kernel — Mosaic supports
        # neither f16 inputs nor the HIGH tier); the GEMM is a negligible
        # share of this transfer-bound call.
        precision=jax.lax.Precision.HIGHEST,
    )  # [TQ, TR] on the MXU
    block_max = jnp.max(sims, axis=1, keepdims=True)  # [TQ, 1]
    out_ref[:] = jnp.maximum(out_ref[:], jnp.broadcast_to(block_max, out_ref.shape))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_r", "interpret"))
def _row_max_call(q, r, *, tile_q: int, tile_r: int, interpret: bool):
    q = q.astype(jnp.float32)  # operands ship f16; kernel computes f32
    r = r.astype(jnp.float32)
    nq, d = q.shape
    nr = r.shape[0]
    grid = (nq // tile_q, nr // tile_r)
    out = pl.pallas_call(
        _row_max_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_r, d), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tile_q, 128), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nq, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(q, r)
    return out[:, 0]


def row_max_gemm(
    queries: np.ndarray,
    refs: np.ndarray,
    num_valid_refs: int | None = None,
    tile_q: int = 512,
    tile_r: int = 512,
) -> np.ndarray:
    """max_j queries @ refs.T per row, fused on device. Returns [Nq] f32.

    Padding rows added for tiling are masked by writing NEG_INF/2-scaled
    duplicates of the first valid ref row (so they never win the max).
    """
    nq, d = queries.shape
    num_valid = num_valid_refs if num_valid_refs is not None else refs.shape[0]
    interpret = jax.default_backend() != "tpu"

    tile_q = min(tile_q, _round_up(max(nq, 8), 8))
    tile_r = min(tile_r, _round_up(max(num_valid, 8), 8))

    q_pad = _round_up(max(nq, tile_q), tile_q)
    r_pad = _round_up(max(num_valid, tile_r), tile_r)
    # Ship f16: the call is host->device-transfer-bound at corpus scale
    # (unit-norm descriptors; f16 rounding perturbs sims by ~1e-3, far
    # below CSLS bias score gaps). The kernel computes in f32.
    q = np.zeros((q_pad, d), np.float16)
    q[:nq] = queries
    r = np.zeros((r_pad, d), np.float16)
    r[:num_valid] = refs[:num_valid]
    # Padding ref rows duplicate row 0: they can tie but never exceed the max.
    if r_pad > num_valid:
        r[num_valid:] = refs[0]
    out = np.asarray(
        _row_max_call(jnp.asarray(q), jnp.asarray(r), tile_q=tile_q, tile_r=tile_r, interpret=interpret)
    )
    return out[:nq]
