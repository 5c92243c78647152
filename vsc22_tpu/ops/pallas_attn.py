"""Fused plain (full, non-causal) attention for ViT-style encoders.

Why: the XLA path materializes [B, H, L, L] attention logits + probabilities
in HBM for every layer (CLIP ViT-L/14 at batch 48: ~200MB per block x 24
layers); the per-row softmax fits trivially in VMEM at encoder sequence
lengths (L <= ~1k). This kernel computes softmax(q @ k^T) @ v per
(batch, head) grid cell entirely on-chip — HBM traffic drops to q/k/v/out.

Used by models.layers.MultiHeadAttention on TPU (deterministic, no bias),
i.e. by the ViT-B/32 flagship and the CLIP tower. Scale (head_dim^-0.5) is
folded into q by the caller. Sequence padding is handled here: tokens pad
to the sublane tile and padded key columns are masked to -1e9 (padded query
rows produce garbage that the caller slices off).

Differentiation: custom VJP recomputes in plain XLA (same pattern as
pallas_mlp / pallas_swin_block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(g_rows: int, valid: int):
    def _kernel(q_ref, k_ref, v_ref, out_ref):
        s = q_ref.shape[2]

        def body(g, carry):
            q = q_ref[0, g]  # [S, hd]
            k = k_ref[0, g]
            v = v_ref[0, g]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [S, S]
            if valid < s:
                col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
                logits = jnp.where(col < valid, logits, -1e9)
            probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            out = jax.lax.dot_general(
                probs, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[0, g] = out.astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, g_rows, body, 0)

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def plain_attention(
    q: jax.Array,  # [W, L, hd] with W = batch * heads; scale pre-folded into q
    k: jax.Array,
    v: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    w, l, hd = q.shape
    s = -(-l // 128) * 128  # pad tokens so the logits tile is lane-aligned
    if s != l:
        pad = [(0, 0), (0, s - l), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))

    def vmem(g):
        return 2 * 2 * 3 * g * s * hd * q.dtype.itemsize + 2 * g * s * s * 4

    g_rows = 1
    for cand in (16, 8, 4, 2, 1):
        if w % cand == 0 and vmem(cand) < 24 * 2**20:
            g_rows = cand
            break
    num_groups = w // g_rows
    q4, k4, v4 = (x.reshape(num_groups, g_rows, s, hd) for x in (q, k, v))
    spec = pl.BlockSpec((1, g_rows, s, hd), lambda i: (i, 0, 0, 0))
    out = pl.pallas_call(
        _make_kernel(g_rows, l),
        grid=(num_groups,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((num_groups, g_rows, s, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(q4, k4, v4)
    return out.reshape(w, s, hd)[:, :l]


def _attention_xla(q, k, v):
    logits = jnp.einsum("wld,wmd->wlm", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "wlm,wmd->wld", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


@jax.custom_vjp
def attention(q, k, v):
    """softmax(q @ k^T) @ v over [W, L, hd]; Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return plain_attention(q, k, v)
    return _attention_xla(q, k, v)


def _fwd(q, k, v):
    return attention(q, k, v), (q, k, v)


def _bwd(residuals, g):
    _, vjp = jax.vjp(_attention_xla, *residuals)
    return vjp(g)


attention.defvjp(_fwd, _bwd)
