"""Fused SwinV2 cosine window attention (Pallas TPU kernel).

The XLA path materializes the per-window attention matrices
[B*nW, H, N, N] in HBM for every block (bias add, mask add, softmax — each a
round trip); at SwinV2-Base@256 that is ~1GB per early-stage block and makes
the backbone HBM-bound (~2.6% MXU measured). This kernel computes, per
window: L2-normalize(q,k) -> scaled cosine logits -> +CPB bias -> +shift
mask -> softmax -> @v entirely in VMEM, so HBM traffic is just q/k/v/out.

Semantics match models.swinv2.WindowAttention (reference
D1/train/train_v106/vsc/.../swinv2.py:145-186). The relative-position bias
(16*sigmoid(cpb)) and the exp-clamped logit scale are precomputed per layer;
the shift mask is indexed per window via the grid index map.

Interpret mode covers CPU testing; non-TPU backends fall back to the XLA
implementation inside the model.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _kernel(q_ref, k_ref, v_ref, rpb_ref, scale_ref, mask_ref, out_ref):
    # q/k/v: [1, H, N, hd]; rpb: [H, N, N]; scale: [H]; mask: [1, N, N].
    q = q_ref[0].astype(jnp.float32)  # [H, N, hd]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    k = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
    attn = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # [H, N, N]
        preferred_element_type=jnp.float32,
    )
    attn = attn * scale_ref[:].reshape(-1, 1, 1)
    attn = attn + rpb_ref[:]
    attn = attn + mask_ref[0][None, :, :]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),  # [H, N, hd]
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_shift_windows", "interpret"))
def window_attention_fused(
    q: jax.Array,  # [W, H, N, hd] (W = batch * windows)
    k: jax.Array,
    v: jax.Array,
    rpb: jax.Array,  # [H, N, N] f32 — 16*sigmoid(cpb), shared across windows
    scale: jax.Array,  # [H] f32 — exp(min(logit_scale, log 100))
    mask: jax.Array,  # [nW, N, N] f32 — shift mask (zeros when no shift)
    num_shift_windows: int,  # nW (window index = grid index % nW)
    interpret: bool = False,
) -> jax.Array:
    w, h, n, hd = q.shape
    nw = num_shift_windows
    return pl.pallas_call(
        _kernel,
        grid=(w,),
        in_specs=[
            pl.BlockSpec((1, h, n, hd), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, n, hd), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, n, hd), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((h, n, n), lambda i: (0, 0, 0)),  # constant: fetched once
            pl.BlockSpec((h,), lambda i: (0,)),
            pl.BlockSpec((1, n, n), lambda i: (i % nw, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, n, hd), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((w, h, n, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, rpb, scale, mask)


def window_attention_reference(q, k, v, rpb, scale, mask, num_shift_windows):
    """XLA fallback with identical semantics (used on CPU and in tests)."""
    w, h, n, hd = q.shape
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qf = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-6)
    kf = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-6)
    attn = jnp.einsum("whnd,whmd->whnm", qf, kf, preferred_element_type=jnp.float32)
    attn = attn * scale.reshape(1, -1, 1, 1)
    attn = attn + rpb[None]
    mask_idx = jnp.arange(w) % num_shift_windows
    attn = attn + mask[mask_idx][:, None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum(
        "whnm,whmd->whnd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)
