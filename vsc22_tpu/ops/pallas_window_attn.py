"""Fused SwinV2 cosine window attention (Pallas TPU kernel).

The XLA path materializes the per-window attention matrices
[B*nW, H, N, N] in HBM for every block (bias add, mask add, softmax — each a
round trip); at SwinV2-Base@256 that is ~1GB per early-stage block and makes
the backbone HBM-bound (~2.6% MXU measured). This kernel computes, per
(window, head) grid cell: L2-normalize(q,k) -> scaled cosine logits -> +CPB
bias -> +shift mask -> softmax -> @v entirely in VMEM, so HBM traffic is
just q/k/v/out plus the (once-fetched) bias/mask tables.

Semantics match models.swinv2.WindowAttention (reference
D1/train/train_v106/vsc/.../swinv2.py:145-186). The relative-position bias
(16*sigmoid(cpb)) and the exp-clamped per-head logit scale are precomputed
per layer; the shift mask is indexed per window via the grid index map
(window order inside a batch item is row-major, so mask index = w % nW).

Interpret mode covers CPU testing; non-TPU backends fall back to the XLA
implementation inside the model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(g_windows: int, h: int):
    """Kernel over a group of G consecutive windows x H heads.

    The per-(window, head) problems are tiny [N, hd] matmuls; batching them
    per grid step amortizes grid/DMA overhead. The inner sweep is a
    fori_loop (NOT a Python unroll — unrolled iterations each get their own
    VMEM stack temporaries and blow the 16MB scoped-vmem limit)."""

    def _kernel(scale_ref, q_ref, k_ref, v_ref, rpb_ref, mask_ref, out_ref):
        def body(idx, carry):
            g = idx // h
            h_i = idx % h
            q = q_ref[0, g, h_i].astype(jnp.float32)  # [N, hd]
            k = k_ref[0, g, h_i].astype(jnp.float32)
            v = v_ref[0, g, h_i]
            q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
            k = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
            attn = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),  # [N, N]
                preferred_element_type=jnp.float32,
            )
            attn = attn * scale_ref[h_i]
            attn = attn + rpb_ref[h_i]
            attn = attn + mask_ref[0, g]
            attn = jax.nn.softmax(attn, axis=-1)
            out = jax.lax.dot_general(
                attn.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),  # [N, hd]
                preferred_element_type=jnp.float32,
            )
            out_ref[0, g, h_i] = out.astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, g_windows * h, body, 0)

    return _kernel


@functools.partial(jax.jit, static_argnames=("num_shift_windows", "interpret"))
def _fused_call(
    q: jax.Array,  # [W, H, N, hd] (W = batch * windows, window-major per item)
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

    def vmem_estimate(g):
        qkv_out = 4 * 2 * g * h * n * hd * q.dtype.itemsize  # 4 tensors, 2 buffers
        rpb_bytes = 2 * h * n * n * 4
        mask_bytes = 2 * g * n * n * 4
        temps = 4 * n * n * 4
        return qkv_out + rpb_bytes + mask_bytes + temps

    # Group G consecutive windows per grid step; G amortizes grid/DMA
    # overhead but must keep the VMEM working set under the 16MB scoped
    # limit (with margin). G must divide nW (nW is 1/4/16 here).
    g_win = nw
    while g_win > 1 and (g_win > 4 or nw % g_win or vmem_estimate(g_win) > 9 * 2**20):
        g_win -= 1
    num_groups = w // g_win
    groups_per_item = nw // g_win
    q5, k5, v5 = (x.reshape(num_groups, g_win, h, n, hd) for x in (q, k, v))
    qkv_spec = pl.BlockSpec((1, g_win, h, n, hd), lambda i, _s: (i, 0, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_groups,),
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((h, n, n), lambda i, _s: (0, 0, 0)),
            # Mask rows for this window group (grouped view: [nW/G, G, N, N]).
            pl.BlockSpec((1, g_win, n, n), lambda i, _s: (i % groups_per_item, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, g_win, h, n, hd), lambda i, _s: (i, 0, 0, 0, 0)),
    )
    mask4 = mask.reshape(groups_per_item, g_win, n, n)
    out = pl.pallas_call(
        _make_kernel(g_win, h),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_groups, g_win, h, n, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(scale, q5, k5, v5, rpb, mask4)
    return out.reshape(w, h, n, hd)


def window_attention_fused(
    q, k, v, rpb, scale, mask, num_shift_windows, interpret: bool = False
):
    """Differentiable entry point for the fused kernel.

    Forward runs the Pallas kernel; the backward recomputes through the
    (memory-bounded, chunked) XLA implementation — a raw `pallas_call` has
    no JVP rule, so without this wrapper any differentiation through the
    fused path (FGM input gradients, training with `fused=True`) fails at
    trace time.
    """
    return _window_attention(q, k, v, rpb, scale, mask, num_shift_windows, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _window_attention(q, k, v, rpb, scale, mask, num_shift_windows, interpret):
    return _fused_call(q, k, v, rpb, scale, mask, num_shift_windows, interpret)


def _wa_fwd(q, k, v, rpb, scale, mask, num_shift_windows, interpret):
    out = _fused_call(q, k, v, rpb, scale, mask, num_shift_windows, interpret)
    return out, (q, k, v, rpb, scale, mask)


def _wa_bwd(num_shift_windows, interpret, residuals, g):
    _, vjp = jax.vjp(
        lambda *a: window_attention_chunked(*a, num_shift_windows), *residuals
    )
    return vjp(g)


_window_attention.defvjp(_wa_fwd, _wa_bwd)


def window_attention_reference(q, k, v, rpb, scale, mask, num_shift_windows):
    """XLA fallback with identical semantics (used on CPU and in tests)."""
    w, h, n, hd = q.shape
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qf = qf * jax.lax.rsqrt(jnp.sum(qf * qf, axis=-1, keepdims=True) + 1e-12)
    kf = kf * jax.lax.rsqrt(jnp.sum(kf * kf, axis=-1, keepdims=True) + 1e-12)
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


def window_attention_chunked(
    q, k, v, rpb, scale, mask, num_shift_windows, max_temp_bytes=128 * 2**20
):
    """Reference semantics with the [W, H, N, N] logits bounded to chunks.

    The XLA reference materializes per-window attention matrices for ALL
    windows at once — at SwinV2-Base training batches that is >20 GB of f32
    temps and the backward pass OOMs a 16 GB chip. This form sweeps window
    chunks with a `lax.map` whose body is `jax.checkpoint`ed: forward and
    backward peak at one chunk's logits (~`max_temp_bytes`), and gradients
    are exact (identical math per window, rematerialized in the backward).
    Delegates to the one-shot reference when everything fits.
    """
    w, h, n, hd = q.shape
    nw = num_shift_windows
    chunk = max(1, max_temp_bytes // (h * n * n * 4))
    if chunk >= w:
        return window_attention_reference(q, k, v, rpb, scale, mask, nw)
    groups = -(-w // chunk)
    pad = groups * chunk - w
    qs, ks, vs = (
        jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0))) for x in (q, k, v)
    )
    mask_idx = (jnp.arange(groups * chunk) % nw).reshape(groups, chunk)

    def body(args):
        qc, kc, vc, ic = args
        qf = qc.astype(jnp.float32)
        kf = kc.astype(jnp.float32)
        qf = qf * jax.lax.rsqrt(jnp.sum(qf * qf, axis=-1, keepdims=True) + 1e-12)
        kf = kf * jax.lax.rsqrt(jnp.sum(kf * kf, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum(
            "whnd,whmd->whnm", qf, kf, preferred_element_type=jnp.float32
        )
        attn = attn * scale.reshape(1, -1, 1, 1)
        attn = attn + rpb[None]
        attn = attn + mask[ic][:, None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "whnm,whmd->whnd",
            attn.astype(vc.dtype),
            vc,
            preferred_element_type=jnp.float32,
        )
        return out.astype(q.dtype)

    out = jax.lax.map(
        jax.checkpoint(body),
        (
            qs.reshape(groups, chunk, h, n, hd),
            ks.reshape(groups, chunk, h, n, hd),
            vs.reshape(groups, chunk, h, n, hd),
            mask_idx,
        ),
    )
    return out.reshape(groups * chunk, h, n, hd)[:w]
