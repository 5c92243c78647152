"""Fully-fused pre-LN transformer block (ViT/CLIP) as one Pallas TPU kernel.

    x   = x + proj(attn(LN1(x)))
    out = x + fc2(act(fc1(LN2(x))))

One frame per grid cell, entirely in VMEM: the [L, C] activations make one
HBM round trip per block instead of ~12 (two LNs, QKV, logits, probs, AV,
proj, MLP hidden, residuals), and every GEMM runs at full MXU contraction
rate via the layout tricks proven in ops/pallas_swin_block:

  - QKV: three transposed [C,C] x [L,C] -> [C,L] GEMMs (K=C);
  - logits: head groups (group = 128//hd) pack k block-diagonally into a
    [group*hd, group*L] scratch -> one K=128 GEMM per group emits all the
    group's logits side by side in the lane dim;
  - attention*V transposed ([hd,L] = v x probs^T, K=L) into a [C,L] scratch;
  - projection: one dense transposed [C,C] x [C,L] GEMM, then a single
    [C,L] -> [L,C] transpose rejoins the residual stream;
  - MLP: dense [L,C] x [C,F] / [F,C] GEMMs with the hidden activations
    VMEM-resident (QuickGELU or exact GeLU).

Token padding to the 128-lane tile happens here (padded key columns are
masked to -1e9; padded query rows flow through as garbage and are sliced
off by the caller).

Used by models.clip.CLIPBlock and models.layers.TransformerBlock on TPU in
deterministic mode. Custom VJP recomputes in plain XLA (training-safe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsc22_tpu.ops.pallas_mlp import _gelu_exact

_LN_EPS = 1e-6


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {"gelu": _gelu_exact, "quick_gelu": _quick_gelu}


def _ln_rows_f32(x, scale, bias, eps=_LN_EPS):
    """LayerNorm over the last axis; x [L, C] f32."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _make_kernel(num_heads: int, head_dim: int, group: int, valid: int,
                 activation: str, eps: float):
    ghd = group * head_dim
    act = _ACTS[activation]

    def _kernel(
        x_ref,  # [1, Lp, C]
        ln1_s_ref, ln1_b_ref,  # [1, C]
        wq_t_ref, wk_t_ref, wv_t_ref,  # [C, C] output-major
        bq_ref, bk_ref, bv_ref,  # [C, 1] f32
        wproj_ref,  # [C, C] (used transposed)
        proj_b_ref,  # [1, C] f32
        ln2_s_ref, ln2_b_ref,  # [1, C]
        fc1_w_ref,  # [C, F]
        fc1_b_ref,  # [1, F]
        fc2_w_ref,  # [F, C]
        fc2_b_ref,  # [1, C]
        out_ref,  # [1, Lp, C]
        qt_ref, kt_ref, vt_ref, ot_ref,  # scratch [C, Lp]
        kp_ref,  # scratch [ghd, group*Lp]
    ):
        lp = x_ref.shape[1]
        c = x_ref.shape[2]
        x = x_ref[0]  # [Lp, C]

        ln1 = _ln_rows_f32(
            x.astype(jnp.float32),
            ln1_s_ref[0].astype(jnp.float32),
            ln1_b_ref[0].astype(jnp.float32),
            eps,
        ).astype(x.dtype)

        scale = head_dim ** -0.5
        qt_ref[:] = (
            jax.lax.dot_general(
                wq_t_ref[:], ln1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bq_ref[:]
        ) * scale
        kt_ref[:] = jax.lax.dot_general(
            wk_t_ref[:], ln1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bk_ref[:]
        vt_ref[:] = (
            jax.lax.dot_general(
                wv_t_ref[:], ln1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bv_ref[:]
        ).astype(x.dtype)

        def head_group(g_i, carry):
            row0 = g_i * ghd
            kp_ref[:] = jnp.zeros((ghd, group * lp), x.dtype)
            for u in range(group):
                kp_ref[pl.ds(u * head_dim, head_dim), pl.ds(u * lp, lp)] = (
                    kt_ref[pl.ds(row0 + u * head_dim, head_dim), :].astype(x.dtype)
                )
            logits_all = jax.lax.dot_general(
                qt_ref[pl.ds(row0, ghd), :].astype(x.dtype), kp_ref[:],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Lp, group*Lp]
            if valid < lp:
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (lp, group * lp), 1
                ) % lp
                logits_all = jnp.where(col < valid, logits_all, -1e9)
            for u in range(group):
                probs = jax.nn.softmax(
                    logits_all[:, u * lp : (u + 1) * lp], axis=-1
                ).astype(x.dtype)
                vh = vt_ref[pl.ds(row0 + u * head_dim, head_dim), :]
                ot_ref[pl.ds(row0 + u * head_dim, head_dim), :] = (
                    jax.lax.dot_general(
                        vh, probs, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(x.dtype)
                )
            return carry

        jax.lax.fori_loop(0, num_heads // group, head_group, 0)

        proj_t = jax.lax.dot_general(
            wproj_ref[:], ot_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + proj_b_ref[0].astype(jnp.float32)[:, None]  # [C, Lp]
        x1 = (x.astype(jnp.float32) + proj_t.T).astype(x.dtype)

        ln2 = _ln_rows_f32(
            x1.astype(jnp.float32),
            ln2_s_ref[0].astype(jnp.float32),
            ln2_b_ref[0].astype(jnp.float32),
            eps,
        ).astype(x.dtype)
        hidden = jax.lax.dot_general(
            ln2, fc1_w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + fc1_b_ref[0].astype(jnp.float32)
        hidden = act(hidden).astype(x.dtype)
        mlp = jax.lax.dot_general(
            hidden, fc2_w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + fc2_b_ref[0].astype(jnp.float32)
        out_ref[0] = (x1.astype(jnp.float32) + mlp).astype(out_ref.dtype)

    return _kernel


def _vmem_estimate(lp: int, c: int, f: int, itemsize: int) -> int:
    x_out = 2 * 2 * lp * c * itemsize
    weights = (4 * c * c + 2 * c * f) * itemsize
    scratch = 3 * c * lp * 4 + c * lp * itemsize + 128 * 2 * lp * itemsize
    temps = lp * f * 4 + 3 * lp * lp * 4 + 4 * lp * c * 4
    return x_out + weights + scratch + temps


@functools.partial(
    jax.jit, static_argnames=("num_heads", "activation", "interpret", "eps")
)
def vit_block_fused(
    x: jax.Array,  # [B, L, C]
    ln1_s, ln1_b,
    qkv_w,  # [C, 3C]
    qkv_b,  # [3C]
    proj_w, proj_b,
    ln2_s, ln2_b,
    fc1_w, fc1_b,
    fc2_w, fc2_b,
    num_heads: int,
    activation: str = "gelu",
    interpret: bool = False,
    eps: float = _LN_EPS,
) -> jax.Array:
    b, l, c = x.shape
    hd = c // num_heads
    f = fc1_w.shape[1]
    lp = -(-l // 128) * 128

    group = 1
    for cand in range(min(4, num_heads, max(128 // hd, 1)), 0, -1):
        if num_heads % cand == 0:
            group = cand
            break

    if lp != l:
        x = jnp.pad(x, [(0, 0), (0, lp - l), (0, 0)])

    dt = x.dtype
    wq_t = qkv_w[:, :c].T.astype(dt)
    wk_t = qkv_w[:, c : 2 * c].T.astype(dt)
    wv_t = qkv_w[:, 2 * c :].T.astype(dt)
    bq = qkv_b[:c].reshape(c, 1).astype(jnp.float32)
    bk = qkv_b[c : 2 * c].reshape(c, 1).astype(jnp.float32)
    bv = qkv_b[2 * c :].reshape(c, 1).astype(jnp.float32)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    out = pl.pallas_call(
        _make_kernel(num_heads, hd, group, l, activation, eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, lp, c), lambda i: (i, 0, 0)),
            const((1, c)), const((1, c)),
            const((c, c)), const((c, c)), const((c, c)),
            const((c, 1)), const((c, 1)), const((c, 1)),
            const((c, c)),
            const((1, c)),
            const((1, c)), const((1, c)),
            const((c, f)),
            const((1, f)),
            const((f, c)),
            const((1, c)),
        ],
        out_specs=pl.BlockSpec((1, lp, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lp, c), dt),
        scratch_shapes=[
            pltpu.VMEM((c, lp), jnp.float32),  # q (scaled, transposed)
            pltpu.VMEM((c, lp), jnp.float32),  # k
            pltpu.VMEM((c, lp), dt),  # v
            pltpu.VMEM((c, lp), dt),  # attention out (transposed)
            pltpu.VMEM((group * hd, group * lp), dt),  # block-diag K pack
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(
        x,
        ln1_s.reshape(1, -1), ln1_b.reshape(1, -1),
        wq_t, wk_t, wv_t,
        bq, bk, bv,
        proj_w.astype(dt),
        proj_b.reshape(1, -1),
        ln2_s.reshape(1, -1), ln2_b.reshape(1, -1),
        fc1_w.astype(dt),
        fc1_b.reshape(1, -1),
        fc2_w.astype(dt),
        fc2_b.reshape(1, -1),
    )
    return out[:, :l]


def vit_block_reference(
    x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
    fc1_w, fc1_b, fc2_w, fc2_b, num_heads, activation="gelu", eps=_LN_EPS,
):
    """XLA twin with identical semantics (CPU path, VJP recompute)."""
    b, l, c = x.shape
    hd = c // num_heads
    ln1 = _ln_rows_f32(
        x.astype(jnp.float32), ln1_s.astype(jnp.float32), ln1_b.astype(jnp.float32),
        eps,
    ).astype(x.dtype)
    qkv = jnp.dot(ln1, qkv_w, preferred_element_type=jnp.float32) + qkv_b
    qkv = qkv.reshape(b, l, 3, num_heads, hd)
    q, k, v = (qkv[:, :, i].astype(x.dtype) for i in range(3))
    logits = jnp.einsum(
        "blhd,bmhd->bhlm", q * (hd**-0.5), k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhlm,bmhd->blhd", probs, v, preferred_element_type=jnp.float32)
    attn = attn.reshape(b, l, c).astype(x.dtype)
    proj = jnp.dot(attn, proj_w, preferred_element_type=jnp.float32) + proj_b
    x1 = (x.astype(jnp.float32) + proj).astype(x.dtype)
    ln2 = _ln_rows_f32(
        x1.astype(jnp.float32), ln2_s.astype(jnp.float32), ln2_b.astype(jnp.float32),
        eps,
    ).astype(x.dtype)
    hidden = jnp.dot(ln2, fc1_w, preferred_element_type=jnp.float32) + fc1_b
    hidden = _ACTS[activation](hidden).astype(x.dtype)
    mlp = jnp.dot(hidden, fc2_w, preferred_element_type=jnp.float32) + fc2_b
    return (x1.astype(jnp.float32) + mlp).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def vit_block(
    x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
    fc1_w, fc1_b, fc2_w, fc2_b, num_heads, activation="gelu", eps=_LN_EPS,
):
    """One pre-LN transformer block; Pallas-fused on TPU, XLA elsewhere."""
    args = (x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
            fc1_w, fc1_b, fc2_w, fc2_b)
    l, c = x.shape[1], x.shape[2]
    f = fc1_w.shape[1]
    lp = -(-l // 128) * 128
    if (
        jax.default_backend() == "tpu"
        and c % 128 == 0
        and f % 128 == 0
        and _vmem_estimate(lp, c, f, x.dtype.itemsize) < 80 * 2**20
    ):
        return vit_block_fused(
            *args, num_heads=num_heads, activation=activation, eps=eps
        )
    return vit_block_reference(*args, num_heads, activation, eps)


def _fwd(x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
         fc1_w, fc1_b, fc2_w, fc2_b, num_heads, activation, eps):
    args = (x, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
            fc1_w, fc1_b, fc2_w, fc2_b)
    return vit_block(*args, num_heads, activation, eps), args


def _bwd(num_heads, activation, eps, residuals, g):
    _, vjp = jax.vjp(
        lambda *a: vit_block_reference(*a, num_heads, activation, eps), *residuals
    )
    return vjp(g)


vit_block.defvjp(_fwd, _bwd)
