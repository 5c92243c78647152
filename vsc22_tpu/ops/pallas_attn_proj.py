"""Fused attention + output-projection + residual for ViT-style encoders.

Why: the per-op serving path (ops/pallas_attn) pays ~0.8 ms/layer of pure
XLA HBM traffic AROUND its attention kernel at CLIP scale — transposing
q/k/v from [B, L, C] to the token-lane [B, C, Lp] layout, transposing the
output back, then running the projection GEMM and the residual add as
separate passes. This kernel moves all of that inside one pallas_call:

  out = x + softmax(q k^T / sqrt(hd)) v @ W_proj + b_proj

per-frame grid, with the packed QKV GEMM output [B, L, 3C] read directly:

  - k and v transpose to token-lane [C, Ll] scratches IN VMEM (no HBM
    round trip). Two modes: "dot" multiplies by a rectangular identity on
    the MXU (guaranteed lowering, zero-pads the lane tail for free);
    "vpu" uses the vector-unit transpose (jnp.swapaxes).
  - logits: head groups (group = 128 // hd) pack k block-diagonally into
    alternating [128, group*Ll] scratches -> one K=128 GEMM per group
    emits the whole group's logits side by side in the lane dim (same
    trick as ops/pallas_attn, incl. the dual-scratch overlap).
  - attention*V transposed ([hd, Ls] = v_t x probs^T, K=Ll dense) into a
    [C, Ll] scratch.
  - the attention output transposes back to token-sublane [Ls, C] and the
    projection runs as [Ls, C] x [C, C]: token padding on the SUBLANE
    axis costs 257->272 (+5.8%) instead of the token-lane layout's
    257->384 (+49%) that made whole-block fusion a wash for CLIP.
  - the residual add happens in f32 in the same kernel.

Token padding: the host pads L to the 16-sublane tile (Ls); attention
scratches pad to the 128-lane tile (Ll). Padded key columns are masked to
-1e9 pre-softmax; padded query rows produce garbage that the caller
slices off.

Used by models.clip.CLIPBlock and models.layers.TransformerBlock (via
vit.py) on TPU in deterministic mode. Custom VJP recomputes in plain XLA
(same pattern as pallas_attn / pallas_mlp), so the op is training-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _supported(l: int, c: int, num_heads: int) -> bool:
    if c % num_heads:
        return False
    hd = c // num_heads
    if c % 128 or hd > 128 or 128 % hd or num_heads % (128 // hd):
        return False
    return True


def _make_kernel(num_heads: int, head_dim: int, valid: int, ls: int,
                 transpose_mode: str):
    group = 128 // head_dim
    scale = head_dim ** -0.5

    def _transpose_in(mat, e_s, ll):
        # [Ls, C] -> [C, Ll] with zero lane tail.
        if transpose_mode == "dot":
            return jax.lax.dot_general(
                mat, e_s, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(mat.dtype)
        t = jnp.swapaxes(mat, 0, 1)  # [C, Ls]
        return jnp.concatenate(
            [t, jnp.zeros((t.shape[0], ll - ls), t.dtype)], axis=1
        )

    def _kernel(x_ref, qkv_ref, wp_ref, pb_ref, out_ref,
                kt_ref, vt_ref, ot_ref, kp0_ref, kp1_ref):
        c = x_ref.shape[2]
        ll = kt_ref.shape[1]
        dt = x_ref.dtype

        if transpose_mode == "dot":
            row = jax.lax.broadcasted_iota(jnp.int32, (ls, ll), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (ls, ll), 1)
            e_s = (row == col).astype(dt)  # [Ls, Ll] rectangular identity
        else:
            e_s = None

        kt_ref[:] = _transpose_in(qkv_ref[0, :, c : 2 * c], e_s, ll)
        vt_ref[:] = _transpose_in(qkv_ref[0, :, 2 * c :], e_s, ll)
        # AV writes only lanes [:Ls]; zero the tail once so the output
        # transpose never multiplies garbage (0 * NaN = NaN on the MXU).
        if transpose_mode == "dot" and ls < ll:
            ot_ref[:] = jnp.zeros((c, ll), dt)

        kps = (kp0_ref, kp1_ref)
        for g_i in range(num_heads // group):
            kp_ref = kps[g_i % 2]  # alternating: overlap pack with GEMM
            row0 = g_i * 128
            kp_ref[:] = jnp.zeros((128, group * ll), dt)
            for u in range(group):
                kp_ref[pl.ds(u * head_dim, head_dim), pl.ds(u * ll, ll)] = (
                    kt_ref[pl.ds(row0 + u * head_dim, head_dim), :]
                )
            logits_all = jax.lax.dot_general(
                qkv_ref[0, :, pl.ds(row0, 128)], kp_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [Ls, group*Ll]
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (ls, group * ll), 1
            ) % ll
            logits_all = jnp.where(lane < valid, logits_all, -1e9)
            for u in range(group):
                probs = jax.nn.softmax(
                    logits_all[:, u * ll : (u + 1) * ll], axis=-1
                ).astype(dt)
                vh = vt_ref[pl.ds(row0 + u * head_dim, head_dim), :]
                ot_ref[pl.ds(row0 + u * head_dim, head_dim), pl.ds(0, ls)] = (
                    jax.lax.dot_general(
                        vh, probs, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(dt)
                )

        if transpose_mode == "dot":
            attn_lc = jax.lax.dot_general(
                e_s, ot_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)  # [Ls, C]
        else:
            attn_lc = jnp.swapaxes(ot_ref[:, :ls], 0, 1)
        proj = jax.lax.dot_general(
            attn_lc, wp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + pb_ref[0].astype(jnp.float32)
        out_ref[0] = (x_ref[0].astype(jnp.float32) + proj).astype(dt)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("num_heads", "transpose_mode", "interpret")
)
def attn_proj_residual_fused(
    x: jax.Array,     # [B, L, C] residual input
    qkv: jax.Array,   # [B, L, 3C] packed QKV GEMM output (bias included)
    proj_w: jax.Array,  # [C, C]
    proj_b: jax.Array,  # [C]
    num_heads: int,
    transpose_mode: str = "dot",
    interpret: bool = False,
) -> jax.Array:
    b, l, c = x.shape
    hd = c // num_heads
    ls = -(-l // 16) * 16    # sublane tile (16 covers bf16 and f32)
    ll = -(-l // 128) * 128  # lane tile for the attention scratches
    group = 128 // hd

    if ls != l:
        x = jnp.pad(x, [(0, 0), (0, ls - l), (0, 0)])
        qkv = jnp.pad(qkv, [(0, 0), (0, ls - l), (0, 0)])

    dt = x.dtype
    spec = pl.BlockSpec((1, ls, c), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        _make_kernel(num_heads, hd, l, ls, transpose_mode),
        grid=(b,),
        in_specs=[
            spec,
            pl.BlockSpec((1, ls, 3 * c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, ls, c), dt),
        scratch_shapes=[
            pltpu.VMEM((c, ll), dt),  # k transposed
            pltpu.VMEM((c, ll), dt),  # v transposed
            pltpu.VMEM((c, ll), dt),  # attention out (token-lane)
            pltpu.VMEM((128, group * ll), dt),  # block-diag K pack
            pltpu.VMEM((128, group * ll), dt),  # (alternating)
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x, qkv.astype(dt), proj_w.astype(dt), proj_b.reshape(1, -1))
    return out[:, :l]


def _make_half_block_kernel(num_heads: int, head_dim: int, valid: int,
                            ls: int, eps: float, transpose_mode: str):
    """Variant B: LN1 + QKV GEMMs + attention + projection + residual all in
    one kernel — x makes ONE HBM round trip for the whole attention half of
    the block, and the packed QKV never exists in HBM at all. The QKV/proj
    GEMMs run token-sublane ([Ls, C] x [C, C]), so the token padding costs
    257->272 (+5.8%) rather than the token-lane layout's +49%."""
    group = 128 // head_dim
    scale = head_dim ** -0.5

    def _transpose_in(mat, e_s, ll):
        if transpose_mode == "dot":
            return jax.lax.dot_general(
                mat, e_s, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(mat.dtype)
        t = jnp.swapaxes(mat, 0, 1)
        return jnp.concatenate(
            [t, jnp.zeros((t.shape[0], ll - ls), t.dtype)], axis=1
        )

    def _kernel(x_ref, ln_s_ref, ln_b_ref,
                wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                wp_ref, pb_ref, out_ref,
                kt_ref, vt_ref, ot_ref, kp0_ref, kp1_ref):
        c = x_ref.shape[2]
        ll = kt_ref.shape[1]
        dt = x_ref.dtype
        x = x_ref[0]  # [Ls, C]

        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        ln = (
            (xf - mean) * jax.lax.rsqrt(var + eps)
            * ln_s_ref[0].astype(jnp.float32)
            + ln_b_ref[0].astype(jnp.float32)
        ).astype(dt)

        q = (jax.lax.dot_general(
            ln, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bq_ref[0].astype(jnp.float32)).astype(dt)
        k = (jax.lax.dot_general(
            ln, wk_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bk_ref[0].astype(jnp.float32)).astype(dt)
        v = (jax.lax.dot_general(
            ln, wv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bv_ref[0].astype(jnp.float32)).astype(dt)

        if transpose_mode == "dot":
            row = jax.lax.broadcasted_iota(jnp.int32, (ls, ll), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (ls, ll), 1)
            e_s = (row == col).astype(dt)
        else:
            e_s = None
        kt_ref[:] = _transpose_in(k, e_s, ll)
        vt_ref[:] = _transpose_in(v, e_s, ll)
        if transpose_mode == "dot" and ls < ll:
            ot_ref[:] = jnp.zeros((c, ll), dt)

        kps = (kp0_ref, kp1_ref)
        for g_i in range(num_heads // group):
            kp_ref = kps[g_i % 2]
            row0 = g_i * 128
            kp_ref[:] = jnp.zeros((128, group * ll), dt)
            for u in range(group):
                kp_ref[pl.ds(u * head_dim, head_dim), pl.ds(u * ll, ll)] = (
                    kt_ref[pl.ds(row0 + u * head_dim, head_dim), :]
                )
            logits_all = jax.lax.dot_general(
                q[:, row0 : row0 + 128], kp_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (ls, group * ll), 1
            ) % ll
            logits_all = jnp.where(lane < valid, logits_all, -1e9)
            for u in range(group):
                probs = jax.nn.softmax(
                    logits_all[:, u * ll : (u + 1) * ll], axis=-1
                ).astype(dt)
                vh = vt_ref[pl.ds(row0 + u * head_dim, head_dim), :]
                ot_ref[pl.ds(row0 + u * head_dim, head_dim), pl.ds(0, ls)] = (
                    jax.lax.dot_general(
                        vh, probs, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(dt)
                )

        if transpose_mode == "dot":
            attn_lc = jax.lax.dot_general(
                e_s, ot_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
        else:
            attn_lc = jnp.swapaxes(ot_ref[:, :ls], 0, 1)
        proj = jax.lax.dot_general(
            attn_lc, wp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + pb_ref[0].astype(jnp.float32)
        out_ref[0] = (x.astype(jnp.float32) + proj).astype(dt)

    return _kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "eps", "transpose_mode", "interpret"),
)
def ln_attn_proj_residual_fused(
    x: jax.Array,       # [B, L, C]
    ln_s, ln_b,         # [C]
    qkv_w: jax.Array,   # [C, 3C]
    qkv_b: jax.Array,   # [3C]
    proj_w: jax.Array,  # [C, C]
    proj_b: jax.Array,  # [C]
    num_heads: int,
    eps: float = 1e-5,
    transpose_mode: str = "dot",
    interpret: bool = False,
) -> jax.Array:
    b, l, c = x.shape
    hd = c // num_heads
    ls = -(-l // 16) * 16
    ll = -(-l // 128) * 128
    group = 128 // hd

    if ls != l:
        x = jnp.pad(x, [(0, 0), (0, ls - l), (0, 0)])

    dt = x.dtype
    spec = pl.BlockSpec((1, ls, c), lambda i: (i, 0, 0))

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    out = pl.pallas_call(
        _make_half_block_kernel(num_heads, hd, l, ls, eps, transpose_mode),
        grid=(b,),
        in_specs=[
            spec,
            const((1, c)), const((1, c)),
            const((c, c)), const((c, c)), const((c, c)),
            const((1, c)), const((1, c)), const((1, c)),
            const((c, c)), const((1, c)),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, ls, c), dt),
        scratch_shapes=[
            pltpu.VMEM((c, ll), dt),  # k transposed
            pltpu.VMEM((c, ll), dt),  # v transposed
            pltpu.VMEM((c, ll), dt),  # attention out (token-lane)
            pltpu.VMEM((128, group * ll), dt),  # block-diag K pack
            pltpu.VMEM((128, group * ll), dt),  # (alternating)
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(
        x,
        ln_s.reshape(1, -1), ln_b.reshape(1, -1),
        qkv_w[:, :c].astype(dt), qkv_w[:, c : 2 * c].astype(dt),
        qkv_w[:, 2 * c :].astype(dt),
        qkv_b[:c].reshape(1, -1), qkv_b[c : 2 * c].reshape(1, -1),
        qkv_b[2 * c :].reshape(1, -1),
        proj_w.astype(dt), proj_b.reshape(1, -1),
    )
    return out[:, :l]


def _ln_attn_proj_xla(x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b,
                      num_heads, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    ln = (
        (xf - mean) * jax.lax.rsqrt(var + eps)
        * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)
    ).astype(x.dtype)
    qkv = jnp.dot(
        ln, qkv_w.astype(x.dtype), preferred_element_type=jnp.float32
    ) + qkv_b
    return _attn_proj_xla(x, qkv.astype(x.dtype), proj_w, proj_b, num_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ln_attn_proj_residual(x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b,
                          num_heads, eps=1e-5):
    """x + proj(attn(qkv(LN(x)))) — the whole attention half of a pre-LN
    block in ONE kernel on TPU (once kernel_gate has validated the
    lowering on-device); XLA / legacy packed attention elsewhere."""
    from vsc22_tpu.ops.kernel_gate import new_kernels_enabled

    l, c = x.shape[1], x.shape[2]
    if jax.default_backend() == "tpu" and _supported(l, c, num_heads):
        if new_kernels_enabled():
            return ln_attn_proj_residual_fused(
                x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, num_heads, eps
            )
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(-1, keepdims=True)
        ln = (
            (xf - mean) * jax.lax.rsqrt(var + eps)
            * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)
        ).astype(x.dtype)
        qkv = jnp.dot(
            ln, qkv_w.astype(x.dtype), preferred_element_type=jnp.float32
        ) + qkv_b
        return _attn_proj_legacy(
            x, qkv.astype(x.dtype), proj_w, proj_b, num_heads
        )
    return _ln_attn_proj_xla(
        x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, num_heads, eps
    )


def _half_fwd(x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, num_heads, eps):
    return ln_attn_proj_residual(
        x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b, num_heads, eps
    ), (x, ln_s, ln_b, qkv_w, qkv_b, proj_w, proj_b)


def _half_bwd(num_heads, eps, residuals, g):
    _, vjp = jax.vjp(
        lambda *a: _ln_attn_proj_xla(*a, num_heads, eps), *residuals
    )
    return vjp(g)


ln_attn_proj_residual.defvjp(_half_fwd, _half_bwd)


def _attn_proj_xla(x, qkv, proj_w, proj_b, num_heads):
    b, l, c = x.shape
    hd = c // num_heads
    r = qkv.reshape(b, l, 3, num_heads, hd)
    q, k, v = (r[:, :, i].astype(x.dtype) for i in range(3))
    logits = jnp.einsum(
        "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
    ) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    attn = jnp.einsum(
        "bhlm,bmhd->blhd", probs, v, preferred_element_type=jnp.float32
    ).astype(x.dtype).reshape(b, l, c)
    proj = jnp.dot(
        attn, proj_w.astype(x.dtype), preferred_element_type=jnp.float32
    ) + proj_b.astype(jnp.float32)
    return (x.astype(jnp.float32) + proj).astype(x.dtype)


def _attn_proj_legacy(x, qkv, proj_w, proj_b, num_heads):
    """Round-2 proven path: packed attention kernel + XLA proj/residual.
    Used while ops.kernel_gate has not yet validated the fused kernel on
    real hardware (Mosaic lowering can only be proven on-device)."""
    from vsc22_tpu.ops.pallas_attn import packed_attention

    b, l, c = x.shape
    hd = c // num_heads
    r = qkv.reshape(b, l, 3, num_heads, hd)
    q, k, v = (r[:, :, i].astype(x.dtype) for i in range(3))
    out = packed_attention(q * (hd ** -0.5), k, v)
    out = out.reshape(b, l, c).astype(x.dtype)
    proj = jnp.dot(
        out, proj_w.astype(x.dtype), preferred_element_type=jnp.float32
    ) + proj_b.astype(jnp.float32)
    return (x.astype(jnp.float32) + proj).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def attn_proj_residual(x, qkv, proj_w, proj_b, num_heads):
    """x + softmax(q k^T / sqrt(hd)) v @ W_proj + b_proj, q/k/v packed in
    `qkv` [B, L, 3C]. Pallas-fused on TPU (supported dims, once
    kernel_gate has validated the lowering on-device; packed-attention
    legacy path otherwise), XLA elsewhere."""
    from vsc22_tpu.ops.kernel_gate import new_kernels_enabled

    l, c = x.shape[1], x.shape[2]
    if jax.default_backend() == "tpu" and _supported(l, c, num_heads):
        if new_kernels_enabled():
            return attn_proj_residual_fused(x, qkv, proj_w, proj_b, num_heads)
        return _attn_proj_legacy(x, qkv, proj_w, proj_b, num_heads)
    return _attn_proj_xla(x, qkv, proj_w, proj_b, num_heads)


def _fwd(x, qkv, proj_w, proj_b, num_heads):
    return attn_proj_residual(x, qkv, proj_w, proj_b, num_heads), (
        x, qkv, proj_w, proj_b,
    )


def _bwd(num_heads, residuals, g):
    _, vjp = jax.vjp(lambda *a: _attn_proj_xla(*a, num_heads), *residuals)
    return vjp(g)


attn_proj_residual.defvjp(_fwd, _bwd)
