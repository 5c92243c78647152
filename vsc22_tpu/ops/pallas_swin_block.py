"""Fully-fused SwinV2 block (Pallas TPU kernel): QKV -> cosine window
attention -> proj -> res-post-norm -> MLP -> res-post-norm, per window,
entirely in VMEM.

Why: SwinV2-Base@256 is overhead/HBM-bound under XLA (~3% MXU measured):
every block makes ~15 HBM passes over the activations (QKV in/out, attention
logits, proj, two f32 LayerNorms, MLP hidden, residuals). Fusing attention
alone (+5%) and the MLP alone (+6%) left the inter-op traffic; this kernel
performs ONE block = one HBM read of the window tensor and one write, with
weights fetched once (constant block index maps).

Semantics match models.swinv2.SwinBlock's inner sequence exactly
(reference: D1/train/train_v106/vsc/.../swinv2.py:140-286):
  attn_out = proj(cosine_attn(qkv(x)))            # per 16x16 window
  x        = x + LN1(attn_out)                    # res-post-norm
  out      = x + LN2(gelu(x@W1+b1)@W2+b2)
with f32 softmax/LayerNorm statistics, bf16 GEMMs (f32 accumulation), the
relative-position bias (16*sigmoid(CPB)) and exp-clamped per-head logit
scale precomputed per layer, and the shift mask indexed per window.

Every GEMM in the block runs at full MXU contraction rate despite hd=32
heads (naive per-head attention GEMMs use 1/4 of the MXU's K dim):
  - QKV: three transposed GEMMs ([C,C] x [N,C] -> [C,N]) into VMEM scratch;
    token-transposed, each head is a [hd, N] SUBLANE slice (lane slicing is
    only legal at 128 alignment, sublane slicing at the tile multiple).
  - logits: 4 heads' normalized k pack into a BLOCK-DIAGONAL [4hd, 4N]
    scratch, so one [N,4hd]x[4hd,4N] GEMM (K=128) emits all four heads'
    cosine logits side by side in the lane dimension.
  - attention*V: computed transposed ([hd,N] = v_t x probs^T, K=N dense)
    into a [C, N] scratch at the head's sublane offset.
  - projection: ONE dense transposed [C,C]x[C,N] GEMM (K=C) replaces H
    per-head K=hd GEMMs; LN runs over the sublane axis and a single
    [C,N]->[N,C] transpose rejoins the residual stream.
Unshifted blocks skip the mask operand entirely (VMEM + grouping freedom).
Measured on v5e: 1328 -> 1812 frames/s for the full SwinV2-Base@256.

Grid: one step per group of G windows (G auto-picked to amortize grid/DMA
overhead under the VMEM budget); inside, a fori_loop sweeps windows (never
a Python unroll — each unrolled iteration would get its own VMEM stack
slab).

Differentiation: custom VJP recomputes in plain XLA for the backward pass,
so the kernel is safe inside training steps (same pattern as pallas_mlp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsc22_tpu.ops.pallas_mlp import _gelu_exact

_LN_EPS = 1e-6  # flax nn.LayerNorm default


def _layernorm_f32(x, scale, bias):
    """LayerNorm with f32 statistics over the last axis; x f32 [N, C]."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + _LN_EPS)
    return y * scale + bias


def _make_kernel(g_windows: int, num_heads: int, head_dim: int,
                 apply_mask: bool = True, head_unroll: int = 4):
    def _kernel(
        scale_ref,  # [H] f32 (scalar prefetch)
        x_ref,  # [1, G, N, C]
        wq_t_ref,  # [C, C] (output-major: rows = q features)
        wk_t_ref,  # [C, C]
        wv_t_ref,  # [C, C]
        bq_ref,  # [C, 1] f32
        bv_ref,  # [C, 1] f32
        wproj_ref,  # [C, C] (proj kernel; used transposed)
        proj_b_ref,  # [1, C] f32
        ln1_s_ref,  # [1, C]
        ln1_b_ref,  # [1, C]
        fc1_w_ref,  # [C, F]
        fc1_b_ref,  # [1, F]
        fc2_w_ref,  # [F, C]
        fc2_b_ref,  # [1, C]
        ln2_s_ref,  # [1, C]
        ln2_b_ref,  # [1, C]
        rpb_ref,  # [H, N, N] f32
        *rest,  # [mask_ref if apply_mask,] out_ref, qt, kt, vt
    ):
        if apply_mask:
            mask_ref, out_ref, qt_ref, kt_ref, vt_ref, kp_ref, kp2_ref, ot_ref = rest
        else:
            # Unshifted blocks never ship a mask operand (saves VMEM and
            # allows window groups untied to the shift-mask period).
            mask_ref = None
            out_ref, qt_ref, kt_ref, vt_ref, kp_ref, kp2_ref, ot_ref = rest
        h = num_heads
        hd = head_dim
        n = x_ref.shape[2]
        c = x_ref.shape[3]

        # Heads per packed group: the block-diagonal K packing lifts the
        # logits contraction from K=hd (25% MXU at hd=32) to K=group*hd.
        group = 1
        for cand in range(min(head_unroll, h, 128 // hd), 0, -1):
            if h % cand == 0:
                group = cand
                break
        ghd = group * hd

        def body(g, carry):
            x = x_ref[0, g]  # [N, C] compute dtype
            mask = mask_ref[0, g] if apply_mask else None  # [N, N] f32

            # QKV as three FULL-rate transposed GEMMs ([C,C] x [N,C] -> [C,N])
            # into scratch: per-head hd=32 output GEMMs would waste 3/4 of
            # the MXU's K dim, and lane slicing below 128 is forbidden —
            # transposed, each head is a [hd, N] SUBLANE slice (allowed).
            qt_ref[:] = jax.lax.dot_general(
                wq_t_ref[:], x, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bq_ref[:]
            kt_ref[:] = jax.lax.dot_general(
                wk_t_ref[:], x, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # k bias is fixed at zero (SwinV2 convention)
            vt_ref[:] = (
                jax.lax.dot_general(
                    wv_t_ref[:], x, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bv_ref[:]
            ).astype(x.dtype)

            # Python-unrolled head groups with ALTERNATING block-diagonal
            # K scratch: one buffer serializes group g+1's VMEM packing
            # behind group g's logits GEMM; two buffers let Mosaic overlap
            # packing with MXU work (same trick as ops/pallas_attn).
            def head_group(g_i, kp_ref):
                row0 = g_i * ghd
                # Normalize the whole group's q rows (per-head 32-row norms).
                qg = qt_ref[pl.ds(row0, ghd), :]  # [ghd, N] f32
                kg = kt_ref[pl.ds(row0, ghd), :]
                qsq = qg * qg
                ksq = kg * kg
                # Per-head sums: reshape [group, hd, N] sums over hd.
                qnorm = jnp.sum(qsq.reshape(group, hd, n), axis=1)  # [group, N]
                knorm = jnp.sum(ksq.reshape(group, hd, n), axis=1)
                qinv = jax.lax.rsqrt(qnorm + 1e-12)
                kinv = jax.lax.rsqrt(knorm + 1e-12)
                qn = (qg.reshape(group, hd, n) * qinv[:, None, :]).reshape(ghd, n).astype(x.dtype)
                kn = (kg.reshape(group, hd, n) * kinv[:, None, :]).reshape(ghd, n).astype(x.dtype)

                # Block-diagonal K packing: kp[hd*u : hd*(u+1), u*N:(u+1)*N]
                # holds head u's normalized k; the single [N,ghd]x[ghd,g*N]
                # GEMM then yields every head's logits side by side at full
                # MXU K-rate.
                kp_ref[:] = jnp.zeros((ghd, group * n), x.dtype)
                for u in range(group):
                    kp_ref[pl.ds(u * hd, hd), pl.ds(u * n, n)] = kn[
                        u * hd : (u + 1) * hd, :
                    ]
                logits_all = jax.lax.dot_general(
                    qn, kp_ref[:], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [N, group*N]

                for u in range(group):
                    h_i = g_i * group + u
                    logits = logits_all[:, u * n : (u + 1) * n]
                    logits = logits * scale_ref[h_i] + rpb_ref[h_i]
                    if apply_mask:
                        logits = logits + mask
                    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
                    vh = vt_ref[pl.ds(h_i * hd, hd), :]
                    # attention*V transposed: [hd,N]x[N,N] with K=N (dense)
                    ot_ref[pl.ds(h_i * hd, hd), :] = jax.lax.dot_general(
                        vh, probs, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(x.dtype)

            for g_i in range(h // group):
                head_group(g_i, kp_ref if g_i % 2 == 0 else kp2_ref)

            # Dense transposed projection: [C,C]x[C,N] at K=C, then LN over
            # the C (sublane) axis and ONE transpose back to [N, C].
            proj_t = jax.lax.dot_general(
                wproj_ref[:], ot_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + proj_b_ref[0].astype(jnp.float32)[:, None]  # [C, N] f32
            mean_t = jnp.mean(proj_t, axis=0, keepdims=True)
            var_t = jnp.mean(jnp.square(proj_t - mean_t), axis=0, keepdims=True)
            ln1_t = (proj_t - mean_t) * jax.lax.rsqrt(var_t + _LN_EPS)
            ln1_t = (
                ln1_t * ln1_s_ref[0].astype(jnp.float32)[:, None]
                + ln1_b_ref[0].astype(jnp.float32)[:, None]
            )
            x1 = (x.astype(jnp.float32) + ln1_t.T).astype(x.dtype)

            # ---- MLP + res-post-norm ----
            hcur = jax.lax.dot_general(
                x1, fc1_w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + fc1_b_ref[0].astype(jnp.float32)
            hcur = _gelu_exact(hcur).astype(x.dtype)
            mlp = jax.lax.dot_general(
                hcur, fc2_w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + fc2_b_ref[0].astype(jnp.float32)
            ln2 = _layernorm_f32(
                mlp, ln2_s_ref[0].astype(jnp.float32), ln2_b_ref[0].astype(jnp.float32)
            )
            out_ref[0, g] = (x1.astype(jnp.float32) + ln2).astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, g_windows, body, 0)

    return _kernel


def _make_kernel_batched(g_windows: int, num_heads: int, head_dim: int,
                         apply_mask: bool = True, head_unroll: int = 4):
    """Window-group-batched variant: QKV, cosine norms, projection, LNs and
    the MLP run ONCE over all G windows ([C, G*N] / [G*N, C] GEMMs), so the
    small-C stages keep the MXU fed; only logits/softmax/attention*V sweep
    windows in the fori_loop (the softmax cannot mix windows). Requires
    n % 128 == 0 so per-window lane slices of the batched scratches stay
    tile-aligned (stages 1-3 at window 16; stage 4's N=64 keeps the
    per-window kernel, where it already runs at ~92 TF/s)."""

    def _kernel(
        scale_ref, x_ref, wq_t_ref, wk_t_ref, wv_t_ref, bq_ref, bv_ref,
        wproj_ref, proj_b_ref, ln1_s_ref, ln1_b_ref, fc1_w_ref, fc1_b_ref,
        fc2_w_ref, fc2_b_ref, ln2_s_ref, ln2_b_ref, rpb_ref, *rest,
    ):
        if apply_mask:
            (mask_ref, out_ref, qt_ref, kt_ref, vt_ref, kp_ref, kp2_ref,
             ot_ref, qn_ref, kn_ref) = rest
        else:
            mask_ref = None
            (out_ref, qt_ref, kt_ref, vt_ref, kp_ref, kp2_ref, ot_ref,
             qn_ref, kn_ref) = rest
        h = num_heads
        hd = head_dim
        n = x_ref.shape[2]
        c = x_ref.shape[3]
        gn = g_windows * n

        group = 1
        for cand in range(min(head_unroll, h, 128 // hd), 0, -1):
            if h % cand == 0:
                group = cand
                break
        ghd = group * hd

        x_all = x_ref[0].reshape(gn, c)  # [G*N, C] compute dtype

        # Batched QKV: one transposed GEMM per tensor over the whole group.
        qt_ref[:] = jax.lax.dot_general(
            wq_t_ref[:], x_all, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bq_ref[:]
        kt_ref[:] = jax.lax.dot_general(
            wk_t_ref[:], x_all, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # k bias is fixed at zero (SwinV2 convention)
        vt_ref[:] = (
            jax.lax.dot_general(
                wv_t_ref[:], x_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bv_ref[:]
        ).astype(x_all.dtype)

        # Batched cosine normalization (per-head rsqrt over hd channel rows).
        qg = qt_ref[:]
        kg = kt_ref[:]
        qnorm = jnp.sum(jnp.square(qg).reshape(h, hd, gn), axis=1)
        knorm = jnp.sum(jnp.square(kg).reshape(h, hd, gn), axis=1)
        qn_ref[:] = (
            qg.reshape(h, hd, gn) * jax.lax.rsqrt(qnorm + 1e-12)[:, None, :]
        ).reshape(c, gn).astype(x_all.dtype)
        kn_ref[:] = (
            kg.reshape(h, hd, gn) * jax.lax.rsqrt(knorm + 1e-12)[:, None, :]
        ).reshape(c, gn).astype(x_all.dtype)

        def body(g, carry):
            mask = mask_ref[0, g] if apply_mask else None
            col0 = g * n

            def head_group(g_i, kp):
                row0 = g_i * ghd
                kp[:] = jnp.zeros((ghd, group * n), x_all.dtype)
                for u in range(group):
                    kp[pl.ds(u * hd, hd), pl.ds(u * n, n)] = kn_ref[
                        pl.ds(row0 + u * hd, hd), pl.ds(col0, n)
                    ]
                logits_all = jax.lax.dot_general(
                    qn_ref[pl.ds(row0, ghd), pl.ds(col0, n)], kp[:],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [N, group*N]
                for u in range(group):
                    h_i = g_i * group + u
                    logits = logits_all[:, u * n : (u + 1) * n]
                    logits = logits * scale_ref[h_i] + rpb_ref[h_i]
                    if apply_mask:
                        logits = logits + mask
                    probs = jax.nn.softmax(logits, axis=-1).astype(x_all.dtype)
                    vh = vt_ref[pl.ds(h_i * hd, hd), pl.ds(col0, n)]
                    ot_ref[pl.ds(h_i * hd, hd), pl.ds(col0, n)] = (
                        jax.lax.dot_general(
                            vh, probs, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(x_all.dtype)
                    )

            for g_i in range(h // group):
                head_group(g_i, kp_ref if g_i % 2 == 0 else kp2_ref)
            return carry

        jax.lax.fori_loop(0, g_windows, body, 0)

        # Batched projection + res-post-norm + MLP over the whole group.
        proj_t = jax.lax.dot_general(
            wproj_ref[:], ot_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + proj_b_ref[0].astype(jnp.float32)[:, None]  # [C, G*N] f32
        mean_t = jnp.mean(proj_t, axis=0, keepdims=True)
        var_t = jnp.mean(jnp.square(proj_t - mean_t), axis=0, keepdims=True)
        ln1_t = (proj_t - mean_t) * jax.lax.rsqrt(var_t + _LN_EPS)
        ln1_t = (
            ln1_t * ln1_s_ref[0].astype(jnp.float32)[:, None]
            + ln1_b_ref[0].astype(jnp.float32)[:, None]
        )
        x1 = (x_all.astype(jnp.float32) + ln1_t.T).astype(x_all.dtype)

        hcur = jax.lax.dot_general(
            x1, fc1_w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + fc1_b_ref[0].astype(jnp.float32)
        hcur = _gelu_exact(hcur).astype(x_all.dtype)
        mlp = jax.lax.dot_general(
            hcur, fc2_w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + fc2_b_ref[0].astype(jnp.float32)
        ln2 = _layernorm_f32(
            mlp, ln2_s_ref[0].astype(jnp.float32), ln2_b_ref[0].astype(jnp.float32)
        )
        out_ref[0] = (
            (x1.astype(jnp.float32) + ln2)
            .astype(out_ref.dtype)
            .reshape(g_windows, n, c)
        )

    return _kernel


def _vmem_estimate(
    g: int, n: int, c: int, f: int, h: int, itemsize: int,
    apply_mask: bool = True, batched: bool | None = None,
) -> int:
    if batched is None:
        batched = n % 128 == 0
    gn = g * n if batched else n
    x_out = 2 * 2 * g * n * c * itemsize  # x + out, double-buffered
    weights = (4 * c * c + c * f + f * c) * itemsize + 2 * h * hd_bytes(c, h)
    rpb = h * n * n * 4
    mask = 2 * g * n * n * 4 if apply_mask else 0
    temps = gn * f * 4 + gn * f * itemsize + 4 * n * n * 4 + 6 * gn * c * 4
    kp = 2 * 128 * 4 * n * itemsize  # two alternating block-diag K buffers
    # batched variant: qt/kt f32 + vt/ot/qn/kn compute-dtype group scratches
    scratch = (2 * gn * c * 4 + 4 * gn * c * itemsize) if batched else 0
    return x_out + weights + rpb + mask + temps + kp + scratch


def hd_bytes(c: int, h: int) -> int:
    return (c // h) * 4


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "num_shift_windows", "apply_mask", "interpret", "batched"
    ),
)
def swin_block_fused(
    x: jax.Array,  # [W, N, C] windows (W = batch * nW, window-major per item)
    qkv_w: jax.Array,
    qkv_b: jax.Array,
    proj_w: jax.Array,
    proj_b: jax.Array,
    ln1_s: jax.Array,
    ln1_b: jax.Array,
    fc1_w: jax.Array,
    fc1_b: jax.Array,
    fc2_w: jax.Array,
    fc2_b: jax.Array,
    ln2_s: jax.Array,
    ln2_b: jax.Array,
    rpb: jax.Array,  # [H, N, N] f32
    scale: jax.Array,  # [H] f32
    mask: jax.Array,  # [nW, N, N] f32
    num_heads: int,
    num_shift_windows: int,
    apply_mask: bool = True,
    interpret: bool = False,
    batched: bool | None = None,  # None: auto (n%128==0 + kernel_gate)
) -> jax.Array:
    w, n, c = x.shape
    h = num_heads
    hd = c // h
    f = fc1_w.shape[1]
    nw = num_shift_windows

    if batched is None:
        if interpret:
            batched = n % 128 == 0  # interpret tests cover both variants
        else:
            from vsc22_tpu.ops.kernel_gate import new_kernels_enabled

            batched = n % 128 == 0 and new_kernels_enabled()

    # Group size: masked (shifted) blocks must keep groups commensurate
    # with the nw-mask period — either a group is a sub-period (nw % g ==
    # 0, mask block indexed i % groups_per_item) or it spans whole items
    # (g % nw == 0, one CONSTANT tiled-mask block). Unshifted blocks
    # ignore the mask entirely. This matters most in stage 3 (window ==
    # resolution -> nw == 1) and stage 2 shifted (nw == 4 would otherwise
    # cap batching at 4 windows per grid step).
    def g_ok(g):
        if w % g:
            return False
        if apply_mask and (g % nw) and (nw % g):
            return False
        return True

    g_win = min(w, 16)
    while g_win > 1 and (
        not g_ok(g_win)
        or _vmem_estimate(
            g_win, n, c, f, h, x.dtype.itemsize, apply_mask, batched
        )
        > 48 * 2**20
    ):
        g_win -= 1
    num_groups = w // g_win
    tiled_mask = apply_mask and g_win % nw == 0
    groups_per_item = 1 if tiled_mask else max(nw // g_win, 1)

    x4 = x.reshape(num_groups, g_win, n, c)
    if not apply_mask:
        mask4 = None
    elif tiled_mask:
        mask4 = jnp.tile(mask, (g_win // nw, 1, 1))[None]  # [1, g_win, n, n]
    else:
        mask4 = mask.reshape(groups_per_item, g_win, n, n)

    # Output-major (transposed) qkv weights: the kernel computes [C, N]
    # q/k/v tiles so each head is a sublane slice. Proj stays head-split.
    wq_t = qkv_w[:, :c].T
    wk_t = qkv_w[:, c : 2 * c].T
    wv_t = qkv_w[:, 2 * c :].T
    bq = qkv_b[:c].reshape(c, 1).astype(jnp.float32)
    bv = qkv_b[2 * c :].reshape(c, 1).astype(jnp.float32)

    group = 1
    for cand in range(min(4, h, 128 // hd), 0, -1):
        if h % cand == 0:
            group = cand
            break

    def const(shape):
        return pl.BlockSpec(shape, lambda i, _s: tuple(0 for _ in shape))

    in_specs = [
        pl.BlockSpec((1, g_win, n, c), lambda i, _s: (i, 0, 0, 0)),
        const((c, c)),
        const((c, c)),
        const((c, c)),
        const((c, 1)),
        const((c, 1)),
        const((c, c)),  # proj kernel
        const((1, c)),
        const((1, c)),
        const((1, c)),
        const((c, f)),
        const((1, f)),
        const((f, c)),
        const((1, c)),
        const((1, c)),
        const((1, c)),
        const((h, n, n)),
    ]
    operands = [
        scale,
        x4,
        wq_t,
        wk_t,
        wv_t,
        bq,
        bv,
        proj_w,
        proj_b.reshape(1, -1).astype(jnp.float32),
        ln1_s.reshape(1, -1),
        ln1_b.reshape(1, -1),
        fc1_w,
        fc1_b.reshape(1, -1),
        fc2_w,
        fc2_b.reshape(1, -1),
        ln2_s.reshape(1, -1),
        ln2_b.reshape(1, -1),
        rpb,
    ]
    if apply_mask:
        in_specs.append(
            pl.BlockSpec(
                (1, g_win, n, n), lambda i, _s: (i % groups_per_item, 0, 0, 0)
            )
        )
        operands.append(mask4)

    if batched:
        gn = g_win * n
        scratch_shapes = [
            pltpu.VMEM((c, gn), jnp.float32),  # q (token-transposed, grouped)
            pltpu.VMEM((c, gn), jnp.float32),  # k
            pltpu.VMEM((c, gn), x.dtype),  # v
            pltpu.VMEM((group * hd, group * n), x.dtype),  # block-diag K pack
            pltpu.VMEM((group * hd, group * n), x.dtype),  # (alternating)
            pltpu.VMEM((c, gn), x.dtype),  # attention output (transposed)
            pltpu.VMEM((c, gn), x.dtype),  # normalized q
            pltpu.VMEM((c, gn), x.dtype),  # normalized k
        ]
        kernel = _make_kernel_batched(g_win, h, hd, apply_mask=apply_mask)
    else:
        scratch_shapes = [
            pltpu.VMEM((c, n), jnp.float32),  # q (token-transposed)
            pltpu.VMEM((c, n), jnp.float32),  # k
            pltpu.VMEM((c, n), x.dtype),  # v
            pltpu.VMEM((group * hd, group * n), x.dtype),  # block-diag K pack
            pltpu.VMEM((group * hd, group * n), x.dtype),  # (alternating)
            pltpu.VMEM((c, n), x.dtype),  # attention output (transposed)
        ]
        kernel = _make_kernel(g_win, h, hd, apply_mask=apply_mask)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_groups,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, g_win, n, c), lambda i, _s: (i, 0, 0, 0)),
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_groups, g_win, n, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*operands)
    return out.reshape(w, n, c)


def swin_block_reference(
    x, qkv_w, qkv_b, proj_w, proj_b, ln1_s, ln1_b, fc1_w, fc1_b, fc2_w, fc2_b,
    ln2_s, ln2_b, rpb, scale, mask, num_heads, num_shift_windows,
):
    """XLA implementation with identical semantics (CPU path, VJP recompute)."""
    w, n, c = x.shape
    h = num_heads
    hd = c // h
    qkv = (
        jnp.dot(x, qkv_w, preferred_element_type=jnp.float32) + qkv_b
    )  # [W, N, 3C] f32
    qkv = qkv.reshape(w, n, 3, h, hd)
    q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
    q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    k = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
    logits = jnp.einsum("whnd,whmd->whnm", q.astype(x.dtype), k.astype(x.dtype),
                        preferred_element_type=jnp.float32)
    logits = logits * scale.reshape(1, -1, 1, 1) + rpb[None]
    mask_idx = jnp.arange(w) % num_shift_windows
    logits = logits + mask[mask_idx][:, None]
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    attn = jnp.einsum("whnm,whmd->whnd", probs, v.astype(x.dtype),
                      preferred_element_type=jnp.float32)
    attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(w, n, c).astype(x.dtype)
    proj = jnp.dot(attn, proj_w, preferred_element_type=jnp.float32) + proj_b
    ln1 = _layernorm_f32(proj, ln1_s.astype(jnp.float32), ln1_b.astype(jnp.float32))
    x1 = (x.astype(jnp.float32) + ln1).astype(x.dtype)
    hmid = jnp.dot(x1, fc1_w, preferred_element_type=jnp.float32) + fc1_b
    hmid = jax.nn.gelu(hmid, approximate=False).astype(x.dtype)
    mlp = jnp.dot(hmid, fc2_w, preferred_element_type=jnp.float32) + fc2_b
    ln2 = _layernorm_f32(mlp, ln2_s.astype(jnp.float32), ln2_b.astype(jnp.float32))
    return (x1.astype(jnp.float32) + ln2).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17))
def swin_block(
    x, qkv_w, qkv_b, proj_w, proj_b, ln1_s, ln1_b, fc1_w, fc1_b, fc2_w, fc2_b,
    ln2_s, ln2_b, rpb, scale, mask, num_heads, num_shift_windows,
):
    """One full SwinV2 block over pre-partitioned windows.

    Pallas-fused on TPU when the working set fits VMEM (C <= 512 at Base
    sizes); XLA otherwise. Backward always recomputes in XLA.

    Contract: qkv_b's middle (k) third must be zero — the SwinV2 q/v-bias
    convention the model builds via concat([q_bias, 0, v_bias]). The fused
    kernel never applies a k bias.
    """
    args = (x, qkv_w, qkv_b, proj_w, proj_b, ln1_s, ln1_b, fc1_w, fc1_b,
            fc2_w, fc2_b, ln2_s, ln2_b, rpb, scale, mask)
    n, c = x.shape[1], x.shape[2]
    f = fc1_w.shape[1]
    fits = (
        _vmem_estimate(
            1, n, c, f, num_heads, x.dtype.itemsize, num_shift_windows > 1
        )
        < 48 * 2**20
    )
    if (
        jax.default_backend() == "tpu"
        and fits
        and c % 128 == 0
        and f % 128 == 0
        and c <= 1024
    ):
        return swin_block_fused(
            *args,
            num_heads=num_heads,
            num_shift_windows=num_shift_windows,
            apply_mask=num_shift_windows > 1,
        )
    return swin_block_reference(*args, num_heads=num_heads,
                                num_shift_windows=num_shift_windows)


def _fwd(x, qkv_w, qkv_b, proj_w, proj_b, ln1_s, ln1_b, fc1_w, fc1_b, fc2_w,
         fc2_b, ln2_s, ln2_b, rpb, scale, mask, num_heads, num_shift_windows):
    args = (x, qkv_w, qkv_b, proj_w, proj_b, ln1_s, ln1_b, fc1_w, fc1_b,
            fc2_w, fc2_b, ln2_s, ln2_b, rpb, scale, mask)
    out = swin_block(*args, num_heads, num_shift_windows)
    return out, args


def _bwd(num_heads, num_shift_windows, residuals, g):
    _, vjp = jax.vjp(
        lambda *a: swin_block_reference(
            *a, num_heads=num_heads, num_shift_windows=num_shift_windows
        ),
        *residuals,
    )
    return vjp(g)


swin_block.defvjp(_fwd, _bwd)
