"""Activation gate for Pallas kernels not yet compiled on real hardware.

Interpret-mode tests prove kernel SEMANTICS, but Mosaic lowering only runs
on an actual TPU backend — and this environment's chip is reachable through
a relay that can be down for hours. A kernel that fails to lower would
abort the serving pipeline at compile time with no runtime fallback, so
newly written kernels stay behind this gate until one successful on-device
canary compile has been recorded:

  - `new_kernels_enabled()` — consulted at trace time by the ops that have
    both a new fused path and a proven fallback (attn_proj_residual,
    ln_mlp_residual, the batched swin window-group kernel).
  - `validate_and_enable()` — canary-compiles each gated kernel on a tiny
    supported shape on the current TPU backend; writes the marker file on
    success so later runs (including the driver's bench) skip the canary.

Env overrides: VSC22_NEW_KERNELS=1 forces on, VSC22_DISABLE_NEW_KERNELS=1
forces off (both beat the marker).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_MARKER = os.path.join(_REPO_ROOT, ".kernels_validated")
_TOPK_MARKER = os.path.join(_REPO_ROOT, ".topk_validated")


def new_kernels_enabled() -> bool:
    if os.environ.get("VSC22_NEW_KERNELS", "") == "1":
        return True
    if os.environ.get("VSC22_DISABLE_NEW_KERNELS", "") == "1":
        return False
    return os.path.exists(_MARKER)


def fused_topk_validated() -> bool:
    """Whether pallas_topk.extract_topk has canary-compiled on this device.

    Unlike the `new_kernels_enabled` gate this is informational: the search
    path has its own per-call runtime fallback to the XLA scan, so the
    fused extraction activates without the marker. The marker lets benches
    report whether the fused path is expected to lower (self-describing
    BENCH_r* lines) and lets the first production search skip paying a
    lowering failure.
    """
    return os.path.exists(_TOPK_MARKER)


def validate_and_enable(verbose: bool = True) -> bool:
    """Canary-compile the gated kernels on the TPU; persist success.

    Returns True when the gate is (now) open. Never raises: any lowering /
    compile / relay failure leaves the gate closed and the proven fallback
    paths active.
    """
    if new_kernels_enabled():
        return True
    if jax.default_backend() != "tpu":
        return False
    try:
        from vsc22_tpu.ops.pallas_attn_proj import (
            attn_proj_residual_fused,
            ln_attn_proj_residual_fused,
        )
        from vsc22_tpu.ops.pallas_mlp import _ln_forward
        from vsc22_tpu.ops.pallas_swin_block import swin_block_fused

        rng = np.random.default_rng(0)
        dt = jnp.bfloat16
        # Canaries use the REAL serving dims (batch 1): a lowering or VMEM
        # failure specific to CLIP's C=1024 or swin's stage sizes must trip
        # the gate, not the production compile later.
        c = 1024
        x = jnp.asarray(rng.standard_normal((1, 257, c)), dt)
        qkv = jnp.asarray(rng.standard_normal((1, 257, 3 * c)), dt)
        pw = jnp.asarray(rng.standard_normal((c, c)) * 0.03, dt)
        pb = jnp.zeros((c,), jnp.float32)
        np.asarray(attn_proj_residual_fused(x, qkv, pw, pb, 16))
        # half block (variant B).
        ln_s = jnp.ones((c,), jnp.float32)
        ln_b = jnp.zeros((c,), jnp.float32)
        qw = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.03, dt)
        qb = jnp.zeros((3 * c,), jnp.float32)
        np.asarray(
            ln_attn_proj_residual_fused(x, ln_s, ln_b, qw, qb, pw, pb, 16)
        )
        # ViT-B dims (C=768, L=145, 12 heads): TransformerBlock serves the
        # same fused attention half once the gate opens — a Mosaic failure
        # specific to C=768/hd=64 must trip the canary, not production.
        cv, lv = 768, 145
        xv = jnp.asarray(rng.standard_normal((1, lv, cv)), dt)
        qkv_v = jnp.asarray(rng.standard_normal((1, lv, 3 * cv)), dt)
        pw_v = jnp.asarray(rng.standard_normal((cv, cv)) * 0.03, dt)
        np.asarray(
            attn_proj_residual_fused(xv, qkv_v, pw_v, jnp.zeros((cv,), jnp.float32), 12)
        )

        from vsc22_tpu.ops.pallas_mlp import _pick_row_tile

        def mlp_canary(rows, cc, hidden, activation, eps):
            # Same row tile the production call would pick for `rows`; the
            # canary runs one tile's worth of rows (lowering depends on the
            # tile/dims, not the grid length).
            tile = _pick_row_tile(rows, cc, hidden, 2) or 128
            np.asarray(
                _ln_forward(
                    jnp.asarray(rng.standard_normal((tile, cc)), dt),
                    jnp.ones((cc,), jnp.float32), jnp.zeros((cc,), jnp.float32),
                    jnp.asarray(rng.standard_normal((cc, hidden)) * 0.03, dt),
                    jnp.zeros((hidden,), jnp.float32),
                    jnp.asarray(rng.standard_normal((hidden, cc)) * 0.03, dt),
                    jnp.zeros((cc,), jnp.float32),
                    row_tile=tile, activation=activation, eps=eps,
                    interpret=False,
                )
            )

        # CLIP MLP (quick_gelu) and ViT-B MLP (gelu, 128 frames x 145 tokens).
        mlp_canary(256, c, 4 * c, "quick_gelu", 1e-5)
        mlp_canary(128 * lv, cv, 4 * cv, "gelu", 1e-6)

        # Batched swin window-group kernel at the two extreme stage shapes:
        # stage 1 (C=128, shifted, 16-window mask period) and stage 3
        # (C=512, unshifted, largest VMEM group).
        def swin_canary(wn, n, cc, h, nw):
            args = dict(
                x=jnp.asarray(rng.standard_normal((wn, n, cc)), dt),
                qkv_w=jnp.asarray(rng.standard_normal((cc, 3 * cc)) * 0.06, dt),
                qkv_b=jnp.zeros((3 * cc,), jnp.float32),
                proj_w=jnp.asarray(rng.standard_normal((cc, cc)) * 0.06, dt),
                proj_b=jnp.zeros((cc,), jnp.float32),
                ln1_s=jnp.ones((cc,), jnp.float32),
                ln1_b=jnp.zeros((cc,), jnp.float32),
                fc1_w=jnp.asarray(rng.standard_normal((cc, 4 * cc)) * 0.06, dt),
                fc1_b=jnp.zeros((4 * cc,), jnp.float32),
                fc2_w=jnp.asarray(rng.standard_normal((4 * cc, cc)) * 0.06, dt),
                fc2_b=jnp.zeros((cc,), jnp.float32),
                ln2_s=jnp.ones((cc,), jnp.float32),
                ln2_b=jnp.zeros((cc,), jnp.float32),
                rpb=jnp.asarray(rng.standard_normal((h, n, n)), jnp.float32),
                scale=jnp.ones((h,), jnp.float32),
                mask=jnp.zeros((max(nw, 1), n, n), jnp.float32),
            )
            np.asarray(
                swin_block_fused(
                    **args, num_heads=h, num_shift_windows=nw,
                    apply_mask=nw > 1, batched=True,
                )
            )

        swin_canary(16, 256, 128, 4, 16)  # stage 1, shifted
        swin_canary(16, 256, 256, 8, 4)   # stage 2, shifted (multi-item tiled mask)
        swin_canary(16, 256, 512, 16, 1)  # stage 3, unshifted
    except Exception as e:  # lowering/compile/relay failure -> stay closed
        if verbose:
            print(f"[kernel_gate] canary failed, fallback paths stay active: "
                  f"{type(e).__name__}: {e}", flush=True)
        return False
    try:
        with open(_MARKER, "w") as f:
            f.write("validated\n")
    except OSError:
        pass
    os.environ["VSC22_NEW_KERNELS"] = "1"
    if verbose:
        print("[kernel_gate] new kernels validated on device", flush=True)
    _validate_topk(verbose)
    return True


def _validate_topk(verbose: bool) -> bool:
    """Canary the fused search-extraction kernel; its own marker.

    Separate try/failure domain from the serving-kernel gate: the search
    path degrades gracefully at runtime (retrieval.search falls back to the
    XLA scan per call), so a topk lowering failure must not keep the
    serving kernels off — and vice versa.
    """
    if fused_topk_validated():
        return True
    try:
        from vsc22_tpu.ops import pallas_topk

        rng = np.random.default_rng(0)
        # Production tiles (search.SimilaritySearcher: tile_q=256,
        # tile_r=1024, e=4) at the production dim D=512, smallest grid.
        q = jnp.asarray(rng.standard_normal((256, 512)), jnp.float32)
        r = jnp.asarray(rng.standard_normal((2048, 512)), jnp.float32)
        qh, ql = pallas_topk.split_bf16(q)
        rh, rl = pallas_topk.split_bf16(r)
        s, i, bound = pallas_topk.extract_topk(
            qh, ql, rh, rl, jnp.full((1, 1), 2048, jnp.int32),
            e=4, tile_q=256, tile_r=1024, k=8,
        )
        np.asarray(s)
    except Exception as e:
        if verbose:
            print(f"[kernel_gate] fused-topk canary failed (runtime "
                  f"fallback remains): {type(e).__name__}: {e}", flush=True)
        return False
    try:
        with open(_TOPK_MARKER, "w") as f:
            f.write("validated\n")
    except OSError:
        pass
    if verbose:
        print("[kernel_gate] fused top-k extraction validated on device", flush=True)
    return True
