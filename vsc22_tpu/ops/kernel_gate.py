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

_MARKER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".kernels_validated",
)


def new_kernels_enabled() -> bool:
    if os.environ.get("VSC22_NEW_KERNELS", "") == "1":
        return True
    if os.environ.get("VSC22_DISABLE_NEW_KERNELS", "") == "1":
        return False
    return os.path.exists(_MARKER)


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
        # ln_mlp_residual at CLIP MLP dims (row tile identical to serving).
        xm = jnp.asarray(rng.standard_normal((256, c)), dt)
        w1 = jnp.asarray(rng.standard_normal((c, 4 * c)) * 0.03, dt)
        b1 = jnp.zeros((4 * c,), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.03, dt)
        b2 = jnp.zeros((c,), jnp.float32)
        from vsc22_tpu.ops.pallas_mlp import _pick_row_tile

        tile = _pick_row_tile(256, c, 4 * c, 2) or 128
        np.asarray(
            _ln_forward(xm, ln_s, ln_b, w1, b1, w2, b2, row_tile=tile,
                        activation="quick_gelu", eps=1e-5, interpret=False)
        )

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
    return True
