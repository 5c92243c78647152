"""Fused whole-block SwinV2 kernel: numerics + param-tree contracts."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsc22_tpu.models.swinv2 import SwinBlock
from vsc22_tpu.ops.pallas_swin_block import (
    swin_block_fused,
    swin_block_reference,
)


def _block_args(rng, w, n, c, h, nw, dtype=np.float32):
    f = 4 * c
    # k bias fixed at zero: the SwinV2 q/v-bias-only contract the model
    # constructs via concat([q_bias, zeros, v_bias]).
    qkv_b = rng.normal(0, 0.05, (3 * c,)).astype(np.float32)
    qkv_b[c : 2 * c] = 0.0
    return dict(
        x=jnp.asarray(rng.normal(0, 1, (w, n, c)).astype(dtype)),
        qkv_w=jnp.asarray(rng.normal(0, 0.05, (c, 3 * c)).astype(dtype)),
        qkv_b=jnp.asarray(qkv_b),
        proj_w=jnp.asarray(rng.normal(0, 0.05, (c, c)).astype(dtype)),
        proj_b=jnp.asarray(rng.normal(0, 0.05, (c,)).astype(np.float32)),
        ln1_s=jnp.asarray(rng.normal(1, 0.1, (c,)).astype(np.float32)),
        ln1_b=jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32)),
        fc1_w=jnp.asarray(rng.normal(0, 0.05, (c, f)).astype(dtype)),
        fc1_b=jnp.asarray(rng.normal(0, 0.05, (f,)).astype(np.float32)),
        fc2_w=jnp.asarray(rng.normal(0, 0.05, (f, c)).astype(dtype)),
        fc2_b=jnp.asarray(rng.normal(0, 0.05, (c,)).astype(np.float32)),
        ln2_s=jnp.asarray(rng.normal(1, 0.1, (c,)).astype(np.float32)),
        ln2_b=jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32)),
        rpb=jnp.asarray(rng.normal(0, 1, (h, n, n)).astype(np.float32)),
        scale=jnp.asarray(np.exp(rng.normal(2, 0.1, (h,))).astype(np.float32)),
        mask=jnp.asarray(
            np.where(rng.random((nw, n, n)) > 0.9, -100.0, 0.0).astype(np.float32)
        ),
    )


@pytest.mark.parametrize(
    "w,n,c,h,nw",
    [
        (8, 256, 128, 4, 4),   # batched path (n=256), shifted/masked
        (4, 256, 256, 8, 2),   # batched path, masked, wider C
        (8, 256, 128, 4, 1),   # batched path, UNSHIFTED (no mask operand)
        (4, 64, 128, 4, 1),    # per-window path (n=64, stage-4 class)
    ],
)
def test_kernel_matches_reference_interpret(w, n, c, h, nw):
    rng = np.random.default_rng(0)
    args = _block_args(rng, w, n, c, h, nw)
    ref = swin_block_reference(**args, num_heads=h, num_shift_windows=nw)
    fused = swin_block_fused(**args, num_heads=h, num_shift_windows=nw, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-4)


@pytest.mark.heavy
def test_reference_grad_path():
    rng = np.random.default_rng(1)
    args = _block_args(rng, 2, 64, 128, 4, 1)
    from vsc22_tpu.ops.pallas_swin_block import swin_block

    def loss(x, qkv_w):
        a = dict(args, x=x, qkv_w=qkv_w)
        return jnp.sum(swin_block(*[a[k] for k in (
            "x", "qkv_w", "qkv_b", "proj_w", "proj_b", "ln1_s", "ln1_b",
            "fc1_w", "fc1_b", "fc2_w", "fc2_b", "ln2_s", "ln2_b",
            "rpb", "scale", "mask")], 4, 1) ** 2)

    g_x, g_w = jax.grad(loss, argnums=(0, 1))(args["x"], args["qkv_w"])
    assert np.isfinite(np.asarray(g_x)).all() and np.isfinite(np.asarray(g_w)).all()


@pytest.mark.parametrize("r,c,heads,shift", [(16, 128, 4, 0), (16, 128, 4, 8), (8, 256, 8, 4)])
def test_swinblock_paths_agree_and_share_tree(r, c, heads, shift):
    rng = np.random.default_rng(2)
    kw = dict(dim=c, input_resolution=(r, r), num_heads=heads, window_size=16,
              shift_size=shift, mlp_ratio=4.0, drop_path=0.1, pretrained_window=12)
    blk_ref = SwinBlock(**kw, fused_block=False)
    blk_fused = SwinBlock(**kw, fused_block=True)
    x = jnp.asarray(rng.normal(0, 1, (2, r * r, c)).astype(np.float32))
    p_ref = blk_ref.init(jax.random.PRNGKey(0), x)
    p_fused = blk_fused.init(jax.random.PRNGKey(0), x)
    shapes = lambda p: {
        k: v.shape for k, v in flax.traverse_util.flatten_dict(p["params"]).items()
    }
    assert shapes(p_ref) == shapes(p_fused)
    out_ref = blk_ref.apply(p_ref, x)
    out_fused = blk_fused.apply(p_ref, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref), atol=1e-4)


@pytest.mark.slow
def test_batched_kernel_stage3_scale_interpret():
    """Stage-3 shape class (C=512, 16 heads, unshifted, 16 windows): the
    largest-VMEM batched configuration, where the group size is clamped by
    the estimate — catches pack/slice ordering bugs that small configs
    can't."""
    rng = np.random.default_rng(5)
    args = _block_args(rng, 16, 256, 512, 16, 1)
    args["mask"] = jnp.zeros_like(args["mask"])  # unshifted: mask unused
    ref = swin_block_reference(**args, num_heads=16, num_shift_windows=1)
    fused = swin_block_fused(
        **args, num_heads=16, num_shift_windows=1, apply_mask=False,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=5e-4)
