"""Parity tests for the fused attention+projection+residual kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from vsc22_tpu.ops.pallas_attn_proj import (
    _attn_proj_xla,
    _ln_attn_proj_xla,
    _supported,
    attn_proj_residual_fused,
    ln_attn_proj_residual_fused,
)


def make_inputs(b, l, c, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray((rng.standard_normal((b, l, c)) * 0.3).astype(dtype))
    qkv = jnp.asarray((rng.standard_normal((b, l, 3 * c)) * 0.3).astype(dtype))
    pw = jnp.asarray((rng.standard_normal((c, c)) * (c**-0.5)).astype(dtype))
    pb = jnp.asarray((rng.standard_normal((c,)) * 0.1).astype(np.float32))
    return x, qkv, pw, pb


@pytest.mark.parametrize("mode", ["dot", "vpu"])
@pytest.mark.parametrize(
    "b,l,c,h",
    [
        (2, 128, 256, 8),   # aligned tokens, hd=32 -> group 4
        (1, 257, 256, 4),   # CLIP token class: 257 -> Ls 272 / Ll 384, hd=64
        (2, 145, 768, 12),  # ViT-B/32@384 shape class, hd=64
        (1, 100, 128, 2),   # sublane-only padding (100 -> 112, Ll 128)
    ],
)
def test_fused_matches_xla(mode, b, l, c, h):
    assert _supported(l, c, h)
    x, qkv, pw, pb = make_inputs(b, l, c)
    ref = np.asarray(_attn_proj_xla(x, qkv, pw, pb, h))
    got = np.asarray(
        attn_proj_residual_fused(
            x, qkv, pw, pb, h, transpose_mode=mode, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_unsupported_dims_detected():
    assert not _supported(64, 96, 3)    # c % 128
    assert not _supported(64, 256, 1)   # hd=256 > 128
    assert not _supported(64, 512, 3)   # c % num_heads
    assert not _supported(64, 256, 6)   # h % group (group=4, 6 % 4)
    assert _supported(64, 128, 2)       # hd=64
    assert _supported(64, 384, 3)       # hd=128 -> group 1


@pytest.mark.parametrize("mode", ["dot", "vpu"])
@pytest.mark.parametrize("b,l,c,h", [(1, 257, 256, 4), (2, 128, 256, 8)])
def test_half_block_matches_xla(mode, b, l, c, h):
    rng = np.random.default_rng(7)
    x = jnp.asarray((rng.standard_normal((b, l, c)) * 0.5).astype(np.float32))
    ln_s = jnp.asarray((1 + 0.1 * rng.standard_normal(c)).astype(np.float32))
    ln_b = jnp.asarray((0.1 * rng.standard_normal(c)).astype(np.float32))
    qkv_w = jnp.asarray(
        (rng.standard_normal((c, 3 * c)) * (c**-0.5)).astype(np.float32)
    )
    qkv_b = jnp.asarray((0.1 * rng.standard_normal(3 * c)).astype(np.float32))
    pw = jnp.asarray((rng.standard_normal((c, c)) * (c**-0.5)).astype(np.float32))
    pb = jnp.asarray((0.1 * rng.standard_normal(c)).astype(np.float32))
    ref = np.asarray(_ln_attn_proj_xla(x, ln_s, ln_b, qkv_w, qkv_b, pw, pb, h))
    got = np.asarray(
        ln_attn_proj_residual_fused(
            x, ln_s, ln_b, qkv_w, qkv_b, pw, pb, h,
            transpose_mode=mode, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_bf16_padding_does_not_leak():
    """257-token bf16 inputs (the CLIP serving case): padded rows/cols must
    not perturb the valid region beyond bf16 rounding of the reference."""
    x, qkv, pw, pb = make_inputs(1, 257, 256, seed=3)
    xb, qkvb, pwb = (t.astype(jnp.bfloat16) for t in (x, qkv, pw))
    ref = np.asarray(_attn_proj_xla(xb, qkvb, pwb, pb, 4)).astype(np.float32)
    for mode in ("dot", "vpu"):
        got = np.asarray(
            attn_proj_residual_fused(
                xb, qkvb, pwb, pb, 4, transpose_mode=mode, interpret=True
            )
        ).astype(np.float32)
        np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)


def test_half_block_gradients_finite():
    """ln_attn_proj_residual's custom VJP (XLA recompute) must produce
    finite grads matching jax.grad of the XLA reference."""
    import jax

    from vsc22_tpu.ops.pallas_attn_proj import ln_attn_proj_residual

    rng = np.random.default_rng(11)
    b, l, c, h = 1, 60, 128, 2
    x = jnp.asarray((rng.standard_normal((b, l, c)) * 0.4).astype(np.float32))
    ln_s = jnp.ones((c,), jnp.float32)
    ln_b = jnp.zeros((c,), jnp.float32)
    qkv_w = jnp.asarray((rng.standard_normal((c, 3 * c)) * (c**-0.5)).astype(np.float32))
    qkv_b = jnp.zeros((3 * c,), jnp.float32)
    pw = jnp.asarray((rng.standard_normal((c, c)) * (c**-0.5)).astype(np.float32))
    pb = jnp.zeros((c,), jnp.float32)

    def loss_op(x, qkv_w):
        return jnp.sum(
            ln_attn_proj_residual(x, ln_s, ln_b, qkv_w, qkv_b, pw, pb, h) ** 2
        )

    def loss_ref(x, qkv_w):
        return jnp.sum(
            _ln_attn_proj_xla(x, ln_s, ln_b, qkv_w, qkv_b, pw, pb, h) ** 2
        )

    go = jax.grad(loss_op, argnums=(0, 1))(x, qkv_w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, qkv_w)
    for a, b_ in zip(go, gr):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)
