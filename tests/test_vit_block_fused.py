"""Parity tests for the fused pre-LN ViT/CLIP block kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsc22_tpu.ops.pallas_vit_block import (
    vit_block_fused,
    vit_block_reference,
)


def make_block(b, l, c, heads, f=None, seed=0):
    f = f or 4 * c
    rng = np.random.default_rng(seed)
    a = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32) * 0.5)
    args = dict(
        ln1_s=jnp.ones((c,)), ln1_b=a(c),
        qkv_w=a(c, 3 * c), qkv_b=a(3 * c),
        proj_w=a(c, c), proj_b=a(c),
        ln2_s=jnp.ones((c,)), ln2_b=a(c),
        fc1_w=a(c, f), fc1_b=a(f),
        fc2_w=a(f, c), fc2_b=a(c),
    )
    return x, args


@pytest.mark.parametrize(
    "b,l,c,heads,act",
    [
        (2, 128, 128, 4, "gelu"),        # aligned tokens, hd=32 (4-head pack)
        (1, 257, 128, 2, "quick_gelu"),  # CLIP-style padded tokens, hd=64
        (1, 100, 256, 4, "quick_gelu"),  # padded tokens, hd=64 (2-head pack)
    ],
)
def test_fused_matches_reference(b, l, c, heads, act):
    x, args = make_block(b, l, c, heads)
    ref = np.asarray(vit_block_reference(x, **args, num_heads=heads, activation=act))
    got = np.asarray(
        vit_block_fused(x, *args.values(), num_heads=heads, activation=act,
                        interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_clip_block_tree_unchanged():
    """The rewired CLIPBlock must declare the same param tree as before
    (ln_1/ln_2 LayerNorm, attn.qkv/attn.proj Dense, c_fc/c_proj Dense)."""
    from vsc22_tpu.models.clip import CLIPBlock

    block = CLIPBlock(heads=2)
    params = block.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 64)))["params"]
    paths = sorted(
        "/".join(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
        for p in [tuple(getattr(k, "key", str(k)) for k in p)]
    )
    assert paths == [
        "attn/proj/bias",
        "attn/proj/kernel",
        "attn/qkv/bias",
        "attn/qkv/kernel",
        "c_fc/bias",
        "c_fc/kernel",
        "c_proj/bias",
        "c_proj/kernel",
        "ln_1/bias",
        "ln_1/scale",
        "ln_2/bias",
        "ln_2/scale",
    ]
