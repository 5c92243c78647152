"""Parity tests for the packed plain-attention kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsc22_tpu.ops.pallas_attn import _attention_xla, packed_attention


def make_qkv(b, l, h, hd, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, l, h, hd)).astype(np.float32)) * 0.3
    return mk(), mk(), mk()


@pytest.mark.parametrize(
    "b,l,h,hd",
    [
        (2, 128, 4, 32),   # aligned tokens, 4-head packing
        (1, 257, 4, 64),   # CLIP shape class: padded tokens, 2-head packing
        (2, 145, 12, 16),  # ViT-B/32@384 shape class (12 heads)
        (1, 64, 3, 32),    # odd head count -> group 3
    ],
)
def test_packed_matches_xla(b, l, h, hd):
    q, k, v = make_qkv(b, l, h, hd)
    ref = np.asarray(_attention_xla(q, k, v))
    got = np.asarray(packed_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_padding_does_not_leak():
    """Changing nothing, the padded key columns must not affect outputs:
    compare L=257 against the same data computed at exact length via XLA."""
    q, k, v = make_qkv(1, 257, 2, 64, seed=3)
    ref = np.asarray(_attention_xla(q, k, v))
    got = np.asarray(packed_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
