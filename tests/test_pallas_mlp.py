"""Fused MLP kernel: forward parity, gradient parity, fallback paths."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from vsc22_tpu.ops.pallas_mlp import _forward, _xla_mlp, fused_mlp


def make_inputs(rows=300, c=128, hidden=512, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((rows, c)).astype(np.float32)) * 0.5
    w1 = jnp.asarray(rng.standard_normal((c, hidden)).astype(np.float32)) * 0.05
    b1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32)) * 0.05
    w2 = jnp.asarray(rng.standard_normal((hidden, c)).astype(np.float32)) * 0.05
    b2 = jnp.asarray(rng.standard_normal(c).astype(np.float32)) * 0.05
    return x, w1, b1, w2, b2


def test_kernel_matches_xla_interpret():
    args = make_inputs()
    ref = np.asarray(_xla_mlp(*args))
    out = np.asarray(
        _forward(*args, row_tile=128, activation="gelu", interpret=True)
    )  # pads 300->384
    assert out.shape == ref.shape
    assert_allclose(out, ref, atol=1e-4)


def test_fused_mlp_unaligned_falls_back():
    # c=100 not lane-aligned: must silently use the XLA path.
    args = make_inputs(rows=64, c=100, hidden=200)
    out = np.asarray(fused_mlp(*args))
    assert_allclose(out, np.asarray(_xla_mlp(*args)), atol=1e-5)


def test_gradients_match_plain():
    args = make_inputs(rows=128)

    def loss_fused(*a):
        return jnp.sum(fused_mlp(*a) ** 2)

    def loss_plain(*a):
        return jnp.sum(_xla_mlp(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_plain = jax.grad(loss_plain, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_fused, g_plain):
        assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4)


def test_mlp_module_param_structure_stable():
    """Mlp uses the same flat param names on every backend."""
    from vsc22_tpu.models.layers import Mlp
    import flax

    m = Mlp(hidden_dim=64, out_dim=16)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 16)))
    flat = flax.traverse_util.flatten_dict(params["params"])
    assert set(flat) == {("fc1_kernel",), ("fc1_bias",), ("fc2_kernel",), ("fc2_bias",)}
