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


def _ln_args(rows=300, c=128, hidden=512, seed=4):
    rng = np.random.default_rng(seed)
    x, w1, b1, w2, b2 = make_inputs(rows, c, hidden, seed)
    ln_s = jnp.asarray((1 + 0.1 * rng.standard_normal(c)).astype(np.float32))
    ln_b = jnp.asarray((0.1 * rng.standard_normal(c)).astype(np.float32))
    return x, ln_s, ln_b, w1, b1, w2, b2


def test_ln_mlp_residual_kernel_matches_xla_interpret():
    from vsc22_tpu.ops.pallas_mlp import _ln_forward, _xla_ln_mlp

    args = _ln_args()
    for act in ("gelu", "quick_gelu"):
        ref = np.asarray(_xla_ln_mlp(*args, activation=act, eps=1e-5))
        out = np.asarray(
            _ln_forward(*args, row_tile=128, activation=act, eps=1e-5,
                        interpret=True)
        )  # pads 300->384
        assert out.shape == ref.shape
        assert_allclose(out, ref, atol=1e-4)


def test_ln_mlp_residual_unaligned_falls_back():
    from vsc22_tpu.ops.pallas_mlp import _xla_ln_mlp, ln_mlp_residual

    args = _ln_args(rows=64, c=100, hidden=200)
    out = np.asarray(ln_mlp_residual(*args))
    assert_allclose(out, np.asarray(_xla_ln_mlp(*args)), atol=1e-5)


def test_ln_mlp_residual_gradients_match_plain():
    from vsc22_tpu.ops.pallas_mlp import _xla_ln_mlp, ln_mlp_residual

    args = _ln_args(rows=128)

    def loss_fused(x, w1):
        a = (x, args[1], args[2], w1, args[4], args[5], args[6])
        return jnp.sum(ln_mlp_residual(*a) ** 2)

    def loss_ref(x, w1):
        a = (x, args[1], args[2], w1, args[4], args[5], args[6])
        return jnp.sum(_xla_ln_mlp(*a) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(args[0], args[3])
    gr = jax.grad(loss_ref, argnums=(0, 1))(args[0], args[3])
    for a, b in zip(gf, gr):
        assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
