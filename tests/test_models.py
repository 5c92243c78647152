"""Model zoo tests: shapes, jit, GeM semantics, TP sharding rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from vsc22_tpu.models.layers import gem_pool
from vsc22_tpu.models.registry import BACKBONES, build_backbone
from vsc22_tpu.models.vit import VIT_TINY_TEST, VitDescriptor, vit_tiny_test_descriptor


def test_gem_pool_oracle():
    """GeM = (mean(clamp(x,eps)^p))^(1/p) over the token axis."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 5)).astype(np.float32)
    p = 3.0
    out = np.asarray(gem_pool(jnp.asarray(x), p, axis=1))
    expect = (np.clip(x, 1e-6, None) ** p).mean(axis=1) ** (1 / p)
    assert_allclose(out, expect, rtol=1e-5)


def test_gem_pool_reduces_to_mean_at_p1():
    x = np.abs(np.random.default_rng(1).standard_normal((3, 4, 6))).astype(np.float32) + 0.1
    out = np.asarray(gem_pool(jnp.asarray(x), 1.0, axis=1))
    assert_allclose(out, x.mean(axis=1), rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = vit_tiny_test_descriptor()
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(rng, images, train=False)
    return model, params


def test_vit_descriptor_shapes(tiny_model_and_params):
    model, params = tiny_model_and_params
    images = jax.random.normal(jax.random.PRNGKey(1), (3, 64, 64, 3))
    out = model.apply(params, images, train=False)
    assert out.shape == (3, 16)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_vit_descriptor_jit_deterministic(tiny_model_and_params):
    model, params = tiny_model_and_params
    images = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    f = jax.jit(lambda p, x: model.apply(p, x, train=False))
    a = np.asarray(f(params, images))
    b = np.asarray(f(params, images))
    assert_allclose(a, b)


def test_vit_rejects_wrong_resolution(tiny_model_and_params):
    model, params = tiny_model_and_params
    with pytest.raises(ValueError):
        model.apply(params, jnp.zeros((1, 32, 32, 3)), train=False)


def test_registry_builds_tiny():
    model = build_backbone({"type": "vit_tiny_test"})
    assert isinstance(model, VitDescriptor)
    assert "vit_base_patch32_384" in BACKBONES


def test_param_sharding_rules(cpu_mesh_2d, tiny_model_and_params):
    from vsc22_tpu.parallel.mesh import param_shardings

    model, params = tiny_model_and_params
    shardings = param_shardings(cpu_mesh_2d, params)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {"/".join(str(k.key) for k in path): s.spec for path, s in flat}
    # At least the MLP kernels must be tensor-sharded over 'model'.
    sharded = [name for name, spec in specs.items() if any(ax == "model" for ax in spec)]
    assert any("fc1_kernel" in n for n in sharded)
    assert any("fc2_kernel" in n for n in sharded)
    # Biases/norms replicated.
    assert all("bias" not in n for n in sharded)


def test_tp_sharded_forward_matches_replicated(cpu_mesh_2d, tiny_model_and_params):
    """Tensor-parallel forward == single-device forward."""
    from vsc22_tpu.parallel.mesh import param_shardings

    model, params = tiny_model_and_params
    images = jax.random.normal(jax.random.PRNGKey(3), (4, 64, 64, 3))
    ref = np.asarray(model.apply(params, images, train=False))

    shardings = param_shardings(cpu_mesh_2d, params)
    sharded_params = jax.tree.map(lambda p, s: jax.device_put(p, s), params, shardings)
    out = np.asarray(
        jax.jit(lambda p, x: model.apply(p, x, train=False))(sharded_params, images)
    )
    assert_allclose(out, ref, atol=1e-4)


@pytest.mark.heavy
def test_vit_dropout_branch_trains():
    """TransformerBlock's non-fused branch (active dropout/drop-path) must
    apply cleanly with rngs and differ across rng keys — regression for
    the fused-attention restructuring keeping the stochastic path alive."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vsc22_tpu.models.vit import ViTConfig, VitDescriptor

    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
        dropout=0.3, drop_path=0.2,
    )
    model = VitDescriptor(cfg=cfg, head_dim=64, out_dim=16)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
        jnp.float32,
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True,
    )
    a = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    b = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    det = model.apply(params, x, train=False)
    assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(det)).all()
    assert not np.allclose(np.asarray(a), np.asarray(b))  # dropout active
