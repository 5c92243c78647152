"""Tests for the legacy model-zoo surface (SURVEY §2.3 auxiliary backbones):
Swin v1, EfficientNet, MAE descriptor, RoBERTa-style text encoder, DeConv
decoder, BYOL recipe, and registry coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

# Minute-plus on the 1-core CI host: excluded from the default dev loop
# (pytest -m 'not slow and not heavy'); run via the heavy tier.
pytestmark = pytest.mark.heavy

from vsc22_tpu.models.registry import BACKBONES, build_backbone


class TestSwinV1:
    def test_forward_shape(self):
        from vsc22_tpu.models.swin_v1 import swin_v1_tiny_test

        model = swin_v1_tiny_test()
        x = jnp.zeros((2, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_shifted_windows_change_output(self):
        # depth-2 second stage includes one shifted block; masking must make
        # the shifted path differ from treating windows independently.
        from vsc22_tpu.models.swin_v1 import SWIN_V1_TINY_TEST, SwinTransformerV1

        model = SwinTransformerV1(cfg=SWIN_V1_TINY_TEST)
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (1, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out1 = model.apply(params, x)
        out2 = model.apply(params, jnp.roll(x, 7, axis=1))
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_v1_premerge_norm_param_shape(self):
        # v1 normalizes the 4C concat (norm dim = 4C); v2 normalizes the 2C
        # reduction output. Catching a silent v2-ordering regression.
        from vsc22_tpu.models.swin_v1 import PatchMergingV1

        m = PatchMergingV1((8, 8))
        x = jnp.zeros((1, 64, 16))
        params = m.init(jax.random.PRNGKey(0), x)
        assert params["params"]["norm"]["scale"].shape == (64,)  # 4C


class TestEfficientNet:
    def test_forward_shape_eval(self):
        from vsc22_tpu.models.efficientnet import efficientnet_tiny_test

        model = efficientnet_tiny_test()
        x = jnp.zeros((2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_train_mode_updates_batch_stats(self):
        from vsc22_tpu.models.efficientnet import efficientnet_tiny_test

        model = efficientnet_tiny_test()
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert out.shape == (4, 16)
        before = variables["batch_stats"]["stem_bn"]["mean"]
        after = mutated["batch_stats"]["stem_bn"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestMae:
    def test_forward_shape(self):
        from vsc22_tpu.models.mae import mae_tiny_test

        model = mae_tiny_test()
        x = jnp.zeros((2, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 16)

    def test_random_masking(self):
        from vsc22_tpu.models.mae import random_masking

        tokens = jnp.arange(2 * 8 * 4, dtype=jnp.float32).reshape(2, 8, 4)
        kept, mask, restore = random_masking(jax.random.PRNGKey(0), tokens, 0.75)
        assert kept.shape == (2, 2, 4)
        assert mask.shape == (2, 8)
        np.testing.assert_allclose(np.asarray(mask).sum(axis=1), 6.0)
        # every kept token is one of the originals
        orig = np.asarray(tokens)
        for b in range(2):
            for tok in np.asarray(kept)[b]:
                assert any(np.allclose(tok, orig[b, i]) for i in range(8))


class TestTextEncoder:
    def test_token_ids_path(self):
        from vsc22_tpu.models.text_encoder import text_tiny_test

        model = text_tiny_test()
        ids = jnp.ones((2, 10), jnp.int32)
        mask = jnp.concatenate([jnp.ones((2, 6)), jnp.zeros((2, 4))], axis=1)
        params = model.init(jax.random.PRNGKey(0), ids, mask)
        out = model.apply(params, ids, mask)
        assert out.shape == (2, 10, 32)

    def test_embeddings_path_and_pooler(self):
        from vsc22_tpu.models.text_encoder import text_tiny_test

        model = text_tiny_test(output_pool=True)
        embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 32))
        params = model.init(jax.random.PRNGKey(0), embeds)
        out = model.apply(params, embeds)
        assert out.shape == (2, 32)
        assert np.abs(np.asarray(out)).max() <= 1.0  # tanh pooler

    def test_mask_blocks_attention(self):
        from vsc22_tpu.models.text_encoder import text_tiny_test

        model = text_tiny_test()
        embeds = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
        params = model.init(jax.random.PRNGKey(0), embeds)
        mask = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0]], jnp.float32)
        out1 = model.apply(params, embeds, mask)
        # changing masked-out positions must not affect attended outputs
        embeds2 = embeds.at[:, 5].set(99.0)
        out2 = model.apply(params, embeds2, mask)
        np.testing.assert_allclose(
            np.asarray(out1[:, :4]), np.asarray(out2[:, :4]), atol=1e-5
        )


class TestDeconv:
    def test_upsamples_32x(self):
        from vsc22_tpu.models.deconv import DeConvModel

        model = DeConvModel(dim=16, output_dim=3)
        x = jnp.zeros((1, 4, 4, 16))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        # two (2x upsample + stride-2 convT) stages then a stride-2 convT:
        # 4 * 4 * 2 = 32x total (ConvTransposeModel.py:29-40)
        assert out.shape == (1, 128, 128, 3)


class TestByol:
    def test_loss_and_ema_step(self):
        from vsc22_tpu.train.byol import (
            ByolConfig,
            ByolHeads,
            init_byol,
            make_byol_step,
        )
        import flax.linen as nn

        class TinyBackbone(nn.Module):
            @nn.compact
            def __call__(self, images):
                return nn.Dense(8)(images.reshape(images.shape[0], -1))

        backbone = TinyBackbone()
        cfg = ByolConfig(projection_size=4, hidden_size=8, ema_decay=0.9)
        heads = ByolHeads(cfg=cfg)
        sample = jnp.zeros((2, 8, 8, 3))

        def backbone_init(key):
            return backbone.init(key, sample)

        online, target = init_byol(
            backbone_init, heads, jax.random.PRNGKey(0), jnp.zeros((2, 8))
        )
        tx = optax.adam(1e-3)
        step = make_byol_step(
            lambda p, im: backbone.apply(p, im), heads, tx, cfg
        )
        opt_state = tx.init(online)
        va = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
        vb = va + 0.1
        o2, t2, opt_state, loss = step(online, target, opt_state, va, vb)
        assert np.isfinite(float(loss)) and 0.0 <= float(loss) <= 4.0
        # online moved; target moved toward online but differs from both old
        leaf = lambda tree: np.asarray(
            jax.tree_util.tree_leaves(tree)[0]
        )
        assert not np.allclose(leaf(o2), leaf(online))
        assert not np.allclose(leaf(t2), leaf(target))

    def test_loss_zero_for_identical_normalized(self):
        from vsc22_tpu.train.byol import _regression_loss

        x = jnp.array([[1.0, 0.0], [0.0, 2.0]])
        assert float(_regression_loss(x, x)) == pytest.approx(0.0, abs=1e-6)
        assert float(_regression_loss(x, -x)) == pytest.approx(4.0, abs=1e-6)


class TestRegistryZoo:
    def test_full_surface_registered(self):
        for name in [
            "vit_base_patch32_384",
            "swinv2_base_256",
            "clip_vit_l14",
            "video_score_ms",
            "mobilenetv3_small",
            "sam_hrnet_w18",
            "efficientnet_v2_s",
            "swin_v1_tiny_224",
            "mae_base_patch16_224",
            "roberta_base",
            "deconv_model",
        ]:
            assert name in BACKBONES, name

    def test_build_from_cfg(self):
        model = build_backbone({"type": "efficientnet_tiny_test"})
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        assert model.apply(variables, x).shape == (1, 16)
