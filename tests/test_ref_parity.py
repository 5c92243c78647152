"""Full-backbone numerics parity against the reference's vendored torch models.

These tests build the reference's OWN model code (random-init, f32, eval
mode), port the torch state_dict into the Flax backbones via
utils.port_weights, and assert the descriptor outputs match — the proof that
reference-trained checkpoints produce identical descriptors through this
framework.

  - SwinV2: the complete vendored Microsoft implementation + GeM head
    (D1/train/train_v106/vsc/.../backbones/swinv2.py:509-678), real Base@256
    config from config_v106.py.
  - ViT/SSCD: the vendored SSCD head code (D1/train/train_v68/vsc/.../
    backbones/sscd.py:59-152) over a faithful timm `vit_base_patch32_384`
    (timm itself is absent; see ref_torch_loader.TorchViT), real v68 config
    (add_head=True, dims=(768, 512), 384x384 inputs).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_torch_loader import (  # noqa: E402
    load_reference_clip,
    load_reference_sscd,
    load_reference_swinv2,
)


def _to_flax_input(x_torch: torch.Tensor) -> np.ndarray:
    return x_torch.numpy().transpose(0, 2, 3, 1)


@pytest.mark.slow
def test_swinv2_full_model_parity():
    import jax.numpy as jnp

    from vsc22_tpu.models.swinv2 import SWINV2_BASE_256, SwinTransformerV2
    from vsc22_tpu.utils.port_weights import port_swinv2_torch_state_dict

    RefSwin = load_reference_swinv2()
    torch.manual_seed(0)
    ref = RefSwin(
        img_size=256,
        patch_size=4,
        window_size=16,
        num_heads=[4, 8, 16, 32],
        embed_dim=128,
        depths=[2, 2, 18, 2],
        pretrained_window_sizes=[12, 12, 12, 6],
        drop_path_rate=0.2,
        pretrained="",
        output_dim=512,
        p=3.0,
        use_checkpoint=False,
    ).eval()

    x = torch.randn(2, 3, 256, 256)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    model = SwinTransformerV2(cfg=SWINV2_BASE_256, dtype=jnp.float32)
    import jax

    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = port_swinv2_torch_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, template
    )
    out = np.asarray(model.apply(params, jnp.asarray(_to_flax_input(x))))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_vit_sscd_full_model_parity():
    import jax
    import jax.numpy as jnp

    from vsc22_tpu.models.vit import VIT_BASE_PATCH32_384, VitDescriptor
    from vsc22_tpu.utils.port_weights import port_vit_torch_state_dict

    RefSSCD = load_reference_sscd()
    torch.manual_seed(1)
    ref = RefSSCD(
        name="vit_base_patch32_384",
        pool_param=3.0,
        pool="gem",
        pretrained="",
        use_classify=False,
        dims=(768, 512),
        add_head=True,
    ).eval()
    # randomize beyond torch's default init so parity is non-trivial
    with torch.no_grad():
        for p in ref.parameters():
            if p.ndim >= 2:
                p.normal_(0, 0.02)

    x = torch.randn(2, 3, 384, 384)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    model = VitDescriptor(cfg=VIT_BASE_PATCH32_384, dtype=jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 384, 384, 3)))
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = port_vit_torch_state_dict(ref.state_dict(), template)
    out = np.asarray(model.apply(params, jnp.asarray(_to_flax_input(x))))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-3, rtol=1e-3)


def _clip_parity_case(ref_kwargs, cfg, batch, atol):
    """Shared body: vendored reference tower vs ported CLIPVisual."""
    import jax
    import jax.numpy as jnp

    from vsc22_tpu.models.clip import CLIPVisual
    from vsc22_tpu.utils.port_weights import port_clip_torch_state_dict

    RefCLIP = load_reference_clip()
    torch.manual_seed(7)
    ref = RefCLIP(**ref_kwargs).eval()

    x = torch.randn(batch, 3, cfg.img_size, cfg.img_size)
    with torch.no_grad():
        ref_out = ref(x).numpy()  # [B, 1+P, width] — all tokens post-ln_post

    model = CLIPVisual(cfg=cfg, dtype=jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
        )
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = port_clip_torch_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, template
    )
    out = np.asarray(model.apply(params, jnp.asarray(_to_flax_input(x))))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=atol, rtol=atol)
    # The pipeline consumes the CLS token (extract_query_feats.py:160-167).
    np.testing.assert_allclose(out[:, 0], ref_out[:, 0], atol=atol, rtol=atol)


def test_clip_tiny_parity():
    """Fast CLIP parity on the tiny config (runs in the default suite)."""
    from vsc22_tpu.models.clip import CLIP_TINY_TEST

    _clip_parity_case(
        dict(
            input_resolution=32, patch_size=8, width=32, layers=2, heads=2,
            output_dim=32, pretrained=None,
        ),
        CLIP_TINY_TEST,
        batch=3,
        atol=1e-5,
    )


@pytest.mark.slow
def test_clip_vit_l14_full_model_parity():
    """Full CLIP ViT-L/14 @224 parity — the frozen VED feature tower.

    CLIP is never fine-tuned in the reference (extract_feat.py:82 loads it
    frozen), so this parity proves the VED branch runs at reference accuracy
    from reference checkpoints.
    """
    from vsc22_tpu.models.clip import CLIP_VIT_L14

    _clip_parity_case(
        dict(
            input_resolution=224, patch_size=14, width=1024, layers=24,
            heads=16, output_dim=768, pretrained=None,
        ),
        CLIP_VIT_L14,
        batch=2,
        atol=1e-3,
    )


def _vsm_parity_case(cfg, twin_kwargs, batch, atol):
    """Shared body: MS twin (real transformers BertModel) vs ported VSM."""
    import jax
    import jax.numpy as jnp

    from vsc22_tpu.models.vsm import VideoScoreModel
    from vsc22_tpu.utils.port_weights import port_vsm_torch_state_dict
    from ref_torch_loader import TorchMS

    pytest.importorskip("transformers")
    torch.manual_seed(11)
    ref = TorchMS(**twin_kwargs).eval()

    # CLIP-feature-like inputs with zero-padded tails (the mask convention
    # under test: masks = feats.abs().sum(2) > 0, model.py:81).
    feats = torch.randn(batch, cfg.max_frames, cfg.feat_dim)
    feats[0, cfg.max_frames // 2:] = 0.0
    feats[-1, 3:] = 0.0
    with torch.no_grad():
        ref_out = ref(feats).numpy()

    model = VideoScoreModel(cfg=cfg, dtype=jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, cfg.max_frames, cfg.feat_dim))
        )
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = port_vsm_torch_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, template
    )
    out = np.asarray(model.apply(params, jnp.asarray(feats.numpy())))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=atol, rtol=atol)


def test_vsm_tiny_parity():
    from vsc22_tpu.models.vsm import VSM_TINY_TEST

    _vsm_parity_case(
        VSM_TINY_TEST,
        dict(feat_dim=16, bert_dim=32, layers=2, heads=2, max_frames=8,
             vocab_size=256),
        batch=3,
        atol=1e-5,
    )


@pytest.mark.heavy
def test_vsm_md_embedding_twin_parity():
    """The `MD` video-embedding variant (model.py:6-60): same trunk as MS,
    output head maps to an embedding vector instead of one logit."""
    import dataclasses

    from vsc22_tpu.models.vsm import VSM_TINY_TEST

    _vsm_parity_case(
        dataclasses.replace(VSM_TINY_TEST, output_dim=24),
        dict(feat_dim=16, bert_dim=32, layers=2, heads=2, max_frames=8,
             vocab_size=256, output_dim=24),
        batch=3,
        atol=1e-5,
    )


@pytest.mark.slow
def test_vsm_base_full_model_parity():
    """Full video-score model parity: BERT-base encoder (the
    chinese-roberta-wwm-ext shape, model.py:73) over 256 CLIP frames."""
    from vsc22_tpu.models.vsm import VSM_BASE

    _vsm_parity_case(
        VSM_BASE,
        dict(feat_dim=1024, bert_dim=768, layers=12, heads=12, max_frames=256,
             vocab_size=1000),
        batch=2,
        atol=1e-3,
    )


def test_mobilenetv3_full_model_parity():
    """Matching-track ClassifyModel parity: timm-keyed MobileNetV3-Small
    twin (random init + randomized BN stats) vs the ported Flax model at
    the pipeline's 160x160 input (M1/train/dataset.py:6-41)."""
    import jax
    import jax.numpy as jnp

    from vsc22_tpu.models.mobilenetv3 import MNV3_SMALL_SPEC, MobileNetV3Small
    from vsc22_tpu.utils.port_weights import port_mnv3_torch_state_dict
    from ref_torch_loader import TorchMobileNetV3Small, randomize_bn_stats

    torch.manual_seed(3)
    ref = TorchMobileNetV3Small(MNV3_SMALL_SPEC, num_classes=2)
    with torch.no_grad():
        for p in ref.parameters():
            if p.ndim >= 2:
                p.normal_(0, 0.05)
    randomize_bn_stats(ref, seed=4)
    ref = ref.eval()
    n_params = sum(p.numel() for p in ref.parameters())
    assert 1.4e6 < n_params < 1.7e6  # timm mobilenetv3_small_100 @ 2 classes

    x = torch.randn(2, 3, 160, 160)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    model = MobileNetV3Small(num_classes=2, dtype=jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3)))
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    variables = port_mnv3_torch_state_dict(ref.state_dict(), template)
    out = np.asarray(model.apply(variables, jnp.asarray(_to_flax_input(x))))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-3, rtol=1e-3)


def _hrnet_parity_case(flax_model, twin_kwargs, size, atol, out_chann):
    """Shared body: timm-keyed SAM HRNet twin vs the ported Flax model."""
    import jax
    import jax.numpy as jnp

    from vsc22_tpu.utils.port_weights import port_hrnet_torch_state_dict
    from ref_torch_loader import TorchSAMHRNet, randomize_bn_stats

    torch.manual_seed(7)
    ref = TorchSAMHRNet(out_chann=out_chann, **twin_kwargs)
    with torch.no_grad():
        for p in ref.parameters():
            if p.ndim >= 2:
                p.normal_(0, 0.05)
    randomize_bn_stats(ref, seed=8)
    ref = ref.eval()

    x = torch.randn(2, 3, size, size)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    template = jax.eval_shape(
        lambda: flax_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
        )
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    variables = port_hrnet_torch_state_dict(ref.state_dict(), template)
    out = np.asarray(
        flax_model.apply(variables, jnp.asarray(_to_flax_input(x)), train=False)
    )

    ref_out = ref_out.transpose(0, 2, 3, 1)  # NCHW -> NHWC
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=atol, rtol=atol)


def test_hrnet_tiny_parity():
    import jax.numpy as jnp

    from vsc22_tpu.models.hrnet import sam_hrnet_tiny_test

    _hrnet_parity_case(
        sam_hrnet_tiny_test(dtype=jnp.float32),
        dict(width=4, stem_ch=8, layer1_blocks=1, stage_modules=(1, 1, 1),
             blocks_per_branch=1),
        size=32,
        atol=1e-4,
        out_chann=8,
    )


@pytest.mark.slow
def test_hrnet_w18_full_model_parity():
    """Full SAM parity: HRNet-W18 (timm `hrnet_w18` topology, stem strides
    1 per M1/train/models.py:25-26) + 334->64->2 fuse head at 64x64."""
    import jax.numpy as jnp

    from vsc22_tpu.models.hrnet import sam_hrnet_w18

    _hrnet_parity_case(
        sam_hrnet_w18(dtype=jnp.float32),
        dict(width=18, stem_ch=64, layer1_blocks=4, stage_modules=(1, 4, 3),
             blocks_per_branch=4),
        size=64,
        atol=1e-3,
        out_chann=64,
    )


def test_vit_port_accepts_ddp_prefixes():
    """Reference checkpoints carry module.backbone.model. prefixes; the port
    must strip them (torch2scripts.py:679 strips module.backbone.)."""
    import jax
    import jax.numpy as jnp

    from vsc22_tpu.models.vit import VIT_TINY_TEST, VitDescriptor
    from vsc22_tpu.utils.port_weights import port_vit_torch_state_dict
    from ref_torch_loader import TorchViT

    cfg = VIT_TINY_TEST
    tv = TorchViT(img_size=cfg.img_size, patch_size=cfg.patch_size,
                  dim=cfg.embed_dim, depth=cfg.depth, heads=cfg.num_heads).eval()
    head_conv = torch.nn.Conv1d(cfg.embed_dim, 64, 1)
    head_lin = torch.nn.Linear(64, 16)

    sd = {f"module.backbone.model.backbone.{k}": v for k, v in tv.state_dict().items()}
    sd["module.backbone.model.embeddings.0.conv.weight"] = head_conv.weight
    sd["module.backbone.model.embeddings.0.conv.bias"] = head_conv.bias
    sd["module.backbone.model.embeddings.1.weight"] = head_lin.weight
    sd["module.backbone.model.embeddings.1.bias"] = head_lin.bias

    model = VitDescriptor(cfg=cfg, head_dim=64, out_dim=16, dtype=jnp.float32)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    )
    params = port_vit_torch_state_dict(sd, jax.tree.map(np.asarray, template))

    x = torch.randn(2, 3, cfg.img_size, cfg.img_size)
    with torch.no_grad():
        tokens = tv(x)
        h = head_conv(tokens.transpose(1, 2)).clamp(min=1e-6).pow(3.0).mean(2).pow(1 / 3.0)
        expected = head_lin(h).numpy()
    out = np.asarray(model.apply(params, jnp.asarray(_to_flax_input(x))))
    np.testing.assert_allclose(out, expected, atol=1e-4, rtol=1e-4)
