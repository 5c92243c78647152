"""Load the reference's vendored torch models for full-model parity tests.

The vendored files (PUBLIC reference content, read-only) import a handful of
libraries absent from this environment (timm, classy_vision, mmcv,
torchsnooper). Only trivial symbols are actually used on the paths we test,
so they are shimmed here:

  - timm.models.layers.{DropPath,to_2tuple,trunc_normal_} (swinv2.py) —
    DropPath is identity in eval mode, which is the only mode parity runs in;
  - timm.{list_models,create_model} (sscd.py) — create_model returns a
    faithful torch implementation of `vit_base_patch32_384`
    (global_pool='', num_classes=0 semantics: all tokens after the final
    norm), defined below, so the vendored SSCD head code runs unmodified;
  - classy_vision / mmcv.runner / torchsnooper — unused on these paths.

The loader execs the vendored source with the package-relative
`from ..utils import BACKBONES` replaced by a no-op registry.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn

REF_ROOT = "/root/reference/VSC22-Descriptor-Track-1st"


# ---------------------------------------------------------------------------
# Faithful torch ViT (timm `vit_base_patch32_384` with global_pool='',
# num_classes=0): pre-norm blocks, fused QKV, exact GELU, LN eps 1e-6,
# returns all tokens [B, 1+P, C] after the final norm.
# ---------------------------------------------------------------------------


class _TorchViTBlock(nn.Module):
    def __init__(self, dim: int, num_heads: int, mlp_ratio: float = 4.0):
        super().__init__()
        self.num_heads = num_heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)

    def _attention(self, x):
        b, l, c = x.shape
        hd = c // self.num_heads
        qkv = self.attn.qkv(x).reshape(b, l, 3, self.num_heads, hd)
        qkv = qkv.permute(2, 0, 3, 1, 4)  # [3, B, H, L, hd]
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (hd**-0.5)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, l, c)
        return self.attn.proj(out)

    def forward(self, x):
        x = x + self._attention(self.norm1(x))
        h = self.mlp.fc1(self.norm2(x))
        h = torch.nn.functional.gelu(h)  # exact erf GELU (timm/torch default)
        return x + self.mlp.fc2(h)


class TorchViT(nn.Module):
    """timm-compatible state_dict keys: patch_embed.proj.*, cls_token,
    pos_embed, blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2},
    norm."""

    def __init__(self, img_size=384, patch_size=32, dim=768, depth=12, heads=12):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch_size, stride=patch_size)
        num_patches = (img_size // patch_size) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + num_patches, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [_TorchViTBlock(dim, heads) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.patch_embed.proj(x)  # [B, C, H/p, W/p]
        x = x.flatten(2).transpose(1, 2)  # [B, P, C]
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat((cls, x), dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)  # all tokens (global_pool='', num_classes=0)


# ---------------------------------------------------------------------------
# Dependency shims + vendored-source loader
# ---------------------------------------------------------------------------


def _install_shims():
    if "timm" in sys.modules:
        return

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std + mean, max=b * std + mean)
        return tensor

    class DropPath(nn.Module):  # identity in eval mode (the only mode used)
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.training and self.drop_prob:
                raise RuntimeError("parity shim DropPath only supports eval()")
            return x

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_vit = types.ModuleType("timm.models.vision_transformer")
    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm_vit._load_weights = lambda *a, **k: None
    timm.list_models = lambda pretrained=False: ["vit_base_patch32_384"]

    def create_model(name, pretrained=False, **kwargs):
        assert name == "vit_base_patch32_384", name
        return TorchViT()

    timm.create_model = create_model
    timm.models = timm_models
    timm_models.layers = timm_layers
    timm_models.vision_transformer = timm_vit
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers
    sys.modules["timm.models.vision_transformer"] = timm_vit

    classy = types.ModuleType("classy_vision")
    classy_models = types.ModuleType("classy_vision.models")
    classy_models.build_model = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("classy_vision path not supported in parity tests")
    )
    classy.models = classy_models
    sys.modules["classy_vision"] = classy
    sys.modules["classy_vision.models"] = classy_models

    mmcv = types.ModuleType("mmcv")
    mmcv_runner = types.ModuleType("mmcv.runner")
    mmcv_runner.load_checkpoint = lambda *a, **k: None
    mmcv.runner = mmcv_runner
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.runner"] = mmcv_runner

    sys.modules["torchsnooper"] = types.ModuleType("torchsnooper")


_REGISTRY_STUB = """
class _NoopRegistry:
    def register_module(self, *a, **k):
        def deco(cls):
            return cls
        return deco
BACKBONES = _NoopRegistry()
"""


def load_vendored(relpath: str):
    """Exec a vendored reference model file; returns its module namespace."""
    _install_shims()
    path = f"{REF_ROOT}/{relpath}"
    src = open(path).read()
    src = src.replace("from ..utils import BACKBONES", _REGISTRY_STUB)
    mod = types.ModuleType("ref_" + relpath.replace("/", "_").replace(".py", ""))
    mod.__file__ = path
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def load_reference_swinv2():
    """The vendored SwinTransformerV2 class (train_v106 copy)."""
    return load_vendored(
        "train/train_v106/vsc/baseline/model_factory/backbones/swinv2.py"
    ).SwinTransformerV2


def load_reference_sscd():
    """The vendored SSCDModel class (train_v68 copy, timm-ViT backbone)."""
    return load_vendored(
        "train/train_v68/vsc/baseline/model_factory/backbones/sscd.py"
    ).SSCDModel


def load_reference_clip():
    """The vendored OpenAI-CLIP visual tower (train_vid_score copy).

    `CLIPModel` (clip.py:85-163) uses only torch + mmcv.runner.load_checkpoint
    (shimmed) + yaml (present); proj is None so forward returns all tokens
    post-ln_post — the exact contract our CLIPVisual mirrors.
    """
    return load_vendored("train/train_vid_score/video/clip.py").CLIPModel
