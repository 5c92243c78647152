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

import importlib.machinery
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
# Torch MobileNetV3-Small twin with timm `mobilenetv3_small_100` state_dict
# key names (conv_stem/bn1, blocks.{s}.{j}.{conv_pw,bn1,conv_dw,bn2,
# se.conv_reduce,se.conv_expand,conv_pwl,bn3}, conv_head, classifier), so a
# real timm checkpoint ports through the same map the parity test exercises.
# The matching track's ClassifyModel is exactly this with num_classes=2
# (M1/train/models.py:6-16).
# ---------------------------------------------------------------------------


class _TorchSE(nn.Module):
    def __init__(self, chs, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, rd, 1, bias=True)
        self.conv_expand = nn.Conv2d(rd, chs, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.nn.functional.relu(self.conv_reduce(s))
        s = self.conv_expand(s)
        return x * torch.nn.functional.hardsigmoid(s)


def _cbr(in_ch, out_ch, k, s, groups=1):
    pad = ((s - 1) + (k - 1)) // 2
    return nn.Conv2d(in_ch, out_ch, k, s, pad, groups=groups, bias=False)


class _TorchDSConv(nn.Module):
    """timm DepthwiseSeparableConv (blocks.0.0): dw+bn1(relu), se, pw+bn2."""

    def __init__(self, chs, k, stride, se_rd):
        super().__init__()
        self.conv_dw = _cbr(chs, chs, k, stride, groups=chs)
        self.bn1 = nn.BatchNorm2d(chs)
        self.se = _TorchSE(chs, se_rd)
        self.conv_pw = _cbr(chs, chs, 1, 1)
        self.bn2 = nn.BatchNorm2d(chs)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv_dw(x)))
        x = self.se(x)
        return self.bn2(self.conv_pw(x))


class _TorchIR(nn.Module):
    """timm InvertedResidual: pw+bn1(act), dw+bn2(act), [se], pwl+bn3."""

    def __init__(self, in_ch, k, exp, out_ch, se_rd, hs, stride):
        super().__init__()
        self.act = nn.Hardswish() if hs else nn.ReLU()
        self.conv_pw = _cbr(in_ch, exp, 1, 1)
        self.bn1 = nn.BatchNorm2d(exp)
        self.conv_dw = _cbr(exp, exp, k, stride, groups=exp)
        self.bn2 = nn.BatchNorm2d(exp)
        self.se = _TorchSE(exp, se_rd) if se_rd else nn.Identity()
        self.conv_pwl = _cbr(exp, out_ch, 1, 1)
        self.bn3 = nn.BatchNorm2d(out_ch)
        self.has_residual = stride == 1 and in_ch == out_ch

    def forward(self, x):
        sc = x
        x = self.act(self.bn1(self.conv_pw(x)))
        x = self.act(self.bn2(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn3(self.conv_pwl(x))
        return x + sc if self.has_residual else x


class _TorchConvBnAct(nn.Module):
    def __init__(self, in_ch, out_ch, k):
        super().__init__()
        self.conv = _cbr(in_ch, out_ch, k, 1)
        self.bn1 = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return torch.nn.functional.hardswish(self.bn1(self.conv(x)))


class TorchMobileNetV3Small(nn.Module):
    """timm-keyed `mobilenetv3_small_100`; stages group the flat spec as
    timm does: [1, 2, 3, 2, 3] blocks + the 576-ch ConvBnAct stage."""

    STAGES = (1, 2, 3, 2, 3)

    def __init__(self, spec, num_classes=2):
        super().__init__()
        self.conv_stem = _cbr(3, 16, 3, 2)
        self.bn1 = nn.BatchNorm2d(16)
        stages, it, in_ch = [], iter(spec), 16
        for n in self.STAGES:
            stage = []
            for _ in range(n):
                k, exp, out, se_rd, hs, s = next(it)
                if exp == in_ch and se_rd:  # blocks.0.0
                    stage.append(_TorchDSConv(in_ch, k, s, se_rd))
                else:
                    stage.append(_TorchIR(in_ch, k, exp, out, se_rd, hs, s))
                in_ch = out
            stages.append(nn.Sequential(*stage))
        stages.append(nn.Sequential(_TorchConvBnAct(in_ch, 576, 1)))
        self.blocks = nn.Sequential(*stages)
        self.conv_head = nn.Conv2d(576, 1024, 1, bias=True)
        self.classifier = nn.Linear(1024, num_classes)

    def forward(self, x):
        x = torch.nn.functional.hardswish(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        x = x.mean((2, 3), keepdim=True)
        x = torch.nn.functional.hardswish(self.conv_head(x))
        return self.classifier(x.flatten(1))


def randomize_bn_stats(model, seed=0):
    """Give BatchNorm layers non-trivial running stats so eval-mode parity
    actually exercises the folded statistics."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
    return model


# ---------------------------------------------------------------------------
# Torch HRNet twin with timm `hrnet_w18` state_dict key names (conv1/bn1,
# conv2/bn2, layer1.{b}.{conv,bn}{1,2,3}+downsample, transition{1,2,3},
# stage{2,3,4}.{m}.branches.{i}.{b}, fuse_layers.{i}.{j}[.{k}].{0,1}), plus
# the M1 SAM wrapper (model.* + fuse.{0,2}, M1/train/models.py:20-48).
# Stem strides are fixed at 1 as the wrapper forces (models.py:25-26), and
# forward taps feature 0 after conv1/bn1/act1 (before conv2) exactly as
# timm's HighResolutionNetFeatures with feature_location='' does.
# ---------------------------------------------------------------------------


class _HRBasic(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(x + y)


class _HRBottleneck(nn.Module):
    def __init__(self, in_ch, planes):
        super().__init__()
        out = 4 * planes
        self.conv1 = nn.Conv2d(in_ch, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.downsample = (
            nn.Sequential(nn.Conv2d(in_ch, out, 1, bias=False), nn.BatchNorm2d(out))
            if in_ch != out
            else None
        )

    def forward(self, x):
        sc = self.downsample(x) if self.downsample is not None else x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(sc + y)


def _hr_down_chain(chs, i, j):
    """fuse_layers[i][j] for j < i: 3x3 stride-2 chain, C_j kept until the
    last step which lands C_i; ReLU on all but the last."""
    steps = []
    for k in range(i - j):
        last = k == i - j - 1
        oc = chs[i] if last else chs[j]
        mods = [nn.Conv2d(chs[j], oc, 3, 2, 1, bias=False), nn.BatchNorm2d(oc)]
        if not last:
            mods.append(nn.ReLU(False))
        steps.append(nn.Sequential(*mods))
    return nn.Sequential(*steps)


class _HRModule(nn.Module):
    def __init__(self, chs, num_blocks):
        super().__init__()
        n = len(chs)
        self.branches = nn.ModuleList(
            nn.Sequential(*[_HRBasic(c) for _ in range(num_blocks)]) for c in chs
        )
        fuse = []
        for i in range(n):
            row = []
            for j in range(n):
                if j == i:
                    row.append(nn.Identity())
                elif j > i:
                    row.append(
                        nn.Sequential(
                            nn.Conv2d(chs[j], chs[i], 1, 1, 0, bias=False),
                            nn.BatchNorm2d(chs[i]),
                            nn.Upsample(scale_factor=2 ** (j - i), mode="nearest"),
                        )
                    )
                else:
                    row.append(_hr_down_chain(chs, i, j))
            fuse.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse)

    def forward(self, xs):
        xs = [b(x) for b, x in zip(self.branches, xs)]
        out = []
        for row in self.fuse_layers:
            acc = None
            for j, f in enumerate(row):
                t = f(xs[j])
                acc = t if acc is None else acc + t
            out.append(torch.relu(acc))
        return out


class TorchHRNetFeatures(nn.Module):
    def __init__(self, width=18, stem_ch=64, layer1_blocks=4,
                 stage_modules=(1, 4, 3), blocks_per_branch=4, in_chans=3):
        super().__init__()
        self.conv1 = nn.Conv2d(in_chans, stem_ch, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(stem_ch)
        self.conv2 = nn.Conv2d(stem_ch, stem_ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(stem_ch)
        blocks, in_ch = [], stem_ch
        for _ in range(layer1_blocks):
            blocks.append(_HRBottleneck(in_ch, stem_ch))
            in_ch = 4 * stem_ch
        self.layer1 = nn.Sequential(*blocks)
        chs = [width, 2 * width, 4 * width, 8 * width]
        relu = lambda: nn.ReLU(False)  # noqa: E731
        self.transition1 = nn.ModuleList([
            nn.Sequential(
                nn.Conv2d(in_ch, chs[0], 3, 1, 1, bias=False),
                nn.BatchNorm2d(chs[0]), relu(),
            ),
            nn.Sequential(nn.Sequential(
                nn.Conv2d(in_ch, chs[1], 3, 2, 1, bias=False),
                nn.BatchNorm2d(chs[1]), relu(),
            )),
        ])
        self.stage2 = nn.Sequential(
            *[_HRModule(chs[:2], blocks_per_branch) for _ in range(stage_modules[0])]
        )
        self.transition2 = nn.ModuleList([
            nn.Identity(), nn.Identity(),
            nn.Sequential(nn.Sequential(
                nn.Conv2d(chs[1], chs[2], 3, 2, 1, bias=False),
                nn.BatchNorm2d(chs[2]), relu(),
            )),
        ])
        self.stage3 = nn.Sequential(
            *[_HRModule(chs[:3], blocks_per_branch) for _ in range(stage_modules[1])]
        )
        self.transition3 = nn.ModuleList([
            nn.Identity(), nn.Identity(), nn.Identity(),
            nn.Sequential(nn.Sequential(
                nn.Conv2d(chs[2], chs[3], 3, 2, 1, bias=False),
                nn.BatchNorm2d(chs[3]), relu(),
            )),
        ])
        self.stage4 = nn.Sequential(
            *[_HRModule(chs, blocks_per_branch) for _ in range(stage_modules[2])]
        )

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        out = [x]  # feature 0 tap: before conv2
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xl = [t(x) for t in self.transition1]
        yl = self.stage2(xl)
        xl = [yl[i] if isinstance(t, nn.Identity) else t(yl[-1])
              for i, t in enumerate(self.transition2)]
        yl = self.stage3(xl)
        xl = [yl[i] if isinstance(t, nn.Identity) else t(yl[-1])
              for i, t in enumerate(self.transition3)]
        yl = self.stage4(xl)
        return out + yl


class TorchSAMHRNet(nn.Module):
    """M1 HRnet wrapper: model.* backbone keys + fuse.{0,2} head keys."""

    def __init__(self, out_chann=64, **kwargs):
        super().__init__()
        self.model = TorchHRNetFeatures(**kwargs)
        width = kwargs.get("width", 18)
        stem = kwargs.get("stem_ch", 64)
        in_chann = stem + 15 * width
        self.fuse = nn.Sequential(
            nn.Conv2d(in_chann, out_chann, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(out_chann, 2, 1, 1),
        )

    def forward(self, x):
        yl = self.model(x)
        ups = [1, 1, 2, 4, 8]
        yl = [
            torch.nn.functional.interpolate(t, scale_factor=u, mode="nearest")
            if u > 1 else t
            for t, u in zip(yl, ups)
        ]
        return self.fuse(torch.cat(yl, dim=1))


# ---------------------------------------------------------------------------
# Torch video-score (MS) twin over a REAL transformers BertModel.
#
# The reference's MS (D1/train/train_vid_score/video/model.py:63-100) is
# `AutoModel.from_pretrained(chinese-roberta-wwm-ext)` — a BertModel — plus
# a frame projection and an output head. transformers is present in this
# environment, so the twin wraps an actual random-init BertModel; only the
# thin glue (frame proj, [101,102] special-token splice, masked pooling,
# output head) is mirrored here.
# ---------------------------------------------------------------------------


class TorchMS(nn.Module):
    """model.py:63-100 semantics with an explicit BertConfig.

    `output_dim=0` is the MS scorer (1 squeezed logit); >0 is the MD
    embedding twin (model.py:6-60) — same trunk, wider output head.
    """

    def __init__(self, feat_dim=1024, bert_dim=768, layers=12, heads=12,
                 max_frames=256, vocab_size=1000, output_dim=0):
        super().__init__()
        from transformers import BertConfig, BertModel

        self.frame_proj = nn.Sequential(
            nn.Linear(feat_dim, bert_dim), nn.LayerNorm(bert_dim)
        )
        cfg = BertConfig(
            vocab_size=vocab_size,
            hidden_size=bert_dim,
            num_hidden_layers=layers,
            num_attention_heads=heads,
            intermediate_size=4 * bert_dim,
            max_position_embeddings=max_frames + 2,
            hidden_act="gelu",
            layer_norm_eps=1e-12,
            attn_implementation="eager",
        )
        self.bert = BertModel(cfg)
        self.output_dim = output_dim
        self.output_proj = nn.Linear(bert_dim * 2, output_dim or 1)

    def forward(self, feats):
        vision_feats = self.frame_proj(feats)
        masks = feats.abs().sum(dim=2).gt(0)
        bz = vision_feats.size(0)
        text = torch.tensor([101, 102], dtype=torch.long)[None]
        emb = self.bert.get_input_embeddings()
        text_emb = emb(text).expand((bz, -1, -1))
        cls_emb, sep_emb = text_emb[:, 0], text_emb[:, 1]
        inputs_embeds = torch.cat(
            [cls_emb[:, None], vision_feats, sep_emb[:, None]], dim=1
        )
        masks = torch.cat([torch.ones((bz, 2)), masks], dim=1)
        states = self.bert(inputs_embeds=inputs_embeds, attention_mask=masks)[0]
        masks = masks.to(states.dtype)
        avg_pool = (states * masks[..., None]).sum(dim=1) / (
            masks.sum(dim=1, keepdim=True) + 1e-5
        )
        cat_pool = torch.cat([states[:, 0], avg_pool], dim=1)
        out = self.output_proj(cat_pool)
        return out if self.output_dim else out.squeeze(1)


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

    def _shim_module(name):
        # A real ModuleSpec so later importlib.util.find_spec(name) probes
        # (e.g. transformers' optional-dependency checks) don't raise
        # "module.__spec__ is None".
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return mod

    timm = _shim_module("timm")
    timm_models = _shim_module("timm.models")
    timm_layers = _shim_module("timm.models.layers")
    timm_vit = _shim_module("timm.models.vision_transformer")
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

    classy = _shim_module("classy_vision")
    classy_models = _shim_module("classy_vision.models")
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
