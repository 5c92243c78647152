"""HRNet-W18 + fusion head: the Similarity Alignment Model (SAM).

Parity target (reference, for cross-checking — original implementation):
  M1/train/models.py:20-48 — timm `hrnet_w18` features_only with the two
  stem conv strides set to (1,1) so the output keeps the input resolution;
  the 5 feature maps (stem 64ch + final-stage branches 18/36/72/144ch) are
  nearest-upsampled to full resolution, concatenated (334ch) and fused by
  1x1 convs into a 2-channel per-pixel match heatmap over the similarity
  matrix. HRNet itself follows arXiv:1908.07919 (W18 classification cfg:
  layer1 = 4 bottlenecks; stages of 1/4/3 modules with 4 basic blocks per
  branch and full cross-resolution fusion).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HRNetConfig:
    width: int = 18
    layer1_blocks: int = 4
    stage_modules: Tuple[int, int, int] = (1, 4, 3)  # stages 2, 3, 4
    blocks_per_branch: int = 4
    stem_stride: int = 1  # SAM sets the usual 2 to 1 (full resolution)
    stem_channels: int = 64

    @property
    def branch_channels(self) -> Tuple[int, ...]:
        return (self.width, 2 * self.width, 4 * self.width, 8 * self.width)


HRNET_W18_SAM = HRNetConfig()
HRNET_TINY_TEST = HRNetConfig(
    width=4, layer1_blocks=1, stage_modules=(1, 1, 1), blocks_per_branch=1, stem_channels=8
)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Explicit symmetric padding = torch Conv2d(padding=(k-1)//2), the
        # convention every timm HRNet conv uses. Identical to SAME at
        # stride 1, but SAME pads asymmetrically for stride 2 on even
        # inputs — the distinction matters for timm checkpoint parity.
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x) if self.act else x


class Bottleneck(nn.Module):
    planes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = 4 * self.planes
        y = ConvBN(self.planes, 1, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.planes, 3, dtype=self.dtype, name="conv2")(y, train)
        y = ConvBN(out_ch, 1, act=False, dtype=self.dtype, name="conv3")(y, train)
        if x.shape[-1] != out_ch:
            x = ConvBN(out_ch, 1, act=False, dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(x + y)


class BasicBlock(nn.Module):
    planes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.planes, 3, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.planes, 3, act=False, dtype=self.dtype, name="conv2")(y, train)
        return nn.relu(x + y)


def _nearest_up(x: jax.Array, factor: int) -> jax.Array:
    """Integer-factor nearest upsampling as broadcast+reshape.

    Identical to jax.image.resize(..., "nearest") for whole factors (output
    pixel i reads input i // factor), but lowers to a pure broadcast
    instead of a gather — XLA fuses it into the surrounding elementwise
    ops, which matters at the SAM head's full-resolution adds."""
    if factor == 1:
        return x
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return x.reshape(b, h * factor, w * factor, c)


class HRModule(nn.Module):
    """Parallel branches of basic blocks + full cross-resolution fusion."""

    channels: Tuple[int, ...]
    num_blocks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jax.Array], train: bool = False) -> List[jax.Array]:
        n = len(self.channels)
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = BasicBlock(self.channels[i], dtype=self.dtype, name=f"branch{i}_block{b}")(
                    x, train
                )
            ys.append(x)

        fused = []
        for i in range(n):
            acc = ys[i]
            for j in range(n):
                if j == i:
                    continue
                if j > i:
                    # lower resolution -> 1x1 conv to C_i, upsample 2^(j-i)
                    t = ConvBN(
                        self.channels[i], 1, act=False, dtype=self.dtype, name=f"fuse{i}_{j}"
                    )(ys[j], train)
                    t = _nearest_up(t, 2 ** (j - i))
                else:
                    # higher resolution -> chain of stride-2 3x3 convs
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        t = ConvBN(
                            self.channels[i] if last else self.channels[j],
                            3,
                            stride=2,
                            act=not last,
                            dtype=self.dtype,
                            name=f"fuse{i}_{j}_step{k}",
                        )(t, train)
                acc = acc + t
            fused.append(nn.relu(acc))
        return fused


class HRNetFeatures(nn.Module):
    """Returns [stem(64ch), branch0(w), branch1(2w), branch2(4w), branch3(8w)]
    at resolutions [1, 1, 1/2, 1/4, 1/8] x stem resolution."""

    cfg: HRNetConfig = HRNET_W18_SAM
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        cfg = self.cfg
        s = cfg.stem_stride
        x = ConvBN(cfg.stem_channels, 3, stride=s, dtype=self.dtype, name="stem1")(x, train)
        # timm features_only taps feature 0 after conv1/bn1/act1, BEFORE
        # conv2 (hrnet.py HighResolutionNetFeatures.forward).
        stem_out = x
        x = ConvBN(cfg.stem_channels, 3, stride=s, dtype=self.dtype, name="stem2")(x, train)

        for b in range(cfg.layer1_blocks):
            x = Bottleneck(cfg.stem_channels, dtype=self.dtype, name=f"layer1_{b}")(x, train)

        ch = cfg.branch_channels
        # Transition 1: two branches from layer1 output.
        xs = [
            ConvBN(ch[0], 3, dtype=self.dtype, name="trans1_0")(x, train),
            ConvBN(ch[1], 3, stride=2, dtype=self.dtype, name="trans1_1")(x, train),
        ]
        for m in range(cfg.stage_modules[0]):
            xs = HRModule(ch[:2], cfg.blocks_per_branch, dtype=self.dtype, name=f"stage2_m{m}")(
                xs, train
            )
        xs.append(ConvBN(ch[2], 3, stride=2, dtype=self.dtype, name="trans2")(xs[-1], train))
        for m in range(cfg.stage_modules[1]):
            xs = HRModule(ch[:3], cfg.blocks_per_branch, dtype=self.dtype, name=f"stage3_m{m}")(
                xs, train
            )
        xs.append(ConvBN(ch[3], 3, stride=2, dtype=self.dtype, name="trans3")(xs[-1], train))
        for m in range(cfg.stage_modules[2]):
            xs = HRModule(ch, cfg.blocks_per_branch, dtype=self.dtype, name=f"stage4_m{m}")(
                xs, train
            )
        return [stem_out] + xs


class _SplitFuse(nn.Module):
    """The head's 1x1 fuse conv, applied PER SCALE before upsampling.

    Param-tree-compatible with ``nn.Conv(features, (1, 1), name="fuse1")``
    over the full-resolution multi-scale concat (kernel [1, 1, sum(C), F],
    bias [F]) — checkpoints port identically — but numerically equal at a
    fraction of the cost: a 1x1 conv commutes with nearest upsampling, so
    each scale's slice of the kernel is applied at that branch's native
    resolution and only the F-channel results are upsampled and summed.
    The reference layout's [B, 224, 224, 334] concat (~67 MB bf16 per
    image, rebuilt 4x per pair under fold x TTA) never materializes, and
    the low-resolution branches' GEMMs shrink by up to 64x.
    """

    features: int
    in_channels: Tuple[int, ...]
    ups: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jax.Array]) -> jax.Array:
        total = sum(self.in_channels)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, total, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        acc = None
        start = 0
        for f, c, u in zip(feats, self.in_channels, self.ups):
            w = kernel[0, 0, start : start + c].astype(self.dtype)
            y = jnp.dot(
                f.astype(self.dtype), w, preferred_element_type=jnp.float32
            )
            y = _nearest_up(y, u)
            acc = y if acc is None else acc + y
            start += c
        return (acc + bias).astype(self.dtype)


class SAMHRNet(nn.Module):
    """SAM head: multi-scale 1x1 fuse (split form) -> relu -> 2ch map.

    Input [B, H, W, C_in] (the sim matrix stacked as channels), output
    [B, H, W, 2] per-pixel match logits. Semantics: upsample the 5 feature
    maps to full resolution, concat (334 ch), 1x1 conv to 64, relu, 1x1
    conv to 2 (M1/train/models.py:20-48) — the fuse runs in the
    commuted per-scale form (see _SplitFuse), same values.
    """

    cfg: HRNetConfig = HRNET_W18_SAM
    fuse_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = HRNetFeatures(self.cfg, dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        ups = (1, 1, 2, 4, 8)
        chans = tuple(int(f.shape[-1]) for f in feats)
        y = _SplitFuse(
            self.fuse_channels, chans, ups, dtype=self.dtype, name="fuse1"
        )(feats)
        y = nn.relu(y)
        return nn.Conv(2, (1, 1), dtype=jnp.float32, name="fuse2")(y)


def sam_hrnet_w18(dtype=jnp.float32) -> SAMHRNet:
    return SAMHRNet(cfg=HRNET_W18_SAM, dtype=dtype)


def sam_hrnet_tiny_test(dtype=jnp.float32) -> SAMHRNet:
    return SAMHRNet(cfg=HRNET_TINY_TEST, fuse_channels=8, dtype=dtype)
