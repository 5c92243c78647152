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
import numpy as np


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


# ---------------------------------------------------------------------------
# Space-to-depth fast path for the full-resolution low-channel branch.
#
# HRNet's defining quirk — an 18-channel branch kept at full input
# resolution — is the worst possible shape for the MXU: XLA pads conv
# channel dims to the 128-lane register width, so every branch-0 3x3 conv
# (64 of them per forward) runs at 18/128 lane occupancy, ~50x padded
# FLOPs, and its activations are stored 128-lane padded in HBM (~7x the
# real bytes). Packing 2x2 spatial blocks into channels ([B, H, W, C] ->
# [B, H/2, W/2, 4C]) and remapping the 3x3 kernel accordingly computes the
# SAME convolution at 72 channels: 4x fewer padded MACs and ~3.5x less
# padded HBM traffic, with identical parameters (the remap is a linear
# reindexing of the stored [3, 3, C, F] kernel done on the fly).
#
# Derivation: for output pixel (2a+p, 2b+q), tap (di, dj) of a stride-1
# padded 3x3 conv reads input row 2a+p+di-1 = 2(a+Da)+pt with
# Da = floor((p+di-1)/2), pt = (p+di-1) mod 2. Over the packed layout this
# is a 3x3 conv whose kernel entry [Da+1, Db+1, (pt,qt,ci), (p,q,co)]
# equals W[di, dj, ci, co] when di = 2*Da+pt-p+1 lands in [0, 2] (zero
# otherwise); zero padding of the packed layout reproduces the original
# zero padding exactly.
# ---------------------------------------------------------------------------

def _s2d_tap_matrix() -> np.ndarray:
    """M[a, pt, p, di] = 1 iff tap di of the original kernel feeds packed
    kernel offset a for output phase p reading input phase pt."""
    m = np.zeros((3, 2, 2, 3), np.float32)
    for a in range(3):
        for pt in range(2):
            for p in range(2):
                di = 2 * (a - 1) + pt - p + 1
                if 0 <= di <= 2:
                    m[a, pt, p, di] = 1.0
    return m


_S2D_TAP = _s2d_tap_matrix()


def _s2d(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel order (p, q, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _d2s(x: jax.Array) -> jax.Array:
    """Inverse of `_s2d`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def _s2d_kernel(w: jax.Array) -> jax.Array:
    """Remap a [3, 3, C, F] stride-1 kernel to its packed [3, 3, 4C, 4F]
    equivalent (one einsum against the constant tap matrix)."""
    m = jnp.asarray(_S2D_TAP, w.dtype)
    # out[a, b, pt, qt, ci, p, q, co]
    out = jnp.einsum("axpd,byqe,decf->abxycpqf", m, m, w)
    k, _, c, f = w.shape
    return out.reshape(k, k, 4 * c, 4 * f)


class _ConvKernel(nn.Module):
    """Parameter shell matching ``nn.Conv(use_bias=False)``'s tree."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class _BNParams(nn.Module):
    """Parameter shell matching ``nn.BatchNorm``'s tree (inference use)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )
        return scale, bias, mean.value, var.value


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, s2d: bool = False):
        # Explicit symmetric padding = torch Conv2d(padding=(k-1)//2), the
        # convention every timm HRNet conv uses. Identical to SAME at
        # stride 1, but SAME pads asymmetrically for stride 2 on even
        # inputs — the distinction matters for timm checkpoint parity.
        pad = (self.kernel - 1) // 2
        if not s2d:
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

        # Packed fast path: `x` is in space-to-depth layout ([.., 4*C_in]).
        # Inference only (BN running stats); parameters live under the SAME
        # names/shapes as the standard path (`Conv_0/kernel`,
        # `BatchNorm_0/{scale,bias,mean,var}`) via shell modules, so
        # checkpoints and ports are oblivious to which path runs.
        assert not train and self.kernel == 3 and self.stride == 1
        cin = x.shape[-1] // 4
        w = _ConvKernel((3, 3, cin, self.features), name="Conv_0")()
        scale, bias, mean, var = _BNParams(self.features, name="BatchNorm_0")()
        w2 = _s2d_kernel(w).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w2,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # Folded inference BN (f32 constants, applied in compute dtype).
        mult = scale / jnp.sqrt(var + 1e-5)
        add = bias - mean * mult
        y = y * jnp.tile(mult, 4).astype(self.dtype) + jnp.tile(add, 4).astype(
            self.dtype
        )
        return nn.relu(y) if self.act else y


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
    def __call__(self, x, train: bool = False, s2d: bool = False):
        y = ConvBN(self.planes, 3, dtype=self.dtype, name="conv1")(x, train, s2d)
        y = ConvBN(self.planes, 3, act=False, dtype=self.dtype, name="conv2")(y, train, s2d)
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
    s2d_branch0: bool = False

    @nn.compact
    def __call__(self, xs: List[jax.Array], train: bool = False) -> List[jax.Array]:
        n = len(self.channels)
        ys = []
        for i, x in enumerate(xs):
            # Branch 0 (the full-resolution low-channel branch) runs its
            # block chain in space-to-depth layout when enabled: one
            # transform in, `num_blocks` packed blocks, one transform out
            # before fusion. See the header comment above `_s2d`.
            s2d = (
                self.s2d_branch0
                and i == 0
                and not train
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
            )
            if s2d:
                x = _s2d(x)
            for b in range(self.num_blocks):
                x = BasicBlock(self.channels[i], dtype=self.dtype, name=f"branch{i}_block{b}")(
                    x, train, s2d
                )
            if s2d:
                x = _d2s(x)
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
    s2d_branch0: bool = False

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
            xs = HRModule(ch[:2], cfg.blocks_per_branch, dtype=self.dtype,
                          s2d_branch0=self.s2d_branch0, name=f"stage2_m{m}")(
                xs, train
            )
        xs.append(ConvBN(ch[2], 3, stride=2, dtype=self.dtype, name="trans2")(xs[-1], train))
        for m in range(cfg.stage_modules[1]):
            xs = HRModule(ch[:3], cfg.blocks_per_branch, dtype=self.dtype,
                          s2d_branch0=self.s2d_branch0, name=f"stage3_m{m}")(
                xs, train
            )
        xs.append(ConvBN(ch[3], 3, stride=2, dtype=self.dtype, name="trans3")(xs[-1], train))
        for m in range(cfg.stage_modules[2]):
            xs = HRModule(ch, cfg.blocks_per_branch, dtype=self.dtype,
                          s2d_branch0=self.s2d_branch0, name=f"stage4_m{m}")(
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
    s2d_branch0: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = HRNetFeatures(self.cfg, dtype=self.dtype,
                              s2d_branch0=self.s2d_branch0, name="backbone")(
            x.astype(self.dtype), train
        )
        ups = (1, 1, 2, 4, 8)
        chans = tuple(int(f.shape[-1]) for f in feats)
        y = _SplitFuse(
            self.fuse_channels, chans, ups, dtype=self.dtype, name="fuse1"
        )(feats)
        y = nn.relu(y)
        return nn.Conv(2, (1, 1), dtype=jnp.float32, name="fuse2")(y)


def sam_hrnet_w18(dtype=jnp.float32, s2d: bool = False) -> SAMHRNet:
    """`s2d=True` enables the packed branch-0 inference path (identical
    parameters and outputs; ~2x faster serving forward on the MXU)."""
    return SAMHRNet(cfg=HRNET_W18_SAM, dtype=dtype, s2d_branch0=s2d)


def sam_hrnet_tiny_test(dtype=jnp.float32, s2d: bool = False) -> SAMHRNet:
    return SAMHRNet(cfg=HRNET_TINY_TEST, fuse_channels=8, dtype=dtype, s2d_branch0=s2d)
