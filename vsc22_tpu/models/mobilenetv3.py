"""MobileNetV3-Small classifier (the matching-track candidate filter).

Parity target (reference, for cross-checking — original implementation):
  M1/train/models.py:6-16 — timm `mobilenetv3_small_100` with a 2-class head,
  consuming 160x160 zero-padded similarity-matrix "images" (the sim matrix
  stacked 3x as channels, M1/train/dataset.py:6-41). Architecture follows
  the MobileNetV3 paper's Small spec (arXiv:1905.02244, Table 2).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


# (kernel, expansion, out_channels, se_reduce_ch, use_hswish, stride)
# se_reduce_ch = round_channels(expanded_chs * 0.25), divisor 8, round-limit
# 0.9 — the paper's "1/4 of the expansion layer channels" rule as timm and
# torchvision round it. 0 = no SE. Explicit values (timm
# `mobilenetv3_small_100`) because weight porting requires exact widths.
MNV3_SMALL_SPEC: Tuple[Tuple[int, int, int, int, bool, int], ...] = (
    (3, 16, 16, 8, False, 2),
    (3, 72, 24, 0, False, 2),
    (3, 88, 24, 0, False, 1),
    (5, 96, 40, 24, True, 2),
    (5, 240, 40, 64, True, 1),
    (5, 240, 40, 64, True, 1),
    (5, 120, 48, 32, True, 1),
    (5, 144, 48, 40, True, 1),
    (5, 288, 96, 72, True, 2),
    (5, 576, 96, 144, True, 1),
    (5, 576, 96, 144, True, 1),
)


class SqueezeExcite(nn.Module):
    reduce_to: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(self.reduce_to, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, name="fc2")(s)
        return x * hard_sigmoid(s)[:, None, None, :]


class ConvBNAct(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: Optional[str] = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Explicit symmetric padding = torch Conv2d(padding=((s-1)+(k-1))//2),
        # timm's static pad. Identical to SAME for stride 1 / odd kernels but
        # NOT for stride 2 on even inputs (SAME pads asymmetrically) — the
        # distinction matters for bit-parity with timm checkpoints.
        pad = ((self.stride - 1) + (self.kernel - 1)) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "hswish":
            x = hard_swish(x)
        return x


class InvertedResidual(nn.Module):
    kernel: int
    expansion: int
    out_ch: int
    se_reduce: int  # SE bottleneck channels; 0 disables SE
    use_hswish: bool
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        act = "hswish" if self.use_hswish else "relu"
        y = x
        if self.expansion != in_ch:
            y = ConvBNAct(self.expansion, 1, act=act, dtype=self.dtype, name="expand")(y, train)
        y = ConvBNAct(
            self.expansion,
            self.kernel,
            stride=self.stride,
            groups=self.expansion,
            act=act,
            dtype=self.dtype,
            name="dw",
        )(y, train)
        if self.se_reduce:
            y = SqueezeExcite(self.se_reduce, dtype=self.dtype, name="se")(y)
        y = ConvBNAct(self.out_ch, 1, act=None, dtype=self.dtype, name="project")(y, train)
        if self.stride == 1 and in_ch == self.out_ch:
            y = x + y
        return y


class MobileNetV3Small(nn.Module):
    """Returns [B, num_classes] logits."""

    num_classes: int = 2
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.2
    spec: Sequence = MNV3_SMALL_SPEC

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        x = ConvBNAct(16, 3, stride=2, act="hswish", dtype=self.dtype, name="stem")(
            images.astype(self.dtype), train
        )
        for i, (k, exp, out, se, hs, s) in enumerate(self.spec):
            x = InvertedResidual(k, exp, out, se, hs, s, dtype=self.dtype, name=f"block{i}")(
                x, train
            )
        x = ConvBNAct(576, 1, act="hswish", dtype=self.dtype, name="head_conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(1024, dtype=self.dtype, name="pre_logits")(x)
        x = hard_swish(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)


def mobilenetv3_small(num_classes: int = 2, dtype=jnp.float32) -> MobileNetV3Small:
    return MobileNetV3Small(num_classes=num_classes, dtype=dtype)
