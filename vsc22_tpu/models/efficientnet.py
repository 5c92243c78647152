"""EfficientNetV2-style backbone + GeM + Linear/BN descriptor head (Flax).

Part of the legacy model-zoo surface: registered in the reference's factory
but absent from every final config (SURVEY §2.3). Parity target (original
implementation, for cross-checking):
  D1/train/train_v68/vsc/baseline/model_factory/backbones/efficientnet.py:11-64
  (timm tf_efficientnetv2 features_only + spatial GeM + Linear(no bias) + BN).

The reference delegates the conv trunk to timm; here it is an explicit
parameterized V2 trunk (FusedMBConv early stages, MBConv+SE late stages),
which XLA maps onto the MXU as conv GEMMs. BatchNorm runs in inference mode
by default (`train=True` requires `mutable=["batch_stats"]`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MBStage:
    fused: bool  # FusedMBConv (3x3 expand conv) vs MBConv (1x1 + depthwise)
    expand: int
    channels: int
    layers: int
    stride: int
    se_ratio: float = 0.0


@dataclasses.dataclass(frozen=True)
class EfficientNetConfig:
    stem_channels: int = 24
    stages: Tuple[MBStage, ...] = (
        MBStage(True, 1, 24, 2, 1),
        MBStage(True, 4, 48, 4, 2),
        MBStage(True, 4, 64, 4, 2),
        MBStage(False, 4, 128, 6, 2, 0.25),
        MBStage(False, 6, 160, 9, 1, 0.25),
        MBStage(False, 6, 256, 15, 2, 0.25),
    )
    fc_dim: int = 256
    pool_param: float = 1.0  # reference default p=1.0 (plain average)


EFFNET_V2_S = EfficientNetConfig()
EFFNET_TINY_TEST = EfficientNetConfig(
    stem_channels=8,
    stages=(
        MBStage(True, 2, 8, 1, 2),
        MBStage(False, 2, 16, 1, 2, 0.25),
    ),
    fc_dim=16,
)


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class MBConvBlock(nn.Module):
    stage: MBStage
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        st = self.stage
        cin = x.shape[-1]
        mid = cin * st.expand
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name=name
        )
        shortcut = x

        if st.fused:
            y = nn.Conv(
                mid, (3, 3), strides=(self.stride, self.stride), padding="SAME",
                use_bias=False, dtype=self.dtype, name="expand_conv",
            )(x)
            y = nn.silu(norm("bn0")(y))
        else:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv")(x)
            y = nn.silu(norm("bn0")(y))
            y = nn.Conv(
                mid, (3, 3), strides=(self.stride, self.stride), padding="SAME",
                feature_group_count=mid, use_bias=False, dtype=self.dtype, name="dw_conv",
            )(y)
            y = nn.silu(norm("bn1")(y))
        if st.se_ratio > 0:
            y = SqueezeExcite(
                max(1, int(cin * st.se_ratio)), dtype=self.dtype, name="se"
            )(y)
        y = nn.Conv(st.channels, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(y)
        y = norm("bn2")(y)
        if self.stride == 1 and cin == st.channels:
            y = y + shortcut
        return y


class EfficientNet(nn.Module):
    """V2 trunk -> spatial GeM(p) -> Linear(fc_dim, no bias) -> BatchNorm."""

    cfg: EfficientNetConfig = EFFNET_V2_S
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        x = nn.Conv(
            cfg.stem_channels, (3, 3), strides=(2, 2), padding="SAME",
            use_bias=False, dtype=self.dtype, name="stem",
        )(images.astype(self.dtype))
        x = nn.silu(
            nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="stem_bn")(x)
        )
        for si, stage in enumerate(cfg.stages):
            for li in range(stage.layers):
                x = MBConvBlock(
                    stage,
                    stride=stage.stride if li == 0 else 1,
                    dtype=self.dtype,
                    name=f"stage{si}_block{li}",
                )(x, train)

        # Spatial GeM (reference efficientnet.py:62-64: clamp(eps)^p avg ^1/p)
        p = cfg.pool_param
        pooled = jnp.mean(
            jnp.clip(x.astype(jnp.float32), 1e-6, None) ** p, axis=(1, 2)
        ) ** (1.0 / p)
        y = nn.Dense(cfg.fc_dim, use_bias=False, dtype=jnp.float32, name="fc")(pooled)
        return nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn")(y)


def efficientnet_v2_s(dtype=jnp.bfloat16) -> EfficientNet:
    return EfficientNet(cfg=EFFNET_V2_S, dtype=dtype)


def efficientnet_tiny_test(dtype=jnp.float32) -> EfficientNet:
    return EfficientNet(cfg=EFFNET_TINY_TEST, dtype=dtype)
