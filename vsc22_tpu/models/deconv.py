"""Deconvolutional decoder head (Flax).

Part of the legacy model-zoo surface: registered in the reference's factory
but absent from every final config (SURVEY §2.3). Parity target (original
implementation, for cross-checking):
  D1/train/train_v107/vsc/baseline/model_factory/backbones/ConvTransposeModel.py
  :7-58 — residual conv blocks interleaved with 2x nearest upsampling and
  stride-2 transposed convs, mapping a [B, h, w, dim] feature map back to
  image space (a dev-time reconstruction/visualization head).

BatchNorm runs in inference mode by default (``train=True`` requires
``mutable=["batch_stats"]``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        y = nn.relu(x)
        y = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        return x + y


def _upsample2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


class DeConvModel(nn.Module):
    """[B, h, w, dim] -> [B, 8h', 8w', output_dim] decoder."""

    dim: int = 2048
    output_dim: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d = self.dim
        x = ResBlock(dtype=self.dtype, name="res0")(x, train)
        x = nn.relu(x)
        x = _upsample2x(x)
        x = nn.ConvTranspose(
            d // 2, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype, name="up0"
        )(x)
        x = ResBlock(dtype=self.dtype, name="res1")(x, train)
        x = nn.relu(x)
        x = _upsample2x(x)
        x = nn.ConvTranspose(
            d // 4, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype, name="up1"
        )(x)
        x = ResBlock(dtype=self.dtype, name="res2")(x, train)
        x = nn.relu(x)
        return nn.ConvTranspose(
            self.output_dim, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype, name="out",
        )(x)
