"""Swin Transformer v1 backbone + GeM descriptor head (Flax).

Part of the legacy model-zoo surface: registered in the reference's factory
but absent from every final config (SURVEY §2.3). Parity target (original
implementation, for cross-checking):
  D1/train/train_v107/vsc/baseline/model_factory/backbones/swin.py:71-560
  (vendored MSFT Swin v1 with a GeM + output_proj head).

v1 vs the production SwinV2 (models/swinv2.py):
  - PRE-norm blocks (x + attn(LN(x)) + mlp(LN(x))), no res-post-norm;
  - scaled dot-product attention (head_dim^-0.5), not cosine attention;
  - learned relative-position-bias TABLE [(2w-1)^2, H] indexed by the
    relative-position index, not a log-CPB MLP;
  - PatchMerging normalizes the 4C concat BEFORE the 4C->2C reduction.

Window partition/reverse, the shift mask, and the bias index are shared
with swinv2. XLA-path only — legacy models are a correctness surface, not
the serving path, so no Pallas fusion here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vsc22_tpu.models.layers import DropPath, Mlp, gem_pool
from vsc22_tpu.models.swinv2 import (
    _relative_position_index,
    _shift_attn_mask,
    window_partition,
    window_reverse,
)


@dataclasses.dataclass(frozen=True)
class SwinV1Config:
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    dropout: float = 0.0
    ape: bool = False  # absolute position embedding
    output_dim: int = 256
    pool_param: float = 3.0

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))


SWIN_V1_TINY_224 = SwinV1Config()
SWIN_V1_TINY_TEST = SwinV1Config(
    img_size=32,
    patch_size=4,
    embed_dim=16,
    depths=(1, 2),
    num_heads=(2, 4),
    window_size=4,
    drop_path_rate=0.0,
    output_dim=8,
)


class WindowAttentionV1(nn.Module):
    """Scaled dot-product window attention with a learned RPB table."""

    dim: int
    window: Tuple[int, int]
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[np.ndarray], deterministic: bool = True
    ) -> jax.Array:
        bw, n, c = x.shape
        h = self.num_heads
        hd = c // h
        wh, ww = self.window

        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [bw, h, n, hd]

        logits = jnp.einsum(
            "bhnd,bhmd->bhnm", q * (hd**-0.5), k, preferred_element_type=jnp.float32
        )
        table = self.param(
            "rpb_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wh - 1) * (2 * ww - 1), h),
        )
        idx = _relative_position_index(wh, ww).reshape(-1)
        rpb = table[idx].reshape(n, n, h).transpose(2, 0, 1)  # [h, n, n]
        logits = logits + rpb[None].astype(logits.dtype)
        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(bw // nw, nw, h, n, n) + jnp.asarray(mask)[
                None, :, None
            ].astype(logits.dtype)
            logits = logits.reshape(bw, h, n, n)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v.astype(self.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlockV1(nn.Module):
    """Pre-norm Swin v1 block (swin.py:169-294)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    drop_path: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h, w = self.input_resolution
        b, l, c = x.shape
        window, shift = self.window_size, self.shift_size
        if min(h, w) <= window:
            window, shift = min(h, w), 0

        shortcut = x
        xs = nn.LayerNorm(dtype=self.dtype, name="norm1")(x).reshape(b, h, w, c)
        if shift > 0:
            xs = jnp.roll(xs, shift=(-shift, -shift), axis=(1, 2))
        windows = window_partition(xs, window)
        mask = _shift_attn_mask(h, w, window, shift) if shift > 0 else None
        attn = WindowAttentionV1(
            self.dim, (window, window), self.num_heads, dtype=self.dtype, name="attn"
        )(windows, mask, deterministic)
        xs = window_reverse(attn, window, h, w)
        if shift > 0:
            xs = jnp.roll(xs, shift=(shift, shift), axis=(1, 2))
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            xs.reshape(b, l, c), deterministic
        )

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp")(
            y, deterministic
        )
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class PatchMergingV1(nn.Module):
    """v1 merge order: LayerNorm on the 4C concat, THEN 4C->2C reduction."""

    input_resolution: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = self.input_resolution
        b, l, c = x.shape
        xs = x.reshape(b, h, w, c)
        parts = [xs[:, 0::2, 0::2], xs[:, 1::2, 0::2], xs[:, 0::2, 1::2], xs[:, 1::2, 1::2]]
        xs = jnp.concatenate(parts, axis=-1).reshape(b, (h // 2) * (w // 2), 4 * c)
        xs = nn.LayerNorm(dtype=self.dtype, name="norm")(xs)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(xs)


class SwinTransformerV1(nn.Module):
    """Swin v1 encoder + GeM token pooling + Linear projection head."""

    cfg: SwinV1Config = SWIN_V1_TINY_224
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        b, h, w, _ = images.shape
        if h != cfg.img_size or w != cfg.img_size:
            raise ValueError(f"expected {cfg.img_size}^2 input, got {h}x{w}")
        deterministic = not train

        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(images.astype(self.dtype))
        res = cfg.img_size // cfg.patch_size
        x = x.reshape(b, res * res, cfg.embed_dim)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)
        if cfg.ape:
            pos = self.param(
                "absolute_pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, res * res, cfg.embed_dim),
            )
            x = x + pos.astype(self.dtype)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths))
        block_idx = 0
        for stage, depth in enumerate(cfg.depths):
            dim = int(cfg.embed_dim * 2**stage)
            resolution = (res // 2**stage, res // 2**stage)
            for i in range(depth):
                x = SwinBlockV1(
                    dim=dim,
                    input_resolution=resolution,
                    num_heads=cfg.num_heads[stage],
                    window_size=cfg.window_size,
                    shift_size=0 if i % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio,
                    drop_path=float(dpr[block_idx]),
                    dtype=self.dtype,
                    name=f"stage{stage}_block{i}",
                )(x, deterministic)
                block_idx += 1
            if stage < len(cfg.depths) - 1:
                x = PatchMergingV1(resolution, dtype=self.dtype, name=f"merge{stage}")(x)

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        pooled = gem_pool(x, cfg.pool_param, axis=1)
        return nn.Dense(cfg.output_dim, dtype=jnp.float32, name="output_proj")(pooled)


def swin_v1_tiny_224(dtype=jnp.float32) -> SwinTransformerV1:
    return SwinTransformerV1(cfg=SWIN_V1_TINY_224, dtype=dtype)


def swin_v1_tiny_test(dtype=jnp.float32) -> SwinTransformerV1:
    return SwinTransformerV1(cfg=SWIN_V1_TINY_TEST, dtype=dtype)
