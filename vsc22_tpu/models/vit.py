"""Vision Transformer backbone + SSCD-style descriptor head (Flax).

Parity target (for cross-checking — original implementation):
  D1/train/train_v68/vsc/baseline/model_factory/backbones/sscd.py:59-102 with
  config D1/train/train_v68/config_v68.py (timm vit_base_patch32_384,
  add_head=True, dims=(768, 512)): the descriptor is
      Linear_2048->512( GeM_p3( Conv1d_768->2048( all ViT tokens ) ) )
  where GeM pools over the token axis (CLS token included).

TPU notes: patch embedding is a strided conv (one big MXU GEMM after im2col
by XLA); attention uses fused QKV; compute dtype is configurable (bf16 for
throughput, f32 for weight-porting parity checks).
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from vsc22_tpu.models.layers import GeMPool, TransformerBlock


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 384
    patch_size: int = 32
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path: float = 0.0

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2


VIT_BASE_PATCH32_384 = ViTConfig()
VIT_TINY_TEST = ViTConfig(img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2)


class VisionTransformer(nn.Module):
    """Plain ViT encoder; returns all tokens [B, 1+P, C] (CLS first)."""

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        b, h, w, _ = images.shape
        if h != cfg.img_size or w != cfg.img_size:
            raise ValueError(f"expected {cfg.img_size}^2 input, got {h}x{w}")

        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(b, -1, cfg.embed_dim)  # [B, P, C]

        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, cfg.embed_dim)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)).astype(self.dtype), x], axis=1)
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, 1 + cfg.num_patches, cfg.embed_dim),
        )
        x = x + pos.astype(self.dtype)
        x = nn.Dropout(cfg.dropout)(x, deterministic=not train)

        for i in range(cfg.depth):
            x = TransformerBlock(
                cfg.num_heads,
                cfg.mlp_ratio,
                dtype=self.dtype,
                drop_path=cfg.drop_path * i / max(cfg.depth - 1, 1),
                dropout=cfg.dropout,
                name=f"block{i}",
            )(x, deterministic=not train)

        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class VitDescriptor(nn.Module):
    """ViT backbone + (1x1 proj → GeM → Linear) descriptor head.

    Output: [B, out_dim] UN-normalized descriptors (callers L2-normalize,
    matching the reference train/infer split where normalization happens in
    the loss / extraction code, not the model).
    """

    cfg: ViTConfig = VIT_BASE_PATCH32_384
    pool_param: float = 3.0
    head_dim: int = 2048
    out_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        tokens = VisionTransformer(self.cfg, dtype=self.dtype, name="backbone")(images, train)
        pooled = GeMPool(
            self.pool_param, proj_dim=self.head_dim, dtype=self.dtype, name="gem"
        )(tokens)
        return nn.Dense(self.out_dim, dtype=jnp.float32, name="head")(pooled)


def vit_base_patch32_384_descriptor(dtype=jnp.bfloat16) -> VitDescriptor:
    """The v68 ensemble member: ViT-B/32 @ 384, 512-d descriptors."""
    return VitDescriptor(cfg=VIT_BASE_PATCH32_384, dtype=dtype)


def vit_tiny_test_descriptor(dtype=jnp.float32) -> VitDescriptor:
    """Small config for unit tests and CPU smoke runs."""
    return VitDescriptor(cfg=VIT_TINY_TEST, head_dim=64, out_dim=16, dtype=dtype)
