"""MAE-pretrained ViT backbone as a descriptor model (Flax).

Part of the legacy model-zoo surface: registered in the reference's factory
but absent from every final config (SURVEY §2.3). Parity target (original
implementation, for cross-checking):
  D1/train/train_v107/vsc/baseline/model_factory/backbones/mae.py:64-130 —
  a plain ViT encoder (MAE fine-tune checkpoint) whose descriptor head is
      output_proj( GeM_p( fc( patch_tokens ) ) )
  i.e. a Linear(embed->embed) on the patch tokens (CLS excluded), GeM over
  the token axis with MEAN aggregation (mae.py:128-130), then Linear->512.

Reuses models.vit.VisionTransformer (same encoder family). A
``random_masking`` helper is included for MAE-style pretraining flows.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vsc22_tpu.models.vit import ViTConfig, VisionTransformer

MAE_BASE_PATCH16_224 = ViTConfig(img_size=224, patch_size=16)
MAE_TINY_TEST = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=2)


class MaeDescriptor(nn.Module):
    """ViT encoder + (fc -> token GeM -> output_proj) descriptor head."""

    cfg: ViTConfig = MAE_BASE_PATCH16_224
    output_dim: int = 512
    pool_param: float = 3.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        tokens = VisionTransformer(self.cfg, dtype=self.dtype, name="backbone")(
            images, train
        )
        patches = tokens[:, 1:]  # CLS excluded (mae.py:124)
        y = nn.Dense(self.cfg.embed_dim, dtype=self.dtype, name="fc")(patches)
        # GeM with mean aggregation over tokens (mae.py:128-130)
        p = self.pool_param
        pooled = jnp.mean(
            jnp.clip(y.astype(jnp.float32), 1e-6, None) ** p, axis=1
        ) ** (1.0 / p)
        return nn.Dense(self.output_dim, dtype=jnp.float32, name="output_proj")(pooled)


def random_masking(
    rng: jax.Array, tokens: jax.Array, mask_ratio: float
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-sample random token masking for MAE pretraining.

    Returns (kept tokens [B, L_keep, C], binary mask [B, L] with 1 = removed,
    restore indices [B, L]). Shuffling via per-sample noise argsort — the
    standard MAE recipe, fully static shapes under jit.
    """
    b, l, c = tokens.shape
    len_keep = int(l * (1.0 - mask_ratio))
    noise = jax.random.uniform(rng, (b, l))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    kept = jnp.take_along_axis(tokens, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((b, l), tokens.dtype)
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return kept, mask, ids_restore


def mae_base_patch16_224(dtype=jnp.bfloat16) -> MaeDescriptor:
    return MaeDescriptor(cfg=MAE_BASE_PATCH16_224, dtype=dtype)


def mae_tiny_test(dtype=jnp.float32) -> MaeDescriptor:
    return MaeDescriptor(cfg=MAE_TINY_TEST, output_dim=16, dtype=dtype)
