"""Video-score model (VED): "was this video edited/copied?" classifier.

Parity target (reference, for cross-checking — original implementation):
  D1/train/train_vid_score/video/model.py:63-118 (`MS`): CLIP ViT-L/14 frame
  CLS features (1024-d, <=256 frames) -> Linear+LN -> 768 -> a BERT-base
  style encoder consuming the frames as token embeddings with [CLS]/[SEP]
  embeddings spliced in -> concat([CLS] state, masked-average pool) ->
  Linear -> 1 logit. Frames whose feature rows are all-zero (padding) are
  attention-masked out.

  The encoder is an exact BERT-base stack (12 post-LN layers, 768 wide, 12
  heads, erf-GELU, LN eps 1e-12) so chinese-roberta-wwm-ext weights port
  verbatim (utils.port_weights.port_vsm_torch_state_dict): the [CLS]/[SEP]
  vectors are learned parameters that the port fills from word-embedding
  rows 101/102, and the token-type-0 embedding is folded into the position
  table (every token is type 0). From-scratch training also works — the
  params are plain Flax initializers.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from vsc22_tpu.models.layers import MultiHeadAttention


@dataclasses.dataclass(frozen=True)
class VSMConfig:
    feat_dim: int = 1024  # CLIP ViT-L/14 width
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    max_frames: int = 256
    dropout: float = 0.1
    # 0 = the `MS` scorer head (1 logit, squeezed). >0 = the `MD` embedding
    # twin (D1/train/train_vid_score/video/model.py:6-60): identical trunk,
    # output_proj maps the 2*hidden pooled state to an `output_dim` vector.
    # Unused in the winning inference path; part of the reference surface.
    output_dim: int = 0


VSM_BASE = VSMConfig()
VSM_TINY_TEST = VSMConfig(feat_dim=16, hidden=32, layers=2, heads=2, max_frames=8)


class PostLNBlock(nn.Module):
    """BERT-style post-LN encoder block."""

    heads: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask_bias, deterministic=True):
        c = x.shape[-1]
        y = MultiHeadAttention(
            self.heads, dtype=self.dtype, proj_drop=self.dropout, name="attn"
        )(x, deterministic, attn_bias=mask_bias)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln_attn")(x + y)
        y = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln_mlp")(x + y)


class VideoScoreModel(nn.Module):
    """feats [B, max_frames, feat_dim] -> logits [B].

    Zero-padding frame rows are masked out of attention and pooling, matching
    the reference's `masks = feats.abs().sum(2) > 0` convention.
    """

    cfg: VSMConfig = VSM_BASE
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        b, n, _ = feats.shape
        deterministic = not train

        vision = nn.Dense(cfg.hidden, dtype=self.dtype, name="frame_proj")(
            feats.astype(self.dtype)
        )
        vision = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="frame_norm")(vision)
        frame_mask = (jnp.abs(feats).sum(axis=2) > 0).astype(jnp.float32)  # [B, N]

        cls = self.param("cls_emb", nn.initializers.normal(0.02), (cfg.hidden,))
        sep = self.param("sep_emb", nn.initializers.normal(0.02), (cfg.hidden,))
        tokens = jnp.concatenate(
            [
                jnp.broadcast_to(cls, (b, 1, cfg.hidden)).astype(self.dtype),
                vision,
                jnp.broadcast_to(sep, (b, 1, cfg.hidden)).astype(self.dtype),
            ],
            axis=1,
        )
        # Reference mask layout: [1, 1, frame_mask] (cls+sep always visible).
        mask = jnp.concatenate([jnp.ones((b, 2), jnp.float32), frame_mask], axis=1)

        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (cfg.max_frames + 2, cfg.hidden)
        )
        tokens = tokens + pos[: n + 2].astype(self.dtype)
        tokens = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="emb_norm")(tokens)
        tokens = nn.Dropout(cfg.dropout)(tokens, deterministic=deterministic)

        # Additive attention bias: -1e4 on masked keys.
        bias = (1.0 - mask)[:, None, None, :] * -10000.0
        for i in range(cfg.layers):
            tokens = PostLNBlock(
                cfg.heads, dtype=self.dtype, dropout=cfg.dropout, name=f"layer{i}"
            )(tokens, bias, deterministic)

        states = tokens.astype(jnp.float32)
        weights = mask[..., None]
        avg_pool = (states * weights).sum(axis=1) / (weights.sum(axis=1) + 1e-5)
        cls_pool = states[:, 0]
        cat = jnp.concatenate([cls_pool, avg_pool], axis=1)
        if cfg.output_dim > 0:  # MD: embedding head
            return nn.Dense(cfg.output_dim, dtype=jnp.float32, name="output_proj")(cat)
        return nn.Dense(1, dtype=jnp.float32, name="output_proj")(cat).squeeze(-1)


def vsm_base(dtype=jnp.bfloat16) -> VideoScoreModel:
    return VideoScoreModel(cfg=VSM_BASE, dtype=dtype)


def vsm_embed(output_dim: int = 256, dtype=jnp.bfloat16) -> VideoScoreModel:
    """The reference's `MD` video-embedding twin (unused-in-final variant)."""
    return VideoScoreModel(
        cfg=dataclasses.replace(VSM_BASE, output_dim=output_dim), dtype=dtype
    )


def vsm_tiny_test(dtype=jnp.float32) -> VideoScoreModel:
    return VideoScoreModel(cfg=VSM_TINY_TEST, dtype=dtype)
