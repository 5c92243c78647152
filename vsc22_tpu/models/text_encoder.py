"""RoBERTa/BERT-style text encoder (Flax).

Part of the legacy model-zoo surface: registered in the reference's factory
but absent from every final config (SURVEY §2.3). Parity target (original
implementation, for cross-checking):
  D1/train/train_v68/vsc/baseline/model_factory/backbones/roberta.py:9-55 —
  a thin wrapper over HF BertModel supporting either ``input_ids`` or
  ``inputs_embeds`` plus an attention mask, returning the last hidden state
  or the tanh pooler output.

The production video-score model (models/vsm.py) is this same architecture
specialized to frame embeddings; both share PostLNBlock. This module is the
general surface: token/position/type embeddings + post-LN encoder + pooler.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vsc22_tpu.models.vsm import PostLNBlock


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    vocab_size: int = 21128  # chinese-roberta-wwm-ext vocabulary
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    max_positions: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1


TEXT_BASE = TextEncoderConfig()
TEXT_TINY_TEST = TextEncoderConfig(
    vocab_size=64, hidden=32, layers=2, heads=2, max_positions=16
)


class TextEncoder(nn.Module):
    """BERT-style encoder over token ids or precomputed embeddings.

    ``output_pool=True`` returns the tanh pooler output on the first token;
    otherwise the full last hidden state [B, L, H] (roberta.py:37-55).
    """

    cfg: TextEncoderConfig = TEXT_BASE
    output_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        inputs: jax.Array,  # [B, L] int ids or [B, L, H] embeddings
        attention_mask: Optional[jax.Array] = None,  # [B, L], 1 = attend
        token_type_ids: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        cfg = self.cfg
        deterministic = not train

        if inputs.ndim == 2:  # token ids
            x = nn.Embed(cfg.vocab_size, cfg.hidden, name="word_embeddings")(inputs)
        elif inputs.shape[-1] == cfg.hidden:
            x = inputs
        else:
            raise ValueError(
                f"inputs_embeds last dim {inputs.shape[-1]} != hidden {cfg.hidden}"
            )
        b, l = x.shape[:2]
        if l > cfg.max_positions:
            raise ValueError(f"sequence {l} > max_positions {cfg.max_positions}")

        pos = self.param(
            "position_embeddings",
            nn.initializers.truncated_normal(0.02),
            (1, cfg.max_positions, cfg.hidden),
        )
        x = x + pos[:, :l].astype(x.dtype)
        if token_type_ids is not None:
            x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden, name="token_type_embeddings")(
                token_type_ids
            )
        x = nn.LayerNorm(dtype=self.dtype, name="embeddings_norm")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        x = x.astype(self.dtype)

        if attention_mask is not None:
            bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(
                jnp.float32
            )
        else:
            bias = None
        for i in range(cfg.layers):
            x = PostLNBlock(
                cfg.heads, dtype=self.dtype, dropout=cfg.dropout, name=f"layer{i}"
            )(x, bias, deterministic)

        if self.output_pool:
            cls = x[:, 0].astype(jnp.float32)
            return jnp.tanh(nn.Dense(cfg.hidden, dtype=jnp.float32, name="pooler")(cls))
        return x


def roberta_base(dtype=jnp.bfloat16, output_pool: bool = False) -> TextEncoder:
    return TextEncoder(cfg=TEXT_BASE, output_pool=output_pool, dtype=dtype)


def text_tiny_test(dtype=jnp.float32, output_pool: bool = False) -> TextEncoder:
    return TextEncoder(cfg=TEXT_TINY_TEST, output_pool=output_pool, dtype=dtype)
