"""CLIP visual encoder (ViT-L/14 style) in Flax.

Parity target (reference, for cross-checking — original implementation):
  D1/train/train_vid_score/video/clip.py:85-160 — OpenAI-CLIP visual tower:
  patch conv (no bias), class embedding, learned positional embedding,
  pre-LN transformer with QuickGELU MLPs, ln_pre/ln_post, projection
  disabled (proj=None): the model returns ALL tokens post-ln_post and the
  pipeline consumes the CLS token ([:, 0], 1024-d for ViT-L/14).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from vsc22_tpu.models.layers import DenseParams


@dataclasses.dataclass(frozen=True)
class CLIPVisualConfig:
    img_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16

    @property
    def num_tokens(self) -> int:
        return (self.img_size // self.patch_size) ** 2 + 1


CLIP_VIT_L14 = CLIPVisualConfig()
CLIP_TINY_TEST = CLIPVisualConfig(img_size=32, patch_size=8, width=32, layers=2, heads=2)


_CLIP_LN_EPS = 1e-5  # torch nn.LayerNorm default — what CLIP ckpts trained with


def _ln(x, scale, bias, dtype, eps=_CLIP_LN_EPS):
    """LayerNorm with f32 statistics (flax nn.LayerNorm semantics)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias).astype(dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPBlock(nn.Module):
    """Pre-LN residual attention block with QuickGELU MLP.

    The whole block (LN1 -> QKV -> packed attention -> proj -> residual ->
    LN2 -> MLP -> residual) runs as ONE Pallas kernel per frame on TPU
    (ops/pallas_vit_block); off-TPU the same math runs in XLA. The param
    tree matches the module forms exactly (ln_1/ln_2 LayerNorm,
    attn.qkv/attn.proj Dense, c_fc/c_proj Dense).
    """

    heads: int
    dtype: jnp.dtype = jnp.float32

    use_block_kernel: bool = False  # whole-block fusion measured ~neutral
    # for CLIP (row padding 257->384 in QKV/MLP offsets the glue savings);
    # the default path fuses attention and the MLP per-op without padding
    # the dense GEMMs.
    use_half_block: bool = False  # variant B: LN1+QKV also fused into the
    # attention kernel (per-frame QKV GEMMs instead of one XLA batch GEMM);
    # flip after measuring scripts/perf_attn_proj.py on hardware.

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from vsc22_tpu.models.layers import AttentionParams, LayerNormParams
        from vsc22_tpu.ops.pallas_vit_block import vit_block

        c = x.shape[-1]
        ln1_s, ln1_b = LayerNormParams(c, name="ln_1")()
        qkv_w, qkv_b, proj_w, proj_b = AttentionParams(c, name="attn")()
        ln2_s, ln2_b = LayerNormParams(c, name="ln_2")()
        w1, b1 = DenseParams(c, 4 * c, name="c_fc")()
        w2, b2 = DenseParams(4 * c, c, name="c_proj")()
        dt = self.dtype
        if self.use_block_kernel:
            return vit_block(
                x.astype(dt),
                ln1_s, ln1_b,
                qkv_w.astype(dt), qkv_b.astype(jnp.float32),
                proj_w.astype(dt), proj_b.astype(jnp.float32),
                ln2_s, ln2_b,
                w1.astype(dt), b1.astype(jnp.float32),
                w2.astype(dt), b2.astype(jnp.float32),
                self.heads,
                "quick_gelu",
                _CLIP_LN_EPS,
            )

        # Two-kernel path: the attention half (LN1+QKV+attention+proj+
        # residual) and the MLP half (LN2+MLP+residual) each run as ONE
        # Pallas kernel — four HBM activation passes per block total
        # (ops/pallas_attn_proj, ops/pallas_mlp.ln_mlp_residual). With
        # use_half_block=False the QKV GEMM stays in XLA (variant A).
        from vsc22_tpu.ops.pallas_attn_proj import (
            attn_proj_residual,
            ln_attn_proj_residual,
        )
        from vsc22_tpu.ops.pallas_mlp import ln_mlp_residual

        b, l, _ = x.shape
        if self.use_half_block:
            x = ln_attn_proj_residual(
                x.astype(dt), ln1_s, ln1_b, qkv_w.astype(dt),
                qkv_b.astype(jnp.float32), proj_w.astype(dt), proj_b,
                self.heads, _CLIP_LN_EPS,
            )
        else:
            y = _ln(x, ln1_s, ln1_b, dt)
            qkv = jnp.dot(
                y.astype(dt), qkv_w.astype(dt), preferred_element_type=jnp.float32
            ) + qkv_b
            x = attn_proj_residual(
                x.astype(dt), qkv.astype(dt), proj_w.astype(dt), proj_b,
                self.heads,
            )
        return ln_mlp_residual(
            x.reshape(b * l, c), ln2_s, ln2_b,
            w1.astype(dt), b1.astype(jnp.float32),
            w2.astype(dt), b2.astype(jnp.float32),
            "quick_gelu", _CLIP_LN_EPS,
        ).reshape(b, l, c)


class CLIPVisual(nn.Module):
    """Returns all tokens [B, 1+P, width] after ln_post (CLS first)."""

    cfg: CLIPVisualConfig = CLIP_VIT_L14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, h, w, _ = images.shape
        if h != cfg.img_size or w != cfg.img_size:
            raise ValueError(f"expected {cfg.img_size}^2 input, got {h}x{w}")
        scale = cfg.width**-0.5
        x = nn.Conv(
            cfg.width,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(images.astype(self.dtype))
        x = x.reshape(b, -1, cfg.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(scale), (cfg.width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.width)).astype(self.dtype), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(scale),
            (cfg.num_tokens, cfg.width),
        )
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=_CLIP_LN_EPS, dtype=self.dtype, name="ln_pre")(x)
        for i in range(cfg.layers):
            x = CLIPBlock(cfg.heads, dtype=self.dtype, name=f"block{i}")(x)
        return nn.LayerNorm(epsilon=_CLIP_LN_EPS, dtype=self.dtype, name="ln_post")(x)


def clip_vit_l14(dtype=jnp.bfloat16) -> CLIPVisual:
    return CLIPVisual(cfg=CLIP_VIT_L14, dtype=dtype)


def clip_tiny_test(dtype=jnp.float32) -> CLIPVisual:
    return CLIPVisual(cfg=CLIP_TINY_TEST, dtype=dtype)
