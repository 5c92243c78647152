"""Shared model building blocks (Flax linen).

GeM pooling reproduces the reference semantics
(D1/train/train_v68/.../backbones/sscd.py:11-40: clamp(1e-6) → x^p → mean →
x^(1/p)); everything else is standard transformer machinery written for XLA:
static shapes, fused QKV projections, bf16 compute with f32 accumulation.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype


def gem_pool(x: jax.Array, p: float = 3.0, axis: int = 1, eps: float = 1e-6) -> jax.Array:
    """Generalized-mean pool over `axis`: (mean(clamp(x, eps)^p))^(1/p)."""
    x = jnp.clip(x.astype(jnp.float32), eps, None)
    pooled = jnp.mean(x**p, axis=axis)
    return pooled ** (1.0 / p)


class GeMPool(nn.Module):
    """GeM pooling with optional 1x1 projection before pooling.

    Mirrors the reference's `GlobalGeMPool2d(pool_param, linear_param)`:
    when `proj_dim` is set, tokens are first projected (Conv1d k=1 == Dense)
    to `proj_dim` channels, then GeM-pooled over the token axis.
    """

    pool_param: float = 3.0
    proj_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:  # [B, L, C]
        if self.proj_dim is not None:
            tokens = nn.Dense(self.proj_dim, dtype=self.dtype, name="proj")(tokens)
        return gem_pool(tokens, self.pool_param, axis=1)


class Mlp(nn.Module):
    """Transformer MLP block: Dense → GELU → Dense.

    On TPU with no active dropout, the block runs as the fused Pallas MLP
    (ops/pallas_mlp) — hidden activations never leave VMEM. Identical math
    (the custom VJP recomputes in XLA for the backward pass).
    """

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        c = x.shape[-1]
        w1 = self.param("fc1_kernel", nn.initializers.lecun_normal(), (c, self.hidden_dim))
        b1 = self.param("fc1_bias", nn.initializers.zeros, (self.hidden_dim,))
        w2 = self.param(
            "fc2_kernel", nn.initializers.lecun_normal(), (self.hidden_dim, self.out_dim)
        )
        b2 = self.param("fc2_bias", nn.initializers.zeros, (self.out_dim,))
        w1c, b1c = w1.astype(self.dtype), b1.astype(self.dtype)
        w2c, b2c = w2.astype(self.dtype), b2.astype(self.dtype)

        use_fused = (
            (self.dropout == 0.0 or deterministic)
            and jax.default_backend() == "tpu"
            and x.shape[-1] == self.out_dim
        )
        if use_fused:
            from vsc22_tpu.ops.pallas_mlp import fused_mlp

            lead = x.shape[:-1]
            out = fused_mlp(x.reshape(-1, c).astype(self.dtype), w1c, b1c, w2c, b2c)
            return out.reshape(*lead, self.out_dim)
        x = x.astype(self.dtype) @ w1c + b1c
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = x @ w2c + b2c
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MlpParams(nn.Module):
    """Declares Mlp's exact {fc1_kernel, fc1_bias, fc2_kernel, fc2_bias}
    param tree without applying it — for blocks routed through fused
    kernels."""

    hidden_dim: int
    out_dim: int
    in_dim: int

    @nn.compact
    def __call__(self):
        w1 = self.param(
            "fc1_kernel", nn.initializers.lecun_normal(), (self.in_dim, self.hidden_dim)
        )
        b1 = self.param("fc1_bias", nn.initializers.zeros, (self.hidden_dim,))
        w2 = self.param(
            "fc2_kernel", nn.initializers.lecun_normal(), (self.hidden_dim, self.out_dim)
        )
        b2 = self.param("fc2_bias", nn.initializers.zeros, (self.out_dim,))
        return w1, b1, w2, b2


class MultiHeadAttention(nn.Module):
    """Standard pre-LN ViT attention with a fused QKV projection.

    Kept explicit (rather than nn.SelfAttention) so the QKV GEMM is a single
    MXU-friendly [B*L, C] x [C, 3C] matmul and so SwinV2's cosine-attention
    variant can subclass the same layout.
    """

    num_heads: int
    dtype: Dtype = jnp.float32
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, L, C]
        deterministic: bool = True,
        attn_bias: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, l, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, l, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i] for i in range(3))  # [B, L, H, hd]

        use_fused = (
            attn_bias is None
            and (self.attn_drop == 0.0 or deterministic)
            and jax.default_backend() == "tpu"
        )
        if use_fused:
            # Fused on-chip softmax(QK^T)V — the [B, H, L, L] tensors never
            # touch HBM, and heads run as block-diagonal K-packed GEMMs at
            # full MXU rate (ops/pallas_attn; XLA-recompute VJP inside).
            from vsc22_tpu.ops.pallas_attn import attention

            out = attention(q * (head_dim**-0.5), k, v)  # [B, L, H, hd]
        else:
            attn = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32)
            attn = attn * (head_dim**-0.5)
            if attn_bias is not None:
                attn = attn + attn_bias
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhlm,bmhd->blhd", attn, v, preferred_element_type=jnp.float32)

        out = out.reshape(b, l, c).astype(self.dtype)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class TransformerBlock(nn.Module):
    """Pre-LN transformer encoder block.

    The attention half (QKV split -> softmax(QK^T)V -> projection ->
    residual) runs as one fused Pallas kernel on TPU whenever dropout /
    drop-path are inactive (ops/pallas_attn_proj); the param tree is
    identical to the historical MultiHeadAttention layout
    (attn/{qkv,proj}/{kernel,bias}).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    drop_path: float = 0.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        from vsc22_tpu.ops.pallas_attn_proj import attn_proj_residual

        b, l, c = x.shape
        hd = c // self.num_heads
        dt = self.dtype
        y = nn.LayerNorm(dtype=dt, name="norm1")(x)
        qkv_w, qkv_b, proj_w, proj_b = AttentionParams(c, name="attn")()
        qkv = jnp.dot(
            y.astype(dt), qkv_w.astype(dt), preferred_element_type=jnp.float32
        ) + qkv_b
        if deterministic or (self.dropout == 0.0 and self.drop_path == 0.0):
            x = attn_proj_residual(
                x.astype(dt), qkv.astype(dt), proj_w.astype(dt), proj_b,
                self.num_heads,
            )
        else:
            r = qkv.reshape(b, l, 3, self.num_heads, hd)
            q, k, v = (r[:, :, i].astype(dt) for i in range(3))
            logits = jnp.einsum(
                "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            probs = jax.nn.softmax(logits, axis=-1).astype(dt)
            out = jnp.einsum(
                "bhlm,bmhd->blhd", probs, v, preferred_element_type=jnp.float32
            ).astype(dt).reshape(b, l, c)
            out = jnp.dot(
                out, proj_w.astype(dt), preferred_element_type=jnp.float32
            ) + proj_b
            out = nn.Dropout(self.dropout)(out.astype(dt), deterministic=deterministic)
            x = x + DropPath(self.drop_path, name="drop_path1")(out, deterministic)
        norm2_s, norm2_b = LayerNormParams(c, name="norm2")()
        hidden = int(c * self.mlp_ratio)
        w1, b1, w2, b2 = MlpParams(hidden, c, in_dim=c, name="mlp")()
        if deterministic or (self.dropout == 0.0 and self.drop_path == 0.0):
            from vsc22_tpu.ops.pallas_mlp import ln_mlp_residual

            x = ln_mlp_residual(
                x.reshape(b * l, c).astype(dt), norm2_s, norm2_b,
                w1.astype(dt), b1.astype(jnp.float32),
                w2.astype(dt), b2.astype(jnp.float32),
                "gelu", 1e-6,  # flax nn.LayerNorm default eps
            ).reshape(b, l, c)
        else:
            xf = x.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = ((xf - mean) ** 2).mean(-1, keepdims=True)
            y = (
                (xf - mean) * jax.lax.rsqrt(var + 1e-6)
                * norm2_s.astype(jnp.float32) + norm2_b.astype(jnp.float32)
            ).astype(dt)
            y = y @ w1.astype(dt) + b1.astype(dt)
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            y = y @ w2.astype(dt) + b2.astype(dt)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)
        return x


class DenseParams(nn.Module):
    """Declares an nn.Dense's exact {kernel, bias} param tree without
    applying it — for modules that route compute through fused kernels."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.out_dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return kernel, bias


class AttentionParams(nn.Module):
    """Declares MultiHeadAttention's exact {qkv, proj} Dense param trees
    without applying them — for blocks routed through fused kernels."""

    dim: int

    @nn.compact
    def __call__(self):
        qkv_w, qkv_b = DenseParams(self.dim, 3 * self.dim, name="qkv")()
        proj_w, proj_b = DenseParams(self.dim, self.dim, name="proj")()
        return qkv_w, qkv_b, proj_w, proj_b


class LayerNormParams(nn.Module):
    """Declares an nn.LayerNorm's {scale, bias} without applying it."""

    dim: int
    zero_scale: bool = False

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale",
            nn.initializers.zeros if self.zero_scale else nn.initializers.ones,
            (self.dim,),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
