"""Swin Transformer V2 backbone + GeM descriptor head (Flax).

Parity target (reference, for cross-checking — original implementation):
  D1/train/train_v106/vsc/baseline/model_factory/backbones/swinv2.py:509-678
  with config D1/train/train_v106/config_v106.py (SwinV2-Base: img 256,
  patch 4, window 16, embed 128, depths [2,2,18,2], heads [4,8,16,32],
  pretrained windows [12,12,12,6], drop-path 0.2, GeM(p=3) over tokens +
  Linear -> 512).

SwinV2 specifics reproduced:
  - res-post-norm blocks: x + DropPath(LN(Attn(x))), with the post-LNs
    zero-initialized (blocks start as identity);
  - cosine attention: softmax(norm(q)·norm(k)ᵀ · exp(min(logit_scale,
    log 100)) + 16·σ(CPB)) with a per-head learnable logit_scale (init
    log 10);
  - log-spaced continuous relative position bias: an MLP(2→512→heads) over
    sign(Δ)·log2(1+|8·Δ/(wp−1)|)/log2(8) coordinates, gathered by the
    relative-position index;
  - q/v biases only (k bias fixed at zero);
  - PatchMerging: Linear(4C→2C, no bias) THEN LayerNorm (v2 order);
  - shifted windows via jnp.roll with the standard cross-window -100 mask.

TPU notes: window partition is reshape/transpose (free under XLA); each
stage's attention is one batched einsum over [B·nW, N, heads, hd] — window 16
gives N=256, a healthy MXU tile. Static shapes throughout; the relative
index / shift masks are compile-time constants.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vsc22_tpu.models.layers import (
    DenseParams as _DenseParams,
    DropPath,
    LayerNormParams as _LayerNormParams,
    Mlp,
    gem_pool,
)


@dataclasses.dataclass(frozen=True)
class SwinV2Config:
    img_size: int = 256
    patch_size: int = 4
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 16
    pretrained_window_sizes: Tuple[int, ...] = (12, 12, 12, 6)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    dropout: float = 0.0
    output_dim: int = 512
    pool_param: float = 3.0

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))


SWINV2_BASE_256 = SwinV2Config()
SWINV2_TINY_TEST = SwinV2Config(
    img_size=32,
    patch_size=4,
    embed_dim=16,
    depths=(1, 2),
    num_heads=(2, 4),
    window_size=4,
    pretrained_window_sizes=(0, 0),
    drop_path_rate=0.0,
    output_dim=8,
)


def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    """[Wh*Ww, Wh*Ww] index into the (2Wh-1)(2Ww-1) bias table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


def _relative_coords_table(wh: int, ww: int, pretrained: int) -> np.ndarray:
    """[1, 2Wh-1, 2Ww-1, 2] log-spaced normalized relative coordinates."""
    ch = np.arange(-(wh - 1), wh, dtype=np.float32)
    cw = np.arange(-(ww - 1), ww, dtype=np.float32)
    table = np.stack(np.meshgrid(ch, cw, indexing="ij"), axis=-1)[None]  # 1,2Wh-1,2Ww-1,2
    denom_h = (pretrained - 1) if pretrained > 0 else (wh - 1)
    denom_w = (pretrained - 1) if pretrained > 0 else (ww - 1)
    table[..., 0] /= max(denom_h, 1)
    table[..., 1] /= max(denom_w, 1)
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.astype(np.float32)


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """[nW, N, N] additive mask (-100 across shifted-window region seams)."""
    img_mask = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    mw = (
        img_mask.reshape(h // window, window, w // window, window)
        .transpose(0, 2, 1, 3)
        .reshape(-1, window * window)
    )
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """[B, H, W, C] -> [B*nW, window*window, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(windows: jax.Array, window: int, h: int, w: int) -> jax.Array:
    """[B*nW, window*window, C] -> [B, H, W, C]."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // window // window)
    x = windows.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class WindowAttention(nn.Module):
    """Cosine window attention with continuous relative position bias.

    `fused` selects the Pallas kernel (ops/pallas_window_attn) that keeps the
    per-window attention matrices in VMEM; None = auto (TPU backend only).
    The XLA path materializes [B*nW, H, N, N] logits in HBM and is kept for
    CPU/tests and as a numerical reference.
    """

    dim: int
    window: Tuple[int, int]
    num_heads: int
    pretrained_window: int = 0
    dtype: jnp.dtype = jnp.float32
    fused: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[np.ndarray], deterministic: bool = True):
        from vsc22_tpu.ops.pallas_window_attn import (
            window_attention_chunked,
            window_attention_fused,
        )

        b_, n, c = x.shape
        h = self.num_heads
        hd = c // h

        logit_scale = self.param(
            "logit_scale",
            lambda _key, shape: jnp.full(shape, float(np.log(10.0)), jnp.float32),
            (h, 1, 1),
        )
        # QKV: no kernel bias; learnable q/v biases, zero k bias.
        qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.truncated_normal(0.02), (c, 3 * c)
        )
        q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
        bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = jnp.dot(x.astype(self.dtype), qkv_kernel.astype(self.dtype)) + bias.astype(self.dtype)
        qkv = qkv.reshape(b_, n, 3, h, hd)
        # [B_, H, N, hd] layout for the window kernel.
        q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))

        scale = jnp.exp(jnp.minimum(logit_scale, float(np.log(100.0)))).reshape(h)

        # Continuous relative position bias.
        wh, ww = self.window
        table = jnp.asarray(
            _relative_coords_table(wh, ww, self.pretrained_window)
        )  # [1, 2wh-1, 2ww-1, 2]
        cpb = nn.Dense(512, dtype=jnp.float32, name="cpb_fc1")(table)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(h, use_bias=False, dtype=jnp.float32, name="cpb_fc2")(cpb)
        cpb = cpb.reshape(-1, h)  # [(2wh-1)(2ww-1), H]
        rel_idx = jnp.asarray(_relative_position_index(wh, ww).reshape(-1))
        rpb = cpb[rel_idx].reshape(n, n, h).transpose(2, 0, 1)  # [H, N, N]
        rpb = 16.0 * jax.nn.sigmoid(rpb)

        if mask is None:
            mask_arr = jnp.zeros((1, n, n), jnp.float32)
            nw = 1
        else:
            mask_arr = jnp.asarray(mask, jnp.float32)
            nw = mask_arr.shape[0]

        fused = self.fused
        if fused is None:
            # The Pallas kernel differentiates via its custom VJP (backward
            # recomputes through the chunked XLA path), but training keeps
            # the XLA path for its forward too: per-step shapes vary less
            # and the kernel's win is HBM traffic, which the chunked form
            # already bounds.
            fused = jax.default_backend() == "tpu" and deterministic
        if fused:
            out = window_attention_fused(q, k, v, rpb, scale, mask_arr, nw)
        else:
            # Chunked: bounds the [W, H, N, N] logits temps so large
            # training batches (reference recipe: 100-120 pairs/device,
            # i.e. 2x that in images) fit HBM; exact same math.
            out = window_attention_chunked(q, k, v, rpb, scale, mask_arr, nw)

        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b_, n, c).astype(self.dtype)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class _WindowAttnParams(nn.Module):
    """Parameter bag declaring WindowAttention's exact param tree (same
    names, shapes, initializers) and returning the raw tensors + the
    precomputed bias/scale for the fused whole-block kernel."""

    dim: int
    window: Tuple[int, int]
    num_heads: int
    pretrained_window: int = 0

    @nn.compact
    def __call__(self):
        c, h = self.dim, self.num_heads
        logit_scale = self.param(
            "logit_scale",
            lambda _key, shape: jnp.full(shape, float(np.log(10.0)), jnp.float32),
            (h, 1, 1),
        )
        qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.truncated_normal(0.02), (c, 3 * c)
        )
        q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
        qkv_bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])

        wh, ww = self.window
        n = wh * ww
        table = jnp.asarray(_relative_coords_table(wh, ww, self.pretrained_window))
        cpb = nn.Dense(512, dtype=jnp.float32, name="cpb_fc1")(table)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(h, use_bias=False, dtype=jnp.float32, name="cpb_fc2")(cpb)
        cpb = cpb.reshape(-1, h)
        rel_idx = jnp.asarray(_relative_position_index(wh, ww).reshape(-1))
        rpb = cpb[rel_idx].reshape(n, n, h).transpose(2, 0, 1)
        rpb = 16.0 * jax.nn.sigmoid(rpb)
        scale = jnp.exp(jnp.minimum(logit_scale, float(np.log(100.0)))).reshape(h)

        proj_kernel, proj_bias = _DenseParams(c, c, name="proj")()
        return qkv_kernel, qkv_bias, rpb, scale, proj_kernel, proj_bias


class _MlpParams(nn.Module):
    """Declares models.layers.Mlp's exact param tree without applying it."""

    in_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self):
        w1 = self.param(
            "fc1_kernel", nn.initializers.lecun_normal(), (self.in_dim, self.hidden_dim)
        )
        b1 = self.param("fc1_bias", nn.initializers.zeros, (self.hidden_dim,))
        w2 = self.param(
            "fc2_kernel", nn.initializers.lecun_normal(), (self.hidden_dim, self.in_dim)
        )
        b2 = self.param("fc2_bias", nn.initializers.zeros, (self.in_dim,))
        return w1, b1, w2, b2


class SwinBlock(nn.Module):
    """Res-post-norm Swin block; post-LNs zero-initialized (identity start).

    On TPU in deterministic mode the whole block (QKV -> cosine attention ->
    proj -> LN -> MLP -> LN, with residuals) runs as ONE Pallas kernel per
    window group (ops/pallas_swin_block) — a single HBM read+write of the
    activations instead of ~15 passes. The module path below is the CPU /
    training / numerical-reference implementation; both declare identical
    parameter trees.
    """

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    drop_path: float
    pretrained_window: int
    dtype: jnp.dtype = jnp.float32
    fused_block: Optional[bool] = None  # None = auto (TPU + deterministic)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        from vsc22_tpu.ops.pallas_swin_block import _vmem_estimate, swin_block

        h, w = self.input_resolution
        b, l, c = x.shape
        window, shift = self.window_size, self.shift_size
        if min(h, w) <= window:
            window, shift = min(h, w), 0
        n = window * window
        hidden = int(c * self.mlp_ratio)

        use_fused = self.fused_block
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"
        use_fused = (
            use_fused
            and deterministic
            and c % 128 == 0
            and hidden % 128 == 0
            and _vmem_estimate(1, n, c, hidden, self.num_heads, jnp.dtype(self.dtype).itemsize)
            < 48 * 2**20
        )

        if use_fused:
            qkv_kernel, qkv_bias, rpb, scale, proj_kernel, proj_bias = _WindowAttnParams(
                self.dim,
                (window, window),
                self.num_heads,
                pretrained_window=self.pretrained_window,
                name="attn",
            )()
            ln1_s, ln1_b = _LayerNormParams(c, zero_scale=True, name="norm1")()
            w1, b1, w2, b2 = _MlpParams(c, hidden, name="mlp")()
            ln2_s, ln2_b = _LayerNormParams(c, zero_scale=True, name="norm2")()

            xs = x.reshape(b, h, w, c)
            if shift > 0:
                xs = jnp.roll(xs, shift=(-shift, -shift), axis=(1, 2))
            windows = window_partition(xs, window).astype(self.dtype)
            if shift > 0:
                mask = jnp.asarray(_shift_attn_mask(h, w, window, shift))
                nw = mask.shape[0]
            else:
                mask = jnp.zeros((1, n, n), jnp.float32)
                nw = 1
            dt = self.dtype
            out_w = swin_block(
                windows,
                qkv_kernel.astype(dt), qkv_bias.astype(jnp.float32),
                proj_kernel.astype(dt), proj_bias.astype(jnp.float32),
                ln1_s, ln1_b,
                w1.astype(dt), b1.astype(jnp.float32),
                w2.astype(dt), b2.astype(jnp.float32),
                ln2_s, ln2_b,
                rpb, scale, mask,
                self.num_heads, nw,
            )
            xs = window_reverse(out_w, window, h, w)
            if shift > 0:
                xs = jnp.roll(xs, shift=(shift, shift), axis=(1, 2))
            return xs.reshape(b, l, c)

        shortcut = x
        xs = x.reshape(b, h, w, c)
        if shift > 0:
            xs = jnp.roll(xs, shift=(-shift, -shift), axis=(1, 2))
        windows = window_partition(xs, window)
        mask = _shift_attn_mask(h, w, window, shift) if shift > 0 else None
        attn_out = WindowAttention(
            self.dim,
            (window, window),
            self.num_heads,
            pretrained_window=self.pretrained_window,
            dtype=self.dtype,
            name="attn",
        )(windows, mask, deterministic)
        xs = window_reverse(attn_out, window, h, w)
        if shift > 0:
            xs = jnp.roll(xs, shift=(shift, shift), axis=(1, 2))
        xs = xs.reshape(b, l, c)
        # Res-post-norm, zero-init scale: the branch starts disabled.
        xs = nn.LayerNorm(dtype=self.dtype, scale_init=nn.initializers.zeros, name="norm1")(xs)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(xs, deterministic)

        y = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp")(x, deterministic)
        y = nn.LayerNorm(dtype=self.dtype, scale_init=nn.initializers.zeros, name="norm2")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class PatchMerging(nn.Module):
    """2x2 neighborhood concat -> Linear(4C->2C, no bias) -> LayerNorm."""

    input_resolution: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = self.input_resolution
        b, l, c = x.shape
        xs = x.reshape(b, h, w, c)
        parts = [xs[:, 0::2, 0::2], xs[:, 1::2, 0::2], xs[:, 0::2, 1::2], xs[:, 1::2, 1::2]]
        xs = jnp.concatenate(parts, axis=-1).reshape(b, (h // 2) * (w // 2), 4 * c)
        xs = nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(xs)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(xs)


class SwinTransformerV2(nn.Module):
    """SwinV2 encoder + GeM(p) token pooling + Linear projection head.

    Returns [B, output_dim] UN-normalized descriptors.
    """

    cfg: SwinV2Config = SWINV2_BASE_256
    dtype: jnp.dtype = jnp.float32
    # Per-block activation rematerialization (reference --checkpointing /
    # SwinV2 use_checkpoint): only block-boundary activations survive the
    # forward pass; each block's internals recompute during backward. This
    # is what makes the reference recipe's batch (100-120 pairs/device)
    # fit a 16 GB chip — whole-model remat does NOT bound the backward's
    # peak, since the recomputation's own residuals still coexist.
    remat: bool = False

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        b, h, w, _ = images.shape
        if h != cfg.img_size or w != cfg.img_size:
            raise ValueError(f"expected {cfg.img_size}^2 input, got {h}x{w}")
        deterministic = not train

        # Patch embed: strided conv + LN.
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
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        total_depth = sum(cfg.depths)
        dpr = np.linspace(0, cfg.drop_path_rate, total_depth)
        block_idx = 0
        block_cls = SwinBlock
        if self.remat and train:
            block_cls = nn.remat(SwinBlock, static_argnums=(2,))
        for stage, depth in enumerate(cfg.depths):
            dim = int(cfg.embed_dim * 2**stage)
            resolution = (res // 2**stage, res // 2**stage)
            for i in range(depth):
                x = block_cls(
                    dim=dim,
                    input_resolution=resolution,
                    num_heads=cfg.num_heads[stage],
                    window_size=cfg.window_size,
                    shift_size=0 if i % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio,
                    drop_path=float(dpr[block_idx]),
                    pretrained_window=cfg.pretrained_window_sizes[stage],
                    dtype=self.dtype,
                    name=f"stage{stage}_block{i}",
                )(x, deterministic)
                block_idx += 1
            if stage < len(cfg.depths) - 1:
                x = PatchMerging(resolution, dtype=self.dtype, name=f"merge{stage}")(x)

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)  # [B, L, num_features]
        pooled = gem_pool(x, cfg.pool_param, axis=1)
        return nn.Dense(cfg.output_dim, dtype=jnp.float32, name="output_proj")(pooled)


def swinv2_base_256_descriptor(dtype=jnp.bfloat16, remat=False) -> SwinTransformerV2:
    """The v106/v107/v115 ensemble members: SwinV2-Base @ 256, 512-d out."""
    return SwinTransformerV2(cfg=SWINV2_BASE_256, dtype=dtype, remat=remat)


def swinv2_tiny_test_descriptor(
    dtype=jnp.float32, output_dim=None, img_size=None, window_size=None
) -> SwinTransformerV2:
    """Small config for unit tests and CPU smoke runs. `output_dim` /
    `img_size` / `window_size` override the test config (registry configs
    pass them through — e.g. the learning demo trains a 32-d model at 64²
    so the hard augmentations keep visible structure)."""
    cfg = SWINV2_TINY_TEST
    over = {}
    if output_dim is not None:
        over["output_dim"] = int(output_dim)
    if img_size is not None:
        over["img_size"] = int(img_size)
    if window_size is not None:
        over["window_size"] = int(window_size)
    if over:
        cfg = dataclasses.replace(cfg, **over)
    return SwinTransformerV2(cfg=cfg, dtype=dtype)
