"""Per-backbone frame transforms as batched device ops.

Parity targets (reference, for cross-checking — original implementation):
  - D1/infer/src/transform.py:23-44 (sscd/eff/vit presets)
  - D1/train/train_v68/vsc/.../datasets/transforms_utils.py (train twins)
  - CLIP preprocessing: D1/infer/extract_query_feats.py:92-99
    (Resize(224, bicubic) shortest-side + CenterCrop(224) + CLIP norm)

The reference resizes per frame on CPU via PIL; here whole frame batches are
resized with `jax.image.resize` (bicubic) and normalized on device in one
fused XLA program. PIL and XLA bicubic kernels differ at the last bit; the
descriptors are robust to this (they are trained with far harsher augs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PRESETS = {
    # name: (mean, std)
    "imagenet": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "clip": ((0.48145466, 0.4578275, 0.40821073), (0.26862954, 0.26130258, 0.27577711)),
    "vit": ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    "efficientnet": ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
}


@functools.partial(jax.jit, static_argnames=("size", "preset", "out_dtype"))
def resize_normalize(
    frames_u8: jax.Array, size: int, preset: str = "vit", out_dtype=jnp.float32
) -> jax.Array:
    """[N, H, W, 3] uint8 -> [N, size, size, 3] normalized float.

    Square resize (the sscd/eff/vit presets resize both dims, no crop).
    """
    mean, std = PRESETS[preset]
    x = frames_u8.astype(jnp.float32) / 255.0
    n = frames_u8.shape[0]
    x = jax.image.resize(x, (n, size, size, 3), method="cubic")
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return x.astype(out_dtype)


def clip_preprocess(frames_u8: jax.Array, size: int = 224, out_dtype=jnp.float32) -> jax.Array:
    """CLIP preset: shortest-side resize to `size` (bicubic) + center crop.

    Runs as the same jitted two-GEMM program as `crop_resize_normalize`
    (the center crop is a column subset of the resize weight matrices —
    one program instead of an eager jax.image.resize chain that pays a
    dispatch per op and f32 GEMMs). The weights enter as (cached,
    device-resident) ARGUMENTS, not traced constants — large baked-in
    constants are rejected by remote-relay compiles.
    """
    _, h, w, _ = frames_u8.shape
    row_w, col_w = _clip_resize_weights(int(h), int(w), size)
    return crop_resize_normalize(
        frames_u8, row_w, col_w, preset="clip", out_dtype=out_dtype,
    )


@functools.lru_cache(maxsize=64)
def _clip_resize_weights(h: int, w: int, size: int):
    """(row, col) cubic weight matrices for shortest-side resize to `size`
    followed by a center crop — the crop keeps only the output rows/cols
    inside the crop window, i.e. a column subset of the full resize
    matrices. Device-resident: one upload per shape per process."""
    if h <= w:
        new_h, new_w = size, max(int(round(w * size / h)), size)
    else:
        new_h, new_w = max(int(round(h * size / w)), size), size
    top = (new_h - size) // 2
    left = (new_w - size) // 2
    row_w = cubic_resize_weights(h, new_h)[:, top : top + size]
    col_w = cubic_resize_weights(w, new_w)[:, left : left + size]
    return jnp.asarray(row_w), jnp.asarray(col_w)


def resize_normalize_host(img, size: int, preset: str = "vit"):
    """Host (cv2) twin of `resize_normalize` for one frame — used where frame
    resolutions vary per video (a device resize would recompile per shape)."""
    import cv2

    mean, std = PRESETS[preset]
    x = cv2.resize(np.asarray(img), (size, size), interpolation=cv2.INTER_CUBIC)
    x = x.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def clip_preprocess_host(img, size: int = 224):
    """Host twin of `clip_preprocess`: shortest-side resize + center crop."""
    import cv2

    img = np.asarray(img)
    h, w = img.shape[:2]
    if h <= w:
        nh, nw = size, max(int(round(w * size / h)), size)
    else:
        nh, nw = max(int(round(h * size / w)), size), size
    x = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_CUBIC)
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[top : top + size, left : left + size].astype(np.float32) / 255.0
    mean, std = PRESETS["clip"]
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def batch_frames(frames: list, chunk: int = 48) -> list:
    """Split a stack of frames into <=chunk sub-batches (the reference's
    LEN_THRESHOLD=48 inference micro-batching, extract_query_feats.py:55)."""
    arr = np.stack([np.asarray(f) for f in frames])
    return [arr[i : i + chunk] for i in range(0, len(arr), chunk)]


# ---------------------------------------------------------------------------
# Shape-static crop+resize: dense cubic weight matrices
# ---------------------------------------------------------------------------
#
# FSD scene splitting yields crop boxes of data-dependent sizes; resizing
# each crop with jax.image.resize would compile one program per crop shape
# (unbounded recompilation in serving). Since resize is linear, a crop's
# resize is a pair of dense matrices over the ORIGINAL axes — zero outside
# the box — so every stream of an [N, H, W, 3] video runs the SAME compiled
# einsum program, with the box carried entirely in the (tiny, host-built)
# weight data. Weights replicate jax.image.resize(method="cubic") exactly:
# Keys cubic kernel (a = -0.5), antialias stretch on downscale, per-output
# renormalization.


def _keys_cubic(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    return np.where(
        x <= 1.0,
        1.5 * x3 - 2.5 * x2 + 1.0,
        np.where(x < 2.0, -0.5 * x3 + 2.5 * x2 - 4.0 * x + 2.0, 0.0),
    )


def cubic_resize_weights(
    in_size: int, out_size: int, start: int = 0, stop: int | None = None
) -> np.ndarray:
    """[in_size, out_size] f32 matrix resizing the slice [start, stop) to
    out_size with jax.image.resize "cubic" semantics; rows outside the slice
    are zero. x[..., start:stop] resized == x @ W along that axis."""
    stop = in_size if stop is None else stop
    length = stop - start
    scale = out_size / length
    kernel_scale = max(1.0 / scale, 1.0)  # antialias stretch when downscaling
    sample_f = (np.arange(out_size) + 0.5) / scale - 0.5  # in crop coords
    x = (
        np.abs(sample_f[None, :] - np.arange(length)[:, None]) / kernel_scale
    )
    weights = _keys_cubic(x) / kernel_scale
    total = weights.sum(axis=0, keepdims=True)
    weights = np.where(np.abs(total) > 1e-6, weights / total, 0.0)
    full = np.zeros((in_size, out_size), np.float32)
    full[start:stop] = weights.astype(np.float32)
    return full


@functools.partial(jax.jit, static_argnames=("preset", "out_dtype"))
def crop_resize_normalize(
    frames_u8: jax.Array,  # [N, H, W, 3] uint8
    row_w: jax.Array,  # [H, S]
    col_w: jax.Array,  # [W, S]
    preset: str = "vit",
    out_dtype=jnp.float32,
) -> jax.Array:
    """Crop+resize+normalize as two dense MXU einsums, shape-static in the
    original frame size (the crop lives in the weight matrices).

    Layout note: the row pass contracts h against [h, w*c]-contiguous
    frames (a clean GEMM); the column pass would contract w at stride
    c=3, which XLA lowers to N=3 sliver GEMMs — so the intermediate is
    transposed to [n, s, c, w] first and the column pass runs as a
    [s*c, w] x [w, t] GEMM, with one cheap minor transpose back at the
    end."""
    mean, std = PRESETS[preset]
    # bf16 serving consumers get bf16 GEMMs (f32 accumulation): the resize
    # contractions are MXU-bound and f32 runs them at 1/4 rate, while the
    # model input would be bf16-rounded immediately anyway (u8/255 carries
    # ~2^-9 relative rounding in bf16 — below the model's own input
    # quantization). f32 consumers (tests, weight-porting parity) keep the
    # exact jax.image.resize-equivalent f32 path.
    ct = jnp.bfloat16 if jnp.dtype(out_dtype) == jnp.bfloat16 else jnp.float32
    x = frames_u8.astype(ct) / jnp.asarray(255.0, ct)
    y = jnp.einsum(
        "nhwc,hs->nswc", x, row_w.astype(ct),
        preferred_element_type=jnp.float32,
    ).astype(ct)
    y = jnp.einsum("nscw,wt->nsct", y.transpose(0, 1, 3, 2), col_w.astype(ct),
                   preferred_element_type=jnp.float32)
    y = y.transpose(0, 1, 3, 2)  # [n, s, t, c]
    y = (y - jnp.asarray(mean)) / jnp.asarray(std)
    return y.astype(out_dtype)
