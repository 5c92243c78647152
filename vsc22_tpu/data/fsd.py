"""Frame Scenes Detection (FSD): letterbox removal + stacked-frame splitting.

Parity target (reference, for cross-checking — original implementation):
  D1/infer/src/image_preprocess.py:44-275. Worth +0.05 µAP in the
  descriptor-track ablation (PDF Table 2), so behavior fidelity matters:
  - `image_process`: per-pixel temporal variance map + average binarized
    edge map over <=20 sampled frames drive everything downstream;
  - `remove_edges`: strips static letterbox/pillarbox borders when a strong
    edge line has near-zero variance and edge density outside it;
  - `split_imgs`: cuts stacked-frame composites at low-variance gaps, or at
    strong full-width/height edge lines (largest-axis first);
  - `clean_imgs`: bounded recursion of remove+split until stable.

Reference quirks reproduced on purpose (they shape the outputs): the `start`
cursor carries over from the horizontal pass into the vertical pass of
`split_imgs`, and a run is force-opened after 50 rows without a gap.

TPU split: the dense per-pixel reductions (temporal variance, edge maps)
run on device (`variance_and_edges_device`); cut decisions are tiny 1-D
threshold scans on host. The edge detector is a Sobel-magnitude
approximation of cv2.Canny(50, 400) expressed as XLA convs; the exact
cv2.Canny path is kept for bit-parity testing when OpenCV is present.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = np.ndarray


# ---------------------------------------------------------------------------
# Map computation: temporal variance + averaged edge map
# ---------------------------------------------------------------------------


def sample_edge_frames(num_frames: int, cap: int = 20) -> List[int]:
    """Indices of <=cap frames used for the average edge map (reference
    sampling: round(arange(0, n, n/20)))."""
    if num_frames <= cap:
        return list(range(num_frames))
    idxs = np.arange(0, num_frames, num_frames / cap)
    return [int(np.round(i)) for i in idxs]


# Hysteresis flood rounds in `_edges_kernel` (each round: full-length
# row+column run propagation plus two 3x3 dilation steps). Set by the
# cut-decision agreement suite: the smallest count holding >=99% agreement
# with cv2's unbounded flood over the edit-type corpus.
_FLOOD_ROUNDS = 8


def _canny_cv2(img: Array) -> Array:
    import cv2

    return (cv2.Canny(img, 50, 400) > 0).astype(np.float64)


def edge_map_cv2(frames: Sequence[Array]) -> Array:
    """Average binarized cv2.Canny(50,400) edge map (exact reference path)."""
    maps = [_canny_cv2(f) for f in frames]
    return sum(maps) / len(maps)


@jax.jit
def _edges_kernel(frames_u8):
    """Device edge map: per-channel Sobel -> channel-max -> NMS -> hysteresis.

    A compiled approximation of cv2.Canny(50, 400) on COLOR frames, which
    is what the reference feeds it (D1/infer/src/image_preprocess.py):
    OpenCV computes Sobel per channel and keeps, per pixel, the channel
    with the largest |gx|+|gy| — NOT a grayscale reduction. Grayscale
    averaging shrinks the per-channel noise tail that carries pixels over
    the 400 seed threshold, which measurably thins edge lines on
    low-contrast (gray-bar) boundaries and flips downstream FSD cut rows
    (tests/test_fsd_fidelity.py is the agreement guard).
    """
    # Per-channel Sobel via shifted slices, one rank-3 [N, H, W] array per
    # channel — NEVER a rank-5 tensor with the 3-channel axis minormost.
    # (A conv-based formulation transposed channels next to the lane dim;
    # on TPU that copy pads 3 -> 128 lanes, a 51x HBM blowup that OOMs the
    # serving batch: f32[24,20,3,360,640] -> 68 GB. Slices keep W minormost
    # and every intermediate fuses into the elementwise Sobel chain.)
    def sobel(ch_u8):
        p = jnp.pad(ch_u8, ((0, 0), (1, 1), (1, 1)), mode="edge").astype(
            jnp.float32
        )
        top, mid, bot = p[:, :-2], p[:, 1:-1], p[:, 2:]
        gx = (
            (top[:, :, 2:] - top[:, :, :-2])
            + 2.0 * (mid[:, :, 2:] - mid[:, :, :-2])
            + (bot[:, :, 2:] - bot[:, :, :-2])
        )
        gy = (
            (bot[:, :, :-2] + 2.0 * bot[:, :, 1:-1] + bot[:, :, 2:])
            - (top[:, :, :-2] + 2.0 * top[:, :, 1:-1] + top[:, :, 2:])
        )
        return gx, gy

    # cv2 keeps, per pixel, the channel with the largest |gx|+|gy| (L1
    # norm, cv2 default); ties resolve to the earliest channel (argmax
    # first-occurrence semantics), hence the strict '>' below.
    gx, gy = sobel(frames_u8[..., 0])
    mag = jnp.abs(gx) + jnp.abs(gy)
    for c in (1, 2):
        gx_c, gy_c = sobel(frames_u8[..., c])
        mag_c = jnp.abs(gx_c) + jnp.abs(gy_c)
        better = mag_c > mag
        gx = jnp.where(better, gx_c, gx)
        gy = jnp.where(better, gy_c, gy)
        mag = jnp.maximum(mag_c, mag)

    # Non-maximum suppression along the quantized gradient direction.
    def shift(a, dy, dx):
        return jnp.roll(a, (dy, dx), axis=(1, 2))

    horiz = jnp.abs(gx) >= jnp.abs(gy)
    diag = (gx * gy) > 0
    n1 = jnp.where(horiz, shift(mag, 0, 1), shift(mag, 1, 0))
    n2 = jnp.where(horiz, shift(mag, 0, -1), shift(mag, -1, 0))
    d1 = jnp.where(diag, shift(mag, 1, 1), shift(mag, 1, -1))
    d2 = jnp.where(diag, shift(mag, -1, -1), shift(mag, -1, 1))
    use_diag = jnp.minimum(jnp.abs(gx), jnp.abs(gy)) > 0.41 * jnp.maximum(
        jnp.abs(gx), jnp.abs(gy)
    )
    prev = jnp.where(use_diag, d1, n1)
    nxt = jnp.where(use_diag, d2, n2)
    keep = (mag >= prev) & (mag >= nxt)

    strong = keep & (mag > 400.0)  # Canny high threshold
    weak = keep & (mag > 50.0)  # Canny low threshold

    # Hysteresis: flood weak pixels 8-connected to strong ones, to
    # convergence (cv2 floods unboundedly). One-pixel dilation sweeps alone
    # need a sweep per pixel of flood distance — long letterbox/pillarbox
    # border lines with sparse strong seeds are hundreds of pixels, and a
    # sweep cap truncates exactly those FSD-critical lines. Instead each
    # round propagates marks the FULL length of contiguous weak runs along
    # rows and columns (a first-order boolean recurrence f[j] = s[j] |
    # (weak[j] & f[j-1]), run both directions via associative_scan in
    # O(log W) passes), then takes two 3x3 dilation steps for diagonal /
    # cross-run hops. Straight border lines finish in one round; the round
    # cap only binds on noise-like percolation where the map saturates
    # anyway. The 3x3 step is a zero-padded reduce_window — cv2's image
    # edge does not propagate (a rolled-shift formulation would wrap).
    def shift_by(a, d, axis):
        """Shift `a` by signed d along `axis`, False-filled (no wrap)."""
        n = a.shape[axis]
        pad = [(0, 0)] * a.ndim
        sl = [slice(None)] * a.ndim
        if d >= 0:
            pad[axis] = (d, 0)
            sl[axis] = slice(0, n)
        else:
            pad[axis] = (0, -d)
            sl[axis] = slice(-d, n - d)
        return jnp.pad(a, pad)[tuple(sl)]

    def line_flood(s, axis):
        """Propagate marks the FULL length of contiguous weak runs along
        `axis`, both directions — carry-lookahead doubling of the boolean
        recurrence f[j] = s[j] | (w[j] & f[j-1]): log2(L) rounds of
        (G, P) <- (G | (P & G>>d), P & P>>d). Shifts are contiguous
        pad+slice copies (an associative_scan formulation lowers to
        strided odd/even lane shuffles on TPU, measured 20x slower)."""
        n = s.shape[axis]
        gf, pf = s, weak
        gb, pb = s, weak
        d = 1
        while d < n:
            gf = gf | (pf & shift_by(gf, d, axis))
            pf = pf & shift_by(pf, d, axis)
            gb = gb | (pb & shift_by(gb, -d, axis))
            pb = pb & shift_by(pb, -d, axis)
            d *= 2
        return gf | gb

    def dilate(m):
        return jax.lax.reduce_window(
            m.astype(jnp.bfloat16), jnp.bfloat16(0), jax.lax.max,
            (1, 3, 3), (1, 1, 1), "SAME",
        ) > 0

    # Fixed rounds of [row-flood, column-flood, two 3x3 dilations]:
    # straight border lines — the FSD-critical case, hundreds of pixels
    # long with sparse strong seeds — complete in the FIRST line pass
    # (1-pixel sweeps need a sweep per pixel and any practical cap
    # truncates them); the remaining rounds connect corners, diagonals and
    # short zig-zags. Interior noise-texture regions do not flood to
    # cv2's unbounded fixpoint, but their contribution to the downstream
    # profile statistics is diffuse — the cut-decision agreement suite
    # (tests/test_fsd_fidelity.py, >=99% over the edit-type corpus) is the
    # fidelity contract that sets _FLOOD_ROUNDS, and a fixed round count
    # makes the serving-path cost deterministic.
    for _ in range(_FLOOD_ROUNDS):
        strong = line_flood(strong, axis=2)
        strong = line_flood(strong, axis=1)
        for _ in range(2):
            strong = strong | (weak & dilate(strong))
    return jnp.mean(strong.astype(jnp.float32), axis=0)


def variance_and_edges_device(frames) -> Tuple[Array, Array]:
    """Device path: per-pixel temporal variance (summed over RGB) + avg edges.

    `frames` may be a host frame sequence or an already device-resident
    [N, H, W, 3] uint8 array (no host round trip in that case).
    """
    import jax as _jax

    if isinstance(frames, _jax.Array):
        stack = frames
    else:
        stack = jnp.asarray(np.stack(frames))
    var = np.asarray(jnp.var(stack.astype(jnp.float32), axis=0).sum(-1))
    idx = jnp.asarray(sample_edge_frames(int(stack.shape[0])))
    edges = np.asarray(_edges_kernel(stack[idx]))
    return var, edges


def variance_and_edges_device_batch(stack5d) -> Tuple[Array, Array]:
    """Maps for a BATCH of same-shape videos in one device program + fetch.

    `stack5d`: [V, N, H, W, 3] uint8 (device or host). Returns host arrays
    var [V, H, W] and edges [V, H, W] — identical per-video results to
    `variance_and_edges_device`, but the serving path pays ONE relay
    round-trip per batch instead of two per video.
    """
    stack5d = jnp.asarray(stack5d)
    v, n = int(stack5d.shape[0]), int(stack5d.shape[1])
    idx = jnp.asarray(sample_edge_frames(n))
    # One fused fetch, shipped f16: the maps only feed threshold/quantile
    # cut decisions (values up to ~48k variance, well inside f16 range);
    # halving the transfer matters because the fetch, not the compute, is
    # the serving-path cost of this stage.
    flat = np.asarray(_batch_maps(stack5d, idx)).astype(np.float32)
    return flat[:v], flat[v:]


@jax.jit
def _batch_maps(stack, idx):
    var = jnp.var(stack.astype(jnp.float32), axis=1).sum(-1)
    edges = jax.vmap(_edges_kernel)(jnp.take(stack, idx, axis=1))
    return jnp.concatenate([var, edges], axis=0).astype(jnp.float16)


@jax.jit
def _batch_maps_profiles(stack, idx):
    """Maps (f16, kept on device) + the level-0 decision profiles.

    The profiles are computed from the f16-ROUNDED maps cast back to f32 so
    they equal what the host would compute from a fetched f16 map (the only
    residual difference is float reduction order). Pack layout per video:
    [sum_h(W) | canny_h_re(W) | canny_h_sp(W) | sum_w(H) | canny_w_re(H) |
     canny_w_sp(H) | sp_fea_mean] — `_re` profiles binarize at the
    remove_edges threshold (mean+0.35), `_sp` at the split threshold
    (mean+0.3), both clamped by the q95/0.2 rule the host cores use.
    """
    maps16 = _batch_maps(stack, idx)
    v = stack.shape[0]
    var32 = maps16[:v].astype(jnp.float32)
    edge32 = maps16[v:].astype(jnp.float32)
    sum_h = var32.mean(axis=1)  # [V, W] per-column variance profile
    sum_w = var32.mean(axis=2)  # [V, H] per-row variance profile
    q95 = jnp.quantile(edge32.reshape(v, -1), 0.95, axis=1)
    emean = edge32.mean(axis=(1, 2))
    thr_re = jnp.minimum(jnp.maximum(q95, 0.2), emean + 0.35)[:, None, None]
    thr_sp = jnp.minimum(jnp.maximum(q95, 0.2), emean + 0.3)[:, None, None]
    fea_re = (edge32 > thr_re).astype(jnp.float32)
    fea_sp = (edge32 > thr_sp).astype(jnp.float32)
    pack = jnp.concatenate(
        [
            sum_h, fea_re.mean(axis=1), fea_sp.mean(axis=1),
            sum_w, fea_re.mean(axis=2), fea_sp.mean(axis=2),
            fea_sp.mean(axis=(1, 2))[:, None],
        ],
        axis=1,
    )
    return maps16, pack


def batch_maps_profiles_device(stack5d):
    """Serving-path FSD maps: profiles fetched, full maps stay on device.

    Returns (maps16_dev [2V, H, W] f16 jax.Array — NOT fetched — and a list
    of per-video profile dicts). The level-0 cut decisions
    (`level0_boxes_from_profiles`) need only the profiles (~3 KB/video);
    only videos the screen flags ever pay the full-map fetch (~0.9 MB/video
    through this environment's 40 MB/s relay).
    """
    maps16, pack_dev, dims = batch_maps_profiles_dispatch(stack5d)
    pack = np.asarray(pack_dev, np.float32)  # ONE small host fetch
    return maps16, unpack_profiles(pack, *dims)


def batch_maps_profiles_dispatch(stack5d):
    """Dispatch-only half of `batch_maps_profiles_device`: returns
    (maps16_dev, pack_dev, (v, h, w)) with NO host sync, so callers can
    queue more device work before paying the fetch."""
    stack5d = jnp.asarray(stack5d)
    v = int(stack5d.shape[0])
    n = int(stack5d.shape[1])
    h, w = int(stack5d.shape[2]), int(stack5d.shape[3])
    idx = jnp.asarray(sample_edge_frames(n))
    maps16, pack = _batch_maps_profiles(stack5d, idx)
    return maps16, pack, (v, h, w)


def unpack_profiles(pack: np.ndarray, v: int, h: int, w: int) -> List[dict]:
    profs = []
    for i in range(v):
        row = pack[i]
        profs.append(
            dict(
                sum_h=row[:w],
                canny_h_re=row[w : 2 * w],
                canny_h_sp=row[2 * w : 3 * w],
                sum_w=row[3 * w : 3 * w + h],
                canny_w_re=row[3 * w + h : 3 * w + 2 * h],
                canny_w_sp=row[3 * w + 2 * h : 3 * w + 3 * h],
                sp_mean=float(row[3 * w + 3 * h]),
            )
        )
    return profs


def level0_boxes_from_profiles(
    prof: dict, h: int, w: int, num_frames: int
) -> Optional[List[Box]]:
    """Replay `clean_boxes`' level-0 decisions from profiles alone.

    Returns the final box list when it is decidable without the 2-D maps
    (the common no-edit case: remove_edges keeps the full frame and split
    finds nothing), else None — the caller must then fetch the maps and run
    the full `clean_boxes` recursion (sub-box profiles are not derivable
    from full-frame profiles)."""
    origin = (0, h, 0, w)
    if num_frames < 5:
        return [origin]
    sh, eh, sw, ew = _remove_edges_core(
        prof["sum_h"], prof["sum_w"], prof["canny_h_re"], prof["canny_w_re"], h, w
    )
    if min(eh - sh, ew - sw) < 20:
        return [origin]
    if (sh, eh, sw, ew) != origin:
        return None
    sub = _split_core(
        prof["sum_h"], prof["sum_w"], prof["canny_h_sp"], prof["canny_w_sp"],
        prof["sp_mean"], h, w, min_size=80,
    )
    if sub == [origin]:
        return [origin]
    return None


def variance_and_edges_host(frames: Sequence[Array]) -> Tuple[Array, Array]:
    """Host path, exact reference arithmetic (cv2.Canny)."""
    stack = np.stack(frames)
    var = stack.astype(np.float64).var(axis=0).sum(-1)
    edges = edge_map_cv2([frames[i] for i in sample_edge_frames(len(frames))])
    return var, edges


# ---------------------------------------------------------------------------
# Cut decisions (host; tiny 1-D threshold logic)
# ---------------------------------------------------------------------------


Box = Tuple[int, int, int, int]  # (start_h, end_h, start_w, end_w)


def remove_edges(
    imgs: List[Array], img_var: Array, avg_canny: Array
) -> Tuple[List[Array], Array, Array]:
    """Strip static letterbox/pillarbox borders (array-returning wrapper)."""
    sh, eh, sw, ew = remove_edges_box(img_var, avg_canny)
    return (
        [x[sh:eh, sw:ew, :] for x in imgs],
        img_var[sh:eh, sw:ew],
        avg_canny[sh:eh, sw:ew],
    )


def remove_edges_box(img_var: Array, avg_canny: Array) -> Box:
    """Decision core of remove_edges: the crop box, from the maps alone.

    A candidate border line is a row/column whose edge density clearly
    exceeds the mean; it becomes a crop boundary when the region outside it
    has both low temporal variance and low edge density.
    """
    sum_h = img_var.mean(0)  # per-column variance profile
    sum_w = img_var.mean(1)  # per-row variance profile
    h, w = img_var.shape

    threshold = min(max(np.quantile(avg_canny, 0.95), 0.2), avg_canny.mean() + 0.35)
    canny_fea = (avg_canny > threshold).astype(np.float32)
    canny_h = canny_fea.mean(0)
    canny_w = canny_fea.mean(1)
    return _remove_edges_core(sum_h, sum_w, canny_h, canny_w, h, w)


def _remove_edges_core(
    sum_h: Array, sum_w: Array, canny_h: Array, canny_w: Array, h: int, w: int
) -> Box:
    """remove_edges decision from the 1-D profiles alone.

    The serving path computes these profiles ON DEVICE and fetches only
    them (~KB instead of the full H*W maps) — the logic here is the single
    source of truth for both the map path and the profile fast path.
    """
    start_h, start_w = 0, 0
    end_h, end_w = h, w

    MEAN_C = 0.0225
    EXTRA = 0.3
    HIGH_CANNY = 0.65

    def is_static(profile_slice, canny_slice, line_canny):
        if profile_slice.size == 0:
            return False
        sum_v = np.median(profile_slice) + profile_slice.mean()
        mean_c = canny_slice.mean() if canny_slice.size else 0.0
        if sum_v < 75 and mean_c < MEAN_C:
            return True
        return sum_v < 250 and mean_c < MEAN_C and line_canny > HIGH_CANNY

    rows = [i for i in np.where(canny_w > 0.125 + canny_w.mean())[0] if i not in (0, h - 1)]
    for idx in rows:
        if idx - start_h < 5:
            continue
        extra = round((idx - start_h) * EXTRA)
        if is_static(sum_w[start_h : idx - extra], canny_w[start_h : idx - extra], canny_w[idx]):
            start_h = idx + 1
    for idx in reversed(rows):
        if end_h - idx < 5:
            continue
        extra = round((end_h - idx) * EXTRA)
        if is_static(sum_w[idx + extra : end_h], canny_w[idx + extra : end_h], canny_w[idx]):
            end_h = idx

    cols = [i for i in np.where(canny_h > 0.125 + canny_h.mean())[0] if i not in (0, w - 1)]
    for idx in cols:
        if idx - start_w < 5:
            continue
        extra = round((idx - start_w) * EXTRA)
        if is_static(sum_h[start_w : idx - extra], canny_h[start_w : idx - extra], canny_h[idx]):
            start_w = idx + 1
    for idx in reversed(cols):
        if end_w - idx < 5:
            continue
        extra = round((end_w - idx) * EXTRA)
        if is_static(sum_h[idx + extra : end_w], canny_h[idx + extra : end_w], canny_h[idx]):
            end_w = idx

    return start_h, end_h, start_w, end_w


def split_imgs(
    imgs: List[Array],
    img_var: Array,
    avg_canny: Array,
    gap: int = 5,
    min_size: int = 120,
) -> List[Tuple[List[Array], Array, Array]]:
    """Array-returning wrapper over `split_boxes` (kept for host parity)."""
    return [
        (
            [img[sh:eh, sw:ew, :] for img in imgs],
            img_var[sh:eh, sw:ew],
            avg_canny[sh:eh, sw:ew],
        )
        for sh, eh, sw, ew in split_boxes(img_var, avg_canny, gap, min_size)
    ]


def split_boxes(
    img_var: Array, avg_canny: Array, gap: int = 5, min_size: int = 120
) -> List[Box]:
    """Cut stacked-frame composites at low-variance gaps or edge lines.

    Decision core over the maps alone; boxes are in this map's coordinates.
    Pass 1: scan rows for variance gaps (a run opens after activity or 50
    rows; closes at a low-variance gap). Pass 2: same for columns — the
    `start` cursor intentionally carries over from pass 1 (reference quirk).
    Pass 3: strong full-line edges split along the larger axis first.
    Returns sub-stream boxes, or the full box as a singleton.
    """
    h, w = img_var.shape
    threshold = min(max(np.quantile(avg_canny, 0.95), 0.2), avg_canny.mean() + 0.3)
    canny_fea = (avg_canny > threshold).astype(np.float32)
    return _split_core(
        img_var.mean(0), img_var.mean(1),
        canny_fea.mean(0), canny_fea.mean(1), float(canny_fea.mean()),
        h, w, gap, min_size,
    )


def _split_core(
    sum_h: Array, sum_w: Array, canny_h: Array, canny_w: Array,
    fea_mean: float, h: int, w: int, gap: int = 5, min_size: int = 120
) -> List[Box]:
    """split_boxes decision from 1-D profiles of the maps + the binarized-map
    mean (profiles of `canny_fea` at the split threshold q95/+0.3, NOT the
    remove_edges +0.35 threshold). Shared by the map path and the serving
    profile fast path."""
    half_gap = gap // 2
    res: List[Box] = []

    is_middle = False
    start = 0
    for i in range(h - gap):
        if not is_middle and (sum_w[i : i + gap].mean() > 0.1 or i - start > 50):
            is_middle = True
        elif is_middle and sum_w[i : i + gap].mean() < 0.1:
            if i + half_gap - start > min_size:
                res.append((start, i + half_gap, 0, w))
            is_middle = False
            start = i + half_gap
    if res or start != 0:
        if h - start > min_size:
            res.append((start, h, 0, w))
        if res:
            return res

    is_middle = False  # NOTE: `start` deliberately not reset (reference quirk)
    for i in range(w - gap):
        if not is_middle and (sum_h[i : i + gap].mean() > 0.1 or i - start > 50):
            is_middle = True
        elif is_middle and sum_h[i : i + gap].mean() < 0.1:
            if i + half_gap - start > min_size:
                res.append((0, h, start, i + half_gap))
            is_middle = False
            start = i + half_gap
    if res or start != 0:
        if w - start > min_size:
            res.append((0, h, start, w))
        if res:
            return res

    rows = list(np.where(canny_w > 0.45 + fea_mean)[0])[::-1]
    cols = list(np.where(canny_h > 0.45 + fea_mean)[0])[::-1]

    def cut_rows(end=h):
        for idx in rows:
            if end - idx > min_size:
                res.append((idx, end, 0, w))
                end = idx
        if res and end > min_size:
            res.append((0, end, 0, w))

    def cut_cols(end=w):
        for idx in cols:
            if end - idx > min_size:
                res.append((0, h, idx, end))
                end = idx
        if res and end > min_size:
            res.append((0, h, 0, end))

    order = (cut_cols, cut_rows) if w > h else (cut_rows, cut_cols)
    for cut in order:
        cut()
        if res:
            return res
    return [(0, h, 0, w)]


def clean_boxes(
    img_var: Array, avg_canny: Array, num_frames: int, origin: Box
) -> List[Box]:
    """remove_edges + split recursion producing ABSOLUTE frame boxes.

    `img_var`/`avg_canny` cover `origin` (a box in original-frame
    coordinates); the returned boxes compose every crop level back into the
    original frame. Frames are never touched: FSD only ever cuts rectangles,
    so a (video, box) pair fully describes each output stream — this is what
    lets the serving path run crop+resize as one shape-static device program
    against the original frames.
    """
    o_sh, _, o_sw, _ = origin
    if num_frames < 5:
        return [origin]
    sh, eh, sw, ew = remove_edges_box(img_var, avg_canny)
    if min(eh - sh, ew - sw) < 20:
        return [origin]
    cut_var = img_var[sh:eh, sw:ew]
    cut_canny = avg_canny[sh:eh, sw:ew]
    sub_boxes = split_boxes(cut_var, cut_canny, min_size=80)
    full = (0, eh - sh, 0, ew - sw)
    if len(sub_boxes) == 1 and sub_boxes[0] == full:
        return [(o_sh + sh, o_sh + eh, o_sw + sw, o_sw + ew)]
    res: List[Box] = []
    for b_sh, b_eh, b_sw, b_ew in sub_boxes:
        child_origin = (
            o_sh + sh + b_sh,
            o_sh + sh + b_eh,
            o_sw + sw + b_sw,
            o_sw + sw + b_ew,
        )
        res.extend(
            clean_boxes(
                cut_var[b_sh:b_eh, b_sw:b_ew],
                cut_canny[b_sh:b_eh, b_sw:b_ew],
                num_frames,
                child_origin,
            )
        )
    return res


def clean_imgs(imgs: List[Array], img_var: Array, avg_canny: Array) -> List[List[Array]]:
    """Box recursion applied to host frames (compatibility wrapper)."""
    h, w = imgs[0].shape[:2]
    boxes = clean_boxes(img_var, avg_canny, len(imgs), (0, h, 0, w))
    return [[img[sh:eh, sw:ew, :] for img in imgs] for sh, eh, sw, ew in boxes]


def image_process(
    img_list: Sequence,
    use_device_maps: bool = False,
    device_frames=None,
    precomputed_maps: Optional[Tuple[Array, Array]] = None,
) -> Tuple[bool, List]:
    """Full FSD entry point over PIL images or arrays.

    Returns (processed?, frames): when borders/splits were found, `frames`
    is the concatenation of every scene crop's frame stream (k x more
    frames); otherwise the input unchanged. Any internal failure falls back
    to the raw frames (reference robustness contract).

    `device_frames` may carry an already device-resident [N, H, W, 3] u8
    copy of the same frames — the variance/edge maps then compute without
    re-shipping (the cut decisions still run on the host copies).
    """
    try:
        changed, boxes = image_process_boxes(
            img_list,
            use_device_maps=use_device_maps,
            device_frames=device_frames,
            precomputed_maps=precomputed_maps,
        )
        if changed:
            imgs = [np.asarray(x) for x in img_list]
            out = []
            for sh, eh, sw, ew in boxes:
                out.extend([img[sh:eh, sw:ew, :] for img in imgs])
            return True, out
    except Exception:
        pass
    return False, list(img_list)


def image_process_boxes(
    img_list: Sequence,
    use_device_maps: bool = False,
    device_frames=None,
    precomputed_maps: Optional[Tuple[Array, Array]] = None,
) -> Tuple[bool, List[Box]]:
    """Box-producing FSD: (changed?, crop boxes in original coordinates).

    The serving path prefers this form: each (video, box) stream can then be
    cropped+resized on device directly from the original frames with a
    shape-static program (data/transforms.crop_resize_normalize), with no
    host crop materialization and no per-crop-shape recompiles.
    """
    n = len(img_list)
    first = np.asarray(img_list[0])
    h, w = first.shape[:2]
    if precomputed_maps is not None:
        img_var, avg_canny = precomputed_maps
    elif device_frames is not None:
        img_var, avg_canny = variance_and_edges_device(device_frames)
    elif use_device_maps:
        img_var, avg_canny = variance_and_edges_device(
            [np.asarray(x) for x in img_list]
        )
    else:
        img_var, avg_canny = variance_and_edges_host(
            [np.asarray(x) for x in img_list]
        )
    boxes = clean_boxes(img_var, avg_canny, n, (0, h, 0, w))
    changed = len(boxes) > 1 or boxes[0] != (0, h, 0, w)
    return changed, boxes
