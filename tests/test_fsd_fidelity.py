"""FSD device-edge-kernel fidelity vs the exact cv2.Canny reference path.

The production serving path computes FSD maps with `_edges_kernel` (an XLA
Sobel+NMS+bounded-hysteresis approximation of cv2.Canny(50,400) —
data/fsd.py); the reference's own arithmetic is `variance_and_edges_host`
(exact cv2). FSD is worth +0.05 µAP (BASELINE.md ablation), so what must
agree is not the edge maps pixel-for-pixel but the CUT DECISIONS —
`clean_boxes` output — that feed descriptor extraction.

This suite builds a corpus of realistic synthetic videos spanning the edit
types FSD exists for (plain, letterbox, pillarbox, 2-up stacks, 2x2 grids,
text overlays, static content, gray bars) and asserts box-level agreement
between the two map sources above a stated bar. Reference semantics:
D1/infer/src/image_preprocess.py:44-275.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vsc22_tpu.data.fsd import (  # noqa: E402
    clean_boxes,
    variance_and_edges_device,
    variance_and_edges_host,
)

H, W, N = 180, 320, 12


def _content(rng, n, h, w, noise=14.0):
    """Moving-gradient content with temporal noise (realistic variance)."""
    yy = np.linspace(0, 200, h, dtype=np.float32)[:, None, None]
    xx = np.linspace(0, 200, w, dtype=np.float32)[None, :, None]
    base = 0.5 * yy + 0.5 * xx + 20.0
    phase = rng.uniform(0, 2 * np.pi)
    frames = []
    for t in range(n):
        drift = 25.0 * np.sin(phase + 2 * np.pi * t / n)
        f = base + drift + rng.normal(0, noise, (h, w, 3))
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    return frames


def make_video(kind: str, seed: int):
    rng = np.random.default_rng(seed)
    if kind == "plain":
        return _content(rng, N, H, W)
    if kind == "static":
        f = _content(rng, 1, H, W)[0]
        return [f.copy() for _ in range(N)]
    if kind == "letterbox":
        bar = H // 6
        inner = _content(rng, N, H - 2 * bar, W)
        out = []
        for f in inner:
            v = np.zeros((H, W, 3), np.uint8)
            v[bar : H - bar] = f
            out.append(v)
        return out
    if kind == "letterbox_gray":
        bar = H // 5
        inner = _content(rng, N, H - 2 * bar, W)
        out = []
        for f in inner:
            v = np.full((H, W, 3), 28, np.uint8)
            v[bar : H - bar] = f
            out.append(v)
        return out
    if kind == "pillarbox":
        bar = W // 5
        inner = _content(rng, N, H, W - 2 * bar)
        out = []
        for f in inner:
            v = np.zeros((H, W, 3), np.uint8)
            v[:, bar : W - bar] = f
            out.append(v)
        return out
    if kind == "vstack":
        gap = 14
        half = (H - gap) // 2
        a = _content(rng, N, half, W)
        b = _content(rng, N, half, W)
        out = []
        for fa, fb in zip(a, b):
            v = np.zeros((H, W, 3), np.uint8)
            v[:half] = fa
            v[half + gap : half + gap + half] = fb
            out.append(v)
        return out
    if kind == "hstack":
        gap = 14
        half = (W - gap) // 2
        a = _content(rng, N, H, half)
        b = _content(rng, N, H, half)
        out = []
        for fa, fb in zip(a, b):
            v = np.zeros((H, W, 3), np.uint8)
            v[:, :half] = fa
            v[:, half + gap : half + gap + half] = fb
            out.append(v)
        return out
    if kind == "grid2x2":
        gy, gx = 12, 12
        hh, hw = (H - gy) // 2, (W - gx) // 2
        quads = [_content(rng, N, hh, hw) for _ in range(4)]
        out = []
        for t in range(N):
            v = np.zeros((H, W, 3), np.uint8)
            v[:hh, :hw] = quads[0][t]
            v[:hh, hw + gx :] = quads[1][t][:, : W - hw - gx]
            v[hh + gy :, :hw] = quads[2][t][: H - hh - gy]
            v[hh + gy :, hw + gx :] = quads[3][t][: H - hh - gy, : W - hw - gx]
            out.append(v)
        return out
    if kind == "text_overlay":
        frames = _content(rng, N, H, W)
        # Static white caption blocks (burned-in text band).
        y0 = H - 30
        for f in frames:
            for k in range(6):
                x0 = 20 + 45 * k
                f[y0 : y0 + 14, x0 : x0 + 30] = 245
        return frames
    raise ValueError(kind)


KINDS = [
    "plain", "static", "letterbox", "letterbox_gray", "pillarbox",
    "vstack", "hstack", "grid2x2", "text_overlay",
]
SEEDS_PER_KIND = 12


def _corpus():
    return [(k, s) for k in KINDS for s in range(SEEDS_PER_KIND)]


@pytest.mark.heavy
def test_cut_decision_agreement():
    """clean_boxes from device maps == clean_boxes from cv2 maps, >=99%.

    The bar is video-level box-list equality over a 108-video corpus
    spanning every edit family; any systematic divergence (e.g. a
    threshold mismatch that splits letterboxes differently) would fail
    far below the bar, while the bar tolerates one borderline video.
    Measured 2026-08-19 (after the round-4 cv2-faithful edge kernel,
    e2f32a2/e3062d6): 180/180 exact agreement at 20 seeds/kind — the
    round-3 residual 2% was the pre-fix hysteresis tail behavior.
    """
    agree, total = 0, 0
    disagreements = []
    for kind, seed in _corpus():
        frames = make_video(kind, 1000 + seed)
        var_h, edges_h = variance_and_edges_host(frames)
        var_d, edges_d = variance_and_edges_device(frames)
        boxes_h = clean_boxes(var_h, edges_h, len(frames), (0, H, 0, W))
        boxes_d = clean_boxes(var_d, edges_d, len(frames), (0, H, 0, W))
        total += 1
        if sorted(boxes_h) == sorted(boxes_d):
            agree += 1
        else:
            disagreements.append((kind, seed, boxes_h, boxes_d))
    rate = agree / total
    assert rate >= 0.99, (
        f"cut-decision agreement {rate:.3f} ({agree}/{total}); "
        f"disagreements: {disagreements}"
    )


@pytest.mark.heavy
def test_expected_cuts_found_by_both_paths():
    """Sanity on the corpus itself: both map sources actually detect the
    edits (letterbox crops, stack splits) — agreement on 'never cut
    anything' would be vacuous."""
    frames = make_video("letterbox", 7)
    for fn in (variance_and_edges_host, variance_and_edges_device):
        var, edges = fn(frames)
        boxes = clean_boxes(var, edges, len(frames), (0, H, 0, W))
        assert len(boxes) == 1
        sh, eh, sw, ew = boxes[0]
        assert sh > 10 and eh < H - 10, boxes  # bars removed

    frames = make_video("vstack", 7)
    for fn in (variance_and_edges_host, variance_and_edges_device):
        var, edges = fn(frames)
        boxes = clean_boxes(var, edges, len(frames), (0, H, 0, W))
        assert len(boxes) >= 2, boxes  # stack split
