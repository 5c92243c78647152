"""Video decode: fixed-rate frame sampling with pluggable backends.

Parity target (reference, for cross-checking — original implementation):
  D1/preprocess/vid2jpg_zip.py:11-49 (ffmpeg subprocess, 1 fps, 60 s timeout
  per video -> skip) and D1/infer/src/dataset.py:90-102 (FFMpegVideoReader).

Backends:
  - OpenCV (`cv2.VideoCapture`): default — available in this image and
    decodes mp4 without an external binary;
  - ffmpeg subprocess: used when an ffmpeg binary exists (matches the
    reference's `-r fps` resampling semantics).

Failure contract matches the reference: any decode error or timeout yields
an empty frame list; callers skip the video.
"""

from __future__ import annotations

import shutil
import subprocess
import tempfile
import time
from pathlib import Path
from typing import List, Optional

import numpy as np

FFMPEG_BINARY = shutil.which("ffmpeg")


def read_frames_opencv(
    path: str, fps: float = 1.0, max_frames: int = 100000, timeout_s: float = 60.0
) -> List[np.ndarray]:
    """Sample frames at `fps` by nearest-timestamp selection (RGB uint8)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return []
    native_fps = cap.get(cv2.CAP_PROP_FPS) or 0.0
    if native_fps <= 0:
        native_fps = 25.0
    step = native_fps / fps
    frames: List[np.ndarray] = []
    next_pick = 0.0
    idx = 0
    deadline = time.monotonic() + timeout_s
    try:
        while len(frames) < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            if idx >= round(next_pick):
                frames.append(frame[:, :, ::-1].copy())
                next_pick += step
            idx += 1
            if time.monotonic() > deadline:
                return []
    finally:
        cap.release()
    return frames


def read_frames_ffmpeg(
    path: str, fps: float = 1.0, timeout_s: float = 60.0
) -> List[np.ndarray]:
    """ffmpeg subprocess resample to `fps` (reference decode path)."""
    import cv2

    if FFMPEG_BINARY is None:
        raise RuntimeError("ffmpeg binary not available")
    with tempfile.TemporaryDirectory() as tmp:
        cmd = [
            FFMPEG_BINARY,
            "-nostdin",
            "-y",
            "-i",
            path,
            "-r",
            str(fps),
            f"{tmp}/%07d.jpg",
        ]
        try:
            subprocess.run(cmd, capture_output=True, timeout=timeout_s, check=True)
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            return []
        frames = []
        for p in sorted(Path(tmp).glob("*.jpg")):
            img = cv2.imread(str(p))
            if img is not None:
                frames.append(img[:, :, ::-1].copy())
        return frames


def read_frames(
    path: str,
    fps: float = 1.0,
    backend: Optional[str] = None,
    timeout_s: float = 60.0,
) -> List[np.ndarray]:
    """Decode `path` at `fps`; empty list on failure (skip semantics)."""
    if backend is None:
        backend = "ffmpeg" if FFMPEG_BINARY is not None else "opencv"
    try:
        if backend == "ffmpeg":
            return read_frames_ffmpeg(path, fps, timeout_s)
        return read_frames_opencv(path, fps, timeout_s=timeout_s)
    except Exception:
        return []
