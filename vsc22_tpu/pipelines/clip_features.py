"""CLIP frame-feature extraction for video-score (VED) training.

Parity target (reference, for cross-checking — original implementation):
  D1/train/train_vid_score/video/extract_feat.py:75-146 — DDP extraction of
  CLIP ViT-L/14 CLS features for every video (<=256 frames), all-gathered to
  rank 0 and stored float16, one npy per video inside feats.zip.

TPU design: fixed-shape [chunk, 224, 224, 3] micro-batches through the CLIP
tower; per-process video sharding (ref_extract.shard_videos); output is a
zip of per-video .npy float16 arrays — byte-compatible with the reference's
feats.zip consumed by FeatureSequenceDataset/videozip_dataset.
"""

from __future__ import annotations

import io
import logging
import zipfile
from typing import Dict, Iterable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsc22_tpu.data.transforms import clip_preprocess_host

logger = logging.getLogger("clip_features")

MAX_FRAMES = 256


class ClipFeatureExtractor:
    """CLIP visual CLS features in fixed-shape micro-batches."""

    def __init__(self, clip_model, clip_params, chunk: int = 32):
        self.model = clip_model
        self.params = clip_params
        self.chunk = chunk
        self._fwd = jax.jit(lambda p, im: self.model.apply(p, im)[:, 0])

    def extract(self, frames: Sequence) -> np.ndarray:
        size = self.model.cfg.img_size
        arr = np.stack([clip_preprocess_host(f, size) for f in frames[:MAX_FRAMES]])
        outs = []
        for start in range(0, len(arr), self.chunk):
            block = arr[start : start + self.chunk]
            valid = len(block)
            if valid < self.chunk:
                pad = np.zeros((self.chunk - valid,) + block.shape[1:], block.dtype)
                block = np.concatenate([block, pad])
            out = np.asarray(self._fwd(self.params, jnp.asarray(block)), np.float32)
            outs.append(out[:valid])
        return np.concatenate(outs, axis=0)


def write_feats_zip(path: str, features: Dict[str, np.ndarray]) -> None:
    """One float16 .npy per video inside a zip (reference feats.zip layout)."""
    with zipfile.ZipFile(path, "w") as zf:
        for vid, feats in features.items():
            buf = io.BytesIO()
            np.save(buf, feats.astype(np.float16))
            zf.writestr(f"{vid}.npy", buf.getvalue())


def read_feats_zip(path: str) -> Dict[str, np.ndarray]:
    out = {}
    with zipfile.ZipFile(path, "r") as zf:
        for name in zf.namelist():
            vid = name.rsplit(".", 1)[0]
            out[vid] = np.load(io.BytesIO(zf.read(name))).astype(np.float32)
    return out


def extract_clip_features(
    videos: Iterable[Tuple[str, Sequence]],
    extractor: ClipFeatureExtractor,
    out_path: str,
    process_index: int = 0,
    process_count: int = 1,
) -> str:
    """Shard videos across processes, extract, write `<out>.shard{K}` zips
    (or `out_path` directly in single-process runs)."""
    from vsc22_tpu.pipelines.ref_extract import shard_videos

    videos = list(videos)
    mine = set(shard_videos([v for v, _ in videos], process_index, process_count))
    features = {}
    for vid, frames in videos:
        if vid not in mine or not len(frames):
            continue
        features[vid] = extractor.extract(frames)
    path = out_path if process_count == 1 else f"{out_path}.shard{process_index}"
    write_feats_zip(path, features)
    return path
