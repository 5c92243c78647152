"""Flagship query feature-extraction pipeline (decode -> FSD -> ensemble ->
dedup -> PCA -> score-norm).

Parity target (reference, for cross-checking — original implementation):
  D1/infer/extract_query_feats.py:54-244:
  - constants SCORE_THRESHOLD=0.001, LEN_THRESHOLD=48, FRAME_THRESHOLD=0.975,
    NK=1, BETA=1.2;
  - VED gate: CLIP CLS feats (<=256 frames, zero-padded) -> video-score
    model -> sigmoid; videos under threshold emit a deterministic random
    512-d vector ~U(+-1e-5) seeded by their ordinal (np.random.seed(rnd_idx))
    with timestamps [[0, 1]];
  - 4-model ensemble: per-model 48-frame micro-batches -> L2-normalize ->
    concat 2048-d; FSD may multiply the frame count (timestamps repeat);
  - greedy near-duplicate frame removal on self-similarity > 0.975;
  - PCA(512) transform; query_score_normalize against the noise refs.

TPU design: each backbone runs fixed-shape [48, S, S, 3] micro-batches (one
compile per model); transforms are fused device programs; dedup/self-sim is
one small GEMM. Multi-video batching across the mesh comes via
`pipelines.ref_extract` (data-axis sharding); this class is the per-video
orchestration used by both tracks.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsc22_tpu.core.types import VideoFeature
from vsc22_tpu.data import fsd
from vsc22_tpu.data.transforms import clip_preprocess_host, resize_normalize_host
from vsc22_tpu.ops.pca import PCAModel

SCORE_THRESHOLD = 0.001
LEN_THRESHOLD = 48
FRAME_THRESHOLD = 0.975
MAX_CLIP_FRAMES = 256
NK = 1
BETA = 1.2


def _l2(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def near_duplicate_keep_indices(
    features: np.ndarray, threshold: float = FRAME_THRESHOLD
) -> List[int]:
    """Greedy near-duplicate frame removal (reference :188-200).

    Anchors are visited in descending mean-similarity order; every frame more
    similar than `threshold` to an anchor is dropped (the anchor survives
    unless it was itself dropped by an earlier anchor).
    """
    feat = _l2(features)
    sim = feat @ feat.T - np.eye(len(feat))
    sim_mean = sim.mean(0)
    removed = np.zeros(len(feat), bool)
    for i in sim_mean.argsort()[::-1]:
        if removed[i]:
            continue
        removed |= sim[i] > threshold
    return [int(i) for i in np.flatnonzero(~removed)]


@dataclasses.dataclass
class DescriptorExtractor:
    """One ensemble member: Flax model + params + input preset.

    Frames run in fixed-shape LEN_THRESHOLD micro-batches (zero-padded tail)
    so each model compiles exactly once. With a mesh, the frame axis of each
    micro-batch is sharded over the ``data`` axis — the framework's sequence
    parallelism: a long video's frames spread across chips and the per-frame
    descriptors gather back automatically (SURVEY §2.9's frame-axis plan).
    """

    model: object
    params: object
    size: int
    preset: str = "vit"
    chunk: int = LEN_THRESHOLD
    mesh: object = None

    def __post_init__(self):
        fwd = lambda params, images: self.model.apply(params, images, train=False)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = self.mesh.shape["data"]
            if self.chunk % dp:
                self.chunk = -(-self.chunk // dp) * dp
            self._fwd = jax.jit(
                fwd,
                in_shardings=(None, NamedSharding(self.mesh, P("data"))),
                out_shardings=NamedSharding(self.mesh, P()),
            )
        else:
            self._fwd = jax.jit(fwd)

    def extract(self, frames: Sequence) -> np.ndarray:
        # Frame resolutions vary per video (and FSD scene crops vary within
        # one): resize+normalize on host so the device program stays one
        # fixed [chunk, S, S, 3] shape for the whole corpus.
        resized = np.stack(
            [resize_normalize_host(f, self.size, self.preset) for f in frames]
        )

        outs = []
        for start in range(0, len(resized), self.chunk):
            block = resized[start : start + self.chunk]
            valid = len(block)
            if valid < self.chunk:
                pad = np.zeros((self.chunk - valid,) + block.shape[1:], block.dtype)
                block = np.concatenate([block, pad])
            out = np.asarray(self._fwd(self.params, jnp.asarray(block)), np.float32)
            outs.append(out[:valid])
        return np.concatenate(outs, axis=0)


@dataclasses.dataclass
class VideoEditDetector:
    """VED scorer: CLIP visual CLS features -> video-score model -> sigmoid."""

    clip_model: object
    clip_params: object
    vsm_model: object
    vsm_params: object
    max_frames: int = MAX_CLIP_FRAMES

    def __post_init__(self):
        self._clip_fwd = jax.jit(
            lambda p, im: self.clip_model.apply(p, im)[:, 0]
        )
        self._vsm_fwd = jax.jit(
            lambda p, feats: self.vsm_model.apply(p, feats, train=False)
        )

    def score(self, frames: Sequence) -> float:
        size = self.clip_model.cfg.img_size
        images = jnp.asarray(
            np.stack([clip_preprocess_host(f, size) for f in frames[: self.max_frames]])
        )
        feats = np.asarray(self._clip_fwd(self.clip_params, images), np.float32)
        if len(feats) < self.max_frames:
            feats = np.concatenate(
                [feats, np.zeros((self.max_frames - len(feats), feats.shape[1]), np.float32)]
            )
        logit = np.asarray(self._vsm_fwd(self.vsm_params, feats[None]))
        return float(jax.nn.sigmoid(logit)[0])


class QueryPipeline:
    """Per-video orchestration of the full query descriptor path."""

    def __init__(
        self,
        extractors: Sequence[DescriptorExtractor],
        pca: Optional[PCAModel] = None,
        ved: Optional[VideoEditDetector] = None,
        use_fsd: bool = True,
        score_threshold: float = SCORE_THRESHOLD,
        frame_threshold: float = FRAME_THRESHOLD,
        out_dim: int = 512,
        use_device_fsd_maps: bool = False,
    ):
        self.extractors = list(extractors)
        self.pca = pca
        self.ved = ved
        self.use_fsd = use_fsd
        self.score_threshold = score_threshold
        self.frame_threshold = frame_threshold
        self.out_dim = out_dim
        self.use_device_fsd_maps = use_device_fsd_maps
        self.rnd_idx = 0
        self.video_scores: Dict[str, float] = {}

    def process_video(
        self,
        name: str,
        frames: Sequence,
        timestamps: Optional[Sequence[float]] = None,
    ) -> Tuple[VideoFeature, List[VideoFeature]]:
        """Returns (fused 512-d VideoFeature, per-model sub-features)."""
        if timestamps is None:
            timestamps = list(range(len(frames)))
        timestamps = list(timestamps)

        score = 1.0 if self.ved is None else self.ved.score(frames)
        self.video_scores[name] = score

        proc_frames = list(frames)
        if self.use_fsd:
            _, proc_frames = fsd.image_process(
                proc_frames, use_device_maps=self.use_device_fsd_maps
            )

        sub_feats_raw = [_l2(e.extract(proc_frames)) for e in self.extractors]
        features = np.concatenate(sub_feats_raw, axis=1)

        split_ratio = len(features) // len(frames)
        full_timestamps = np.array(timestamps * split_ratio)

        sub_features = [
            VideoFeature(video_id=name, timestamps=full_timestamps, feature=sf)
            for sf in sub_feats_raw
        ]

        if score >= self.score_threshold:
            keep = near_duplicate_keep_indices(features, self.frame_threshold)
            kept = features[keep]
            if self.pca is not None:
                kept = self.pca.transform(kept).astype(np.float32)
            feat = VideoFeature(
                video_id=name,
                timestamps=full_timestamps[keep],
                feature=kept,
            )
        else:
            # Deterministic placeholder for "unedited" videos (reference
            # :210-219): seeded uniform noise, interval timestamps [[0,1]].
            self.rnd_idx += 1
            np.random.seed(self.rnd_idx)
            random_feature = np.random.uniform(-1e-5, 1e-5, size=self.out_dim).astype(
                np.float32
            )
            feat = VideoFeature(
                video_id=name,
                timestamps=np.array([0, 1])[None, ...],
                feature=random_feature[None, ...],
            )
        return feat, sub_features


def calculate_low_var_dim(score_norm_refs: List[VideoFeature]) -> int:
    """Minimum-variance dimension of the noise corpus (shared query/ref)."""
    stacked = np.concatenate([r.feature for r in score_norm_refs], axis=0)
    return int(stacked.var(axis=0).argmin())
