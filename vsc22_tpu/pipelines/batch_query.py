"""Batched query descriptor pipeline — the TPU serving layout.

Numerically equivalent to `pipelines.query_extract.QueryPipeline` applied
video-by-video (same constants, VED gate, dedup, placeholder semantics;
reference contract D1/infer/extract_query_feats.py:54-244), but every device
stage runs as large fixed-shape batches ACROSS videos:

  1. host FSD per video (scene splitting may multiply the frame count);
  2. ONE uint8 frame tensor per video ships to the device; resize+normalize
     for every backbone runs on device (data/transforms.resize_normalize) —
     host->device traffic is u8 frames once, not 4x float copies;
  3. CLIP features for VED in cross-video LEN_THRESHOLD chunks, then the
     video-score model over one [V, 256, D] batch;
  4. each ensemble member consumes the concatenated frames of ALL videos in
     fixed 48-frame chunks (per-frame outputs are independent, so chunks
     freely span video boundaries — one compile, zero padding waste);
  5. dedup / PCA / score-norm over the concatenated kept frames.

This is the layout that keeps the MXU busy at serving time: device batches
never depend on per-video frame counts, and each backbone compiles exactly
once for the whole corpus.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsc22_tpu.core.types import VideoFeature
from vsc22_tpu.data import fsd
from vsc22_tpu.data.transforms import (
    clip_preprocess,
    crop_resize_normalize,
    cubic_resize_weights,
    resize_normalize,
)
from vsc22_tpu.ops.pca import PCAModel
from vsc22_tpu.pipelines.query_extract import (
    FRAME_THRESHOLD,
    LEN_THRESHOLD,
    MAX_CLIP_FRAMES,
    SCORE_THRESHOLD,
    near_duplicate_keep_indices,
)


def _l2(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


@dataclasses.dataclass
class BatchedExtractor:
    """One ensemble member running cross-video fixed-shape chunks."""

    model: object
    params: object
    size: int
    preset: str = "vit"
    chunk: int = LEN_THRESHOLD
    timer: object = None

    def __post_init__(self):
        self._fwd = jax.jit(
            lambda params, images: self.model.apply(params, images, train=False)
        )
        if self.timer is None:
            import contextlib

            class _Null:
                def stage(self, name):
                    return contextlib.nullcontext()

            self.timer = _Null()

    def preprocess(self, frames_u8: jax.Array) -> jax.Array:
        """[N, H, W, 3] u8 (device) -> [N, S, S, 3] model dtype (device)."""
        return resize_normalize(
            frames_u8, self.size, self.preset, out_dtype=self.model.dtype
        )

    def extract_dispatch(self, batches: Sequence[jax.Array]) -> jax.Array:
        """Dispatch all chunk forwards; returns the DEVICE output handle."""
        total = sum(int(b.shape[0]) for b in batches)
        with self.timer.stage(f"x{self.size}_dispatch"):
            flat = jnp.concatenate(batches, axis=0) if len(batches) > 1 else batches[0]
            outs = []
            for start in range(0, total, self.chunk):
                block = flat[start : start + self.chunk]
                valid = block.shape[0]
                if valid < self.chunk:
                    block = jnp.concatenate(
                        [block, jnp.zeros((self.chunk - valid,) + block.shape[1:], block.dtype)]
                    )
                outs.append(self._fwd(self.params, block)[:valid])
            return jnp.concatenate(outs, axis=0).astype(jnp.float32)

    def extract_concat(self, batches: Sequence[jax.Array]) -> np.ndarray:
        """Forward pre-processed per-video tensors as cross-video chunks.

        Dispatches stay async; the host pays a single fetch. The serving
        pipeline dispatches EVERY extractor group before fetching any
        (BatchedQueryPipeline._extract_finish) so the device queue never
        drains between groups."""
        dev_out = self.extract_dispatch(batches)
        with self.timer.stage(f"x{self.size}_fetch"):
            return np.asarray(dev_out, np.float32)


@dataclasses.dataclass
class _ScannedEnsemble:
    """k same-architecture ensemble members in ONE compiled program.

    Params stack on a leading axis and a `lax.scan` applies the shared
    module per member inside a single jit — one dispatch chain per chunk
    instead of k (each dispatch pays ~10-30 ms through a relay-attached
    chip), with the Pallas block kernels still seeing unbatched shapes.
    """

    model: object
    params_stack: object
    chunk: int
    timer: object
    size: int
    preset: str
    unroll: bool = False  # True: Python-unroll members inside the jit —
    # no per-iteration dynamic param slicing (the scan's stacked-weight
    # gather measured ~12% on the 3-member SwinV2 ensemble), at the cost
    # of a k-times-larger program to compile (one-time; cache-persisted).

    def __post_init__(self):
        if self.unroll:
            k = len(jax.tree.leaves(self.params_stack)[0])

            def fwd(stack, images):
                return jnp.stack(
                    [
                        self.model.apply(
                            jax.tree.map(lambda x: x[i], stack), images,
                            train=False,
                        )
                        for i in range(k)
                    ]
                )

        else:
            def fwd(stack, images):
                def body(carry, p):
                    return carry, self.model.apply(p, images, train=False)

                return jax.lax.scan(body, None, stack)[1]

        self._fwd = jax.jit(fwd)

    def extract_dispatch(self, batches: Sequence[jax.Array]) -> jax.Array:
        """Dispatch all members' chunk forwards; DEVICE handle [k, total, D]."""
        total = sum(int(b.shape[0]) for b in batches)
        with self.timer.stage(f"x{self.size}_dispatch"):
            flat = jnp.concatenate(batches, axis=0) if len(batches) > 1 else batches[0]
            outs = []
            for start in range(0, total, self.chunk):
                block = flat[start : start + self.chunk]
                valid = block.shape[0]
                if valid < self.chunk:
                    block = jnp.concatenate(
                        [block, jnp.zeros((self.chunk - valid,) + block.shape[1:], block.dtype)]
                    )
                outs.append(self._fwd(self.params_stack, block)[:, :valid])
            return jnp.concatenate(outs, axis=1).astype(jnp.float32)

    def extract_concat_multi(self, batches: Sequence[jax.Array]) -> np.ndarray:
        """[k, total, D] float32 for all members at once."""
        dev_out = self.extract_dispatch(batches)
        with self.timer.stage(f"x{self.size}_fetch"):
            return np.asarray(dev_out, np.float32)


@dataclasses.dataclass
class BatchedVED:
    """CLIP + video-score model over all videos at once."""

    clip_model: object
    clip_params: object
    vsm_model: object
    vsm_params: object
    max_frames: int = MAX_CLIP_FRAMES
    chunk: int = LEN_THRESHOLD

    def __post_init__(self):
        self._clip_fwd = jax.jit(lambda p, im: self.clip_model.apply(p, im)[:, 0])
        # CLIP features NEVER round-trip to the host: the flat [N, D] CLS
        # features scatter into the [V, max_frames, D] VSM input on device
        # (the old host pad cost a fetch + re-upload of ~8 MB per batch —
        # ~0.4 s through the relay); only the [V] probabilities are fetched.
        self._vsm_fwd = jax.jit(
            lambda p, flat, vid_idx, frame_idx, v: jax.nn.sigmoid(
                self.vsm_model.apply(
                    p,
                    jnp.zeros(
                        (v, self.max_frames, flat.shape[1]), jnp.float32
                    ).at[vid_idx, frame_idx].set(flat.astype(jnp.float32)),
                    train=False,
                )
            ),
            static_argnames=("v",),
        )

    def scores_async(self, per_video_u8: Sequence[jax.Array]) -> jax.Array:
        """Dispatch the whole CLIP+VSM chain; returns DEVICE probabilities.

        No host sync happens here — the caller can queue further device
        work (e.g. the FSD map programs) behind the dispatches and pay one
        merged wait instead of two sequential relay stalls."""
        size = self.clip_model.cfg.img_size
        # Shape-grouped preprocess: videos sharing [N, H, W] resize in ONE
        # dispatch (a [V*N, H, W, 3] flatten), not one per video.
        by_shape: Dict[Tuple, List[int]] = {}
        for i, v in enumerate(per_video_u8):
            by_shape.setdefault(tuple(v.shape), []).append(i)
        pre: List[Optional[jax.Array]] = [None] * len(per_video_u8)
        for shape, idxs in by_shape.items():
            n = min(int(shape[0]), self.max_frames)
            stack = jnp.stack([per_video_u8[i][: self.max_frames] for i in idxs])
            flat = clip_preprocess(
                stack.reshape((-1,) + stack.shape[2:]), size,
                out_dtype=self.clip_model.dtype,
            )
            blocks = flat.reshape((len(idxs), n) + flat.shape[1:])
            for j, i in enumerate(idxs):
                pre[i] = blocks[j]
        counts = [int(p.shape[0]) for p in pre]
        flat = jnp.concatenate(pre, axis=0)
        feats = []
        for start in range(0, flat.shape[0], self.chunk):
            block = flat[start : start + self.chunk]
            valid = block.shape[0]
            if valid < self.chunk:
                block = jnp.concatenate(
                    [block, jnp.zeros((self.chunk - valid,) + block.shape[1:], block.dtype)]
                )
            feats.append(self._clip_fwd(self.clip_params, block)[:valid])
        feats_dev = jnp.concatenate(feats, axis=0)
        vid_idx = np.repeat(np.arange(len(counts), dtype=np.int32), counts)
        frame_idx = np.concatenate(
            [np.arange(c, dtype=np.int32) for c in counts]
        )
        return self._vsm_fwd(
            self.vsm_params,
            feats_dev,
            jnp.asarray(vid_idx),
            jnp.asarray(frame_idx),
            v=len(counts),
        )

    def scores(self, per_video_u8: Sequence[jax.Array]) -> List[float]:
        probs = np.asarray(self.scores_async(per_video_u8))
        return [float(p) for p in probs.reshape(-1)]


class BatchedQueryPipeline:
    """Multi-video batched orchestration of the full query descriptor path."""

    def __init__(
        self,
        extractors: Sequence[BatchedExtractor],
        pca: Optional[PCAModel] = None,
        ved: Optional[BatchedVED] = None,
        use_fsd: bool = True,
        use_device_fsd_maps: bool = True,
        score_threshold: float = SCORE_THRESHOLD,
        frame_threshold: float = FRAME_THRESHOLD,
        out_dim: int = 512,
        timer=None,  # optional utils.observability.StageTimer
        ensemble_unroll: bool = False,
    ):
        self.extractors = list(extractors)
        self.pca = pca
        self.ved = ved
        self.use_fsd = use_fsd
        self.use_device_fsd_maps = use_device_fsd_maps
        self.score_threshold = score_threshold
        self.frame_threshold = frame_threshold
        self.out_dim = out_dim
        self.rnd_idx = 0
        self.video_scores: Dict[str, float] = {}
        if timer is None:
            import contextlib

            class _Null:
                def stage(self, name):
                    return contextlib.nullcontext()

            timer = _Null()
        self.timer = timer
        for ext in self.extractors:
            ext.timer = timer
        self._weight_cache: Dict[Tuple[int, int, int, int], jax.Array] = {}

        # Group consecutive identical-architecture extractors (the three
        # SwinV2 members) into one scanned-ensemble program each.
        self._groups: List[Tuple[List[BatchedExtractor], Optional[_ScannedEnsemble]]] = []
        i = 0
        while i < len(self.extractors):
            j = i + 1
            while (
                j < len(self.extractors)
                and self.extractors[j].model == self.extractors[i].model
                and self.extractors[j].size == self.extractors[i].size
                and self.extractors[j].preset == self.extractors[i].preset
                and self.extractors[j].chunk == self.extractors[i].chunk
            ):
                j += 1
            group = self.extractors[i:j]
            ensemble = None
            if len(group) > 1:
                stack = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *[e.params for e in group]
                )
                ensemble = _ScannedEnsemble(
                    model=group[0].model, params_stack=stack,
                    chunk=group[0].chunk, timer=timer,
                    size=group[0].size, preset=group[0].preset,
                    unroll=ensemble_unroll,
                )
            self._groups.append((group, ensemble))
            i = j

    def _weights(self, in_size: int, out_size: int, start: int, stop: int) -> jax.Array:
        """Device-cached cubic crop-resize weight matrix."""
        key = (in_size, out_size, start, stop)
        w = self._weight_cache.get(key)
        if w is None:
            w = jnp.asarray(cubic_resize_weights(in_size, out_size, start, stop))
            self._weight_cache[key] = w
        return w

    def process_batch(
        self,
        names: Sequence[str],
        videos_u8: Sequence[np.ndarray],  # per video [N_i, H_i, W_i, 3] uint8
        timestamps: Optional[Sequence[Sequence[float]]] = None,
        device_videos: Optional[Sequence[jax.Array]] = None,
    ) -> List[VideoFeature]:
        """Returns one fused 512-d VideoFeature per video.

        `device_videos` may carry already device-resident u8 copies (e.g.
        pre-staged by an async feeder); frames then never re-ship and never
        round-trip back to the host unless FSD finds scene splits.
        """
        return self._extract_finish(
            self._prepare(names, videos_u8, timestamps, device_videos)
        )

    def process_many(
        self,
        names: Sequence[str],
        videos_u8: Sequence[np.ndarray],
        batch: int = 8,
        device_videos: Optional[Sequence[jax.Array]] = None,
    ) -> List[VideoFeature]:
        """Pipelined multi-batch processing.

        The device queue must never drain between batches:

          - batch i+1's gating dispatches (CLIP+VSM chain, FSD map
            programs) enter the queue on the main thread BEFORE batch i's
            extraction fetch blocks, so the chip rolls straight from batch
            i's extraction into batch i+1's gating;
          - the gating FETCH + host cut decisions run on a worker thread
            under batch i's extraction fetch (relay I/O releases the GIL);
          - batch i's host postprocessing (near-dup dedup + PCA, ~0.1-0.5 s
            of single-core numpy) happens only AFTER batch i+1's extraction
            has been dispatched — the chip crunches extraction i+1 under
            the host's dedup/PCA of batch i instead of idling.
        """
        from concurrent.futures import ThreadPoolExecutor

        spans = [
            (lo, min(lo + batch, len(names))) for lo in range(0, len(names), batch)
        ]

        def dispatch(span):
            lo, hi = span
            return self._prepare_dispatch(
                names[lo:hi],
                videos_u8[lo:hi],
                None,
                device_videos[lo:hi] if device_videos is not None else None,
            )

        out: List[VideoFeature] = []
        with ThreadPoolExecutor(max_workers=1) as pool:
            ctx = self._prepare_finish(dispatch(spans[0]))
            pending = self._extract_dispatch_phase(ctx)
            for i in range(len(spans)):
                fut = None
                if i + 1 < len(spans):
                    fut = pool.submit(self._prepare_finish, dispatch(spans[i + 1]))
                fetched = self._extract_fetch(pending)
                next_ctx = next_pending = None
                if fut is not None:
                    next_ctx = fut.result()
                    next_pending = self._extract_dispatch_phase(next_ctx)
                out.extend(self._finalize(ctx, pending, fetched))
                ctx, pending = next_ctx, next_pending
        return out

    def _prepare(self, names, videos_u8, timestamps=None, device_videos=None):
        return self._prepare_finish(
            self._prepare_dispatch(names, videos_u8, timestamps, device_videos)
        )

    def _prepare_dispatch(self, names, videos_u8, timestamps=None, device_videos=None):
        """Device-dispatch half of batch preparation: NO host sync.

        Ships frames (unless pre-staged) and enqueues the CLIP+VSM chain
        and the FSD map programs; everything a later batch needs in the
        device queue before the current batch's extraction fetch blocks.
        """
        if timestamps is None:
            timestamps = [list(range(len(v))) for v in videos_u8]

        # Stage 0: ship raw u8 frames once (unless pre-staged).
        if device_videos is None:
            device_videos = [jnp.asarray(np.asarray(v, np.uint8)) for v in videos_u8]

        # Stage 1+2 dispatch: the CLIP+VSM chain AND the FSD map programs
        # all enter the device queue before the first host sync — one merged
        # relay wait instead of sequential per-stage stalls. FSD maps are
        # dispatched for every video (the VED score gate is applied after
        # the probabilities arrive; map work for the rare gated-out video is
        # wasted device time but never blocks the host).
        probs_dev = None
        with self.timer.stage("ved_dispatch"):
            if self.ved is not None:
                probs_dev = self.ved.scores_async(device_videos)
        handles = []
        if self.use_fsd and self.use_device_fsd_maps:
            by_shape: Dict[Tuple, List[int]] = {}
            for i, vid_dev in enumerate(device_videos):
                by_shape.setdefault(tuple(vid_dev.shape), []).append(i)
            with self.timer.stage("fsd_maps_dispatch"):
                for shape, idxs in by_shape.items():
                    stack = jnp.stack([device_videos[i] for i in idxs])
                    maps_dev, pack_dev, dims = fsd.batch_maps_profiles_dispatch(
                        stack
                    )
                    handles.append((shape, idxs, maps_dev, pack_dev, dims))
        return dict(
            names=names,
            videos_u8=videos_u8,
            timestamps=timestamps,
            device_videos=device_videos,
            probs_dev=probs_dev,
            handles=handles,
        )

    def _prepare_finish(self, disp):
        """Host half: merged gating fetch + FSD cut decisions."""
        names = disp["names"]
        videos_u8 = disp["videos_u8"]
        timestamps = disp["timestamps"]
        device_videos = disp["device_videos"]
        probs_dev = disp["probs_dev"]
        handles = disp["handles"]

        # One merged fetch: VED probabilities + every group's profile pack
        # come back in a single relay round trip (~25 ms floor per sync).
        packs_np: List[Optional[np.ndarray]] = [None] * len(handles)
        with self.timer.stage("ved"):
            parts = [] if probs_dev is None else [probs_dev.reshape(-1)]
            for _, _, _, pack_dev, _ in handles:
                parts.append(pack_dev.reshape(-1))
            if parts:
                flat = np.asarray(
                    jnp.concatenate(parts) if len(parts) > 1 else parts[0],
                    np.float32,
                )
            cursor = 0
            if probs_dev is not None:
                scores = [float(p) for p in flat[: len(device_videos)]]
                cursor = len(device_videos)
            else:
                scores = [1.0] * len(device_videos)
            for gi, (_, _, _, pack_dev, _) in enumerate(handles):
                size = int(np.prod(pack_dev.shape))
                packs_np[gi] = flat[cursor : cursor + size].reshape(pack_dev.shape)
                cursor += size
        for name, s in zip(names, scores):
            self.video_scores[name] = s

        # Stage 2: FSD cut decisions — only the ~3 KB/video level-0
        # profiles are fetched; the full 2-D maps (~0.9 MB/video through
        # the relay) ship only for videos the profile screen flags as
        # possibly edited. Each edited video becomes a list of
        # constant-shape sub-streams.
        proc: List[Optional[List[jax.Array]]] = []
        frame_counts: List[int] = []
        full_ts: List[np.ndarray] = []
        edited_idx: List[int] = []
        fsd_cm = self.timer.stage("fsd")
        fsd_cm.__enter__()
        batch_maps: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        screened_plain: set = set()
        if handles:
            with self.timer.stage("fsd_screen"):
                handles = [
                    (shape, idxs, maps_dev, fsd.unpack_profiles(
                        packs_np[gi], *dims))
                    for gi, (shape, idxs, maps_dev, pack_dev, dims)
                    in enumerate(handles)
                ]
                for shape, idxs, maps_dev, profs in handles:
                    n_f, h, w = shape[0], shape[1], shape[2]
                    flagged: List[int] = []
                    for j, i in enumerate(idxs):
                        if scores[i] < self.score_threshold:
                            continue  # placeholder video: no boxes needed
                        boxes0 = None
                        try:
                            boxes0 = fsd.level0_boxes_from_profiles(
                                profs[j], h, w, n_f
                            )
                        except Exception:
                            boxes0 = None
                        if boxes0 is not None:
                            # Screen only ever decides "no edit" (the full
                            # box); any cut goes through the map path.
                            screened_plain.add(i)
                        else:
                            flagged.append(j)
                    if flagged:
                        v = len(idxs)
                        sel = jnp.asarray(
                            [j for j in flagged] + [v + j for j in flagged]
                        )
                        fetched = np.asarray(
                            jnp.take(maps_dev, sel, axis=0), np.float32
                        )
                        k = len(flagged)
                        for t, j in enumerate(flagged):
                            batch_maps[idxs[j]] = (fetched[t], fetched[k + t])
        for i, (vid_dev, ts) in enumerate(zip(device_videos, timestamps)):
            if scores[i] < self.score_threshold:
                proc.append(None)
                frame_counts.append(0)
                full_ts.append(np.zeros((0,)))
                continue
            edited_idx.append(i)
            n_in = int(vid_dev.shape[0])
            h, w = int(vid_dev.shape[1]), int(vid_dev.shape[2])
            boxes = [(0, h, 0, w)]
            if self.use_fsd and i not in screened_plain:
                try:
                    changed, fsd_boxes = fsd.image_process_boxes(
                        videos_u8[i],
                        use_device_maps=self.use_device_fsd_maps,
                        device_frames=(
                            vid_dev
                            if self.use_device_fsd_maps and i not in batch_maps
                            else None
                        ),
                        precomputed_maps=batch_maps.get(i),
                    )
                    if changed:
                        boxes = fsd_boxes
                except Exception:
                    pass  # reference robustness contract: fall back to raw
            proc.append([(i, box) for box in boxes])
            frame_counts.append(n_in * len(boxes))
            full_ts.append(np.array(list(ts) * len(boxes)))
        fsd_cm.__exit__(None, None, None)
        return dict(
            names=names,
            scores=scores,
            proc=proc,
            frame_counts=frame_counts,
            full_ts=full_ts,
            edited_idx=edited_idx,
            device_videos=device_videos,
        )

    def _extract_finish(self, ctx) -> List[VideoFeature]:
        pending = self._extract_dispatch_phase(ctx)
        fetched = self._extract_fetch(pending)
        return self._finalize(ctx, pending, fetched)

    def _extract_dispatch_phase(self, ctx):
        """Stage 3 dispatch: ensemble extraction, cross-video chunks per
        model — NO host sync. Each stream is (video, crop box): crop+resize
        runs on device as a shape-static weight-matrix einsum against the
        ORIGINAL frames — one compiled program per (frame shape, output
        size) no matter how FSD cuts, and no host crop materialization.
        Extractors sharing a (size, preset) — the three SwinV2 members —
        share the pass. Every group's preprocessing + chunk forwards enter
        the device queue at once."""
        proc = ctx["proc"]
        edited_idx = ctx["edited_idx"]
        device_videos = ctx["device_videos"]
        edited = [s for i in edited_idx for s in proc[i]]
        pending = []
        if not edited:
            return pending
        pre_cache: Dict[Tuple, List[jax.Array]] = {}
        for group, ensemble in self._groups:
            ext = group[0]
            key = (ext.size, ext.preset, str(ext.model.dtype))
            with self.timer.stage(f"preprocess_{key[0]}"):
                if key not in pre_cache:
                    pre_cache[key] = [
                        crop_resize_normalize(
                            device_videos[i],
                            self._weights(
                                int(device_videos[i].shape[1]), ext.size,
                                box[0], box[1],
                            ),
                            self._weights(
                                int(device_videos[i].shape[2]), ext.size,
                                box[2], box[3],
                            ),
                            preset=ext.preset,
                            out_dtype=ext.model.dtype,
                        )
                        for (i, box) in edited
                    ]
            target = ensemble if ensemble is not None else ext
            pending.append(
                (group, ensemble, target.extract_dispatch(pre_cache[key]))
            )
        return pending

    def _extract_fetch(self, pending) -> Optional[np.ndarray]:
        """ONE device-side concat + ONE fetch for every group — each relay
        sync costs ~25 ms regardless of size, so all descriptors come back
        in a single round trip. Groups may have heterogeneous descriptor
        dims, so the merge is flat 1-D; _finalize slices each group back
        out by its own element count."""
        if not pending:
            return None
        with self.timer.stage("extract_fetch"):
            flats = [dev_out.reshape(-1) for _, _, dev_out in pending]
            return np.asarray(
                jnp.concatenate(flats) if len(flats) > 1 else flats[0],
                np.float32,
            )

    def _finalize(self, ctx, pending, fetched_flat) -> List[VideoFeature]:
        names = ctx["names"]
        scores = ctx["scores"]
        frame_counts = ctx["frame_counts"]
        full_ts = ctx["full_ts"]

        if pending:
            per_model = []
            cursor = 0
            for group, ensemble, dev_out in pending:
                size = int(np.prod(dev_out.shape))
                block = fetched_flat[cursor : cursor + size].reshape(
                    -1, dev_out.shape[-1]
                )
                cursor += size
                if ensemble is None:
                    per_model.append(_l2(block))
                else:
                    rows = block.shape[0] // len(group)
                    per_model.extend(
                        _l2(block[t * rows : (t + 1) * rows])
                        for t in range(len(group))
                    )
            concat = np.concatenate(per_model, axis=1)  # [sum frames, 2048]
        else:
            concat = np.zeros((0, 512 * len(self.extractors)), np.float32)

        # Stage 4/5: per-video dedup + PCA; placeholders for unedited.
        dedup_cm = self.timer.stage("dedup_pca")
        dedup_cm.__enter__()
        out: List[VideoFeature] = []
        cursor = 0
        for i, name in enumerate(names):
            if scores[i] < self.score_threshold:
                self.rnd_idx += 1
                np.random.seed(self.rnd_idx)
                vec = np.random.uniform(-1e-5, 1e-5, size=self.out_dim).astype(np.float32)
                out.append(
                    VideoFeature(
                        video_id=name,
                        timestamps=np.array([0, 1])[None, ...],
                        feature=vec[None, ...],
                    )
                )
                continue
            n = frame_counts[i]
            feats = concat[cursor : cursor + n]
            cursor += n
            keep = near_duplicate_keep_indices(feats, self.frame_threshold)
            kept = feats[keep]
            if self.pca is not None:
                kept = self.pca.transform(kept).astype(np.float32)
            out.append(
                VideoFeature(
                    video_id=name, timestamps=full_ts[i][keep], feature=kept
                )
            )
        dedup_cm.__exit__(None, None, None)
        return out
