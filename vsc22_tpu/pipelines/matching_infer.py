"""Matching-track end-to-end inference (stages 1-6).

Parity target (reference, for cross-checking — original implementation):
  M1/infer/infer_matching.py:60-293:
  1. descriptors: FSD frame pipeline -> 4-model ensemble -> PCA(512)
     (shared with the descriptor track; no VED gating here);
  2. query score-norm: beta=1.5, nk=10;
  3. recall: all (query,ref) pairs with frame sim > SEARCH_THRESHOLD=-0.1
     (kNN-1024 + exact range fallback), max-aggregated per pair;
  4. classify filter: 160x160 padded sim matrices (+ transpose) -> 2-fold
     MobileNetV3 ensemble softmax; keep pairs with max prob > 0.0005;
  5. SAM refine: 224x224 padded sims -> 2-fold HRNet ensemble x transpose
     TTA -> per-pair probability heatmap;
  6. decode at 3 (threshold, std_ratio) settings, union by max score.

TPU design: stages 4/5 run as fixed-shape device batches; recall is the
sharded GEMM threshold search; only the RANSAC decode stays on host.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsc22_tpu.core.types import VideoFeature
from vsc22_tpu.matching.decode import generate_matching_result
from vsc22_tpu.matching.simmat import (
    DeviceSimBuilder,
    candidate_sim_matrices,
    select_best_split_segment,
)
from vsc22_tpu.retrieval.packed import PackedFeatures
from vsc22_tpu.retrieval.search import SimilaritySearcher, video_pair_max_scores

SEARCH_THRESHOLD = -0.1
MATCH_CLS_THRESHOLD = 0.0005
CLS_RESOLUTION = 160
REFINE_RESOLUTION = 224
DECODE_SETTINGS = ((0.35, 0.5), (0.1, 1.25), (0.001, 2.0))


def _l2(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def recall_candidates(
    sn_queries: List[VideoFeature],
    sn_refs: List[VideoFeature],
    threshold: float = SEARCH_THRESHOLD,
    mesh=None,
) -> List[Tuple[str, str, float]]:
    """Stage 3: every (query, ref) video pair with any frame sim > threshold,
    scored by its max frame similarity, sorted descending.

    Device aggregation path (default when |Q|x|R| fits): the per-frame hit
    list is never needed — only each video pair's max frame sim — so the
    GEMM feeds two on-device segment-max passes and the host fetches just
    the [|Q|, |R|] video-pair matrix (`retrieval.search.video_pair_max_scores`).
    The hit-list path (batched threshold search + compacted host scatter)
    remains for sharded meshes and corpora whose pair matrix would not fit.
    """
    packed_refs = PackedFeatures.from_video_features(sn_refs)
    packed_q = PackedFeatures.from_video_features(sn_queries)
    vq, vr = len(packed_q.video_ids), len(packed_refs.video_ids)
    if mesh is None and vq * vr <= 32 * 1024 * 1024:
        mat = video_pair_max_scores(
            packed_q.features, packed_q.video_idx,
            packed_refs.features, packed_refs.video_idx, vq, vr,
        )
        qi, ri = np.nonzero(mat > threshold)
        s = mat[qi, ri]
        order = np.argsort(-s, kind="stable")
        return [
            (packed_q.video_ids[int(qi[o])], packed_refs.video_ids[int(ri[o])],
             float(s[o]))
            for o in order
        ]
    searcher = SimilaritySearcher(packed_refs.features[: packed_refs.num_rows], mesh=mesh)
    rows, cols, scores = searcher.threshold_search(
        packed_q.features[: packed_q.num_rows], threshold
    )
    if len(cols) == 0:
        return []
    q_vid = packed_q.video_idx[rows].astype(np.int64)
    r_vid = packed_refs.video_idx[cols].astype(np.int64)
    keys = q_vid * len(packed_refs.video_ids) + r_vid
    uniq, inv = np.unique(keys, return_inverse=True)
    best = np.full(uniq.shape[0], -np.inf, np.float64)
    np.maximum.at(best, inv, scores)
    uq, ur = np.divmod(uniq, len(packed_refs.video_ids))
    out = [
        (packed_q.video_ids[int(a)], packed_refs.video_ids[int(b)], float(s))
        for a, b, s in zip(uq, ur, best)
    ]
    out.sort(key=lambda t: -t[2])
    return out


@dataclasses.dataclass
class ClassifyEnsemble:
    """2-fold MobileNetV3 candidate filter over padded sim-matrix images."""

    models: Sequence  # [(model, variables)]
    resolution: int = CLS_RESOLUTION
    batch: int = 256

    def __post_init__(self):
        # Input ships as a single-channel f16 plane (sims live in [-1, 1]:
        # f16 error ~5e-4 there) and is broadcast to the 3 identical
        # channels on DEVICE — 12x less host->device traffic than shipping
        # the replicated f32 image, the dominant cost on relay links. When
        # the folds share one architecture (2x mobilenetv3_small_100), the
        # fold loop runs as a lax.scan over stacked variables inside ONE
        # program per batch.
        def apply_one(model, v, im):
            return jax.nn.softmax(
                model.apply(
                    v,
                    jnp.broadcast_to(
                        im.astype(jnp.float32)[..., None], im.shape + (3,)
                    ),
                    train=False,
                ),
                axis=1,
            )[:, 1]

        models = [m for m, _ in self.models]
        if len(self.models) > 1 and all(m == models[0] for m in models):
            stack = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[v for _, v in self.models]
            )
            model = models[0]

            def fwd(stack, im):
                def body(carry, v):
                    return carry, apply_one(model, v, im)

                return jnp.mean(jax.lax.scan(body, None, stack)[1], axis=0)

            self._scanned = (jax.jit(fwd), stack)
            self._fns = None
        else:
            self._scanned = None
            self._fns = [
                (jax.jit(functools.partial(apply_one, model)), variables)
                for model, variables in self.models
            ]

    def predict(self, sim_mats: Sequence[np.ndarray]) -> np.ndarray:
        if not sim_mats:
            return np.zeros((0,), np.float32)
        n = len(sim_mats)
        probs = np.zeros(n, np.float32)
        # Pad per device batch, never the whole candidate set at once — the
        # recall stage can emit hundreds of thousands of pairs and a full
        # [N, 160, 160] stack would be tens of GB.
        for start in range(0, n, self.batch):
            chunk = sim_mats[start : start + self.batch]
            valid = len(chunk)
            block = np.zeros(
                (self.batch, self.resolution, self.resolution), np.float16
            )
            for j, s in enumerate(chunk):
                h = min(s.shape[0], self.resolution)
                w = min(s.shape[1], self.resolution)
                block[j, :h, :w] = s[:h, :w]
            x = jnp.asarray(block)
            if self._scanned is not None:
                fwd, stack = self._scanned
                preds = np.asarray(fwd(stack, x), np.float32)[:valid]
                probs[start : start + valid] = preds
            else:
                preds = [
                    np.asarray(fn(variables, x))[:valid]
                    for fn, variables in self._fns
                ]
                probs[start : start + valid] = sum(preds) / len(preds)
        return probs

    def predict_device(self, chunks) -> Tuple[np.ndarray, np.ndarray]:
        """Probabilities for `DeviceSimBuilder.images` chunks.

        Each chunk's images join their on-device transposes into one
        forward — the classify model sees both orientations exactly as the
        host path's interleaved (sim, sim.T) stream. All chunks are
        DISPATCHED before any is fetched, so the device queue stays full
        across chunks on relay links. Returns (probs_orig [N],
        probs_transposed [N]) aligned with the input pair order.
        """
        pending = []
        for imgs, _, n in chunks:
            both = jnp.concatenate([imgs, jnp.swapaxes(imgs, 1, 2)], axis=0)
            if self._scanned is not None:
                fwd, stack = self._scanned
                pending.append((fwd(stack, both), None, n))
            else:
                pending.append(
                    (None, [fn(v, both) for fn, v in self._fns], n)
                )
        po, pt = [], []
        for scanned, per_fold, n in pending:
            if scanned is not None:
                p = np.asarray(scanned, np.float32)
            else:
                p = np.mean([np.asarray(x, np.float32) for x in per_fold], axis=0)
            c = p.shape[0] // 2
            po.append(p[:c][:n])
            pt.append(p[c:][:n])
        empty = np.zeros((0,), np.float32)
        return (
            np.concatenate(po) if po else empty,
            np.concatenate(pt) if pt else empty,
        )


@dataclasses.dataclass
class RefineEnsemble:
    """2-fold SAM-HRNet heatmaps with transpose test-time augmentation."""

    models: Sequence  # [(model, variables)]
    resolution: int = REFINE_RESOLUTION
    batch: int = 16

    def __post_init__(self):
        # Single-channel f16 shipping as in ClassifyEnsemble. The whole
        # fold x TTA grid runs as ONE program per batch: the transpose view
        # joins the batch axis on device and, when the folds share one
        # architecture (they do — 2x hrnet_w18), the fold loop is a
        # lax.scan over stacked variables, so a batch costs one dispatch
        # chain instead of folds x 2.
        def apply_one(model, v, im):
            return jax.nn.softmax(
                model.apply(
                    v,
                    jnp.broadcast_to(
                        im.astype(jnp.float32)[..., None], im.shape + (3,)
                    ),
                    train=False,
                ),
                axis=-1,
            )[..., 1]

        models = [m for m, _ in self.models]
        if len(self.models) > 1 and all(m == models[0] for m in models):
            stack = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[v for _, v in self.models]
            )
            model = models[0]

            def fwd(stack, im):
                b = im.shape[0]
                both = jnp.concatenate([im, jnp.swapaxes(im, 1, 2)], axis=0)

                def body(carry, v):
                    return carry, apply_one(model, v, both)

                probs = jax.lax.scan(body, None, stack)[1]  # [k, 2B, H, W]
                # Fold-mean + transpose-TTA merge ON DEVICE: the host only
                # ever consumes the merged map, and fetching [B, H, W]
                # instead of [k, 2B, H, W] cuts the relay traffic 2k x
                # (~13 MB -> 3.2 MB per 16-pair chunk at k=2) — the refine
                # stage's dominant non-compute cost.
                p, pt = probs[:, :b], jnp.swapaxes(probs[:, b:], 2, 3)
                return ((p + pt).mean(axis=0) / 2.0).astype(jnp.float32)

            self._scanned = (jax.jit(fwd), stack)
            self._fns = None
        else:
            self._scanned = None
            self._fns = [
                (jax.jit(functools.partial(apply_one, model)), variables)
                for model, variables in self.models
            ]

    def predict(
        self, meta: Sequence[Tuple[str, str, np.ndarray, np.ndarray]]
    ) -> List[Tuple[str, str, np.ndarray, np.ndarray]]:
        """meta rows: (qid, rid, qfeat, rfeat); returns (qid, rid, prob_map,
        raw_sim) with maps cropped back to the true sim shape."""
        out = []
        for start in range(0, len(meta), self.batch):
            chunk = meta[start : start + self.batch]
            sims = [q @ r.T for _, _, q, r in chunk]
            images = np.zeros(
                (self.batch, self.resolution, self.resolution), np.float16
            )
            for j, s in enumerate(sims):
                h = min(s.shape[0], self.resolution)
                w = min(s.shape[1], self.resolution)
                images[j, :h, :w] = s[:h, :w]
            x = jnp.asarray(images)
            if self._scanned is not None:
                fwd, stack = self._scanned
                acc = np.asarray(fwd(stack, x), np.float32)  # merged [B, H, W]
            else:
                xt = jnp.swapaxes(x, 1, 2)
                acc = None
                for fn, variables in self._fns:
                    p = np.asarray(fn(variables, x))
                    pt = np.swapaxes(np.asarray(fn(variables, xt)), 1, 2)
                    contrib = (p + pt) / 2.0
                    acc = contrib if acc is None else acc + contrib
                acc = acc / len(self._fns)
            for i, (qid, rid, qf, rf) in enumerate(chunk):
                h = min(qf.shape[0], self.resolution)
                w = min(rf.shape[0], self.resolution)
                out.append((qid, rid, acc[i, :h, :w], sims[i][:h, :w]))
        return out

    def predict_device(
        self, builder: "DeviceSimBuilder", pairs: Sequence[Tuple[str, str]]
    ) -> List[Tuple[str, str, np.ndarray, np.ndarray]]:
        """Heatmaps with the sim images built on device (`DeviceSimBuilder`).

        Same fold x TTA program as `predict`, but the [224, 224] inputs
        never exist on the host: the device program gathers the packed
        descriptors, picks the FSD split segment, and pads — the host ships
        only index arrays. Dispatch-all-then-fetch keeps the queue full.
        """
        chunks = builder.images(pairs, self.resolution, chunk=self.batch)
        pending = []
        for imgs, offs, n in chunks:
            if self._scanned is not None:
                fwd, stack = self._scanned
                pending.append((fwd(stack, imgs), None, imgs, offs, n))
            else:
                xt = jnp.swapaxes(imgs, 1, 2)
                per_fold = [
                    (fn(v, imgs), fn(v, xt)) for fn, v in self._fns
                ]
                pending.append((None, per_fold, imgs, offs, n))
        out = []
        idx = 0
        for scanned, per_fold, imgs, offs, n in pending:
            raw = np.asarray(imgs, np.float32)
            if scanned is not None:
                acc = np.asarray(scanned, np.float32)  # merged [B, H, W]
            else:
                acc = None
                for pf, pft in per_fold:
                    contrib = (
                        np.asarray(pf, np.float32)
                        + np.swapaxes(np.asarray(pft, np.float32), 1, 2)
                    ) / 2.0
                    acc = contrib if acc is None else acc + contrib
                acc = acc / len(per_fold)
            chunk_pairs = pairs[idx : idx + n]
            hw = builder.crop_hw(chunk_pairs, self.resolution,
                                 np.asarray(offs)[:n])
            for i, ((qid, rid), (h, w)) in enumerate(zip(chunk_pairs, hw)):
                out.append((qid, rid, acc[i, :h, :w], raw[i, :h, :w]))
            idx += n
        return out


def matching_inference(
    queries: List[VideoFeature],
    refs: List[VideoFeature],
    sn_queries: List[VideoFeature],
    sn_refs: List[VideoFeature],
    query_video_len_map: Dict[str, int],
    classify: ClassifyEnsemble,
    refine: RefineEnsemble,
    cls_threshold: float = MATCH_CLS_THRESHOLD,
    cls_keep_fraction: float = None,
    max_candidates: int = None,
    mesh=None,
    timer=None,
    use_device_sims: bool = None,
) -> List[List]:
    """Stages 3-6. Returns match rows
    [query_id, ref_id, query_start, query_end, ref_start, ref_end, score].

    `cls_keep_fraction` (optional) additionally keeps only the top fraction
    of candidate pairs by classify probability — useful when driving the
    pipeline with an untrained filter (benchmarks), where the probability
    threshold alone has no selectivity; the reference's trained filter
    removes ~95% of recalls (matching PDF §2.2).
    """
    import contextlib

    stage = timer.stage if timer is not None else (lambda _: contextlib.nullcontext())

    with stage("recall"):
        candidates = recall_candidates(sn_queries, sn_refs, mesh=mesh)
        if max_candidates is not None:
            # recall_candidates returns pairs sorted by descending max-frame
            # score; a budget here mirrors sscd_baseline's 25/query
            # truncation for corpora whose score distribution differs from
            # production.
            candidates = candidates[:max_candidates]

    queries_n = [dataclasses.replace(v, feature=_l2(v.feature)) for v in queries]
    refs_n = [dataclasses.replace(v, feature=_l2(v.feature)) for v in refs]
    query_map = {v.video_id: v.feature for v in queries_n}
    ref_map = {v.video_id: v.feature for v in refs_n}

    # Device sim path (default): pack the descriptors once, build every
    # candidate's padded sim image on device. Host fallback covers the
    # degenerate >8-FSD-segments case and explicit opt-out.
    builder = None
    if use_device_sims is not False:
        with stage("pack_descriptors"):
            builder = DeviceSimBuilder(query_map, ref_map, query_video_len_map)
            if not builder.usable():
                builder = None

    # Stage 4: classify filter (sim + transpose per candidate).
    best_prob: Dict[Tuple[str, str], float] = {}
    if builder is not None:
        with stage("classify_simmats"):
            pair_list = [(q, r) for q, r, _ in candidates]
            chunks = builder.images(
                pair_list, classify.resolution, chunk=max(classify.batch // 2, 1)
            )
        with stage("classify_predict"):
            po, pt = classify.predict_device(chunks)
        for (qid, rid, _), p1, p2 in zip(candidates, po, pt):
            key = (qid, rid)
            best_prob[key] = max(best_prob.get(key, 0.0), float(p1), float(p2))
    else:
        with stage("classify_simmats"):
            feats, infos = candidate_sim_matrices(
                query_map, ref_map, candidates, query_video_len_map
            )
        with stage("classify_predict"):
            probs = classify.predict(feats)
        for (qid, rid, _), p in zip(infos, probs):
            key = (qid, rid)
            best_prob[key] = max(best_prob.get(key, 0.0), float(p))
    selected = [(q, r, p) for (q, r), p in best_prob.items() if p > cls_threshold]
    if cls_keep_fraction is not None and selected:
        keep_n = max(1, int(cls_keep_fraction * len(best_prob)))
        selected = sorted(selected, key=lambda t: -t[2])[:keep_n]

    # Stage 5: SAM refinement.
    with stage("refine"):
        if builder is not None:
            refined = refine.predict_device(
                builder, [(qid, rid) for qid, rid, _ in selected]
            )
        else:
            meta = [
                (
                    qid,
                    rid,
                    select_best_split_segment(
                        query_map[qid], ref_map[rid], query_video_len_map[qid]
                    ),
                    ref_map[rid],
                )
                for qid, rid, _ in selected
            ]
            refined = refine.predict(meta)

    # Stage 6: decode at three operating points; union by max score.
    with stage("decode"):
        best: Dict[Tuple, float] = {}
        for threshold, std_ratio in DECODE_SETTINGS:
            for qid, rid, qs, rs, qe, re, score in generate_matching_result(
                refined, threshold=threshold, std_ratio=std_ratio
            ):
                key = (qid, rid, float(qs), float(qe), float(rs), float(re))
                best[key] = max(best.get(key, -np.inf), score)
    return [
        [qid, rid, qs, qe, rs, re, score]
        for (qid, rid, qs, qe, rs, re), score in best.items()
    ]
