"""CSLS-style score normalization against a noise reference corpus.

Parity targets (reference, for cross-checking — original implementation):
  - score_normalize:        D1/infer/vsc/baseline/score_normalization.py:33-104
  - query_score_normalize:  same file :107-148 (adds VED video-score gating)
  - ref_score_normalize:    same file :150-192

Semantics: each query descriptor gets a bias term
    bias(q) = -beta * mean(top-nk inner-product sims of q to the noise corpus)
encoded as an extra descriptor dimension; references get a constant-1 extra
dimension, so plain inner product realizes sim(q, r) + bias(q). Before that,
the minimum-variance dimension of the noise corpus is deleted from all sets
(keeping D constant) and everything is re-L2-normalized.

TPU-native: the noise-corpus k-NN is the device GEMM searcher; the dimension
surgery and normalization are vectorized over the packed feature matrix.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
from jax.sharding import Mesh

from vsc22_tpu.core.types import VideoFeature
from vsc22_tpu.retrieval.search import SimilaritySearcher


def _l2_normalize(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(norms, eps)


def transform_features(features: List[VideoFeature], transform) -> List[VideoFeature]:
    return [dataclasses.replace(f, feature=transform(f.feature)) for f in features]


def _delete_dim(features: List[VideoFeature], dim: int) -> List[VideoFeature]:
    return transform_features(features, lambda f: np.delete(f, dim, axis=1))


def _repack(features: List[VideoFeature], packed: np.ndarray) -> List[VideoFeature]:
    """Split a packed [sum(N_i), D] matrix back into per-video views."""
    offsets = np.cumsum([len(f.feature) for f in features[:-1]])
    return [
        dataclasses.replace(f, feature=part)
        for f, part in zip(features, np.split(packed, offsets))
    ]


def _prepare(
    features: List[VideoFeature],
    delete_dim: Optional[int],
    l2_normalize: bool,
    append: Optional[np.ndarray] = None,
) -> List[VideoFeature]:
    """delete-dim -> L2 -> optional appended column, on one PACKED matrix.

    The output matrix is allocated exactly once and filled with contiguous
    slice copies; the delete/normalize/append all happen in place. The
    naive form (per-video `np.delete`/normalize/concat, or a packed
    boolean column gather plus two whole-matrix concatenates) costs
    minutes of single-core host time at the 40k-video corpus scale — >10x
    the device work of the whole normalization.
    """
    if not features:
        return []
    d = features[0].feature.shape[1]
    kept = d - (1 if delete_dim is not None else 0)
    extra = append.shape[1] if append is not None else 0
    n_rows = sum(len(f.feature) for f in features)
    out = np.empty((n_rows, kept + extra), features[0].feature.dtype)
    row = 0
    for f in features:
        m = len(f.feature)
        if delete_dim is None:
            out[row : row + m, :d] = f.feature
        else:
            out[row : row + m, :delete_dim] = f.feature[:, :delete_dim]
            out[row : row + m, delete_dim:kept] = f.feature[:, delete_dim + 1 :]
        row += m
    if l2_normalize:
        norms = np.sqrt(
            np.einsum("ij,ij->i", out[:, :kept], out[:, :kept], optimize=True)
        )
        out[:, :kept] /= np.maximum(norms, 1e-12)[:, None]
    if append is not None:
        out[:, kept:] = append
    return _repack(features, out)


def _min_variance_dim(features: List[VideoFeature]) -> int:
    stacked = np.concatenate([f.feature for f in features], axis=0)
    return int(stacked.var(axis=0).argmin())


# Serving calls score-norm once per batch against the SAME noise corpus;
# rebuilding the searcher re-pads and re-uploads the corpus through the
# relay every time (~26 MB / ~0.4 s at the matching track's 400-video
# noise set). Keyed by a content digest of the prepared matrix, so a hit
# is only possible for byte-identical noise — mutation or a different
# corpus simply misses.
_SEARCHER_CACHE: "dict[tuple, SimilaritySearcher]" = {}


def _cached_searcher(noise: np.ndarray, mesh: Optional[Mesh]) -> SimilaritySearcher:
    if mesh is not None:
        return SimilaritySearcher(noise, mesh=mesh)
    import hashlib

    key = (
        noise.shape,
        hashlib.blake2b(np.ascontiguousarray(noise).tobytes(), digest_size=16)
        .hexdigest(),
    )
    searcher = _SEARCHER_CACHE.get(key)
    if searcher is None:
        searcher = SimilaritySearcher(noise)
        _SEARCHER_CACHE[key] = searcher
        while len(_SEARCHER_CACHE) > 4:
            _SEARCHER_CACHE.pop(next(iter(_SEARCHER_CACHE)))
    return searcher


def _noise_bias(
    queries: List[VideoFeature],
    score_norm_refs: List[VideoFeature],
    beta: float,
    nk: int,
    mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """Packed per-query-frame bias [sum(N_i), 1] =
    -beta * mean(top-nk sims to the noise corpus).

    nk=1 (the descriptor-track default) uses the fused Pallas GEMM+row-max
    kernel — the similarity matrix never touches HBM. nk>1 runs one
    batched top-k over EVERY video's frames (a per-video loop costs one
    dispatch+fetch round trip per video, ~0.2 s each through a
    relay-attached chip; the matching track's nk=10 pass covers |Q|+|R|
    videos, so the loop dominated stages 2-6).
    """
    noise = np.concatenate([r.feature for r in score_norm_refs], axis=0)
    all_q = np.concatenate([q.feature for q in queries], axis=0)
    if nk == 1 and mesh is None:
        from vsc22_tpu.ops.pallas_sim import row_max_gemm

        return -beta * row_max_gemm(all_q, noise)[:, None]
    searcher = _cached_searcher(noise, mesh)
    sims, _ = searcher.row_topk(all_q, nk)
    return -beta * sims.mean(axis=1, keepdims=True)


def _check_disjoint(refs: List[VideoFeature], score_norm_refs: List[VideoFeature]):
    if {f.video_id for f in refs} & {f.video_id for f in score_norm_refs}:
        raise ValueError(
            "Score-normalizing against the evaluated reference set is against "
            "VSC rules; an independent noise corpus is required."
        )


def score_normalize(
    queries: List[VideoFeature],
    refs: List[VideoFeature],
    score_norm_refs: List[VideoFeature],
    l2_normalize: bool = True,
    replace_dim: bool = True,
    beta: float = 1.0,
    nk: int = 1,
    mesh: Optional[Mesh] = None,
) -> Tuple[List[VideoFeature], List[VideoFeature]]:
    """Normalize queries and refs together against a noise corpus."""
    _check_disjoint(refs, score_norm_refs)
    low_var_dim = (
        _min_variance_dim(score_norm_refs)
        if score_norm_refs is not None and replace_dim
        else None
    )
    score_norm_refs = _prepare(score_norm_refs, low_var_dim, l2_normalize)
    queries = _prepare(queries, low_var_dim, l2_normalize)
    bias = _noise_bias(queries, score_norm_refs, beta, nk, mesh=mesh)
    adapted_queries = _prepare(queries, None, False, append=bias)
    n_ref_rows = sum(len(r.feature) for r in refs)
    ones = np.ones((n_ref_rows, 1), refs[0].feature.dtype if refs else np.float32)
    adapted_refs = _prepare(refs, low_var_dim, l2_normalize, append=ones)
    return adapted_queries, adapted_refs


def query_score_normalize(
    queries: List[VideoFeature],
    score_norm_refs: List[VideoFeature],
    video_scores: Optional[Dict[str, float]] = None,
    score_threshold: float = 0.001,
    low_var_dim: int = 0,
    l2_normalize: bool = True,
    replace_dim: bool = True,
    beta: float = 1.0,
    nk: int = 1,
    mesh: Optional[Mesh] = None,
) -> List[VideoFeature]:
    """Query-side normalization with optional VED (video-editing-score) gating.

    Queries whose video score is below ``score_threshold`` get bias -100,
    effectively removing all their candidate similarities.
    """
    dim = low_var_dim if score_norm_refs is not None and replace_dim else None
    queries = _prepare(queries, dim, l2_normalize)
    score_norm_refs = _prepare(score_norm_refs, dim, l2_normalize)
    bias = _noise_bias(queries, score_norm_refs, beta, nk, mesh=mesh)
    if video_scores is not None:
        gated = np.repeat(
            np.fromiter(
                (video_scores[q.video_id] < score_threshold for q in queries),
                bool, count=len(queries),
            ),
            [len(q.feature) for q in queries],
        )
        bias = np.where(gated[:, None], -100.0, bias).astype(bias.dtype)
    return _prepare(queries, None, False, append=bias)


def ref_score_normalize(
    refs: List[VideoFeature],
    score_norm_refs: List[VideoFeature],
    l2_normalize: bool = True,
    replace_dim: bool = True,
    beta: float = 1.0,
    nk: int = 1,
) -> List[VideoFeature]:
    """Reference-side normalization: delete noise min-var dim, L2, append 1s."""
    _check_disjoint(refs, score_norm_refs)
    dim = (
        _min_variance_dim(score_norm_refs)
        if score_norm_refs is not None and replace_dim
        else None
    )
    if not refs:
        return []
    n_rows = sum(len(r.feature) for r in refs)
    ones = np.ones((n_rows, 1), refs[0].feature.dtype)
    return _prepare(refs, dim, l2_normalize, append=ones)
