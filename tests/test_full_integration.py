"""Full descriptor-track integration: extraction -> fusion -> eval.

The BASELINE.json "CPU smoke" configuration: synthetic videos where query
videos embed exact frame copies of reference videos; an untrained tiny
backbone maps identical frames to identical descriptors, so the end-to-end
pipeline (extract both sides -> ensemble PCA -> score-norm -> global-k
search -> TN localization -> µAP) must retrieve the planted pairs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsc22_tpu.core.metrics import average_precision
from vsc22_tpu.core.storage import load_features, store_features
from vsc22_tpu.core.types import CandidatePair, Match, VideoFeature
from vsc22_tpu.models.vit import vit_tiny_test_descriptor
from vsc22_tpu.pipelines import descriptor_eval
from vsc22_tpu.pipelines.ensemble import apply_ensemble_pca, fit_ensemble_pca
from vsc22_tpu.pipelines.query_extract import DescriptorExtractor, QueryPipeline
from vsc22_tpu.pipelines.ref_extract import extract_shard


def make_video(rng, n_frames, h=96, w=128):
    return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(n_frames)]


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("full")
    rng = np.random.default_rng(0)

    ref_videos = [(f"R{i:06d}", make_video(rng, 12)) for i in range(6)]
    noise_videos = [(f"R{900 + i:06d}", make_video(rng, 10)) for i in range(6)]
    query_videos = []
    gt = []
    for i in range(5):
        frames = make_video(rng, 10)
        if i < 3:
            # Frames 3..8 are exact copies of ref i frames 2..7.
            frames[3:9] = [f.copy() for f in ref_videos[i][1][2:8]]
            gt.append(
                Match(
                    query_id=f"Q{i:06d}",
                    ref_id=f"R{i:06d}",
                    score=1.0,
                    query_start=3.0,
                    query_end=9.0,
                    ref_start=2.0,
                    ref_end=8.0,
                )
            )
        query_videos.append((f"Q{i:06d}", frames))

    # Two untrained "ensemble members" (different seeds).
    extractors = []
    for seed in (0, 1):
        model = vit_tiny_test_descriptor()
        params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)), train=False)
        extractors.append(DescriptorExtractor(model=model, params=params, size=64, chunk=8))

    # Reference side: per-model extraction (no FSD on refs) + PCA fusion.
    ref_feats_per_model = [extract_shard(ref_videos, e) for e in extractors]
    noise_per_model = [extract_shard(noise_videos, e) for e in extractors]
    pca = fit_ensemble_pca(ref_feats_per_model, n_components=16)
    fused_refs = apply_ensemble_pca(ref_feats_per_model, pca)
    fused_noise = apply_ensemble_pca(noise_per_model, pca)

    # Query side: the flagship pipeline (FSD on, dedup on, same PCA).
    qpipe = QueryPipeline(extractors, pca=pca, use_fsd=True)
    fused_queries = []
    for vid, frames in query_videos:
        feat, _subs = qpipe.process_video(vid, frames)
        fused_queries.append(feat)

    q_path = str(tmp / "queries.npz")
    r_path = str(tmp / "refs.npz")
    n_path = str(tmp / "noise.npz")
    store_features(q_path, fused_queries)
    store_features(r_path, fused_refs)
    store_features(n_path, fused_noise)
    gt_path = str(tmp / "gt.csv")
    Match.write_csv(gt, gt_path)

    result = descriptor_eval.run(
        query_features=q_path,
        ref_features=r_path,
        output_path=str(tmp / "out"),
        score_norm_features=n_path,
        ground_truth=gt_path,
    )
    return result, gt


def test_planted_copies_retrieved(pipeline_run):
    result, gt = pipeline_run
    assert result.candidate_uap is not None
    assert result.candidate_uap > 0.9


def test_segments_localized(pipeline_run):
    result, gt = pipeline_run
    # TN localization on exact copies should land overlapping segments.
    assert result.segment_ap is not None
    assert result.segment_ap > 0.2
    matches = Match.read_csv(result.match_file)
    planted = [m for m in matches if m.query_id == "Q000000" and m.ref_id == "R000000"]
    assert planted
    m = planted[0]
    assert m.query_start < 9 and m.query_end > 3
