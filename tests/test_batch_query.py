"""BatchedQueryPipeline equivalence with the per-video QueryPipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Minute-plus on the 1-core CI host: excluded from the default dev loop
# (pytest -m 'not slow and not heavy'); run via the heavy tier.
pytestmark = pytest.mark.heavy
from numpy.testing import assert_allclose

from vsc22_tpu.models.clip import clip_tiny_test
from vsc22_tpu.models.vit import vit_tiny_test_descriptor
from vsc22_tpu.models.vsm import VSMConfig, VideoScoreModel
from vsc22_tpu.ops.pca import pca_fit
from vsc22_tpu.pipelines.batch_query import (
    BatchedExtractor,
    BatchedQueryPipeline,
    BatchedVED,
)
from vsc22_tpu.pipelines.query_extract import (
    DescriptorExtractor,
    QueryPipeline,
    VideoEditDetector,
)


@pytest.fixture(scope="module")
def parts():
    models = []
    for seed in (0, 1):
        model = vit_tiny_test_descriptor()
        params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)), train=False)
        models.append((model, params))
    rng = np.random.default_rng(3)
    pca = pca_fit(rng.standard_normal((100, 32)).astype(np.float32), 8)
    clip_model = clip_tiny_test()
    clip_params = clip_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    vsm_model = VideoScoreModel(
        cfg=VSMConfig(feat_dim=32, hidden=32, layers=1, heads=2, max_frames=8)
    )
    vsm_params = vsm_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 32)), train=False)
    return models, pca, (clip_model, clip_params, vsm_model, vsm_params)


def make_videos(k=3, frames=6, res=(64, 64)):
    rng = np.random.default_rng(7)
    return [
        np.stack([rng.integers(0, 255, (*res, 3), dtype=np.uint8) for _ in range(frames)])
        for _ in range(k)
    ]


def test_batched_matches_per_video(parts):
    models, pca, (cm, cp, vm, vp) = parts
    videos = make_videos()
    names = [f"Q{i:06d}" for i in range(len(videos))]

    seq_pipe = QueryPipeline(
        [DescriptorExtractor(model=m, params=p, size=64, preset="vit", chunk=4)
         for m, p in models],
        pca=pca,
        ved=VideoEditDetector(cm, cp, vm, vp, max_frames=8),
        use_fsd=False,
        score_threshold=0.0,
        out_dim=8,
    )
    bat_pipe = BatchedQueryPipeline(
        [BatchedExtractor(model=m, params=p, size=64, preset="vit", chunk=4)
         for m, p in models],
        pca=pca,
        ved=BatchedVED(cm, cp, vm, vp, max_frames=8, chunk=4),
        use_fsd=False,
        score_threshold=0.0,
        out_dim=8,
    )
    seq = [seq_pipe.process_video(n, list(v))[0] for n, v in zip(names, videos)]
    bat = bat_pipe.process_batch(names, videos)
    assert [f.video_id for f in bat] == names
    for s, b in zip(seq, bat):
        # device resize (jax cubic) vs host resize (cv2 cubic) differ slightly
        assert s.feature.shape == b.feature.shape
        assert_allclose(b.feature, s.feature, atol=0.05)
        cos = np.sum(b.feature * s.feature, axis=1) / (
            np.linalg.norm(b.feature, axis=1) * np.linalg.norm(s.feature, axis=1)
        )
        assert cos.min() > 0.999
        assert_allclose(b.timestamps, s.timestamps)
    for n in names:
        assert abs(seq_pipe.video_scores[n] - bat_pipe.video_scores[n]) < 0.05


def test_batched_placeholder_sequence(parts):
    """Unedited videos get the same deterministic placeholder sequence."""
    models, pca, _ = parts

    bat_pipe = BatchedQueryPipeline(
        [BatchedExtractor(model=m, params=p, size=64, preset="vit", chunk=4)
         for m, p in models],
        pca=pca, ved=None, use_fsd=False, out_dim=8,
    )
    # force gating by monkey-level: threshold above the default 1.0 score
    bat_pipe.score_threshold = 2.0
    videos = make_videos(k=2)
    out = bat_pipe.process_batch(["Q1", "Q2"], videos)
    for i, f in enumerate(out, start=1):
        np.random.seed(i)
        expect = np.random.uniform(-1e-5, 1e-5, size=8).astype(np.float32)
        assert_allclose(f.feature[0], expect)
        assert f.timestamps.shape == (1, 2)


def test_heterogeneous_descriptor_dims(parts):
    """Ensemble members with DIFFERENT output dims (bench --smoke layout:
    16-d ViT + two scanned 8-d swins) survive the merged extract fetch —
    regression for the flat-merge slicing in _extract_finish."""
    from vsc22_tpu.models.swinv2 import SWINV2_TINY_TEST, SwinTransformerV2

    models, pca, (cm, cp, vm, vp) = parts
    vit_m, vit_p = models[0]
    swins = []
    for seed in (5, 6):
        m = SwinTransformerV2(cfg=SWINV2_TINY_TEST)
        p = m.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)), train=False)
        swins.append((m, p))
    extractors = [
        BatchedExtractor(model=vit_m, params=vit_p, size=64, preset="vit", chunk=4)
    ] + [
        BatchedExtractor(model=m, params=p, size=32, preset="vit", chunk=4)
        for m, p in swins
    ]
    feat_dim = 16 + 2 * swins[0][0].cfg.output_dim
    rng = np.random.default_rng(3)
    pca_h = pca_fit(rng.standard_normal((100, feat_dim)).astype(np.float32), 8)
    pipe = BatchedQueryPipeline(
        extractors, pca=pca_h, ved=None, use_fsd=False,
        score_threshold=0.0, out_dim=8,
    )
    assert len(pipe._groups) == 2 and pipe._groups[1][1] is not None  # scanned
    videos = make_videos(k=3)
    names = [f"Q{i:06d}" for i in range(len(videos))]
    out = pipe.process_batch(names, videos)
    assert [f.video_id for f in out] == names
    for f in out:
        assert f.feature.shape[1] == 8
        assert np.isfinite(f.feature).all()
    # per-member concat order: recompute member 0's L2 block independently
    pre = [extractors[0].preprocess(jnp.asarray(v)) for v in videos]
    direct = np.concatenate(
        [np.asarray(extractors[0].extract_dispatch([p]), np.float32) for p in pre]
    )
    direct /= np.maximum(np.linalg.norm(direct, axis=1, keepdims=True), 1e-12)
    merged = np.concatenate([
        np.asarray(
            pipe._groups[0][0][0].extract_dispatch(
                [extractors[0].preprocess(jnp.asarray(v)) for v in videos]
            ),
            np.float32,
        )
    ])
    merged /= np.maximum(np.linalg.norm(merged, axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(direct, merged, atol=1e-5)


def test_process_many_propagates_prep_errors(parts):
    """A failure in the worker-thread prep half surfaces to the caller
    (not swallowed by the pipelined executor)."""
    models, pca, _ = parts
    pipe = BatchedQueryPipeline(
        [BatchedExtractor(model=m, params=p, size=64, preset="vit", chunk=4)
         for m, p in models],
        pca=pca, ved=None, use_fsd=False, out_dim=8,
    )
    videos = make_videos(k=4)
    videos[2] = "not a video"  # poison batch 2 (batch size 1 below)
    with pytest.raises(Exception):
        pipe.process_many([f"Q{i}" for i in range(4)], videos, batch=1)


def test_process_many_matches_process_batch(parts):
    models, pca, (cm, cp, vm, vp) = parts
    videos = make_videos(k=5)
    names = [f"Q{i:06d}" for i in range(len(videos))]

    def build():
        return BatchedQueryPipeline(
            [BatchedExtractor(model=m, params=p, size=64, preset="vit", chunk=4)
             for m, p in models],
            pca=pca,
            ved=BatchedVED(cm, cp, vm, vp, max_frames=8, chunk=4),
            use_fsd=True,
            score_threshold=0.0,
            out_dim=8,
        )

    ref = build().process_batch(names, videos)
    got = build().process_many(names, videos, batch=2)
    assert [v.video_id for v in got] == [v.video_id for v in ref]
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a.feature, b.feature, atol=1e-5)
        np.testing.assert_array_equal(a.timestamps, b.timestamps)


def test_scanned_ensemble_unroll_matches_scan(parts):
    """unroll=True (Python-unrolled members) must return exactly what the
    lax.scan formulation returns, in the same member order."""
    from vsc22_tpu.models.swinv2 import SWINV2_TINY_TEST, SwinTransformerV2
    from vsc22_tpu.pipelines.batch_query import _ScannedEnsemble

    m = SwinTransformerV2(cfg=SWINV2_TINY_TEST)
    ps = [
        m.init(jax.random.PRNGKey(s), jnp.zeros((1, 32, 32, 3)), train=False)
        for s in (11, 12, 13)
    ]
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    rng = np.random.default_rng(9)
    batch = jnp.asarray(rng.standard_normal((5, 32, 32, 3)).astype(np.float32))
    scanned = _ScannedEnsemble(
        model=m, params_stack=stack, chunk=4, timer=None, size=32, preset="vit"
    )
    unrolled = _ScannedEnsemble(
        model=m, params_stack=stack, chunk=4, timer=None, size=32, preset="vit",
        unroll=True,
    )
    # timer=None placeholder: give both the null timer the pipeline installs
    import contextlib

    class _Null:
        def stage(self, name):
            return contextlib.nullcontext()

    scanned.timer = _Null()
    unrolled.timer = _Null()
    a = np.asarray(scanned.extract_dispatch([batch]))
    b = np.asarray(unrolled.extract_dispatch([batch]))
    assert a.shape == b.shape == (3, 5, m.cfg.output_dim)
    np.testing.assert_allclose(a, b, atol=1e-5)
