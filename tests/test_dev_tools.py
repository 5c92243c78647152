"""Tests for pipelines.dev_tools (aux dev-infer utility equivalents)."""

import numpy as np
import pytest

from vsc22_tpu.core.types import VideoFeature
from vsc22_tpu.pipelines import dev_tools


def _vf(vid, n=5, d=8, seed=0):
    rng = np.random.default_rng(seed)
    return VideoFeature(
        video_id=vid,
        timestamps=np.arange(n, dtype=np.float32),
        feature=rng.standard_normal((n, d)).astype(np.float32),
    )


class TestFilterByScore:
    def test_low_score_collapses_to_placeholder(self):
        feats = [_vf("Q000001", seed=1), _vf("Q000002", seed=2)]
        scores = {"Q000001": 0.01, "Q000002": 0.9}
        out = dev_tools.filter_features_by_score(feats, scores, threshold=0.1)
        assert out[0].feature.shape == (1, 8)
        assert np.abs(out[0].feature).max() <= 1e-5
        assert out[0].timestamps.shape[0] == 1
        np.testing.assert_array_equal(out[1].feature, feats[1].feature)

    def test_deterministic(self):
        feats = [_vf("Q000001")]
        scores = {"Q000001": 0.0}
        a = dev_tools.filter_features_by_score(feats, scores)
        b = dev_tools.filter_features_by_score(feats, scores)
        np.testing.assert_array_equal(a[0].feature, b[0].feature)

    def test_missing_score_passes_through(self):
        feats = [_vf("Q000009", seed=9)]
        out = dev_tools.filter_features_by_score(feats, {}, threshold=0.1)
        np.testing.assert_array_equal(out[0].feature, feats[0].feature)


class TestRefineSubimages:
    def test_weighted_average(self):
        vf = _vf("Q000001", n=3, d=4)
        sub = np.stack(
            [np.ones((3, 4), np.float32), 3 * np.ones((3, 4), np.float32)],
            axis=1,
        )  # [frames=3, k=2, D=4]
        # strongly favor the second sub-image
        w = np.zeros((2, 3, 1), np.float32)
        w[1] = 100.0
        out = dev_tools.refine_subimage_features(
            [vf], {"Q000001": sub}, {"Q000001": w}
        )
        assert out[0].feature.shape == (3, 4)
        np.testing.assert_allclose(out[0].feature, 3.0, atol=1e-3)

    def test_equal_weights_is_mean(self):
        vf = _vf("Q000001", n=2, d=4)
        sub = np.stack(
            [np.zeros((2, 4), np.float32), 2 * np.ones((2, 4), np.float32)],
            axis=1,
        )
        w = np.zeros((2, 2, 1), np.float32)
        out = dev_tools.refine_subimage_features(
            [vf], {"Q000001": sub}, {"Q000001": w}
        )
        np.testing.assert_allclose(out[0].feature, 1.0, atol=1e-6)

    def test_stack_mode_repeats_rows(self):
        vf = _vf("Q000001", n=3, d=4)
        sub = np.stack([i * np.ones((3, 4), np.float32) for i in range(2)], axis=1)
        out = dev_tools.refine_subimage_features(
            [vf], {"Q000001": sub}, {}, stack=True
        )
        assert out[0].feature.shape == (6, 4)
        assert out[0].timestamps.shape[0] == 6
        np.testing.assert_allclose(out[0].feature[:3], 0.0)
        np.testing.assert_allclose(out[0].feature[3:], 1.0)

    def test_frame_count_mismatch_raises(self):
        vf = _vf("Q000001", n=3)
        sub = np.zeros((4, 2, 8), np.float32)
        with pytest.raises(ValueError):
            dev_tools.refine_subimage_features([vf], {"Q000001": sub}, {})

    def test_untouched_videos_pass_through(self):
        vf = _vf("Q000002", seed=5)
        out = dev_tools.refine_subimage_features([vf], {}, {})
        np.testing.assert_array_equal(out[0].feature, vf.feature)


class TestDedup:
    def test_duplicates_removed(self):
        base = np.random.default_rng(0).standard_normal((1, 16)).astype(np.float32)
        feat = np.concatenate([base] * 3 + [np.random.default_rng(1).standard_normal((2, 16)).astype(np.float32)])
        vf = VideoFeature(
            video_id="Q000001",
            timestamps=np.arange(5, dtype=np.float32),
            feature=feat,
        )
        out, removed = dev_tools.dedup_video_features([vf], threshold=0.95)
        assert removed == 2
        assert out[0].feature.shape[0] == 3
        assert out[0].timestamps.shape[0] == 3


class TestZipExtraction:
    def test_roundtrip_and_merge(self, tmp_path):
        items = [(f"V{i}", np.full((4, 3), i, np.float32)) for i in range(6)]
        fn = lambda frames: frames.mean(axis=1)
        shards = []
        total = 0
        for rank in range(2):
            p = tmp_path / f"shard{rank}.zip"
            total += dev_tools.extract_features_to_zip(
                items, fn, str(p), process_index=rank, process_count=2
            )
            shards.append(str(p))
        assert total == 6
        merged = tmp_path / "all.zip"
        n = dev_tools.merge_feature_zips(shards, str(merged))
        assert n == 6
        got = dev_tools.read_feature_zip(str(merged), "V3")
        np.testing.assert_allclose(got, np.full((4,), 3, np.float16))
        assert got.dtype == np.float16


class TestOverlayExtraction:
    def test_maps_and_scores_roundtrip(self, tmp_path):
        """extract_overlay_maps writes <vid>_f maps + <vid>_s scores per
        video (reference inference_overlay.py key layout), chunked."""
        items = [
            (f"V{i}", np.full((5, 4, 4, 3), i, np.float32)) for i in range(4)
        ]

        def overlay_fn(frames):
            scores = frames.mean(axis=(1, 2, 3))
            maps = frames[..., 0] * 0.5
            return scores, maps

        shards = []
        total = 0
        for rank in range(2):
            p = tmp_path / f"ov{rank}.zip"
            total += dev_tools.extract_overlay_maps(
                items, overlay_fn, str(p),
                process_index=rank, process_count=2, chunk=2,
            )
            shards.append(str(p))
        assert total == 4
        merged = tmp_path / "ov.zip"
        assert dev_tools.merge_feature_zips(shards, str(merged)) == 8
        import zipfile
        import io
        with zipfile.ZipFile(str(merged)) as zf:
            s = np.load(io.BytesIO(zf.read("V2_s")))
            m = np.load(io.BytesIO(zf.read("V2_f")))
        np.testing.assert_allclose(s, np.full((5,), 2.0))
        np.testing.assert_allclose(m, np.full((5, 4, 4), 1.0))


def test_host_allocator_tune_is_idempotent():
    from vsc22_tpu.utils.hostmem import tune_host_allocator

    first = tune_host_allocator()
    assert tune_host_allocator() == first
    # large alloc/free cycle still works under the tuned allocator
    for _ in range(3):
        a = np.ones((64, 1024, 1024), np.uint8)
        del a
