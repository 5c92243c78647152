"""Export/serialization and CLIP feature extraction tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from vsc22_tpu.models.clip import clip_tiny_test
from vsc22_tpu.models.vit import vit_tiny_test_descriptor
from vsc22_tpu.pipelines.clip_features import (
    ClipFeatureExtractor,
    extract_clip_features,
    read_feats_zip,
    write_feats_zip,
)
from vsc22_tpu.utils.export import export_model, load_exported, load_exported_with_params


class TestExport:
    def test_export_and_reload_matches(self, tmp_path):
        model = vit_tiny_test_descriptor()
        images = jnp.zeros((2, 64, 64, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images, train=False)
        prefix = str(tmp_path / "vit_tiny")
        params_path, export_path = export_model(
            prefix, model, params, (2, 64, 64, 3), jnp.float32
        )

        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        expect = np.asarray(model.apply(params, x, train=False))

        call = load_exported(export_path)
        got = np.asarray(call(params, x))
        assert_allclose(got, expect, atol=1e-5)

        fwd = load_exported_with_params(export_path, params_path, params)
        got2 = np.asarray(fwd(x))
        assert_allclose(got2, expect, atol=1e-5)

    def test_export_shape_mismatch_rejected(self, tmp_path):
        model = vit_tiny_test_descriptor()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)), train=False)
        _, export_path = export_model(
            str(tmp_path / "m"), model, params, (2, 64, 64, 3), jnp.float32
        )
        call = load_exported(export_path)
        with pytest.raises(ValueError):
            call(params, jnp.zeros((3, 64, 64, 3)))


class TestClipFeatures:
    def test_extract_and_zip_roundtrip(self, tmp_path):
        model = clip_tiny_test()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        extractor = ClipFeatureExtractor(model, params, chunk=4)
        rng = np.random.default_rng(0)
        videos = [
            ("Q000000", [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8) for _ in range(6)]),
            ("Q000001", [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8) for _ in range(3)]),
        ]
        path = extract_clip_features(videos, extractor, str(tmp_path / "feats.zip"))
        feats = read_feats_zip(path)
        assert set(feats) == {"Q000000", "Q000001"}
        assert feats["Q000000"].shape == (6, 32)
        assert feats["Q000001"].shape == (3, 32)
        assert np.isfinite(feats["Q000000"]).all()

    def test_chunking_consistent(self):
        """Micro-batched extraction == single-batch extraction."""
        model = clip_tiny_test()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        rng = np.random.default_rng(1)
        frames = [rng.integers(0, 255, (40, 40, 3), dtype=np.uint8) for _ in range(7)]
        a = ClipFeatureExtractor(model, params, chunk=3).extract(frames)
        b = ClipFeatureExtractor(model, params, chunk=16).extract(frames)
        assert_allclose(a, b, atol=1e-4)

    def test_sharded_extraction(self, tmp_path):
        model = clip_tiny_test()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        extractor = ClipFeatureExtractor(model, params, chunk=4)
        rng = np.random.default_rng(2)
        videos = [
            (f"Q{i:06d}", [rng.integers(0, 255, (32, 32, 3), dtype=np.uint8) for _ in range(2)])
            for i in range(4)
        ]
        p0 = extract_clip_features(videos, extractor, str(tmp_path / "f.zip"), 0, 2)
        p1 = extract_clip_features(videos, extractor, str(tmp_path / "f.zip"), 1, 2)
        all_feats = {**read_feats_zip(p0), **read_feats_zip(p1)}
        assert len(all_feats) == 4
