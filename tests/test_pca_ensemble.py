"""PCA and ensemble-fusion tests (vs sklearn and reference semantics)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from vsc22_tpu.core.types import VideoFeature
from vsc22_tpu.ops.pca import PCAModel, pca_fit
from vsc22_tpu.pipelines.ensemble import (
    apply_ensemble_pca,
    concat_normalized,
    fit_ensemble_pca,
)


def test_pca_matches_sklearn_full():
    from sklearn.decomposition import PCA

    rng = np.random.default_rng(0)
    x = rng.standard_normal((300, 24)).astype(np.float32)
    ours = pca_fit(x, 8)
    theirs = PCA(n_components=8, svd_solver="full").fit(x)
    assert_allclose(ours.mean, theirs.mean_, atol=1e-4)
    # Components may differ in sign convention only if loadings tie; compare
    # absolute values and the projected data up to sign.
    assert_allclose(np.abs(ours.components), np.abs(theirs.components_), atol=2e-3)
    proj_a = ours.transform(x)
    proj_b = theirs.transform(x)
    signs = np.sign((proj_a * proj_b).sum(axis=0))
    assert_allclose(proj_a, proj_b * signs, atol=5e-3)
    assert_allclose(
        ours.explained_variance, theirs.explained_variance_, rtol=1e-3
    )


def test_pca_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((100, 16)).astype(np.float32)
    model = pca_fit(x, 4)
    path = str(tmp_path / "pca.npz")
    model.save(path)
    loaded = PCAModel.load(path)
    assert_allclose(model.transform(x), loaded.transform(x))


def make_model_features(n_models, n_videos, frames, dim, seed):
    rng = np.random.default_rng(seed)
    all_models = []
    for m in range(n_models):
        feats = []
        for v in range(n_videos):
            feats.append(
                VideoFeature(
                    video_id=f"R{v:06d}",
                    feature=rng.standard_normal((frames, dim)).astype(np.float32) * (m + 1),
                    timestamps=np.arange(frames, dtype=np.float32),
                )
            )
        all_models.append(feats)
    return all_models


def test_concat_normalized_shapes_and_norms():
    models = make_model_features(4, 3, 5, 8, seed=0)
    merged = concat_normalized(models)
    assert len(merged) == 3
    assert merged[0].feature.shape == (5, 32)
    # Each 8-dim sub-block is unit norm.
    sub = merged[0].feature[:, :8]
    assert_allclose(np.linalg.norm(sub, axis=1), 1.0, atol=1e-5)


def test_ensemble_pca_pipeline():
    models = make_model_features(4, 6, 10, 8, seed=1)
    pca = fit_ensemble_pca(models, n_components=16)
    out = apply_ensemble_pca(models, pca)
    assert out[0].feature.shape == (10, 16)
    assert out[0].feature.dtype == np.float32
    # Projection preserves inner-product structure of the centered data well
    # enough that self-similarity dominates (sanity, not exactness).
    stacked = np.concatenate([vf.feature for vf in out])
    assert np.isfinite(stacked).all()


def test_ensemble_cli_end_to_end(tmp_path):
    from vsc22_tpu.core.storage import load_features, store_features
    from vsc22_tpu.pipelines import ensemble_cli

    rng = np.random.default_rng(4)
    for split, seed in (("train", 0), ("test", 100)):
        for m in range(2):
            feats = [
                VideoFeature(
                    video_id=f"R{seed + i:06d}",
                    feature=rng.standard_normal((6, 8)).astype(np.float32),
                    timestamps=np.arange(6.0),
                )
                for i in range(5)
            ]
            store_features(str(tmp_path / f"{split}_m{m}.npz"), feats)

    out = ensemble_cli.main(
        [
            "--train_refs", str(tmp_path / "train_m0.npz"), str(tmp_path / "train_m1.npz"),
            "--test_refs", str(tmp_path / "test_m0.npz"), str(tmp_path / "test_m1.npz"),
            "--out_dir", str(tmp_path / "fused"),
            "--components", "8",
        ]
    )
    test_sn = load_features(str(tmp_path / "fused" / "test_refs_sn.npz"))
    assert test_sn[0].feature.shape == (6, 8)  # 8-dim PCA -1 lowvar +1 ones
    np.testing.assert_allclose(test_sn[0].feature[:, -1], 1.0)
    import os
    assert os.path.exists(tmp_path / "fused" / "pca_model.npz")
