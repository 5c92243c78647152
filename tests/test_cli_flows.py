"""CLI flows: query extraction end-to-end with real (tiny) videos, SP mesh."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsc22_tpu.core.storage import load_features, store_features
from vsc22_tpu.core.types import VideoFeature


def write_video(path, n_seconds=4, size=(64, 48), seed=0):
    rng = np.random.default_rng(seed)
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8, size)
    for _ in range(8 * n_seconds):
        w.write(rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8))
    w.release()


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    for i in range(2):
        write_video(d / f"Q{i:06d}.mp4", seed=i)
    return d


def make_noise_refs(tmp_path, dim=16, n=10):
    rng = np.random.default_rng(9)
    refs = [
        VideoFeature(
            video_id=f"R{900 + i:06d}",
            feature=(rng.standard_normal((20, dim)) / np.sqrt(dim)).astype(np.float32),
            timestamps=np.arange(20.0),
        )
        for i in range(n)
    ]
    path = str(tmp_path / "noise.npz")
    store_features(path, refs)
    return path


def test_query_cli_end_to_end(video_dir, tmp_path):
    from vsc22_tpu.ops.pca import pca_fit
    from vsc22_tpu.pipelines import query_cli

    rng = np.random.default_rng(0)
    pca = pca_fit(rng.standard_normal((100, 32)).astype(np.float32), 16)
    pca_path = str(tmp_path / "pca.npz")
    pca.save(pca_path)
    noise_path = make_noise_refs(tmp_path)

    out = query_cli.main(
        [
            "--videos", str(video_dir),
            "--out_dir", str(tmp_path / "out"),
            "--split", "test",
            "--model", "m1:vit_tiny_test:-:64:vit",
            "--model", "m2:vit_tiny_test:-:64:vit",
            "--pca", pca_path,
            "--norm_refs", noise_path,
        ]
    )
    feats = load_features(out)
    assert len(feats) == 2
    # 16-dim PCA, minus the deleted low-variance dim, plus the bias dim.
    assert feats[0].feature.shape[1] == 16
    # Per-model sub-features written in reference layout.
    sub = load_features(str(tmp_path / "out" / "m1" / "test_query.npz"))
    assert len(sub) == 2
    assert sub[0].feature.shape[1] == 16


def test_extractor_sequence_parallel_matches_single(cpu_mesh):
    """Frame-axis (SP) sharded extraction == single-device extraction."""
    from vsc22_tpu.models.vit import vit_tiny_test_descriptor
    from vsc22_tpu.pipelines.query_extract import DescriptorExtractor

    model = vit_tiny_test_descriptor()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 255, (80, 100, 3), dtype=np.uint8) for _ in range(10)]

    single = DescriptorExtractor(model=model, params=params, size=64, chunk=8)
    sharded = DescriptorExtractor(model=model, params=params, size=64, chunk=8, mesh=cpu_mesh)
    a = single.extract(frames)
    b = sharded.extract(frames)
    np.testing.assert_allclose(a, b, atol=1e-4)
    assert sharded.chunk % cpu_mesh.shape["data"] == 0


@pytest.mark.heavy
def test_matching_cli_plumbing(tmp_path):
    """Matching CLI end-to-end with tiny models on planted descriptors."""
    from vsc22_tpu.pipelines import matching_cli

    rng = np.random.default_rng(3)
    dim = 16

    def normed(x):
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)

    refs = [
        VideoFeature(
            video_id=f"R{i:06d}",
            feature=normed(rng.standard_normal((20, dim))),
            timestamps=np.arange(20.0),
        )
        for i in range(5)
    ]
    queries = []
    for i in range(3):
        f = normed(rng.standard_normal((15, dim)))
        if i == 0:
            f[4:12] = refs[0].feature[3:11]
        queries.append(
            VideoFeature(video_id=f"Q{i:06d}", feature=f, timestamps=np.arange(15.0))
        )
    noise = [
        VideoFeature(
            video_id=f"R{900+i:06d}",
            feature=normed(rng.standard_normal((20, dim))),
            timestamps=np.arange(20.0),
        )
        for i in range(5)
    ]
    qp, rp, np_ = tmp_path / "q.npz", tmp_path / "r.npz", tmp_path / "n.npz"
    store_features(str(qp), queries)
    store_features(str(rp), refs)
    store_features(str(np_), noise)
    out = matching_cli.main(
        [
            "--query_features", str(qp),
            "--ref_features", str(rp),
            "--norm_refs", str(np_),
            "--out", str(tmp_path / "matching.csv"),
            "--tiny",
            "--cls_threshold", "0.0",
        ]
    )
    import pandas as pd

    df = pd.read_csv(out)
    assert list(df.columns) == [
        "query_id", "ref_id", "query_start", "query_end", "ref_start", "ref_end", "score",
    ]


def test_ref_cli_end_to_end(video_dir, tmp_path):
    from vsc22_tpu.pipelines import ref_cli

    out = ref_cli.main(
        [
            "--videos", str(video_dir),
            "--out", str(tmp_path / "refs"),
            "--model", "vit_tiny_test:-:64:vit",
        ]
    )
    feats = load_features(out)
    assert len(feats) == 2
    assert all(vf.video_id.startswith("R") for vf in feats)
    assert feats[0].feature.shape[1] == 16
