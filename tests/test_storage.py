"""Storage round-trip conformance (semantics of reference test_storage.py)."""

import tempfile

import numpy as np
import pytest
from numpy.testing import assert_allclose

from vsc22_tpu.core.storage import load_features, store_features
from vsc22_tpu.core.types import Dataset, VideoFeature

DIMS = 32


def fake_vf(video_id, length, fps=1.0, interval=False):
    rng = np.random.default_rng(abs(hash((video_id, length))) % 2**32)
    ts = np.arange(length) / fps
    if interval:
        ts = np.stack([ts, ts + fps], axis=1)
    return VideoFeature(
        video_id=video_id, timestamps=ts, feature=rng.standard_normal((length, DIMS))
    )


@pytest.mark.parametrize("interval", [False, True])
def test_merged_storage_roundtrip(interval):
    features = [
        fake_vf(2, 10, interval=interval),
        fake_vf(3, 20, fps=3.0, interval=interval),
        fake_vf(1, 30, fps=0.5, interval=interval),
    ]
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        store_features(f, features, Dataset.QUERIES)
        f.flush()
        restored = load_features(f.name)

    assert len(restored) == len(features)
    for a, b in zip(features, restored):
        assert b.video_id == f"Q{a.video_id:06d}"
        assert_allclose(b.timestamps, a.timestamps)
        assert_allclose(b.feature, a.feature, rtol=1e-6)

    # String ids round-trip without a dataset.
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        store_features(f, restored)
        f.flush()
        restored2 = load_features(f.name)
    for a, b in zip(restored, restored2):
        assert a.video_id == b.video_id
        assert_allclose(b.timestamps, a.timestamps)
        assert_allclose(b.feature, a.feature)


def test_timestamp_mismatch_rejected():
    with pytest.raises(ValueError):
        VideoFeature(
            video_id="Q000001",
            timestamps=np.arange(3.0),
            feature=np.zeros((4, DIMS), np.float32),
        )


def test_reference_npz_interop(tmp_path):
    """Files we write load with plain numpy using the reference's field names."""
    features = [fake_vf(7, 5)]
    path = tmp_path / "feats.npz"
    store_features(str(path), features, Dataset.REFS)
    data = np.load(path, allow_pickle=False)
    assert set(data.files) == {"video_ids", "features", "timestamps"}
    assert data["features"].dtype == np.float32
    assert (data["video_ids"] == "R000007").all()
