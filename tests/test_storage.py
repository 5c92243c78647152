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


def _load_reference_storage():
    """Exec the reference's own vendored vsc/storage.py (faiss-free module;
    only its two intra-package imports are satisfied with local stand-ins
    mirroring vsc/index.py:24-46 and vsc/metrics.py:26-40)."""
    import dataclasses
    import types

    path = (
        "/root/reference/VSC22-Descriptor-Track-1st/infer/vsc/storage.py"
    )
    src = open(path).read()
    src = src.replace("from vsc.index import VideoFeature\n", "")
    src = src.replace("from vsc.metrics import Dataset, format_video_id\n", "")

    @dataclasses.dataclass
    class RefVideoFeature:
        video_id: str
        timestamps: np.ndarray
        feature: np.ndarray

        def __len__(self):
            return self.feature.shape[0]

    def ref_format_video_id(video_id, dataset):
        if isinstance(video_id, (int, np.integer)):
            return f"{dataset.value}{video_id:06d}"
        return str(video_id)

    mod = types.ModuleType("ref_vsc_storage")
    mod.__dict__.update(
        VideoFeature=RefVideoFeature,
        Dataset=None,
        format_video_id=ref_format_video_id,
    )
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def test_cross_compat_with_reference_storage(tmp_path):
    """An npz written by the reference's vendored vsc/storage.py loads into
    identical VideoFeatures here, and vice versa."""
    ref = _load_reference_storage()

    rng = np.random.default_rng(5)
    ref_feats = [
        ref.VideoFeature(
            video_id=f"Q{i:06d}",
            timestamps=np.arange(10 + i, dtype=np.float64),
            feature=rng.standard_normal((10 + i, DIMS)).astype(np.float32),
        )
        for i in range(3)
    ]
    theirs = tmp_path / "ref_written.npz"
    ref.store_features(str(theirs), ref_feats)
    mine = load_features(str(theirs))
    assert [v.video_id for v in mine] == [v.video_id for v in ref_feats]
    for a, b in zip(mine, ref_feats):
        assert_allclose(a.feature, b.feature)
        assert_allclose(a.timestamps, b.timestamps)

    # Reverse direction: our writer -> reference loader.
    ours = tmp_path / "repo_written.npz"
    store_features(
        str(ours),
        [
            VideoFeature(
                video_id=v.video_id, timestamps=v.timestamps, feature=v.feature
            )
            for v in ref_feats
        ],
    )
    back = ref.load_features(str(ours))
    assert [v.video_id for v in back] == [v.video_id for v in ref_feats]
    for a, b in zip(back, ref_feats):
        assert_allclose(a.feature, b.feature)
        assert_allclose(a.timestamps, b.timestamps)
