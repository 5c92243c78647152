"""Data layer: native record store, frame store, decode, augs, datasets."""

import time

import numpy as np
import pytest

import cv2

from vsc22_tpu.data import augment
from vsc22_tpu.data.datasets import (
    DataLoader,
    FeatureSequenceDataset,
    FramePairDataset,
    LabeledFramePairDataset,
)
from vsc22_tpu.data.frames import read_frames
from vsc22_tpu.data.store import FrameStore, RecordStore, RecordStoreWriter


class TestRecordStore:
    def test_roundtrip_and_native(self, tmp_path):
        path = str(tmp_path / "test.rec")
        records = [f"record-{i}".encode() * (i + 1) for i in range(50)]
        with RecordStoreWriter(path) as w:
            for r in records:
                w.append(r)
        store = RecordStore(path)
        assert len(store) == 50
        for i, r in enumerate(records):
            assert store[i] == r
        # Native library must have built in this environment (g++ present).
        assert store.using_native

    def test_batch_read_parallel(self, tmp_path):
        path = str(tmp_path / "batch.rec")
        rng = np.random.default_rng(0)
        records = [rng.bytes(int(rng.integers(1, 5000))) for _ in range(200)]
        with RecordStoreWriter(path) as w:
            for r in records:
                w.append(r)
        store = RecordStore(path)
        idxs = rng.permutation(200)[:64]
        out = store.read_batch(idxs, num_threads=4)
        for i, data in zip(idxs, out):
            assert data == records[int(i)]

    def test_out_of_range(self, tmp_path):
        path = str(tmp_path / "oob.rec")
        with RecordStoreWriter(path) as w:
            w.append(b"x")
        store = RecordStore(path)
        with pytest.raises(IndexError):
            store[5]


def make_frame_store(tmp_path, n_videos=3, frames_per_video=6, size=64):
    rng = np.random.default_rng(1)
    videos = []
    for i in range(n_videos):
        prefix = "Q" if i == 0 else "R"
        frames = []
        for _ in range(frames_per_video):
            img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            ok, buf = cv2.imencode(".jpg", img[:, :, ::-1])
            frames.append(buf.tobytes())
        videos.append((f"{prefix}{i:06d}", frames))
    return FrameStore.build(str(tmp_path / "frames.rec"), videos)


class TestFrameStore:
    def test_build_and_read(self, tmp_path):
        store = make_frame_store(tmp_path)
        assert len(store.vids) == 3
        assert store.num_frames("R000001") == 6
        frame = store.get_frame("R000001", 2)
        assert frame.shape == (64, 64, 3)
        assert frame.dtype == np.uint8

    def test_frame_out_of_range(self, tmp_path):
        store = make_frame_store(tmp_path)
        with pytest.raises(IndexError):
            store.get_frame("R000001", 99)


class TestDecode:
    def test_opencv_decode_at_1fps(self, tmp_path):
        path = str(tmp_path / "v.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        for i in range(50):  # 5 seconds at 10 fps
            w.write(np.full((48, 64, 3), i * 5, np.uint8))
        w.release()
        frames = read_frames(path, fps=1.0, backend="opencv")
        assert 4 <= len(frames) <= 6
        assert frames[0].shape == (48, 64, 3)

    def test_missing_file_returns_empty(self):
        assert read_frames("/nonexistent/video.mp4") == []


class TestAugmentations:
    def test_all_ops_preserve_dtype_and_finiteness(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        ops = [
            augment.HorizontalFlip(p=1),
            augment.VerticalFlip(p=1),
            augment.RandomRotate90(p=1),
            augment.RandomResizedCrop(64, 64, p=1),
            augment.RandomScale(p=1),
            augment.Rotate(p=1),
            augment.Perspective(p=1),
            augment.AspectRatio(p=1),
            augment.CropAndPad(p=1),
            augment.GaussNoise(p=1),
            augment.GaussianBlur(p=1),
            augment.ImageCompression(p=1),
            augment.ColorJitter(p=1),
            augment.RandomBrightness(p=1),
            augment.ToGray(p=1),
            augment.HueSaturationValue(p=1),
            augment.RandomBrightnessContrast(p=1),
            augment.RandomSnow(p=1),
            augment.Opacity(p=1),
            augment.OverlayEmoji(p=1),
            augment.SquareEmoji(p=1),
            augment.OverlayText(p=1),
            augment.RandomOverlayCorners(p=1),
        ]
        for op in ops:
            out = op(img.copy(), rng)
            assert out.dtype == np.uint8, type(op).__name__
            assert out.ndim == 3 and out.shape[2] == 3, type(op).__name__

    def test_stack_images_changes_layout(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        src = lambda r: r.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        op = augment.RandomStackImages(frame_source=src, width=64, p=1)
        out = op(img, rng)
        assert out.shape[0] > 64 or out.shape[1] > 64

    def test_overlay_images_blend(self):
        rng = np.random.default_rng(4)
        img = np.zeros((32, 32, 3), np.uint8)
        src = lambda r: np.full((32, 32, 3), 200, np.uint8)
        out = augment.RandomOverlayImages(frame_source=src, p=1)(img, rng)
        assert out.mean() > 10  # blended distractor visible

    def test_pipelines_run(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
        for pipe in augment.build_hard_pipelines(64):
            out = pipe(img, rng)
            assert out.dtype == np.uint8
        assert augment.build_easy_pipeline(64)(img, rng).dtype == np.uint8
        assert augment.build_native_pipeline(64)(img, rng).dtype == np.uint8


class TestDatasets:
    def test_frame_pair_dataset_sample(self, tmp_path):
        store = make_frame_store(tmp_path)
        ds = FramePairDataset(store, width=64, probs=(0.6, 0.4))
        rng = np.random.default_rng(0)
        s = ds.sample(0, rng)
        assert s["img_a"].shape == (64, 64, 3)
        assert s["img_b"].shape == (64, 64, 3)
        assert s["vid_a"] == s["vid_b"]
        assert len(ds) == 18

    def test_labeled_dataset_annotated_pairs(self, tmp_path):
        store = make_frame_store(tmp_path)
        ann = [("Q000000", "R000001", 0.0, 5.0, 0.0, 5.0)]
        ds = LabeledFramePairDataset(store, ann, width=64)
        rng = np.random.default_rng(1)
        # Index 0 belongs to Q000000 which is annotated.
        s = ds.sample(0, rng)
        assert s["vid_a"] == ds.vid_ordinal["Q000000"]
        assert s["vid_b"] == ds.vid_ordinal["R000001"]

    def test_feature_sequence_dataset(self):
        rng = np.random.default_rng(2)
        feats = {
            "Q000000": rng.standard_normal((5, 8)).astype(np.float32),
            "Q000001": rng.standard_normal((12, 8)).astype(np.float32),
        }
        ds = FeatureSequenceDataset(feats, positive_vids=["Q000001"], max_frames=8)
        s0 = ds.sample(0)
        assert s0["feats"].shape == (8, 8)
        assert s0["label"] == 0.0
        assert (s0["feats"][5:] == 0).all()  # padding
        s1 = ds.sample(1)
        assert s1["label"] == 1.0
        assert (np.abs(s1["feats"]).sum(axis=1) > 0).all()  # truncated to 8

    def test_dataloader_batches_and_sharding(self, tmp_path):
        store = make_frame_store(tmp_path, n_videos=4, frames_per_video=4)
        ds = FramePairDataset(store, width=32)
        loader = DataLoader(ds, batch_size=4, num_workers=2, seed=7)
        batches = list(loader.epoch(0))
        assert len(batches) == 4
        assert batches[0]["img_a"].shape == (4, 32, 32, 3)
        # Two-process sharding covers disjoint halves of the same permutation.
        l0 = DataLoader(ds, batch_size=4, num_workers=1, seed=7, process_index=0, process_count=2)
        l1 = DataLoader(ds, batch_size=4, num_workers=1, seed=7, process_index=1, process_count=2)
        i0 = l0._epoch_indices(0)
        i1 = l1._epoch_indices(0)
        assert set(i0) & set(i1) == set()
        assert len(set(i0) | set(i1)) == len(ds)


def test_native_dp_matches_numpy():
    """C++ vta_dp_fill == the numpy fallback bit-for-bit."""
    from vsc22_tpu.align import vta
    from vsc22_tpu.native import load_library

    assert load_library() is not None
    rng = np.random.default_rng(6)
    sim = rng.random((40, 37)) + 0.5

    dp_native, accu_n, back_n = vta._dp_matrix(sim, discontinue=3, min_sim=1.0)

    # Force the numpy path by monkeypatching the library loader.
    import vsc22_tpu.native as native_mod

    orig = native_mod.load_library
    try:
        import vsc22_tpu.align.vta as vta_mod

        class _Fake:
            @staticmethod
            def load_library():
                return None

        # Call the pure-python branch directly.
        native_mod_load = native_mod.load_library
        native_mod.load_library = lambda: None
        dp_py, accu_p, back_p = vta._dp_matrix(sim, discontinue=3, min_sim=1.0)
    finally:
        native_mod.load_library = orig

    np.testing.assert_array_equal(dp_native, dp_py)
    np.testing.assert_array_equal(accu_n, accu_p)
    np.testing.assert_array_equal(back_n, back_p)


def test_overlay_pair_dataset(tmp_path):
    from vsc22_tpu.data.datasets import OverlayImagePairDataset

    store = make_frame_store(tmp_path)
    ds = OverlayImagePairDataset(store, overlay_prob=1.0, width=32)
    rng = np.random.default_rng(0)
    s = ds.sample(0, rng)
    assert s["label"] == 1
    assert s["img_a"].shape == (32, 32, 3)
    ds0 = OverlayImagePairDataset(store, overlay_prob=0.0, width=32)
    assert ds0.sample(0, rng)["label"] == 0


@pytest.mark.heavy
def test_launch_local_workers():
    from vsc22_tpu.parallel.launcher import launch_local

    def work(index, count, base):
        return base + index * 10

    assert launch_local(work, 1, args=(5,)) == [5]
    results = launch_local(_times_ten, 3, args=(100,))
    assert results == [100, 110, 120]


def _times_ten(index, count, base):
    return base + index * 10


def test_launch_local_failure_propagates():
    from vsc22_tpu.parallel.launcher import launch_local

    with pytest.raises(RuntimeError, match="worker"):
        launch_local(_boom, 2)


def _boom(index, count):
    if index == 1:
        raise ValueError("kaput")
    return index


def _silent_death(index, count):
    if index == 1:
        import os

        os._exit(3)  # dies without enqueueing a result or raising
    return index


def _hang(index, count):
    if index == 1:
        import time

        time.sleep(60)
    return index


def test_launch_local_detects_silent_worker_death():
    """A worker that exits nonzero without reporting must raise promptly
    (the reference's join-with-exitcode contract, inference.py:111-120),
    not wait for the timeout."""
    from vsc22_tpu.parallel.launcher import launch_local

    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="exit code 3"):
        launch_local(_silent_death, 2, timeout=30.0)
    assert time.monotonic() - t0 < 25.0


@pytest.mark.heavy
def test_launch_local_global_deadline():
    """timeout is one global deadline, not per-result: a hung worker
    trips it once regardless of worker count."""
    from vsc22_tpu.parallel.launcher import launch_local

    t0 = time.monotonic()
    with pytest.raises(TimeoutError, match="deadline"):
        launch_local(_hang, 3, timeout=15.0)
    # Per-result semantics would allow 3 x 15s; the global deadline fires
    # once (plus spawn overhead on this 1-core host).
    assert time.monotonic() - t0 < 35.0


def test_concat_dataset(tmp_path):
    from vsc22_tpu.data.datasets import ConcatDataset

    store = make_frame_store(tmp_path)
    a = FramePairDataset(store, width=32)
    b = FramePairDataset(store, width=32)
    cat = ConcatDataset([a, b])
    assert len(cat) == len(a) + len(b)
    rng = np.random.default_rng(0)
    s_last = cat.sample(len(cat) - 1, rng)
    assert s_last["img_a"].shape == (32, 32, 3)
    # Boundary: first sample of the second dataset.
    s_b0 = cat.sample(len(a), rng)
    assert s_b0["img_b"].shape == (32, 32, 3)


def test_dataloader_worker_failure_raises(tmp_path):
    from vsc22_tpu.data.datasets import DataLoader

    class BoomDataset:
        def __len__(self):
            return 8

        def sample(self, idx, rng):
            if idx == 3:
                raise ValueError("boom")
            return {"x": np.zeros(2, np.float32)}

    loader = DataLoader(BoomDataset(), batch_size=4, shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="worker failed"):
        list(loader.epoch(0))


class _ArangeDataset:
    """Picklable toy dataset for the process loader."""

    def __init__(self, n=32):
        self.n = n

    def __len__(self):
        return self.n

    def sample(self, idx, rng):
        return {"x": np.full((2, 2), idx, np.float32), "vid": f"V{idx}"}


@pytest.mark.heavy
def test_process_dataloader_matches_contract():
    from vsc22_tpu.data.datasets import DataLoader, ProcessDataLoader

    loader = ProcessDataLoader(
        _ArangeDataset, batch_size=4, num_workers=2, seed=7, shuffle=True
    )
    batches = list(loader.epoch(0))
    assert len(batches) == 8
    assert batches[0]["x"].shape == (4, 2, 2)
    # Same deterministic epoch permutation as the threaded loader.
    thread_loader = DataLoader(_ArangeDataset(), batch_size=4, num_workers=1, seed=7)
    expect = thread_loader._epoch_indices(0)
    got = np.concatenate([b["x"][:, 0, 0].astype(int) for b in batches])
    assert (got == expect).all()

    # Two-host sharding covers disjoint halves.
    l0 = ProcessDataLoader(
        _ArangeDataset, batch_size=4, num_workers=2, seed=7,
        process_index=0, process_count=2,
    )
    l1 = ProcessDataLoader(
        _ArangeDataset, batch_size=4, num_workers=2, seed=7,
        process_index=1, process_count=2,
    )
    g0 = np.concatenate([b["x"][:, 0, 0].astype(int) for b in l0.epoch(0)])
    g1 = np.concatenate([b["x"][:, 0, 0].astype(int) for b in l1.epoch(0)])
    assert set(g0) & set(g1) == set()
    assert len(set(g0) | set(g1)) == 32


class _BoomPickleDataset:
    def __len__(self):
        return 8

    def sample(self, idx, rng):
        raise ValueError("kaput")


def test_process_dataloader_worker_failure_raises():
    from vsc22_tpu.data.datasets import ProcessDataLoader

    loader = ProcessDataLoader(_BoomPickleDataset, batch_size=4, num_workers=2)
    with pytest.raises(RuntimeError, match="loader worker failed"):
        list(loader.epoch(0))
