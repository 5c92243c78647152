"""Host data/aug pipeline throughput (VERDICT r2 #5).

Measures, on a synthetic FrameStore at the training operating point
(360x640 jpg frames, hard-aug pair sampling at 256^2 — the reference
trains SwinV2@256 from VideoLmdbDataSet hard pipelines,
train_v106/videolmdb_dataset.py:47-104):

  1. raw store read+jpg-decode rate (frames/s);
  2. hard-aug pair sampling rate (FramePairDataset.sample, pairs/s);
  3. threaded DataLoader throughput (images/s);
  4. ProcessDataLoader throughput (images/s, spawn pool).

Prints one JSON line plus the feeding math: images/s needed per chip for
the reference's batch-100 step times, and how many loader cores that
implies per v5e-8 host vs the reference's 32-A100 setup
(train_v106.sh: 4 hosts x 8 GPUs, batch 100/GPU).

  python scripts/perf_data.py                # full measurement (~2 min)
  python scripts/perf_data.py --frames 4 --videos 4 --samples 16   # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_store(path: str, n_videos: int, frames: int, h: int = 360, w: int = 640):
    import cv2

    from vsc22_tpu.data.store import FrameStore

    rng = np.random.default_rng(0)
    videos = []
    yy = np.linspace(0, 255, h, dtype=np.float32)[:, None, None]
    xx = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
    base = 0.5 * yy + 0.5 * xx
    for i in range(n_videos):
        bufs = []
        for _ in range(frames):
            img = np.clip(base + rng.normal(0, 18, (h, w, 3)), 0, 255).astype(np.uint8)
            ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 87])
            assert ok
            bufs.append(buf.tobytes())
        videos.append((f"R{i:06d}", bufs))
    return FrameStore.build(path, videos)


class _Factory:
    """Picklable factory carrying the store path (spawn workers re-open)."""

    def __init__(self, path: str, width: int):
        self.path = path
        self.width = width

    def __call__(self):
        from vsc22_tpu.data.datasets import FramePairDataset
        from vsc22_tpu.data.store import FrameStore

        return FramePairDataset(FrameStore(self.path), width=self.width)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=24)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--workers", type=int, default=max(os.cpu_count() or 1, 1))
    args = ap.parse_args()

    import tempfile

    from vsc22_tpu.data.datasets import DataLoader, FramePairDataset

    tmp = tempfile.mkdtemp(prefix="perfdata_")
    store_path = os.path.join(tmp, "frames.rec")
    t0 = time.perf_counter()
    store = build_store(store_path, args.videos, args.frames)
    build_s = time.perf_counter() - t0

    # 1. raw read+decode
    n_frames = args.videos * args.frames
    t0 = time.perf_counter()
    for vid in store.vids:
        for f in range(store.num_frames(vid)):
            store.get_frame(vid, f)
    decode_fps = n_frames / (time.perf_counter() - t0)

    # 2. hard-aug pair sampling
    ds = FramePairDataset(store, width=args.width)
    rng = np.random.default_rng(0)
    ds.sample(0, rng)  # warm lazy init
    t0 = time.perf_counter()
    for i in range(args.samples):
        ds.sample(i % len(ds), rng)
    sample_pairs_ps = args.samples / (time.perf_counter() - t0)

    # 3/4. loaders (each sample yields 2 images)
    batch = 16
    def run_loader(loader):
        imgs = 0
        t0 = time.perf_counter()
        for b in loader.epoch(0):
            imgs += b["img_a"].shape[0] * 2
        return imgs / (time.perf_counter() - t0)

    thread_ips = run_loader(DataLoader(ds, batch_size=batch, num_workers=4))
    proc_ips = run_loader(
        __import__("vsc22_tpu.data.datasets", fromlist=["ProcessDataLoader"])
        .ProcessDataLoader(
            _Factory(store_path, args.width),
            batch_size=batch,
            num_workers=args.workers,
            dataset_len=len(ds),
        )
    )

    cores = os.cpu_count() or 1
    # Feeding math: a v5e-8 host training SwinV2-Base@256 at batch 100/chip
    # and ~0.5 s/step consumes 8*100*2/0.5 = 3200 images/s; the single-
    # threaded sample rate IS the per-core aug rate (2 images/pair), so the
    # implied aug core count tells whether the host needs a dedicated aug
    # service (the reference fed 32 A100s from 4 hosts' CPU pools).
    per_core_ips = sample_pairs_ps * 2
    need_ips = 8 * 100 * 2 / 0.5

    print(
        json.dumps(
            {
                "store_build_s": round(build_s, 2),
                "decode_frames_per_sec": round(decode_fps, 1),
                "hard_aug_pairs_per_sec": round(sample_pairs_ps, 2),
                "thread_loader_images_per_sec": round(thread_ips, 1),
                "process_loader_images_per_sec": round(proc_ips, 1),
                "host_cores": cores,
                "aug_images_per_sec_per_core": round(per_core_ips, 1),
                "v5e8_batch100_images_per_sec_needed": need_ips,
                "implied_aug_cores_per_v5e8_host": round(
                    need_ips / max(per_core_ips, 1e-9), 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
