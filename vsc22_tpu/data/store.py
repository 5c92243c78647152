"""Frame stores: native record store (LMDB replacement) + jpg-zip interop.

Parity targets (reference, for cross-checking — original implementation):
  - D1/preprocess/zip2lmdb.py: frames packed into one LMDB keyed by a global
    int index, with a sidecar meta.npz {vids, intervals} mapping each video
    to its [start, end) frame-index range;
  - D1/preprocess/vid2jpg_zip.py: per-video zips of 1-fps '%07d.jpg' frames
    under data/jpg_zips/<id[-2:]>/<id>.zip.

The record store is a single mmap'd file (see native/recordstore.cpp) whose
reads are GIL-free and page-cache shared across dataloader workers; a pure
numpy memmap fallback covers toolchain-less environments.
"""

from __future__ import annotations

import ctypes
import os
import struct
import zipfile
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"VSCREC01"


class RecordStoreWriter:
    """Streams records into the store file; call close() to finalize."""

    def __init__(self, path: str):
        self.path = path
        self._tmp_payload = open(path + ".payload.tmp", "wb")
        self._offsets: List[int] = [0]

    def append(self, data: bytes) -> int:
        self._tmp_payload.write(data)
        self._offsets.append(self._offsets[-1] + len(data))
        return len(self._offsets) - 2

    def close(self) -> None:
        self._tmp_payload.close()
        count = len(self._offsets) - 1
        with open(self.path, "wb") as f:
            f.write(_MAGIC)
            f.write(struct.pack("<Q", count))
            f.write(np.asarray(self._offsets, np.uint64).tobytes())
            with open(self.path + ".payload.tmp", "rb") as payload:
                while True:
                    chunk = payload.read(1 << 22)
                    if not chunk:
                        break
                    f.write(chunk)
        os.remove(self.path + ".payload.tmp")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RecordStore:
    """Read-only record store; native mmap reader with numpy fallback."""

    def __init__(self, path: str):
        self.path = path
        from vsc22_tpu.native import load_library

        self._lib = load_library()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.rs_open(path.encode())
            if not self._handle:
                self._lib = None
        if self._lib is None:
            # numpy memmap fallback
            raw = np.memmap(path, dtype=np.uint8, mode="r")
            if bytes(raw[:8]) != _MAGIC:
                raise ValueError(f"{path} is not a record store")
            (count,) = struct.unpack("<Q", bytes(raw[8:16]))
            self._count = int(count)
            self._offsets = np.frombuffer(
                raw[16 : 16 + 8 * (count + 1)].tobytes(), np.uint64
            )
            self._payload = raw[16 + 8 * (count + 1) :]
        else:
            self._count = int(self._lib.rs_num_records(self._handle))

    def __len__(self) -> int:
        return self._count

    def __getitem__(self, i: int) -> bytes:
        if not 0 <= i < self._count:
            raise IndexError(i)
        if self._lib is not None:
            size = self._lib.rs_record_size(self._handle, i)
            buf = ctypes.create_string_buffer(size)
            got = self._lib.rs_read(self._handle, i, buf, size)
            if got != size:
                raise IOError(f"short read for record {i}")
            return buf.raw
        start, end = int(self._offsets[i]), int(self._offsets[i + 1])
        return self._payload[start:end].tobytes()

    def read_batch(self, indices: Sequence[int], num_threads: int = 4) -> List[bytes]:
        """Parallel batch read (native path); sequential in the fallback."""
        indices = np.asarray(indices, np.int64)
        if self._lib is None:
            return [self[int(i)] for i in indices]
        sizes = np.asarray(
            [self._lib.rs_record_size(self._handle, int(i)) for i in indices], np.int64
        )
        if (sizes < 0).any():
            raise IndexError("record index out of range")
        out_offsets = np.zeros(len(indices), np.int64)
        np.cumsum(sizes[:-1], out=out_offsets[1:])
        total = int(sizes.sum())
        out = np.empty(total, np.uint8)
        rc = self._lib.rs_read_batch(
            self._handle,
            indices.ctypes.data_as(ctypes.c_void_p),
            len(indices),
            out.ctypes.data_as(ctypes.c_void_p),
            out_offsets.ctypes.data_as(ctypes.c_void_p),
            num_threads,
        )
        if rc != len(indices):
            raise IOError("batch read failed")
        return [
            out[o : o + s].tobytes() for o, s in zip(out_offsets, sizes)
        ]

    def close(self):
        if self._lib is not None and self._handle:
            self._lib.rs_close(self._handle)
            self._handle = None

    @property
    def using_native(self) -> bool:
        return self._lib is not None


class FrameStore:
    """Video-aware layer over a RecordStore: meta maps vid -> [start, end).

    Mirrors the reference's LMDB + meta.npz contract (vids, intervals).
    """

    def __init__(self, store_path: str, meta_path: Optional[str] = None):
        self.store = RecordStore(store_path)
        meta_path = meta_path or store_path + ".meta.npz"
        meta = np.load(meta_path, allow_pickle=False)
        self.vids = [str(v) for v in meta["vids"]]
        self.intervals = meta["intervals"].astype(np.int64)
        self.vid_to_interval: Dict[str, Tuple[int, int]] = {
            v: (int(s), int(e)) for v, (s, e) in zip(self.vids, self.intervals)
        }

    def num_frames(self, vid: str) -> int:
        s, e = self.vid_to_interval[vid]
        return e - s

    def get_frame_bytes(self, vid: str, frame: int) -> bytes:
        s, e = self.vid_to_interval[vid]
        if not 0 <= frame < e - s:
            raise IndexError(f"{vid}[{frame}]")
        return self.store[s + frame]

    def get_frame(self, vid: str, frame: int) -> np.ndarray:
        import cv2

        buf = np.frombuffer(self.get_frame_bytes(vid, frame), np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        return img[:, :, ::-1].copy()  # BGR -> RGB

    @staticmethod
    def build(
        store_path: str,
        videos: Sequence[Tuple[str, Sequence[bytes]]],
        meta_path: Optional[str] = None,
    ) -> "FrameStore":
        """Write (vid, [jpeg bytes...]) streams into a new store + meta."""
        vids, intervals = [], []
        with RecordStoreWriter(store_path) as w:
            cursor = 0
            for vid, frames in videos:
                start = cursor
                for data in frames:
                    w.append(data)
                    cursor += 1
                vids.append(vid)
                intervals.append((start, cursor))
        np.savez(
            meta_path or store_path + ".meta.npz",
            vids=np.asarray(vids),
            intervals=np.asarray(intervals, np.int64),
        )
        return FrameStore(store_path, meta_path)


class ZipFrameStore:
    """Per-video jpg zips, reference layout: <root>/<id[-2:]>/<id>.zip."""

    def __init__(self, root: str):
        self.root = Path(root)

    def path_for(self, vid: str) -> Path:
        return self.root / vid[-2:] / f"{vid}.zip"

    def write_video(self, vid: str, frames: Sequence[np.ndarray], quality: int = 90):
        import cv2

        path = self.path_for(vid)
        path.parent.mkdir(parents=True, exist_ok=True)
        with zipfile.ZipFile(path, "w") as zf:
            for i, frame in enumerate(frames):
                ok, buf = cv2.imencode(
                    ".jpg", frame[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, quality]
                )
                if not ok:
                    raise IOError(f"jpeg encode failed for {vid}[{i}]")
                zf.writestr(f"{i:07d}.jpg", buf.tobytes())

    def read_video(self, vid: str) -> List[np.ndarray]:
        import cv2

        frames = []
        with zipfile.ZipFile(self.path_for(vid), "r") as zf:
            for name in sorted(zf.namelist()):
                buf = np.frombuffer(zf.read(name), np.uint8)
                img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
                frames.append(img[:, :, ::-1].copy())
        return frames

    def has_video(self, vid: str) -> bool:
        return self.path_for(vid).exists()
