"""Lazy g++ build + ctypes loader for the native host runtime.

The .so is rebuilt whenever any source is newer than the cached artifact.
Gate: if no C++ toolchain is available the callers fall back to their pure
Python/numpy paths (every native component has one).
"""

from __future__ import annotations

import ctypes
import shutil
import subprocess
import threading
from pathlib import Path
from typing import Optional

_SRC_DIR = Path(__file__).parent
_SOURCES = ["recordstore.cpp", "vta_kernels.cpp"]
_LIB_NAME = "libvsc22_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def ensure_built() -> Optional[Path]:
    """Compile the shared library if stale; returns its path or None."""
    global _build_failed
    if _build_failed:
        return None
    lib_path = _SRC_DIR / _LIB_NAME
    sources = [_SRC_DIR / s for s in _SOURCES]
    # Content-hash stamp, not mtimes: git checkouts reset mtimes in arbitrary
    # order, which once served a stale .so missing newly added symbols.
    import hashlib

    digest = hashlib.sha256()
    for s in sources:
        digest.update(s.read_bytes())
    stamp = digest.hexdigest()
    stamp_path = _SRC_DIR / ".build_hash"
    if (
        lib_path.exists()
        and stamp_path.exists()
        and stamp_path.read_text().strip() == stamp
    ):
        return lib_path
    gxx = shutil.which("g++")
    if gxx is None:
        _build_failed = True
        return None
    cmd = [
        gxx,
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        *[str(s) for s in sources],
        "-o",
        str(lib_path),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        _build_failed = True
        return None
    stamp_path.write_text(stamp + "\n")
    return lib_path


def load_library() -> Optional[ctypes.CDLL]:
    """Build (if needed) and dlopen the native library; None on failure."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        path = ensure_built()
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))

        # Record store
        lib.rs_open.restype = ctypes.c_void_p
        lib.rs_open.argtypes = [ctypes.c_char_p]
        lib.rs_close.argtypes = [ctypes.c_void_p]
        lib.rs_num_records.restype = ctypes.c_int64
        lib.rs_num_records.argtypes = [ctypes.c_void_p]
        lib.rs_record_size.restype = ctypes.c_int64
        lib.rs_record_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.rs_read.restype = ctypes.c_int64
        lib.rs_read.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.rs_read_batch.restype = ctypes.c_int64
        lib.rs_read_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int,
        ]

        # VTA kernels
        lib.vta_dp_fill.restype = None
        lib.vta_dp_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.vta_tn.restype = ctypes.c_int64
        lib.vta_tn.argtypes = [
            ctypes.c_void_p,  # sims
            ctypes.c_int64,  # q_len
            ctypes.c_int64,  # r_len
            ctypes.c_int64,  # tn_max_step
            ctypes.c_int64,  # tn_top_k
            ctypes.c_int64,  # max_path
            ctypes.c_double,  # min_sim
            ctypes.c_int64,  # min_length
            ctypes.c_double,  # max_iou
            ctypes.c_void_p,  # out_boxes
            ctypes.c_int64,  # max_boxes
        ]

        _lib = lib
        return _lib
