"""Host allocator tuning for page-fault-bound virtual machines.

On the microVM hosts this framework serves from, freshly mapped pages
fault in at ~140 MB/s while already-resident memory moves at ~10 GB/s
(measured: first touch of a 2 GB numpy buffer 15 s, the same allocation
once the heap is warm 0.3 s). glibc returns every allocation above the
mmap threshold straight to the kernel on free, so each large numpy temp
in the host pipeline (packed descriptor matrices, FSD frame stacks,
corpus generation) re-pays the fault-in cost — at the 10k x 40k eval
scale this turned score normalization into a 1000 s stage whose device
work is under 15 s.

`tune_host_allocator()` flips glibc to keep freed pages resident:
mmap is disabled for malloc (M_MMAP_MAX=0) and heap trimming is turned
off (M_TRIM_THRESHOLD=max), so the arena warms up once and every later
large temp reuses faulted pages. Safe no-op on non-glibc platforms.
Opt out with VSC22_NO_MALLOC_TUNE=1 (e.g. on memory-constrained hosts,
since freed pages stay resident and RSS grows to the high-water mark).
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_MAX = -4

_done = False


def tune_host_allocator() -> bool:
    """Apply the glibc tuning once per process; returns True if applied."""
    global _done
    if _done:
        return True
    if os.environ.get("VSC22_NO_MALLOC_TUNE", "") == "1":
        return False
    try:
        libc = ctypes.CDLL(None)
        ok = bool(libc.mallopt(_M_TRIM_THRESHOLD, 2**31 - 1))
        ok = bool(libc.mallopt(_M_MMAP_MAX, 0)) and ok
    except (OSError, AttributeError):
        return False
    _done = ok
    return ok
