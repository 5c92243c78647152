"""Native (C++) host runtime components, loaded via ctypes.

- recordstore.cpp: mmap'd record store (LMDB replacement) with GIL-free
  batch reads for the training dataloader;
- vta_kernels.cpp: sequential alignment kernels (numba @njit replacement).

The shared library builds lazily with g++ on first use and is cached next
to the sources (see `build.ensure_built`).
"""

from vsc22_tpu.native.build import ensure_built, load_library  # noqa: F401
