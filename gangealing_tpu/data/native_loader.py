"""Native prefetching data loader (C++ decode workers over mmap'd LMDB).

The TPU-native equivalent of torch DataLoader worker processes
(reference datasets/__init__.py:20-41): decode threads live in-process
(no pickling/IPC), read encoded bytes zero-copy from the LMDB mmap, and
stage float32 [-1, 1] CHW batches in a bounded ring buffer.

Falls back to the pure-Python DataLoader when no compiler is available.
"""

import ctypes
import os
from typing import Iterator

import numpy as np

_LIB = None


def _native_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gangealing_tpu.data._native_build import build_shared_lib
    srcs = [os.path.join(here, "native", "lmdb_kv.cc"),
            os.path.join(here, "native", "image_loader.cc")]
    so = os.path.join(here, "native", "build", "libgt_loader.so")
    build_shared_lib(srcs, so, ["-ljpeg", "-lpng", "-lpthread"])
    lib = ctypes.CDLL(so)
    lib.gt_loader_create.restype = ctypes.c_void_p
    lib.gt_loader_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
    lib.gt_loader_next.restype = ctypes.c_int
    lib.gt_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p]
    lib.gt_loader_len.restype = ctypes.c_int64
    lib.gt_loader_len.argtypes = [ctypes.c_void_p]
    lib.gt_loader_set_epoch.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.gt_loader_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class NativeImageLoader:
    """Infinite iterator of ((n, 3, res, res) float32 in [-1,1], (n,) int64
    dataset indices) batches, decoded by C++ worker threads."""

    def __init__(self, path: str, resolution: int = 256, batch: int = 64,
                 num_threads: int = 8, shuffle: bool = True, seed: int = 0,
                 prefetch_depth: int = 4):
        self._lib = _native_lib()
        self._h = self._lib.gt_loader_create(
            path.encode(), resolution, batch, num_threads, int(shuffle),
            seed, prefetch_depth)
        if not self._h:
            raise IOError(f"cannot open image loader over {path}")
        self.batch = batch
        self.resolution = resolution
        self._buf = np.empty((batch, 3, resolution, resolution), np.float32)
        self._idx = np.empty((batch,), np.int64)

    def __len__(self):
        return int(self._lib.gt_loader_len(self._h))

    def next(self):
        n = self._lib.gt_loader_next(
            self._h, self._buf.ctypes.data_as(ctypes.c_void_p),
            self._idx.ctypes.data_as(ctypes.c_void_p))
        if n == -2:
            # a full epoch of chunks decoded zero images: the resolution
            # key prefix doesn't exist in this LMDB, or the data is corrupt
            raise RuntimeError(
                f"native loader decoded no images for a full epoch — is "
                f"resolution={self.resolution} present in this dataset?")
        if n < 0:
            # loader closed/destroyed; a distinct exception, NOT
            # StopIteration (PEP 479 would turn that into a confusing
            # 'generator raised StopIteration' inside __iter__)
            raise RuntimeError("native loader is closed")
        return self._buf[:n].copy(), self._idx[:n].copy()

    def __iter__(self) -> Iterator:
        while True:
            yield self.next()

    def set_epoch(self, seed: int):
        self._lib.gt_loader_set_epoch(self._h, seed)

    def close(self):
        if self._h:
            self._lib.gt_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
