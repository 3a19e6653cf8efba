"""ctypes bindings for the native (C++) gvid loader + dataset/loader classes.

The `.gvid` container holds fixed-geometry uint8 RGB clips; the C++ side
(`native/gvid_loader.cpp`) mmaps it and prefetches float32 batches with a
thread pool, replacing the reference's per-worker OpenCV decode
(`/root/reference/genie/module/data.py:188-205`) with a codec-free hot path.

The shared library is built on first use (`make -C native`); everything
degrades gracefully to the pure-Python pipeline when a toolchain is absent.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgvid.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.gvid_open.restype = ctypes.c_void_p
    lib.gvid_open.argtypes = [ctypes.c_char_p]
    lib.gvid_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32)]
    lib.gvid_load_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.gvid_prefetch_start.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.gvid_prefetch_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.gvid_prefetch_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
    ]
    lib.gvid_prefetch_stop.argtypes = [ctypes.c_void_p]
    lib.gvid_close.argtypes = [ctypes.c_void_p]
    lib.gvid_write.restype = ctypes.c_int
    lib.gvid_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_uint32,
    ]
    _lib = lib
    return lib


def write_gvid(path: str, videos: np.ndarray) -> None:
    """Write `(N, T, H, W, C)` uint8 (or float [0,1]) videos as .gvid."""
    lib = _load_lib()
    if videos.dtype != np.uint8:
        videos = (np.clip(videos, 0, 1) * 255).astype(np.uint8)
    videos = np.ascontiguousarray(videos)
    n, t, h, w, c = videos.shape
    rc = lib.gvid_write(
        path.encode(), videos.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, t, h, w, c,
    )
    assert rc == 0, f"gvid_write failed: {rc}"


class GVidDataset:
    """Map-style dataset over a .gvid file (native synchronous reads)."""

    def __init__(
        self,
        path: str,
        num_frames: Optional[int] = None,
        randomize: bool = False,
        seed: int = 0,
    ) -> None:
        self.lib = _load_lib()
        self.handle = self.lib.gvid_open(path.encode())
        assert self.handle, f"failed to open {path}"
        info = (ctypes.c_uint32 * 5)()
        self.lib.gvid_info(self.handle, info)
        self.num_videos, self.frames, self.h, self.w, self.c = (
            int(info[0]), int(info[1]), int(info[2]), int(info[3]), int(info[4])
        )
        self.num_frames = num_frames or self.frames
        assert self.num_frames <= self.frames
        self.randomize = randomize
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.num_videos

    def __getitem__(self, idx: int) -> np.ndarray:
        start = 0
        if self.randomize and self.frames > self.num_frames:
            start = int(self.rng.integers(0, self.frames - self.num_frames + 1))
        spec = (ctypes.c_int64 * 2)(idx, start)
        out = np.empty(
            (self.num_frames, self.h, self.w, self.c), np.float32
        )
        rc = self.lib.gvid_load_batch(
            self.handle, spec, 1, self.num_frames,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        assert rc == 0, f"gvid_load_batch failed: {rc}"
        return out

    def close(self):
        if self.handle:
            self.lib.gvid_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeBatchLoader:
    """Pipelined native batch iterator: C++ threads prefetch ahead.

    Yields `(B, T, H, W, C)` float32 numpy batches; compose with
    `jax.device_put` / sharding at the call site (see `data/loader.py`).
    """

    def __init__(
        self,
        dataset: GVidDataset,
        batch_size: int = 8,
        shuffle: bool = True,
        num_threads: int = 2,
        prefetch: int = 2,
        seed: int = 0,
        sharding=None,
    ) -> None:
        self.ds = dataset
        self.dataset = dataset  # duck-type parity with BatchLoader
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.seed = seed
        self.sharding = sharding
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.ds) // self.batch_size

    def __iter__(self) -> Iterator[np.ndarray]:
        lib = self.ds.lib
        self._epoch += 1
        rng = np.random.default_rng(self.seed + self._epoch)
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(order)
        nb = len(self)

        specs = []
        for bi in range(nb):
            idxs = order[bi * self.batch_size : (bi + 1) * self.batch_size]
            spec = np.empty((self.batch_size, 2), np.int64)
            spec[:, 0] = idxs
            max_start = self.ds.frames - self.ds.num_frames
            spec[:, 1] = (
                rng.integers(0, max_start + 1, self.batch_size)
                if max_start > 0 else 0
            )
            specs.append(np.ascontiguousarray(spec.reshape(-1)))

        lib.gvid_prefetch_start(
            self.ds.handle, self.batch_size, self.ds.num_frames,
            self.num_threads,
        )
        try:
            inflight = 0
            submitted = 0
            while submitted < nb and inflight < self.prefetch + 1:
                lib.gvid_prefetch_submit(
                    self.ds.handle, submitted,
                    specs[submitted].ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                )
                submitted += 1
                inflight += 1

            for ticket in range(nb):
                out = np.empty(
                    (self.batch_size, self.ds.num_frames, self.ds.h,
                     self.ds.w, self.ds.c),
                    np.float32,
                )
                lib.gvid_prefetch_get(
                    self.ds.handle, ticket,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                )
                inflight -= 1
                if submitted < nb:
                    lib.gvid_prefetch_submit(
                        self.ds.handle, submitted,
                        specs[submitted].ctypes.data_as(
                            ctypes.POINTER(ctypes.c_int64)
                        ),
                    )
                    submitted += 1
                    inflight += 1
                if self.sharding is not None:
                    from open_genie_tpu.parallel.mesh import place_batch

                    out = place_batch(out, self.sharding)
                yield out
        finally:
            lib.gvid_prefetch_stop(self.ds.handle)
