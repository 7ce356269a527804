"""ctypes bindings for the native C++ frame-cache loader (native/).

Build once: `make -C native` (or this module builds it on first use).
`NativeFrameCacheLoader` is a drop-in for BatchLoader's role in the train
loop: `next()` yields {'source','driving'} float32 NHWC batches, produced
by C++ worker threads off the GIL from an mmapped cache file.

Cache files are written by tools/build_framecache.py from the same
frame-folder layout the python dataset reads.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from os import path as osp
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = osp.join(
    osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))), "native"
)
_LIB_PATH = osp.join(_NATIVE_DIR, "libframecache.so")


def _build_native():
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                   capture_output=True)


def load_library() -> ctypes.CDLL:
    if not osp.exists(_LIB_PATH):
        _build_native()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fc_open.restype = ctypes.c_void_p
    lib.fc_open.argtypes = [ctypes.c_char_p]
    lib.fc_close.argtypes = [ctypes.c_void_p]
    for fn in ("fc_num_videos", "fc_height", "fc_width", "fc_channels"):
        getattr(lib, fn).restype = ctypes.c_uint32
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.fc_num_frames.restype = ctypes.c_uint32
    lib.fc_num_frames.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.fc_get_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.fc_sampler_start.restype = ctypes.c_void_p
    lib.fc_sampler_start.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
    ]
    lib.fc_sampler_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.fc_sampler_stop.argtypes = [ctypes.c_void_p]
    return lib


MAGIC = 0x31304346544D4153  # "SAMTFC01"


def write_cache(dst_path: str, videos, height: int, width: int,
                channels: int = 3):
    """videos: iterable of (num_frames, frame_generator) where the
    generator yields uint8 (H,W,C) RGB arrays. Used by
    tools/build_framecache.py."""
    import struct

    metas = []
    with open(dst_path, "wb") as f:
        # reserve header space after first pass? Write in two passes:
        # collect payload in a temp file
        payload_path = dst_path + ".payload"
        offset = 0
        frame_bytes = height * width * channels
        with open(payload_path, "wb") as pf:
            for num_frames, gen in videos:
                metas.append((offset, num_frames))
                for frame in gen:
                    assert frame.shape == (height, width, channels)
                    assert frame.dtype == np.uint8
                    pf.write(frame.tobytes())
                offset += num_frames * frame_bytes
        f.write(struct.pack("<Q", MAGIC))
        f.write(struct.pack("<IIII", len(metas), height, width, channels))
        for off, nf in metas:
            f.write(struct.pack("<QI", off, nf))
        with open(payload_path, "rb") as pf:
            while True:
                chunk = pf.read(1 << 24)
                if not chunk:
                    break
                f.write(chunk)
        os.remove(payload_path)


class NativeFrameCacheLoader:
    def __init__(self, cache_path: str, batch_size: int,
                 num_workers: int = 4, seed: int = 0, hflip: bool = True,
                 time_flip: bool = True, mean: float = 0.5,
                 std: float = 0.5):
        self.lib = load_library()
        self.handle = self.lib.fc_open(cache_path.encode())
        if not self.handle:
            raise IOError(f"failed to open frame cache {cache_path}")
        self.batch = batch_size
        self.h = self.lib.fc_height(self.handle)
        self.w = self.lib.fc_width(self.handle)
        self.c = self.lib.fc_channels(self.handle)
        self.sampler = self.lib.fc_sampler_start(
            self.handle, batch_size, num_workers, seed,
            int(hflip), int(time_flip), mean, std,
        )
        shape = (batch_size, self.h, self.w, self.c)
        self._src = np.empty(shape, np.float32)
        self._drv = np.empty(shape, np.float32)

    @property
    def num_videos(self) -> int:
        return self.lib.fc_num_videos(self.handle)

    def next(self) -> Dict[str, np.ndarray]:
        self.lib.fc_sampler_next(
            self.sampler,
            self._src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._drv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return {"source": self._src.copy(), "driving": self._drv.copy()}

    def get_frame(self, video: int, frame: int) -> np.ndarray:
        out = np.empty((self.h, self.w, self.c), np.uint8)
        self.lib.fc_get_frame(
            self.handle, video, frame,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out

    def close(self):
        if getattr(self, "sampler", None):
            self.lib.fc_sampler_stop(self.sampler)
            self.sampler = None
        if getattr(self, "handle", None):
            self.lib.fc_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
