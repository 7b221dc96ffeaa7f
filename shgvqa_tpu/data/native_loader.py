"""ctypes bindings for the native C++ clip decoder (native/frameloader.cpp).

Builds the shared library lazily with g++ on first use (cached under
``native/build/``); falls back to the PIL loader when a toolchain or
libpng/libjpeg is unavailable.  Replaces the reference's 8-process cv2 DataLoader stage with
one in-process threaded decode directly into a contiguous clip buffer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "frameloader.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libframeloader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-lpng", "-ljpeg", "-lz", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"native frameloader build failed, using PIL fallback: {msg}",
              flush=True)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.isfile(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.fl_decode_clip.restype = ctypes.c_int
        lib.fl_decode_clip.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.fl_set_threads.restype = ctypes.c_int
        lib.fl_set_threads.argtypes = [ctypes.c_int]
        _lib = lib
        return _lib


def set_threads(n: int) -> int:
    lib = get_lib()
    if lib is None:
        return 0
    return int(lib.fl_set_threads(n))


def decode_clip(paths: List[str], out_h: int, out_w: int) -> np.ndarray:
    """Decode+resize a list of PNG paths -> (T, out_h, out_w, 3) uint8."""
    lib = get_lib()
    n = len(paths)
    if lib is None:
        from PIL import Image

        frames = []
        for p in paths:
            with Image.open(p) as im:
                frames.append(np.asarray(
                    im.convert("RGB").resize((out_w, out_h), Image.BILINEAR),
                    np.uint8))
        return np.stack(frames)

    out = np.empty((n, out_h, out_w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.fl_decode_clip(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        raise IOError(f"frame decode failed for {paths[-rc - 1]!r}")
    return out


class NativeFrameLoader:
    """Drop-in for data.agqa.FrameLoader using the C++ decoder."""

    def __init__(self, frame_dir: str, frame_ids, clip_len: int,
                 image_size: int, threads: Optional[int] = None):
        from shgvqa_tpu.data.featurize import uniform_subsample_indices

        self.frame_dir = frame_dir
        self.frame_ids = frame_ids
        self.clip_len = clip_len
        self.image_size = image_size
        self._subsample = uniform_subsample_indices
        if threads:
            set_threads(threads)

    def __call__(self, vid: str, fids=None) -> np.ndarray:
        fids = fids if fids is not None else self.frame_ids[vid]
        idx = self._subsample(len(fids), self.clip_len)
        paths = [
            os.path.join(self.frame_dir, f"{vid}.mp4", f"{fids[int(i)]}.png")
            for i in idx
        ]
        return decode_clip(paths, self.image_size, self.image_size)
