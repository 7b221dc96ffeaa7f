#!/usr/bin/env python
"""Frame-decode throughput: native C++ loader vs PIL on the 16-PNG/clip hot
path the reference suffers in its 8-process cv2 DataLoader
(agqa_data.py:207-213).  Prints one JSON line per loader."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from PIL import Image

    from shgvqa_tpu.data.agqa import FrameLoader
    from shgvqa_tpu.data.native_loader import NativeFrameLoader, get_lib

    clip_len = 16
    image = int(os.environ.get("SHGVQA_DECODE_SRC", "480"))
    out = 224
    n_clips = int(os.environ.get("SHGVQA_DECODE_CLIPS", "20"))

    root = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    vid = "BENCH"
    d = os.path.join(root, f"{vid}.mp4")
    os.makedirs(d)
    fids = [f"{i:06d}" for i in range(clip_len)]
    base = rng.randint(0, 255, (image, image, 3), np.uint8)
    for i, fid in enumerate(fids):
        # photographic-ish content compresses like real frames
        img = np.clip(base.astype(int) + rng.randint(-8, 8, base.shape), 0,
                      255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(d, f"{fid}.png"))

    ids = {vid: fids}
    loaders = {"pil": FrameLoader(root, ids, clip_len, out)}
    if get_lib() is not None:
        loaders["native"] = NativeFrameLoader(
            root, ids, clip_len, out,
            threads=int(os.environ.get("SHGVQA_DECODE_THREADS", "8")))

    results = {}
    for name, loader in loaders.items():
        loader(vid)  # warm page cache / build
        t0 = time.perf_counter()
        for _ in range(n_clips):
            loader(vid)
        dt = time.perf_counter() - t0
        results[name] = n_clips / dt
        print(json.dumps({
            "loader": name,
            "clips_per_s": round(n_clips / dt, 2),
            "frames_per_s": round(n_clips * clip_len / dt, 1),
            "src": f"{image}x{image}", "dst": f"{out}x{out}",
        }), flush=True)
    if "native" in results:
        print(json.dumps({
            "speedup_native_vs_pil":
                round(results["native"] / results["pil"], 2)}))


if __name__ == "__main__":
    main()
