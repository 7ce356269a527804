"""Measure input-pipeline throughput on a disk-resident frames tree.

The reference's hot loop pulls (source, driving) pairs from
DataLoader+prefetcher (reference basicsr/train.py:162-183,
data/prefetch_dataloader.py:63-125); every training number in PERF.md
before §13 used synthetic in-memory arrays. This tool measures what the
host can actually feed, for both production paths:

  * python: FramesMotionTransferDataset + EnlargedSampler + BatchLoader
    (threaded double-buffer) — what train.py uses by default.
  * native: the C++ framecache loader (mmapped decoded frames, worker
    threads off the GIL) — train.py's `native_cache` option.

Usage:
  python tools/make_synthetic_voxceleb.py --root /tmp/vox_synth
  python tools/bench_input_pipeline.py --root /tmp/vox_synth \
      --batch 8 --workers 4 --batches 80
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from os import path as osp

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def bench_python(root: str, batch: int, workers: int, n_batches: int,
                 ratio: int = 100):
    from synergize_motion_appearance_tpu.data import (
        BatchLoader, EnlargedSampler, build_dataset, infinite_batches,
    )

    ds = build_dataset(dict(
        type="FramesMotionTransferDataset", root_dir=root, gt_size=256,
        id_sampling=True, is_train=True, use_hflip=True,
        use_time_flip=True))
    sampler = EnlargedSampler(len(ds), 1, 0, ratio=ratio)
    loader = BatchLoader(ds, batch, sampler, num_workers=workers)
    it = infinite_batches(loader)

    # warmup: first few batches pay thread spin-up + page cache fill
    for _ in range(min(8, n_batches)):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        _, b = next(it)
        assert b["source"].shape == (batch, 256, 256, 3)
    dt = time.perf_counter() - t0
    sps = n_batches * batch / dt
    return sps, dt


def bench_native(root: str, batch: int, workers: int, n_batches: int,
                 cache_path: str):
    from synergize_motion_appearance_tpu.data.native_loader import (
        NativeFrameCacheLoader,
    )

    if not osp.exists(cache_path):
        import subprocess

        subprocess.run(
            [sys.executable,
             osp.join(osp.dirname(osp.abspath(__file__)),
                      "build_framecache.py"),
             "--root", osp.join(root, "train"), "--dst", cache_path,
             "--size", "256"],
            check=True)
    loader = NativeFrameCacheLoader(cache_path, batch,
                                    num_workers=workers)
    for _ in range(min(8, n_batches)):
        loader.next()
    t0 = time.perf_counter()
    for _ in range(n_batches):
        b = loader.next()
        assert b["source"].shape == (batch, 256, 256, 3)
    dt = time.perf_counter() - t0
    loader.close()
    return n_batches * batch / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--batches", type=int, default=80)
    ap.add_argument("--cache", default=None,
                    help="framecache path (default <root>/train.fc)")
    ap.add_argument("--skip_native", action="store_true")
    args = ap.parse_args()

    out = {"batch": args.batch, "workers": args.workers,
           "host_cores": os.cpu_count()}
    sps, dt = bench_python(args.root, args.batch, args.workers,
                           args.batches)
    out["python_loader_samples_per_s"] = round(sps, 2)
    print(f"python BatchLoader: {sps:.1f} samples/s "
          f"({args.batches} batches in {dt:.1f}s)")

    if not args.skip_native:
        cache = args.cache or osp.join(args.root, "train.fc")
        sps_n, dt_n = bench_native(args.root, args.batch, args.workers,
                                   args.batches, cache)
        out["native_loader_samples_per_s"] = round(sps_n, 2)
        print(f"native framecache:  {sps_n:.1f} samples/s "
              f"({args.batches} batches in {dt_n:.1f}s)")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
