"""Build a disk-resident synthetic VoxCeleb-style frames tree.

Layout matches what FramesMotionTransferDataset expects (reference
data/frames_dataset.py:107-132): `root/{train,test}/<id>#<clip>/NNNNNNN.png`
per-video frame folders with id_sampling-compatible names. Frames are
smooth low-frequency RGB (PNG-compressible like real face crops, unlike
iid noise) so decode cost is realistic and training has structure.

Usage:
  python tools/make_synthetic_voxceleb.py --root /tmp/vox_synth \
      --videos 48 --frames 40 --size 256
"""
from __future__ import annotations

import argparse
import os
from os import path as osp

import numpy as np


def _video_frames(rng: np.random.RandomState, n_frames: int, size: int):
    """Smoothly-moving low-frequency pattern: base image warped by a
    drifting roll + brightness wobble, like a talking head's motion
    statistics (large coherent structure, small per-frame change)."""
    small = rng.rand(size // 8, size // 8, 3).astype(np.float32)
    base = np.repeat(np.repeat(small, 8, axis=1), 8, axis=0)
    # sharpen a little structure in so PNG doesn't collapse to nothing
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = 0.75 * base + 0.25 * np.stack(
        [np.sin(7 * xx + 3 * yy), np.cos(5 * yy), xx * yy], axis=-1)
    base = (base - base.min()) / (base.max() - base.min() + 1e-6)
    for t in range(n_frames):
        shift = int(round(3 * np.sin(2 * np.pi * t / n_frames) * 4))
        gain = 0.9 + 0.1 * np.cos(2 * np.pi * t / n_frames)
        frame = np.roll(base, shift, axis=1) * gain
        yield np.clip(frame * 255.0, 0, 255).astype(np.uint8)


def build_tree(root: str, videos: int, frames: int, size: int,
               test_videos: int = 4, seed: int = 0):
    import cv2

    rng = np.random.RandomState(seed)
    n_ids = max(videos // 2, 1)
    made = 0
    for split, count in (("train", videos), ("test", test_videos)):
        for v in range(count):
            vid_id = f"id{10000 + (v % n_ids):05d}"
            name = f"{vid_id}#clip{v:04d}"
            vd = osp.join(root, split, name)
            os.makedirs(vd, exist_ok=True)
            vr = np.random.RandomState(seed * 1000 + made)
            for t, frame in enumerate(_video_frames(vr, frames, size)):
                # imwrite takes BGR; frames are synthetic so order only
                # needs to be consistent with the dataset's imread(BGR)
                cv2.imwrite(osp.join(vd, f"{t:07d}.png"), frame)
            made += 1
    return made


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--videos", type=int, default=48)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--test_videos", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    n = build_tree(args.root, args.videos, args.frames, args.size,
                   args.test_videos, args.seed)
    total = n * args.frames
    print(f"wrote {n} videos x {args.frames} frames @ {args.size}² "
          f"under {args.root} ({total} PNGs)")


if __name__ == "__main__":
    main()
