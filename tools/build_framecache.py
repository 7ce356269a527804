"""Pack a VoxCeleb-style frame-folder tree into a native frame cache.

Usage:
  python tools/build_framecache.py --root /data/vox1_frames/train \
      --dst /data/vox1_train.fc --size 256

The resulting .fc file is consumed zero-copy (mmap) by the native C++
loader (synergize_motion_appearance_tpu/data/native_loader.py).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
from os import path as osp

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from synergize_motion_appearance_tpu.data.native_loader import write_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="directory of per-video frame folders")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--limit", type=int, default=0,
                    help="max videos (0 = all)")
    args = ap.parse_args()

    import cv2

    video_dirs = sorted(
        d for d in glob.glob(osp.join(args.root, "*")) if osp.isdir(d)
    )
    if args.limit:
        video_dirs = video_dirs[:args.limit]

    def videos():
        for vd in video_dirs:
            frames = sorted(glob.glob(vd + "/*.png")) or sorted(
                glob.glob(vd + "/*.jpg")
            )
            if not frames:
                continue

            def gen(frames=frames):
                for fp in frames:
                    img = cv2.imread(fp, cv2.IMREAD_COLOR)
                    img = cv2.resize(img, (args.size, args.size),
                                     interpolation=cv2.INTER_LINEAR)
                    yield np.ascontiguousarray(img[..., ::-1])  # BGR->RGB

            yield len(frames), gen()

    write_cache(args.dst, videos(), args.size, args.size, 3)
    print(f"Wrote {args.dst}: {len(video_dirs)} videos")


if __name__ == "__main__":
    main()
