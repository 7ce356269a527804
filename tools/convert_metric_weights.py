#!/usr/bin/env python
"""Convert metric-backbone torch checkpoints to .npz param trees.

The native TPU metric paths (synergize_motion_appearance_tpu/metrics/
external.py) load either the original torch .pth (needs torch at runtime)
or a converted .npz (needs nothing). This tool does the one-time
conversion:

  # FID inception (pt_inception-2015-12-05-6726825d.pth from pytorch-fid)
  python tools/convert_metric_weights.py --inception pt_inception.pth \
      -o ~/.cache/samt_weights/inception.npz

  # LPIPS: torchvision vgg16 state_dict + lpips lin heads
  # (lpips/weights/v0.1/vgg.pth from the lpips package)
  python tools/convert_metric_weights.py --lpips vgg16.pth lpips_vgg.pth \
      -o ~/.cache/samt_weights/lpips_vgg.npz

  # OpenFace (openface.pth from OpenFacePytorch)
  python tools/convert_metric_weights.py --openface openface.pth \
      -o ~/.cache/samt_weights/openface.npz
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_sd(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inception", metavar="PTH")
    ap.add_argument("--lpips", nargs=2, metavar=("VGG16_PTH", "LINS_PTH"))
    ap.add_argument("--openface", metavar="PTH")
    ap.add_argument("-o", "--out", required=True)
    args = ap.parse_args()

    from synergize_motion_appearance_tpu.metrics.external import (
        flatten_params)

    if args.inception:
        from synergize_motion_appearance_tpu.metrics.inception import (
            convert_torch_inception)
        tree = convert_torch_inception(_load_sd(args.inception))
    elif args.lpips:
        from synergize_motion_appearance_tpu.metrics.lpips_jax import (
            convert_lpips_weights)
        tree = convert_lpips_weights(_load_sd(args.lpips[0]),
                                     _load_sd(args.lpips[1]))
    elif args.openface:
        from synergize_motion_appearance_tpu.metrics.openface import (
            convert_openface_weights)
        tree = convert_openface_weights(_load_sd(args.openface))
    else:
        ap.error("pick one of --inception / --lpips / --openface")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **flatten_params(tree))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
