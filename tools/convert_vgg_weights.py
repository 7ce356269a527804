"""Convert torchvision VGG19 weights to a flax param npz for VGG19Features.

Usage:
  python tools/convert_vgg_weights.py --src vgg19.pth --dst vgg19_flax.npz
  (or, with network access / a populated torch hub cache: --from-torchvision)

The perceptual loss (losses/losses.py MultiScalePyramidPerceptualLoss)
takes the resulting pytree. torch conv weight (O,I,kh,kw) -> flax kernel
(kh,kw,I,O).
"""
from __future__ import annotations

import argparse
import sys
from os import path as osp

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# conv layer indices inside torchvision vgg19 `features`
VGG19_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
# our VGG19Features uses the first 13 convs (through relu5_1)
NUM_CONVS_USED = 13


def torch_vgg_to_flax(state_dict) -> dict:
    params = {}
    for i, idx in enumerate(VGG19_CONV_IDX[:NUM_CONVS_USED]):
        w = np.asarray(state_dict[f"features.{idx}.weight"])
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        params[f"conv{i}"] = {
            "Conv_0": {
                "kernel": w.transpose(2, 3, 1, 0),  # OIHW -> HWIO
                "bias": b,
            }
        }
    return params


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_npz(params: dict, dst: str):
    np.savez(dst, **flatten(params))


def load_npz(path: str) -> dict:
    data = np.load(path)
    return unflatten({k: data[k] for k in data.files})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", help="torch .pth state dict of vgg19")
    ap.add_argument("--from-torchvision", action="store_true",
                    help="load via torchvision (needs weights cache)")
    ap.add_argument("--dst", required=True)
    args = ap.parse_args()

    import torch

    if args.from_torchvision:
        from torchvision.models import vgg19
        sd = vgg19(weights="DEFAULT").state_dict()
    else:
        sd = torch.load(args.src, map_location="cpu")
        if "state_dict" in sd:
            sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params = torch_vgg_to_flax(sd)
    save_npz(params, args.dst)
    print(f"Wrote {args.dst} ({len(flatten(params))} arrays)")


if __name__ == "__main__":
    main()
