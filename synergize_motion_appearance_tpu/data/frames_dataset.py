"""Datasets for VoxCeleb-style per-video frame folders.

Parity targets (data/frames_dataset.py):
  * FramesMotionTransferDataset (:68-176) — training pairs: per-video
    folder of frames, id_sampling by 'name#...' prefix, 2 random sorted
    frames -> (source, driving), clip-consistent hflip+time-flip, resize
    to gt_size, normalize mean/std 0.5 -> [-1,1] RGB.
  * FramesMotionTransferTestDataset_CrossID_videopair_anchor (:178-306) —
    CSV pairs list (source, driving video, anchor, anchor_idx), full
    driving frame list per item.
  * FramesMotionTransferTestDataset_PairsList (:308-399) — frame-pair eval.

Host-side numpy only; batching/H2D happens in the loader.
"""
from __future__ import annotations

import glob
import os
import random
from os import path as osp
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils.img_util import img2arr, imread, read_video_frames
from ..utils.registry import DATASET_REGISTRY
from .transforms import augment_video

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    if img.shape[0] != size or img.shape[1] != size:
        return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    return img


@DATASET_REGISTRY.register()
class FramesMotionTransferDataset:
    """Training dataset: each video is a folder of frames."""

    def __init__(self, opt: Dict[str, Any]):
        self.opt = opt
        self.root_dir = opt["root_dir"]
        self.gt_size = int(opt.get("gt_size", 256))
        self.mean = opt.get("mean", [0.5] * 3)[0]
        self.std = opt.get("std", [0.5] * 3)[0]
        self.id_sampling = bool(opt.get("id_sampling", False))
        self.is_train = bool(opt.get("is_train", True))
        self.use_hflip = bool(opt.get("use_hflip", True))
        self.use_time_flip = bool(opt.get("use_time_flip", True))

        train_dir = osp.join(self.root_dir, "train")
        if osp.exists(train_dir):
            if self.id_sampling:
                videos = sorted({
                    osp.basename(v).split("#")[0]
                    for v in os.listdir(train_dir)
                })
            else:
                videos = sorted(os.listdir(train_dir))
            test_videos = sorted(os.listdir(osp.join(self.root_dir, "test")))
            self.root_dir = osp.join(
                self.root_dir, "train" if self.is_train else "test"
            )
            self.videos = videos if self.is_train else test_videos
        else:
            # accept flat layouts too (reference raises; we degrade kindly)
            self.videos = sorted(os.listdir(self.root_dir))

    def __len__(self) -> int:
        return len(self.videos)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        name = self.videos[idx]
        if self.is_train and self.id_sampling:
            candidates = glob.glob(osp.join(self.root_dir, name + "*"))
            path = np.random.choice(candidates)
        else:
            path = osp.join(self.root_dir, name)

        frames = sorted(glob.glob(path + "/*.png")) or sorted(
            glob.glob(path + "/*.jpg")
        )
        num_frames = len(frames)
        frame_idx = np.sort(
            np.random.choice(num_frames, replace=True, size=2)
        )
        video_array = [
            imread(frames[i], float32=True) for i in frame_idx
        ]  # BGR float [0,1]

        video_array = augment_video(
            video_array, hflip=self.use_hflip, rotation=False,
            time_flip=self.use_time_flip,
        )
        video_array = [_resize(f, self.gt_size) for f in video_array]

        source = img2arr(video_array[0], bgr2rgb=True,
                         mean=self.mean, std=self.std)
        driving = img2arr(video_array[1], bgr2rgb=True,
                          mean=self.mean, std=self.std)
        return {"source": source.astype(np.float32),
                "driving": driving.astype(np.float32)}


@DATASET_REGISTRY.register()
class FramesMotionTransferTestDataset_CrossID_videopair_anchor:
    """CSV pairs list: source image + full driving video + anchor index
    (frames_dataset.py:178-306)."""

    def __init__(self, opt: Dict[str, Any]):
        import pandas as pd

        self.opt = opt
        self.root_dir = opt["root_dir"]
        self.gt_size = int(opt.get("gt_size", 256))
        self.mean = opt.get("mean", [0.5] * 3)[0]
        self.std = opt.get("std", [0.5] * 3)[0]
        pairs = pd.read_csv(opt["pairs_list"])
        self.pairs = pairs.to_dict("records")

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        rec = self.pairs[idx]
        source_path = osp.join(self.root_dir, str(rec["source"]))
        driving_path = osp.join(self.root_dir, str(rec["driving"]))
        anchor_idx = int(rec.get("anchor_idx", 0))

        if osp.isdir(source_path):
            names = sorted(os.listdir(source_path))
            source_img = imread(osp.join(source_path, names[0]),
                                float32=True)
        else:
            source_img = imread(source_path, float32=True)
        source_img = _resize(source_img, self.gt_size)
        source = img2arr(source_img, bgr2rgb=True, mean=self.mean,
                         std=self.std)

        frames_rgb, _ = read_video_frames(
            driving_path, size=(self.gt_size, self.gt_size)
        )
        driving_names = [f"{i:07d}" for i in range(len(frames_rgb))]
        driving = [
            img2arr(f.astype(np.float32) / 255.0, bgr2rgb=False,
                    mean=self.mean, std=self.std)
            for f in frames_rgb
        ]
        return {
            "source": source.astype(np.float32),
            "driving_video": np.stack(driving).astype(np.float32),
            "anchor_idx": anchor_idx,
            "video_name": osp.splitext(osp.basename(str(rec["driving"])))[0],
            "driving_name_list": driving_names,
        }


@DATASET_REGISTRY.register()
class FramesMotionTransferTestDataset_PairsList:
    """Frame-pair evaluation dataset (frames_dataset.py:308-399)."""

    def __init__(self, opt: Dict[str, Any]):
        import pandas as pd

        self.opt = opt
        self.root_dir = opt["root_dir"]
        self.gt_size = int(opt.get("gt_size", 256))
        self.mean = opt.get("mean", [0.5] * 3)[0]
        self.std = opt.get("std", [0.5] * 3)[0]
        pairs = pd.read_csv(opt["pairs_list"])
        self.pairs = pairs.to_dict("records")

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        rec = self.pairs[idx]
        src = imread(osp.join(self.root_dir, str(rec["source"])),
                     float32=True)
        drv = imread(osp.join(self.root_dir, str(rec["driving"])),
                     float32=True)
        src = _resize(src, self.gt_size)
        drv = _resize(drv, self.gt_size)
        frame_name = (
            osp.splitext(osp.basename(str(rec["source"])))[0]
            + "_"
            + osp.splitext(osp.basename(str(rec["driving"])))[0]
        )
        return {
            "source": img2arr(src, True, self.mean, self.std
                              ).astype(np.float32),
            "driving": img2arr(drv, True, self.mean, self.std
                               ).astype(np.float32),
            "frame_name": frame_name,
        }


def build_dataset(opt: Dict[str, Any]):
    opt = dict(opt)
    cls = DATASET_REGISTRY.get(opt["type"])
    return cls(opt)
