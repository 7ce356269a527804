"""Clip-level video augmentation library.

Parity target: data/augmentation.py:1-398 — crop/pad/resize/flip/rotate/
color-jitter/zoom transforms applied consistently across a clip, plus the
AllAugmentationTransform composer. Host-side numpy/cv2 (the reference used
skimage, unavailable here; semantics preserved).

Note the flagship training config uses transforms.augment_video instead
(frames_dataset.py:162); this module exists for config-level parity with
the FOMM-style aug pipeline.
"""
from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


Clip = List[np.ndarray]  # list of HWC float [0,1] frames


class RandomFlip:
    def __init__(self, time_flip: bool = False, horizontal_flip: bool = True):
        self.time_flip = time_flip
        self.horizontal_flip = horizontal_flip

    def __call__(self, clip: Clip) -> Clip:
        if random.random() < 0.5 and self.time_flip:
            clip = clip[::-1]
        if random.random() < 0.5 and self.horizontal_flip:
            clip = [np.ascontiguousarray(img[:, ::-1]) for img in clip]
        return clip


class RandomResize:
    def __init__(self, ratio=(3.0 / 4.0, 4.0 / 3.0),
                 interpolation: str = "nearest"):
        self.ratio = ratio
        self.interp = (cv2.INTER_NEAREST if interpolation == "nearest"
                       else cv2.INTER_LINEAR)

    def __call__(self, clip: Clip) -> Clip:
        scale = random.uniform(self.ratio[0], self.ratio[1])
        h, w = clip[0].shape[:2]
        nh, nw = int(scale * h), int(scale * w)
        return [cv2.resize(img, (nw, nh), interpolation=self.interp)
                for img in clip]


class RandomCrop:
    def __init__(self, size):
        self.size = size  # (h, w)

    def __call__(self, clip: Clip) -> Clip:
        ch, cw = self.size
        h, w = clip[0].shape[:2]
        if ch > h or cw > w:
            raise ValueError("crop size larger than frame")
        y = random.randint(0, h - ch)
        x = random.randint(0, w - cw)
        return [img[y:y + ch, x:x + cw] for img in clip]


class RandomRotation:
    def __init__(self, degrees):
        if isinstance(degrees, (int, float)):
            degrees = (-degrees, degrees)
        self.degrees = degrees

    def __call__(self, clip: Clip) -> Clip:
        angle = random.uniform(*self.degrees)
        h, w = clip[0].shape[:2]
        mat = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
        return [cv2.warpAffine(img, mat, (w, h)) for img in clip]


class ColorJitter:
    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def _params(self):
        b = (random.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
             if self.brightness > 0 else 1.0)
        c = (random.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
             if self.contrast > 0 else 1.0)
        s = (random.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
             if self.saturation > 0 else 1.0)
        h = (random.uniform(-self.hue, self.hue) if self.hue > 0 else 0.0)
        return b, c, s, h

    def __call__(self, clip: Clip) -> Clip:
        b, c, s, h = self._params()
        out = []
        for img in clip:
            x = img.astype(np.float32)
            x = x * b  # brightness
            mean = x.mean(axis=(0, 1), keepdims=True)
            x = (x - mean) * c + mean  # contrast
            gray = x.mean(axis=2, keepdims=True)
            x = (x - gray) * s + gray  # saturation
            if h != 0:
                hsv = cv2.cvtColor(np.clip(x, 0, 1), cv2.COLOR_RGB2HSV)
                hsv[..., 0] = (hsv[..., 0] + h * 360.0) % 360.0
                x = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
            out.append(np.clip(x, 0, 1))
        return out


class RandomZoom:
    def __init__(self, zoom_range=(0.9, 1.1)):
        self.zoom_range = zoom_range

    def __call__(self, clip: Clip) -> Clip:
        z = random.uniform(*self.zoom_range)
        h, w = clip[0].shape[:2]
        nh, nw = int(h * z), int(w * z)
        out = []
        for img in clip:
            scaled = cv2.resize(img, (nw, nh),
                                interpolation=cv2.INTER_LINEAR)
            if z >= 1:  # center crop back
                y0 = (nh - h) // 2
                x0 = (nw - w) // 2
                out.append(scaled[y0:y0 + h, x0:x0 + w])
            else:  # pad back
                py = (h - nh) // 2
                px = (w - nw) // 2
                out.append(np.pad(
                    scaled,
                    ((py, h - nh - py), (px, w - nw - px), (0, 0)),
                    mode="edge",
                ))
        return out


class AllAugmentationTransform:
    """Composer (augmentation.py:372-398): flip -> rotate -> resize ->
    crop -> jitter, each stage enabled by its param dict."""

    def __init__(self, resize_param=None, rotation_param=None,
                 flip_param=None, crop_param=None, jitter_param=None):
        self.transforms = []
        if flip_param is not None:
            self.transforms.append(RandomFlip(**flip_param))
        if rotation_param is not None:
            self.transforms.append(RandomRotation(**rotation_param))
        if resize_param is not None:
            self.transforms.append(RandomResize(**resize_param))
        if crop_param is not None:
            self.transforms.append(RandomCrop(**crop_param))
        if jitter_param is not None:
            self.transforms.append(ColorJitter(**jitter_param))

    def __call__(self, clip: Clip) -> Clip:
        for t in self.transforms:
            clip = t(clip)
        return clip
