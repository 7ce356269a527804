"""Tiled inference helper (parity target: utils/realesrgan_utils.py:14-253,
the RealESRGANer pre/post-pad + tile loop — vestigial in the reference but
part of its framework surface).

Generic over any jittable img2img fn; tiles with overlap, processes each
tile, stitches. Pre-process/post-process handle mod-padding.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np


class TiledRestorer:
    def __init__(self, fn: Callable, scale: int = 1, tile_size: int = 0,
                 tile_pad: int = 10, pre_pad: int = 0, mod_pad: int = 1):
        """fn: (B, h, w, C) -> (B, h*scale, w*scale, C)."""
        self.fn = fn
        self.scale = scale
        self.tile_size = tile_size
        self.tile_pad = tile_pad
        self.pre_pad = pre_pad
        self.mod_pad = mod_pad

    def _pad(self, img):
        h, w = img.shape[1:3]
        pre = self.pre_pad
        img = np.pad(img, ((0, 0), (pre, pre), (pre, pre), (0, 0)),
                     mode="reflect")
        m = self.mod_pad
        ph = (m - img.shape[1] % m) % m
        pw = (m - img.shape[2] % m) % m
        img = np.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)),
                     mode="reflect")
        return img, (h, w)

    def _tile_process(self, img):
        b, h, w, c = img.shape
        s = self.scale
        out = np.zeros((b, h * s, w * s, c), np.float32)
        ts = self.tile_size
        for y0 in range(0, h, ts):
            for x0 in range(0, w, ts):
                y1 = min(y0 + ts, h)
                x1 = min(x0 + ts, w)
                yp0 = max(y0 - self.tile_pad, 0)
                xp0 = max(x0 - self.tile_pad, 0)
                yp1 = min(y1 + self.tile_pad, h)
                xp1 = min(x1 + self.tile_pad, w)
                tile = img[:, yp0:yp1, xp0:xp1]
                tile_out = np.asarray(self.fn(tile))
                oy0, ox0 = (y0 - yp0) * s, (x0 - xp0) * s
                out[:, y0 * s:y1 * s, x0 * s:x1 * s] = tile_out[
                    :, oy0:oy0 + (y1 - y0) * s, ox0:ox0 + (x1 - x0) * s
                ]
        return out

    def enhance(self, img: np.ndarray) -> np.ndarray:
        """img: (B, H, W, C) float; returns (B, H*scale, W*scale, C)."""
        padded, (h, w) = self._pad(img)
        if self.tile_size > 0:
            out = self._tile_process(padded)
        else:
            out = np.asarray(self.fn(padded))
        s = self.scale
        pre = self.pre_pad * s
        out = out[:, pre:pre + h * s, pre:pre + w * s]
        return out
