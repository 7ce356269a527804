"""Video reader/writer with audio passthrough (parity target:
utils/video_util.py:29-123). Uses the ffmpeg *binary* when present (the
reference uses ffmpeg-python); falls back to cv2 without audio."""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def has_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


class VideoReader:
    """Iterates BGR uint8 frames; exposes fps/size/audio path."""

    def __init__(self, video_path: str):
        self.video_path = video_path
        self.cap = cv2.VideoCapture(video_path)
        if not self.cap.isOpened():
            raise IOError(f"cannot open {video_path}")
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 25.0
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.nb_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def get_frame(self) -> Optional[np.ndarray]:
        ok, frame = self.cap.read()
        return frame if ok else None

    def __iter__(self):
        while True:
            f = self.get_frame()
            if f is None:
                return
            yield f

    def __len__(self):
        return self.nb_frames

    def close(self):
        self.cap.release()


class VideoWriter:
    """Writes BGR uint8 frames; muxes audio from a source video at close
    when ffmpeg is available (video_util.py:89-123)."""

    def __init__(self, video_save_path: str, height: int, width: int,
                 fps: float = 25.0, audio_source: Optional[str] = None):
        self.path = video_save_path
        self.audio_source = audio_source if has_ffmpeg() else None
        os.makedirs(os.path.dirname(os.path.abspath(video_save_path)),
                    exist_ok=True)
        self._tmp = (video_save_path + ".noaudio.mp4"
                     if self.audio_source else video_save_path)
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self.writer = cv2.VideoWriter(self._tmp, fourcc, fps,
                                      (width, height))
        if not self.writer.isOpened():
            raise IOError(f"cv2.VideoWriter failed for {self._tmp}")

    def write_frame(self, frame: np.ndarray):
        self.writer.write(frame)

    def close(self):
        self.writer.release()
        if self.audio_source:
            try:
                subprocess.run(
                    ["ffmpeg", "-y", "-i", self._tmp, "-i",
                     self.audio_source, "-map", "0:v", "-map", "1:a?",
                     "-c", "copy", self.path],
                    check=True, capture_output=True,
                )
                os.remove(self._tmp)
            except subprocess.CalledProcessError:
                os.replace(self._tmp, self.path)
