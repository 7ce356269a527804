"""Image <-> array converters with the reference's exact conventions.

Parity target: utils/img_util.py:13-98 (img2tensor / tensor2img) — BGR/RGB
flips, [-1,1] <-> uint8 round-trips. The framework works in NHWC float
arrays; "tensor" here means a numpy/jnp NHWC float image batch.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

try:
    import imageio
except ImportError:  # pragma: no cover
    imageio = None


def img2arr(img: np.ndarray, bgr2rgb: bool = True,
            mean: float = 0.5, std: float = 0.5) -> np.ndarray:
    """HWC uint8/float [0,1] image -> HWC float32 RGB normalized
    ((x - mean) / std; defaults give [-1, 1])."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    else:
        img = img.astype(np.float32)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    if bgr2rgb and img.shape[2] == 3:
        img = img[..., ::-1]
    return (img - mean) / std


def arr2img(arr: np.ndarray, rgb2bgr: bool = True,
            min_max: Tuple[float, float] = (-1, 1)) -> np.ndarray:
    """NHWC or HWC float RGB -> HWC uint8 (BGR by default, like
    tensor2img at img_util.py:42-98)."""
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(arr, *min_max)
    arr = (arr - min_max[0]) / (min_max[1] - min_max[0])
    if rgb2bgr and arr.shape[-1] == 3:
        arr = arr[..., ::-1]
    return (arr * 255.0).round().astype(np.uint8)


def imread(path: str, float32: bool = False) -> np.ndarray:
    """Read an image as BGR HWC (cv2 convention, matching imfrombytes)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def imfrombytes(content: bytes, float32: bool = False) -> np.ndarray:
    """Bytes -> BGR HWC image (img_util.py:118-136)."""
    img_np = np.frombuffer(content, np.uint8)
    img = cv2.imdecode(img_np, cv2.IMREAD_COLOR)
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def imwrite(img: np.ndarray, file_path: str, auto_mkdir: bool = True):
    """Write a BGR uint8 image, creating parent dirs (img_util.py:139-155)."""
    if auto_mkdir:
        os.makedirs(os.path.dirname(os.path.abspath(file_path)),
                    exist_ok=True)
    ok = cv2.imwrite(file_path, img)
    if not ok:
        raise IOError(f"Failed to write image: {file_path}")


def mimsave(frames: Sequence[np.ndarray], file_path: str, fps: int = 25):
    """Write an mp4/gif from RGB uint8 frames (img_util.py:157-172).

    Prefers imageio; falls back to cv2.VideoWriter when imageio has no
    ffmpeg backend (common in hermetic images)."""
    os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    frames = list(frames)
    try:
        imageio.mimsave(file_path, frames, fps=fps)
        return
    except Exception:
        # imageio backends (notably pyav) can fail with backend-specific
        # errors (AttributeError, av.FFmpegError, ...); any failure here
        # routes to the cv2 writer
        pass
    if cv2 is None:
        raise RuntimeError("no video backend available (imageio/cv2)")
    h, w = frames[0].shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(file_path, fourcc, fps, (w, h))
    if not writer.isOpened():
        raise IOError(f"cv2.VideoWriter failed to open {file_path}")
    for f in frames:
        writer.write(np.asarray(f)[..., ::-1])  # RGB -> BGR
    writer.release()


def grad_layer(x):
    """Sobel gradient magnitude map (parity target: GradLayer,
    utils/img_util.py:254-294): grayscale -> |sobel_x| + |sobel_y|.
    x: (B,H,W,C) jnp array; returns (B,H,W,1)."""
    import jax
    import jax.numpy as jnp

    gray = jnp.mean(x, axis=-1, keepdims=True)
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]],
                     x.dtype).reshape(3, 3, 1, 1)
    ky = jnp.transpose(kx, (1, 0, 2, 3))

    def conv(img, k):
        return jax.lax.conv_general_dilated(
            img, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return jnp.abs(conv(gray, kx)) + jnp.abs(conv(gray, ky))


def show_feature_map(feat: np.ndarray) -> np.ndarray:
    """Mean-over-channels feature visualization as uint8 heatmap
    (utils/img_util.py feature-map visualizer)."""
    f = np.asarray(feat)
    if f.ndim == 4:
        f = f[0]
    m = f.mean(axis=-1)
    m = (m - m.min()) / (m.max() - m.min() + 1e-8)
    return (m * 255).astype(np.uint8)


def read_video_frames(path: str, size: Optional[Tuple[int, int]] = None
                      ) -> Tuple[List[np.ndarray], float]:
    """Read a video (mp4/gif/frame-folder) -> (list of RGB uint8 frames,
    fps). Mirrors demo.py:166-178 + frames_dataset.read_video."""
    if os.path.isdir(path):
        names = sorted(os.listdir(path))
        frames = [cv2.cvtColor(imread(os.path.join(path, n)),
                               cv2.COLOR_BGR2RGB) for n in names]
        fps = 25.0
    else:
        try:
            reader = imageio.get_reader(path)
            fps = float(reader.get_meta_data().get("fps", 25.0))
            frames = []
            try:
                for im in reader:
                    frames.append(np.asarray(im)[..., :3])
            except RuntimeError:
                pass
            try:
                reader.close()
            except Exception:
                pass
            if not frames:
                raise ValueError("imageio decoded zero frames")
        except Exception:
            # imageio has no ffmpeg backend — cv2 fallback
            cap = cv2.VideoCapture(path)
            if not cap.isOpened():
                raise IOError(f"cannot open video {path}")
            fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
            frames = []
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                frames.append(frame[..., ::-1].copy())  # BGR -> RGB
            cap.release()
    if size is not None:
        frames = [cv2.resize(f, size, interpolation=cv2.INTER_LINEAR)
                  for f in frames]
    return frames, fps
