"""Parity of device RGB<->I420 conversion vs OpenCV (the host-side
consumer/producer of codec-native frames)."""
import numpy as np
import pytest

import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from synergize_motion_appearance_tpu.ops.color import (  # noqa: E402
    rgb_to_yuv420, yuv420_to_rgb)


def test_rgb_to_i420_matches_cv2():
    rng = np.random.RandomState(0)
    rgb = (rng.rand(3, 32, 48, 3) * 255).astype(np.uint8)
    ours = np.asarray(rgb_to_yuv420(jnp.asarray(rgb)))
    for i in range(3):
        ref = cv2.cvtColor(rgb[i], cv2.COLOR_RGB2YUV_I420)
        diff = np.abs(ours[i].astype(int) - ref.astype(int))
        assert diff.max() <= 1, diff.max()


def test_i420_roundtrip_through_cv2():
    """Device-encoded I420 must decode on host (cv2) back to the input
    RGB within quantization error on gray content (chroma subsampling
    cannot lose anything there)."""
    rng = np.random.RandomState(1)
    gray = np.repeat((rng.rand(2, 16, 16, 1) * 255).astype(np.uint8),
                     3, axis=-1)
    packed = np.asarray(rgb_to_yuv420(jnp.asarray(gray)))
    back = np.stack([cv2.cvtColor(p, cv2.COLOR_YUV2RGB_I420)
                     for p in packed])
    assert np.abs(back.astype(int) - gray.astype(int)).max() <= 3


def test_model_domain_input():
    rng = np.random.RandomState(2)
    u8 = (rng.rand(1, 8, 8, 3) * 255).astype(np.uint8)
    md = jnp.asarray(u8, jnp.float32) * (2.0 / 255.0) - 1.0
    a = np.asarray(rgb_to_yuv420(jnp.asarray(u8)))
    b = np.asarray(rgb_to_yuv420(md, model_domain=True))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_device_yuv_to_rgb_matches_cv2():
    rng = np.random.RandomState(3)
    rgb = (rng.rand(1, 16, 16, 3) * 255).astype(np.uint8)
    packed = cv2.cvtColor(rgb[0], cv2.COLOR_RGB2YUV_I420)[None]
    ref = cv2.cvtColor(packed[0], cv2.COLOR_YUV2RGB_I420)
    ours = np.asarray(yuv420_to_rgb(jnp.asarray(packed),
                                    model_domain=False))
    assert np.abs(ours[0] - ref.astype(np.float32)).max() <= 2.0
