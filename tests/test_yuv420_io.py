"""End-to-end: ReenactmentPipeline yuv420_io emits identical-API RGB
output, close to the rgb8 path (I420 is the codec-native frame format;
differences are bounded by studio-swing quantization + chroma
subsampling)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from synergize_motion_appearance_tpu.inference import (  # noqa: E402
    ReenactmentPipeline)
from synergize_motion_appearance_tpu.models import build_network  # noqa: E402
from synergize_motion_appearance_tpu.utils.options import load_yaml  # noqa: E402

pytestmark = pytest.mark.slow  # heavy tier


def test_yuv420_io_animate_matches_rgb8():
    cfg = load_yaml("options/tiny.yml")
    net_g = build_network(cfg["network_g"])
    me = build_network(cfg["network_motion_estimator"])

    rng = np.random.RandomState(0)
    # smooth content (real frames are smooth; chroma subsampling is
    # lossless on luma and mild on low-frequency chroma)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 63.0
    base = np.stack([yy, xx, (yy + xx) / 2], axis=-1)
    src_u8 = np.clip(base * 255 + rng.rand(64, 64, 3) * 8, 0,
                     255).astype(np.uint8)[None]
    drv_u8 = np.stack([np.roll(src_u8[0], s, axis=1)
                       for s in range(0, 12, 2)])

    s = jnp.asarray(src_u8, jnp.float32) / 127.5 - 1
    d0 = jnp.asarray(drv_u8[:1], jnp.float32) / 127.5 - 1
    m_vars = me.init(jax.random.PRNGKey(0), d0, s)
    dm = me.apply(m_vars, d0, s)
    g_vars = net_g.init(jax.random.PRNGKey(1), s, dm, inference=True)

    kw = dict(relative=True, adapt_scale=True, frame_batch=4,
              compute_dtype=None, u8_io=True)
    rgb = ReenactmentPipeline(net_g, me, g_vars, m_vars,
                              **kw).animate(src_u8, drv_u8)
    yuv = ReenactmentPipeline(net_g, me, g_vars, m_vars, yuv420_io=True,
                              **kw).animate(src_u8, drv_u8)
    assert yuv.shape == rgb.shape and yuv.dtype == np.uint8
    # oracle: the rgb8 output pushed through cv2's own I420 encode/decode
    # — the yuv path must land within rounding of that (what any I420
    # video container would store)
    rt = np.stack([cv2.cvtColor(cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420),
                                cv2.COLOR_YUV2RGB_I420) for f in rgb])
    diff = np.abs(yuv.astype(int) - rt.astype(int))
    assert diff.max() <= 6, diff.max()
    assert diff.mean() < 1.0, diff.mean()


def test_yuv420_requires_u8():
    cfg = load_yaml("options/tiny.yml")
    net_g = build_network(cfg["network_g"])
    me = build_network(cfg["network_motion_estimator"])
    p = ReenactmentPipeline(net_g, me, {}, {}, u8_io=False,
                            yuv420_io=True)
    assert p.yuv420_io is False
