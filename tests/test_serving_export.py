"""AOT serving export round-trip: exported StableHLO stages + flat params
must reproduce the live pipeline bit-for-bit on the same backend.

The serving subsystem has no reference counterpart (basicsr deploys raw
Python + torch checkpoints); the contract here is internal consistency:
ServingPipeline.animate == ReenactmentPipeline.animate.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synergize_motion_appearance_tpu.inference import ReenactmentPipeline
from synergize_motion_appearance_tpu.models import build_network
from synergize_motion_appearance_tpu.serving import (
    export_pipeline, load_serving_pipeline,
)
from synergize_motion_appearance_tpu.utils.options import load_yaml

pytestmark = pytest.mark.slow  # builds the tiny nets + compiles stages


def _build_tiny_pipeline(**kw):
    cfg = load_yaml("options/tiny.yml")
    net_g = build_network(cfg["network_g"])
    me = build_network(cfg["network_motion_estimator"])
    s = jnp.zeros((1, 64, 64, 3))
    d0 = jnp.zeros((1, 64, 64, 3))
    m_vars = me.init(jax.random.PRNGKey(0), d0, s)
    dm = me.apply(m_vars, d0, s)
    g_vars = net_g.init(jax.random.PRNGKey(1), s, dm, inference=True)
    return ReenactmentPipeline(net_g, me, g_vars, m_vars, **kw)


def test_export_roundtrip_matches_live(tmp_path):
    pipe = _build_tiny_pipeline(relative=True, adapt_scale=True,
                                frame_batch=4, compute_dtype=None)
    rng = np.random.RandomState(0)
    src = (rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    drv = (rng.rand(7, 64, 64, 3).astype(np.float32) * 2 - 1)
    ref = pipe.animate(src, drv)

    art = str(tmp_path / "art")
    export_pipeline(pipe, art)
    for f in ("manifest.json", "kp1.bin", "kpN.bin", "enc.bin", "gen.bin",
              "params.npz"):
        assert os.path.exists(os.path.join(art, f)), f

    served = load_serving_pipeline(art)
    out = served.animate(src, drv)
    np.testing.assert_array_equal(out, ref)

    # anchor stitching reuses the same compiled stages
    out2 = served.animate_with_anchor(src, drv, 3)
    ref2 = pipe.animate_with_anchor(src, drv, 3)
    np.testing.assert_array_equal(out2, ref2)


def test_export_fast_io_mode(tmp_path):
    """uint8 host link + bf16 compute + host kp downsampling (the --fast
    demo path) survives export: same uint8 frames out."""
    pipe = _build_tiny_pipeline(relative=True, adapt_scale=False,
                                frame_batch=4,
                                compute_dtype=jnp.bfloat16, u8_io=True,
                                host_kp_downsample=True)
    rng = np.random.RandomState(1)
    src = (rng.rand(1, 64, 64, 3) * 255).astype(np.uint8)
    drv = (rng.rand(6, 64, 64, 3) * 255).astype(np.uint8)
    ref = pipe.animate(src, drv)
    assert ref.dtype == np.uint8

    art = str(tmp_path / "art")
    export_pipeline(pipe, art)
    with open(os.path.join(art, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["u8_io"] and manifest["host_kp_downsample"]
    assert manifest["compute_dtype"] == "bfloat16"

    served = load_serving_pipeline(art)
    out = served.animate(src, drv)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, ref)


def test_cross_platform_exports(tmp_path):
    """platforms=("tpu",) from a CPU host embeds the Mosaic attention
    kernel; platforms=("cpu","tpu") lowers the portable paths and still
    matches the live pipeline on CPU."""
    from jax import export as jexport

    pipe = _build_tiny_pipeline(frame_batch=4, compute_dtype=None)
    rng = np.random.RandomState(3)
    src = (rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    drv = (rng.rand(5, 64, 64, 3).astype(np.float32) * 2 - 1)
    ref = pipe.animate(src, drv)

    tpu_art = str(tmp_path / "tpu_art")
    export_pipeline(pipe, tpu_art, platforms=("tpu",))
    with open(os.path.join(tpu_art, "gen.bin"), "rb") as f:
        ex = jexport.deserialize(bytearray(f.read()))
    assert list(ex.platforms) == ["tpu"]

    both_art = str(tmp_path / "both_art")
    export_pipeline(pipe, both_art, platforms=("cpu", "tpu"))
    with open(os.path.join(both_art, "manifest.json")) as f:
        assert json.load(f)["platforms"] == ["cpu", "tpu"]
    served = load_serving_pipeline(both_art)
    out = served.animate(src, drv)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_demo_cli_from_export(tmp_path):
    """demo.py --from_export serves a video end-to-end from the artifact
    (no --config, no network build)."""
    cv2 = pytest.importorskip("cv2")

    pipe = _build_tiny_pipeline(relative=True, adapt_scale=True,
                                frame_batch=4, compute_dtype=None)
    art = str(tmp_path / "art")
    export_pipeline(pipe, art)

    from synergize_motion_appearance_tpu.utils.img_util import (
        mimsave, read_video_frames,
    )

    rng = np.random.RandomState(0)
    src = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "source.png"), src)
    base = (rng.rand(80, 80, 3) * 255).astype(np.uint8)
    mimsave([base[i:i + 64, i:i + 64] for i in range(7)],
            str(tmp_path / "driving.mp4"), fps=5)

    from synergize_motion_appearance_tpu.demo import main

    out = tmp_path / "result.mp4"
    main(["--from_export", art,
          "--source_image", str(tmp_path / "source.png"),
          "--driving_video", str(tmp_path / "driving.mp4"),
          "--result_video", str(out),
          "--find_best_frame"])
    frames, _ = read_video_frames(str(out))
    assert len(frames) == 7
    assert frames[0].shape[:2] == (64, 64)


def test_weight_swap_without_reexport(tmp_path):
    """Same artifact, new weights of identical shape: outputs change and
    match a live pipeline built with those weights."""
    pipe = _build_tiny_pipeline(frame_batch=4, compute_dtype=None)
    art = str(tmp_path / "art")
    export_pipeline(pipe, art)

    # re-init with a different seed
    cfg = load_yaml("options/tiny.yml")
    net_g = build_network(cfg["network_g"])
    me = build_network(cfg["network_motion_estimator"])
    s = jnp.zeros((1, 64, 64, 3))
    d0 = jnp.zeros((1, 64, 64, 3))
    m2 = me.init(jax.random.PRNGKey(7), d0, s)
    dm = me.apply(m2, d0, s)
    g2 = net_g.init(jax.random.PRNGKey(8), s, dm, inference=True)
    live2 = ReenactmentPipeline(net_g, me, g2, m2, frame_batch=4,
                                compute_dtype=None)

    rng = np.random.RandomState(2)
    src = (rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    drv = (rng.rand(5, 64, 64, 3).astype(np.float32) * 2 - 1)

    served = load_serving_pipeline(art)
    out_old = served.animate(src, drv)
    served.load_weights(g2, m2)
    out_new = served.animate(src, drv)
    assert np.abs(out_new - out_old).max() > 1e-3
    np.testing.assert_array_equal(out_new, live2.animate(src, drv))
