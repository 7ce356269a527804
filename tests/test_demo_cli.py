"""End-to-end demo CLI smoke: synthetic source + driving video through the
full pipeline (batched kp extraction, normalize_kp, anchor stitching, mp4
writer) — the system-level acceptance path (SURVEY.md section 4 item e).
"""
import os
import subprocess
import sys
from os import path as osp

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier

cv2 = pytest.importorskip("cv2")
imageio = pytest.importorskip("imageio")

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _make_inputs(tmp_path):
    from synergize_motion_appearance_tpu.utils.img_util import mimsave

    rng = np.random.RandomState(0)
    src = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "source.png"), src)
    frames = []
    base = (rng.rand(80, 80, 3) * 255).astype(np.uint8)
    for i in range(7):
        frames.append(base[i:i + 64, i:i + 64])  # sliding crop = "motion"
    mimsave(frames, str(tmp_path / "driving.mp4"), fps=5)
    return tmp_path / "source.png", tmp_path / "driving.mp4"


def test_demo_cli_end_to_end(tmp_path):
    src, drv = _make_inputs(tmp_path)
    out = tmp_path / "result.mp4"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, "-m", "synergize_motion_appearance_tpu.demo",
         "--config", osp.join(REPO, "options", "tiny.yml"),
         "--source_image", str(src),
         "--driving_video", str(drv),
         "--result_video", str(out),
         "--relative", "--adapt_scale", "--find_best_frame",
         "--frame_batch", "4"],
        capture_output=True, text=True, env=env, timeout=1500,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert out.exists()
    from synergize_motion_appearance_tpu.utils.img_util import (
        read_video_frames,
    )

    frames, _ = read_video_frames(str(out))
    assert len(frames) == 7
    assert frames[0].shape[:2] == (64, 64)


def test_demo_cli_fast_path(tmp_path):
    """--fast: bf16 + uint8 link + I420 D2H + host kp downsampling."""
    src, drv = _make_inputs(tmp_path)
    out = tmp_path / "result_fast.mp4"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, "-m", "synergize_motion_appearance_tpu.demo",
         "--config", osp.join(REPO, "options", "tiny.yml"),
         "--source_image", str(src),
         "--driving_video", str(drv),
         "--result_video", str(out),
         "--relative", "--adapt_scale", "--fast",
         "--frame_batch", "4"],
        capture_output=True, text=True, env=env, timeout=1500,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    from synergize_motion_appearance_tpu.utils.img_util import (
        read_video_frames,
    )

    frames, _ = read_video_frames(str(out))
    assert len(frames) == 7
    assert frames[0].shape[:2] == (64, 64)
