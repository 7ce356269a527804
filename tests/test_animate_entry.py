"""End-to-end animate.py entry smoke: CSV pairs list -> anchor-split
forward/backward animation -> PNG quads + mp4 + metric accumulation
(parity flow of basicsr/animate.py:49-83)."""
import os
import subprocess
import sys
from os import path as osp

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # heavy tier

cv2 = pytest.importorskip("cv2")

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_animate_entry_end_to_end(tmp_path):
    rng = np.random.RandomState(0)
    # driving video as a frame directory + source image
    drv_dir = tmp_path / "videos" / "drv0"
    drv_dir.mkdir(parents=True)
    base = (rng.rand(80, 80, 3) * 255).astype(np.uint8)
    for i in range(5):
        cv2.imwrite(str(drv_dir / f"{i:04d}.png"), base[i:i + 64, i:i + 64])
    cv2.imwrite(str(tmp_path / "videos" / "src.png"),
                (rng.rand(64, 64, 3) * 255).astype(np.uint8))
    with open(tmp_path / "pairs.csv", "w") as f:
        f.write("source,driving,anchor_idx\nsrc.png,drv0,2\n")

    with open(osp.join(REPO, "options", "tiny.yml")) as f:
        opt = yaml.safe_load(f)
    opt["name"] = "animate-smoke"
    opt["datasets"] = {
        "test": {
            "name": "crossid",
            "type": "FramesMotionTransferTestDataset_CrossID_videopair_anchor",
            "root_dir": str(tmp_path / "videos"),
            "pairs_list": str(tmp_path / "pairs.csv"),
            "gt_size": 64,
        }
    }
    # synthetic LPIPS weights -> the dir-level metric battery
    # (appmotioncomp_model.py:716-755) runs natively at dataset end
    import jax
    import jax.numpy as jnp
    import numpy as _np
    from synergize_motion_appearance_tpu.metrics.external import (
        flatten_params)
    from synergize_motion_appearance_tpu.metrics.lpips_jax import LPIPSVgg

    wdir = tmp_path / "weights"
    wdir.mkdir()
    lp = LPIPSVgg().init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)),
                         jnp.zeros((1, 32, 32, 3)))["params"]
    lp = {k: (jnp.abs(v) if k.startswith("lin") else v)
          for k, v in lp.items()}
    _np.savez(wdir / "lpips_vgg.npz", **flatten_params(
        jax.tree_util.tree_map(_np.asarray, lp)))

    opt["val"] = {
        "relative": True, "adapt_scale": True,
        "metrics": {
            "psnr": {"type": "calculate_psnr", "crop_border": 0},
            "l1": {"type": "calculate_l1", "crop_border": 0},
            "lpips": {"type": "calculate_lpips"},
        },
    }
    opt["path"] = {"save_path": str(tmp_path / "exp")}
    opt_path = tmp_path / "animate.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
               SAMT_WEIGHTS_DIR=str(wdir))
    res = subprocess.run(
        [sys.executable, "-m", "synergize_motion_appearance_tpu.animate",
         "-opt", str(opt_path), "--frame_batch", "4"],
        capture_output=True, text=True, env=env, timeout=1500,
    )
    assert res.returncode == 0, res.stderr[-3000:]

    vis = (tmp_path / "exp" / "results" / "animate-smoke" /
           "visualization" / "crossid")
    results = list((vis / "result").glob("*.png"))
    assert len(results) == 5, sorted(os.listdir(vis / "result"))
    mp4s = list(vis.rglob("*.mp4"))
    assert mp4s, "no mp4 written"
    assert "# lpips:" in res.stdout + res.stderr, (res.stdout + res.stderr)[-2000:]
