"""SRModel: the generic single-network model pattern (sr_model.py:13-209)."""
import numpy as np
import pytest

from synergize_motion_appearance_tpu.model_api import build_model

pytestmark = pytest.mark.slow  # heavy tier


def _opt():
    return {
        "model_type": "SRModel",
        "is_train": True,
        "manual_seed": 0,
        "network_g": {
            "type": "AutoEncoder",
            "img_size": 32,
            "nf": 8,
            "ch_mult": [1, 2],
            "res_blocks": 1,
            "attn_resolutions": [8],
            "emb_dim": 16,
        },
        "train": {
            "optim_g": {"type": "Adam", "lr": 1e-3},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "ema_decay": 0.99,
        },
        "val": {"metrics": {"psnr": {"type": "calculate_psnr",
                                     "crop_border": 0}}},
    }


def test_sr_model_train_and_test():
    model = build_model(_opt())
    rng = np.random.RandomState(0)
    lq = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    gt = lq.copy()
    model.feed_data({"lq": lq, "gt": gt})
    model.optimize_parameters(1)
    l0 = model.get_current_log()["l_pix"]
    for it in range(2, 6):
        model.optimize_parameters(it)
    assert model.get_current_log()["l_pix"] < l0  # identity is learnable
    out = model.test()
    assert out.shape == (2, 32, 32, 3)
    vis = model.get_current_visuals()
    assert set(vis) == {"result", "lq", "gt"}


def test_sr_model_validation_loop():
    model = build_model(_opt())
    rng = np.random.RandomState(1)
    lq = rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    model.feed_data({"lq": lq, "gt": lq})
    model.optimize_parameters(1)
    loader = [{"lq": lq, "gt": lq}]
    res = model.nondist_validation(loader, current_iter=1)
    assert "psnr" in res and np.isfinite(res["psnr"])
