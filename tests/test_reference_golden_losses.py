"""Golden parity for the loss library vs the reference torch losses
(losses/losses.py). KPDistanceLoss is excluded: the reference hard-codes
`.cuda()` (losses.py:608-609) and cannot run on the CPU oracle; its math
is covered by tests elsewhere."""
import sys
from os import path as osp

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from _reference_oracle import import_reference  # noqa: E402

basicsr = import_reference()
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    basicsr is None, reason="/root/reference not available")]


def _rand(shape, seed=0, scale=1.0):
    return (np.random.RandomState(seed).rand(*shape).astype(np.float32)
            * 2 - 1) * scale


def test_pixel_losses_golden():
    import torch

    from basicsr.losses.losses import (
        CharbonnierLoss as TC, L1Loss as TL1, MSELoss as TMSE,
        WeightedTVLoss as TTV,
    )

    import jax.numpy as jnp
    from synergize_motion_appearance_tpu.losses import (
        CharbonnierLoss, L1Loss, MSELoss, WeightedTVLoss,
    )

    pred = _rand((2, 8, 8, 3), 0)
    tgt = _rand((2, 8, 8, 3), 1)
    tp = torch.from_numpy(pred.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(tgt.transpose(0, 3, 1, 2))
    jp, jt = jnp.asarray(pred), jnp.asarray(tgt)

    for t_cls, f_cls in [(TL1, L1Loss), (TMSE, MSELoss),
                         (TC, CharbonnierLoss)]:
        ref = float(t_cls(loss_weight=0.7)(tp, tt))
        got = float(f_cls(loss_weight=0.7)(jp, jt))
        np.testing.assert_allclose(got, ref, rtol=1e-5,
                                   err_msg=t_cls.__name__)

    # TV loss: the reference requires an explicit weight map
    # (losses.py:172 subscripts it unconditionally)
    wmap = np.random.RandomState(9).rand(2, 1, 8, 8).astype(np.float32)
    ref = float(TTV(loss_weight=0.3)(tp, weight=torch.from_numpy(wmap)))
    got = float(WeightedTVLoss(loss_weight=0.3)(
        jp, weight=jnp.asarray(wmap.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.parametrize("gan_type", ["vanilla", "lsgan", "hinge", "wgan",
                                      "wgan_softplus"])
def test_gan_loss_golden(gan_type):
    import torch

    from basicsr.losses.losses import GANLoss as TGAN

    import jax.numpy as jnp
    from synergize_motion_appearance_tpu.losses import GANLoss

    pred = _rand((2, 1, 6, 6), 3, scale=2.0)
    tg = TGAN(gan_type, loss_weight=1.3)
    fg = GANLoss(gan_type, loss_weight=1.3)
    tp = torch.from_numpy(pred)
    jp = jnp.asarray(pred)
    for real in (True, False):
        for is_disc in (True, False):
            ref = float(tg(tp, real, is_disc=is_disc))
            got = float(fg(jp, real, is_disc=is_disc))
            np.testing.assert_allclose(
                got, ref, rtol=1e-5, atol=1e-7,
                err_msg=f"{gan_type} real={real} is_disc={is_disc}")


def test_equivariance_loss_golden():
    """Value + jacobian equivariance terms (losses.py:523-560) with the
    same TPS transform on both sides."""
    import torch

    import jax
    import jax.numpy as jnp
    from basicsr.losses.losses import EquivarianceLoss as TEq
    from basicsr.models.appmotioncomp_model import Transform

    from synergize_motion_appearance_tpu.losses import EquivarianceLoss
    from synergize_motion_appearance_tpu.ops import sample_random_tps

    params = sample_random_tps(jax.random.PRNGKey(7), batch=2,
                               sigma_affine=0.05, sigma_tps=0.005,
                               points_tps=5)
    t = Transform(2, sigma_affine=0.05, sigma_tps=0.005, points_tps=5)
    t.theta = torch.from_numpy(np.asarray(params.theta, np.float32))
    t.control_points = torch.from_numpy(
        np.asarray(params.control_points, np.float32))
    t.control_params = torch.from_numpy(
        np.asarray(params.control_params, np.float32))

    kp_d = {"value": _rand((2, 5, 2), 4, 0.8),
            "jacobian": _rand((2, 5, 2, 2), 5) + np.eye(2, dtype=np.float32)}
    kp_t = {"value": _rand((2, 5, 2), 6, 0.8),
            "jacobian": _rand((2, 5, 2, 2), 7) + np.eye(2, dtype=np.float32)}

    tkd = {k: torch.from_numpy(v) for k, v in kp_d.items()}
    tkt = {k: torch.from_numpy(v).requires_grad_(k == "value")
           for k, v in kp_t.items()}
    ref_v, ref_j = TEq(loss_weight_value=0.9, loss_weight_jacobian=1.1)(
        tkd, tkt, t)

    jkd = {k: jnp.asarray(v) for k, v in kp_d.items()}
    jkt = {k: jnp.asarray(v) for k, v in kp_t.items()}
    got_v, got_j = EquivarianceLoss(
        loss_weight_value=0.9, loss_weight_jacobian=1.1)(jkd, jkt, params)
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-4)
    np.testing.assert_allclose(float(got_j), float(ref_j), rtol=1e-4)
