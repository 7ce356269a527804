"""More golden-activation parity vs the upstream reference: the
equivariance Transform (TPS warp + jacobian + frame warp) and the
PatchGAN discriminator."""
import sys
from os import path as osp

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tools"))

from _reference_oracle import import_reference  # noqa: E402

basicsr = import_reference()
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    basicsr is None, reason="/root/reference not available")]


@pytest.fixture(autouse=True, scope="module")
def _highest_matmul_precision():
    import jax

    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


def _torch_transform(theta, cp, cparam):
    """Reference Transform with injected (deterministic) randomness."""
    import torch

    from basicsr.models.appmotioncomp_model import Transform

    t = Transform(theta.shape[0], sigma_affine=0.05, sigma_tps=0.005,
                  points_tps=int(np.sqrt(cp.shape[1])))
    t.theta = torch.from_numpy(theta)
    t.control_points = torch.from_numpy(cp)
    t.control_params = torch.from_numpy(cparam)
    return t


@pytest.fixture(scope="module")
def tps_pair():
    import jax

    from synergize_motion_appearance_tpu.ops import sample_random_tps

    params = sample_random_tps(jax.random.PRNGKey(0), batch=2,
                               sigma_affine=0.05, sigma_tps=0.005,
                               points_tps=5)
    theta = np.asarray(params.theta, np.float32)
    cp = np.asarray(params.control_points, np.float32)
    cparam = np.asarray(params.control_params, np.float32)
    return params, _torch_transform(theta, cp, cparam)


def test_tps_warp_coordinates_golden(tps_pair):
    import torch

    import jax.numpy as jnp
    from synergize_motion_appearance_tpu.ops import tps_warp_coordinates

    params, t = tps_pair
    rng = np.random.RandomState(0)
    coords = (rng.rand(2, 37, 2).astype(np.float32) * 2 - 1)
    ref = t.warp_coordinates(torch.from_numpy(coords)).detach().numpy()
    ours = np.asarray(tps_warp_coordinates(params, jnp.asarray(coords)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_tps_jacobian_golden(tps_pair):
    """autograd.grad of the torch warp == our jacfwd jacobian
    (appmotioncomp_model.py:94-99)."""
    import torch

    import jax.numpy as jnp
    from synergize_motion_appearance_tpu.ops import tps_jacobian

    params, t = tps_pair
    rng = np.random.RandomState(1)
    coords = (rng.rand(2, 15, 2).astype(np.float32) * 2 - 1)
    tc = torch.from_numpy(coords).requires_grad_(True)
    ref = t.jacobian(tc).detach().numpy()
    ours = np.asarray(tps_jacobian(params, jnp.asarray(coords)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_tps_transform_frame_golden(tps_pair):
    """Full-frame TPS warp incl. reflection-padded grid_sample
    (appmotioncomp_model.py:69-73: torch defaults, align_corners=False)."""
    import torch

    import jax.numpy as jnp
    from synergize_motion_appearance_tpu.ops import tps_warp_frame_grid
    from synergize_motion_appearance_tpu.ops import grid_sample

    params, t = tps_pair
    rng = np.random.RandomState(2)
    frame = rng.rand(2, 16, 16, 3).astype(np.float32)
    ref = t.transform_frame(
        torch.from_numpy(frame.transpose(0, 3, 1, 2))).detach().numpy()
    grid = tps_warp_frame_grid(params, 16, 16)
    ours = grid_sample(jnp.asarray(frame), grid, align_corners=False,
                       padding_mode="reflection")
    np.testing.assert_allclose(np.asarray(ours),
                               ref.transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)


def test_discriminator_golden():
    """VQGANDiscriminator (PatchGAN w/ BatchNorm, vqgan_arch.py:535-575)
    matches the reference in eval mode via converted weights."""
    import torch

    from basicsr.archs.vqgan_arch import VQGANDiscriminator as TorchD

    from convert_reference_checkpoint import convert_net_d

    from synergize_motion_appearance_tpu.models import build_network

    torch.manual_seed(0)
    td = TorchD(nc=3, ndf=8, n_layers=2)
    td.eval()
    sd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    variables, unused = convert_net_d(sd, n_layers=2)
    assert unused == [], unused[:8]

    net_d = build_network(dict(type="VQGANDiscriminator", nc=3, ndf=8,
                               n_layers=2))
    rng = np.random.RandomState(3)
    x = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = td(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(net_d.apply(variables, x, train=False))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1),
                               atol=1e-5, rtol=1e-4)
