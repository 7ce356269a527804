"""Op-level numerical parity vs torch built-ins (torch is CPU-only here).

These tests pin the exact resampling semantics every downstream metric
depends on (SURVEY.md section 7 'hard parts' item 1).
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from synergize_motion_appearance_tpu import ops  # noqa: E402


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
def test_grid_sample_parity(align, padding):
    img = _rand(2, 7, 9, 3, seed=1)
    grid = np.clip(_rand(2, 5, 6, 2, seed=2) * 0.8, -1.6, 1.6).astype(np.float32)

    out_t = TF.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode=padding,
        align_corners=align,
    ).permute(0, 2, 3, 1).numpy()

    out_j = np.asarray(
        ops.grid_sample(jnp.asarray(img), jnp.asarray(grid),
                        align_corners=align, padding_mode=padding)
    )
    np.testing.assert_allclose(out_j, out_t, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("shape", [((8, 8), (32, 32)), ((64, 64), (32, 32)),
                                   ((13, 7), (5, 9))])
def test_resize_bilinear_parity(align, shape):
    (H, W), (h, w) = shape
    x = _rand(2, H, W, 4, seed=3)
    out_t = TF.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(h, w),
        mode="bilinear", align_corners=align,
    ).permute(0, 2, 3, 1).numpy()
    out_j = np.asarray(ops.resize_bilinear(jnp.asarray(x), (h, w), align))
    np.testing.assert_allclose(out_j, out_t, rtol=1e-5, atol=1e-5)


def test_nearest_parity():
    x = _rand(2, 6, 10, 3, seed=4)
    out_t = TF.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
    ).permute(0, 2, 3, 1).numpy()
    out_j = np.asarray(ops.upsample_nearest(jnp.asarray(x), 2))
    np.testing.assert_allclose(out_j, out_t)

    out_t2 = TF.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(13, 5), mode="nearest",
    ).permute(0, 2, 3, 1).numpy()
    out_j2 = np.asarray(ops.resize_nearest(jnp.asarray(x), (13, 5)))
    np.testing.assert_allclose(out_j2, out_t2)


def test_avg_pool_parity():
    x = _rand(2, 8, 8, 5, seed=5)
    out_t = TF.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    out_t = out_t.permute(0, 2, 3, 1).numpy()
    out_j = np.asarray(ops.avg_pool_2x(jnp.asarray(x)))
    np.testing.assert_allclose(out_j, out_t, rtol=1e-6, atol=1e-6)


def test_make_coordinate_grid_parity():
    # reference math: x = 2*(arange(w)/(w-1)) - 1 (motion_estimator_util:56-72)
    h, w = 5, 9
    g = np.asarray(ops.make_coordinate_grid(h, w))
    x = 2 * (np.arange(w) / (w - 1)) - 1
    y = 2 * (np.arange(h) / (h - 1)) - 1
    np.testing.assert_allclose(g[0, :, 0], x, atol=1e-6)
    np.testing.assert_allclose(g[:, 0, 1], y, atol=1e-6)


def test_kp2gaussian_matches_manual():
    kp = jnp.asarray(_rand(2, 15, 2, seed=6) * 0.5)
    out = ops.kp2gaussian(kp, (11, 13), 0.01)
    # manual torch computation of the same formula
    grid = np.asarray(ops.make_coordinate_grid(11, 13))
    kp_np = np.asarray(kp)
    diff = grid[None, None] - kp_np[:, :, None, None, :]
    expect = np.exp(-0.5 * (diff ** 2).sum(-1) / 0.01)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-6)


def test_softargmax_normalized_heatmap():
    hm = np.abs(_rand(2, 3, 9, 9, seed=7))
    hm = hm / hm.sum(axis=(2, 3), keepdims=True)
    kp = np.asarray(ops.softargmax_kp(jnp.asarray(hm)))
    grid = np.asarray(ops.make_coordinate_grid(9, 9))
    expect = np.einsum("bkhw,hwc->bkc", hm, grid)
    np.testing.assert_allclose(kp, expect, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("scale", [0.25, 0.5])
def test_antialias_downsample_parity(scale):
    # reimplement the reference op with torch primitives as the oracle
    x = _rand(2, 16, 16, 3, seed=8)
    sigma = (1 / scale - 1) / 2
    ks = 2 * round(sigma * 4) + 1
    ka = ks // 2
    kb = ka
    ax = torch.arange(ks, dtype=torch.float32)
    mean = (ks - 1) / 2
    k1 = torch.exp(-((ax - mean) ** 2) / (2 * sigma ** 2))
    k2 = torch.outer(k1, k1)
    k2 = k2 / k2.sum()
    w = k2.view(1, 1, ks, ks).repeat(3, 1, 1, 1)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    out = TF.conv2d(TF.pad(xt, (ka, kb, ka, kb)), w, groups=3)
    out = out[:, :, :: int(1 / scale), :: int(1 / scale)]
    out_t = out.permute(0, 2, 3, 1).numpy()

    out_j = np.asarray(ops.antialias_downsample(jnp.asarray(x), scale))
    np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-5)


def test_vq_quantize_parity():
    z = _rand(2, 4, 4, 8, seed=9)
    cb = _rand(32, 8, seed=10)
    zq, loss, stats = ops.vq_quantize(jnp.asarray(z), jnp.asarray(cb), beta=0.25)

    # torch oracle following vqgan_arch.py:33-93
    zt = torch.from_numpy(z).reshape(-1, 8)
    et = torch.from_numpy(cb)
    d = (zt ** 2).sum(1, keepdim=True) + (et ** 2).sum(1) - 2 * zt @ et.t()
    idx = torch.argmin(d, dim=1)
    zq_t = et[idx].reshape(2, 4, 4, 8)
    loss_t = 0.25 * ((zq_t - torch.from_numpy(z)) ** 2).mean() + (
        (zq_t - torch.from_numpy(z)) ** 2
    ).mean()

    np.testing.assert_allclose(np.asarray(zq), zq_t.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(stats["min_encoding_indices"]).reshape(-1), idx.numpy()
    )


def test_vq_prefix_slice():
    z = _rand(1, 2, 2, 4, seed=11)
    cb = _rand(16, 4, seed=12)
    zq_full, _, st_full = ops.vq_quantize(jnp.asarray(z), jnp.asarray(cb))
    zq_pre, _, st_pre = ops.vq_quantize(jnp.asarray(z), jnp.asarray(cb), num=4)
    assert np.asarray(st_pre["min_encoding_indices"]).max() < 4
    zq_rng, _, st_rng = ops.vq_quantize(
        jnp.asarray(z), jnp.asarray(cb), start=4, num=4
    )
    assert np.asarray(st_rng["min_encoding_indices"]).max() < 4


def test_convex_hull_area_matches_scipy():
    scipy_spatial = pytest.importorskip("scipy.spatial")
    rng = np.random.RandomState(13)
    for i in range(5):
        pts = rng.randn(15, 2).astype(np.float32)
        area_ref = scipy_spatial.ConvexHull(pts).volume
        area_j = float(ops.convex_hull_area(jnp.asarray(pts)))
        np.testing.assert_allclose(area_j, area_ref, rtol=1e-4)


@pytest.mark.slow
def test_tps_warp_and_jacobian():
    import jax

    rng = jax.random.PRNGKey(0)
    params = ops.sample_random_tps(rng, 2, 0.05, 0.005, 5)
    pts = jnp.asarray(_rand(2, 15, 2, seed=14) * 0.5)
    warped = ops.tps_warp_coordinates(params, pts)
    assert warped.shape == (2, 15, 2)

    jac = ops.tps_jacobian(params, pts)
    assert jac.shape == (2, 15, 2, 2)

    # torch-autograd oracle on the same closed-form warp (the reference's
    # Transform.jacobian uses autograd.grad the same way,
    # appmotioncomp_model.py:94-99)
    theta = torch.from_numpy(np.asarray(params.theta))
    cp = torch.from_numpy(np.asarray(params.control_points))
    cparam = torch.from_numpy(np.asarray(params.control_params))
    coords = torch.from_numpy(np.asarray(pts)).requires_grad_(True)

    def warp_torch(c):
        th = theta.unsqueeze(1)
        transformed = torch.matmul(th[:, :, :, :2], c.unsqueeze(-1)) + th[:, :, :, 2:]
        transformed = transformed.squeeze(-1)
        distances = c.view(c.shape[0], -1, 1, 2) - cp.view(1, 1, -1, 2)
        distances = torch.abs(distances).sum(-1)
        result = distances ** 2 * torch.log(distances + 1e-6)
        result = result * cparam
        result = result.sum(dim=2).view(c.shape[0], c.shape[1], 1)
        return transformed + result

    new_c = warp_torch(coords)
    gx = torch.autograd.grad(new_c[..., 0].sum(), coords, create_graph=True)[0]
    gy = torch.autograd.grad(new_c[..., 1].sum(), coords, create_graph=True)[0]
    jac_t = torch.cat([gx.unsqueeze(-2), gy.unsqueeze(-2)], dim=-2)
    np.testing.assert_allclose(
        np.asarray(ops.tps_warp_coordinates(params, pts)),
        new_c.detach().numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jac), jac_t.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_blur_stride_u8_matches_float_path():
    """uint8-domain host antialias (inference fast path) tracks the
    float-path blur within one quantization step."""
    from synergize_motion_appearance_tpu.ops.coords import (
        antialias_downsample_host, blur_stride_u8)

    rng = np.random.RandomState(0)
    u8 = (rng.rand(3, 64, 64, 3) * 255).astype(np.uint8)
    got = blur_stride_u8(u8, 0.25).astype(np.float32) * (2 / 255.0) - 1
    ref = antialias_downsample_host(
        u8.astype(np.float32) * (2 / 255.0) - 1, 0.25)
    assert got.shape == ref.shape == (3, 16, 16, 3)
    assert np.abs(got - ref).max() < 0.008
