"""Parity tests for models/arch_util vs the reference's arch_util.py
semantics (torch oracles written inline; reference basicsr/archs/
arch_util.py:64-236)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from synergize_motion_appearance_tpu.models import (  # noqa: E402
    DCNv2Pack,
    ModulatedDeformConvPack,
    ResidualBlockNoBN,
    Upsample,
    flow_warp,
    make_layer,
    resize_flow,
    trunc_normal_init,
)
from synergize_motion_appearance_tpu.models.layers import Conv2d  # noqa: E402


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def _torch_flow_warp(x, flow, interp_mode="bilinear",
                     padding_mode="zeros", align_corners=True):
    """Inline port of arch_util.py:117-148 (NCHW)."""
    _, _, h, w = x.size()
    grid_y, grid_x = torch.meshgrid(
        torch.arange(0, h).type_as(x), torch.arange(0, w).type_as(x),
        indexing="ij")
    grid = torch.stack((grid_x, grid_y), 2).float()
    vgrid = grid + flow
    vgrid_x = 2.0 * vgrid[:, :, :, 0] / max(w - 1, 1) - 1.0
    vgrid_y = 2.0 * vgrid[:, :, :, 1] / max(h - 1, 1) - 1.0
    vgrid_scaled = torch.stack((vgrid_x, vgrid_y), dim=3)
    return TF.grid_sample(x, vgrid_scaled, mode=interp_mode,
                          padding_mode=padding_mode,
                          align_corners=align_corners)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_flow_warp_parity(padding):
    x = _rand(2, 8, 10, 3, seed=1)
    flow = (_rand(2, 8, 10, 2, seed=2) * 2.5).astype(np.float32)
    out_t = _torch_flow_warp(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(flow),
        padding_mode=padding,
    ).permute(0, 2, 3, 1).numpy()
    out_j = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow),
                                 padding_mode=padding))
    np.testing.assert_allclose(out_j, out_t, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("size_type,sizes", [("ratio", (2.0, 2.0)),
                                             ("shape", (5, 7))])
def test_resize_flow_parity(size_type, sizes):
    flow = (_rand(2, 6, 8, 2, seed=3) * 3).astype(np.float32)
    # torch oracle (arch_util.py:151-187), NCHW flow (x=ch0, y=ch1)
    ft = torch.from_numpy(flow).permute(0, 3, 1, 2).clone()
    _, _, fh, fw = ft.size()
    if size_type == "ratio":
        oh, ow = int(fh * sizes[0]), int(fw * sizes[1])
    else:
        oh, ow = sizes
    ft[:, 0] *= ow / fw
    ft[:, 1] *= oh / fh
    out_t = TF.interpolate(ft, size=(oh, ow), mode="bilinear",
                           align_corners=False)
    out_t = out_t.permute(0, 2, 3, 1).numpy()
    out_j = np.asarray(resize_flow(jnp.asarray(flow), size_type, sizes))
    np.testing.assert_allclose(out_j, out_t, rtol=1e-5, atol=1e-5)


def test_residual_block_no_bn():
    x = jnp.asarray(_rand(1, 6, 6, 16, seed=4))
    block = ResidualBlockNoBN(num_feat=16, res_scale=0.5)
    vars_ = block.init(jax.random.PRNGKey(0), x)
    out = block.apply(vars_, x)
    assert out.shape == x.shape
    # residual structure: out - x equals res_scale * branch; with
    # res_scale=0 the block is the identity
    ident = ResidualBlockNoBN(num_feat=16, res_scale=0.0).apply(vars_, x)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(x), rtol=1e-6)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_upsample_shapes(scale):
    x = jnp.asarray(_rand(1, 4, 4, 8, seed=5))
    mod = Upsample(scale=scale, num_feat=8)
    vars_ = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(vars_, x)
    assert out.shape == (1, 4 * scale, 4 * scale, 8)


def test_upsample_bad_scale():
    with pytest.raises(ValueError, match="scale 5"):
        Upsample(scale=5, num_feat=8).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))


def test_make_layer_stacks():
    x = jnp.asarray(_rand(1, 5, 5, 8, seed=6))
    stack = make_layer(ResidualBlockNoBN, 3, num_feat=8)
    vars_ = stack.init(jax.random.PRNGKey(0), x)
    params = vars_["params"]
    assert set(params) == {"block0", "block1", "block2"}
    out = stack.apply(vars_, x)
    assert out.shape == x.shape


def test_trunc_normal_init_bounds():
    init = trunc_normal_init(std=0.02, a=-2.0, b=2.0)
    w = init(jax.random.PRNGKey(0), (2048,))
    w = np.asarray(w)
    assert np.all(w >= -0.04 - 1e-6) and np.all(w <= 0.04 + 1e-6)
    assert abs(float(w.std()) - 0.02) < 0.004


@pytest.mark.slow
def test_dcnv2_pack_zero_offset_is_half_conv():
    """With conv_offset zero-initialised, offsets are 0 and mask is
    sigmoid(0)=0.5, so the pack must equal 0.5*conv + bias (the same
    property holds for the torch pack at init).

    Slow tier: DCN math parity vs torch is covered fast by
    test_native_ops.py::test_deform_conv_parity; this is a secondary
    behavioral check of the pack wrapper (13s of CPU compile)."""
    x = jnp.asarray(_rand(2, 7, 7, 8, seed=7))
    feat = jnp.asarray(_rand(2, 7, 7, 8, seed=8))
    pack = DCNv2Pack(features=12)
    vars_ = pack.init(jax.random.PRNGKey(1), x, feat)
    out = pack.apply(vars_, x, feat)
    assert out.shape == (2, 7, 7, 12)

    w = vars_["params"]["weight"]
    b = vars_["params"]["bias"]
    ref = 0.5 * jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_modulated_pack_self_offsets():
    """Slow tier: the underlying modulated deform math is covered fast by
    test_native_ops.py::test_deform_conv_parity[2-True]; this is a
    secondary shape/finiteness check of the self-offset pack wrapper
    (compile-heavy on CPU)."""
    x = jnp.asarray(_rand(1, 6, 6, 4, seed=9))
    pack = ModulatedDeformConvPack(features=6)
    vars_ = pack.init(jax.random.PRNGKey(2), x)
    out = pack.apply(vars_, x)
    assert out.shape == (1, 6, 6, 6)
    assert np.isfinite(np.asarray(out)).all()
