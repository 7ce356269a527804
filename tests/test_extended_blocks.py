"""Shape/sanity tests for the extended block library + VQGAN variants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy tier

from synergize_motion_appearance_tpu.models.extended_blocks import (
    Hourglass2Branch,
    HourglassWEmb,
    KPHourglass,
    PixelShuffleUpsample,
    PixelUnshuffleDownsample,
    ResBottleneck,
    SPADE,
    SPADEResnetBlock,
    WNConv2d,
    WNResBlock2d,
    get_rotation_matrix,
    headpose_pred_to_degree,
    keypoint_transformation,
    make_coordinate_grid_3d,
    sinusoidal_grid_2d,
    tps_kp_params,
    tps_kp_warp,
)
from synergize_motion_appearance_tpu.models.vqgan_extras import (
    AutoEncoderMSDecoder,
    FuseFeatBlock,
    GumbelQuantizer,
)

K = jax.random.PRNGKey


def test_wn_conv_matches_plain_at_init():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4),
                    jnp.float32)
    net = WNConv2d(6)
    v = net.init(K(0), x)
    out = net.apply(v, x)
    assert out.shape == (1, 8, 8, 6)
    # weight-norm with g=||v|| must reproduce the un-normalized conv
    import jax.numpy as jnp2
    kernel = v["params"]["v"]
    bias = v["params"]["bias"]
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pixel_shuffle_roundtrip():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 8),
                    jnp.float32)
    from synergize_motion_appearance_tpu.models.extended_blocks import (
        pixel_shuffle, pixel_unshuffle,
    )

    y = pixel_shuffle(x, 2)
    assert y.shape == (1, 8, 8, 2)
    z = pixel_unshuffle(y, 2)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x))


def test_hourglass_variants():
    x = jnp.zeros((1, 16, 16, 3))
    net = Hourglass2Branch(8, 3, num_blocks=2, max_features=16)
    v = net.init(K(0), x)
    kp, mask = net.apply(v, x)
    assert kp.shape[1:3] == (16, 16) and mask.shape[1:3] == (16, 16)

    net2 = HourglassWEmb(8, 3, num_blocks=2, max_features=16)
    v2 = net2.init(K(0), x)
    feats, out = net2.apply(v2, x)
    assert len(feats) == 3 and out.shape[1:3] == (16, 16)


def test_kp_hourglass_3d():
    x = jnp.zeros((1, 32, 32, 3))
    net = KPHourglass(8, 3, reshape_features=32, reshape_depth=4,
                      num_blocks=2, max_features=32)
    v = net.init(K(0), x)
    out = net.apply(v, x)
    assert out.ndim == 5 and out.shape[1] == 4  # (B, D, H, W, C)


def test_spade_blocks():
    x = jnp.zeros((1, 8, 8, 16))
    seg = jnp.zeros((1, 16, 16, 4))
    net = SPADEResnetBlock(16, 12, label_nc=4)
    v = net.init(K(0), x, seg)
    out = net.apply(v, x, seg)
    assert out.shape == (1, 8, 8, 12)


def test_headpose_math():
    b = 3
    rng = np.random.RandomState(2)
    pred = jnp.asarray(rng.randn(b, 66), jnp.float32)
    deg = headpose_pred_to_degree(pred)
    assert deg.shape == (b,)
    rot = get_rotation_matrix(deg, deg, deg)
    # rotation matrices are orthonormal
    eye = jnp.einsum("bij,bkj->bik", rot, rot)
    np.testing.assert_allclose(np.asarray(eye),
                               np.broadcast_to(np.eye(3), (b, 3, 3)),
                               atol=1e-5)
    kp = {"value": jnp.asarray(rng.randn(b, 5, 3), jnp.float32),
          "jacobian": None}
    he = {"yaw": pred, "pitch": pred, "roll": pred,
          "t": jnp.zeros((b, 3)), "exp": jnp.zeros((b, 15))}
    out = keypoint_transformation(kp, he)
    assert out["value"].shape == (b, 5, 3)


def test_tps_kp_interpolates_keypoints():
    rng = np.random.RandomState(3)
    kp1 = jnp.asarray(rng.rand(2, 1, 5, 2) * 2 - 1, jnp.float32)
    kp2 = jnp.asarray(rng.rand(2, 1, 5, 2) * 2 - 1, jnp.float32)
    theta, cp, cparam = tps_kp_params(kp1, kp2, reg=1e-6)
    warped = tps_kp_warp(theta, cp, cparam, kp1[:, 0])
    # with tiny regularization the TPS interpolates the control points
    np.testing.assert_allclose(np.asarray(warped[:, 0]),
                               np.asarray(kp2[:, 0]), atol=5e-3)


def test_grid3d_and_spe():
    g = make_coordinate_grid_3d(3, 4, 5)
    assert g.shape == (3, 4, 5, 3)
    assert float(g[0, 0, 0, 2]) == -1.0 and float(g[-1, 0, 0, 2]) == 1.0
    spe = sinusoidal_grid_2d(8, 8, 16)
    assert spe.shape == (8, 8, 32)


def test_gumbel_quantizer():
    net = GumbelQuantizer(16, 8, num_hiddens=8)
    x = jnp.asarray(np.random.RandomState(4).randn(1, 4, 4, 8),
                    jnp.float32)
    v = net.init({"params": K(0), "gumbel": K(1)}, x, train=True)
    zq, diff, stats = net.apply(v, x, train=True,
                                rngs={"gumbel": K(2)})
    assert zq.shape == x.shape
    assert np.isfinite(float(diff))
    zq_eval, _, _ = net.apply(v, x, train=False)
    assert zq_eval.shape == x.shape


def test_ms_decoder_autoencoder():
    net = AutoEncoderMSDecoder(img_size=32, nf=8, ch_mult=(1, 2, 2, 4),
                               res_blocks=2, attn_resolutions=(4,),
                               emb_dim=16)
    x = jnp.zeros((1, 32, 32, 3))
    v = net.init(K(0), x)
    out = net.apply(v, x)
    assert out.shape == (1, 32, 32, 3)
