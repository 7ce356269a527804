"""Tap-composed warp->downsample and matmul patch-embed equivalences.

These are pure-optimization rewrites: each test checks the fast path
against the dense/conv formulation it replaced.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synergize_motion_appearance_tpu.ops import (
    grid_sample, interpolate_flow, resize_bilinear, resize_bilinear_at,
    resize_tap_plan, tap_reduce,
)
from synergize_motion_appearance_tpu.models.appmotion_former import (
    deform_input, deform_input_resized,
)


def _rand_flow(rng, b, h, w, scale=1.0):
    # smooth-ish flow in [-1, 1] with some out-of-range samples
    base = np.stack(np.meshgrid(np.linspace(-1, 1, w),
                                np.linspace(-1, 1, h)), axis=-1)
    jitter = rng.randn(b, h, w, 2).astype(np.float32) * 0.1 * scale
    return jnp.asarray(base[None] + jitter, jnp.float32)


@pytest.mark.parametrize("in_size,out_size", [(256, 32), (256, 64),
                                              (128, 32), (64, 64), (7, 3)])
def test_resize_tap_plan_matches_dense(in_size, out_size):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, in_size, 5, 3), jnp.float32)
    dense = resize_bilinear(x, (out_size, 5), align_corners=True)
    idx, w = resize_tap_plan(in_size, out_size)
    compact = jnp.einsum("oh,bhwc->bowc", w, x[:, idx])
    np.testing.assert_allclose(np.asarray(compact), np.asarray(dense),
                               atol=1e-6)


def test_resize_bilinear_at_matches_row_select():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 64, 2), jnp.float32)
    rows = np.array([0, 3, 7, 100 % 64, 63])
    cols = np.array([1, 2, 62])
    dense = resize_bilinear(x, (256, 256), align_corners=True)
    fast = resize_bilinear_at(x, (256, 256), rows, cols)
    np.testing.assert_allclose(np.asarray(fast),
                               np.asarray(dense)[:, rows][:, :, cols],
                               atol=1e-6)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("H,out", [
    pytest.param(256, 64, marks=pytest.mark.slow),  # flagship shape, compile-heavy
    pytest.param(256, 32, marks=pytest.mark.slow),
    (128, 32),
])
def test_deform_input_resized_exact(H, out, dtype):
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(1, H, H, 8), dtype)
    flow = _rand_flow(rng, 3, 64, 64)  # dense-motion resolution
    dense = resize_bilinear(deform_input(feat, flow), (out, out),
                            align_corners=True)
    fast = deform_input_resized(feat, flow, out)
    assert fast.dtype == dense.dtype
    np.testing.assert_array_equal(np.asarray(fast, np.float32),
                                  np.asarray(dense, np.float32))


@pytest.mark.slow
def test_deform_input_resized_pointwise_fn():
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(1, 128, 128, 4), jnp.float32)
    flow = _rand_flow(rng, 2, 64, 64)
    k = jnp.asarray(rng.randn(4, 6), jnp.float32)

    def fn(v):
        return jax.nn.relu(v @ k)

    dense = resize_bilinear(fn(deform_input(feat, flow)), (32, 32),
                            align_corners=True)
    fast = deform_input_resized(feat, flow, 32, point_fn=fn)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dense),
                               atol=1e-6)


@pytest.mark.parametrize("p,c,e", [(8, 64, 256), (4, 128, 256), (2, 3, 8)])
def test_dense_patch_matches_conv(p, c, e):
    """Matmul patch-embed == stride-p conv (the formulation it replaced)."""
    rng = np.random.RandomState(4)
    B, t = 2, 4
    x = jnp.asarray(rng.randn(B, t * p, t * p, c), jnp.float32)
    kernel = jnp.asarray(rng.randn(p * p * c, e), jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, kernel.reshape(p, p, c, e), window_strides=(p, p),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    xr = x.reshape(B, t, p, t, p * c).transpose(0, 1, 3, 2, 4)
    got = xr.reshape(B, t, t, p * p * c) @ kernel
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("p,c,e", [(8, 64, 256), (2, 5, 16)])
def test_dense_transpose_patch_matches_conv_transpose(p, c, e):
    """Matmul + depth-to-space == the stride-p transposed conv."""
    rng = np.random.RandomState(5)
    B, t = 2, 4
    x = jnp.asarray(rng.randn(B, t, t, e), jnp.float32)
    kernel = jnp.asarray(rng.randn(e, p * p * c), jnp.float32)
    bias = jnp.asarray(rng.randn(p * p * c), jnp.float32)

    k4 = kernel.reshape(e, p, p, c).transpose(1, 2, 0, 3)[::-1, ::-1]
    ref = jax.lax.conv_transpose(
        x, k4, strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = ref + jnp.tile(bias.reshape(p, p, c), (t, t, 1))

    y = (x @ kernel + bias).reshape(B, t, t, p, p * c)
    got = y.transpose(0, 1, 3, 2, 4).reshape(B, t * p, t * p, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize(
    "img_batch", [pytest.param(1, marks=pytest.mark.slow), 3])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grid_sample_grouped_matches_per_k(img_batch, dtype):
    from synergize_motion_appearance_tpu.ops import grid_sample_grouped

    rng = np.random.RandomState(7)
    B, K, H, W, C = 3, 5, 16, 16, 3
    img = jnp.asarray(rng.randn(img_batch, H, W, C), dtype)
    grids = jnp.asarray(rng.uniform(-1.3, 1.3, (B, K, H, W, 2)),
                        jnp.float32)
    got = grid_sample_grouped(img, grids, align_corners=False,
                              padding_mode="zeros")
    assert got.shape == (B, H, W, K * C)
    for k in range(K):
        ref = grid_sample(
            img if img_batch > 1 else img,
            grids[:, k] if img_batch > 1 else grids[:, k],
            align_corners=False, padding_mode="zeros")
        np.testing.assert_allclose(
            np.asarray(got[..., k * C:(k + 1) * C], np.float32),
            np.asarray(ref, np.float32),
            atol=(1e-6 if dtype == jnp.float32 else 2e-2))
