"""Pallas warp kernel: interpret-mode parity + fallback behavior."""
import numpy as np
import pytest

import jax.numpy as jnp

from synergize_motion_appearance_tpu.ops import grid_sample
from synergize_motion_appearance_tpu.ops.pallas_warp import grid_sample_fast


def _data(B=2, Bg=2, H=16, W=16, C=8, seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    grid = jnp.asarray((rng.rand(Bg, H, W, 2) * 2.4 - 1.2
                        ).astype(np.float32))
    return img, grid


def test_interpret_parity():
    img, grid = _data()
    ref = grid_sample(img, grid, True, "zeros")
    out = grid_sample_fast(img, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_interpret_parity_broadcast():
    img, grid = _data(B=1, Bg=3)
    ref = grid_sample(img, grid, True, "zeros")
    out = grid_sample_fast(img, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fallback_modes():
    img, grid = _data()
    # misaligned output size / other padding modes take the jnp path
    small_grid = grid[:, :8, :8]
    out = grid_sample_fast(img, small_grid)
    ref = grid_sample(img, small_grid, True, "zeros")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    out2 = grid_sample_fast(img, grid, padding_mode="reflection")
    ref2 = grid_sample(img, grid, True, "reflection")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)
