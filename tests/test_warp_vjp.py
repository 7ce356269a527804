"""Custom warp VJP (ops/interp.py::_gs_cv_bwd) vs plain autodiff.

The custom backward must produce the SAME gradients as XLA's autodiff
of the identical forward (`_grid_sample_ref`) — for both cotangents
(d_img and d_grid), every padding mode, both align_corners settings,
f32 and bf16 images, and the batch-1 broadcast path. Grids include
out-of-range and exactly-integer coordinates (floor subgradient edges).

Reference op under reproduction: torch F.grid_sample's backward
(the reference trains through warps at appmotioncodebook_arch.py:356
and dense_motion_arch.py:106-116); forward parity vs torch is covered
by tests/test_native_ops.py — here the contract is custom == autodiff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synergize_motion_appearance_tpu.ops import interp


def _mk(B, H, W, C, Bg, Hg, Wg, dtype, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randn(B, H, W, C).astype(np.float32)
    # grid: mostly in-range, some out-of-range, some exactly on pixels
    grid = rng.uniform(-1.3, 1.3, size=(Bg, Hg, Wg, 2)).astype(np.float32)
    n = Hg * Wg
    gflat = grid.reshape(Bg, n, 2)
    gflat[:, : n // 8] = np.round(gflat[:, : n // 8] * 4) / 4.0
    return jnp.asarray(img, dtype), jnp.asarray(grid.reshape(Bg, Hg, Wg, 2))


@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align", [True, False])
def test_grads_match_autodiff(padding, align):
    img, grid = _mk(2, 13, 17, 8, 2, 9, 11, jnp.float32, seed=1)
    cot = jnp.asarray(
        np.random.RandomState(2).randn(2, 9, 11, 8).astype(np.float32))

    def loss_ref(i, g):
        return jnp.vdot(interp._grid_sample_ref(i, g, align, padding), cot)

    def loss_cv(i, g):
        return jnp.vdot(interp._gs_cv(tuple(img.shape), align, padding,
                                      i, g), cot)

    ri, rg = jax.grad(loss_ref, argnums=(0, 1))(img, grid)
    ci, cg = jax.grad(loss_cv, argnums=(0, 1))(img, grid)
    np.testing.assert_allclose(np.asarray(ci), np.asarray(ri),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cg), np.asarray(rg),
                               rtol=1e-4, atol=1e-4)


def test_grads_match_autodiff_bf16():
    img, grid = _mk(2, 16, 16, 16, 2, 16, 16, jnp.bfloat16, seed=3)
    cot = jnp.asarray(np.random.RandomState(4).randn(2, 16, 16, 16),
                      jnp.bfloat16)

    def loss_ref(i, g):
        return jnp.vdot(
            interp._grid_sample_ref(i, g, True, "zeros").astype(jnp.float32),
            cot.astype(jnp.float32))

    def loss_cv(i, g):
        return jnp.vdot(
            interp._gs_cv(tuple(img.shape), True, "zeros",
                          i, g).astype(jnp.float32),
            cot.astype(jnp.float32))

    ri, rg = jax.grad(loss_ref, argnums=(0, 1))(img, grid)
    ci, cg = jax.grad(loss_cv, argnums=(0, 1))(img, grid)
    # bf16 scatter accumulation order differs between the packed-4C and
    # direct-C scatters; tolerance covers the reordering at bf16 eps
    np.testing.assert_allclose(
        np.asarray(ci, np.float32), np.asarray(ri, np.float32),
        rtol=0.05, atol=0.05)
    # d_grid: both sides reduce <g, p_k> over C at bf16 inputs and the
    # pixel-space chain scales the noise by ~W/2; the custom path
    # accumulates in f32 so it differs from autodiff's bf16 reduce by
    # O(bf16 eps * |p| * C * W/2) — compare loosely
    np.testing.assert_allclose(np.asarray(cg), np.asarray(rg),
                               rtol=0.1, atol=1.0)


def test_broadcast_path_grads():
    """B=1 img against Bg>1 grids (inference-style broadcast) — d_img
    must sum contributions over all grids."""
    img, grid = _mk(1, 12, 12, 4, 5, 8, 8, jnp.float32, seed=5)
    cot = jnp.asarray(
        np.random.RandomState(6).randn(5, 8, 8, 4).astype(np.float32))

    def loss_ref(i, g):
        return jnp.vdot(interp._grid_sample_ref(i, g, True, "zeros"), cot)

    def loss_cv(i, g):
        return jnp.vdot(interp._gs_cv(tuple(img.shape), True, "zeros",
                                      i, g), cot)

    ri, rg = jax.grad(loss_ref, argnums=(0, 1))(img, grid)
    ci, cg = jax.grad(loss_cv, argnums=(0, 1))(img, grid)
    np.testing.assert_allclose(np.asarray(ci), np.asarray(ri),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cg), np.asarray(rg),
                               rtol=1e-4, atol=1e-4)


def test_custom_vjp_forward_matches_ref():
    """The opt-in custom-VJP entry (SAMT_WARP_VJP=1 routes grid_sample
    here) produces the same forward as the default autodiff path."""
    img, grid = _mk(3, 10, 14, 6, 3, 7, 7, jnp.float32, seed=7)
    out = interp._gs_cv(tuple(img.shape), False, "reflection", img, grid)
    ref = interp._grid_sample_ref(img, grid, align_corners=False,
                                  padding_mode="reflection")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_jit_remat_composition(monkeypatch):
    """grid_sample (custom-VJP mode) under jax.checkpoint(selective
    policy) inside jit — the shape the trainer uses it in."""
    monkeypatch.setattr(interp, "_WARP_VJP", True)
    img, grid = _mk(2, 12, 12, 8, 2, 12, 12, jnp.float32, seed=8)
    policy = jax.checkpoint_policies.save_only_these_names(
        "conv_out", "dense_out", "warp_corners")

    @jax.jit
    def f(i, g):
        def inner(i_, g_):
            w = interp.grid_sample(i_, g_)
            return jnp.sum(w * w)
        return jax.grad(jax.checkpoint(inner, policy=policy),
                        argnums=(0, 1))(i, g)

    @jax.jit
    def f_ref(i, g):
        def inner(i_, g_):
            w = interp._grid_sample_ref(i_, g_)
            return jnp.sum(w * w)
        return jax.grad(inner, argnums=(0, 1))(i, g)

    ci, cg = f(img, grid)
    ri, rg = f_ref(img, grid)
    np.testing.assert_allclose(np.asarray(ci), np.asarray(ri),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cg), np.asarray(rg),
                               rtol=1e-4, atol=1e-4)
