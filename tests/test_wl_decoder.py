"""W-in-lanes decoder layout (docs/PERF.md §15) — numerics parity.

The wl_decoder path re-lays decoder activations as (B, H, C, W) and
routes 3x3 convs through ops/pallas_conv_wl.py (interpret mode off-TPU).
Same params, same math, different execution — outputs must match the
NHWC graph.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# CPU runs execute the Pallas kernel in INTERPRET mode (minutes, not
# seconds) — heavy tier. The fast tier covers the underlying modules in
# NHWC; TPU parity is asserted by tools/bench_wl_decoder.py.
pytestmark = pytest.mark.slow

from synergize_motion_appearance_tpu.models.appmotion_former import (
    AppMotionCompFormer,
    FuseSftBlock,
)
from synergize_motion_appearance_tpu.models.layers import (
    to_wl,
    from_wl,
    wl_layout,
)
from synergize_motion_appearance_tpu.models.vqgan import (
    Upsample,
    VQGANResBlock,
)

from test_models_forward import tiny_former, tiny_motion_estimator  # noqa


def test_resblock_upsample_fuse_wl_parity():
    """Block-level: VQGANResBlock / Upsample / FuseSftBlock give the
    same result in (B,H,C,W) layout as in NHWC."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    e = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))

    for mod, args in [
        (VQGANResBlock(16), (x,)),
        (VQGANResBlock(24), (x,)),
        (Upsample(), (x,)),
        (FuseSftBlock(16), (e, x)),
    ]:
        vars_ = mod.init(jax.random.PRNGKey(1), *args)
        ref = mod.apply(vars_, *args)
        with wl_layout(True):
            got = from_wl(mod.apply(vars_, *(to_wl(a) for a in args)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_former_inference_wl_parity():
    """Full flagship-structure forward (tiny shapes): inference output
    with wl_decoder=True equals wl_decoder=False."""
    rng = np.random.RandomState(2)
    me = tiny_motion_estimator()
    src = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    drv = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    me_vars = me.init(jax.random.PRNGKey(0), src, drv)
    dm = me.apply(me_vars, src, drv)

    f_ref = tiny_former(wl_decoder=False)
    f_wl = tiny_former(wl_decoder=True)
    vars_ = f_ref.init(jax.random.PRNGKey(1), src, dm, inference=True)
    out_ref = f_ref.apply(vars_, src, dm, inference=True)["out"]
    out_wl = f_wl.apply(vars_, src, dm, inference=True)["out"]
    assert out_wl.shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out_wl), np.asarray(out_ref),
                               rtol=5e-5, atol=5e-5)


def test_conv3x3_wl_ad_grads_match_nhwc_autodiff():
    """The custom VJP behind SAMT_WL_TRAIN: dx/dw/db of conv3x3_wl_ad
    equal XLA autodiff of the same conv in NHWC (dgrad reuses the
    Pallas kernel with rot180+IO-transposed weights; wgrad is 9 MXU
    contractions)."""
    from synergize_motion_appearance_tpu.ops.pallas_conv_wl import (
        conv3x3_wl_ad,
    )

    rng = np.random.RandomState(3)
    B, H, W, Ci, Co = 2, 8, 16, 8, 12
    x = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
    w = jnp.asarray(0.2 * rng.randn(3, 3, Ci, Co).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(Co).astype(np.float32))
    dy = jnp.asarray(rng.randn(B, H, W, Co).astype(np.float32))

    def f_ref(x, w, b):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    def f_wl(x, w, b):
        return from_wl(conv3x3_wl_ad(4, True, to_wl(x), w, b))

    y_ref, vjp_ref = jax.vjp(f_ref, x, w, b)
    y_wl, vjp_wl = jax.vjp(f_wl, x, w, b)
    np.testing.assert_allclose(np.asarray(y_wl), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    for g_wl, g_ref, name in zip(vjp_wl(dy), vjp_ref(dy),
                                 ("dx", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(g_wl), np.asarray(g_ref),
            rtol=3e-5, atol=3e-5, err_msg=name)


def test_former_train_mode_wl_grads_noise_bounded():
    """SAMT_WL_TRAIN end-to-end: train-mode loss parity plus parameter
    gradients bounded by the backward graph's own noise-amplification
    envelope (docs/PERF.md §15b).

    The round-3 version asserted a fixed 2e-3/5e-4 tolerance and failed
    at 1.1e-3 on first-encoder-conv grads. Root cause (VERDICT r3 item
    1, tools/debug_wl_grad.py): the conv3x3_wl_ad VJP is per-op EXACT
    (unit test above at 3e-5; f64 collapses the end-to-end WL-vs-NHWC
    grad difference to ~3e-7), but in f32 every reduction reassociates
    differently across the two layouts and the deep backward graph
    amplifies that per-op rounding noise ~1e4x: injecting pseudo-noise
    of the MEASURED per-op deviation magnitudes (y ~2.4e-6, dx ~2.9e-6,
    dw ~1.4e-4; tools/debug_wl_vjp_shapes.py) into an EXACT NHWC conv
    at the same call sites yields ~1.5e-2 end-to-end grad deviations —
    13x MORE than the shipped kernel's actual 1.1e-3. The deviation is
    also environment-dependent (XLA CPU, 1 virtual device: 8e-7; 8
    devices as under conftest: 1.1e-3), so any fixed tolerance is wrong
    by construction. Instead, bound the WL deviation per-leaf by the
    amplification envelope measured in the SAME process (2 noise seeds,
    3x margin + 5e-4 floor). A real kernel bug (wrong tap offset,
    dropped row) produces O(grad)~0.1 deviations and still fails; pure
    reassociation noise passes in any environment."""
    from synergize_motion_appearance_tpu.ops import pallas_conv_wl as pcw

    rng = np.random.RandomState(4)
    me = tiny_motion_estimator()
    src = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    drv = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    me_vars = me.init(jax.random.PRNGKey(0), src, drv)
    dm = me.apply(me_vars, src, drv)

    f_ref = tiny_former(wl_decoder=False)
    f_wl = tiny_former(wl_decoder=True, wl_train=True)
    vars_ = f_ref.init(jax.random.PRNGKey(1), src, dm, gt=drv,
                       inference=False)

    def loss(fmt, v):
        out = fmt.apply(v, src, dm, gt=drv, inference=False)
        return (jnp.mean(jnp.abs(out["out"]))
                + jnp.mean(jnp.abs(out["out_lr"][0])))

    l_ref, g_ref = jax.value_and_grad(lambda v: loss(f_ref, v))(vars_)
    l_wl, g_wl = jax.value_and_grad(lambda v: loss(f_wl, v))(vars_)
    np.testing.assert_allclose(float(l_wl), float(l_ref),
                               rtol=2e-5, atol=2e-5)

    # ---- amplification envelope: exact NHWC conv + per-op pseudo-noise
    # of the measured WL-kernel deviation magnitudes, patched in at the
    # same call sites, autodiffed through the same WL graph ----
    def nhwc_exact(x, w, b):
        xn = jnp.swapaxes(x, 2, 3)
        y = jax.lax.conv_general_dilated(
            xn, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        return jnp.swapaxes(y, 2, 3)

    def make_noisy_conv(seed, sy=3e-6, sdx=3e-6, sdw=1.5e-4):
        counter = [0]

        @functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
        def noisy(idx, block_rows, interpret, x, w, b):
            y = nhwc_exact(x, w, b)
            k = jax.random.fold_in(jax.random.PRNGKey(seed), idx)
            return y + sy * jax.random.normal(k, y.shape, y.dtype)

        def fwd(idx, block_rows, interpret, x, w, b):
            return noisy(idx, block_rows, interpret, x, w, b), (x, w, b)

        def bwd(idx, block_rows, interpret, res, dy):
            x, w, b = res
            _, vjp = jax.vjp(nhwc_exact, x, w, b)
            dx, dw, db = vjp(dy)
            k = jax.random.fold_in(jax.random.PRNGKey(seed ^ 0x5A5A), idx)
            k1, k2 = jax.random.split(k)
            return (dx + sdx * jax.random.normal(k1, dx.shape, dx.dtype),
                    dw + sdw * jax.random.normal(k2, dw.shape, dw.dtype),
                    db)

        noisy.defvjp(fwd, bwd)

        def call(block_rows, interpret, x, w, b):
            idx = counter[0]
            counter[0] += 1
            return noisy(idx, block_rows, interpret, x, w, b)

        return call

    env_grads = []
    orig = pcw.conv3x3_wl_ad
    try:
        for seed in (0, 1):
            pcw.conv3x3_wl_ad = make_noisy_conv(seed)
            _, g_n = jax.value_and_grad(lambda v: loss(f_wl, v))(vars_)
            env_grads.append(g_n)
    finally:
        pcw.conv3x3_wl_ad = orig

    flat_wl = {jax.tree_util.keystr(k): np.asarray(v)
               for k, v in jax.tree_util.tree_leaves_with_path(g_wl)}
    flat_env = [
        {jax.tree_util.keystr(k): np.asarray(v)
         for k, v in jax.tree_util.tree_leaves_with_path(g)}
        for g in env_grads
    ]
    for k, v_ref in jax.tree_util.tree_leaves_with_path(g_ref):
        ks = jax.tree_util.keystr(k)
        ref = np.asarray(v_ref)
        dev = np.abs(flat_wl[ks] - ref).max()
        env = max(np.abs(fe[ks] - ref).max() for fe in flat_env)
        assert np.isfinite(flat_wl[ks]).all(), ks
        bound = max(5e-4, 3.0 * env)
        assert dev <= bound, (
            f"{ks}: WL grad deviation {dev:.3e} exceeds noise-"
            f"amplification envelope bound {bound:.3e} (env={env:.3e})")
