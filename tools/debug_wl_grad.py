"""Bisect harness for the WL-train gradient mismatch (VERDICT r3 item 1).

Runs the failing end-to-end comparison twice:
  A) as shipped (conv3x3_wl_ad custom VJP on the Pallas kernel)
  B) with conv3x3_wl_ad monkeypatched to a pure-JAX NHWC lax.conv
     (plain autodiff), everything else in the WL graph unchanged.

If B matches NHWC and A doesn't -> the custom VJP / Pallas kernel is the
bug. If B also mismatches -> the bug is elsewhere in the WL region
(GroupNorm WL path, Upsample, fuse concat axis, ...).
"""
import os
import sys

# this machine's sitecustomize force-registers the TPU plugin and
# overwrites jax_platforms AFTER env vars are read (see tests/conftest.py)
# — the config.update below is the only way to actually get CPU
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
if os.environ.get("DBG_8DEV"):  # replicate tests/conftest.py exactly
    jax.config.update("jax_num_cpu_devices", 8)
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from synergize_motion_appearance_tpu.ops import pallas_conv_wl as pcw
from synergize_motion_appearance_tpu.models import layers as L


def nhwc_ref_conv(block_rows, interpret, x, w, b):
    """(B,H,C,W) in/out via plain lax.conv in NHWC — autodiff reference."""
    xn = jnp.swapaxes(x, 2, 3)
    y = jax.lax.conv_general_dilated(
        xn, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + b
    return jnp.swapaxes(y, 2, 3)


def make_noisy_conv(seed, sy=3e-6, sdx=3e-6, sdw=1.5e-4):
    """Exact NHWC conv + deterministic pseudo-noise of the MEASURED
    per-op WL-kernel deviation magnitudes (tools/debug_wl_vjp_shapes.py
    at the tiny-former shapes: y ~2.4e-6, dx ~2.9e-6, dw ~1.4e-4 abs;
    db exact). Injecting this at the same call sites measures how much
    the BACKWARD GRAPH amplifies per-op reassociation noise — the
    calibration behind test_former_train_mode_wl_grads_noise_bounded."""
    import functools
    counter = [0]

    @functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
    def noisy(idx, block_rows, interpret, x, w, b):
        y = nhwc_ref_conv(block_rows, interpret, x, w, b)
        k = jax.random.fold_in(jax.random.PRNGKey(seed), idx)
        return y + sy * jax.random.normal(k, y.shape, y.dtype)

    def fwd(idx, block_rows, interpret, x, w, b):
        return noisy(idx, block_rows, interpret, x, w, b), (x, w, b)

    def bwd(idx, block_rows, interpret, res, dy):
        x, w, b = res
        _, vjp = jax.vjp(lambda x_, w_, b_: nhwc_ref_conv(
            block_rows, interpret, x_, w_, b_), x, w, b)
        dx, dw, db = vjp(dy)
        k = jax.random.fold_in(jax.random.PRNGKey(seed ^ 0x5A5A), idx)
        k1, k2 = jax.random.split(k)
        dx = dx + sdx * jax.random.normal(k1, dx.shape, dx.dtype)
        dw = dw + sdw * jax.random.normal(k2, dw.shape, dw.dtype)
        return dx, dw, db

    noisy.defvjp(fwd, bwd)

    def call(block_rows, interpret, x, w, b):
        idx = counter[0]
        counter[0] += 1
        return noisy(idx, block_rows, interpret, x, w, b)

    return call


def run_case(label, dtype=np.float32):
    from synergize_motion_appearance_tpu.models.appmotion_former import (
        AppMotionCompFormer)
    from test_models_forward import tiny_former, tiny_motion_estimator

    rng = np.random.RandomState(4)
    me = tiny_motion_estimator()
    src = jnp.asarray(rng.randn(1, 64, 64, 3).astype(dtype))
    drv = jnp.asarray(rng.randn(1, 64, 64, 3).astype(dtype))
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
    print(f"[{label}] loss ref={float(l_ref):.8f} wl={float(l_wl):.8f} "
          f"diff={abs(float(l_ref)-float(l_wl)):.2e}")
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_wl = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_wl)}
    worst = []
    for k, v_ref in flat_ref:
        ks = jax.tree_util.keystr(k)
        v_wl = flat_wl[ks]
        a = np.asarray(v_wl) - np.asarray(v_ref)
        absmax = np.abs(a).max()
        denom = np.maximum(np.abs(np.asarray(v_ref)), 1e-8)
        relmax = (np.abs(a) / denom).max()
        # count out-of-tol at the test's own 2e-3 rel / 5e-4 abs
        bad = np.sum(np.abs(a) > 5e-4 + 2e-3 * np.abs(np.asarray(v_ref)))
        worst.append((absmax, relmax, int(bad), ks))
    worst.sort(reverse=True)
    dump = os.environ.get("DBG_DUMP")
    if dump:
        np.savez(dump,
                 **{jax.tree_util.keystr(k): np.asarray(v)
                    for k, v in jax.tree_util.tree_leaves_with_path(g_wl)},
                 **{"REF" + jax.tree_util.keystr(k): np.asarray(v)
                    for k, v in flat_ref})
    nbad = sum(1 for w in worst if w[2] > 0)
    print(f"[{label}] leaves out-of-tol: {nbad}")
    for absmax, relmax, bad, ks in worst[:8]:
        print(f"  abs={absmax:.3e} rel={relmax:.3e} nbad={bad}  {ks}")
    return nbad


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode == "f64":
        # C) shipped Pallas VJP, everything in float64 (interpret mode
        # accumulates in f64 after the acc_t change): if this matches
        # NHWC-f64 tightly, the WL math is exact and the f32 mismatch is
        # reassociation noise amplified through the backward graph.
        jax.config.update("jax_enable_x64", True)
        run_case("C:shipped-pallas-vjp-f64", dtype=np.float64)
        sys.exit(0)
    if mode == "calib":
        # D) exact conv + measured-magnitude per-op noise at the WL call
        # sites: the end-to-end grad deviation this produces is the
        # graph's intrinsic amplification of per-op reassociation noise
        for seed in (0, 1, 2):
            pcw.conv3x3_wl_ad = make_noisy_conv(seed)
            run_case(f"D:noise-calib-seed{seed}")
        sys.exit(0)
    if mode in ("both", "patched"):
        orig = pcw.conv3x3_wl_ad
        pcw.conv3x3_wl_ad = nhwc_ref_conv
        try:
            nb = run_case("B:lax.conv-autodiff")
        finally:
            pcw.conv3x3_wl_ad = orig
        if mode == "patched":
            sys.exit(0 if nb == 0 else 1)
    if mode in ("both", "shipped"):
        run_case("A:shipped-pallas-vjp")
