"""W-in-lanes decoder layout (docs/PERF.md §15) — numerics parity.

The wl_decoder path re-lays decoder activations as (B, H, C, W) and
routes 3x3 convs through ops/pallas_conv_wl.py (interpret mode off-TPU).
Same params, same math, different execution — outputs must match the
NHWC graph.
"""
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
