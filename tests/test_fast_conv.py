"""conv3x3 matmul re-expressions must match lax.conv exactly (same
contraction, different schedule) — parity gate for the decoder hot-path
swap (docs/PERF.md)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synergize_motion_appearance_tpu.ops.fast_conv import (
    conv3x3_im2col, conv3x3_tapsum,
)


def _xla_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


def test_conv3x3_variants_match_xla():
    rng = np.random.RandomState(0)
    for (B, H, W, Cin, Cout) in [(2, 8, 8, 5, 7), (1, 16, 12, 8, 4)]:
        x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, Cin, Cout).astype(np.float32))
        b = jnp.asarray(rng.randn(Cout).astype(np.float32))
        want = np.asarray(_xla_conv(x, w, b))
        for fn in (conv3x3_im2col, conv3x3_tapsum):
            got = np.asarray(fn(x, w, b))
            np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5,
                                       err_msg=fn.__name__)


@pytest.mark.slow
def test_conv3x3_grad_matches_xla():
    # slow tier: guards the study-only conv3x3 re-expressions
    # (docs/PERF.md §3-4), which are NOT wired into the model
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    b = jnp.asarray(rng.randn(6).astype(np.float32))

    def loss(fn):
        return lambda xx, ww, bb: jnp.sum(fn(xx, ww, bb) ** 2)

    gx0, gw0, gb0 = jax.grad(loss(_xla_conv), argnums=(0, 1, 2))(x, w, b)
    for fn in (conv3x3_im2col, conv3x3_tapsum):
        gx, gw, gb = jax.grad(loss(fn), argnums=(0, 1, 2))(x, w, b)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx0),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw0),
                                   atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb0),
                                   atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "cin,cout,k,s,p,hw",
    [
        (3, 16, 3, 1, 1, 16),   # stem, custom-vjp path
        # strided autodiff path — this is exactly the PatchGAN D conv0
        # shape (models/vqgan.py VQGANDiscriminator, 3->ndf 4x4 s2 p1),
        # which the production train graph routes through
        # _ShiftMatmulConv's strided grad path; keep it in the fast tier.
        (3, 8, 4, 2, 1, 16),
        pytest.param(16, 3, 3, 1, 1, 16,   # RGB head, custom-vjp path
                     marks=pytest.mark.slow),
        pytest.param(3, 5, 7, 1, 0, 16,    # kp 7x7 pad 0
                     marks=pytest.mark.slow),
    ],
)
def test_small_channel_conv2d_matches_nn_conv(cin, cout, k, s, p, hw):
    """Conv2d's shift+matmul small-channel path (layers._ShiftMatmulConv,
    incl. the custom VJP used at stride 1) must match nn.Conv in value,
    input-grad, and kernel-grad. Covers the RGB stem/head shapes that
    hit pathological XLA conv emitters on v5e (docs/PERF.md §8). Runs
    under cout_shift_convs() so the cout<=8 case exercises the shift
    path the trainer's step-trace scope enables."""
    import flax.linen as nn

    from synergize_motion_appearance_tpu.models.layers import (
        Conv2d, cout_shift_convs,
    )

    rng = np.random.RandomState(0)
    with cout_shift_convs():
        x = jnp.asarray(rng.randn(2, hw, hw, cin).astype(np.float32))
        m = Conv2d(cout, (k, k), strides=(s, s), padding=p)
        v = m.init(jax.random.PRNGKey(0), x)
        ref = nn.Conv(cout, (k, k), strides=(s, s), padding=((p, p), (p, p)))
        rv = {"params": v["params"]["Conv_0"]}

        # one jit per impl (value + input-grad + kernel-grad together) —
        # separate jits tripled the CPU compile time of this test
        @jax.jit
        def ours(v, x):
            y = m.apply(v, x)
            gx = jax.grad(lambda xx: (m.apply(v, xx) ** 2).sum())(x)
            gk = jax.grad(lambda vv: (m.apply(vv, x) ** 2).sum())(v)
            return y, gx, gk["params"]["Conv_0"]["kernel"]

        @jax.jit
        def theirs(rv, x):
            y = ref.apply(rv, x)
            gx = jax.grad(lambda xx: (ref.apply(rv, xx) ** 2).sum())(x)
            gk = jax.grad(lambda vv: (ref.apply(vv, x) ** 2).sum())(rv)
            return y, gx, gk["params"]["kernel"]

        y1, g1, k1 = ours(v, x)
        y2, g2, k2 = theirs(rv, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                                   atol=1e-4, rtol=1e-4)


def test_cout_shift_routing_contextvar():
    """cout<=8 convs route to shift+matmul ONLY inside cout_shift_convs()
    (the trainer's step-trace scope); outputs are identical either way."""
    import jax
    import flax.linen as nn  # noqa: F401

    from synergize_motion_appearance_tpu.models.layers import (
        Conv2d, cout_shift_convs,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 12, 12, 16).astype(np.float32))
    m = Conv2d(3, (3, 3), padding=1)  # cin=16 > 8, cout=3 <= 8
    v = m.init(jax.random.PRNGKey(0), x)

    jp_off = str(jax.make_jaxpr(lambda: m.apply(v, x))())
    with cout_shift_convs():
        jp_on = str(jax.make_jaxpr(lambda: m.apply(v, x))())
    assert "conv_general_dilated" in jp_off  # inference: lax.conv
    assert "conv_general_dilated" not in jp_on  # train scope: shift+matmul

    y_off = np.asarray(m.apply(v, x))
    with cout_shift_convs():
        y_on = np.asarray(m.apply(v, x))
    np.testing.assert_allclose(y_on, y_off, atol=2e-5, rtol=1e-5)
