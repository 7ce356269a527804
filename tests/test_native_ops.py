"""Deformable conv / fused_act / upfirdn2d parity vs naive references."""
import numpy as np
import pytest

import jax.numpy as jnp

from synergize_motion_appearance_tpu.ops.dcn import (
    deform_conv2d, modulated_deform_conv2d,
)
from synergize_motion_appearance_tpu.ops.stylegan_ops import (
    fused_leaky_relu, upfirdn2d, make_resample_kernel,
)


def naive_deform_conv(x, offset, weight, stride, padding, dilation, dg,
                      mask=None):
    """Direct python port of the CUDA sampling semantics as oracle."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    Ho = (H + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    Wo = (W + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    cpg = Cin // dg
    out = np.zeros((B, Ho, Wo, Cout), np.float64)

    def bilinear(img, y, x_):
        Hh, Ww = img.shape[:2]
        if y <= -1 or y >= Hh or x_ <= -1 or x_ >= Ww:
            return np.zeros(img.shape[2])
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        v = np.zeros(img.shape[2])
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < Hh and 0 <= xx < Ww:
                    wgt = ((1 - abs(y - yy)) * (1 - abs(x_ - xx)))
                    v += wgt * img[yy, xx]
        return v

    off = offset.reshape(B, Ho, Wo, dg, kh, kw, 2)
    msk = None if mask is None else mask.reshape(B, Ho, Wo, dg, kh, kw)
    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                cols = np.zeros((kh, kw, Cin))
                for g in range(dg):
                    img = x[b, :, :, g * cpg:(g + 1) * cpg]
                    for ki in range(kh):
                        for kj in range(kw):
                            y = i * sh - ph + ki * dh + off[b, i, j, g, ki, kj, 0]
                            x_ = j * sw - pw + kj * dw + off[b, i, j, g, ki, kj, 1]
                            s = bilinear(img, y, x_)
                            if msk is not None:
                                s = s * msk[b, i, j, g, ki, kj]
                            cols[ki, kj, g * cpg:(g + 1) * cpg] = s
                out[b, i, j] = np.einsum("yxc,yxco->o", cols, weight)
    return out


@pytest.mark.parametrize("dg,mask_on", [(1, False), (2, True)])
def test_deform_conv_parity(dg, mask_on):
    rng = np.random.RandomState(0)
    B, H, W, Cin, Cout, k = 1, 6, 5, 4, 3, 3
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    weight = rng.randn(k, k, Cin, Cout).astype(np.float32) * 0.3
    offset = rng.randn(B, H, W, dg * k * k * 2).astype(np.float32) * 0.7
    mask = (rng.rand(B, H, W, dg * k * k).astype(np.float32)
            if mask_on else None)

    expect = naive_deform_conv(x, offset, weight, (1, 1), (1, 1), (1, 1),
                               dg, mask)
    if mask_on:
        got = modulated_deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), stride=(1, 1), padding=(1, 1),
            deformable_groups=dg,
        )
    else:
        got = deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
            stride=(1, 1), padding=(1, 1), deformable_groups=dg,
        )
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4,
                               atol=1e-4)


def test_fused_leaky_relu():
    x = np.random.RandomState(1).randn(2, 4, 4, 3).astype(np.float32)
    b = np.asarray([0.1, -0.2, 0.3], np.float32)
    out = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    xb = x + b
    expect = np.where(xb >= 0, xb, xb * 0.2) * np.sqrt(2)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_upfirdn2d_identity_and_blur():
    x = np.random.RandomState(2).randn(1, 8, 8, 2).astype(np.float32)
    ident = jnp.asarray([[1.0]])
    out = np.asarray(upfirdn2d(jnp.asarray(x), ident))
    np.testing.assert_allclose(out, x, atol=1e-6)

    k = make_resample_kernel([1, 3, 3, 1])
    up = upfirdn2d(jnp.asarray(x), k, up=2, down=1, pad=(2, 1))
    assert up.shape == (1, 16, 16, 2)
    down = upfirdn2d(jnp.asarray(x), k, up=1, down=2, pad=(2, 1))
    assert down.shape == (1, 4, 4, 2)
    assert np.isfinite(np.asarray(up)).all()
