"""3x3 convolution re-expressed as MXU matmuls.

Why: XLA's conv emitter for NHWC 3x3 stride-1 convs at the decoder's hot
shapes (256²x64ch, 128²x128ch) lands in a slow spatial emitter measured
10-40x off roofline on v5e (see docs/PERF.md). The same contraction
expressed as im2col + one matmul (or 3 width-folded matmuls) maps onto
the MXU directly, exactly like the space-to-depth patch-embed fix in
layers.Dense.

Variants (all numerically identical to lax.conv with pad=1, NHWC/HWIO):
  conv3x3_im2col  — concat the 9 shifted views on channels, one matmul
                    with the (9*Cin, Cout)-reshaped kernel. Highest MXU
                    utilization; 9x activation re-read (usually still a
                    win — the conv emitter re-reads comparably).
  conv3x3_tapsum  — 9 shifted (HW, Cin)x(Cin, Cout) matmuls accumulated
                    in f32. No 9x buffer; lower K per matmul.

Reference counterpart: plain nn.Conv2d inside the VQGAN generator blocks
(vqgan_arch.py:168-191); this is a pure execution-strategy change.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _shifted_views(xp, H, W):
    """xp: (B, H+2, W+2, C) padded input -> 9 (B, H, W, C) views in
    (di, dj) row-major tap order matching HWIO kernel layout."""
    views = []
    for di in range(3):
        for dj in range(3):
            views.append(xp[:, di:di + H, dj:dj + W, :])
    return views


def conv3x3_im2col(x, w, b=None, out_dtype=None):
    """x: (B, H, W, Cin); w: (3, 3, Cin, Cout) HWIO; pad=1, stride 1."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.concatenate(_shifted_views(xp, H, W), axis=-1)
    y = jax.lax.dot_general(
        patches.reshape(B * H * W, 9 * Cin),
        w.astype(x.dtype).reshape(9 * Cin, Cout),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.reshape(B, H, W, Cout).astype(out_dtype or x.dtype)


def conv3x3_tapsum(x, w, b=None, out_dtype=None):
    """Same contraction as 9 accumulated matmuls (no 9x patch buffer)."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.astype(x.dtype).reshape(9, Cin, Cout)
    acc = None
    for t, v in enumerate(_shifted_views(xp, H, W)):
        y = jax.lax.dot_general(
            v.reshape(B * H * W, Cin), wf[t],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = y if acc is None else acc + y
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.reshape(B, H, W, Cout).astype(out_dtype or x.dtype)
