"""Resampling ops with exact PyTorch semantics, built TPU-first.

Covers the reference's hot resampling calls:
  * ``grid_sample`` — bilinear backward-warp; parity with
    ``F.grid_sample`` for align_corners True/False and zeros/reflection
    padding (reference: appmotioncodebook_arch.py:356 uses
    align_corners=True; dense_motion_arch.py:114 and the equivariance
    Transform (appmotioncomp_model.py:73) use the torch defaults
    align_corners=False / reflection).
  * ``resize_bilinear`` — parity with ``F.interpolate(mode='bilinear')``
    for both align_corners modes. Implemented as two small dense matmuls
    (separable 1-D interpolation) so it runs on the MXU instead of a
    gather — the TPU-native formulation.
  * ``upsample_nearest`` / ``resize_nearest`` — parity with torch
    ``F.interpolate`` default (mode='nearest').
  * ``avg_pool_2x`` — parity with ``nn.AvgPool2d(2)``.

All tensors are NHWC; grids/flows are (B, H, W, 2) with (x, y) in [-1, 1].
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name


# ---------------------------------------------------------------------------
# grid_sample
# ---------------------------------------------------------------------------

def _unnormalize(coord, size, align_corners):
    """[-1, 1] -> pixel index space (torch convention)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(x, lo, hi):
    """Reflect coordinates into [lo, hi] (torch reflection padding math)."""
    if hi <= lo:
        return jnp.zeros_like(x)
    span = hi - lo
    x = jnp.abs(x - lo)
    x = x % (2.0 * span)
    return jnp.where(x > span, 2.0 * span - x, x) + lo


def _warp_gather_plan(H, W, grid, align_corners, padding_mode):
    """Shared grid_sample sampling math: returns the flattened base-corner
    gather indices (…,) s32, the 4 per-pixel f32 slot weights (a0..a3)
    for a corner-packed gather (see grid_sample below), and the clipped
    base-corner integer coords (sy, sx) (the custom backward rebuilds the
    roll-wrapped corner scatter indices from them)."""
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    ix = _unnormalize(gx, W, align_corners)
    iy = _unnormalize(gy, H, align_corners)

    if padding_mode == "reflection":
        if align_corners:
            ix = _reflect(ix, 0.0, W - 1.0)
            iy = _reflect(iy, 0.0, H - 1.0)
        else:
            ix = _reflect(ix, -0.5, W - 0.5)
            iy = _reflect(iy, -0.5, H - 0.5)
        ix = jnp.clip(ix, 0.0, W - 1.0)
        iy = jnp.clip(iy, 0.0, H - 1.0)
    elif padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1.0)
        iy = jnp.clip(iy, 0.0, H - 1.0)

    return _corner_plan_from_pixels(ix, iy, H, W, padding_mode)


def _corner_plan_from_pixels(ix, iy, H, W, padding_mode):
    """Corner-packed gather plan from PIXEL-space sample coords ix/iy
    (f32, any leading shape). Shared by grid_sample (above, after its
    [-1,1] unnormalize + padding transform) and the deformable-conv
    bilinear gather (ops/dcn.py — deformable_im2col_bilinear samples in
    pixel space with zeros outside)."""
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0

    wx1 = ix - ix0
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    sx = jnp.clip(ix0, 0, W - 1).astype(jnp.int32)
    sy = jnp.clip(iy0, 0, H - 1).astype(jnp.int32)
    flat = sy * W + sx

    # wrap/clamp slot corrections: when x0 (resp. y0) clipped up to 0, the
    # +1 corner coincides with the gathered base pixel (torch clips each
    # corner independently); rolled slots would wrap at the far edge but
    # those corners are OOB and zero-weighted below
    cx = (ix0.astype(jnp.int32) == sx).astype(jnp.float32)
    cy = (iy0.astype(jnp.int32) == sy).astype(jnp.float32)

    if padding_mode == "zeros":
        def valid(yy, xx):
            return ((xx >= 0) & (xx <= W - 1)
                    & (yy >= 0) & (yy <= H - 1)).astype(jnp.float32)
    else:  # border/reflection already clamped coords into range
        def valid(yy, xx):
            return jnp.float32(1.0)

    w00 = wy0 * wx0 * valid(iy0, ix0)
    w01 = wy0 * wx1 * valid(iy0, ix1)
    w10 = wy1 * wx0 * valid(iy1, ix0)
    w11 = wy1 * wx1 * valid(iy1, ix1)

    # Fold the per-corner select corrections INTO the blend weights:
    # instead of 4 channel-wide where() passes over the packed (N, 4C)
    # gather (a full extra HBM read+write of it), compute 4 per-PIXEL
    # scalar slot weights and blend once. Corner v01 = cx ? p1 : p0 etc,
    # so distributing the multiplications gives
    #   out = a0*p0 + a1*p1 + a2*p2 + a3*p3
    # with the boolean masks absorbed into the a_k. Profiled: removes a
    # ~6.5 ms select pass per 256-scale warp in the 64-frame gen step.
    ncx = 1.0 - cx
    ncy = 1.0 - cy
    a0 = w00 + w01 * ncx + w10 * ncy + w11 * (ncx * ncy)
    a1 = cx * (w01 + w11 * ncy)
    a2 = cy * (w10 + w11 * ncx)
    a3 = w11 * (cx * cy)
    return flat, (a0, a1, a2, a3), (sy, sx)


def _pack_corners(img):
    """(B, H, W, C) -> (B, H, W, 4C) with the 4 bilinear corner values of
    each base pixel packed into channels:
    [v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)] via rolls. XLA lowers each
    corner gather to 128B-granule random reads and pads (N, C) outputs to
    128 lanes; packing makes the warp ONE lane-aligned gather of (N, 4C)
    — measured ~2x faster at both hot shapes (1->64 256²x64 and the
    16-way dense-motion warp). Rolled slots would wrap at the far edge,
    but those corners are OOB and zero-weighted by the plan."""
    rx = jnp.roll(img, -1, axis=2)
    ry = jnp.roll(img, -1, axis=1)
    rxy = jnp.roll(rx, -1, axis=1)
    return jnp.concatenate([img, rx, ry, rxy], axis=-1)


def _gs_impl(img, grid, align_corners, padding_mode):
    """Forward body shared by the reference path and the custom-VJP path.

    Returns (out, p) where p is the corner-packed gather (Bg, Hg, Wg, 4C)
    — the only img-dependent intermediate the backward needs.
    """
    B, H, W, C = img.shape
    Bg = grid.shape[0]
    flat, (a0, a1, a2, a3), _ = _warp_gather_plan(
        H, W, grid, align_corners, padding_mode)
    packed = _pack_corners(img)

    if B == 1 and Bg > 1:
        # broadcast fast path: many grids over one image — gather from the
        # single image without materializing Bg copies
        p = jnp.take(packed.reshape(H * W, 4 * C), flat.reshape(-1), axis=0)
        p = p.reshape(Bg, *flat.shape[1:], 4 * C)
    else:
        p = jnp.take_along_axis(packed.reshape(B, H * W, 4 * C),
                                flat.reshape(B, -1)[..., None], axis=1)
        p = p.reshape(B, *flat.shape[1:], 4 * C)

    # the selective-remat policy (trainer.py) can keep the gather output
    # resident so the backward does not re-pack + re-gather the image
    p = _checkpoint_name(p, "warp_corners")

    # coordinates/weights are computed in f32 (pixel positions need the
    # mantissa), but the 4-corner blend runs in the image dtype so bf16
    # graphs stay bf16 (weights are in [0,1]; bf16 blend error ~0.4%)
    bd = img.dtype if img.dtype in (jnp.bfloat16, jnp.float16) else None
    a0, a1, a2, a3 = (a[..., None] for a in (a0, a1, a2, a3))
    if bd is not None:
        a0, a1, a2, a3 = (a.astype(bd) for a in (a0, a1, a2, a3))

    out = (p[..., 0:C] * a0 + p[..., C:2 * C] * a1
           + p[..., 2 * C:3 * C] * a2 + p[..., 3 * C:] * a3)
    return out.astype(img.dtype), p


def _grid_sample_ref(img, grid, align_corners=True, padding_mode="zeros"):
    """Plain-autodiff grid_sample (XLA differentiates the gather into a
    scatter over the 4C-packed tensor + the roll backward). Kept as the
    numerics oracle for the custom VJP and as the SAMT_WARP_VJP=0
    fallback."""
    return _gs_impl(img, grid, align_corners, padding_mode)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gs_cv(img_shape, align_corners, padding_mode, img, grid):
    return _gs_impl(img, grid, align_corners, padding_mode)[0]


def _gs_cv_fwd(img_shape, align_corners, padding_mode, img, grid):
    out, p = _gs_impl(img, grid, align_corners, padding_mode)
    return out, (p, grid)


def _gs_cv_bwd(img_shape, align_corners, padding_mode, res, g):
    """Byte-lean warp backward (docs/PERF.md §14).

    XLA's autodiff of the packed gather scatter-adds the (Bg, N, 4C)
    cotangent into a d_packed the size of 4 images and then runs the
    roll backward over it (measured 28 GB/s effective on the random
    half — PERF.md §11b, fusion.130). Here the 4 corner cotangents
    scatter-add DIRECTLY into the (B, H*W, C) image gradient (4 rows of
    C instead of 1 row of 4C plus a 4-slot dense reduction), d_packed
    is never materialized, and the saved corner gather p (residual,
    remat-name "warp_corners") supplies both d_grid and the blend
    backward without re-packing + re-gathering the image.
    """
    p, grid = res
    B, H, W, C = img_shape
    Bg = grid.shape[0]

    def weights_of(grid_):
        flat, aws, (sy, sx) = _warp_gather_plan(
            H, W, grid_, align_corners, padding_mode)
        return jnp.stack(aws, axis=-1), (flat, sy, sx)

    aws, pull, (flat, sy, sx) = jax.vjp(weights_of, grid, has_aux=True)

    bd = p.dtype
    gc = g.astype(bd)
    pr = p.reshape(*g.shape[:-1], 4, C)

    # d_a_k = <g, p_k>_C, accumulated in f32 (free on the reduce; beats
    # the plain-autodiff bf16 reduce before the pixel-scale (~W/2)
    # amplification in d_grid)
    d_aws = jnp.einsum("...c,...kc->...k", gc, pr,
                       preferred_element_type=jnp.float32)
    d_grid = pull(d_aws.astype(jnp.float32))[0]

    # d_p_k = a_k * g, scattered at the roll-wrapped corner positions
    # (wrapped corners carry exactly-zero a_k, so their adds are zeros —
    # same contract as the forward's _pack_corners)
    d_p = aws.astype(bd)[..., None] * gc[..., None, :]   # (..., 4, C)
    sx1 = (sx + 1) % W
    sy1 = (sy + 1) % H
    idx = jnp.stack([flat, sy * W + sx1, sy1 * W + sx, sy1 * W + sx1],
                    axis=-1)                              # (..., 4)
    idx = idx.reshape(Bg, -1)                             # (Bg, 4N)
    upd = d_p.reshape(Bg, -1, C)                          # (Bg, 4N, C)

    if B == 1 and Bg > 1:
        d_img = jnp.zeros((H * W, C), bd).at[idx.reshape(-1)].add(
            upd.reshape(-1, C)).reshape(1, H, W, C)
    else:
        d_img = jax.vmap(
            lambda i, u: jnp.zeros((H * W, C), bd).at[i].add(u)
        )(idx, upd).reshape(B, H, W, C)
    return d_img, d_grid


_gs_cv.defvjp(_gs_cv_fwd, _gs_cv_bwd)

# MEASURED VERDICT (docs/PERF.md §14): the direct-scatter custom VJP is
# ~6% SLOWER per b8 train step than XLA's autodiff (chained 604 vs
# 567 ms/step, same day). The direct form scatters 4N rows of C lanes
# (C=64: half a vreg -> ~16x (8,128)-tile write amplification) where
# autodiff scatters N rows of 4C (512 B, ~8x) plus a dense roll-reduce
# at stream bandwidth — the packed formulation is byte-minimal for
# data-dependent row scatter on this layout. Kept opt-in for future
# hardware/layouts; gradients proven equal (tests/test_warp_vjp.py).
# None = defer to the SAMT_WARP_VJP env var, read at TRACE time inside
# grid_sample (setting the env after import works, unlike an
# import-time read); True/False = forced (tests monkeypatch this).
_WARP_VJP = None


def _warp_vjp_enabled() -> bool:
    if _WARP_VJP is not None:
        return bool(_WARP_VJP)
    return os.environ.get("SAMT_WARP_VJP", "0") == "1"


def grid_sample(img, grid, align_corners=True, padding_mode="zeros"):
    """Bilinear backward warp. img: (B,H,W,C); grid: (B,Hg,Wg,2) xy in [-1,1].

    Returns (B, Hg, Wg, C). Matches torch.nn.functional.grid_sample with
    mode='bilinear' for padding_mode in {'zeros','border','reflection'}.

    Differentiable w.r.t. both img and grid via plain autodiff (XLA's
    packed-gather backward — the measured-fastest form, PERF.md §14).
    SAMT_WARP_VJP=1 switches to the direct-scatter custom VJP
    (_gs_cv_bwd) — numerically equivalent, slower on v5e.
    """
    if not _warp_vjp_enabled():
        return _grid_sample_ref(img, grid, align_corners, padding_mode)
    return _gs_cv(tuple(img.shape), bool(align_corners),
                  str(padding_mode), img, grid)


def grid_sample_grouped(img, grids, align_corners=False,
                        padding_mode="zeros"):
    """K-way warp of ONE image with group-major dense output.

    img: (1 or B, H, W, C); grids: (B, K, Hg, Wg, 2). Returns
    (B, Hg, Wg, K*C) where channel k*C+c is grid_sample(img, grids[:, k])
    channel c — same per-sample math as `grid_sample`, different output
    layout. Batch-1 img broadcasts against all (frame, k) grids.

    Why: the dense-motion 16-way source warp (dense_motion_arch.py:
    106-116) produces (B*K, h, w, 3) tensors whose 3-channel minor dim
    tile-pads 42x on TPU (1.07 GB of HBM for 25 MB of data per
    elementwise pass). Here the packed-corner gather is transposed into
    a dense (B, N, K*4C) form ONCE and the slot blend runs as an
    elementwise multiply + a tiny constant matmul, so no materialized
    tensor has a sub-lane minor dim.
    """
    B, K, Hg, Wg, _ = grids.shape
    _, H, W, C = img.shape
    N = Hg * Wg
    flat, aws, _ = _warp_gather_plan(
        H, W, grids.reshape(B * K, Hg, Wg, 2), align_corners, padding_mode)
    packed = _pack_corners(img)

    if img.shape[0] == 1:
        p = jnp.take(packed.reshape(H * W, 4 * C), flat.reshape(-1),
                     axis=0)
    else:
        p = jnp.take_along_axis(
            packed.reshape(B, H * W, 4 * C),
            flat.reshape(B, -1)[..., None], axis=1)
    # group-major densification: one relayout of the (rows-padded) gather
    p = p.reshape(B, K, N, 4 * C).transpose(0, 2, 1, 3)
    p = p.reshape(B, N, K * 4 * C)

    bd = img.dtype if img.dtype in (jnp.bfloat16, jnp.float16) \
        else jnp.float32
    a = jnp.stack(aws, axis=-1).reshape(B, K, N, 4)  # f32 slot weights
    a = a.transpose(0, 2, 1, 3).astype(bd)           # (B, N, K, 4)
    aw = jnp.broadcast_to(a[..., None], (B, N, K, 4, C))
    t = p * aw.reshape(B, N, K * 4 * C)              # fused broadcast-mul

    # slot-sum as a constant (4C -> C) matmul per group: keeps the
    # reduction output dense (B, N, K*C) instead of a padded rank-4 shape
    r = np.zeros((4 * C, C), dtype=np.float32)
    for s in range(4):
        r[s * C + np.arange(C), np.arange(C)] = 1.0
    rk = np.kron(np.eye(K, dtype=np.float32), r)     # (K*4C, K*C)
    out = jnp.einsum("bnm,mj->bnj", t, jnp.asarray(rk, t.dtype))
    return out.reshape(B, Hg, Wg, K * C).astype(img.dtype)


# ---------------------------------------------------------------------------
# Separable bilinear resize as dense matmuls (MXU friendly)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=256)
def _linear_resize_matrix(in_size: int, out_size: int, align_corners: bool):
    """Dense (out_size, in_size) 1-D linear interpolation matrix (numpy —
    NEVER cache jnp arrays: under jit they are staged constants/tracers
    and leak across traces).

    Matches torch F.interpolate(mode='bilinear') source-coordinate math.
    """
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for o in range(out_size):
        if align_corners:
            if out_size == 1:
                src = 0.0
            else:
                src = o * (in_size - 1) / (out_size - 1)
        else:
            src = (o + 0.5) * in_size / out_size - 0.5
            src = min(max(src, 0.0), in_size - 1.0)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[o, lo] += 1.0 - w
        m[o, hi] += w
    return m


@functools.lru_cache(maxsize=256)
def resize_tap_plan(in_size: int, out_size: int, align_corners: bool = True):
    """Compact tap form of `_linear_resize_matrix`: indices ``idx``
    (2*out_size,) into the input axis and weights ``w`` (out_size,
    2*out_size) such that ``w @ x[idx] == resize_matrix @ x`` exactly
    (each bilinear output reads at most 2 taps; the compact matmul sums
    the same two contributions in the same lo-then-hi order, so results
    are bit-identical to `resize_bilinear`).

    Lets warp->downsample chains evaluate the warp only at the
    ``2*out_size`` tap positions per axis instead of all ``in_size``
    (see AppMotionCompFormer.motion_pass: the reference warps a 256^2
    feature and immediately downsamples to 64^2/32^2, touching only
    128/64 rows of it)."""
    full = _linear_resize_matrix(in_size, out_size, align_corners)
    idx = np.zeros(2 * out_size, dtype=np.int32)
    w = np.zeros((out_size, 2 * out_size), dtype=np.float32)
    for o in range(out_size):
        nz = np.nonzero(full[o])[0]
        lo = int(nz[0])
        hi = int(nz[-1])
        idx[2 * o] = lo
        idx[2 * o + 1] = hi
        w[o, 2 * o] = full[o, lo] if hi != lo else full[o, lo]
        w[o, 2 * o + 1] = full[o, hi] if hi != lo else 0.0
    return idx, w


def resize_bilinear_at(x, out_hw, rows, cols, align_corners=True):
    """Exactly ``resize_bilinear(x, out_hw)[:, rows][:, :, cols]`` without
    materializing the full resize (each output row/col of a separable
    resize is an independent dot, so row selection commutes). Used to
    evaluate an upsampled flow field only at warp tap positions."""
    B, H, W, C = x.shape
    h, w = out_hw
    if (H, W) == (h, w):
        return x[:, np.asarray(rows)][:, :, np.asarray(cols)]
    mh = _linear_resize_matrix(H, h, align_corners)[np.asarray(rows)]
    mw = _linear_resize_matrix(W, w, align_corners)[np.asarray(cols)]
    dt = x.dtype
    if dt in (jnp.bfloat16, jnp.float16):
        y = jnp.einsum("oh,bhwc->bowc", jnp.asarray(mh, dt), x)
        return jnp.einsum("ow,bhwc->bhoc", jnp.asarray(mw, dt), y)
    y = jnp.einsum("oh,bhwc->bowc", mh, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(dt)


def tap_reduce(x, wy, wx):
    """Reduce a (B, 2h, 2w, C) tap grid (rows/cols gathered at
    `resize_tap_plan` positions) to (B, h, w, C) with the plan's compact
    weight matrices wy (h, 2h) / wx (w, 2w). Mirrors resize_bilinear's
    dtype policy (bf16 reduces in bf16; else f32 HIGHEST) so composed
    results match the dense path."""
    dt = x.dtype
    if dt in (jnp.bfloat16, jnp.float16):
        y = jnp.einsum("oh,bhwc->bowc", jnp.asarray(wy, dt), x)
        return jnp.einsum("ow,bhwc->bhoc", jnp.asarray(wx, dt), y)
    y = jnp.einsum("oh,bhwc->bowc", wy, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("ow,bhwc->bhoc", wx, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(dt)


def resize_bilinear(x, out_hw, align_corners=True):
    """(B,H,W,C) -> (B,h,w,C) bilinear resize, torch F.interpolate parity.

    f32 inputs resize at highest precision (flow fields / parity tests);
    bf16 feature maps resize in bf16 to keep inference graphs bf16."""
    B, H, W, C = x.shape
    h, w = out_hw
    if (H, W) == (h, w):
        return x
    dt = x.dtype
    low = dt in (jnp.bfloat16, jnp.float16)
    mh = _linear_resize_matrix(H, h, align_corners)
    mw = _linear_resize_matrix(W, w, align_corners)
    if low:
        y = jnp.einsum("oh,bhwc->bowc", mh.astype(dt), x)
        y = jnp.einsum("ow,bhwc->bhoc", mw.astype(dt), y)
        return y.astype(dt)
    y = jnp.einsum("oh,bhwc->bowc", mh, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(dt)


def upsample_nearest(x, factor=2):
    """torch F.interpolate(scale_factor=f) default nearest mode (NHWC)."""
    B, H, W, C = x.shape
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x


def resize_nearest(x, out_hw):
    """torch F.interpolate(mode='nearest') to arbitrary size (NHWC)."""
    B, H, W, C = x.shape
    h, w = out_hw
    if (H, W) == (h, w):
        return x
    iy = np.floor(np.arange(h) * H / h).astype(np.int32)
    ix = np.floor(np.arange(w) * W / w).astype(np.int32)
    return x[:, iy][:, :, ix]


def avg_pool_2x(x):
    """nn.AvgPool2d(kernel=2, stride=2) on NHWC."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.mean(axis=(2, 4))


def interpolate_flow(flow, out_hw):
    """Resize a (B,H,W,2) deformation field, bilinear align_corners=True.

    Reference: deform_input at appmotioncodebook_arch.py:349-356 permutes to
    NCHW, F.interpolate(..., mode='bilinear', align_corners=True), permutes
    back. NHWC layout makes the permutes free here.
    """
    return resize_bilinear(flow, out_hw, align_corners=True)
