"""Coordinate grids, keypoint gaussians, soft-argmax, anti-alias downsample.

Parity targets in the reference:
  * make_coordinate_grid   — utils/motion_estimator_util.py:56-72
  * kp2gaussian            — utils/motion_estimator_util.py:11-32
  * gaussian2kp (softargmax) — archs/keypoint_detector_arch.py:48-58
  * AntiAliasInterpolation2d — utils/motion_estimator_util.py:599-645
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def make_coordinate_grid(h: int, w: int, dtype=jnp.float32):
    """Meshgrid of (x, y) in [-1, 1]^2, shape (h, w, 2).

    x varies along width, y along height — same layout the reference
    concatenates (xx, yy) in, so grids are drop-in grid_sample inputs.
    """
    x = 2.0 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1.0
    y = 2.0 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1.0
    xx = jnp.broadcast_to(x[None, :], (h, w))
    yy = jnp.broadcast_to(y[:, None], (h, w))
    return jnp.stack([xx, yy], axis=-1)


def kp2gaussian(kp_value, spatial_size, kp_variance):
    """Keypoints -> isotropic gaussian heatmaps.

    kp_value: (..., K, 2) in [-1,1] xy. Returns (..., K, H, W).
    """
    h, w = spatial_size
    grid = make_coordinate_grid(h, w, kp_value.dtype)  # (h, w, 2)
    lead = kp_value.shape[:-1]  # (..., K)
    grid = grid.reshape((1,) * len(lead) + (h, w, 2))
    mean = kp_value.reshape(lead + (1, 1, 2))
    diff = grid - mean
    return jnp.exp(-0.5 * jnp.sum(diff ** 2, axis=-1) / kp_variance)


def softargmax_kp(heatmap):
    """Soft-argmax of normalized heatmaps -> kp in [-1,1].

    heatmap: (B, K, H, W) already softmax-normalized. Returns (B, K, 2).
    """
    B, K, H, W = heatmap.shape
    grid = make_coordinate_grid(H, W, heatmap.dtype)  # (H, W, 2)
    return jnp.einsum("bkhw,hwc->bkc", heatmap, grid,
                      precision=jax.lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=32)
def _gaussian_kernel_1d_meta(scale: float):
    """(kernel numpy array, ka, kb, int_inv_scale) for a given scale."""
    sigma = (1.0 / scale - 1.0) / 2.0
    kernel_size = 2 * round(sigma * 4) + 1
    ka = kernel_size // 2
    kb = ka - 1 if kernel_size % 2 == 0 else ka
    ax = np.arange(kernel_size, dtype=np.float32)
    mean = (kernel_size - 1) / 2.0
    k1 = np.exp(-((ax - mean) ** 2) / (2.0 * sigma ** 2))
    k2 = np.outer(k1, k1)
    k2 = k2 / k2.sum()
    return k2, ka, kb, int(round(1.0 / scale))


def antialias_downsample(x, scale: float):
    """Band-limited downsampling (gaussian blur + stride), NHWC.

    Parity with AntiAliasInterpolation2d (motion_estimator_util.py:599-645):
    pad (ka, kb) each side, depthwise conv with a fixed normalized
    gaussian, then stride-subsample.

    TPU mapping: a depthwise conv over C=3 lane-pads 42x and drove XLA
    into transposed-layout conv emitters (~55 ms/train step measured,
    docs/PERF.md). The blur is separable and linear, so it is expressed
    as two MXU matmuls instead: an H-pass contracting H with W*C folded
    into the (lane-aligned) minor dim, and a W-pass contracting W*C with
    kron(Bw, I_C) so the channel interleave never leaves the minor dim.
    Bit-parity validated vs the torch depthwise-conv oracle at 1e-5
    (tests/test_ops_parity.py::test_antialias_downsample_parity).
    """
    if scale == 1.0:
        return x
    k2, ka, kb, s = _gaussian_kernel_1d_meta(scale)
    B, H, W, C = x.shape
    Ah, Bw = _antialias_matrices(H, W, C, scale)
    hp = jnp.asarray(Ah, x.dtype)      # (H/s, H)
    wp = jnp.asarray(Bw, x.dtype)      # (W/s*C, W*C) = kron(Bw, I_C)
    y = jnp.einsum("hH,bHn->bhn", hp, x.reshape(B, H, W * C),
                   precision=jax.lax.Precision.HIGHEST)
    z = jnp.einsum("mn,bhn->bhm", wp, y,
                   precision=jax.lax.Precision.HIGHEST)
    return z.reshape(B, H // s, W // s, C)


@functools.lru_cache(maxsize=64)
def _antialias_matrices(H: int, W: int, C: int, scale: float):
    """Static (H/s, H) and kron((W/s, W), I_C) blur+stride matrices."""
    k2, ka, kb, s = _gaussian_kernel_1d_meta(scale)
    k1 = (k2[ka] / np.sqrt(k2[ka, ka])).astype(np.float32)
    Ah = _strided_blur_matrix(H, k1, ka, s)
    Bw = np.kron(_strided_blur_matrix(W, k1, ka, s), np.eye(C, dtype=np.float32))
    return Ah, Bw


def _strided_blur_matrix(n: int, k1: "np.ndarray", ka: int, s: int
                         ) -> "np.ndarray":
    """(n/s, n) matrix expressing zero-padded 1-D gaussian blur followed
    by stride-s subsampling: row i holds the kernel centered at i*s."""
    m = np.zeros((n // s, n), dtype=np.float32)
    for i in range(n // s):
        for t, kv in enumerate(k1):
            j = i * s + t - ka
            if 0 <= j < n:
                m[i, j] = kv
    return m


def antialias_downsample_host(frames: "np.ndarray", scale: float
                              ) -> "np.ndarray":
    """Host-side (numpy/cv2) version of antialias_downsample with the
    exact same kernel/pad/stride — lets inference pipelines ship 64x64
    keypoint inputs instead of full frames over slow host<->device links.

    frames: (F, H, W, C) float32 (already normalized). Returns
    (F, H/s, W/s, C) float32.
    """
    if scale == 1.0:
        return frames
    k2, ka, kb, s = _gaussian_kernel_1d_meta(scale)
    k1 = (k2[ka] / np.sqrt(k2[ka, ka])).astype(np.float32)
    F, H, W, C = frames.shape
    # blur+stride is separable and linear -> two small BLAS gemms over
    # the whole batch (order of magnitude faster than per-frame cv2
    # filtering, and the output keeps only every s-th row/col anyway)
    A = _strided_blur_matrix(H, k1, ka, s)           # (H/s, H)
    Bm = _strided_blur_matrix(W, k1, ka, s)          # (W/s, W)
    x = frames.transpose(1, 0, 2, 3).reshape(H, F * W * C)
    y = (A @ x).reshape(H // s, F, W, C)             # vertical pass
    y = y.transpose(2, 1, 0, 3).reshape(W, F * (H // s) * C)
    z = (Bm @ y).reshape(W // s, F, H // s, C)       # horizontal pass
    return np.ascontiguousarray(z.transpose(1, 2, 0, 3))


def blur_stride_u8(frames: "np.ndarray", scale: float) -> "np.ndarray":
    """uint8-domain antialias downsample: cv2 SIMD separable blur with a
    mid-gray constant border (uint8 128 == the float path's zero pad in
    the [-1,1] model domain), then stride. (F,H,W,C) u8 -> (F,H/s,W/s,C)
    u8, within one lsb of antialias_downsample_host on the same frames."""
    if scale == 1.0:
        return frames
    import cv2

    k2, ka, kb, s = _gaussian_kernel_1d_meta(scale)
    k1 = (k2[ka] / np.sqrt(k2[ka, ka])).astype(np.float32).reshape(-1, 1)
    F, H, W, C = frames.shape
    out = np.empty((F, H // s, W // s, C), np.uint8)
    for i, f in enumerate(frames):
        p = cv2.copyMakeBorder(f, ka, kb, ka, kb, cv2.BORDER_CONSTANT,
                               value=(128, 128, 128))
        b = cv2.sepFilter2D(p, -1, k1, k1)
        out[i] = b[ka:-kb or None, ka:-kb or None][::s, ::s]
    return out


def convex_hull_area(points):
    """Area of the convex hull of 2-D points, differentiable-free jnp impl.

    Replaces the reference's per-frame host scipy.spatial.ConvexHull.volume
    (demo.py:27-29) so the jitted animation loop never syncs to host.
    Uses the O(K^2) 'is edge on hull' formulation: for each ordered pair
    (i, j), the directed edge i->j is a hull edge iff all other points lie
    on its left; hull area = 0.5 * sum over hull edges of cross(p_i, p_j).
    K = 15 keypoints, so the K^2 masks are trivially cheap on TPU and the
    whole thing stays inside jit (static shapes, no host callback).
    """
    pts = points.astype(jnp.float32)
    K = pts.shape[0]
    pi = pts[:, None, :]  # (K, 1, 2)
    pj = pts[None, :, :]  # (1, K, 2)
    # cross((pj - pi), (pk - pi)) for all k
    d1 = pj - pi  # (K, K, 2)
    d2 = pts[None, None, :, :] - pi[:, :, None, :]  # (K, K, K, 2)
    cross = d1[..., None, 0] * d2[..., 1] - d1[..., None, 1] * d2[..., 0]
    eps = 1e-9
    all_left = jnp.all(cross >= -eps, axis=-1)  # (K, K)
    not_self = ~jnp.eye(K, dtype=bool)
    # Guard collinear duplicates: require the edge to have nonzero length.
    nonzero = jnp.sum(d1 ** 2, axis=-1) > eps
    is_edge = all_left & not_self & nonzero
    edge_cross = pi[..., 0] * pj[..., 1] - pi[..., 1] * pj[..., 0]  # (K, K)
    return 0.5 * jnp.sum(jnp.where(is_edge, edge_cross, 0.0))
