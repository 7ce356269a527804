"""Reenactment inference engine — the demo.py/animate.py hot path.

Parity target: demo.py:24-134 (normalize_kp + make_animation) and
models/appmotioncomp_model.py:607-639, but re-architected for TPU:

  * The reference loops frame-by-frame at batch 1 with per-frame H2D/D2H
    copies and a host-side scipy ConvexHull every frame (demo.py:117-131).
    Here keypoints for ALL driving frames are extracted in one batched
    call, normalize_kp (including the hull area, ops.convex_hull_area) is
    pure jnp inside jit, and generation runs in frame batches with the
    source features computed once per batch — the per-frame python loop is
    gone.
  * Two jitted callables cover the whole pipeline; first call compiles,
    the rest are pure device execution, which is what the >=60 fps/chip
    target needs.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .ops import convex_hull_area
from .models import build_network


def normalize_kp_jnp(kp_source, kp_driving, kp_driving_initial,
                     adapt_movement_scale: bool = False,
                     use_relative_movement: bool = False,
                     use_relative_jacobian: bool = False):
    """Relative-motion keypoint normalization (demo.py:24-44), batched over
    driving frames. kp_source/_initial have batch 1; kp_driving batch F."""
    if adapt_movement_scale:
        source_area = convex_hull_area(kp_source["value"][0])
        driving_area = convex_hull_area(kp_driving_initial["value"][0])
        scale = jnp.sqrt(source_area) / jnp.sqrt(driving_area)
    else:
        scale = 1.0

    kp_new = dict(kp_driving)
    if use_relative_movement:
        diff = (kp_driving["value"] - kp_driving_initial["value"]) * scale
        kp_new["value"] = diff + kp_source["value"]
        if use_relative_jacobian and kp_driving.get("jacobian") is not None:
            jac_diff = jnp.matmul(
                kp_driving["jacobian"],
                jnp.linalg.inv(
                    kp_driving_initial["jacobian"].astype(jnp.float32)
                ),
                precision=jax.lax.Precision.HIGHEST,
            )
            kp_new["jacobian"] = jnp.matmul(
                jac_diff, kp_source["jacobian"],
                precision=jax.lax.Precision.HIGHEST,
            )
    return kp_new


class ReenactmentPipeline:
    """Holds the nets + jitted stages. Variables are flax collections:
    {'params': ..., 'batch_stats': ...} per network."""

    def __init__(self, net_g, motion_estimator, g_vars, m_vars,
                 relative: bool = False, adapt_scale: bool = False,
                 frame_batch: int = 8, w: float = 1.0,
                 compute_dtype=jnp.bfloat16, u8_io: bool = False,
                 host_kp_downsample: bool = False, mesh=None,
                 yuv420_io: bool = False):
        self.net_g = net_g
        self.motion_estimator = motion_estimator
        self.relative = relative
        self.adapt_scale = adapt_scale
        self.frame_batch = frame_batch
        self.w = w
        self.compute_dtype = compute_dtype
        self.u8_io = u8_io  # uint8 across the host link, both directions
        # D2H generated frames as codec-native packed I420 (1.5 B/px vs
        # 3 — the D2H stream is the dominant link traffic); the fetch
        # threads convert back to RGB with cv2, so the external API is
        # unchanged. Requires u8_io.
        self.yuv420_io = yuv420_io and u8_io
        # pre-blur+stride driving frames to the kp detector's working
        # resolution on the host (identical math) — 16x less kp traffic
        self.host_kp_downsample = host_kp_downsample
        self.kp_scale = motion_estimator.kp_detector_params.get(
            "scale_factor", 1.0
        ) if host_kp_downsample else 1.0

        self.mesh = mesh

        def cast(tree):
            if compute_dtype is None:
                return tree
            return jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype)
                if hasattr(a, "astype") and a.dtype == jnp.float32 else a,
                tree,
            )

        # bf16 weights/activations: MXU-native inference precision
        self.g_vars = cast(g_vars)
        self.m_vars = cast(m_vars)

        # frame parallelism: frames are independent given kp_source (the
        # analogue of sequence parallelism here — SURVEY.md 5.7). With a
        # mesh, the frame batch shards across chips; params replicate and
        # XLA partitions the whole gen step.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._frame_sharding = NamedSharding(mesh, P("data"))
            self._repl_sharding = NamedSharding(mesh, P())
            rep = lambda t: jax.tree_util.tree_map(
                lambda a: jax.device_put(a, self._repl_sharding), t
            )
            self.g_vars = rep(self.g_vars)
            self.m_vars = rep(self.m_vars)

        # params are jit ARGUMENTS (not closure constants) so the compiled
        # executables stay small and weights can be swapped without
        # recompiling
        self._kp_jit = jax.jit(self._kp_impl, static_argnums=(2,))
        self._gen_jit = jax.jit(self._gen_impl)
        self._enc_jit = jax.jit(self._enc_impl)

    def _normalize_in(self, images):
        """Inside-jit: uint8 RGB -> model domain [-1, 1]. uint8 crosses the
        host link untouched (4x fewer bytes than float32 — the H2D pipe is
        usually the reenactment bottleneck); normalization runs on device."""
        dt = self.compute_dtype or jnp.float32
        if images.dtype == jnp.uint8:
            return images.astype(dt) * (2.0 / 255.0) - 1.0
        return images.astype(dt)

    def _kp_fn(self, images, pre_downsampled: bool = False):
        return self._kp_jit(self.m_vars, jnp.asarray(images),
                            pre_downsampled)

    def _host_kp_prep(self, frames_np: np.ndarray) -> np.ndarray:
        """uint8/float frames -> normalized frames at the kp working
        resolution, in bf16 (halves upload bytes; kp math upcasts).

        uint8 inputs blur in the uint8 domain (cv2 SIMD, ~3.5x faster on
        the single host core; mid-gray border = the float path's zero
        pad). Error vs the float path is sub-lsb — below the bf16 noise
        the kp detector already runs at."""
        import ml_dtypes

        from .ops.coords import antialias_downsample_host, blur_stride_u8

        f = np.asarray(frames_np)
        if f.dtype == np.uint8:
            small_u8 = blur_stride_u8(f, self.kp_scale)
            small = small_u8.astype(np.float32) * (2.0 / 255.0) - 1.0
        else:
            small = antialias_downsample_host(f, self.kp_scale)
        return small.astype(ml_dtypes.bfloat16)

    def _enc_fn(self, source):
        return self._enc_jit(self.g_vars, jnp.asarray(source))

    def _gen_fn(self, source, src_feats, kp_source, kp_driving, kp_initial):
        if self.mesh is not None:
            kp_driving = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, self._frame_sharding),
                kp_driving,
            )
        return self._gen_jit(self.g_vars, self.m_vars, jnp.asarray(source),
                             src_feats, kp_source, kp_driving, kp_initial)

    # -------------------- jitted stages --------------------

    def _kp_impl(self, m_vars, images, pre_downsampled: bool = False):
        images = self._normalize_in(images)
        kp = self.motion_estimator.apply(
            m_vars, images, method="estimate_kp", train=False,
            pre_downsampled=pre_downsampled,
        )
        # keep kp math (hull areas, jacobian inverses) in f32
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), kp
        )

    def _enc_impl(self, g_vars, source):
        """Source encoder sweep — once per source, not per frame batch."""
        return self.net_g.apply(g_vars, self._normalize_in(source),
                                method="encode_source")

    def _gen_impl(self, g_vars, m_vars, source, src_feats, kp_source,
                  kp_driving, kp_driving_initial):
        """source: (1,H,W,3); kp_driving batched (F,...). Returns
        (F,H,W,3) — uint8 RGB when the pipeline is in u8 IO mode (keeps
        the D2H link at 1/4 the bytes), else float32 [-1,1]."""
        source = self._normalize_in(source)
        F = kp_driving["value"].shape[0]
        kp_norm = normalize_kp_jnp(
            kp_source, kp_driving, kp_driving_initial,
            adapt_movement_scale=self.adapt_scale,
            use_relative_movement=self.relative,
            use_relative_jacobian=self.relative,
        )
        kp_src = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (F,) + x.shape[1:]), kp_source
        )
        if self.compute_dtype is not None:
            kp_norm = jax.tree_util.tree_map(
                lambda a: a.astype(self.compute_dtype), kp_norm
            )
            kp_src = jax.tree_util.tree_map(
                lambda a: a.astype(self.compute_dtype), kp_src
            )
        # downsample the shared source ONCE (batch 1); dense motion
        # broadcasts it against the F per-frame keypoint sets
        from .ops import antialias_downsample

        dm_scale = self.motion_estimator.dense_motion_params.get(
            "scale_factor", 1.0
        )
        src_down = antialias_downsample(source, dm_scale)
        dense_motion = self.motion_estimator.apply(
            m_vars, kp_src, kp_norm, src_down,
            method="estimate_motion_w_kp", train=False,
            pre_downsampled=True,
        )
        out = self.net_g.apply(
            g_vars, source, dense_motion, w=self.w, inference=True,
            source_feats=src_feats,
        )["out"]
        if self.yuv420_io:
            from .ops.color import rgb_to_yuv420

            return rgb_to_yuv420(out)
        if self.u8_io:
            out = jnp.clip(out.astype(jnp.float32), -1.0, 1.0)
            return jnp.round((out + 1.0) * 127.5).astype(jnp.uint8)
        return out.astype(jnp.float32)

    # -------------------- host orchestration --------------------

    def estimate_kp(self, images_np: np.ndarray):
        return self._kp_fn(jnp.asarray(images_np))

    def animate(self, source_np: np.ndarray, driving_np: np.ndarray,
                kp_batch: Optional[int] = None) -> np.ndarray:
        """source: (1,H,W,3) float32 [-1,1]; driving: (F,H,W,3).
        Returns (F,H,W,3) predictions in [-1,1] float32.

        Chunk-pipelined: each frame_batch chunk runs kp extraction then
        generation before the next chunk's kp dispatch, so the first
        generated chunk (and its D2H stream — the long pole on a
        bandwidth-limited host link) starts as early as possible instead
        of after a full-video kp pass. All dispatches are async; fetches
        stream through a thread pool at the end."""
        del kp_batch  # kp now runs per generation chunk
        F = driving_np.shape[0]
        source = jnp.asarray(source_np)
        if self.host_kp_downsample:
            kp_source = self._kp_fn(self._host_kp_prep(source_np), True)
        else:
            kp_source = self._kp_fn(source)

        # source features once per source (not per frame batch)
        src_feats = self._enc_fn(source)

        outs = []
        counts = []
        fb = self.frame_batch
        kp_initial = None
        for s in range(0, F, fb):
            chunk = driving_np[s:s + fb]
            n = chunk.shape[0]
            if n < fb:  # pad to the compiled batch shape
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], fb - n, axis=0)]
                )
            if self.host_kp_downsample:
                kp_chunk = self._kp_fn(self._host_kp_prep(chunk), True)
            else:
                kp_chunk = self._kp_fn(np.asarray(chunk))
            if kp_initial is None:  # kp of driving[0] (demo.py:115)
                kp_initial = jax.tree_util.tree_map(
                    lambda x: x[:1], kp_chunk
                )
            outs.append(self._gen_fn(source, src_feats, kp_source,
                                     kp_chunk, kp_initial))
            counts.append(n)
        # fetch concurrently: D2H of chunk k streams while later chunks
        # still compute (and multiple streams share the host link)
        from concurrent.futures import ThreadPoolExecutor

        if self.yuv420_io:
            import cv2

            def fetch(on):
                packed = np.asarray(on[0][:on[1]])  # (n, H*3/2, W) I420
                return np.stack([
                    cv2.cvtColor(p, cv2.COLOR_YUV2RGB_I420)
                    for p in packed
                ])
        else:
            def fetch(on):
                return np.asarray(on[0][:on[1]])

        with ThreadPoolExecutor(max_workers=4) as pool:
            host = list(pool.map(fetch, zip(outs, counts)))
        return np.concatenate(host, axis=0)

    def animate_with_anchor(self, source_np, driving_np,
                            anchor_idx: int) -> np.ndarray:
        """Forward/backward stitching around the best frame
        (demo.py:210-217)."""
        fwd = self.animate(source_np, driving_np[anchor_idx:])
        bwd = self.animate(source_np, driving_np[:anchor_idx + 1][::-1])
        return np.concatenate([bwd[::-1], fwd[1:]], axis=0)


def _to_rgb01(x: np.ndarray) -> np.ndarray:
    """Model-domain ([-1,1] float) or uint8 frame(s) -> float [0,1]."""
    if x.dtype == np.uint8:
        return x.astype(np.float32) / 255.0
    return (np.asarray(x, np.float32) + 1.0) / 2.0


def find_best_frame_fa(source_np, driving_np, cpu: bool = True) -> int:
    """Anchor selection with face_alignment landmarks — the reference's
    PRIMARY criterion (demo.py:74-101): 68 2D landmarks, mean-centered,
    scaled by sqrt(ConvexHull area), squared-L2 vs the source; per-frame
    detection failures are skipped like the reference's try/except."""
    import face_alignment
    from scipy.spatial import ConvexHull

    def normalize_kp(kp):
        kp = np.asarray(kp, np.float64).copy()
        kp = kp - kp.mean(axis=0, keepdims=True)
        area = np.sqrt(ConvexHull(kp[:, :2]).volume)
        kp[:, :2] = kp[:, :2] / area
        return kp

    fa = face_alignment.FaceAlignment(
        face_alignment.LandmarksType.TWO_D, flip_input=True,
        device="cpu" if cpu else "cuda")
    # face_alignment >=1.4 removed the deprecated get_landmarks alias;
    # get_landmarks_from_image is the canonical name on every version
    landmarks = getattr(fa, "get_landmarks_from_image", None) \
        or fa.get_landmarks
    source = _to_rgb01(np.asarray(source_np))
    if source.ndim == 4:
        source = source[0]
    kp_source = normalize_kp(landmarks(255 * source)[0])
    norm, frame_num = float("inf"), 0
    for i in range(driving_np.shape[0]):
        try:
            image = _to_rgb01(driving_np[i])
            kp_driving = normalize_kp(landmarks(255 * image)[0])
            new_norm = float(((kp_source - kp_driving) ** 2).sum())
            if new_norm < norm:
                norm, frame_num = new_norm, i
        except Exception as e:  # detection failure on one frame (ref :99)
            print(e)
    return frame_num


def find_best_frame(source_np, driving_np,
                    pipeline: Optional[ReenactmentPipeline] = None,
                    cpu: bool = True) -> int:
    """Reference-faithful anchor selection: face_alignment when usable
    (demo.py:74-101), else the pipeline's own unsupervised keypoints
    under the same hull-normalized criterion. Falls back on ANY
    face_alignment failure (missing package, removed API, no CUDA on a
    cpu=False request, no face found in the source) — anchor selection
    should degrade, not kill the run."""
    try:
        import face_alignment  # noqa: F401

        return find_best_frame_fa(source_np, driving_np, cpu=cpu)
    except Exception as e:
        if pipeline is None:
            raise
        print(f"find_best_frame: face_alignment path failed "
              f"({type(e).__name__}: {e}); using own-kp fallback")
        return find_best_frame_kp(pipeline, source_np, driving_np)


def find_best_frame_kp(pipeline: ReenactmentPipeline, source_np,
                       driving_np) -> int:
    """FALLBACK anchor selection used only when face_alignment is not
    installed (see find_best_frame): the pipeline's own unsupervised
    keypoints under the reference's hull-normalized L2 criterion
    (demo.py:74-101)."""
    kp_s = np.asarray(pipeline.estimate_kp(source_np)["value"][0])
    from scipy.spatial import ConvexHull

    def norm(kp):
        kp = kp - kp.mean(axis=0, keepdims=True)
        area = np.sqrt(ConvexHull(kp[:, :2]).volume)
        return kp / max(area, 1e-8)

    kp_s = norm(kp_s)
    best, best_idx = float("inf"), 0
    kps = []
    # chunk at the pipeline's compiled frame batch (AOT serving stages
    # accept exactly batch 1 or frame_batch), padding the tail
    bs = int(getattr(pipeline, "frame_batch", 64) or 64)
    for s in range(0, driving_np.shape[0], bs):
        chunk = driving_np[s:s + bs]
        n = chunk.shape[0]
        if n < bs:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], bs - n, axis=0)]
            )
        kps.append(np.asarray(
            pipeline.estimate_kp(chunk)["value"]
        )[:n])
    kps = np.concatenate(kps, axis=0)
    for i in range(kps.shape[0]):
        n = float(((norm(kps[i]) - kp_s) ** 2).sum())
        if n < best:
            best, best_idx = n, i
    return best_idx


def build_pipeline_from_config(config: Dict[str, Any], g_vars, m_vars,
                               relative=False, adapt_scale=False,
                               frame_batch: int = 8) -> ReenactmentPipeline:
    net_g = build_network(config["network_g"])
    motion_estimator = build_network(config["network_motion_estimator"])
    return ReenactmentPipeline(
        net_g, motion_estimator, g_vars, m_vars,
        relative=relative, adapt_scale=adapt_scale,
        frame_batch=frame_batch,
    )
