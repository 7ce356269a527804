"""Dense motion network: sparse kp-driven affine flows -> dense deformation.

Parity target: archs/dense_motion_arch.py:12-161. Steps:
  heatmaps H_k = gauss(kp_d) - gauss(kp_s) (+bg zeros)           (:65-77)
  sparse affine flows from kp values + Jacobians J_s J_d^-1      (:84-104)
  per-kp warped source images (grid_sample, torch defaults:
  align_corners=False, zeros padding)                            (:106-116)
  Hourglass -> softmax mask -> sum(mask * sparse_flow)           (:129-140)
  occlusion head: sigmoid 7x7 conv on final decoder feature      (:148-158)
  multi_mask: occlusion_num sigmoid heads over the decoder stages
  plus an upsampling tail past full hourglass resolution — the
  occlusion_map output becomes a coarse->fine list                (:34-54,148-156)

TPU notes: the 16-way per-kp warp is one batched grid_sample (B*(K+1) fused
into the batch dim); all shapes static.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

import numpy as np

from ..ops import (
    antialias_downsample,
    grid_sample,
    grid_sample_grouped,
    kp2gaussian,
    make_coordinate_grid,
)
from .layers import Conv2d
from .motion_blocks import Hourglass, UpBlock2d


class DenseMotionNetwork(nn.Module):
    block_expansion: int = 64
    num_blocks: int = 5
    max_features: int = 1024
    num_kp: int = 15
    num_channels: int = 3
    estimate_occlusion_map: bool = True
    scale_factor: float = 0.25
    kp_variance: float = 0.01
    multi_mask: bool = False
    occlusion_num: int = 5

    def _heatmaps(self, spatial, kp_driving, kp_source):
        h, w = spatial
        g_d = kp2gaussian(kp_driving["value"], (h, w), self.kp_variance)
        g_s = kp2gaussian(kp_source["value"], (h, w), self.kp_variance)
        heatmap = g_d - g_s  # (B, K, h, w)
        zeros = jnp.zeros(heatmap.shape[:1] + (1,) + heatmap.shape[2:],
                          heatmap.dtype)
        return jnp.concatenate([zeros, heatmap], axis=1)  # (B, K+1, h, w)

    def _sparse_motions(self, spatial, kp_driving, kp_source):
        h, w = spatial
        B = kp_driving["value"].shape[0]
        K = self.num_kp
        identity = make_coordinate_grid(h, w)[None, None]  # (1,1,h,w,2)
        coord = identity - kp_driving["value"].reshape(B, K, 1, 1, 2)
        if kp_driving.get("jacobian") is not None:
            jac = jnp.matmul(
                kp_source["jacobian"],
                jnp.linalg.inv(kp_driving["jacobian"].astype(jnp.float32)),
                precision=jax.lax.Precision.HIGHEST,
            )  # (B, K, 2, 2)
            coord = jnp.einsum(
                "bkij,bkhwj->bkhwi", jac, coord,
                precision=jax.lax.Precision.HIGHEST,
            )
        driving_to_source = coord + kp_source["value"].reshape(B, K, 1, 1, 2)
        identity = jnp.broadcast_to(identity, (B, 1, h, w, 2))
        return jnp.concatenate([identity, driving_to_source], axis=1)

    def _deformed_source(self, source, sparse_motions):
        """(B, K+1, h, w, C*(K+1)) group-major warp of the source under
        every per-kp flow in one call. grid_sample_grouped keeps all
        intermediates lane-dense — the per-(frame,kp) C=3 layout the
        reference uses tile-pads 42x on TPU (torch defaults preserved:
        align_corners=False, zeros padding)."""
        return grid_sample_grouped(source, sparse_motions,
                                   align_corners=False,
                                   padding_mode="zeros")

    @nn.compact
    def __call__(self, source_image, kp_driving, kp_source,
                 train: bool = False, pre_downsampled: bool = False
                 ) -> Dict[str, Any]:
        """source_image may have batch 1 with kp batch F (inference fast
        path: the source is shared by every driving frame; its downsample
        and the per-kp gathers broadcast instead of materializing)."""
        x = source_image
        if self.scale_factor != 1 and not pre_downsampled:
            x = antialias_downsample(x, self.scale_factor)
        B = kp_driving["value"].shape[0]
        _, h, w, _ = x.shape

        heatmap = self._heatmaps((h, w), kp_driving, kp_source)  # (B,K+1,h,w)
        sparse_motion = self._sparse_motions((h, w), kp_driving, kp_source)
        C = x.shape[-1]
        Kp1 = self.num_kp + 1
        deformed_g = self._deformed_source(x, sparse_motion)  # (B,h,w,(K+1)C)

        # hourglass input channels interleave per kp: [heat_k, r, g, b]
        # (dense_motion_arch.py:126-129). Concat the dense group-major
        # blocks then apply the static interleave permutation in the
        # 64-wide channel minor (one cheap fused pass — building the
        # (B, h, w, K+1, C+1) rank-5 form directly tile-pads its minor).
        inp = jnp.concatenate(
            [heatmap.transpose(0, 2, 3, 1), deformed_g], axis=-1
        )  # (B, h, w, (K+1) + (K+1)*C)
        perm = np.concatenate(
            [np.concatenate(([k], Kp1 + k * C + np.arange(C)))
             for k in range(Kp1)]
        )
        inp = inp[..., perm]

        prediction = Hourglass(
            self.block_expansion,
            in_features=(self.num_kp + 1) * (self.num_channels + 1),
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            name="hourglass",
        )(inp, train, mode=1)

        mask = Conv2d(self.num_kp + 1, (7, 7), padding=3, name="mask")(
            prediction[-1]
        )
        mask = jax.nn.softmax(mask, axis=-1)  # (B, h, w, K+1)

        deformation = jnp.einsum(
            "bhwk,bkhwc->bhwc", mask, sparse_motion,
            precision=jax.lax.Precision.HIGHEST,
        )

        out = {
            "sparse_motion": sparse_motion,
            # reference layout (B, K+1, h, w, C); nothing on the forward
            # path consumes it, so XLA dead-code-eliminates the transpose
            "sparse_deformed": deformed_g.reshape(
                B, h, w, Kp1, C).transpose(0, 3, 1, 2, 4),
            "mask": mask,
            "deformation": deformation,
            "kp_heatmap": heatmap,
            "driving_kp_heatmap": kp2gaussian(
                kp_driving["value"], (h, w), self.kp_variance
            ),  # (B, K, h, w)
            "source": x,
        }

        if self.estimate_occlusion_map:
            if self.multi_mask:
                # dense_motion_arch.py:34-54 + :148-156: occlusion_num
                # sigmoid heads — the first (occlusion_num - up_nums) on
                # the tail decoder stages, the rest on an extra
                # UpBlock2d chain that carries the final hourglass
                # feature back up to the un-downscaled resolution. The
                # output is a coarse->fine list, e.g. at 256² input with
                # scale 0.25: [16², 32², 64², 128², 256²].
                up_nums = int(math.log(1.0 / self.scale_factor, 2))
                n_direct = self.occlusion_num - up_nums
                hg_last = (self.block_expansion
                           + (self.num_kp + 1) * (self.num_channels + 1))
                occ_list = []
                for i in range(n_direct):
                    occ = Conv2d(1, (7, 7), padding=3,
                                 name=f"occlusion_{i}")(
                        prediction[up_nums - self.occlusion_num + i]
                    )
                    occ_list.append(jax.nn.sigmoid(occ))
                p = prediction[-1]
                for i in range(up_nums):
                    p = UpBlock2d(hg_last // (2 ** (i + 1)),
                                  name=f"up_{i}")(p, train)
                    occ = Conv2d(1, (7, 7), padding=3,
                                 name=f"occlusion_{n_direct + i}")(p)
                    occ_list.append(jax.nn.sigmoid(occ))
                out["occlusion_map"] = occ_list
            else:
                occ = Conv2d(1, (7, 7), padding=3, name="occlusion")(
                    prediction[-1]
                )
                out["occlusion_map"] = jax.nn.sigmoid(occ)  # (B, h, w, 1)
        return out


class MotionEstimator(nn.Module):
    """KPDetector + DenseMotionNetwork wrapper.

    Parity target: archs/motion_estimator_arch.py:14-52
    (Motion_Estimator_keypoint_aware).
    """

    common_params: Dict[str, Any]
    dense_motion_params: Dict[str, Any]
    kp_detector_params: Dict[str, Any]

    def setup(self):
        from .keypoint_detector import KPDetector

        self.kp_detector = KPDetector(
            **self.common_params, **self.kp_detector_params
        )
        self.dense_motion_network = DenseMotionNetwork(
            **self.common_params, **self.dense_motion_params
        )

    def estimate_kp(self, image, train: bool = False,
                    pre_downsampled: bool = False):
        return self.kp_detector(image, train, pre_downsampled)

    def estimate_motion_w_kp(self, kp_source, kp_driving, source_image,
                             train: bool = False,
                             pre_downsampled: bool = False):
        dense_motion = self.dense_motion_network(
            source_image, kp_driving, kp_source, train, pre_downsampled
        )
        dense_motion.update(
            {"kp_driving": kp_driving, "kp_source": kp_source}
        )
        return dense_motion

    def __call__(self, driving_image, source_image, train: bool = False):
        kp_driving = self.kp_detector(driving_image, train)
        kp_source = self.kp_detector(source_image, train)
        dense_motion = self.dense_motion_network(
            source_image, kp_driving, kp_source, train
        )
        dense_motion.update(
            {"kp_driving": kp_driving, "kp_source": kp_source}
        )
        return dense_motion
