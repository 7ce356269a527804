"""Loss library (parity target: basicsr/losses/losses.py).

Implemented as pure functions / lightweight callables over jnp arrays
(NHWC). The perceptual losses take VGG19 feature params explicitly — no
hidden module state, so one pjit'd train step owns everything.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import antialias_downsample, tps_warp_coordinates, tps_jacobian
from ..utils.registry import LOSS_REGISTRY


def _reduce(x, reduction):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def _weight_reduce(loss, weight, reduction):
    """weight_reduce_loss (loss_util.py:25-54): with a weight map and
    reduction='mean' the normalizer is the WEIGHT mass over the weighted
    region (weight.sum() * C for a 1-channel map), not the element count —
    a weighted mean, so masked-out pixels don't dilute the loss."""
    if weight is not None:
        loss = loss * weight
    if weight is None or reduction == "sum":
        return _reduce(loss, reduction)
    if reduction == "mean":
        denom = jnp.sum(weight)
        if weight.shape[-1] == 1 and loss.shape[-1] != 1:
            denom = denom * loss.shape[-1]
        return jnp.sum(loss) / denom
    return loss


@LOSS_REGISTRY.register(name="L1Loss")
class L1Loss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        diff = jnp.abs(pred - target)
        return self.loss_weight * _weight_reduce(diff, weight,
                                                 self.reduction)


@LOSS_REGISTRY.register(name="MSELoss")
class MSELoss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        diff = (pred - target) ** 2
        return self.loss_weight * _weight_reduce(diff, weight,
                                                 self.reduction)


@LOSS_REGISTRY.register(name="CharbonnierLoss")
class CharbonnierLoss:
    def __init__(self, loss_weight=1.0, reduction="mean", eps=1e-12):
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.eps = eps

    def __call__(self, pred, target, weight=None):
        diff = jnp.sqrt((pred - target) ** 2 + self.eps)
        return self.loss_weight * _weight_reduce(diff, weight,
                                                 self.reduction)


@LOSS_REGISTRY.register(name="WeightedL1Loss")
class WeightedL1Loss:
    """Geometric per-item weighting over a list (losses.py:62-93)."""

    def __init__(self, loss_weight=1.0, reduction="mean", gamma=0.9):
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.gamma = gamma

    def __call__(self, preds, targets, weight=None):
        n = len(preds)
        loss = 0.0
        for i in range(n):
            diff = jnp.abs(preds[i] - targets[i])
            loss = loss + _weight_reduce(
                diff, weight, self.reduction
            ) * self.gamma ** (n - i - 1)
        return self.loss_weight * loss


@LOSS_REGISTRY.register(name="WeightedTVLoss")
class WeightedTVLoss:
    """Weighted total variation (losses.py:160-177), NHWC."""

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, pred, weight=None):
        wy = None if weight is None else weight[:, :-1, :, :]
        wx = None if weight is None else weight[:, :, :-1, :]
        dy = jnp.abs(pred[:, :-1, :, :] - pred[:, 1:, :, :])
        dx = jnp.abs(pred[:, :, :-1, :] - pred[:, :, 1:, :])
        return self.loss_weight * (_weight_reduce(dx, wx, "mean")
                                   + _weight_reduce(dy, wy, "mean"))


@LOSS_REGISTRY.register(name="GANLoss")
class GANLoss:
    """hinge / vanilla / lsgan / wgan / wgan_softplus (losses.py:418-520)."""

    def __init__(self, gan_type="hinge", real_label_val=1.0,
                 fake_label_val=0.0, loss_weight=1.0):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight

    def __call__(self, pred, target_is_real: bool, is_disc: bool = False):
        t = self.gan_type
        if t == "hinge":
            if is_disc:
                x = -pred if target_is_real else pred
                loss = jnp.mean(jax.nn.relu(1.0 + x))
            else:
                loss = -jnp.mean(pred)
        elif t == "vanilla":
            label = self.real_label_val if target_is_real else self.fake_label_val
            target = jnp.full_like(pred, label)
            loss = jnp.mean(
                jnp.maximum(pred, 0) - pred * target
                + jnp.log1p(jnp.exp(-jnp.abs(pred)))
            )
        elif t == "lsgan":
            label = self.real_label_val if target_is_real else self.fake_label_val
            loss = jnp.mean((pred - label) ** 2)
        elif t == "wgan":
            loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
        elif t == "wgan_softplus":
            loss = jnp.mean(
                jax.nn.softplus(-pred) if target_is_real
                else jax.nn.softplus(pred)
            )
        else:
            raise NotImplementedError(t)
        return loss if is_disc else loss * self.loss_weight


@LOSS_REGISTRY.register(name="MultiScalePyramidPerceptualLoss")
class MultiScalePyramidPerceptualLoss:
    """FOMM pyramid VGG19 loss (losses.py:292-339).

    Anti-alias pyramid at `scales`, 5 VGG19 slices, L1 per slice weighted by
    `loss_weights`, gt slice detached. VGG apply-fn + params are injected so
    the whole thing traces into one jit.
    """

    def __init__(self, vgg_apply, scales=(1, 0.5, 0.25, 0.125),
                 num_channels=3, loss_weights=(1.0,) * 5):
        self.vgg_apply = vgg_apply
        self.scales = tuple(scales)
        self.loss_weights = tuple(loss_weights)

    def __call__(self, vgg_params, pred, target):
        return self.from_target_feats(
            vgg_params, pred, self.target_features(vgg_params, target))

    def target_features(self, vgg_params, target):
        """Per-scale VGG features of the (gradient-free) target. Computed
        once per train step and shared by the main/lr/probe loss calls —
        inside each jax.checkpoint they would otherwise be recomputed
        per call AND per remat pass."""
        return [self.vgg_apply(vgg_params, antialias_downsample(target, s))
                for s in self.scales]

    def from_target_feats(self, vgg_params, pred, target_feats):
        total = 0.0
        for scale, y_feats in zip(self.scales, target_feats):
            p = antialias_downsample(pred, scale)
            x_feats = self.vgg_apply(vgg_params, p)
            for i, w in enumerate(self.loss_weights):
                total = total + w * jnp.mean(
                    jnp.abs(x_feats[i] - jax.lax.stop_gradient(y_feats[i]))
                )
        return total


@LOSS_REGISTRY.register(name="PerceptualLoss")
class PerceptualLoss:
    """Named-layer VGG perceptual + optional Gram-style loss
    (losses.py:180-289). layer indices follow the 5-slice taps of our
    VGG19Features: {'relu1_1':0, ..., 'relu5_1':4}."""

    _LAYER_IDX = {"relu1_1": 0, "relu2_1": 1, "relu3_1": 2,
                  "relu4_1": 3, "relu5_1": 4,
                  "conv1_2": 0, "conv2_2": 1, "conv3_4": 2,
                  "conv4_4": 3, "conv5_4": 4}

    def __init__(self, vgg_apply, layer_weights, perceptual_weight=1.0,
                 style_weight=0.0, criterion="l1", range_norm=False,
                 **_):
        self.vgg_apply = vgg_apply
        self.layer_weights = dict(layer_weights)
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion = criterion
        self.range_norm = range_norm

    def _crit(self, a, b):
        if self.criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        if self.criterion in ("l2", "mse"):
            return jnp.mean((a - b) ** 2)
        if self.criterion == "fro":
            return jnp.linalg.norm((a - b).reshape(-1))
        raise NotImplementedError(self.criterion)

    @staticmethod
    def _gram(x):
        b, h, w, c = x.shape
        f = x.reshape(b, h * w, c)
        return jnp.einsum("bnc,bnd->bcd", f, f) / (c * h * w)

    def __call__(self, vgg_params, x, gt):
        if self.range_norm:
            x = (x + 1) / 2
            gt = (gt + 1) / 2
        xf = self.vgg_apply(vgg_params, x)
        gf = [jax.lax.stop_gradient(f)
              for f in self.vgg_apply(vgg_params, gt)]
        percep = 0.0
        style = 0.0
        for name, w in self.layer_weights.items():
            i = self._LAYER_IDX.get(name)
            if i is None:
                continue
            if self.perceptual_weight > 0:
                percep += self._crit(xf[i], gf[i]) * w
            if self.style_weight > 0:
                style += self._crit(self._gram(xf[i]),
                                    self._gram(gf[i])) * w
        return (percep * self.perceptual_weight,
                style * self.style_weight if self.style_weight > 0
                else None)


@LOSS_REGISTRY.register(name="LPIPSLoss")
class LPIPSLoss:
    """LPIPS training loss (losses.py:389-415) on the native LPIPS-VGG16
    backbone (metrics/lpips_jax.py). Weights are discovered the same way
    as the LPIPS metric (SAMT_LPIPS_WEIGHTS / SAMT_WEIGHTS_DIR); without
    them construction raises a clear error."""

    def __init__(self, loss_weight=1.0, use_input_norm=True,
                 range_norm=False, **_):
        from ..metrics.external import _find_weights, _load_params, _missing

        wpath = _find_weights("SAMT_LPIPS_WEIGHTS",
                              ["lpips_vgg.npz", "lpips_vgg.pth"], "lpips")
        if wpath is None:
            raise _missing("lpips", "SAMT_LPIPS_WEIGHTS",
                           ["lpips_vgg.npz", "lpips_vgg.pth"])
        if wpath.endswith(".pth"):
            raise RuntimeError(
                "LPIPS .pth needs both the vgg16 backbone and the lin "
                "heads — merge them into lpips_vgg.npz with "
                "tools/convert_metric_weights.py --lpips <vgg16.pth> "
                "<lins.pth>")
        self.params = _load_params(wpath, None)
        self.loss_weight = loss_weight
        self.use_input_norm = use_input_norm
        self.range_norm = range_norm

    def __call__(self, x, gt):
        from ..metrics.lpips_jax import lpips_distance

        # Exact reference transform chain (losses.py:389-415): optional
        # range_norm [-1,1]->[0,1], then (with use_input_norm, default
        # True) ImageNet mean/std normalization, and the result is fed to
        # lpips.LPIPS(normalize=False) — whose internal ScalingLayer then
        # runs on the ALREADY ImageNet-normalized tensor. lpips_distance
        # applies that same ScalingLayer internally, so we reproduce the
        # reference's (quirky) double normalization bit-for-bit.
        if self.range_norm:
            x = (x + 1.0) / 2.0
            gt = (gt + 1.0) / 2.0
        if self.use_input_norm:
            mean = jnp.asarray([0.485, 0.456, 0.406],
                               x.dtype).reshape(1, 1, 1, 3)
            std = jnp.asarray([0.229, 0.224, 0.225],
                              x.dtype).reshape(1, 1, 1, 3)
            x = (x - mean) / std
            gt = (gt - mean) / std
        d = lpips_distance(self.params, x, jax.lax.stop_gradient(gt))
        return self.loss_weight * jnp.mean(d)


@LOSS_REGISTRY.register(name="TPSM_EquivarianceLoss")
class TPSM_EquivarianceLoss:
    """TPS-motion-model variant (losses.py:562-581): value-only, on
    'fg_kp' keypoints."""

    def __init__(self, loss_weight=1.0, transform_params=None):
        self.loss_weight = loss_weight
        self.transform_params = transform_params

    def __call__(self, kp_driving, transformed_kp, tps_params):
        warped = tps_warp_coordinates(tps_params, transformed_kp["fg_kp"])
        return self.loss_weight * jnp.mean(
            jnp.abs(kp_driving["fg_kp"] - warped)
        )


@LOSS_REGISTRY.register(name="TPSM_BGLoss")
class TPSM_BGLoss:
    """Background-transform consistency (losses.py:583-594)."""

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, bg_param, bg_param_reverse):
        value = jnp.matmul(bg_param, bg_param_reverse)
        eye = jnp.eye(3).reshape(1, 1, 3, 3)
        return self.loss_weight * jnp.mean(jnp.abs(eye - value))


def r1_penalty(d_apply, real_img):
    """R1 gradient penalty (losses.py:618-632): ||d D(x)/dx||^2 on reals.
    d_apply: img -> scalar-sum prediction."""
    grad = jax.grad(lambda x: jnp.sum(d_apply(x)))(real_img)
    return jnp.mean(jnp.sum(grad.reshape(grad.shape[0], -1) ** 2, axis=1))


def g_path_regularize(fake_img, latents_grad_fn, mean_path_length,
                      rng, decay=0.01):
    """StyleGAN2 path-length regularization (losses.py:635-644).
    latents_grad_fn(noise) -> d(sum(fake*noise))/d latents."""
    import math

    noise = jax.random.normal(rng, fake_img.shape) / math.sqrt(
        fake_img.shape[1] * fake_img.shape[2]
    )
    grad = latents_grad_fn(noise)
    path_lengths = jnp.sqrt(
        jnp.mean(jnp.sum(grad ** 2, axis=2), axis=1)
    )
    path_mean = mean_path_length + decay * (
        jnp.mean(path_lengths) - mean_path_length
    )
    penalty = jnp.mean((path_lengths - path_mean) ** 2)
    return penalty, jax.lax.stop_gradient(jnp.mean(path_lengths)), \
        jax.lax.stop_gradient(path_mean)


def gradient_penalty_loss(d_apply, real_data, fake_data, rng, weight=None):
    """WGAN-GP gradient penalty (losses.py:647-683)."""
    alpha = jax.random.uniform(rng, (real_data.shape[0], 1, 1, 1))
    interp = alpha * real_data + (1 - alpha) * fake_data

    def d_sum(x):
        return jnp.sum(d_apply(x))

    grad = jax.grad(d_sum)(interp)
    if weight is not None:
        grad = grad * weight
    gp = jnp.mean(
        (jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=1) - 1) ** 2
    )
    if weight is not None:
        gp = gp / jnp.mean(weight)
    return gp


@LOSS_REGISTRY.register(name="EquivarianceLoss")
class EquivarianceLoss:
    """Keypoint equivariance under random TPS (losses.py:523-560).

    forward(kp_driving, transformed_kp, tps_params) where tps_params are the
    RandomTPSParams drawn for this step.
    """

    def __init__(self, loss_weight_value=1.0, loss_weight_jacobian=1.0,
                 transform_params=None, use_value=True, use_jacobian=True):
        self.use_value = use_value
        self.use_jacobian = use_jacobian
        self.loss_weight_value = loss_weight_value
        self.loss_weight_jacobian = loss_weight_jacobian
        self.transform_params = transform_params or {}

    def __call__(self, kp_driving, transformed_kp, tps_params):
        l_value = 0.0
        l_jacobian = None
        if self.use_value:
            warped = tps_warp_coordinates(tps_params, transformed_kp["value"])
            l_value = self.loss_weight_value * jnp.mean(
                jnp.abs(kp_driving["value"] - warped)
            )
        if self.use_jacobian:
            jac_t = tps_jacobian(tps_params, transformed_kp["value"])
            jacobian_transformed = jnp.matmul(
                jac_t, transformed_kp["jacobian"],
                precision=jax.lax.Precision.HIGHEST,
            )
            normed_driving = jnp.linalg.inv(
                kp_driving["jacobian"].astype(jnp.float32)
            )
            value = jnp.matmul(normed_driving, jacobian_transformed,
                               precision=jax.lax.Precision.HIGHEST)
            eye = jnp.eye(2).reshape(1, 1, 2, 2)
            l_jacobian = self.loss_weight_jacobian * jnp.mean(
                jnp.abs(eye - value)
            )
        return l_value, l_jacobian


@LOSS_REGISTRY.register(name="KPDistanceLoss")
class KPDistanceLoss:
    """Repels keypoints closer than 0.2 (losses.py:596-616).

    Note: like the reference, this uses sign() and therefore has zero
    gradient almost everywhere — it acts as a telemetry term. Reproduced
    faithfully.
    """

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, kp_driving, kp_source):
        def dist_loss(kp):
            num_kp = kp.shape[1]
            d = kp[:, :, None, :] - kp[:, None, :, :]
            dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-8)
            eye = jnp.eye(num_kp) * 0.2
            return jnp.mean(-jnp.sign(dist + eye - 0.2) + 1.0)

        return self.loss_weight * (
            dist_loss(kp_source["value"]) + dist_loss(kp_driving["value"])
        )


def build_loss(opt: Dict[str, Any], **extra):
    opt = dict(opt)
    loss_type = opt.pop("type")
    cls = LOSS_REGISTRY.get(loss_type)
    return cls(**opt, **extra)
