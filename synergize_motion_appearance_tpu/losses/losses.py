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


@LOSS_REGISTRY.register(name="L1Loss")
class L1Loss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        diff = jnp.abs(pred - target)
        if weight is not None:
            diff = diff * weight
        return self.loss_weight * _reduce(diff, self.reduction)


@LOSS_REGISTRY.register(name="MSELoss")
class MSELoss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        diff = (pred - target) ** 2
        if weight is not None:
            diff = diff * weight
        return self.loss_weight * _reduce(diff, self.reduction)


@LOSS_REGISTRY.register(name="CharbonnierLoss")
class CharbonnierLoss:
    def __init__(self, loss_weight=1.0, reduction="mean", eps=1e-12):
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.eps = eps

    def __call__(self, pred, target, weight=None):
        diff = jnp.sqrt((pred - target) ** 2 + self.eps)
        if weight is not None:
            diff = diff * weight
        return self.loss_weight * _reduce(diff, self.reduction)


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
            if weight is not None:
                diff = diff * weight
            loss = loss + _reduce(diff, self.reduction) * self.gamma ** (
                n - i - 1
            )
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
        if weight is not None:
            dy = dy * wy
            dx = dx * wx
        return self.loss_weight * (jnp.mean(dx) + jnp.mean(dy))


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
        total = 0.0
        for scale in self.scales:
            p = antialias_downsample(pred, scale)
            t = antialias_downsample(target, scale)
            x_feats = self.vgg_apply(vgg_params, p)
            y_feats = self.vgg_apply(vgg_params, t)
            for i, w in enumerate(self.loss_weights):
                total = total + w * jnp.mean(
                    jnp.abs(x_feats[i] - jax.lax.stop_gradient(y_feats[i]))
                )
        return total


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
