"""Thin-plate-spline warps for the equivariance loss.

Parity target: the `Transform` class at models/appmotioncomp_model.py:51-105
(random affine + TPS used by EquivarianceLoss). Note this variant computes
`distances = |d|.sum(-1)` (L1) then `distances**2 * log(distances + 1e-6)`
— subtly different from utils/motion_estimator_util.py:723-809's TPS class;
we reproduce the model's Transform because that is what training uses.

The torch version's `jacobian()` uses autograd.grad(create_graph=True);
here it's `jax.jacfwd` of the closed-form warp — exact, no graph machinery.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .coords import make_coordinate_grid


class RandomTPSParams(NamedTuple):
    theta: jnp.ndarray          # (B, 2, 3) affine
    control_points: jnp.ndarray  # (1, P*P, 2)
    control_params: jnp.ndarray  # (B, 1, P*P)


def sample_random_tps(rng, batch, sigma_affine, sigma_tps, points_tps):
    """Draw the random equivariance transform (Transform.__init__)."""
    k1, k2 = jax.random.split(rng)
    noise = sigma_affine * jax.random.normal(k1, (batch, 2, 3))
    theta = noise + jnp.eye(2, 3)[None]
    cp = make_coordinate_grid(points_tps, points_tps).reshape(1, -1, 2)
    cparam = sigma_tps * jax.random.normal(k2, (batch, 1, points_tps ** 2))
    return RandomTPSParams(theta, cp, cparam)


def tps_warp_coordinates(params: RandomTPSParams, coordinates):
    """coordinates: (B, N, 2) -> warped (B, N, 2).

    Matches Transform.warp_coordinates (appmotioncomp_model.py:75-92):
    affine part theta[:, :, :2] @ xy + theta[:, :, 2:], plus TPS radial term
    with L1 distances: r = sum|xy - cp|; term = r^2 * log(r + 1e-6).
    """
    theta = params.theta[:, None]  # (B, 1, 2, 3)
    transformed = (
        jnp.einsum("bnij,bnj->bni", jnp.broadcast_to(
            theta[..., :2], (coordinates.shape[0], coordinates.shape[1], 2, 2)
        ), coordinates, precision=jax.lax.Precision.HIGHEST)
        + theta[..., 2]
    )
    distances = coordinates[:, :, None, :] - params.control_points[:, None, :, :]
    distances = jnp.abs(distances).sum(-1)  # (B, N, P^2) — L1!
    result = distances ** 2 * jnp.log(distances + 1e-6)
    result = result * params.control_params  # (B,1,P^2) broadcast over N
    result = result.sum(axis=2)[..., None]  # (B, N, 1)
    return transformed + result


def tps_warp_frame_grid(params: RandomTPSParams, h: int, w: int):
    """Grid to warp a (B, h, w, C) frame with grid_sample(reflection)."""
    grid = make_coordinate_grid(h, w).reshape(1, h * w, 2)
    batch = params.theta.shape[0]
    grid = jnp.broadcast_to(grid, (batch, h * w, 2))
    warped = tps_warp_coordinates(params, grid)
    return warped.reshape(batch, h, w, 2)


def tps_jacobian(params: RandomTPSParams, coordinates):
    """d warp / d coordinate, per point: (B, N, 2, 2).

    Equivalent of Transform.jacobian (appmotioncomp_model.py:94-99). Row
    layout matches torch's cat([grad_x, grad_y], dim=-2): row 0 is the
    gradient of output-x wrt (x, y), row 1 of output-y.
    """

    def warp_point(b_theta, b_cparam, xy):
        p = RandomTPSParams(
            b_theta[None], params.control_points, b_cparam[None]
        )
        return tps_warp_coordinates(p, xy[None, None, :])[0, 0]

    jac_point = jax.jacfwd(warp_point, argnums=2)
    jac = jax.vmap(  # over batch
        lambda th, cp, pts: jax.vmap(lambda xy: jac_point(th, cp, xy))(pts)
    )(params.theta, params.control_params, coordinates)
    return jac
