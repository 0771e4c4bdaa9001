"""Analytic-evidence test problem.

The reference has no unit tests; its acceptance oracle is statistical
(survey §4): sampled logZ vs an analytically known evidence
(``plotevidences.py:17-36``). This module provides the sharpest version of
that oracle: a spherical-Gaussian likelihood on the unit cube whose evidence
has a closed form per dataset, so end-to-end engine runs can be validated to
Monte-Carlo error without a reference binary.

    L_d(theta) = -sum_i (theta_i - c_{d,i})^2 / (2 s^2)
    Z_d = prod_i s * sqrt(2*pi)/2 * [erf((1-c_i)/(s*sqrt2)) + erf(c_i/(s*sqrt2))]
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from massivedatans_tpu.models.base import Problem


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AnalyticGaussianData:
    centers: Any  # [D, ndim]
    sigma: Any    # scalar


def _identity_prior(u):
    return u


def analytic_loglike_batch(data: AnalyticGaussianData, x_batch):
    # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 -> matmul over datasets
    cross = jnp.dot(
        x_batch, data.centers.T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [B, D]
    ssx = jnp.sum(jnp.square(x_batch), axis=1)
    ssc = jnp.sum(jnp.square(data.centers), axis=1)
    d2 = ssx[:, None] - 2.0 * cross + ssc[None, :]
    return -0.5 * d2 / jnp.square(data.sigma)


def true_logZ(centers: np.ndarray, sigma: float) -> np.ndarray:
    """Exact per-dataset log-evidence of the unit-cube-truncated Gaussian."""
    from scipy.special import erf

    c = np.asarray(centers, dtype=np.float64)
    s2 = sigma * np.sqrt(2.0)
    per_axis = (sigma * np.sqrt(2.0 * np.pi) / 2.0) * (
        erf((1.0 - c) / s2) + erf(c / s2)
    )
    return np.log(per_axis).sum(axis=1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AnalyticBimodalData:
    centers_a: Any  # [D, ndim]
    centers_b: Any  # [D, ndim]
    sigma: Any      # scalar


def _sq_dist_to(x_batch, centers):
    cross = jnp.dot(
        x_batch, centers.T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    ssx = jnp.sum(jnp.square(x_batch), axis=1)
    ssc = jnp.sum(jnp.square(centers), axis=1)
    return ssx[:, None] - 2.0 * cross + ssc[None, :]


def bimodal_loglike_batch(data: AnalyticBimodalData, x_batch):
    """log(0.5 N(c_a, s) + 0.5 N(c_b, s)) per dataset — the multimodal
    oracle (an equal-weight two-blob mixture with exact evidence)."""
    inv = 0.5 / jnp.square(data.sigma)
    la = -_sq_dist_to(x_batch, data.centers_a) * inv
    lb = -_sq_dist_to(x_batch, data.centers_b) * inv
    return jnp.logaddexp(la, lb) - jnp.log(2.0)


def true_logZ_bimodal(centers_a, centers_b, sigma: float) -> np.ndarray:
    """Exact evidence of the equal-weight truncated two-Gaussian mixture."""
    za = true_logZ(centers_a, sigma)
    zb = true_logZ(centers_b, sigma)
    return np.logaddexp(za, zb) - np.log(2.0)


def make_analytic_bimodal_problem(centers_a, centers_b, sigma=0.05) -> Problem:
    """Two well-separated Gaussian blobs per dataset with known total
    evidence — the multimodal acceptance oracle (the regime the reference's
    MultiEllipsoidal/nestle splitting exists for, elldrawer.py:36-48)."""
    centers_a = np.asarray(centers_a, dtype=np.float64)
    centers_b = np.asarray(centers_b, dtype=np.float64)
    ndata, ndim = centers_a.shape
    data = AnalyticBimodalData(
        centers_a=jnp.asarray(centers_a, dtype=jnp.float32),
        centers_b=jnp.asarray(centers_b, dtype=jnp.float32),
        sigma=jnp.float32(sigma),
    )
    return Problem(
        data=data,
        prior_transform=_identity_prior,
        loglike_batch=bimodal_loglike_batch,
        ndim=ndim,
        ndata=ndata,
        name="analytic_bimodal",
    )


def make_analytic_gaussian_problem(centers, sigma=0.05) -> Problem:
    centers = np.asarray(centers, dtype=np.float64)
    ndata, ndim = centers.shape
    data = AnalyticGaussianData(
        centers=jnp.asarray(centers, dtype=jnp.float32),
        sigma=jnp.float32(sigma),
    )
    return Problem(
        data=data,
        prior_transform=_identity_prior,
        loglike_batch=analytic_loglike_batch,
        ndim=ndim,
        ndata=ndata,
        name="analytic_gaussian",
    )
