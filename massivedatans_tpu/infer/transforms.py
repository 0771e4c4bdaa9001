"""Unconstrained <-> unit-cube bijection for the gradient backends.

The NS layers work on the unit cube (reference ``priortransform`` contract,
sample.py:52-58). HMC/VI want an unconstrained space, so both run in
``z = logit(u)`` with the exact change-of-variables correction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def z_to_u(z):
    """Sigmoid map R^n -> (0,1)^n."""
    return jax.nn.sigmoid(z)


def u_to_z(u, eps: float = 1e-6):
    """Logit map (0,1)^n -> R^n (clipped away from the walls)."""
    u = jnp.clip(u, eps, 1.0 - eps)
    return jnp.log(u) - jnp.log1p(-u)


def log_abs_det_jacobian(z):
    """log|du/dz| summed over the last axis: sum_i log sigma(z) + log sigma(-z)."""
    return (jax.nn.log_sigmoid(z) + jax.nn.log_sigmoid(-z)).sum(axis=-1)


def make_log_posterior(problem):
    """``log_post(z[D, ndim]) -> [D]``: per-dataset unnormalized posterior
    density in z-space. The prior is uniform on the cube, so the density is
    the paired likelihood plus the bijection Jacobian."""

    def log_post(z):
        u = z_to_u(z)
        x = problem.transform_batch(u)
        L = problem.loglike_paired(x)
        return L + log_abs_det_jacobian(z)

    return log_post
