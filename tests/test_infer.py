"""Gradient backends (infer/) against the analytic-evidence oracle.

The analytic Gaussian problem (models/analytic.py) has a closed-form
evidence and posterior (truncated spherical Gaussian), so HMC posterior
moments and VI evidences can be checked exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from massivedatans_tpu.infer import run_hmc, run_vi
from massivedatans_tpu.infer import transforms
from massivedatans_tpu.models.analytic import (
    make_analytic_gaussian_problem,
    true_logZ,
)
from massivedatans_tpu.models.gaussline import make_gaussline_problem
from massivedatans_tpu.datagen.generators import gen_horns

SIGMA = 0.05


def _problem(D=6, ndim=3, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0.3, 0.7, size=(D, ndim))
    return make_analytic_gaussian_problem(centers, sigma=SIGMA), centers


def test_logit_bijection_roundtrip():
    u = jnp.asarray(np.random.default_rng(0).uniform(0.01, 0.99, (32, 4)),
                    jnp.float32)
    z = transforms.u_to_z(u)
    np.testing.assert_allclose(np.asarray(transforms.z_to_u(z)), np.asarray(u),
                               atol=1e-5)
    # Jacobian: du/dz = u(1-u)
    expect = np.log(np.asarray(u) * (1 - np.asarray(u))).sum(axis=-1)
    got = np.asarray(transforms.log_abs_det_jacobian(z))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_paired_loglike_fallback_matches_diagonal():
    problem, centers = _problem()
    x = jnp.asarray(centers + 0.01, jnp.float32)
    paired = np.asarray(problem.loglike_paired(x))
    full = np.asarray(problem.loglike(x))
    np.testing.assert_allclose(paired, np.diagonal(full), rtol=1e-5)


def test_gaussline_paired_matches_batch_diagonal():
    data = gen_horns(8)
    problem = make_gaussline_problem(data["x"], data["y"], data["noise_level"])
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.uniform(0.1, 0.9, (8, 3)), jnp.float32)
    x = problem.transform_batch(u)
    paired = np.asarray(problem.loglike_paired(x))
    full = np.asarray(problem.loglike(x))
    np.testing.assert_allclose(paired, np.diagonal(full), rtol=1e-4, atol=0.05)


@pytest.mark.slow
def test_hmc_recovers_posterior_moments():
    problem, centers = _problem()
    res = run_hmc(problem, jax.random.key(0), num_warmup=400,
                  num_samples=400, num_leapfrog=16)
    acc = np.asarray(res.accept_rate)
    assert (acc > 0.4).all() and (acc <= 1.0).all(), acc
    mean = np.asarray(res.x.mean(axis=0))   # [D, ndim]
    std = np.asarray(res.x.std(axis=0))
    # interior centers: truncation negligible -> posterior ~ N(c, SIGMA)
    assert np.abs(mean - centers).max() < 4.0 * SIGMA / np.sqrt(400) * 10
    assert np.abs(std - SIGMA).max() < 0.6 * SIGMA


@pytest.mark.slow
def test_vi_evidence_matches_analytic():
    problem, centers = _problem()
    res = run_vi(problem, jax.random.key(0), steps=1200, lr=3e-2)
    lz = true_logZ(centers, SIGMA)
    elbo = np.asarray(res.elbo)
    iw = np.asarray(res.logZ_iw)
    # ELBO lower-bounds logZ (up to MC noise) and should be close for a
    # near-Gaussian posterior; the IW estimate should be tighter
    assert (elbo < lz + 0.2).all(), (elbo, lz)
    assert np.abs(iw - lz).max() < 0.25, (iw, lz)
    assert (iw >= elbo - 0.2).all()
