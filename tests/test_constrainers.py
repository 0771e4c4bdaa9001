"""Alternative constrained-draw strategies: ellipsoids and slice sampling.

Mirrors the reference's CONSTRAINER selection (sample.py:131-155): all three
strategies must produce correct evidences on the analytic problem.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from massivedatans_tpu.config import RunConfig
from massivedatans_tpu.models.analytic import (
    make_analytic_gaussian_problem,
    true_logZ,
)
from massivedatans_tpu.ns.ellipsoids import (
    count_containing,
    fit_ellipsoids,
    sample_ellipsoids,
)
from massivedatans_tpu.ns.integrator import multi_nested_integrator


def test_fit_ellipsoids_covers_members():
    rng = np.random.default_rng(0)
    # two well-separated blobs
    a = rng.normal([0.25, 0.25], 0.03, size=(60, 2))
    b = rng.normal([0.75, 0.75], 0.05, size=(60, 2))
    w = np.vstack([a, b]).astype(np.float32)
    mask = np.ones(120, bool)
    ells = fit_ellipsoids(jnp.asarray(w), jnp.asarray(mask), jax.random.key(0),
                          n_ellipsoids=4, enlarge=2.0)
    n = np.asarray(count_containing(ells, jnp.asarray(w)))
    assert (n >= 1).all()  # every member inside at least one ellipsoid


def test_sample_ellipsoids_stays_in_union():
    rng = np.random.default_rng(1)
    w = rng.uniform(0.3, 0.7, size=(100, 3)).astype(np.float32)
    mask = np.ones(100, bool)
    ells = fit_ellipsoids(jnp.asarray(w), jnp.asarray(mask), jax.random.key(0))
    u, ok = sample_ellipsoids(ells, jax.random.key(1), 512)
    u = np.asarray(u)[np.asarray(ok)]
    assert len(u) > 50
    n = np.asarray(count_containing(ells, jnp.asarray(u)))
    assert (n >= 1).all()


@pytest.mark.slow
@pytest.mark.parametrize(
    "constrainer",
    ["MULTIELLIPSOIDS", "SLICE", "GALILEAN", "RADFRIENDS", "SUPFRIENDS"],
)
def test_alternative_constrainer_logZ(constrainer):
    rng = np.random.default_rng(11)
    D, ndim = 4, 2
    centers = rng.uniform(0.35, 0.65, size=(D, ndim))
    problem = make_analytic_gaussian_problem(centers, sigma=0.06)
    cfg = RunConfig(
        nlive_points=100,
        proposal_batch=256,
        eval_batch=64,
        shelf_capacity=4,
        chunk_iters=25,
        max_fill_rounds=1024,
        constrainer=constrainer,
    )
    result = multi_nested_integrator(
        problem, cfg, key=jax.random.key(2), progress=False
    )
    lz_true = true_logZ(centers, sigma=0.06)
    err = result.logZerr + np.sqrt(np.maximum(result.information, 0.0) / 100)
    resid = np.abs(result.logZ - lz_true)
    assert (resid < 3.5 * err + 0.8).all(), (constrainer, resid, err)


@pytest.mark.slow
@pytest.mark.parametrize("direction", ["mahalanobis", "random"])
def test_slice_direction_on_correlated_gaussian(direction):
    """Mahalanobis-direction slice (whitenedmcmc.py:200-215) on a strongly
    correlated Gaussian: evidence must land on the closed form
    log Z = (ndim/2) log 2pi + 0.5 log |Sigma| (truncation negligible)."""
    from massivedatans_tpu.models.analytic import AnalyticGaussianData
    from massivedatans_tpu.models.base import Problem

    rng = np.random.default_rng(21)
    D, ndim = 3, 2
    centers = rng.uniform(0.42, 0.58, size=(D, ndim))
    theta = np.pi / 4
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    S = np.diag([0.08, 0.008]) ** 2        # 10:1 axis ratio, rotated 45deg
    cov = R @ S @ R.T
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    lz_true = 0.5 * ndim * np.log(2 * np.pi) + 0.5 * np.log(
        np.linalg.det(cov))

    def loglike(data, xb):
        delta = xb[:, None, :] - data.centers[None, :, :]   # [B, D, ndim]
        q = jnp.einsum("bdi,ij,bdj->bd", delta, prec, delta)
        return -0.5 * q

    problem = Problem(
        data=AnalyticGaussianData(
            centers=jnp.asarray(centers, jnp.float32), sigma=jnp.float32(1)),
        prior_transform=lambda u: u,
        loglike_batch=loglike,
        ndim=ndim, ndata=D, name="correlated",
    )
    cfg = RunConfig(
        nlive_points=100, proposal_batch=256, eval_batch=64,
        shelf_capacity=4, chunk_iters=25, max_fill_rounds=1024,
        constrainer="SLICE", slice_direction=direction,
    )
    result = multi_nested_integrator(
        problem, cfg, key=jax.random.key(3), progress=False)
    err = result.logZerr + np.sqrt(np.maximum(result.information, 0.0) / 100)
    resid = np.abs(result.logZ - lz_true)
    assert (resid < 3.5 * err + 0.8).all(), (direction, resid, err)


def test_slice_direction_env_and_validation():
    import dataclasses
    import os

    from massivedatans_tpu.ns.strategies import make_slice, make_strategy

    cfg = RunConfig(constrainer="SLICE", slice_direction="mahalanobis")
    make_strategy(cfg)  # resolves without error
    with pytest.raises(ValueError, match="slice_direction"):
        make_slice(cfg, direction="bogus")
    os.environ["SLICE_DIRECTION"] = "random"
    try:
        assert RunConfig.from_env().slice_direction == "random"
    finally:
        del os.environ["SLICE_DIRECTION"]
