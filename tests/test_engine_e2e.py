"""End-to-end engine validation.

The acceptance standard is the reference's own (survey §4): evidences must
match analytic truth within Monte-Carlo error, and posteriors must recover
injected parameters. The analytic-Gaussian problem provides an exact logZ
oracle per dataset.
"""

import numpy as np
import jax
import pytest

from massivedatans_tpu.config import RunConfig
from massivedatans_tpu.models.analytic import (
    make_analytic_gaussian_problem,
    true_logZ,
)
from massivedatans_tpu.models.gaussline import make_gaussline_problem
from massivedatans_tpu.ns.integrator import multi_nested_integrator
from massivedatans_tpu.datagen.generators import gen_horns, gen_nothing

SMALL = RunConfig(
    nlive_points=100,
    proposal_batch=256,
    eval_batch=64,
    shelf_capacity=4,
    chunk_iters=25,
    tolerance=0.5,
    max_fill_rounds=512,
)


@pytest.fixture(scope="module")
def analytic_result():
    rng = np.random.default_rng(42)
    D, ndim = 8, 2
    centers = rng.uniform(0.25, 0.75, size=(D, ndim))
    problem = make_analytic_gaussian_problem(centers, sigma=0.05)
    result = multi_nested_integrator(
        problem, SMALL, key=jax.random.key(3), progress=False
    )
    return centers, result


def test_analytic_logZ_within_mc_error(analytic_result):
    centers, result = analytic_result
    lz_true = true_logZ(centers, sigma=0.05)
    err = result.logZerr + np.sqrt(np.maximum(result.information, 0.0) / 100)
    resid = np.abs(result.logZ - lz_true)
    # every dataset within generous MC bounds; population mean tighter
    assert (resid < 3.0 * err + 0.6).all(), (resid, err)
    assert resid.mean() < 0.45, (result.logZ, lz_true)


def test_analytic_posterior_recovers_centers(analytic_result):
    centers, result = analytic_result
    D = centers.shape[0]
    w = result.w + result.L  # log posterior weight per record
    for d in range(D):
        wd = w[:, d].astype(np.float64)
        wd[~np.isfinite(wd)] = -np.inf
        p = np.exp(wd - wd.max())
        p /= p.sum()
        mean = (p[:, None] * result.x[:, d, :]).sum(axis=0)
        # posterior mean ~ center to within ~0.6 posterior sigma (MC noise
        # with the effective sample size of a K=100 run)
        assert np.abs(mean - centers[d]).max() < 0.03, (d, mean, centers[d])


def test_result_schema(analytic_result):
    _, result = analytic_result
    niter_total = result.u.shape[0]
    assert result.u.shape == (niter_total, 8, 2)
    assert result.L.shape == (niter_total, 8)
    assert result.mask.shape == (niter_total, 8)
    # tail rows are the live points: last nlive rows all-active
    assert result.mask[-SMALL.nlive_points:].all()
    assert np.isfinite(result.logZ).all()
    assert (result.logZerr > 0).all()
    assert result.ndraws > 0


def test_device_termination_max_samples_is_immediate():
    """The on-device max_samples cap (engine.device_termination) fires within
    one iteration of the cap, freezing the remainder estimate — unlike
    tolerance checks, which run at the reference's every-50 cadence."""
    rng = np.random.default_rng(11)
    centers = rng.uniform(0.3, 0.7, size=(4, 2))
    problem = make_analytic_gaussian_problem(centers, sigma=0.05)
    result = multi_nested_integrator(
        problem, SMALL, key=jax.random.key(2), progress=False, max_samples=30
    )
    assert 30 <= result.niterations <= 31, result.niterations
    assert np.isfinite(result.logZ).all()
    assert (result.logZerr > 0).all()
    # the remainder dominates a 30-iteration run; the total must still be a
    # sane upper region of the evidence (not -inf / garbage)
    lz_true = true_logZ(centers, sigma=0.05)
    assert (np.abs(result.logZ - lz_true) < 25).all(), (result.logZ, lz_true)


@pytest.mark.slow
def test_nothing_suite_bayes_factors():
    """No-signal evidence calibration (plotevidences.py:17-36): logZ of the
    line model on pure noise stays within a few nats of the analytic
    no-signal evidence logZ0 = sum(-0.5 (y/sigma)^2)."""
    data = gen_nothing(16)
    problem = make_gaussline_problem(data["x"], data["y"], data["noise_level"])
    logZ0 = np.sum(-0.5 * (data["y"] / 0.01) ** 2, axis=0)
    result = multi_nested_integrator(
        problem, SMALL, key=jax.random.key(5), progress=False
    )
    B = result.logZ - logZ0
    assert np.isfinite(B).all()
    assert (B > -8.0).all() and (B < 4.0).all(), B
    # the reference implementation on this exact data gives median B = -2.71
    # (Occam penalty of the 3-parameter line model on pure noise); match it
    # within combined MC error
    assert -4.2 < np.median(B) < -1.2, B


@pytest.mark.slow
def test_horns_posterior_recovers_line_position():
    """Truth recovery on the canonical workload (plotposterior.py oracle):
    the posterior for mu must lie on the injected line for high-SNR spectra."""
    data = gen_horns(200)
    snr = data["height_narrow"] / data["noise_level"]
    bright = np.where(snr > 6)[0][:12]
    assert len(bright) >= 4, len(bright)
    y = data["y"][:, bright]
    problem = make_gaussline_problem(data["x"], y, data["noise_level"])
    result = multi_nested_integrator(
        problem, SMALL, key=jax.random.key(7), progress=False
    )
    w = result.w + result.L
    errs = []
    for d in range(problem.ndata):
        wd = w[:, d].astype(np.float64)
        wd[~np.isfinite(wd)] = -np.inf
        p = np.exp(wd - wd.max())
        p /= p.sum()
        mu_mean = (p * result.x[:, d, 1]).sum()
        mu_sd = np.sqrt((p * (result.x[:, d, 1] - mu_mean) ** 2).sum())
        pull = (mu_mean - data["mean_narrow"][bright[d]]) / max(mu_sd, 0.05)
        errs.append(pull)
    errs = np.array(errs)
    assert len(errs) >= 4
    assert np.abs(errs).max() < 6.0, errs
    assert np.abs(errs).mean() < 2.5, errs


@pytest.mark.slow
@pytest.mark.parametrize("constrainer", ["MLFRIENDS", "SUPFRIENDS"])
def test_decoupled_datasets_logZ_with_column_focus(constrainer):
    """Well-separated tight blobs decouple into singleton components early;
    the engine's column-focused proposals (engine._column_proposals) must
    keep fills cheap AND evidences unbiased in that regime — including under
    the box-metric SupFriends region, whose column balls are cubes."""
    rng = np.random.default_rng(9)
    D, ndim = 12, 2
    # spread centers on a coarse grid -> disjoint constrained regions
    gx, gy = np.meshgrid(np.linspace(0.15, 0.85, 4), np.linspace(0.2, 0.8, 3))
    centers = np.stack([gx.ravel(), gy.ravel()], axis=1)[:D]
    centers += rng.uniform(-0.02, 0.02, size=centers.shape)
    problem = make_analytic_gaussian_problem(centers, sigma=0.015)
    import dataclasses

    cfg = dataclasses.replace(SMALL, column_focus_groups=4,
                              constrainer=constrainer)
    result = multi_nested_integrator(
        problem, cfg, key=jax.random.key(5), progress=False
    )
    lz_true = true_logZ(centers, sigma=0.015)
    err = result.logZerr + np.sqrt(np.maximum(result.information, 0.0) / 100)
    resid = np.abs(result.logZ - lz_true)
    assert (resid < 3.5 * err + 0.8).all(), (resid, err)
    assert result.stats["stalled"] == 0
