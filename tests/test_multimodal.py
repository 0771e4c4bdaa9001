"""Multimodal end-to-end validation (VERDICT r2 missing #3).

Two well-separated Gaussian blobs per dataset with exact total evidence
(models/analytic.py bimodal oracle). The constrainer must (a) recover the
total logZ within MC error — which requires proposing into BOTH modes all
the way down the contour — and (b) leave both modes populated in the
weighted posterior. This is the regime the reference's multi-ellipsoid
decomposition exists for (elldrawer.py:36-48); MLFriends covers it with a
union of balls, slice sampling by chain restarts from random live points.
"""

import numpy as np
import jax
import pytest

from massivedatans_tpu.config import RunConfig
from massivedatans_tpu.models.analytic import (
    make_analytic_bimodal_problem,
    true_logZ_bimodal,
)
from massivedatans_tpu.ns.integrator import multi_nested_integrator

SIGMA = 0.04
NLIVE = 160


def _problem():
    # 4 datasets; per dataset the two modes sit in opposite corners of the
    # square, separated by >10 sigma — a union-of-balls or ellipsoid region
    # that collapses onto one mode fails the evidence by ~log(2)
    rng = np.random.default_rng(7)
    D, ndim = 4, 2
    ca = rng.uniform(0.15, 0.3, size=(D, ndim))
    cb = rng.uniform(0.7, 0.85, size=(D, ndim))
    return make_analytic_bimodal_problem(ca, cb, sigma=SIGMA), ca, cb


def _cfg(constrainer):
    return RunConfig(
        nlive_points=NLIVE,
        proposal_batch=256,
        eval_batch=64,
        shelf_capacity=4,
        chunk_iters=25,
        tolerance=0.5,
        max_fill_rounds=512,
        constrainer=constrainer,
    )


@pytest.mark.parametrize(
    "constrainer", ["MLFRIENDS", "MULTIELLIPSOIDS", "SLICE"]
)
def test_bimodal_evidence_and_mode_populations(constrainer):
    problem, ca, cb = _problem()
    result = multi_nested_integrator(
        problem, _cfg(constrainer), key=jax.random.key(5), progress=False
    )
    lz_true = true_logZ_bimodal(ca, cb, SIGMA)
    err = result.logZerr + np.sqrt(
        np.maximum(result.information, 0.0) / NLIVE
    )
    resid = np.abs(result.logZ - lz_true)
    # a mode dropped midway biases logZ low by up to log(2) ~ 0.69; the
    # bound must stay well below that while allowing MC scatter
    assert (resid < 3.0 * err + 0.5).all(), (constrainer, resid, err)
    assert resid.mean() < 0.4, (constrainer, result.logZ, lz_true)

    # both modes populated: posterior mass within 5 sigma of each center
    w = (result.w + result.L).astype(np.float64)
    for d in range(problem.ndata):
        wd = np.where(result.mask[:, d], w[:, d], -np.inf)
        wd = np.exp(wd - wd.max())
        wd /= wd.sum()
        x = result.x[:, d, :].astype(np.float64)
        da = np.linalg.norm(x - ca[d], axis=1)
        db = np.linalg.norm(x - cb[d], axis=1)
        mass_a = wd[da < 5 * SIGMA].sum()
        mass_b = wd[db < 5 * SIGMA].sum()
        assert mass_a + mass_b > 0.95, (constrainer, d, mass_a, mass_b)
        # equal-weight mixture: each mode should hold a substantial share
        assert min(mass_a, mass_b) > 0.15, (constrainer, d, mass_a, mass_b)
