"""Eval-batch escalation (cfg.eval_batch_max) correctness.

The integrator switches to a larger candidate batch (its own cached
executable) when a chunk's measured fill-rounds/iteration exceeds the
escalation threshold, and back once fills relax; the trajectory differs
from a fixed-batch run (different RNG consumption) but the evidences must
agree with the analytic truth either way, and the switch itself must be
observable in stats.
"""

import numpy as np
import jax

from massivedatans_tpu.config import RunConfig
from massivedatans_tpu.models.analytic import (
    make_analytic_gaussian_problem,
    true_logZ,
)
from massivedatans_tpu.ns.integrator import multi_nested_integrator


def test_escalation_engages_and_keeps_evidences():
    rng = np.random.default_rng(5)
    D = 8
    # tight, well-separated modes: late-run region acceptance collapses,
    # so a tiny base batch needs many fill rounds per iteration
    centers = rng.uniform(0.2, 0.8, size=(D, 2))
    problem = make_analytic_gaussian_problem(centers, sigma=0.01)
    want = true_logZ(centers, sigma=0.01)

    cfg = RunConfig(
        nlive_points=100, proposal_batch=32, eval_batch=8,
        eval_batch_max=64, shelf_capacity=4, chunk_iters=25,
        max_fill_rounds=512,
    )
    r = multi_nested_integrator(problem, cfg, key=jax.random.key(3),
                                progress=False)

    assert r.stats["big_batch_chunks"] > 0, r.stats
    err = np.abs(r.logZ - want)
    tol = 3.0 * (r.logZerr + 0.2)
    assert (err < tol).all(), (err, tol)

    # disabled escalation must not record any big chunks
    cfg_off = RunConfig(
        nlive_points=100, proposal_batch=32, eval_batch=8,
        shelf_capacity=4, chunk_iters=25, max_fill_rounds=512,
    )
    r_off = multi_nested_integrator(problem, cfg_off, key=jax.random.key(3),
                                    progress=False)
    assert r_off.stats["big_batch_chunks"] == 0
    err = np.abs(r_off.logZ - want)
    tol = 3.0 * (r_off.logZerr + 0.2)
    assert (err < tol).all(), (err, tol)
