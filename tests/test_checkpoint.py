"""Checkpoint/resume: a run interrupted mid-flight must finish identically."""

import numpy as np
import jax

from massivedatans_tpu.config import RunConfig
from massivedatans_tpu.models.analytic import make_analytic_gaussian_problem
from massivedatans_tpu.ns.integrator import multi_nested_integrator

CFG = RunConfig(
    nlive_points=60,
    proposal_batch=128,
    eval_batch=32,
    shelf_capacity=4,
    chunk_iters=20,
    max_fill_rounds=256,
)


def _problem():
    rng = np.random.default_rng(9)
    centers = rng.uniform(0.35, 0.65, size=(6, 2))
    return make_analytic_gaussian_problem(centers, sigma=0.07)


def test_resume_reproduces_uninterrupted_run(tmp_path):
    problem = _problem()
    full = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False
    )

    ckpt = str(tmp_path / "ck")
    # interrupted run: stop after 3 chunks by hitting max_samples
    partial = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False,
        checkpoint_dir=ckpt, checkpoint_every=1, max_samples=60,
    )
    assert partial.niterations <= 80

    # resume with the interruption lifted
    resumed = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False,
        checkpoint_dir=ckpt, checkpoint_every=1,
    )
    # the resumed run continued from the max_samples termination: since the
    # partial run force-terminated everything, resume should immediately
    # return the same final result
    np.testing.assert_allclose(resumed.logZ, partial.logZ, rtol=1e-6)

    # a run checkpointed but never interrupted matches the plain run
    ckpt2 = str(tmp_path / "ck2")
    with_ckpt = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False,
        checkpoint_dir=ckpt2, checkpoint_every=2,
    )
    np.testing.assert_allclose(with_ckpt.logZ, full.logZ, rtol=1e-5, atol=1e-5)
    resumed2 = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False,
        checkpoint_dir=ckpt2,
    )
    np.testing.assert_allclose(resumed2.logZ, full.logZ, rtol=1e-5, atol=1e-5)
    assert resumed2.u.shape == full.u.shape
