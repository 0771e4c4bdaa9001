"""Genuine mid-run checkpoint resume (VERDICT r1 #4).

The round-1 test interrupted via ``max_samples``, which force-terminates
every dataset on device, so the resume path never actually continued a
running sampler. Here the run is preempted after k chunks with datasets
still running (shelves non-empty, pile mid-growth), resumed, and the final
result must be bit-identical to the uninterrupted run (lookahead 0: the
dispatch chain is fully deterministic).
"""

import numpy as np
import jax
import pytest

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
    min_samples=120,  # keep every dataset running well past the preemption
    pipeline_lookahead=0,  # bit-identity contract (see integrator docstring)
)


def _problem():
    rng = np.random.default_rng(11)
    centers = rng.uniform(0.35, 0.65, size=(6, 2))
    return make_analytic_gaussian_problem(centers, sigma=0.07)


def test_preempt_midrun_resume_bitidentical(tmp_path):
    problem = _problem()
    full = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False
    )
    assert full.niterations > 3 * CFG.chunk_iters + 20  # 3 chunks = mid-run

    ckpt = str(tmp_path / "ck")
    partial = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False,
        checkpoint_dir=ckpt, checkpoint_every=1, max_chunks=3,
    )
    # genuinely mid-run: datasets still running at the preemption point
    assert partial.stats["interrupted"]
    assert partial.niterations == 3 * CFG.chunk_iters
    assert partial.niterations < full.niterations

    resumed = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False,
        checkpoint_dir=ckpt, checkpoint_every=1,
    )
    assert not resumed.stats["interrupted"]
    assert resumed.niterations == full.niterations
    np.testing.assert_array_equal(resumed.logZ, full.logZ)
    np.testing.assert_array_equal(resumed.L, full.L)
    np.testing.assert_array_equal(resumed.u, full.u)
    np.testing.assert_array_equal(resumed.w, full.w)
    assert resumed.ndraws == full.ndraws


def test_preempt_resume_preempt_again(tmp_path):
    """Two preemptions in sequence (rolling preemptible workers)."""
    problem = _problem()
    full = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False
    )
    ckpt = str(tmp_path / "ck")
    p1 = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False,
        checkpoint_dir=ckpt, checkpoint_every=1, max_chunks=2,
    )
    assert p1.stats["interrupted"]
    p2 = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False,
        checkpoint_dir=ckpt, checkpoint_every=1, max_chunks=4,
    )
    assert p2.stats["interrupted"]
    assert p2.niterations == 4 * CFG.chunk_iters
    final = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False,
        checkpoint_dir=ckpt, checkpoint_every=1,
    )
    np.testing.assert_array_equal(final.logZ, full.logZ)
    np.testing.assert_array_equal(final.L, full.L)


def test_max_chunks_requires_checkpoint_dir():
    with pytest.raises(ValueError, match="checkpoint_dir"):
        multi_nested_integrator(
            _problem(), CFG, key=jax.random.key(0), progress=False,
            max_chunks=2,
        )


def test_preempt_resume_under_mesh(tmp_path):
    """Checkpoint + resume with the state sharded over a dataset mesh."""
    from jax.sharding import Mesh

    from massivedatans_tpu.parallel.sharded import DATA_AXIS

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.array(devs[:2]), (DATA_AXIS,))

    problem = _problem()
    full = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False, mesh=mesh,
    )
    ckpt = str(tmp_path / "ckm")
    partial = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False, mesh=mesh,
        checkpoint_dir=ckpt, checkpoint_every=1, max_chunks=3,
    )
    assert partial.stats["interrupted"]
    resumed = multi_nested_integrator(
        problem, CFG, key=jax.random.key(4), progress=False, mesh=mesh,
        checkpoint_dir=ckpt, checkpoint_every=1,
    )
    np.testing.assert_array_equal(resumed.logZ, full.logZ)
    np.testing.assert_array_equal(resumed.L, full.L)
    assert resumed.niterations == full.niterations
