"""Quantify the member-overflow and stall-termination biases (VERDICT r1 #5).

Member overflow: when more unique live points exist than the region's
static ``member_capacity``, the engine builds the region from a RANDOM
subsample (engine._dedup_random) with the force-shrink cap dropped. The
docstring argues this keeps the union-of-balls a valid covering region;
this test MEASURES it: evidence on the analytic problem must stay within
Monte-Carlo error even when capacity is forced so small that every build
overflows.

Stall force-termination: datasets whose shelves cannot fill are retired
early with a truncated evidence (the reference would spin forever,
multi_nested_sampler.py:422-428). The flags must reach NSResult.stats and
the .out8.hdf5 output so affected evidences are identifiable.
"""

import numpy as np
import jax
import pytest

from massivedatans_tpu.config import RunConfig
from massivedatans_tpu.models.analytic import (
    make_analytic_gaussian_problem,
    true_logZ,
)
from massivedatans_tpu.ns.integrator import multi_nested_integrator


def _problem(D=8, seed=3, sigma=0.06):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0.3, 0.7, size=(D, 2))
    return make_analytic_gaussian_problem(centers, sigma=sigma), centers, sigma


def test_forced_member_overflow_evidence_unbiased():
    problem, centers, sigma = _problem()
    want = true_logZ(centers, sigma)

    base = RunConfig(
        nlive_points=100, proposal_batch=128, eval_batch=64,
        shelf_capacity=4, chunk_iters=25, max_fill_rounds=512,
        # dense rebuild cadence: this test needs MANY region builds so the
        # capacity-64 subsampling below fires repeatedly (the default
        # draw-based cadence rebuilds too rarely on this short run)
        region_rebuild_draws=0, region_rebuild_every=5,
    )
    # member_capacity 64 << nlive 100: every region build (even the very
    # first, superset phase) must subsample -> overflow fires constantly
    import dataclasses

    tiny = dataclasses.replace(base, member_capacity=64)

    r_tiny = multi_nested_integrator(
        problem, tiny, key=jax.random.key(2), progress=False)
    r_big = multi_nested_integrator(
        problem, base, key=jax.random.key(2), progress=False)

    assert r_tiny.stats["member_overflow"] > 10, r_tiny.stats
    assert r_big.stats["member_overflow"] == 0, r_big.stats

    for r, label in [(r_tiny, "tiny"), (r_big, "big")]:
        err = np.abs(r.logZ - want)
        tol = 3.0 * (r.logZerr + 0.2)
        assert (err < tol).all(), (label, err, tol, r.logZerr)

    # the overflow run costs more draws (sparser region -> lower acceptance)
    # but must not shift the evidences relative to the full-capacity run
    diff = np.abs(r_tiny.logZ - r_big.logZ)
    joint = 3.0 * (r_tiny.logZerr + r_big.logZerr + 0.1)
    assert (diff < joint).all(), (diff, joint)


def test_stall_flags_surface_in_result_and_hdf5(tmp_path):
    """Force stalls with a PLATEAU likelihood — once every live point sits
    on the cap, no candidate can strictly exceed Lmin (the classic nested-
    sampling plateau pathology; the reference would spin in its draw loop
    forever, multi_nested_sampler.py:422-428) — and check the per-dataset
    truncation flags reach stats and the output file."""
    import dataclasses

    import jax.numpy as jnp

    from massivedatans_tpu.models.analytic import analytic_loglike_batch

    problem, centers, sigma = _problem(D=4)

    def capped(data, xb):
        return jnp.minimum(analytic_loglike_batch(data, xb), -2.0)

    problem = dataclasses.replace(problem, loglike_batch=capped)
    # tolerance 0 is unreachable (totalZerr >= sqrt(H/nlive) > 0), so the
    # only way out is the stall force-termination — exactly the truncation
    # the flags exist to expose
    cfg = RunConfig(
        nlive_points=40, proposal_batch=64, eval_batch=16,
        shelf_capacity=2, chunk_iters=10, max_fill_rounds=8,
        stall_limit=5, check_every=5, min_samples=0, tolerance=0.0,
    )
    result = multi_nested_integrator(
        problem, cfg, key=jax.random.key(0), progress=False)
    assert result.stats["stalled_mask"].shape == (4,)
    assert result.stats["stall_count"].shape == (4,)
    # every dataset ends on the plateau and must be flagged truncated
    assert result.stats["stalled_mask"].all(), result.stats

    from massivedatans_tpu.io.hdf5io import read_results, write_results

    prefix = str(tmp_path / "out")
    write_results(prefix, result)
    import h5py
    import json

    with h5py.File(prefix + ".hdf5") as f:
        assert "stalled" in f
        got = np.array(f["stalled"])
    np.testing.assert_array_equal(got, result.stats["stalled_mask"])
    with open(prefix + ".stats.json") as fh:
        stats = json.load(fh)
    assert stats["n_stalled_datasets"] == int(got.sum())
    assert "interrupted" in stats


def test_healthy_run_reports_no_stalls(tmp_path):
    problem, centers, sigma = _problem(D=4)
    cfg = RunConfig(
        nlive_points=50, proposal_batch=128, eval_batch=32,
        shelf_capacity=4, chunk_iters=20, max_fill_rounds=256,
    )
    result = multi_nested_integrator(
        problem, cfg, key=jax.random.key(1), progress=False)
    assert not result.stats["stalled_mask"].any()
    from massivedatans_tpu.io.hdf5io import write_results

    prefix = str(tmp_path / "out")
    write_results(prefix, result)
    import json

    with open(prefix + ".stats.json") as fh:
        stats = json.load(fh)
    assert stats["n_stalled_datasets"] == 0


def test_chunk_fill_budget_truncation_unbiased():
    """A tight per-dispatch fill budget truncates fills mid-chunk; with the
    per-dataset volume ledger the skipped iterations must cost wall-clock
    only — evidences stay within MC error of an unbudgeted run, and the
    truncations must NOT count toward stall force-termination."""
    import dataclasses

    problem, centers, sigma = _problem()
    want = true_logZ(centers, sigma)

    base = RunConfig(
        nlive_points=100, proposal_batch=128, eval_batch=64,
        shelf_capacity=4, chunk_iters=25, max_fill_rounds=512,
    )
    # 3 rounds per 25-iteration chunk: most iterations must run on shelf
    # stock alone and many skip entirely — the truncation path dominates
    tight = dataclasses.replace(base, chunk_fill_budget=3)

    r_tight = multi_nested_integrator(
        problem, tight, key=jax.random.key(2), progress=False)
    r_free = multi_nested_integrator(
        problem, base, key=jax.random.key(2), progress=False)

    # the budget must actually bind: strictly fewer rounds per chunk means
    # more chunks/iterations to finish the same problem
    assert r_tight.stats["fill_rounds"] > 0
    assert r_tight.niterations > r_free.niterations

    # truncation is not a stall: no dataset may be force-terminated
    assert not r_tight.stats["stalled_mask"].any(), r_tight.stats

    for r, label in [(r_tight, "tight"), (r_free, "free")]:
        err = np.abs(r.logZ - want)
        tol = 3.0 * (r.logZerr + 0.2)
        assert (err < tol).all(), (label, err, tol, r.logZerr)

    diff = np.abs(r_tight.logZ - r_free.logZ)
    joint = 3.0 * (r_tight.logZerr + r_free.logZerr + 0.1)
    assert (diff < joint).all(), (diff, joint)
