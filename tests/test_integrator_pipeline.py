"""Host-driver pipelining and pile-compaction tests.

The integrator dispatches chunks ahead of the host (cfg.pipeline_lookahead)
and compacts the point pile when it nears capacity (survey §7 'pile growth /
memory'). Neither may change results: dispatch is a pure chain of states, and
compaction renumbers pile indices while preserving the member sets, geometry
and RNG streams — so a run with a tiny pile must match a run with a huge one
exactly.
"""

import dataclasses

import numpy as np
import jax
import pytest

from massivedatans_tpu.config import RunConfig
from massivedatans_tpu.models.analytic import (
    make_analytic_gaussian_problem,
    true_logZ,
)
from massivedatans_tpu.ns.integrator import multi_nested_integrator

CFG = RunConfig(
    nlive_points=50,
    proposal_batch=128,
    eval_batch=32,
    shelf_capacity=4,
    chunk_iters=20,
    max_fill_rounds=256,
)


def _problem(D=6, ndim=2, seed=21):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0.3, 0.7, size=(D, ndim))
    return centers, make_analytic_gaussian_problem(centers, sigma=0.07)


def _run(cfg, problem):
    return multi_nested_integrator(
        problem, cfg, key=jax.random.key(4), progress=False
    )


def test_compaction_is_invisible():
    """pile_capacity=1024 forces repeated mid-run compactions; the dead-point
    stream and evidences must be identical to an uncompacted run."""
    centers, problem = _problem()
    big = _run(dataclasses.replace(CFG, pile_capacity=1 << 16), problem)
    small = _run(dataclasses.replace(CFG, pile_capacity=1024), problem)
    assert small.stats["pile_peak"] <= 1024
    np.testing.assert_array_equal(big.L, small.L)
    np.testing.assert_array_equal(big.u, small.u)
    np.testing.assert_allclose(big.logZ, small.logZ, rtol=0, atol=1e-6)
    assert big.ndraws == small.ndraws


def test_lookahead_matches_synchronous():
    """Optimistic chunk dispatch must not change the trajectory."""
    centers, problem = _problem(seed=22)
    sync = _run(dataclasses.replace(CFG, pipeline_lookahead=0), problem)
    pipe = _run(dataclasses.replace(CFG, pipeline_lookahead=2), problem)
    np.testing.assert_array_equal(sync.L, pipe.L)
    np.testing.assert_allclose(sync.logZ, pipe.logZ, rtol=0, atol=1e-6)
    assert sync.niterations == pipe.niterations
    assert sync.ndraws == pipe.ndraws


def test_pile_capacity_transport_guard():
    """Pile capacities at/above 2^24 would break the exact-f32 index
    transport in chunk_report and must be rejected with sizing guidance
    (config.resolve_pile_capacity)."""
    cfg = dataclasses.replace(CFG, pile_capacity=(1 << 24))
    with pytest.raises(ValueError, match="2\\^24"):
        cfg.resolve_pile_capacity(100)
    # the largest bucket under the border is accepted
    cap = dataclasses.replace(
        CFG, pile_capacity=(1 << 24) - 1024
    ).resolve_pile_capacity(100)
    assert cap == (1 << 24) - 1024


def test_pile_capacity_hit_drops_are_contained():
    """A pile at hard capacity drops accepted candidates on device (engine
    ``can_store``): the size clamps at capacity, dropped candidates never
    reach the shelves (no dangling indices), and the sampler keeps
    advancing — drops waste proposals, they do not corrupt state. Driven at
    the engine level with tolerance=0 so the chunk runs long enough to
    fill the smallest legal pile (1024 rows)."""
    from massivedatans_tpu.ns import engine as engine_lib

    centers, problem = _problem(D=6, seed=24)
    cfg = dataclasses.replace(
        CFG, pile_capacity=1024, tolerance=0.0, chunk_iters=900,
        region_rebuild_every=25,
    )
    P = cfg.resolve_pile_capacity(problem.ndata)
    assert P == 1024
    mc = cfg.resolve_member_capacity(problem.ndata)
    st = engine_lib.init_state(problem, jax.random.key(9), cfg)
    st2, dead = engine_lib.run_chunk(problem, st, cfg, mc, cfg.chunk_iters)
    assert int(st2.pile_size) == P  # hit and clamped, never exceeded
    # once no candidate can be stored, shelves stop filling; the stall
    # force-termination retires every dataset (the reference would spin
    # forever here) and the chunk's while_loop exits early
    assert 0 < int(st2.iteration) < cfg.chunk_iters
    assert not np.asarray(st2.running).any()
    limit = engine_lib.resolve_stall_limit(cfg)
    assert np.asarray(st2.stall_count).max() > limit
    shelf_idx = np.asarray(st2.shelves.idx)
    live_idx = np.asarray(st2.live_idx)
    assert shelf_idx.max() < P and live_idx.max() < P
    assert np.isfinite(np.asarray(st2.live_L)).all()
    assert np.isfinite(np.asarray(st2.logZ)).all()


def test_phantom_compaction_remap():
    """Phantom pile rows must survive compaction remapping (ADVICE r2 high):
    a tiny pile with phantom_capacity>0 must reproduce the big-pile run
    exactly — if phantom_idx were not remapped, region builds diverge after
    the first compaction."""
    centers, problem = _problem(D=6, seed=25)
    base = dataclasses.replace(CFG, phantom_capacity=16)
    big = _run(dataclasses.replace(base, pile_capacity=1 << 16), problem)
    small = _run(dataclasses.replace(base, pile_capacity=1024), problem)
    assert small.stats["pile_peak"] <= 1024
    np.testing.assert_array_equal(big.L, small.L)
    np.testing.assert_allclose(big.logZ, small.logZ, rtol=0, atol=1e-6)
    assert big.ndraws == small.ndraws


def test_compaction_under_lookahead_logZ():
    """Compaction + lookahead together (the drain-then-compact path) still
    produce correct evidences and internally-consistent records."""
    centers, problem = _problem(D=8, seed=23)
    cfg = dataclasses.replace(CFG, pile_capacity=1024, pipeline_lookahead=2)
    result = _run(cfg, problem)
    lz_true = true_logZ(centers, sigma=0.07)
    err = result.logZerr + np.sqrt(np.maximum(result.information, 0.0) / 50)
    assert (np.abs(result.logZ - lz_true) < 3.5 * err + 0.8).all()
    # record integrity across compaction boundaries: the stored u rows must
    # reproduce the stored x rows through the prior transform
    sel = result.mask.any(axis=1)
    u = result.u[sel].reshape(-1, 2)
    x = result.x[sel].reshape(-1, 2)
    x2 = np.asarray(problem.transform_batch(u))
    np.testing.assert_allclose(x, x2, rtol=1e-5, atol=1e-6)


def test_dead_row_reconstruction_exact():
    """The host-side replay of the f32 volume ledger and the monotone
    running masks (engine.chunk_report_parts streams only L/idx) must be
    BIT-identical to the device's own per-row values in DeadChunk."""
    from massivedatans_tpu.ns import engine as engine_lib

    centers, problem = _problem(D=6, seed=31)
    cfg = CFG
    mc = cfg.resolve_member_capacity(problem.ndata)
    state = engine_lib.init_state(problem, jax.random.key(9), cfg)
    led_vol = np.asarray(state.logVolremaining, np.float32).copy()
    led_lw = np.asarray(state.logwidth, np.float32).copy()
    prev_it = 0
    for _ in range(6):  # crosses termination events at these settings
        st2, dead = engine_lib.run_chunk(problem, state, cfg, mc,
                                         cfg.chunk_iters)
        meta, block = engine_lib.chunk_report_parts(st2, dead, cfg.nlive_points)
        rep = engine_lib.parse_meta(np.asarray(meta), problem.ndata,
                                    cfg.nlive_points)
        rows = rep["iteration"] - prev_it
        if rows == 0:
            break
        rep.update(engine_lib.parse_dead_block(np.asarray(block), rows))
        term = rep["term_iter"]
        r_glob = prev_it + 1 + np.arange(rows)
        running = (term < 0)[None, :] | (r_glob[:, None] <= term[None, :])
        adv = rep["idx"] >= 0
        C, dv = rep["lw_const"], rep["dv_const"]
        w_rows = np.empty((rows, problem.ndata), np.float32)
        for r in range(rows):
            a = adv[r]
            led_lw = np.where(a, C + led_vol, led_lw).astype(np.float32)
            w_rows[r] = led_lw
            led_vol = np.where(a, led_vol - dv, led_vol)
        np.testing.assert_array_equal(
            running, np.asarray(dead.running)[:rows])
        np.testing.assert_array_equal(
            w_rows, np.asarray(dead.logwidth)[:rows])
        np.testing.assert_array_equal(led_vol,
                                      np.asarray(st2.logVolremaining))
        np.testing.assert_array_equal(led_lw, np.asarray(st2.logwidth))
        prev_it = rep["iteration"]
        state = st2
