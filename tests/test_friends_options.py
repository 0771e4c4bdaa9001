"""The reference FriendsConstrainer's optional estimators (friends.py:8-334).

- ``jackknife=True`` (friends.py:30-33,71-75): leave-one-out max-NN radius
  (``nearest_rdistance_guess``, clustering/neighbors.py:185-194 / C kernel
  ``most_distant_nearest_neighbor``, cneighbors.c:32-75) instead of the
  bootstrapped radius.
- ``keep_phantom_points`` (friends.py:54-59,81-84): extra points carried
  into every region build; here populated as the top-Q dead points.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.spatial.distance

from massivedatans_tpu.config import RunConfig
from massivedatans_tpu.models.analytic import (
    make_analytic_gaussian_problem,
    true_logZ,
)
from massivedatans_tpu.ns import engine as engine_lib
from massivedatans_tpu.ns.integrator import multi_nested_integrator
from massivedatans_tpu.ns.region import jackknife_sq_radius


@pytest.mark.parametrize("norm", ["euclidean", "chebyshev"])
def test_jackknife_radius_matches_scipy_oracle(norm):
    rng = np.random.default_rng(3)
    M, ndim = 64, 3
    w = rng.uniform(size=(M, ndim)).astype(np.float32)
    mask = np.ones(M, bool)
    mask[50:] = False  # padded rows must not participate
    w[50:] = 77.0      # junk that would dominate if the mask leaked

    d = scipy.spatial.distance.cdist(
        w[:50], w[:50], metric=norm if norm == "chebyshev" else "euclidean"
    )
    np.fill_diagonal(d, np.inf)
    expected = d.min(axis=1).max()

    r2 = jackknife_sq_radius(jnp.asarray(w), jnp.asarray(mask), norm=norm)
    assert np.sqrt(float(r2)) == pytest.approx(expected, rel=1e-5)


def test_jackknife_radius_single_member_is_zero():
    w = jnp.zeros((8, 2))
    mask = jnp.zeros((8,), bool).at[3].set(True)
    assert float(jackknife_sq_radius(w, mask)) == 0.0


def test_phantom_requires_force_shrink():
    with pytest.raises(ValueError, match="force_shrink"):
        RunConfig(phantom_capacity=4, force_shrink=False)
    RunConfig(phantom_capacity=4, force_shrink=True)  # fine


def test_phantom_buffer_holds_top_dead_points():
    rng = np.random.default_rng(5)
    centers = rng.uniform(0.4, 0.6, size=(3, 2))
    problem = make_analytic_gaussian_problem(centers, sigma=0.08)
    Q = 6
    cfg = RunConfig(
        nlive_points=50, proposal_batch=128, eval_batch=32,
        shelf_capacity=4, phantom_capacity=Q,
    )
    mc = cfg.resolve_member_capacity(problem.ndata)
    state = engine_lib.init_state(problem, jax.random.key(0), cfg)
    state, dead = engine_lib.run_chunk(problem, state, cfg, mc, 40)

    dead_L = np.asarray(dead.L).reshape(-1)
    dead_L = dead_L[np.isfinite(dead_L)]
    expected = np.sort(dead_L)[::-1][:Q]
    got = np.asarray(state.phantom_L)
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    # slots reference real pile rows whose stored L is plausible
    assert (np.asarray(state.phantom_idx) >= 0).all()
    assert (np.asarray(state.phantom_idx) < int(state.pile_size)).all()


@pytest.mark.slow
@pytest.mark.parametrize(
    "kw",
    [
        dict(constrainer="RADFRIENDS", radius_estimator="jackknife"),
        dict(constrainer="MLFRIENDS", radius_estimator="jackknife"),
        dict(constrainer="MLFRIENDS", phantom_capacity=16),
    ],
)
def test_friends_options_logZ(kw):
    rng = np.random.default_rng(11)
    D, ndim = 4, 2
    centers = rng.uniform(0.35, 0.65, size=(D, ndim))
    problem = make_analytic_gaussian_problem(centers, sigma=0.06)
    cfg = RunConfig(
        nlive_points=100, proposal_batch=256, eval_batch=64,
        shelf_capacity=4, chunk_iters=25, **kw,
    )
    result = multi_nested_integrator(
        problem, cfg, key=jax.random.key(2), progress=False
    )
    lz_true = true_logZ(centers, sigma=0.06)
    err = result.logZerr + np.sqrt(np.maximum(result.information, 0.0) / 100)
    resid = np.abs(result.logZ - lz_true)
    assert (resid < 3.5 * err + 0.8).all(), (kw, resid, err)
