"""Shelf (queue) semantics tests against the reference's list-based logic."""

import numpy as np
import jax.numpy as jnp

from massivedatans_tpu.ns import shelves as sh


def _mk(S, D):
    return sh.init_shelves(S, D)


def _ref_find_nsmallest(n, arr1, arr2):
    """Reference multi_nested_sampler.py:44-47."""
    arr = np.concatenate((arr1, arr2))
    return np.partition(arr, n)[n]


def test_insertion_thresholds_match_reference_formula():
    rng = np.random.default_rng(0)
    K, S, D = 20, 6, 30
    live_L = rng.normal(size=(K, D)).astype(np.float32)
    shelves = _mk(S, D)
    counts = rng.integers(0, S + 1, size=D)
    L = np.full((S, D), -np.inf, np.float32)
    for d in range(D):
        L[: counts[d], d] = rng.normal(size=counts[d])
    shelves = sh.Shelves(idx=shelves.idx, L=jnp.asarray(L),
                         count=jnp.asarray(counts, jnp.int32))
    live_bot = sh.live_bottom(jnp.asarray(live_L), S)
    got = np.asarray(sh.insertion_thresholds(live_bot, shelves))
    for d in range(D):
        n = counts[d]
        if n == 0:
            want = live_L[:, d].min()  # Lmins (multi_nested_sampler.py:438-441)
        else:
            want = _ref_find_nsmallest(n, live_L[:, d], L[:n, d])
        assert np.isclose(got[d], want), (d, got[d], want)


def test_append_clean_pop_fifo():
    S, D, B = 4, 5, 6
    shelves = _mk(S, D)
    cand_idx = jnp.arange(100, 100 + B, dtype=jnp.int32)
    cand_L = jnp.asarray(np.arange(B * D, dtype=np.float32).reshape(B, D))
    accept = np.zeros((B, D), bool)
    accept[0, 0] = accept[2, 0] = accept[4, 0] = True     # 3 entries to d=0
    accept[1, 1] = True                                    # 1 entry to d=1
    accept[:, 2] = True                                    # overflow: B > S
    shelves = sh.append_batch(shelves, cand_idx, cand_L, jnp.asarray(accept))

    count = np.asarray(shelves.count)
    assert list(count) == [3, 1, S, 0, 0]
    # FIFO order preserved: batch order 0, 2, 4 for dataset 0
    assert list(np.asarray(shelves.idx)[:3, 0]) == [100, 102, 104]
    assert list(np.asarray(shelves.idx)[:S, 2]) == [100, 101, 102, 103]

    # clean drops entries <= Lmin keeping order (prepare(), :134-143)
    Lmins = jnp.asarray(np.array([5.0, -1e30, 10.0, 0.0, 0.0], np.float32))
    cleaned = sh.clean(shelves, Lmins)
    # d=0 had L = [0, 10, 20] -> keep 10, 20
    assert int(cleaned.count[0]) == 2
    assert list(np.asarray(cleaned.idx)[:2, 0]) == [102, 104]
    assert int(cleaned.count[1]) == 1
    # d=2 had L = [2, 7, 12, 17] -> keep 12, 17
    assert int(cleaned.count[2]) == 2
    assert list(np.asarray(cleaned.idx)[:2, 2]) == [102, 103]

    # pop shifts the FIFO head out for active datasets only
    active = jnp.asarray(np.array([True, True, False, True, True]))
    head_idx, head_L, popped = sh.pop(cleaned, active)
    assert int(head_idx[0]) == 102
    assert int(popped.count[0]) == 1
    assert int(np.asarray(popped.idx)[0, 0]) == 104
    assert int(popped.count[2]) == 2  # inactive: untouched
    assert int(popped.count[3]) == 0  # empty shelf: not popped below zero


def test_append_respects_capacity_and_counts():
    rng = np.random.default_rng(1)
    S, D, B = 3, 8, 10
    shelves = _mk(S, D)
    accept = rng.random((B, D)) < 0.5
    cand_L = rng.normal(size=(B, D)).astype(np.float32)
    cand_idx = jnp.arange(B, dtype=jnp.int32)
    out = sh.append_batch(shelves, cand_idx, jnp.asarray(cand_L),
                          jnp.asarray(accept))
    counts = np.asarray(out.count)
    for d in range(D):
        expect = min(accept[:, d].sum(), S)
        assert counts[d] == expect
        taken = np.where(accept[:, d])[0][:expect]
        assert np.allclose(np.asarray(out.L)[:expect, d], cand_L[taken, d])
