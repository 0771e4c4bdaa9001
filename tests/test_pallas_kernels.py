"""Pallas kernel equivalence vs the jnp reference formulations.

Runs in interpreter mode on CPU (the tests' virtual-device platform); the
same kernels compile natively on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.spatial

from massivedatans_tpu.ops.pallas_neighbors import (
    bootstrapped_sq_radius_pallas,
    count_within_pallas,
)


def test_count_within_matches_scipy():
    rng = np.random.default_rng(0)
    M, N, ndim = 128, 300, 3
    members = rng.uniform(size=(M, ndim)).astype(np.float32)
    mask = np.ones(M, bool)
    mask[100:] = False
    pts = rng.uniform(-0.2, 1.2, size=(N, ndim)).astype(np.float32)
    r = 0.2
    got = np.asarray(count_within_pallas(
        jnp.asarray(members), jnp.asarray(mask), jnp.asarray(pts),
        jnp.float32(r), interpret=True))
    d = scipy.spatial.distance.cdist(pts, members[:100])
    want = (d < r).sum(axis=1)
    boundary = (np.abs(d - r) < 1e-4).sum(axis=1)
    assert (np.abs(got - want) <= boundary).all()


def test_bootstrap_radius_pallas_matches_jnp_backend(monkeypatch):
    """The production dispatch (region.bootstrapped_sq_radius) must give the
    same radius through either backend: the bag draws are shared."""
    from massivedatans_tpu.ns import region as region_lib

    # pin the reference side to the jnp path — on a TPU host 'auto' would
    # make both sides Pallas and the cross-check vacuous
    monkeypatch.setenv("MDT_REGION_BACKEND", "jnp")
    rng = np.random.default_rng(7)
    M, ndim, nb = 96, 3, 10
    w = jnp.asarray(rng.uniform(size=(M, ndim)), jnp.float32)
    mask = jnp.asarray(np.arange(M) < 80)
    key = jax.random.key(3)
    want = float(region_lib.bootstrapped_sq_radius(w, mask, key, nb))
    inbag = region_lib.bootstrap_inbag_rounds(mask, key, nb)
    got = float(bootstrapped_sq_radius_pallas(w, mask, inbag, interpret=True))
    assert np.isclose(got, want, rtol=1e-5), (got, want)


def test_bootstrap_radius_matches_oracle():
    rng = np.random.default_rng(1)
    M, ndim, nb = 64, 2, 8
    w = rng.uniform(size=(M, ndim)).astype(np.float32)
    mask = np.ones(M, bool)
    mask[50:] = False
    inbag = rng.random((nb, M)) < 0.6
    inbag[:, ~mask] = False
    got = float(bootstrapped_sq_radius_pallas(
        jnp.asarray(w), jnp.asarray(mask), jnp.asarray(inbag),
        interpret=True))

    d = scipy.spatial.distance.cdist(w, w) ** 2
    want = 0.0
    for b in range(nb):
        oob = mask & ~inbag[b]
        if not oob.any() or not inbag[b].any():
            continue
        nearest = d[np.ix_(oob, inbag[b])].min(axis=1)
        want = max(want, nearest.max())
    assert np.isclose(got, want, rtol=1e-4, atol=1e-5), (got, want)


def test_count_within_large_member_set_tiled():
    """member axis must tile (VERDICT: M >> 1024 has to lower); M=8192
    spans 8 column tiles and a non-divisible valid count."""
    rng = np.random.default_rng(3)
    M, N, ndim = 8192, 640, 3
    members = rng.uniform(size=(M, ndim)).astype(np.float32)
    mask = np.arange(M) < 7000
    pts = rng.uniform(size=(N, ndim)).astype(np.float32)
    r = 0.05
    got = np.asarray(count_within_pallas(
        jnp.asarray(members), jnp.asarray(mask), jnp.asarray(pts),
        jnp.float32(r), interpret=True))
    d = scipy.spatial.distance.cdist(pts, members[:7000])
    want = (d < r).sum(axis=1)
    boundary = (np.abs(d - r) < 1e-4).sum(axis=1)
    assert (np.abs(got - want) <= boundary).all()


def test_bootstrap_radius_large_member_set_tiled():
    rng = np.random.default_rng(4)
    M, ndim, nb = 4096, 3, 10
    w = rng.uniform(size=(M, ndim)).astype(np.float32)
    mask = np.arange(M) < 3500
    inbag = rng.random((nb, M)) < 0.6
    inbag[:, ~mask] = False
    got = float(bootstrapped_sq_radius_pallas(
        jnp.asarray(w), jnp.asarray(mask), jnp.asarray(inbag),
        interpret=True))
    d = scipy.spatial.distance.cdist(w, w) ** 2
    want = 0.0
    for b in range(nb):
        oob = mask & ~inbag[b]
        nearest = d[np.ix_(oob, inbag[b])].min(axis=1)
        want = max(want, nearest.max())
    assert np.isclose(got, want, rtol=1e-4, atol=1e-5), (got, want)


def test_bootstrap_radius_empty_bag_round_is_ignored():
    rng = np.random.default_rng(5)
    M, ndim = 64, 2
    w = rng.uniform(size=(M, ndim)).astype(np.float32)
    mask = np.ones(M, bool)
    inbag = np.zeros((3, M), bool)
    inbag[1] = rng.random(M) < 0.5
    got = float(bootstrapped_sq_radius_pallas(
        jnp.asarray(w), jnp.asarray(mask), jnp.asarray(inbag),
        interpret=True))
    d = scipy.spatial.distance.cdist(w, w) ** 2
    oob = mask & ~inbag[1]
    want = d[np.ix_(oob, inbag[1])].min(axis=1).max()
    assert np.isclose(got, want, rtol=1e-4), (got, want)
