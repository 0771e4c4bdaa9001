"""integrate_remainder vs a numpy transliteration of the reference
(multi_nested_integrator.py:26-59)."""

import numpy as np
import jax.numpy as jnp

from massivedatans_tpu.ns.engine import integrate_remainder


def _oracle(live_L, logZ, H, logwidth, Lmax, nlive):
    K, D = live_L.shape
    Ls_sorted = np.sort(live_L, axis=0)
    L0 = Lmax
    Ls = np.exp(Ls_sorted - L0[None, :])
    Lmax_sum = Ls[1:].sum(axis=0) + Ls[-1]
    Lmin_sum = Ls[:-1].sum(axis=0) + Ls[0]
    logLmid = np.log(Ls.sum(axis=0)) + L0
    logZmid = np.logaddexp(logZ, logwidth + logLmid)
    logZup = np.logaddexp(logZ, logwidth + np.log(Lmax_sum) + L0)
    logZlo = np.logaddexp(logZ, logwidth + np.log(Lmin_sum) + L0)
    logZerr = logZup - logZlo
    # sequential reference recursion
    Z, Hc = logZ.copy(), H.copy()
    for i in range(K):
        wi = logwidth + Ls_sorted[i]
        Zn = np.logaddexp(Z, wi)
        t2 = np.where(np.isfinite(Z), np.exp(Z - Zn) * (Hc + Z), 0.0)
        Hc = np.exp(wi - Zn) * Ls_sorted[i] + t2 - Zn
        Hc[Hc < 0] = 0
        Z = Zn
    return logwidth + logLmid, logZerr, logZmid, logZerr + np.sqrt(Hc / nlive)


def test_integrate_remainder_matches_reference_recursion():
    rng = np.random.default_rng(0)
    K, D = 100, 20
    live_L = np.sort(rng.normal(-50, 5, size=(K, D)), axis=0).astype(np.float32)
    live_L = live_L[rng.permutation(K)]
    Lmax = live_L.max(axis=0)
    logZ = rng.normal(-52, 2, D)
    H = np.abs(rng.normal(3, 1, D))
    logwidth = -4.0

    want = _oracle(live_L.astype(np.float64), logZ, H, logwidth,
                   Lmax.astype(np.float64), K)
    got = integrate_remainder(
        jnp.asarray(live_L), jnp.asarray(logZ, jnp.float32),
        jnp.asarray(H, jnp.float32), jnp.float32(logwidth),
        jnp.asarray(Lmax), K)
    names = ["remainderZ", "remainderZerr", "totalZ", "totalZerr"]
    for g, w, n in zip(got, want, names):
        assert np.allclose(np.asarray(g), w, rtol=1e-3, atol=2e-3), (
            n, np.asarray(g), w)


def test_integrate_remainder_fresh_start():
    """-inf logZ (no dead points yet) must not produce NaNs."""
    K, D = 50, 4
    rng = np.random.default_rng(1)
    live_L = rng.normal(-10, 1, size=(K, D)).astype(np.float32)
    out = integrate_remainder(
        jnp.asarray(live_L), jnp.full((D,), -jnp.inf),
        jnp.zeros(D), jnp.float32(-0.02), jnp.asarray(live_L.max(0)), K)
    for g in out:
        assert np.isfinite(np.asarray(g)).all()


def test_integrate_remainder_muse_dead_guard():
    """-1e100 likelihoods (MUSE 'no stars' guard) must not poison H."""
    K, D = 50, 3
    rng = np.random.default_rng(2)
    live_L = rng.normal(-10, 1, size=(K, D)).astype(np.float32)
    live_L[:10, 0] = -1e30
    out = integrate_remainder(
        jnp.asarray(live_L), jnp.asarray(rng.normal(-12, 1, D), jnp.float32),
        jnp.ones(D), jnp.float32(-3.0), jnp.asarray(live_L.max(0)), K)
    assert np.isfinite(np.asarray(out[3])).all()
