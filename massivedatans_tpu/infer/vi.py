"""Batched mean-field variational inference over D independent datasets.

Fits a diagonal Gaussian ``q_d(z) = N(mu_d, diag(sigma_d^2))`` in logit
space per dataset — all D fits advance together in one optax/Adam program,
so evidence cross-checks at 10^4 datasets are a few seconds of device time.

Outputs per dataset:
- ``elbo``: the evidence lower bound (<= logZ, tight when the posterior is
  near-Gaussian in z),
- ``logZ_iw``: a K-sample importance-weighted evidence estimate
  (IWAE bound; Burda et al. 2016) — tighter than the ELBO and consistent
  as K grows.

No reference counterpart; this is the "optional VI backend" of the project
north star, used as an independent check on NS evidences (the reference's
only check is the analytic no-signal oracle, plotevidences.py:17-36).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from massivedatans_tpu.infer import transforms
from massivedatans_tpu.models.base import Problem

_LOG2PI = jnp.log(2.0 * jnp.pi)


class VIResult(NamedTuple):
    mu: jax.Array        # [D, ndim] variational mean (z-space)
    sigma: jax.Array     # [D, ndim] variational stddev (z-space)
    elbo: jax.Array      # [D] final ELBO (lower-bounds logZ)
    logZ_iw: jax.Array   # [D] importance-weighted evidence estimate
    elbo_trace: jax.Array  # [steps] mean ELBO per step (convergence record)


def _elbo_samples(log_post, mu, log_sigma, key, n: int):
    """[n, D] per-sample ELBO integrands via the reparameterization trick."""
    D, ndim = mu.shape
    eps = jax.random.normal(key, (n, D, ndim))
    sigma = jnp.exp(log_sigma)
    z = mu[None] + sigma[None] * eps  # [n, D, ndim]
    logp = jax.vmap(log_post)(z)      # [n, D]
    # log q(z) under the diagonal Gaussian
    logq = (-0.5 * jnp.square(eps) - log_sigma[None] - 0.5 * _LOG2PI).sum(-1)
    return logp - logq


@functools.partial(jax.jit, static_argnames=("steps", "mc_samples", "iw_samples"))
def _run(problem: Problem, key, mu0, log_sigma0, steps: int,
         mc_samples: int, iw_samples: int, lr: float):
    import optax

    log_post = transforms.make_log_posterior(problem)
    opt = optax.adam(lr)

    def loss_fn(params, key):
        elbo = _elbo_samples(log_post, params["mu"], params["log_sigma"],
                             key, mc_samples)
        per_dataset = elbo.mean(axis=0)  # [D]
        return -per_dataset.sum(), per_dataset

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def step(carry, _):
        params, opt_state, key = carry
        key, k = jax.random.split(key)
        grads, per_dataset = grad_fn(params, k)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), per_dataset.mean()

    params = {"mu": mu0, "log_sigma": log_sigma0}
    key, k_fit, k_final, k_iw = jax.random.split(key, 4)
    (params, _, _), trace = jax.lax.scan(
        step, (params, opt.init(params), k_fit), None, length=steps
    )

    elbo_final = _elbo_samples(
        log_post, params["mu"], params["log_sigma"], k_final, 4 * mc_samples
    ).mean(axis=0)
    # importance-weighted evidence: logmeanexp of K weights (IWAE bound)
    w = _elbo_samples(
        log_post, params["mu"], params["log_sigma"], k_iw, iw_samples
    )
    logZ_iw = jax.nn.logsumexp(w, axis=0) - jnp.log(float(iw_samples))
    return VIResult(
        mu=params["mu"],
        sigma=jnp.exp(params["log_sigma"]),
        elbo=elbo_final,
        logZ_iw=logZ_iw,
        elbo_trace=trace,
    )


def run_vi(problem: Problem, key, init_u: Optional[jax.Array] = None,
           steps: int = 1500, mc_samples: int = 8, iw_samples: int = 256,
           lr: float = 2e-2) -> VIResult:
    """Fit D batched mean-field Gaussians; returns evidences + posteriors.

    ``init_u``: [D, ndim] unit-cube initialization (e.g. NS posterior means);
    defaults to the cube center with a broad initial spread.
    """
    D, ndim = problem.ndata, problem.ndim
    if init_u is None:
        mu0 = jnp.zeros((D, ndim), jnp.float32)
    else:
        mu0 = transforms.u_to_z(jnp.asarray(init_u, jnp.float32))
    log_sigma0 = jnp.zeros((D, ndim), jnp.float32)
    return _run(problem, key, mu0, log_sigma0, steps, mc_samples,
                iw_samples, lr)
