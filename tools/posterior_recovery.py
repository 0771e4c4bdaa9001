"""Posterior truth-recovery validation on the ``gensimple`` suite.

The reference's second correctness baseline (BASELINE.md; plotposterior.py:
19-33,57-67): fit the faithful ``gensimple`` workload (z ~ Beta(2,7),
gensimple.py:20-41), recover z = mean(mu)/440 - 1 per well-constrained
dataset, and check

- per-dataset: |z_rec - z_true| against the posterior width (coverage), and
- population: the recovered z distribution against the injected Beta(2,7)
  via a KS test (the reference's plotposteriorz.pdf by eye; here a number).

    python tools/posterior_recovery.py [N] [out_dir]

Writes ``<out_dir>/recovery.json`` + ``plotposteriorz.pdf`` and prints one
JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
OUT = sys.argv[2] if len(sys.argv) > 2 else "recovery_out"
NLIVE = int(os.environ.get("NLIVE_POINTS", "400"))


def main():
    import numpy as np
    import scipy.stats

    from massivedatans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from massivedatans_tpu.config import RunConfig
    from massivedatans_tpu.datagen.generators import gen_simple
    from massivedatans_tpu.models.gaussline import make_gaussline_problem
    from massivedatans_tpu.ns.integrator import multi_nested_integrator
    from massivedatans_tpu import postprocess

    os.makedirs(OUT, exist_ok=True)
    data = gen_simple(N)
    problem = make_gaussline_problem(data["x"], data["y"],
                                     data["noise_level"])
    cfg = RunConfig.from_env(nlive_points=NLIVE, chunk_iters=100,
                             pipeline_lookahead=4)
    t0 = time.time()
    result = multi_nested_integrator(problem, cfg, key=jax.random.key(1),
                                     progress=True)
    wall = time.time() - t0

    out = dict(logZ=result.logZ, w=result.w, L=result.L, x=result.x)
    zs, mask = postprocess.plot_posterior_z(
        out, path=os.path.join(OUT, "plotposteriorz.pdf"))

    # per-dataset coverage for the constrained subset
    rng = np.random.default_rng(0)
    z_true = np.asarray(data["z"])
    resid, width = [], []
    for d in np.where(mask)[0]:
        mu = postprocess.posterior_samples(out, int(d), size=1000,
                                           rng=rng)[:, 1]
        z_rec = mu / 440.0 - 1.0
        resid.append(z_rec.mean() - z_true[d])
        width.append(z_rec.std())
    resid = np.asarray(resid)
    width = np.maximum(np.asarray(width), 1e-6)
    pull = resid / width

    ks = scipy.stats.kstest(zs, scipy.stats.beta(2.0, 7.0).cdf)
    # NOTE on pulls: the fit model is a SINGLE Gaussian (sample.py:52-68)
    # while the generator injects narrow+broad components (gensimple.py:
    # 26-38) — deliberate misspecification inherited from the reference, so
    # at SNR ~50 the tiny posterior widths make |pull| of several sigma
    # expected. Absolute z error and the population KS are the meaningful
    # recovery numbers (the reference likewise checks only the population
    # histogram, plotposterior.py:57-67).
    payload = {
        "metric": f"posterior recovery, gensimple N={N} nlive={NLIVE}",
        "value": round(float(np.median(np.abs(resid))), 6),
        "unit": "median |z_rec - z_true|",
        "vs_baseline": 0.0,
        "extra": {
            "wall_s": round(wall, 1),
            "ndraws": int(result.ndraws),
            "n_constrained": int(mask.sum()),
            "n_datasets": N,
            "ks_stat_vs_beta27": round(float(ks.statistic), 4),
            "ks_pvalue": round(float(ks.pvalue), 4),
            "max_abs_z_err": round(float(np.abs(resid).max()), 6),
            "median_abs_pull": round(float(np.median(np.abs(pull))), 3),
            "frac_within_3sigma": round(float((np.abs(pull) < 3).mean()), 3),
        },
    }
    with open(os.path.join(OUT, "recovery.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
