"""MUSE flagship correctness validation: truth recovery on a model-family cube.

Round-4 verdict, missing #1: the 19x/82.6x/126.8x MUSE throughput headlines
had no accuracy statement behind them — the synthetic cube was a generic
continuum, not drawn from the fitted stellar-population family. This tool
closes that gap:

1. builds a synthetic template library + a cube whose spaxels are drawn
   FROM THE FIT PRIOR of the 5-parameter model family
   (``muse.synth.make_model_cube``; reference model musefuse.py:222-346),
2. runs the full MUSE pipeline (``run_musefit``) on it, tolerance-terminated
   (NOT the MAXSAMPLES cap — also exercising the tolerance path at MUSE
   scale, round-4 weak #4),
3. records, per the reference's own acceptance standards
   (plotposterior.py:28-62, plotevidences.py:17-36):
   - simulation-based-calibration rank statistics per parameter (the rank
     of the injected truth within the posterior samples is U(0,1) under
     correct inference — valid whether or not a spaxel is informative),
   - Gaussian pull coverage (|mean - truth|/std within 1/2/3 sigma) and
     median absolute error for the constrained subset,
   - metallicity-bin recovery (Z enters the model through a step-function
     bin selection, so bin accuracy is the meaningful Z statement),
   - the no-star evidence identity for empty spaxels:
     logZ ~= -yy/2 (the scale-marginalized evidence of pure noise),
   - best-fit chi2/dof ~= 1 for informative spaxels (goodness of fit).

Writes ``<out>/MUSE_VALIDATION.json`` (commit it) and prints one JSON line.

    python tools/muse_validate.py [n_spaxels] [out_dir]

Env: NSPEC (default 3600, the flagship spectral length), NLIVE (400),
MAXSAMPLES (300000 — a cap well above the expected tolerance termination),
ATTEMPT_TIMEOUT driver-side.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
OUT = sys.argv[2] if len(sys.argv) > 2 else "muse_valid_out"
NSPEC = int(os.environ.get("NSPEC", "3600"))
NLIVE = int(os.environ.get("NLIVE", "400"))
MAXSAMPLES = int(os.environ.get("MAXSAMPLES", "300000"))
SEED = int(os.environ.get("SEED", "11"))


def build_fixtures(out):
    """Template library + model-family cube sized for N spaxels."""
    from massivedatans_tpu.muse.synth import (
        make_model_cube, make_template_files,
    )

    os.makedirs(out, exist_ok=True)
    tpl_dir = os.path.join(out, "templates")
    tpl = make_template_files(tpl_dir)
    side = 1
    while side * side < N:
        side += 1
    cube = os.path.join(out, f"model_cube_{N}.fits")
    reg = os.path.join(out, f"sel_{N}.reg")
    truths = os.path.join(out, f"truths_{N}.json")
    # Flagship-realistic SNR: the real cube's spaxels are mostly faint
    # (that is why the reference's 100k-iteration cap suffices there); a
    # bright fixture makes posteriors far deeper than the workload being
    # validated. FLUX_LO/HI override (mean-|flux| target per spaxel, in
    # noise=0.05 units).
    flux_lo = float(os.environ.get("FLUX_LO", "0.1"))
    flux_hi = float(os.environ.get("FLUX_HI", "1.0"))
    make_model_cube(cube, reg, tpl, truths, ny=side, nx=side,
                    nspec=NSPEC, seed=SEED, flux_lo=flux_lo, flux_hi=flux_hi)
    return tpl, cube, reg, truths


def analyze(out_prefix, truths_path, result_stats, wall):
    import numpy as np
    import scipy.stats

    from massivedatans_tpu import postprocess
    from massivedatans_tpu.io.hdf5io import read_results

    with open(truths_path) as fh:
        truths = json.load(fh)
    out = read_results(out_prefix)
    D = len(out["logZ"])
    theta = np.asarray(truths["params"], np.float64)[:D]
    empty = np.asarray(truths["empty"], bool)[:D]
    yy = np.asarray(truths["yy"], np.float64)[:D]
    names = truths["param_names"]
    nspec = int(truths["nspec"])
    rng = np.random.default_rng(0)

    # --- per-spaxel posterior samples
    S = 2000
    samp = np.stack([
        postprocess.posterior_samples(out, d, size=S, rng=rng)
        for d in range(D)
    ])  # [D, S, ndim]

    fit = np.where(~empty)[0]
    # termination class: a dataset still running at the LAST DEAD row ended
    # at the iteration cap (truncated posterior — the reference's own
    # MAXSAMPLES protocol); others tolerance-terminated with a fully
    # resolved posterior. The output rows are niter dead rows followed by
    # nlive tail rows whose mask is True for every dataset, so the
    # detector must index the dead block, not the final row.
    mask_rows = out.get("mask")
    if mask_rows is not None and len(mask_rows) > NLIVE:
        # stored rows = niter dead rows + nlive all-True tail rows (the
        # .stats.json niter counts both, sample.py-compatible), so the
        # last dead row sits nlive rows from the end
        capped = mask_rows[len(mask_rows) - NLIVE - 1].astype(bool)
    else:
        capped = np.zeros(D, bool)

    # --- SBC ranks: P(sample < truth) per parameter, uniform under
    # correct inference because truths are drawn from the fit prior.
    # Reported for all fitted spaxels AND for the tolerance-terminated
    # subset: rank uniformity is only guaranteed for exact posteriors, and
    # cap-truncated runs approximate the tail with the live-point remainder.
    ranks = {}
    rank_ks = {}
    rank_ks_done = {}
    fit_done = np.where(~empty & ~capped)[0]
    for j, nm in enumerate(names):
        r = (samp[fit, :, j] < theta[fit, j][:, None]).mean(axis=1)
        ranks[nm] = r
        ks = scipy.stats.kstest(r, "uniform")
        rank_ks[nm] = {"ks_stat": round(float(ks.statistic), 4),
                       "ks_pvalue": round(float(ks.pvalue), 4)}
        if len(fit_done) >= 5:
            rd = (samp[fit_done, :, j]
                  < theta[fit_done, j][:, None]).mean(axis=1)
            ksd = scipy.stats.kstest(rd, "uniform")
            rank_ks_done[nm] = {
                "ks_stat": round(float(ksd.statistic), 4),
                "ks_pvalue": round(float(ksd.pvalue), 4)}

    # --- Gaussian pulls for the constrained subset (posterior clearly
    # narrower than the prior): median abs error + 1/2/3 sigma coverage
    prior_span = {"Z": 3.0, "logSFtau": np.log10(4000 / 1),
                  "SFage": 13.0, "z": 0.5, "EBV": 2.0}
    pulls = {}
    for j, nm in enumerate(names):
        mean = samp[fit, :, j].mean(axis=1)
        std = samp[fit, :, j].std(axis=1)
        constrained = std < prior_span[nm] / np.sqrt(12.0) * 0.5
        if constrained.sum() < 3:
            pulls[nm] = {"n_constrained": int(constrained.sum())}
            continue
        resid = mean[constrained] - theta[fit, j][constrained]
        p = np.abs(resid) / np.maximum(std[constrained], 1e-9)
        pulls[nm] = {
            "n_constrained": int(constrained.sum()),
            "median_abs_err": round(float(np.median(np.abs(resid))), 5),
            "frac_within_1sigma": round(float((p < 1).mean()), 3),
            "frac_within_2sigma": round(float((p < 2).mean()), 3),
            "frac_within_3sigma": round(float((p < 3).mean()), 3),
        }

    # --- metallicity-bin recovery: Z acts through the largest-grid-Z<=Z
    # step (model.predict_batch iZ), so compare posterior-mode bin to truth
    from massivedatans_tpu.muse.model import _Z_GRID
    zg = np.asarray(_Z_GRID)

    def zbin(v):
        return np.clip(np.searchsorted(zg, v, side="right") - 1, 0,
                       len(zg) - 1)

    true_bin = zbin(theta[fit, 0])
    mode_bin = np.array([
        np.bincount(zbin(samp[d, :, 0]), minlength=len(zg)).argmax()
        for d in fit
    ])
    zbin_acc = float((mode_bin == true_bin).mean())
    zbin_within1 = float((np.abs(mode_bin - true_bin) <= 1).mean())

    # --- empty-spaxel evidence identity: the scale-marginalized evidence
    # of pure noise is logZ ~= -yy/2 + O(1) (best-fit amplitude ~ 0, the
    # s1^2/s2 reduction is ~chi2_1 per candidate)
    evidence_check = None
    if empty.any():
        dz = out["logZ"][empty] + 0.5 * yy[empty]
        evidence_check = {
            "n_empty": int(empty.sum()),
            "median_logZ_plus_half_yy": round(float(np.median(dz)), 2),
            "max_abs": round(float(np.abs(dz).max()), 2),
        }

    # --- goodness of fit: best dead-point chi2 vs nspec (5 fitted params
    # + 1 profiled amplitude); mask padded rows
    Lmat = out["L"]
    mask = out.get("mask", np.ones_like(Lmat, bool))
    Lbest = np.where(mask, Lmat, -np.inf).max(axis=0)
    chi2_best = -2.0 * Lbest[fit]
    chi2_z = (chi2_best - (nspec - 6)) / np.sqrt(2.0 * nspec)
    gof = {
        "median_chi2_over_dof": round(
            float(np.median(chi2_best / (nspec - 6))), 4),
        "frac_chi2_z_below_5": round(float((chi2_z < 5).mean()), 3),
        "max_chi2_z": round(float(chi2_z.max()), 2),
    }

    payload = {
        "metric": f"MUSE model-family truth recovery, {D} spaxels "
                  f"nspec={nspec} nlive={NLIVE}",
        "value": (rank_ks_done.get("z", rank_ks["z"])["ks_pvalue"]),
        "unit": "KS p-value of redshift SBC ranks vs U(0,1) "
                "(tolerance-terminated subset when >= 5 spaxels)",
        "vs_baseline": 0.0,
        "extra": {
            "wall_s": round(wall, 1),
            "n_fit": int(len(fit)),
            "n_tolerance_terminated": int(len(fit_done)),
            "n_capped": int((~empty & capped).sum()),
            "sbc_rank_ks_tolerance_terminated": rank_ks_done,
            "stats": {
                k: (float(v) if isinstance(v, (float, np.floating))
                    else int(v))
                for k, v in result_stats.items()
                if isinstance(v, (int, float, np.integer, np.floating,
                                  bool, np.bool_))
            },
            "sbc_rank_ks": rank_ks,
            "pull_coverage": pulls,
            "zbin_mode_accuracy": round(zbin_acc, 3),
            "zbin_mode_within1": round(zbin_within1, 3),
            "empty_evidence_identity": evidence_check,
            "goodness_of_fit": gof,
        },
    }
    return payload


def main():
    from massivedatans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from massivedatans_tpu.muse.pipeline import run_musefit

    tpl, cube, reg, truths = build_fixtures(OUT)
    prefix = os.path.join(OUT, f"muse_valid_{N}")
    t0 = time.time()
    result, problem, _ = run_musefit(
        cube, reg, zlo=0.0, zhi=0.5, template_files=tpl, maxdata=N,
        nlive=NLIVE, tolerance=0.5, max_samples=MAXSAMPLES,
        out_prefix=prefix, progress=True,
        checkpoint_dir=os.path.join(OUT, f"ckpt_{N}"),
        dispatch_target_s=float(os.environ.get("DISPATCH_TARGET_S", "20")),
        # the synthetic cube has no sky residuals: disable the real-MUSE
        # bad-window noise inflation so the truth accounting (yy, nspec)
        # covers every bin — with the windows active, the empty-spaxel
        # identity and chi2/dof shift by exactly the masked-bin fraction
        bad_windows=[],
    )
    wall = time.time() - t0

    payload = analyze(prefix, truths, result.stats, wall)
    payload["extra"]["interrupted"] = bool(result.stats.get("interrupted"))
    payload["extra"]["niter"] = int(result.niterations)
    payload["extra"]["ndraws"] = int(result.ndraws)
    payload["extra"]["terminated_by"] = (
        "max_samples_cap" if result.niterations >= MAXSAMPLES
        else "tolerance"
    )
    with open(os.path.join(OUT, "MUSE_VALIDATION.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
