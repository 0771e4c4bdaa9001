"""MUSE datacube headline benchmark (reference: pres/massivens4.lyx:2230).

The reference's published MUSE numbers: 100 spaxels = 2.8M likelihood
evaluations in 14.9 h; 4,223 spaxels = 14.4M evaluations in 140 h
(unspecified CPU). This tool builds a synthetic cube at the same scale
(realistic MUSE spectral length nspec=3600) and runs the full pipeline
(FITS load, region mask, noise surgery, joint NS fit) on the TPU.

    python tools/muse_bench.py [n_spaxels] [out_dir]

Prints one JSON line with wall-clock, eval count, and the implied speedup
vs the reference's published wall-clock at the matching spaxel count.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

N_SPAXELS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
OUT = sys.argv[2] if len(sys.argv) > 2 else "muse_bench_out"
NSPEC = int(os.environ.get("MUSE_BENCH_NSPEC", "3600"))
NLIVE = int(os.environ.get("NLIVE_POINTS", "400"))
MAXSAMPLES = int(os.environ.get("MAXSAMPLES", "100000"))
# Per-dispatch fill-round budget: deep MUSE runs hit fill escalations
# (decoupled datasets / likelihood phase transitions) that stretch a
# 50-iteration dispatch past the axon worker's execution watchdog (~60 s;
# observed killed deterministically at iteration ~2800 of the 100-spaxel
# run). ~25 ms/round at nspec=3600, D=100 -> 1024 rounds ~ 25 s worst case.
FILL_BUDGET = int(os.environ.get("MUSE_BENCH_FILL_BUDGET", "1024"))

# reference wall-clock anchors (spaxels -> hours), massivens4.lyx:2230
REF_POINTS = {100: 14.9, 4223: 140.0}


def main():
    from massivedatans_tpu.muse import synth
    from massivedatans_tpu.muse.pipeline import run_musefit
    from massivedatans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(OUT, exist_ok=True)
    # the synthetic ds9 selection is a circle covering ~pi/4 of the field;
    # size the field so >= N_SPAXELS spaxels survive, then trim with maxdata
    side = max(2, math.ceil(math.sqrt(N_SPAXELS / 0.75)) + 1)
    cube_path = os.path.join(OUT, f"cube_{N_SPAXELS}.fits")
    # the region circle is sized to THIS cube's field: keep it per-N, or a
    # later pre-generation at another N silently shrinks the selection
    region_path = os.path.join(OUT, f"sel_{N_SPAXELS}.reg")
    tpl_dir = os.path.join(OUT, "templates")
    if not (os.path.exists(cube_path) and os.path.exists(region_path)):
        synth.make_synthetic_cube(cube_path, region_path, nspec=NSPEC,
                                  ny=side, nx=side, seed=1)
    tpl_files = synth.make_template_files(tpl_dir, n_wl=1200)

    # honest wall-clock across crash/timeout retries: the first attempt
    # stamps its start next to the checkpoint dir; resumed attempts report
    # time since that stamp (total time-to-result, incl. recompiles/sleeps),
    # plus this attempt's own wall for reference
    stamp = os.path.join(OUT, f"t0_{N_SPAXELS}.json")
    t0 = time.time()
    if os.path.exists(stamp):
        with open(stamp) as fh:
            t_first = json.load(fh)["t0"]
    else:
        t_first = t0
        with open(stamp, "w") as fh:
            json.dump({"t0": t_first}, fh)
    result, problem, cube = run_musefit(
        cube_path, region_path, zlo=0.0, zhi=0.3,
        template_files=tpl_files, maxdata=N_SPAXELS, nlive=NLIVE,
        max_samples=MAXSAMPLES,
        out_prefix=os.path.join(OUT, f"muse_{N_SPAXELS}"),
        progress=True,
        # TPU workers can crash on hours-long runs; resume instead of redo
        checkpoint_dir=os.path.join(OUT, f"ckpt_{N_SPAXELS}"),
        cfg_overrides=dict(chunk_fill_budget=FILL_BUDGET),
    )
    wall = time.time() - t_first

    ref_h = REF_POINTS.get(N_SPAXELS)
    vs = (ref_h * 3600.0 / wall) if ref_h else 0.0
    print(json.dumps({
        "metric": f"MUSE pipeline, {problem.ndata} spaxels, nspec={NSPEC}",
        "value": round(wall, 1),
        "unit": "s",
        "vs_baseline": round(vs, 1),
        "extra": {
            "ndraws": int(result.ndraws),
            "niter": int(result.niterations),
            "evals_per_s": round(result.ndraws / wall, 1),
            "last_attempt_s": round(time.time() - t0, 1),
            "ref_hours": ref_h,
            "ref_evals": {100: 2.8e6, 4223: 14.4e6}.get(N_SPAXELS),
        },
    }))


if __name__ == "__main__":
    main()
