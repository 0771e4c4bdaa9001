"""Diagnose the deterministic TPU worker crash in deep MUSE runs.

Resumes the muse_bench checkpoint (muse_bench_out/ckpt_<N>) and steps
synchronously (pipeline_lookahead=0) with per-chunk wall timing, to test the
watchdog hypothesis: a chunk whose fill loops escalate can run for minutes in
a single device dispatch, which the axon TPU worker kills.

    MDT_DEBUG_TIMING=1 python tools/muse_diag.py [n_spaxels] [chunk_iters] [max_chunks]
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

N_SPAXELS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 50
MAXC = int(sys.argv[3]) if len(sys.argv) > 3 else 0
OUT = "muse_bench_out"


def main():
    from massivedatans_tpu.muse.pipeline import run_musefit
    from massivedatans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    side = max(2, math.ceil(math.sqrt(N_SPAXELS / 0.75)) + 1)
    cube_path = os.path.join(OUT, f"cube_{N_SPAXELS}.fits")
    region_path = os.path.join(OUT, f"sel_{N_SPAXELS}.reg")
    tpl_dir = os.path.join(OUT, "templates")
    from massivedatans_tpu.muse import synth
    os.makedirs(OUT, exist_ok=True)
    if not (os.path.exists(cube_path) and os.path.exists(region_path)):
        synth.make_synthetic_cube(cube_path, region_path, nspec=3600,
                                  ny=side, nx=side, seed=1)
    tpl_files = synth.make_template_files(tpl_dir, n_wl=1200)

    t0 = time.time()
    result, problem, cube = run_musefit(
        cube_path, region_path, zlo=0.0, zhi=0.3,
        template_files=tpl_files, maxdata=N_SPAXELS, nlive=400,
        max_samples=100000,
        out_prefix=os.path.join(OUT, f"muse_{N_SPAXELS}"),
        progress=True,
        checkpoint_dir=os.path.join(OUT, f"ckpt_{N_SPAXELS}"),
        cfg_overrides=dict(chunk_iters=CHUNK, pipeline_lookahead=0,
                           chunk_fill_budget=int(os.environ.get(
                               "MUSE_BENCH_FILL_BUDGET", "8192")),
                           eval_batch=int(os.environ.get(
                               "MUSE_BENCH_EVAL_BATCH", "128")),
                           proposal_batch=int(os.environ.get(
                               "MUSE_BENCH_PROPOSAL_BATCH", "8192")),
                           column_focus_fallback_rounds=int(os.environ.get(
                               "MUSE_BENCH_FALLBACK_ROUNDS", "2")),
                           column_proposal_batch=int(os.environ.get(
                               "MUSE_BENCH_PROPOSAL_BATCH", "8192"))),
        max_chunks=(MAXC or None),
        checkpoint_every=int(os.environ.get("MUSE_BENCH_CKPT_EVERY", "2")),
    )
    wall = time.time() - t0
    print(json.dumps({"diag": True, "wall_s": round(wall, 1),
                      "niter": int(result.niterations),
                      "ndraws": int(result.ndraws),
                      "interrupted": result.stats.get("interrupted", False)}))


if __name__ == "__main__":
    main()
