"""Canonical benchmark: the reference's headline run protocol on TPU.

Reference protocol (README.rst:22-33, BASELINE.md): generate the
``gensimple_horns`` suite, fit ``ndata`` spectra jointly with nlive=400,
tolerance=0.5. The reference measures model evaluations and wall-clock via
``.stats.json`` (sample.py:215-217).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares wall-clock against the reference implementation's
measured time for the same workload on this host's CPU (see
``tools/measure_reference_baseline.py``; stored in baseline_ref.json).
Values > 1 mean the TPU framework is faster.
"""

import json
import os
import sys
import time

N_GEN = int(os.environ.get("BENCH_NGEN", "1000"))
NDATA = int(os.environ.get("BENCH_NDATA", "100"))
NLIVE = int(os.environ.get("BENCH_NLIVE", "400"))
# 200 iterations per device dispatch: the tunneled TPU's per-dispatch
# round-trip latency is the dominant and highly variable cost on this host,
# so fewer/larger chunks win in every observed latency regime
CHUNK_ITERS = int(os.environ.get("BENCH_CHUNK_ITERS", "200"))
EVAL_BATCH = int(os.environ.get("BENCH_EVAL_BATCH", "128"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "1"))


def main():
    import jax

    from massivedatans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from massivedatans_tpu.config import RunConfig
    from massivedatans_tpu.datagen.generators import gen_horns
    from massivedatans_tpu.models.gaussline import make_gaussline_problem
    from massivedatans_tpu.ns.integrator import multi_nested_integrator

    data = gen_horns(N_GEN)
    y = data["y"][:, :NDATA]
    problem = make_gaussline_problem(data["x"], y, data["noise_level"])
    cfg = RunConfig(
        nlive_points=NLIVE,
        tolerance=0.5,
        chunk_iters=CHUNK_ITERS,
        eval_batch=EVAL_BATCH,
        proposal_batch=512,
        shelf_capacity=8,
    )

    # Warm-up: execute the exact jitted graphs of the timed run once (same
    # cfg/shapes -> same executables), so the measurement is steady-state
    # throughput. Compilation is a one-time cost amortized over production
    # use (and is paid to a remote compile service with minutes-scale queue
    # variance on this host); its cost is reported separately below.
    warmup_s = 0.0
    if WARMUP:
        from massivedatans_tpu.ns import engine as engine_lib

        t_w = time.time()
        mc = cfg.resolve_member_capacity(problem.ndata)
        st0 = engine_lib.init_state(problem, jax.random.key(1), cfg)
        st1, dead = engine_lib.run_chunk(problem, st0, cfg, mc, cfg.chunk_iters)
        buf = engine_lib.chunk_report(st1, dead, cfg.nlive_points)
        tails = engine_lib.capture_tails(st1)
        jax.block_until_ready((buf, tails))
        del st0, st1, dead, buf, tails
        warmup_s = time.time() - t_w

    t0 = time.time()
    result = multi_nested_integrator(
        problem, cfg, key=jax.random.key(1), progress=False
    )
    wall = time.time() - t0

    baseline_s = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baseline_ref.json")
    if os.path.exists(base_path):
        with open(base_path) as fh:
            base = json.load(fh)
        key = f"horns_n{N_GEN}_ndata{NDATA}_nlive{NLIVE}"
        baseline_s = base.get(key, {}).get("duration")

    vs = (baseline_s / wall) if baseline_s else 0.0
    print(json.dumps({
        "metric": f"wall-clock horns ndata={NDATA} nlive={NLIVE} tol=0.5",
        "value": round(wall, 2),
        "unit": "s",
        "vs_baseline": round(vs, 2),
        "extra": {
            "ndraws": int(result.ndraws),
            "niter": int(result.niterations),
            "evals_per_s": round(result.ndraws / wall, 1),
            "logZ0": float(result.logZ[0]),
            "platform": jax.devices()[0].platform,
            "warmup_compile_s": round(warmup_s, 2),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
