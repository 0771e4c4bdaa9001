"""Canonical benchmark: the reference's headline run protocol on TPU.

Reference protocol (README.rst:22-33, BASELINE.md): generate the
``gensimple_horns`` suite, fit ``ndata`` spectra jointly with nlive=400,
tolerance=0.5. The reference measures model evaluations and wall-clock via
``.stats.json`` (sample.py:215-217).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

``vs_baseline`` compares wall-clock against the reference implementation's
measured time for the same workload on this host's CPU (see
``tools/measure_reference_baseline.py``; stored in baseline_ref.json).
Values > 1 mean the TPU framework is faster.

Robustness contract (VERDICT r1): the JSON line is ALWAYS emitted. The run
is staged — if the full-size chunk graph fails to compile or run (the
remote compile service on this host has been seen OOM-killing large
graphs), progressively smaller per-dispatch chunk sizes are retried; the
same scientific workload (ndata/nlive/tolerance) is preserved, only the
dispatch granularity shrinks. A fallback run is marked ``"degraded"``; a
total failure emits ``"error"`` with value -1.
"""

import json
import os
import sys
import time
import traceback

N_GEN = int(os.environ.get("BENCH_NGEN", "1000"))
NDATA = int(os.environ.get("BENCH_NDATA", "100"))
NLIVE = int(os.environ.get("BENCH_NLIVE", "400"))
# NS iterations per device dispatch. The tunneled TPU's per-dispatch
# round-trip latency is seconds-scale and variable, so larger chunks win
# (fewer round trips) — chunk=200 measured 47 s in the same tunnel episode
# where chunk=100 measured 227 s. The round-1 compile OOM at 200 was fixed
# by tiling the Pallas region kernels; the staged fallback still walks down
# if a stage fails to compile or run.
CHUNK_STAGES = [int(s) for s in os.environ.get(
    "BENCH_CHUNK_STAGES", os.environ.get("BENCH_CHUNK_ITERS", "200,100,50")
).split(",")]
EVAL_BATCH = int(os.environ.get("BENCH_EVAL_BATCH", "128"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "1"))
# chunks kept in flight: the tunneled TPU's dispatch/fetch round trip is
# seconds-scale and VARIABLE (observed 0.1-4 s); deep pipelining overlaps it
LOOKAHEAD = int(os.environ.get("BENCH_LOOKAHEAD", "4"))

# TPU v5e (lite) peak: 394 TFLOP/s bf16, 197 TFLOP/s int8-era fp32 path is
# lower; we report MFU against the bf16 peak — conservative (the likelihood
# matmul runs in f32 HIGHEST, whose achievable peak is ~1/4 of bf16).
V5E_PEAK_BF16 = 394e12


def emit(payload):
    print(json.dumps(payload))
    sys.stdout.flush()


def run_stage(problem, cfg, warmup: bool):
    """One full integrator run; returns (result, wall_s, warmup_s)."""
    import jax

    from massivedatans_tpu.ns import engine as engine_lib
    from massivedatans_tpu.ns.integrator import multi_nested_integrator

    warmup_s = 0.0
    if warmup:
        # Execute the exact jitted graphs of the timed run once (same
        # cfg/shapes -> same executables), so the measurement is
        # steady-state throughput; compilation cost is reported separately.
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
    return result, time.time() - t0, warmup_s


def main():
    t_start = time.time()
    try:
        import jax

        from massivedatans_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

        from massivedatans_tpu.config import RunConfig
        from massivedatans_tpu.datagen.generators import gen_horns
        from massivedatans_tpu.models.gaussline import make_gaussline_problem

        data = gen_horns(N_GEN)
        y = data["y"][:, :NDATA]
        nx = y.shape[0]
        problem = make_gaussline_problem(data["x"], y, data["noise_level"])
        platform = jax.devices()[0].platform
    except Exception:
        emit({"metric": "wall-clock horns (setup failed)", "value": -1.0,
              "unit": "s", "vs_baseline": 0.0,
              "extra": {"error": traceback.format_exc(limit=3)}})
        return 0

    errors = []
    result = wall = warmup_s = None
    used_chunk = None
    for stage_i, chunk in enumerate(CHUNK_STAGES):
        cfg = RunConfig(
            nlive_points=NLIVE,
            tolerance=0.5,
            chunk_iters=chunk,
            eval_batch=EVAL_BATCH,
            proposal_batch=512,
            shelf_capacity=8,
            pipeline_lookahead=LOOKAHEAD,
        )
        try:
            result, wall, warmup_s = run_stage(problem, cfg, warmup=WARMUP)
            used_chunk = chunk
            break
        except Exception:
            err = traceback.format_exc(limit=3)
            errors.append({"chunk_iters": chunk, "error": err.splitlines()[-1]})
            sys.stderr.write(f"[bench] stage chunk_iters={chunk} failed:\n{err}\n")

    if result is None:
        emit({"metric": f"wall-clock horns ndata={NDATA} nlive={NLIVE} tol=0.5",
              "value": -1.0, "unit": "s", "vs_baseline": 0.0,
              "extra": {"error": "all stages failed", "stages": errors,
                        "platform": platform}})
        return 0

    baseline_s = None
    baseline_kind = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baseline_ref.json")
    if os.path.exists(base_path):
        with open(base_path) as fh:
            base = json.load(fh)
        key = f"horns_n{N_GEN}_ndata{NDATA}_nlive{NLIVE}"
        baseline_s = base.get(key, {}).get("duration")
        baseline_kind = "measured" if baseline_s else None
        if baseline_s is None and NLIVE == 400:
            # no measured reference run at this exact ndata: extrapolate a
            # power law duration ~ a * ndata^b through the measured horns
            # anchors (the reference's own claim is sublinear ~sqrt(N)
            # scaling of evals, pres/massivens4.lyx:1455-1472; wall-clock
            # adds the O(ndata) likelihood cost). Marked in extra so a
            # fitted denominator is never mistaken for a measured one.
            import re

            pts = []
            for k, v in base.items():
                m = re.match(r"horns_n\d+_ndata(\d+)_nlive400$", k)
                if m and v.get("duration"):
                    pts.append((int(m.group(1)), float(v["duration"])))
            if len(pts) >= 2:
                import math

                xs = [math.log(p[0]) for p in pts]
                ys = [math.log(p[1]) for p in pts]
                n = len(pts)
                mx, my = sum(xs) / n, sum(ys) / n
                b = (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
                     / max(sum((x - mx) ** 2 for x in xs), 1e-12))
                a = my - b * mx
                baseline_s = math.exp(a + b * math.log(NDATA))
                baseline_kind = (
                    f"extrapolated: {len(pts)} anchors, exponent {b:.2f}"
                )

    # Achieved model-evaluation FLOP rate: every evaluated candidate row is
    # one [nx] . [nx, D] chi^2 contraction (2*nx*D FLOPs) plus the model
    # curve itself (~6*nx, negligible). MFU is quoted against the bf16 MXU
    # peak even though the matmul runs f32-HIGHEST — a deliberately
    # conservative absolute scale (VERDICT r1 #9).
    flops = 2.0 * float(result.ndraws) * nx * NDATA
    flops_per_s = flops / wall
    vs = (baseline_s / wall) if baseline_s else 0.0
    payload = {
        "metric": f"wall-clock horns ndata={NDATA} nlive={NLIVE} tol=0.5",
        "value": round(wall, 2),
        "unit": "s",
        "vs_baseline": round(vs, 2),
        "extra": {
            "ndraws": int(result.ndraws),
            "niter": int(result.niterations),
            "fill_rounds": int(result.stats.get("fill_rounds", 0)),
            "evals_per_s": round(result.ndraws / wall, 1),
            "logZ0": float(result.logZ[0]),
            "platform": platform,
            "warmup_compile_s": round(warmup_s, 2),
            "chunk_iters": used_chunk,
            "likelihood_flops_per_s": round(flops_per_s / 1e9, 2),
            "likelihood_flops_unit": "GFLOP/s",
            "mfu_vs_v5e_bf16_peak": round(flops_per_s / V5E_PEAK_BF16, 6),
            "total_bench_s": round(time.time() - t_start, 1),
            "baseline": baseline_kind,
        },
    }
    if used_chunk != CHUNK_STAGES[0]:
        payload["extra"]["degraded"] = {"failed_stages": errors}
    emit(payload)
    return 0


if __name__ == "__main__":
    sys.exit(main())
