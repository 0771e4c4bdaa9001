"""The headline experiment: model evaluations and wall-clock vs dataset
count N (reference plotscaling.py protocol; paper claim: ~O(sqrt(N))).

Runs the horns suite at N in {10, 100, 1000, 10000} fitting all N datasets
jointly, writes <out>/scaling_N.stats.json per point, and the scaling plot.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax
import numpy as np

from massivedatans_tpu.config import RunConfig
from massivedatans_tpu.datagen.generators import gen_horns
from massivedatans_tpu.models.gaussline import make_gaussline_problem
from massivedatans_tpu.ns.integrator import multi_nested_integrator

OUT = sys.argv[1] if len(sys.argv) > 1 else "scaling_out"
NS = [int(x) for x in sys.argv[2:]] or [10, 100, 1000, 10000]


def main():
    os.makedirs(OUT, exist_ok=True)
    data = gen_horns(max(NS))
    stats_files = []
    for N in NS:
        problem = make_gaussline_problem(
            data["x"], data["y"][:, :N], data["noise_level"])
        cfg = RunConfig(nlive_points=400)
        t0 = time.time()
        result = multi_nested_integrator(
            problem, cfg, key=jax.random.key(1), progress=True)
        wall = time.time() - t0
        stats = {
            k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in result.stats.items()
        }
        # per-dataset arrays are bulky at N=10^4: summarize
        stats["stalled_total"] = int(np.sum(result.stats.get(
            "stalled_mask", np.zeros(1))))
        stats.pop("stall_count", None)
        stats.pop("stalled_mask", None)
        stats["wall"] = wall
        stats["logZ0"] = float(result.logZ[0])
        fn = os.path.join(OUT, f"scaling_{N}.stats.json")
        with open(fn, "w") as fh:
            json.dump(stats, fh, indent=1)
        stats_files.append(fn)
        print(f"N={N:6d}: {wall:8.1f}s  ndraws={result.ndraws:9d}  "
              f"niter={result.niterations:6d}  "
              f"draws/dataset={result.ndraws/N:9.1f}", flush=True)

    from massivedatans_tpu.postprocess import plot_scaling

    Ns, draws = plot_scaling(stats_files, path=os.path.join(OUT, "scaling.pdf"))
    # sub-linear scaling check: evals grow much slower than N
    if len(Ns) >= 2:
        slope = np.polyfit(np.log(Ns), np.log(draws), 1)[0]
        print(f"scaling exponent: evals ~ N^{slope:.2f} "
              f"(1.0 = linear, 0.5 = paper's sqrt claim)")


if __name__ == "__main__":
    main()
