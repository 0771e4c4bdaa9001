"""SNR-sweep / suite benchmark (BASELINE.json configs).

Runs the joint fit over each synthetic suite (bright/faint SNR variants,
AGN-like, realistic, horns) at a fixed N and reports the shared-draw reuse
efficiency (evals/dataset) per suite — brighter suites decouple earlier and
share fewer draws, the effect the reference's gensimple_{bright,faint}
pair exists to probe.

    python tools/suite_bench.py [N] [suites...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

from massivedatans_tpu.config import RunConfig
from massivedatans_tpu.datagen.generators import GENERATORS
from massivedatans_tpu.models.gaussline import make_gaussline_problem
from massivedatans_tpu.ns.integrator import multi_nested_integrator
from massivedatans_tpu.utils.cache import enable_compilation_cache

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
SUITES = sys.argv[2:] or ["bright", "simple", "faint", "agn", "realistic",
                          "horns"]


def main():
    enable_compilation_cache()
    rows = []
    for suite in SUITES:
        data = GENERATORS[suite](N)
        problem = make_gaussline_problem(
            data["x"], data["y"], data["noise_level"])
        cfg = RunConfig(nlive_points=400)
        t0 = time.time()
        result = multi_nested_integrator(
            problem, cfg, key=jax.random.key(1), progress=False)
        wall = time.time() - t0
        row = dict(
            suite=suite, N=N, wall_s=round(wall, 1),
            ndraws=int(result.ndraws), niter=int(result.niterations),
            evals_per_dataset=round(result.ndraws / N, 1),
            logZ0=round(float(result.logZ[0]), 2),
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
