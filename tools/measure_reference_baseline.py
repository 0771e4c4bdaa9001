"""Measure the reference implementation's wall-clock on this host's CPU.

Materializes a benchmark harness for ``/root/reference`` (stubs for its
igraph/progressbar/nestle deps, a driver that reproduces ``sample.py``'s
wiring with the C likelihood and MLFriends constrainer, reference
``sample.py:131-197``), builds the reference's C kernels, runs the same
horns workload as ``/root/repo/bench.py``, and stores the result in
``baseline_ref.json`` — the denominator of bench.py's ``vs_baseline``.

Usage:
    python tools/measure_reference_baseline.py [N_GEN] [NDATA] [NLIVE]

Defaults match bench.py: N_GEN=1000 NDATA=100 NLIVE=400. The reference is
single-threaded here (OMP_NUM_THREADS=1 picks the serial .so, matching its
default build; clike's OpenMP variant is disabled upstream as broken,
reference sample.py:81).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("MDT_REFERENCE", "/root/reference")
WORKDIR = os.environ.get("MDT_REFBENCH_DIR", "/tmp/refbench")

IGRAPH_STUB = '''\
"""igraph stub: only imported, never used (USE_GRAPH=0 path)."""


class Graph(object):
    def __init__(self, *a, **kw):
        raise RuntimeError("igraph stub: use_graph must be False")
'''

NESTLE_STUB = '''\
"""nestle stub (only needed for the unused MULTIELLIPSOIDS path)."""


def bounding_ellipsoid(*a, **kw):
    raise RuntimeError("nestle stub")


def bounding_ellipsoids(*a, **kw):
    raise RuntimeError("nestle stub")


def sample_ellipsoids(*a, **kw):
    raise RuntimeError("nestle stub")
'''

PROGRESSBAR_STUB = '''\
"""Minimal progressbar stub for the reference benchmark harness."""


class Widget(object):
    TIME_SENSITIVE = False

    def update(self, pbar):
        return ""


class Timer(Widget):
    @staticmethod
    def format_time(t):
        return str(t)


class Bar(Widget):
    pass


class Percentage(Widget):
    pass


class ETA(Timer):
    def __init__(self, *a, **kw):
        pass


class ProgressBar(object):
    def __init__(self, widgets=None, maxval=None, max_value=None, **kw):
        self.widgets = widgets or []
        self.maxval = maxval or max_value or 1
        self.currval = 0
        self.seconds_elapsed = 0.0
        self.start_time = None

    def start(self):
        import time
        self.start_time = time.time()
        return self

    def update(self, value=None):
        import time
        if value is not None:
            self.currval = value
        if self.start_time is not None:
            self.seconds_elapsed = time.time() - self.start_time

    def finish(self):
        pass
'''

RUNNER = '''\
"""Reference-implementation baseline driver.

Reproduces sample.py's wiring (MLFRIENDS constrainer, C likelihood) on the
same horns workload as /root/repo/bench.py, with stubs for igraph/progressbar
and the h5py step skipped (data generated in-process with identical seeds).
Run: python run_reference.py <N_GEN> <NDATA> <NLIVE> [MAXSAMPLES]
"""

import json
import os
import sys
import time

WORKDIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, WORKDIR)                  # stubs
sys.path.insert(0, os.path.join(WORKDIR, "ref"))  # reference modules

import numpy

N_GEN = int(sys.argv[1])
NDATA = int(sys.argv[2])
NLIVE = int(sys.argv[3])
MAXSAMPLES = int(sys.argv[4]) if len(sys.argv) > 4 else 0
GENERATOR = sys.argv[5] if len(sys.argv) > 5 else "horns"

sys.path.insert(0, "REPO_PATH")
from massivedatans_tpu.datagen.generators import gen_horns, gen_nothing

data = (gen_nothing if GENERATOR == "nothing" else gen_horns)(N_GEN)
x = data["x"].astype(numpy.float64)
y = numpy.ascontiguousarray(data["y"][:, :NDATA], dtype=numpy.float64)
nx, ndata = y.shape
noise_level = 0.01


def priortransform(cube):
    cube = cube.copy()
    cube[0] = 10 ** (cube[0] * 2 - 2)
    cube[1] = cube[1] * 400 + 400
    cube[2] = cube[2] * 2
    return cube


from ctypes import cdll, c_int, c_double
from numpy.ctypeslib import ndpointer

lib = cdll.LoadLibrary(os.path.join(WORKDIR, "ref", "clike.so"))
lib.like.argtypes = [
    ndpointer(dtype=numpy.float64, ndim=1, flags="C_CONTIGUOUS"),
    ndpointer(dtype=numpy.float64, ndim=2, flags="C_CONTIGUOUS"),
    c_int, c_int, c_double, c_double, c_double, c_double,
    ndpointer(dtype=numpy.bool_, ndim=1, flags="C_CONTIGUOUS"),
    ndpointer(dtype=numpy.float64, ndim=1, flags="C_CONTIGUOUS"),
]


def multi_loglikelihood(params, data_mask):
    A, mu, log_sig_kms = params
    sig = 10 ** log_sig_kms
    Lout = numpy.zeros(data_mask.sum())
    lib.like(x, y, ndata, nx, A, mu, sig, noise_level,
             numpy.ascontiguousarray(data_mask), Lout)
    return -0.5 * Lout


from multi_nested_integrator import multi_nested_integrator
from multi_nested_sampler import MultiNestedSampler
import cachedconstrainer
from cachedconstrainer import CachedConstrainer, generate_individual_constrainer
from hiermetriclearn import MetricLearningFriendsConstrainer


def generate_fresh_constrainer():
    return MetricLearningFriendsConstrainer(
        metriclearner="truncatedscaling", force_shrink=True,
        rebuild_every=1000, metric_rebuild_every=20, verbose=False)


superset_constrainer = generate_fresh_constrainer()
cachedconstrainer.generate_fresh_constrainer = generate_fresh_constrainer
cc = CachedConstrainer()
_, _, individual_draw_constrained = generate_individual_constrainer()

numpy.random.seed(1)
start = time.time()
sampler = MultiNestedSampler(
    nlive_points=NLIVE,
    priortransform=priortransform,
    multi_loglikelihood=multi_loglikelihood,
    ndim=3, ndata=ndata,
    superset_draw_constrained=superset_constrainer.draw_constrained,
    individual_draw_constrained=individual_draw_constrained,
    draw_constrained=cc.get,
    nsuperset_draws=int(os.environ.get("SUPERSET_DRAWS", "10")),
    use_graph=False,
)
superset_constrainer.sampler = sampler
cc.sampler = sampler
results = multi_nested_integrator(
    tolerance=0.5, multi_sampler=sampler, min_samples=0,
    max_samples=MAXSAMPLES)
duration = time.time() - start

out = dict(
    duration=duration,
    ndraws=int(sampler.ndraws),
    niter=len(results["weights"]),
    ndata=ndata,
    logZ0=float(results["logZ"][0]),
    logZerr0=float(results["logZerr"][0]),
    logZ=[float(v) for v in results["logZ"]],
    logZerr=[float(v) for v in results["logZerr"]],
)
result_path = os.path.join(
    WORKDIR, "result_%s_n%d_d%d_k%d.json" % (GENERATOR, N_GEN, NDATA, NLIVE))
with open(result_path, "w") as fh:
    json.dump(out, fh)
print(json.dumps({k: v for k, v in out.items() if not isinstance(v, list)}))
'''


# Python-3 compatibility patches for the (python-2-era) reference, applied to
# the benchmark copy only: (old, new) literal replacements per file.
_PY3_PATCHES = {
    "hiermetriclearn.py": [(
        "if self.force_shrink and self.region.maxdistance > "
        "self.prev_maxdistance:",
        "if self.force_shrink and self.prev_maxdistance is not None and "
        "self.region.maxdistance > self.prev_maxdistance:",
    )],
}


def setup_harness() -> str:
    os.makedirs(WORKDIR, exist_ok=True)
    ref_dst = os.path.join(WORKDIR, "ref")
    if not os.path.isdir(ref_dst):
        shutil.copytree(REFERENCE, ref_dst)
        for fname, patches in _PY3_PATCHES.items():
            fpath = os.path.join(ref_dst, fname)
            with open(fpath) as fh:
                src = fh.read()
            for old, new in patches:
                if old not in src:
                    raise RuntimeError(f"py3 patch target missing in {fname}")
                src = src.replace(old, new)
            with open(fpath, "w") as fh:
                fh.write(src)
    for name, content in [
        ("igraph.py", IGRAPH_STUB),
        ("nestle.py", NESTLE_STUB),
        ("progressbar.py", PROGRESSBAR_STUB),
        ("run_reference.py", RUNNER.replace("REPO_PATH", REPO)),
    ]:
        with open(os.path.join(WORKDIR, name), "w") as fh:
            fh.write(content)
    subprocess.run(["make", "-s"], cwd=ref_dst, check=True)
    subprocess.run(["make", "-s"], cwd=os.path.join(ref_dst, "clustering"),
                   check=True)
    return WORKDIR


def main():
    n_gen = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    ndata = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    nlive = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    maxsamples = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    generator = sys.argv[5] if len(sys.argv) > 5 else "horns"

    workdir = setup_harness()
    env = dict(os.environ, OMP_NUM_THREADS="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(workdir, "run_reference.py"),
         str(n_gen), str(ndata), str(nlive), str(maxsamples), generator],
        env=env, capture_output=True, text=True, check=True,
    )
    print(proc.stdout.strip())

    result_path = os.path.join(
        workdir, f"result_{generator}_n{n_gen}_d{ndata}_k{nlive}.json")
    with open(result_path) as fh:
        result = json.load(fh)
    result["host"] = ("reference implementation (C kernels + MLFriends), "
                      "1 CPU thread, measured in " + workdir)

    baseline_path = os.path.join(REPO, "baseline_ref.json")
    baseline = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            baseline = json.load(fh)
    baseline[f"{generator}_n{n_gen}_ndata{ndata}_nlive{nlive}"] = result
    with open(baseline_path, "w") as fh:
        json.dump(baseline, fh, indent=1)
    print(f"updated {baseline_path}")


if __name__ == "__main__":
    main()
