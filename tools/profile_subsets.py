"""Micro-benchmark + cross-check of subset-decomposition implementations.

Equivalent of reference ``profile_generate_subsets.py``: times the native
C++ union-find against the numpy fallback on realistic live-point matrices
and asserts identical partitions.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

from massivedatans_tpu.ns import subsets


def synth_live_idx(K, D, n_groups, seed=0):
    rng = np.random.default_rng(seed)
    group_of = rng.integers(0, n_groups, size=D)
    live_idx = np.zeros((K, D), np.int32)
    for g in range(n_groups):
        cols = np.where(group_of == g)[0]
        pool = np.arange(g * 10 * K, g * 10 * K + 5 * K)
        for d in cols:
            live_idx[:, d] = rng.choice(pool, size=K)
    return live_idx


def main():
    for K, D, G in [(400, 100, 4), (400, 1000, 16), (400, 10000, 64)]:
        live_idx = synth_live_idx(K, D, G)
        sel = np.ones(D, bool)
        live_local, uniq = subsets._localize(live_idx, sel)

        lib = subsets._load_native()
        t0 = time.time()
        out = np.zeros(D, np.int32)
        n_native = lib.decompose_components(
            np.asfortranarray(live_local, np.int32),
            np.ascontiguousarray(sel, np.uint8), K, D, len(uniq), out)
        t_native = time.time() - t0

        t0 = time.time()
        labels_np, n_np = subsets._components_numpy(
            live_local, sel, K, D, len(uniq))
        t_numpy = time.time() - t0

        assert n_native == n_np
        for g in range(n_native):
            assert len(set(labels_np[out == g])) == 1
        print(f"K={K} D={D:6d} groups={n_native:3d}: "
              f"native {t_native*1000:8.2f} ms  numpy {t_numpy*1000:8.2f} ms  "
              f"speedup {t_numpy/max(t_native,1e-9):6.1f}x")


if __name__ == "__main__":
    main()
