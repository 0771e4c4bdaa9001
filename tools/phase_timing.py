"""Per-chunk timing over a full canonical run — where does wall-clock go?"""

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
from massivedatans_tpu.ns import engine as engine_lib

NDATA = int(sys.argv[1]) if len(sys.argv) > 1 else 100
TOL = 0.5


def main():
    data = gen_horns(1000)
    problem = make_gaussline_problem(data["x"], data["y"][:, :NDATA],
                                     data["noise_level"])
    cfg = RunConfig(nlive_points=400)
    mc = cfg.resolve_member_capacity(problem.ndata)
    state = engine_lib.init_state(problem, jax.random.key(1), cfg)
    running = np.ones(NDATA, bool)
    t_start = time.time()
    chunk = 0
    while running.any() and chunk < 200:
        t0 = time.time()
        state, dead = engine_lib.run_chunk(problem, state, cfg, mc, 50)
        jax.block_until_ready(dead.L)
        dt = time.time() - t0
        remZ, remZerr, totalZ, totalZerr = engine_lib.integrate_remainder(
            state.live_L, state.logZ, state.H, state.logwidth, state.Lmax,
            cfg.nlive_points)
        term = running & (np.asarray(totalZerr) < TOL)
        running &= ~term
        state = state._replace(running=jax.numpy.asarray(running))
        chunk += 1
        if chunk % 5 == 0 or term.any():
            print(f"chunk {chunk:3d}: {dt*1000:8.1f} ms  "
                  f"ndraws={int(state.ndraws):8d}  running={running.sum():4d}  "
                  f"stalled={int(np.asarray(state.stall_count).max()):3d}")
    print(f"total: {time.time()-t_start:.1f}s  iters={int(state.iteration)}  "
          f"ndraws={int(state.ndraws)}")


if __name__ == "__main__":
    main()
