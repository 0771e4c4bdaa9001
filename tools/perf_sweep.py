"""Config sweep for steady-state engine throughput on the current device.

Times warmed-up chunks of the canonical horns workload under config
variants; prints seconds/chunk and effective iterations/s for each.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

from massivedatans_tpu.config import RunConfig
from massivedatans_tpu.datagen.generators import gen_horns
from massivedatans_tpu.models.gaussline import make_gaussline_problem
from massivedatans_tpu.ns import engine as engine_lib

NDATA = int(sys.argv[1]) if len(sys.argv) > 1 else 100

BASE = dict(nlive_points=400, tolerance=0.5, chunk_iters=50,
            eval_batch=128, proposal_batch=512, shelf_capacity=8)

VARIANTS = {
    "base": {},
    "rebuild4": dict(region_rebuild_every=4),
    "rebuild10": dict(region_rebuild_every=10),
    "norebuild": dict(region_rebuild_every=10**6),  # geometry cond floor
    "boot3": dict(nbootstraps=3),
    "nofocus": dict(use_focus=False),
    "B64": dict(eval_batch=64, proposal_batch=256),
    "B256": dict(eval_batch=256, proposal_batch=1024),
    "B512": dict(eval_batch=512, proposal_batch=2048),
    "S16": dict(shelf_capacity=16),
    "S32": dict(shelf_capacity=32),
    "rebuild10+S16": dict(region_rebuild_every=10, shelf_capacity=16),
    "rebuild10+boot5": dict(region_rebuild_every=10, nbootstraps=5),
    "B512+S32+r20": dict(eval_batch=512, proposal_batch=2048,
                         shelf_capacity=32, region_rebuild_every=20),
}


def main():
    only = os.environ.get("SWEEP_VARIANTS")
    if only:
        names = only.split(",")
        for nm in names:
            assert nm in VARIANTS, nm
        selected = {nm: VARIANTS[nm] for nm in names}
    else:
        selected = VARIANTS
    data = gen_horns(max(1000, NDATA))
    problem = make_gaussline_problem(data["x"], data["y"][:, :NDATA],
                                     data["noise_level"])
    print(f"device: {jax.devices()[0]}, D={NDATA}", flush=True)
    for name, kw in selected.items():
        cfg = RunConfig(**{**BASE, **kw})
        mc = cfg.resolve_member_capacity(problem.ndata)
        state = engine_lib.init_state(problem, jax.random.key(0), cfg)
        # warm: compile + advance past the startup phase
        for _ in range(4):
            state, dead = engine_lib.run_chunk(problem, state, cfg, mc, 50)
        jax.block_until_ready(dead.L)
        n0 = int(state.ndraws)
        r0 = int(state.fill_rounds)
        t0 = time.time()
        for _ in range(4):
            state, dead = engine_lib.run_chunk(problem, state, cfg, mc, 50)
        jax.block_until_ready(dead.L)
        dt = (time.time() - t0) / 4
        evals = (int(state.ndraws) - n0) / 4
        rounds = (int(state.fill_rounds) - r0) / 4
        print(f"{name:>18}: {dt*1000:7.1f} ms/chunk  "
              f"{50/dt:7.1f} it/s  {evals/dt:9.0f} evals/s  "
              f"ndraws/chunk={evals:.0f}  rounds/chunk={rounds:.0f}")


if __name__ == "__main__":
    main()
