"""Forensic probe of a MUSE checkpoint: why do fills stall?

Loads muse_bench_out/ckpt_<N>, rebuilds the problem, and for a sample of
datasets measures (a) the live-point cluster geometry per column, (b) the
per-column jackknife radius vs that cluster, (c) the likelihood acceptance
of fresh column proposals against each dataset's insertion threshold.

    JAX_PLATFORMS=cpu python tools/muse_forensic.py [n_spaxels] [n_cols]
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

N_SPAXELS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
NCOLS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
OUT = "muse_bench_out"


def main():
    import jax
    import jax.numpy as jnp

    from massivedatans_tpu.config import RunConfig
    from massivedatans_tpu.muse import synth
    from massivedatans_tpu.muse.pipeline import load_muse_cube
    from massivedatans_tpu.muse.likelihood import make_muse_problem
    from massivedatans_tpu.muse.model import load_template_grid
    from massivedatans_tpu.ns import engine as eng
    from massivedatans_tpu.io import checkpoint as ckpt
    from massivedatans_tpu.ns import region as region_lib

    side = max(2, math.ceil(math.sqrt(N_SPAXELS / 0.75)) + 1)
    cube_path = os.path.join(OUT, f"cube_{N_SPAXELS}.fits")
    region_path = os.path.join(OUT, f"sel_{N_SPAXELS}.reg")
    tpl_files = synth.make_template_files(os.path.join(OUT, "templates"),
                                          n_wl=1200)
    cube = load_muse_cube(cube_path, region_path, maxdata=N_SPAXELS)
    md = load_template_grid(tpl_files, data_wl_nm=cube.wavelength_nm,
                            zlo=0.0, zhi=0.3)
    problem = make_muse_problem(md, cube.y, cube.var)
    cfg = RunConfig.from_env(nlive_points=400, tolerance=0.5,
                             max_samples=100000)
    template = eng.init_state(problem, jax.random.key(0), cfg)
    state = ckpt.load_state(os.path.join(OUT, f"ckpt_{N_SPAXELS}"), template)

    live_idx = np.asarray(state.live_idx)
    live_L = np.asarray(state.live_L)
    pile_u = np.asarray(state.pile_u)
    shelves_count = np.asarray(state.shelves.count)
    print(f"iteration={int(state.iteration)} pile_size={int(state.pile_size)}"
          f" running={int(np.asarray(state.running).sum())}"
          f" shelves empty={(shelves_count == 0).sum()}"
          f" n_groups={int(state.n_groups)}")

    K, D = live_idx.shape
    rng = np.random.default_rng(0)
    cols = rng.choice(D, size=min(NCOLS, D), replace=False)
    B = 2048
    for d in cols:
        U = pile_u[live_idx[:, d]]            # [K, ndim] unit cube
        # per-column jackknife radius in RAW u space (metric ~ identity scale
        # check): whitened by per-column std to mimic the metric
        sd = U.std(axis=0) + 1e-12
        W = U / sd
        d2 = ((W[:, None, :] - W[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        nn = d2.min(axis=1)
        rad = float(np.sqrt(nn.max()))
        lo, hi = W.min(0) - rad, W.max(0) + rad
        box_vol = float(np.prod(hi - lo))
        # ball-union proposal in whitened space
        centers = W[rng.integers(0, K, B)]
        offs = rng.normal(size=(B, U.shape[1]))
        offs /= np.linalg.norm(offs, axis=1, keepdims=True)
        r = rad * rng.uniform(size=(B, 1)) ** (1.0 / U.shape[1])
        wprop = centers + offs * r
        nnear = (((W[:, None, :] - wprop[None, :, :]) ** 2).sum(-1)
                 < rad * rad).sum(0)
        keep = rng.uniform(size=B) * np.maximum(nnear, 1) < 1.0
        uprop = np.clip(wprop * sd, 1e-6, 1 - 1e-6)
        xprop = jax.vmap(problem.prior_transform)(jnp.asarray(uprop, jnp.float32))
        L = np.asarray(problem.loglike_batch(problem.data, xprop))[:, d]
        thresh = np.partition(live_L[:, d], 0)[0]  # live minimum
        nshelf = int(shelves_count[d])
        frac_above = float((L[keep] > thresh).mean()) if keep.any() else -1.0
        print(f"d={d:3d} shelf={nshelf} Lmin={thresh:9.1f} "
              f"Lmax={live_L[:, d].max():9.1f} rad={rad:6.3f} "
              f"u-std={np.array2string(sd, precision=4)} "
              f"boxvol={box_vol:9.2e} keep={int(keep.sum())}/{B} "
              f"acc(L>Lmin)={frac_above:8.5f} "
              f"maxLprop={L[keep].max() if keep.any() else float('nan'):9.1f}")


if __name__ == "__main__" and not os.environ.get("MDT_FORENSIC_STUCK"):
    main()


def stuck_report():
    """Focused report on the EMPTY-shelf columns (the fill blockers)."""
    import jax
    import jax.numpy as jnp

    from massivedatans_tpu.config import RunConfig
    from massivedatans_tpu.muse import synth
    from massivedatans_tpu.muse.pipeline import load_muse_cube
    from massivedatans_tpu.muse.likelihood import make_muse_problem
    from massivedatans_tpu.muse.model import load_template_grid
    from massivedatans_tpu.ns import engine as eng
    from massivedatans_tpu.ns import shelves as shelves_lib
    from massivedatans_tpu.io import checkpoint as ckpt

    side = max(2, math.ceil(math.sqrt(N_SPAXELS / 0.75)) + 1)
    cube = load_muse_cube(os.path.join(OUT, f"cube_{N_SPAXELS}.fits"),
                          os.path.join(OUT, f"sel_{N_SPAXELS}.reg"),
                          maxdata=N_SPAXELS)
    tpl_files = synth.make_template_files(os.path.join(OUT, "templates"),
                                          n_wl=1200)
    md = load_template_grid(tpl_files, data_wl_nm=cube.wavelength_nm,
                            zlo=0.0, zhi=0.3)
    problem = make_muse_problem(md, cube.y, cube.var)
    cfg = RunConfig.from_env(nlive_points=400, tolerance=0.5,
                             max_samples=100000)
    template = eng.init_state(problem, jax.random.key(0), cfg)
    state = ckpt.load_state(os.path.join(OUT, f"ckpt_{N_SPAXELS}"), template)

    live_idx = np.asarray(state.live_idx)
    live_L = np.asarray(state.live_L)
    pile_u = np.asarray(state.pile_u)
    count = np.asarray(state.shelves.count)
    stall = np.asarray(state.stall_count)
    running = np.asarray(state.running)
    empty = running & (count == 0)
    print(f"empty columns: {np.where(empty)[0].tolist()}")
    print(f"stall_count>0: {dict(zip(np.where(stall>0)[0].tolist(), stall[stall>0].tolist()))}")
    live_bot = np.asarray(shelves_lib.live_bottom(
        jnp.asarray(live_L), int(cfg.shelf_capacity)))
    thresh = np.asarray(shelves_lib.insertion_thresholds(
        jnp.asarray(live_bot), state.shelves))
    rng = np.random.default_rng(1)
    for d in np.where(empty)[0]:
        U = pile_u[live_idx[:, d]]
        ndistinct = len(np.unique(live_idx[:, d]))
        sd = U.std(axis=0)
        # per-slot whitened ball sampling exactly like _column_proposals
        W = (U - U.mean(0)) / (sd + 1e-12)
        d2 = ((W[:, None, :] - W[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        rad = float(np.sqrt(d2.min(axis=1).max()))
        B = 4096
        ctr = W[rng.integers(0, len(W), B)]
        offs = rng.normal(size=(B, U.shape[1]))
        offs /= np.linalg.norm(offs, axis=1, keepdims=True)
        r = rad * rng.uniform(size=(B, 1)) ** (1.0 / U.shape[1])
        wp = ctr + offs * r
        nnear = (((W[:, None, :] - wp[None, :, :]) ** 2).sum(-1) < rad*rad).sum(0)
        keep = rng.uniform(size=B) * np.maximum(nnear, 1) < 1.0
        up = np.clip(wp * (sd + 1e-12) + U.mean(0), 1e-6, 1 - 1e-6)
        xp = jax.vmap(problem.prior_transform)(jnp.asarray(up, jnp.float32))
        L = np.asarray(problem.loglike_batch(problem.data, xp))[:, d]
        acc = float((L[keep] > thresh[d]).mean()) if keep.any() else -1.0
        print(f"d={d:3d} distinct_live={ndistinct:3d} stall={stall[d]} "
              f"Lmin={live_L[:, d].min():10.2f} thresh={thresh[d]:10.2f} "
              f"Lmax={live_L[:, d].max():10.2f} rad={rad:7.3f} "
              f"sd={np.array2string(sd, precision=4)} "
              f"keep={int(keep.sum())} acc={acc:8.5f} "
              f"maxL={L[keep].max() if keep.any() else float('nan'):10.2f}")


if __name__ == "__main__" and os.environ.get("MDT_FORENSIC_STUCK"):
    stuck_report()
    sys.exit(0)
