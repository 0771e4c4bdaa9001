"""Post-processing utilities."""

import json

import numpy as np

from massivedatans_tpu import postprocess as pp


def _fake_out(niter=50, D=4, ndim=3, seed=0):
    rng = np.random.default_rng(seed)
    out = dict(
        logZ=rng.normal(-100, 5, D),
        logZerr=np.abs(rng.normal(0.3, 0.05, D)),
        u=rng.uniform(size=(niter, D, ndim)).astype(np.float32),
        x=rng.uniform(size=(niter, D, ndim)).astype(np.float32),
        L=rng.normal(-50, 3, size=(niter, D)).astype(np.float32),
        w=-np.linspace(0, 5, niter)[:, None].repeat(D, 1).astype(np.float32),
        mask=np.ones((niter, D), bool),
        ndraws=1234,
    )
    return out


def test_posterior_weights_normalized():
    out = _fake_out()
    p = pp.posterior_weights(out, 0)
    assert np.isclose(p.sum(), 1.0)
    assert (p >= 0).all()
    xs = pp.posterior_samples(out, 1, size=200)
    assert xs.shape == (200, 3)


def test_posterior_weights_ignore_inactive_rows():
    out = _fake_out()
    out["L"][10, 0] = -np.inf
    out["w"][11, 0] = -np.inf
    p = pp.posterior_weights(out, 0)
    assert p[10] == 0 and p[11] == 0


def test_bayes_factors_and_plot(tmp_path):
    out = _fake_out()
    rng = np.random.default_rng(1)
    y = rng.normal(0, 0.01, size=(200, 4))
    B = pp.plot_evidences(out, y, path=str(tmp_path / "ev.pdf"))
    assert B.shape == (4,)
    assert (tmp_path / "ev.pdf").exists()


def test_plot_scaling(tmp_path):
    files = []
    for N, nd in [(10, 1000), (100, 3000), (1000, 10000)]:
        fn = tmp_path / f"s{N}.json"
        fn.write_text(json.dumps(dict(ndata=N, ndraws=nd, duration=1.0)))
        files.append(str(fn))
    N, draws = pp.plot_scaling(files, path=str(tmp_path / "sc.pdf"))
    assert list(N) == [10, 100, 1000]
    assert (tmp_path / "sc.pdf").exists()


def test_muse_maps(tmp_path):
    out = _fake_out(D=4)
    flat_positions = np.array([0, 3, 7, 12])
    maps = pp.muse_maps(out, flat_positions, (4, 4),
                        path_prefix=str(tmp_path / "m"))
    assert maps["logZ"].shape == (4, 4)
    assert np.isfinite(maps["logZ"].ravel()[flat_positions]).all()
    assert np.isnan(maps["logZ"].ravel()[1])
    assert (tmp_path / "m_logZ.pdf").exists()

def test_plot_corner(tmp_path):
    rng = np.random.default_rng(2)
    s = rng.normal(size=(500, 3))
    fig = pp.plot_corner(s, labels=["a", "b", "c"],
                         path=str(tmp_path / "corner.pdf"))
    assert (tmp_path / "corner.pdf").exists()


def test_plot_muse_posterior(tmp_path):
    # D=3, ndim=5, all rows finite -> min_finite=10 selects all datasets
    out = _fake_out(niter=64, D=3, ndim=5, seed=3)
    done = pp.plot_muse_posterior(
        out, min_finite=10, size=2000,
        path_prefix=str(tmp_path / "mp"),
        transforms={2: np.abs},
        rng=np.random.default_rng(0),
    )
    assert done == [0, 1, 2]
    assert (tmp_path / "mp_1.pdf").exists()
    assert (tmp_path / "mp_3.pdf").exists()
    # raising the finite-row threshold skips everything (plotmuseposterior.py:18)
    assert pp.plot_muse_posterior(
        out, min_finite=10_000, path_prefix=str(tmp_path / "skip")) == []


def test_region_demo_plots(tmp_path):
    outs = pp.plot_region_demo(path_prefix=str(tmp_path / "pc"),
                               nlive=50, nlevels=2, npoints=3000)
    assert (tmp_path / "pc.pdf").exists()
    assert len(outs) >= 1

    outs2 = pp.plot_joint_region_demo(path_prefix=str(tmp_path / "pj"),
                                      nlive=50, nlevels=2, npoints=3000)
    assert len(outs2) >= 1


def test_plot_bestfit_gaussline(tmp_path):
    import jax

    from massivedatans_tpu.datagen.generators import gen_horns
    from massivedatans_tpu.models.gaussline import make_gaussline_problem

    data = gen_horns(8, seed=9)
    problem = make_gaussline_problem(data["x"], data["y"], data["noise_level"])
    out = _fake_out(niter=32, D=8, ndim=3, seed=4)
    paths = pp.plot_bestfit(out, problem, datasets=[0, 3],
                            path_prefix=str(tmp_path / "bf"))
    assert len(paths) == 2
    assert (tmp_path / "bf_3.pdf").exists()
