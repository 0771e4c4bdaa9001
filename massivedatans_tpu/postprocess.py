"""Post-processing and diagnostics (reference layer L7, survey §1).

Functional equivalents of the reference plotting scripts:
- ``posterior_samples`` / ``check_output``  — checkoutput.py
- ``plot_posterior``                         — plotposterior.py
- ``plot_evidences``                         — plotevidences.py:17-36 (Bayes
  factors vs the analytic no-signal evidence)
- ``plot_scaling``                           — plotscaling.py (model
  evaluations vs dataset count, against linear and sqrt(N) curves)
- ``muse_maps``                              — musefuse_postprocess.py:99-174
  (per-spaxel posterior parameter / logZ maps)
"""

from __future__ import annotations

import json

import numpy as np


def posterior_weights(out: dict, d: int) -> np.ndarray:
    """Normalized posterior weights for dataset ``d`` from an output dict
    (columns of ``w`` + ``L``; checkoutput.py:29-33)."""
    w = out["w"][:, d].astype(np.float64) + out["L"][:, d].astype(np.float64)
    w[~np.isfinite(w)] = -np.inf
    p = np.exp(w - w.max())
    return p / p.sum()


def posterior_samples(out: dict, d: int, size: int = 1000, rng=None):
    """Equal-weight resampled posterior draws ``[size, ndim]``."""
    rng = rng or np.random.default_rng(0)
    p = posterior_weights(out, d)
    i = rng.choice(np.arange(len(p)), size=size, replace=True, p=p)
    return out["x"][i, d, :]


def analytic_nosignal_logZ(y: np.ndarray, noise_level: float = 0.01):
    """Evidence of the no-signal model: logZ0 = sum(-0.5 (y/sigma)^2)
    (plotevidences.py:17)."""
    return np.sum(-0.5 * (y / noise_level) ** 2, axis=0)


def bayes_factors(out: dict, y: np.ndarray, noise_level: float = 0.01):
    """log10 Bayes factors vs the no-signal model (plotevidences.py:20)."""
    logZ0 = analytic_nosignal_logZ(y, noise_level)
    return np.log10(np.exp(1.0)) * (out["logZ"] - logZ0)


def plot_evidences(out: dict, y, noise_level=0.01, path="plotevidences.pdf",
                   blim_clip=4.0):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    B = bayes_factors(out, y, noise_level)
    B = np.clip(B, None, blim_clip)
    plt.figure(figsize=(6, 4))
    bins = np.linspace(min(B.min(), -5), max(B.max() + 1, 5), 60)
    plt.hist(B, bins=bins, color="k", histtype="step", density=True)
    plt.xlabel("log10 Bayes factor B")
    plt.ylabel("Frequency")
    plt.savefig(path, bbox_inches="tight")
    plt.close()
    return B


def plot_posterior(out: dict, truth: dict | None = None, d: int = 0,
                   path="posterior.pdf", param_names=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = posterior_samples(out, d, size=2000)
    ndim = xs.shape[1]
    names = param_names or [f"p{j}" for j in range(ndim)]
    fig, axes = plt.subplots(1, ndim, figsize=(3 * ndim, 3))
    for j, ax in enumerate(np.atleast_1d(axes)):
        ax.hist(xs[:, j], bins=40, histtype="step", color="k")
        ax.set_xlabel(names[j])
        if truth and names[j] in truth:
            ax.axvline(np.atleast_1d(truth[names[j]])[d], color="r", ls=":")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return xs


def plot_scaling(stats_files, path="scaling.pdf"):
    """Model evaluations vs dataset count with linear / sqrt(N) guide curves
    (plotscaling.py:11-41) — the repository's headline claim."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    points = []
    for fn in stats_files:
        with open(fn) as fh:
            s = json.load(fh)
        points.append((s["ndata"], s["ndraws"], s.get("duration", 0)))
    points.sort()
    N = np.array([p[0] for p in points], float)
    draws = np.array([p[1] for p in points], float)
    plt.figure(figsize=(6, 4))
    plt.plot(N, draws, "o-", color="k", label="measured")
    plt.plot(N, draws[0] * N / N[0], ":", color="gray", label="linear")
    plt.plot(N, draws[0] * np.sqrt(N / N[0]), "--", color="r",
             label=r"$\sqrt{N}$")
    plt.xscale("log")
    plt.yscale("log")
    plt.xlabel("number of datasets N")
    plt.ylabel("model evaluations")
    plt.legend(loc="best")
    plt.savefig(path, bbox_inches="tight")
    plt.close()
    return N, draws


def muse_maps(out: dict, flat_positions, mask_shape, param_names=None,
              path_prefix="musemap"):
    """Per-spaxel posterior-mean parameter maps + logZ map
    (musefuse_postprocess.py:99-174). ``flat_positions`` are the fitted
    spaxels' positions on the flattened (ny*nx) field
    (MuseCube.flat_positions())."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ndata = out["logZ"].shape[0]
    ndim = out["x"].shape[2]
    names = param_names or [f"p{j}" for j in range(ndim)]
    ny, nx = mask_shape
    flat_positions = np.asarray(flat_positions)[:ndata]
    maps = {}
    for j in range(ndim):
        img = np.full(ny * nx, np.nan)
        for d in range(ndata):
            p = posterior_weights(out, d)
            img[flat_positions[d]] = (p * out["x"][:, d, j]).sum()
        maps[names[j]] = img.reshape(ny, nx)
    img = np.full(ny * nx, np.nan)
    img[flat_positions] = out["logZ"]
    maps["logZ"] = img.reshape(ny, nx)

    for name, img2d in maps.items():
        plt.figure(figsize=(5, 4))
        plt.imshow(img2d, origin="lower")
        plt.colorbar()
        plt.title(name)
        plt.savefig(f"{path_prefix}_{name}.pdf", bbox_inches="tight")
        plt.close()
    return maps
