"""MUSE datacube end-to-end pipeline (reference ``musefuse.py`` driver).

Load a FITS cube (DATA flux + STAT variance), select spaxels by a ds9
region, screen bad spaxels and inflate noise in known-bad wavelength
windows, build the scale-marginalized many-spaxel Problem, run the joint
nested sampler, and write reference-schema outputs.
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from massivedatans_tpu.muse.fitsio import fits_open, get_hdu
from massivedatans_tpu.muse.regions import parse_region_mask

log = logging.getLogger("massivedatans_tpu")

# wavelength windows with known sky-subtraction residuals; the noise there is
# inflated so they are effectively masked (musefuse.py:130-134)
BAD_WINDOWS = [(1600, 1670), (1730, 1780), (1950, 2000),
               (2250, 2700), (2800, 3000)]


@dataclasses.dataclass
class MuseCube:
    wavelength_nm: np.ndarray  # [nspec]
    y: np.ndarray              # [nspec, D]
    var: np.ndarray            # [nspec, D]
    goodids: np.ndarray        # [D] spaxel ids within the region selection
    mask_shape: tuple          # (ny, nx) of the field
    region_mask: np.ndarray    # [ny, nx]

    def flat_positions(self) -> np.ndarray:
        """Flat (ny*nx) field positions of the fitted spaxels, for maps."""
        return np.where(self.region_mask.ravel())[0][self.goodids]


def screen_noise_outliers(var: np.ndarray, window: int = 10,
                          nsigma: float = 5.0) -> np.ndarray:
    """Rolling-median variance screening (musefuse.py:113-129; the reference
    computes this but ships with it disabled — enable via pipeline flag)."""
    nspec = var.shape[0]
    out = var.copy()
    for j in range(nspec):
        lo, hi = max(0, j - window), min(nspec, j + window)
        seg = var[lo:hi]
        med = np.median(seg, axis=0)
        meddiff = np.median(np.abs(med[None, :] - seg), axis=0)
        bad = np.abs(var[j] - med) > nsigma * meddiff
        if bad.any():
            out[max(0, j - 3):min(nspec, j + 4), bad] += 1e10
    return out


def load_muse_cube(cube_path: str, region_path: str | None = None,
                   maxdata: int = 0, nspec_max: int = 3600,
                   screen_outliers: bool = False,
                   bad_windows=None) -> MuseCube:
    hdus = fits_open(cube_path)
    data_hdu = get_hdu(hdus, "DATA")
    stat_hdu = get_hdu(hdus, "STAT")
    y = np.asarray(data_hdu.data, np.float64)[:nspec_max]
    var = np.asarray(stat_hdu.data, np.float64)[:nspec_max]
    nspec, ny, nx = y.shape
    wavelength = (
        float(data_hdu.header.get("CD3_3", 1.25)) * np.arange(nspec)
        + float(data_hdu.header.get("CRVAL3", 4750.0))
    ) / 10.0  # Angstrom -> nm (musefuse.py:89,255)

    if region_path is not None:
        with open(region_path) as fh:
            mask = parse_region_mask(fh.read(), (ny, nx))
    else:
        mask = np.ones((ny, nx), bool)

    y = y.reshape(nspec, -1)[:, mask.ravel()]
    var = var.reshape(nspec, -1)[:, mask.ravel()]
    good = np.isfinite(var).all(axis=0)  # musefuse.py:92-95
    goodids = np.where(good)[0]
    if maxdata:
        goodids = goodids[:maxdata]
    y = y[:, goodids]
    var = var[:, goodids]
    assert (var > 0).all(), "non-positive variances in STAT"

    if screen_outliers:
        var = screen_noise_outliers(var)
    for lo, hi in (bad_windows if bad_windows is not None else BAD_WINDOWS):
        if lo < nspec:
            var[lo:min(hi, nspec)] += 1e10

    log.info("MUSE cube: %d spectral bins, %d/%d spaxels selected",
             nspec, len(goodids), mask.sum())
    return MuseCube(wavelength_nm=wavelength, y=y, var=var,
                    goodids=goodids, mask_shape=(ny, nx), region_mask=mask)


def run_musefit(cube_path: str, region_path: str, zlo: float, zhi: float,
                template_files, model: str = "FULL", maxdata: int = 0,
                nlive: int = 400, tolerance: float = 0.5,
                max_samples: int = 100000, out_prefix: str | None = None,
                cfg_overrides: dict | None = None, progress: bool = True,
                checkpoint_dir: str | None = None, mesh=None,
                ages_file: str | None = None,
                max_chunks: int | None = None,
                checkpoint_every: int = 10,
                dispatch_target_s: float | None = None,
                bad_windows=None):
    """Reference musefuse.py main flow; returns (result, problem, cube).

    ``bad_windows``: wavelength-window noise inflation passed through to
    :func:`load_muse_cube` (None = the real-MUSE defaults). Synthetic
    validation cubes have no sky residuals and pass ``[]`` so the
    evidence/chi2 accounting covers every bin."""
    from massivedatans_tpu.config import RunConfig
    from massivedatans_tpu.muse.likelihood import make_muse_problem
    from massivedatans_tpu.muse.model import load_template_grid
    from massivedatans_tpu.ns.integrator import multi_nested_integrator

    cube = load_muse_cube(cube_path, region_path, maxdata=maxdata,
                          bad_windows=bad_windows)
    ages = np.loadtxt(ages_file) if ages_file else None
    md = load_template_grid(template_files, ages=ages,
                            data_wl_nm=cube.wavelength_nm,
                            zlo=zlo, zhi=zhi)
    problem = make_muse_problem(md, cube.y, cube.var, zsol=(model == "ZSOL"))
    cfg = RunConfig.from_env(
        nlive_points=nlive, tolerance=tolerance, max_samples=max_samples,
        **(cfg_overrides or {}),
    )
    result = multi_nested_integrator(problem, cfg, progress=progress,
                                     mesh=mesh,
                                     checkpoint_dir=checkpoint_dir,
                                     max_chunks=max_chunks,
                                     checkpoint_every=checkpoint_every,
                                     dispatch_target_s=dispatch_target_s)

    if out_prefix is None:
        suffix = "_zsol_" if model == "ZSOL" else "_full_"
        out_prefix = f"{cube_path}{suffix}.out_{problem.ndata}"
    from massivedatans_tpu.io.hdf5io import write_results

    write_results(out_prefix, result)
    # extra MUSE datasets (musefuse.py:661-663)
    import h5py

    with h5py.File(out_prefix + ".hdf5", "a") as f:
        f.create_dataset("fiberids", data=cube.goodids,
                         compression="gzip", shuffle=True)
        f.create_dataset("duration", data=result.duration)
        f.create_dataset("ndata", data=problem.ndata)
    return result, problem, cube
