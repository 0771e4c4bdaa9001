"""MUSE stellar-population model, jittable and batch-first.

Re-design of the reference model (``musefuse.py:160-346``): a 5-parameter
(Z, logSFtau, SFage, z, EBV) delayed-exponential star-formation-history
synthesis over a metallicity/age template grid, Calzetti extinction, and a
redshift interpolation onto the instrument wavelength grid.

TPU translation (survey §7 "MUSE model on TPU"):
- the per-metallicity template list becomes one dense tensor
  ``templates[nZ, n_ages, n_wl]`` gathered by a data-dependent index,
- the SFH weighting is a batched matvec ``sfh @ templates[iZ]`` (MXU),
- ``numpy.interp`` onto the shifted grid becomes ``jnp.interp`` (jittable),
- NaN handling moves into precomputed masks (likelihood side).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

# BC03-style age grid (years). The reference hardcodes this list and takes
# every second entry (musefuse.py:190); template files must carry one column
# per (subsampled) age. We build the canonical grid programmatically: the
# published grid is approximately log-spaced in blocks.
def default_age_grid() -> np.ndarray:
    pieces = [
        np.array([0.0]),
        10 ** np.arange(5.0, 6.0, 0.05),       # 1e5 .. 1e6, 20 steps
        10 ** np.arange(6.0, 7.6, 0.02),       # 1e6 .. ~4e7 fine block
        10 ** np.arange(7.6, 9.0, 0.05),
        np.arange(1.0e9, 2.01e10, 2.5e8),
    ]
    return np.concatenate(pieces)


_Z_GRID = np.log10([0.0001, 0.0004, 0.004, 0.008, 0.02, 0.05, 0.1])
_SFTAU_GRID = np.log10(np.array([1, 4, 10, 40, 100, 400, 1000, 4000]) * 1e6)
_SFAGE_MAX = 13.0


def calzetti_curve(wavelength_nm: np.ndarray) -> np.ndarray:
    """Calzetti (2000) attenuation k(lambda) (musefuse.py:257-266)."""
    wl = np.asarray(wavelength_nm, np.float64)
    out = np.zeros_like(wl)
    blue = wl < 630.0
    out[blue] = 2.659 * (
        -2.156 + 1.509e3 / wl[blue] - 0.198e6 / wl[blue] ** 2
        + 0.011e9 / wl[blue] ** 3
    ) + 4.05
    red = ~blue
    out[red] = 2.659 * (-1.857 + 1.040e3 / wl[red]) + 4.05
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MuseModelData:
    templates: Any      # [nZ, n_ages, n_wl] f32
    ages: Any           # [n_ages] f32 (years)
    age_weight: Any     # [n_ages - 1] f32
    model_wl: Any       # [n_wl] f32 (nm, ascending)
    calzetti: Any       # [n_wl] f32
    data_wl: Any        # [nspec] f32 (nm)
    z_grid: Any         # [nZ] log10 metallicities
    norm_index: Any     # scalar int32: normalization pixel on the model grid
    zlo: Any            # scalar: redshift prior bounds
    zhi: Any


def load_template_grid(filenames, ages=None, data_wl_nm=None,
                       zlo=0.0, zhi=0.5) -> MuseModelData:
    """Build the dense model tensor from per-metallicity template files
    (reference loadtxt loop, musefuse.py:173-179: column 0 = wavelength in
    Angstrom, columns 1.. = one spectrum per age)."""
    grids = []
    model_wl = None
    for fn in filenames:
        data = np.loadtxt(fn)
        model_wl = data[:, 0] / 10.0  # Angstrom -> nm (musefuse.py:255-256)
        grids.append(data[:, 1:].T)   # [n_ages, n_wl]
    templates = np.stack(grids)       # [nZ, n_ages, n_wl]
    n_ages = templates.shape[1]
    if ages is None:
        full = default_age_grid()[::2]
        if n_ages == len(full):
            ages = full
        else:  # subsample evenly across the whole age range
            ages = full[np.round(np.linspace(0, len(full) - 1, n_ages))
                        .astype(int)]
    ages = np.asarray(ages, np.float64)
    assert len(ages) == n_ages, (len(ages), n_ages)
    # normalize near 656nm rest frame (reference index 2050 on its grid)
    norm_index = int(np.argmin(np.abs(model_wl - 656.0)))
    return MuseModelData(
        templates=jnp.asarray(templates, jnp.float32),
        ages=jnp.asarray(ages, jnp.float32),
        age_weight=jnp.asarray(np.diff(ages), jnp.float32),
        model_wl=jnp.asarray(model_wl, jnp.float32),
        calzetti=jnp.asarray(calzetti_curve(model_wl), jnp.float32),
        data_wl=jnp.asarray(
            np.asarray(data_wl_nm if data_wl_nm is not None else model_wl),
            jnp.float32,
        ),
        z_grid=jnp.asarray(_Z_GRID, jnp.float32),
        norm_index=jnp.int32(norm_index),
        zlo=jnp.float32(zlo),
        zhi=jnp.float32(zhi),
    )


def muse_prior_transform(md: MuseModelData, u):
    """FULL model prior (musefuse.py:490-500): Z, logSFtau, SFage, z, EBV."""
    zg, tg = md.z_grid, jnp.asarray(_SFTAU_GRID, jnp.float32)
    return jnp.stack([
        u[0] * (zg[-1] - zg[0]) + zg[0],
        u[1] * (tg[-1] - tg[0]) + tg[0],
        u[2] * _SFAGE_MAX,
        u[3] * (md.zhi - md.zlo) + md.zlo,
        u[4] * 2.0,
    ])


def muse_prior_transform_zsol(md: MuseModelData, u):
    """ZSOL model prior (musefuse.py:502-510): logSFtau, SFage, z, EBV."""
    tg = jnp.asarray(_SFTAU_GRID, jnp.float32)
    return jnp.stack([
        u[0] * (tg[-1] - tg[0]) + tg[0],
        u[1] * _SFAGE_MAX,
        u[2] * (md.zhi - md.zlo) + md.zlo,
        u[3] * 2.0,
    ])


def predict_spectrum(md: MuseModelData, Z, logSFtau, sfage, z, EBV):
    """One model spectrum on the data wavelength grid (musefuse.py:268-346)."""
    # metallicity bin: largest grid Z <= Z (reference iZ selection, :224)
    iZ = jnp.clip(
        jnp.searchsorted(md.z_grid, Z, side="right") - 1, 0,
        md.z_grid.shape[0] - 1,
    )
    model_templates = md.templates[iZ]  # [n_ages, n_wl]

    SFtau = 10.0 ** logSFtau
    tsince = jnp.maximum(sfage * 1e9 - md.ages, 0.0)
    # sfh = t/tau^2 exp(-t/tau), normalized to max 1 (musefuse.py:237-239);
    # computed in log space so extreme sfage/tau corners do not underflow f32
    log_sfh = jnp.where(tsince > 0.0, jnp.log(jnp.maximum(tsince, 1e-30)),
                        -jnp.inf) - tsince / SFtau
    sfh = jnp.exp(log_sfh - jnp.max(log_sfh))
    sfh = jnp.where(jnp.isfinite(sfh), sfh, 0.0)

    w = sfh[:-1] * md.age_weight  # [n_ages - 1]
    template = jnp.dot(
        w, model_templates[:-1],
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [n_wl] — MXU matvec; HIGHEST: chi2 weights amplify model error
    template = template / (1e-10 + template[md.norm_index])
    template = template * 10.0 ** (-2.5 * md.calzetti * EBV)
    # redshift: sample the restframe model at data_wl / (1 + z)
    return jnp.interp(md.data_wl / (1.0 + z), md.model_wl, template)


def predict_batch(md: MuseModelData, x_batch, zsol: bool = False):
    """[B, nspec] model spectra for a parameter batch."""
    if zsol:
        def one(p):
            # fixed Z = 0.004 (Patricio2018; musefuse.py:540-543)
            return predict_spectrum(
                md, jnp.float32(np.log10(0.004)), p[0], p[1], p[2], p[3]
            )
    else:
        def one(p):
            return predict_spectrum(md, p[0], p[1], p[2], p[3], p[4])

    return jax.vmap(one)(x_batch)
