"""Synthetic spectra generators (reference layer L0, survey §1).

Functional re-implementations of the seven reference generator scripts —
``gensimple_horns.py``, ``gennothing.py``, ``gensimple.py``,
``gensimple_bright.py``, ``gensimple_faint.py``, ``gen.py``,
``gen_realistic.py`` — each returning a dict of arrays matching the
reference's HDF5 schema (``x``, ``y`` and truth parameters) so outputs are
drop-in compatible. Seeding follows the reference convention seed = N.
"""

from __future__ import annotations

import numpy as np


def _gauss(x, A, mu, sig):
    """Batched Gaussian line (gensimple_horns.py:8-13): returns [nx, N]."""
    A = np.atleast_1d(A)[None, :]
    mu = np.atleast_1d(mu)[None, :]
    sig = np.atleast_1d(sig)[None, :]
    return A * np.exp(-0.5 * ((mu - x[:, None]) / sig) ** 2)


def gen_horns(N: int, seed=None) -> dict:
    """Single narrow line, arctan-uniform redshift, powerlaw amplitudes
    (gensimple_horns.py:15-39)."""
    rng = np.random.RandomState(N if seed is None else seed)
    x = np.linspace(400, 800, 200)
    z = np.arctan(rng.uniform(-np.pi, np.pi, size=N)) * 0.1
    rest_wave = 656
    width_narrow = 5.0 * np.ones(N)
    mean_narrow = rest_wave * (1 + z)
    noise_level = 0.01
    signal_level = 0.02 / rng.power(3, size=N)
    y = _gauss(x, signal_level, mean_narrow, width_narrow)
    y = y + rng.normal(0, noise_level, size=y.shape)
    return dict(
        x=x, y=y, z=z, mean_narrow=mean_narrow, width_narrow=width_narrow,
        height_narrow=signal_level, noise_level=noise_level,
    )


def gen_nothing(N: int, seed=None) -> dict:
    """Pure noise for evidence calibration (gennothing.py:7-12)."""
    rng = np.random.RandomState(N if seed is None else seed)
    x = np.linspace(400, 800, 200)
    noise_level = 0.01
    y = rng.normal(0, noise_level, size=(len(x), N))
    return dict(x=x, y=y, noise_level=noise_level)


def _gen_two_component(N, rng, snr_narrow, snr_broad, broad_frac):
    """Narrow+broad two-Gaussian AGN-like spectra (gensimple*.py family)."""
    x = np.linspace(400, 800, 200)
    z = rng.beta(2, 7, size=N) * 0.5
    rest_wave = 656
    noise_level = 0.01
    mean = rest_wave * (1 + z)
    width_narrow = rng.uniform(0.5, 2.0, size=N)
    width_broad = rng.uniform(10, 40, size=N)
    height_narrow = noise_level * snr_narrow * (0.5 + rng.power(2, size=N))
    has_broad = rng.uniform(size=N) < broad_frac
    height_broad = noise_level * snr_broad * rng.power(2, size=N) * has_broad
    y = _gauss(x, height_narrow, mean, width_narrow)
    y = y + _gauss(x, height_broad, mean, width_broad)
    y = y + rng.normal(0, noise_level, size=y.shape)
    return dict(
        x=x, y=y, z=z, mean_narrow=mean, width_narrow=width_narrow,
        height_narrow=height_narrow, width_broad=width_broad,
        height_broad=height_broad, noise_level=noise_level,
    )


def gen_simple(N: int, seed=None) -> dict:
    rng = np.random.RandomState(N if seed is None else seed)
    return _gen_two_component(N, rng, snr_narrow=5, snr_broad=3, broad_frac=0.5)


def gen_simple_bright(N: int, seed=None) -> dict:
    rng = np.random.RandomState(N if seed is None else seed)
    return _gen_two_component(N, rng, snr_narrow=20, snr_broad=10, broad_frac=0.5)


def gen_simple_faint(N: int, seed=None) -> dict:
    rng = np.random.RandomState(N if seed is None else seed)
    return _gen_two_component(N, rng, snr_narrow=2, snr_broad=1, broad_frac=0.5)


def gen_agn(N: int, seed=None) -> dict:
    """gen.py equivalent: AGN-like mix on the standard grid."""
    rng = np.random.RandomState(N if seed is None else seed)
    return _gen_two_component(N, rng, snr_narrow=10, snr_broad=5, broad_frac=0.3)


def gen_realistic(N: int, seed=None) -> dict:
    """1000-pixel grid, type1/type2 mix (gen_realistic.py:16-50)."""
    rng = np.random.RandomState(N if seed is None else seed)
    x = np.linspace(400, 800, 1000)
    z = rng.beta(2, 7, size=N) * 0.5
    rest_wave = 656
    noise_level = 0.01
    mean = rest_wave * (1 + z)
    is_type1 = rng.uniform(size=N) < 0.5
    width_narrow = rng.uniform(0.3, 1.5, size=N)
    width_broad = rng.uniform(15, 50, size=N)
    height_narrow = noise_level * (2 + 18 * rng.power(3, size=N))
    height_broad = noise_level * (1 + 9 * rng.power(3, size=N)) * is_type1
    y = _gauss(x, height_narrow, mean, width_narrow)
    y = y + _gauss(x, height_broad, mean, width_broad)
    y = y + rng.normal(0, noise_level, size=y.shape)
    return dict(
        x=x, y=y, z=z, is_type1=is_type1, width_narrow=width_narrow,
        height_narrow=height_narrow, width_broad=width_broad,
        height_broad=height_broad, noise_level=noise_level,
    )


GENERATORS = {
    "horns": gen_horns,
    "nothing": gen_nothing,
    "simple": gen_simple,
    "bright": gen_simple_bright,
    "faint": gen_simple_faint,
    "agn": gen_agn,
    "realistic": gen_realistic,
}

# reference output filename stems (gensimple_horns.py:61, gennothing.py:14, ...)
FILENAME_STEMS = {
    "horns": "data_widths_{N}.hdf5",
    "nothing": "data_nothing_{N}.hdf5",
    "simple": "data_simple_{N}.hdf5",
    "bright": "data_bright_{N}.hdf5",
    "faint": "data_faint_{N}.hdf5",
    "agn": "data_agn_{N}.hdf5",
    "realistic": "data_realistic_{N}.hdf5",
}


def save_dataset(data: dict, path: str):
    import h5py

    with h5py.File(path, "w") as f:
        for k, v in data.items():
            arr = np.asarray(v)
            if arr.ndim == 0:
                f.create_dataset(k, data=arr)
            else:
                f.create_dataset(k, data=arr, compression="gzip", shuffle=True)
