"""Exact-equality tests for the data generators.

Each test re-derives the reference generator script's numpy.random draw
sequence *inline* (an independent transcription of the cited script, not an
import of the package code) and asserts the package generator reproduces the
arrays bit-for-bit. This guards the draw ORDER — the subtle part — as well
as the distributions and constants.
"""

import numpy as np
import pytest

from massivedatans_tpu.datagen import generators as G


def _ref_gauss_z(x, z, A, mu, sig):
    # gensimple.py:8-14: row-vector x, column-vector params, x/(1+z)
    xT = x.reshape((1, -1))
    zT = z.reshape((-1, 1))
    AT = A.reshape((-1, 1))
    muT = mu.reshape((-1, 1))
    sigT = sig.reshape((-1, 1))
    return AT * np.exp(-0.5 * ((muT - xT / (1.0 + zT)) / sigT) ** 2)


def _ref_gauss(x, A, mu, sig):
    # gensimple_horns.py:8-13 (no redshift of the data axis)
    xT = x.reshape((1, -1))
    AT = A.reshape((-1, 1))
    muT = mu.reshape((-1, 1))
    sigT = sig.reshape((-1, 1))
    return AT * np.exp(-0.5 * ((muT - xT) / sigT) ** 2)


def _columnwise_noise_add(rng, y, noise_level):
    # gensimple.py:55-57: per-dataset sequential noise draws
    for i in range(y.shape[1]):
        y[:, i] += rng.normal(0, noise_level, size=y.shape[0])
    return y


def test_horns_exact():
    N = 23
    # gensimple_horns.py:15-39
    np.random.seed(N)
    x = np.linspace(400, 800, 200)
    z = np.arctan(np.random.uniform(-np.pi, np.pi, size=N)) * 0.1
    rest_wave = 656
    width_narrow = 5.0 * np.ones(N)
    mean_narrow = rest_wave * (1 + z)
    signal_level = 0.02 / np.random.power(3, size=N)
    ym = _ref_gauss(x, signal_level, mean_narrow, width_narrow).T
    y = _columnwise_noise_add(np.random, ym.copy(), 0.01)

    out = G.gen_horns(N)
    np.testing.assert_array_equal(out["x"], x)
    np.testing.assert_array_equal(out["z"], z)
    np.testing.assert_array_equal(out["height_narrow"], signal_level)
    np.testing.assert_array_equal(out["y"], y)


def test_nothing_exact():
    N = 17
    np.random.seed(N)
    x = np.linspace(400, 800, 200)
    y = np.random.normal(0, 0.01, size=(len(x), N))
    out = G.gen_nothing(N)
    np.testing.assert_array_equal(out["x"], x)
    np.testing.assert_array_equal(out["y"], y)


def test_simple_exact():
    N = 19
    # gensimple.py:16-57
    np.random.seed(N)
    x = np.linspace(400, 800, 200)
    z = np.random.beta(2.0, 7.0, size=N) * 1
    rest_wave = 440
    width_broad = 4000 * rest_wave / 300000 * np.ones(N)
    width_narrow = 400 * rest_wave / 300000 * np.ones(N)
    mean_broad = rest_wave * np.ones(N)
    mean_narrow = rest_wave * np.ones(N)
    signal_level = np.random.normal(0.5, 0.5, size=10 * N)
    signal_level = signal_level[signal_level > 0.2][:N]
    height_broad = 10**-1 * signal_level
    height_narrow = signal_level
    ym = _ref_gauss_z(x, z, height_broad, mean_broad, width_broad)
    ym += _ref_gauss_z(x, z, height_narrow, mean_narrow, width_narrow)
    ym = np.transpose(ym)
    y = _columnwise_noise_add(np.random, ym.copy(), 0.01)

    out = G.gen_simple(N)
    np.testing.assert_array_equal(out["z"], z)
    np.testing.assert_array_equal(out["height_narrow"], height_narrow)
    np.testing.assert_array_equal(out["height_broad"], height_broad)
    np.testing.assert_array_equal(out["width_broad"], width_broad)
    np.testing.assert_array_equal(out["width_narrow"], width_narrow)
    np.testing.assert_array_equal(out["y"], y)


def test_bright_exact():
    N = 11
    # gensimple_bright.py:17-50
    np.random.seed(N)
    x = np.linspace(400, 800, 200)
    z = np.zeros(N) + 0.01
    rest_wave = 440
    width_broad = 4000 * rest_wave / 300000 * np.ones(N)
    width_narrow = 400 * rest_wave / 300000 * np.ones(N)
    signal_level = np.ones(N) * 0.2
    height_broad = 10**-1 * signal_level
    height_narrow = signal_level
    ym = _ref_gauss_z(x, z, height_broad, rest_wave * np.ones(N), width_broad)
    ym += _ref_gauss_z(x, z, height_narrow, rest_wave * np.ones(N), width_narrow)
    ym = np.transpose(ym)
    y = _columnwise_noise_add(np.random, ym.copy(), 0.01)

    out = G.gen_simple_bright(N)
    np.testing.assert_array_equal(out["z"], z)
    np.testing.assert_array_equal(out["y"], y)


def test_faint_exact():
    N = 13
    # gensimple_faint.py:17-52
    np.random.seed(N)
    x = np.linspace(400, 800, 200)
    z = np.random.beta(2.0, 7.0, size=N) * 1
    rest_wave = 440
    width_broad = 4000 * rest_wave / 300000 * np.ones(N)
    width_narrow = 400 * rest_wave / 300000 * np.ones(N)
    signal_level = np.random.normal(0.2, 0.2, size=10 * N)
    signal_level = signal_level[signal_level > 0.1][:N]
    height_broad = 10**-1 * signal_level
    height_narrow = signal_level
    ym = _ref_gauss_z(x, z, height_broad, rest_wave * np.ones(N), width_broad)
    ym += _ref_gauss_z(x, z, height_narrow, rest_wave * np.ones(N), width_narrow)
    ym = np.transpose(ym)
    y = _columnwise_noise_add(np.random, ym.copy(), 0.01)

    out = G.gen_simple_faint(N)
    np.testing.assert_array_equal(out["z"], z)
    np.testing.assert_array_equal(out["height_narrow"], height_narrow)
    np.testing.assert_array_equal(out["y"], y)


def test_agn_exact():
    N = 29
    # gen.py:15-50 (seed is hardcoded 1)
    np.random.seed(1)
    x = np.linspace(400, 800, 200)
    z = np.random.beta(2, 30, size=N) * 2
    rest_wave = 440
    width_broad = 10 ** np.random.normal(3, 0.2, size=N) * rest_wave / 300000
    width_narrow = 10 ** np.random.normal(1, 0.2, size=N) * rest_wave / 300000
    signal_level = np.random.exponential(size=N) * 10
    is_type1 = np.random.uniform(size=N) < 0.5
    height_broad = np.where(
        is_type1,
        10 ** np.random.normal(0, 0.2, size=N),
        10 ** np.random.normal(-2, 0.2, size=N),
    ) * signal_level
    height_narrow = signal_level
    ym = _ref_gauss_z(x, z, height_broad, rest_wave * np.ones(N), width_broad)
    ym += _ref_gauss_z(x, z, height_narrow, rest_wave * np.ones(N), width_narrow)
    ym = np.transpose(ym)
    y = np.random.normal(0, 0.01, size=ym.shape) + ym  # gen.py:50: one block

    out = G.gen_agn(N)
    np.testing.assert_array_equal(out["z"], z)
    np.testing.assert_array_equal(out["width_broad"], width_broad)
    np.testing.assert_array_equal(out["width_narrow"], width_narrow)
    np.testing.assert_array_equal(out["height_broad"], height_broad)
    np.testing.assert_array_equal(out["y"], y)


def test_realistic_exact():
    N = 37
    # gen_realistic.py:16-57: always 10000 generated with seed 1, truncated
    np.random.seed(1)
    x = np.linspace(400, 800, 1000)
    NFULL = 10000
    z = np.random.beta(2, 30, size=NFULL) * 2
    rest_wave = 440
    width_broad = 10 ** np.random.normal(3, 0.2, size=NFULL) * rest_wave / 300000
    width_narrow = 10 ** np.random.normal(1, 0.2, size=NFULL) * rest_wave / 300000
    signal_level = 1.0 / (np.random.power(1, size=NFULL) * 100 + 2)
    is_type1 = np.random.uniform(size=NFULL) < 0.5
    height_broad = np.where(
        is_type1,
        10 ** np.random.normal(0, 0.2, size=NFULL),
        10 ** np.random.normal(-2, 0.2, size=NFULL),
    ) * signal_level
    height_narrow = signal_level
    ym = _ref_gauss_z(x, z, height_broad, rest_wave * np.ones(NFULL), width_broad)
    ym += _ref_gauss_z(x, z, height_narrow, rest_wave * np.ones(NFULL), width_narrow)
    ym = np.transpose(ym)
    y = (np.random.normal(0, 0.01, size=ym.shape) + ym)[:, :N]

    out = G.gen_realistic(N)
    assert out["y"].shape == (1000, N)
    assert out["z"].shape == (NFULL,)  # truth arrays stay full-length
    np.testing.assert_array_equal(out["z"], z)
    np.testing.assert_array_equal(out["y"], y)


def test_filename_stems():
    # reference output names (gensimple.py:64, gen.py:59, ...)
    assert G.FILENAME_STEMS["simple"].format(N=5) == "data_5.hdf5"
    assert G.FILENAME_STEMS["agn"] == "data.hdf5"
    assert G.FILENAME_STEMS["horns"].format(N=7) == "data_widths_7.hdf5"


@pytest.mark.parametrize("name", sorted(G.GENERATORS))
def test_all_generators_return_contract(name):
    out = G.GENERATORS[name](8)
    assert out["y"].shape[0] == len(out["x"])
    assert out["y"].shape[1] == 8
    assert out["noise_level"] == 0.01
    assert np.isfinite(out["y"]).all()
