"""CLI surface tests: gen -> fit -> check -> refine on a tiny problem.

The reference has no CLI tests (no tests at all, survey §4); these pin the
argument surface and output schema of the one entry point users drive.
"""

import os

import numpy as np
import pytest

from massivedatans_tpu import cli


@pytest.mark.slow
def test_gen_fit_check_refine_roundtrip(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    cli.main(["gen", "horns", "50", "--out", "d.hdf5"])
    monkeypatch.setenv("NLIVE_POINTS", "50")
    monkeypatch.setenv("MAXSAMPLES", "250")
    cli.main(["fit", "d.hdf5", "4", "--quiet"])
    out_file = "d.hdf5_MLFRIENDS_nlive50_4.out8.hdf5"
    assert os.path.exists(out_file)
    assert os.path.exists("d.hdf5_MLFRIENDS_nlive50_4.out8.stats.json")

    cli.main(["check", out_file, "--max-datasets", "2"])
    text = capsys.readouterr().out
    assert "logZ[0]" in text and "dataset 1:" in text

    cli.main(["plot-posterior", out_file, "--out", "post.pdf"])
    assert os.path.exists("post.pdf")
    cli.main(["plot-muse-posterior", out_file, "--min-finite", "10",
              "--size", "500", "--prefix", "mp"])
    assert os.path.exists("mp_1.pdf")

    cli.main(["refine", "d.hdf5", out_file,
              "--num-warmup", "40", "--num-samples", "40",
              "--vi-steps", "60", "--max-datasets", "2"])
    text = capsys.readouterr().out
    assert "HMC: mean accept" in text
    assert "VI: median |logZ_IW - logZ_NS|" in text


def test_runconfig_env_flags(monkeypatch):
    """Full reference env-flag surface (survey §5 config inventory)."""
    from massivedatans_tpu.config import RunConfig

    monkeypatch.setenv("NLIVE_POINTS", "123")
    monkeypatch.setenv("SUPERSET_DRAWS", "7")
    monkeypatch.setenv("MAXSAMPLES", "5000")
    monkeypatch.setenv("MINSAMPLES", "10")
    monkeypatch.setenv("CONSTRAINER", "SUPFRIENDS")
    monkeypatch.setenv("USE_GRAPH", "0")
    cfg = RunConfig.from_env()
    assert cfg.nlive_points == 123
    assert cfg.nsuperset_draws == 7
    assert cfg.max_samples == 5000
    assert cfg.min_samples == 10
    assert cfg.constrainer == "SUPFRIENDS"
    assert cfg.use_groups is False
    # overrides beat env
    assert RunConfig.from_env(nlive_points=9).nlive_points == 9


def test_shelf_sparkline():
    """Reference shelf_status parity (multi_nested_sampler.py:26-36)."""
    from massivedatans_tpu.utils.progress import shelf_sparkline

    s = shelf_sparkline([0, 4, 8], capacity=8)
    assert len(s) == 3
    assert s[0] == " " and s[2] == "█"
    # large D downsampled to the display width
    s = shelf_sparkline(np.arange(1000) % 9, capacity=8, width=64)
    assert len(s) == 64
    assert shelf_sparkline([], 8) == ""
