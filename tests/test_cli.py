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

    cli.main(["refine", "d.hdf5", out_file,
              "--num-warmup", "40", "--num-samples", "40",
              "--vi-steps", "60", "--max-datasets", "2"])
    text = capsys.readouterr().out
    assert "HMC: mean accept" in text
    assert "VI: median |logZ_IW - logZ_NS|" in text
