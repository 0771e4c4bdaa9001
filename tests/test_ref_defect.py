"""The reference's per-index evidence misassignment, pinned by artifact.

``ref_defect.json`` (tools/ref_defect.py) compares the reference
implementation's recorded horns runs (baseline_ref.json) against the
brute-force quadrature oracle (quad_logZ.json). The recorded pattern:

- ndata=10: the reference's per-index evidences agree with quadrature
  (no cut_down-era misassignment at this scale);
- ndata=100: per-index residuals reach |dlogZ| > 10 (evidences assigned
  to the wrong dataset indices after cut_down events), while the SORTED
  population stays consistent — the defect is (mostly) a permutation.

This explains bench.py's ``logZ_vs_reference.frac_within_3sigma`` ~ 0.08:
index-wise disagreement with the reference at ndata=100 is evidence of the
REFERENCE's defect, not ours — our per-index values pass the same oracle
(tests/test_quadrature_oracle.py, bench logZ_vs_quadrature).
"""

import json
import os

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
ARTIFACT = os.path.join(ROOT, "ref_defect.json")
QUAD = os.path.join(ROOT, "quad_logZ.json")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(ARTIFACT):
        pytest.skip("ref_defect.json not built (tools/ref_defect.py)")
    with open(ARTIFACT) as fh:
        return json.load(fh)


def test_quadrature_oracle_converged():
    if not os.path.exists(QUAD):
        pytest.skip("quad_logZ.json not built (tools/quad_oracle.py)")
    with open(QUAD) as fh:
        quad = json.load(fh)
    assert quad["ndata"] >= 32
    # fine vs coarse grid agreement far below sampler MC error (~0.45)
    assert quad["conv_max_abs_diff"] < 0.1


def test_reference_ndata10_passes_per_index(artifact):
    r = artifact["runs"]["horns_n1000_ndata10_nlive400"]
    assert r["max_abs_dlogZ"] <= 1.5, r


def test_reference_ndata100_fails_per_index_but_not_sorted(artifact):
    r = artifact["runs"]["horns_n1000_ndata100_nlive400"]
    # the defect: per-index evidences off by >> any MC error...
    assert r["max_abs_dlogZ"] > 10.0, r
    assert r["frac_within_3sigma"] < 0.5, r
    # ...while the sorted population stays within a few x MC error —
    # i.e. values were (mostly) permuted across datasets, not invented
    assert r["median_abs_dlogZ_sorted"] < 2.0, r


def test_artifact_matches_rebuild():
    """The committed artifact is reproducible from its inputs."""
    if not (os.path.exists(ARTIFACT) and os.path.exists(QUAD)):
        pytest.skip("artifacts not built")
    import sys

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    try:
        from ref_defect import build
    finally:
        sys.path.pop(0)
    fresh = build(ROOT)
    with open(ARTIFACT) as fh:
        committed = json.load(fh)
    for key, r in fresh["runs"].items():
        assert key in committed["runs"]
        np.testing.assert_allclose(
            r["abs_dlogZ_per_index"],
            committed["runs"][key]["abs_dlogZ_per_index"], atol=1e-3,
        )
