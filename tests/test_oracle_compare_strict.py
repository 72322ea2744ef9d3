"""The self-check comparator must be a strict superset of the driver's
hash (VERDICT r9 items 1b/3).

The driver canonicalizes raw values: it distinguishes -0.0 from 0.0
(the r9 q_embed_covariance single-cell fail) and any mantissa-level
drift. The pre-r10 comparator collapsed both (`round(v + 0.0, 9)`),
which is why 268/268 self-sweeps could not see the one red driver cell.
These tests pin the strictness so a regression of the comparator is
caught at authoring time.
"""

from __future__ import annotations

import math

from tests.oracle_compare import _norm_cell, normalize


def test_signed_zero_distinguished():
    # the exact r9 failure mode: Spark round() emits 0.0, DuckDB -0.0
    assert _norm_cell(0.0) != _norm_cell(-0.0)


def test_poisoned_1e9_perturbation_detected():
    # a 1e-9-scale engine divergence below the old 9-dp rounding must
    # now diff (the driver's exact hash would catch it)
    a, b = 0.123456789123, 0.123456789123 + 1e-12
    assert a != b  # the perturbation is representable
    assert _norm_cell(a) != _norm_cell(b)


def test_nan_still_canonical():
    assert _norm_cell(float("nan")) == _norm_cell(float("nan"))


def test_equal_floats_still_match():
    v = 1234.567891
    assert _norm_cell(v) == _norm_cell(v + 0.0)


def test_normalize_rowset_diff_on_signed_zero():
    s = normalize([(1, 0.0)], ["i", "cov"])
    d = normalize([(1, -0.0)], ["i", "cov"])
    assert s != d


def test_plus_zero_convention_normalizes():
    # the repo's output convention: round(...) + 0.0 collapses -0.0
    assert math.copysign(1.0, -0.0 + 0.0) > 0
    assert _norm_cell(-0.0 + 0.0) == _norm_cell(0.0)
