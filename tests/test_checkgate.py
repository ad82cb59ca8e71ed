"""Meta-tests for the local correctness gate (tools/check.py).

The gate must be strictly STRONGER than the driver's value hash: any
frame pair that would hash apart at the driver must fail ``compare``
here.  Two consecutive rounds (r4 HUGEINT→float64, r5 DecimalType→
Decimal-object) shipped driver failures that the then-current gate
passed, so each channel gets a synthetic regression test.
"""

from __future__ import annotations

import decimal

import pandas as pd

from tools.check import _eq, compare


def test_decimal_vs_float_column_fails():
    # r5 channel: Spark DecimalType -> object column of decimal.Decimal;
    # DuckDB -> float64.  Equal values, different serialized hash.
    s = pd.DataFrame({"k": ["a", "b"], "v": [decimal.Decimal("1.017609"),
                                            decimal.Decimal("0.994040")]})
    d = pd.DataFrame({"k": ["a", "b"], "v": [1.017609, 0.994040]})
    problems = compare("synthetic", s, d)
    assert problems, "Decimal-object vs float64 column must fail the gate"
    assert any("DTYPE KIND MISMATCH" in p for p in problems)


def test_int_vs_float_column_fails():
    # r4 channel: DuckDB HUGEINT -> float64 vs Spark int64.
    s = pd.DataFrame({"n": pd.Series([1, 2], dtype="int64")})
    d = pd.DataFrame({"n": pd.Series([1.0, 2.0], dtype="float64")})
    problems = compare("synthetic", s, d)
    assert any("DTYPE KIND MISMATCH" in p for p in problems)


def test_eq_rejects_decimal_float_cross_type():
    assert not _eq(decimal.Decimal("1.5"), 1.5)
    assert not _eq(1.5, decimal.Decimal("1.5"))
    assert _eq(decimal.Decimal("1.5"), decimal.Decimal("1.5"))
    assert _eq(1.5, 1.5)


def test_matching_frames_pass():
    s = pd.DataFrame({"k": ["a", "b"], "v": [1.5, 2.5]})
    d = pd.DataFrame({"v": [2.5, 1.5], "k": ["b", "a"]})  # order-insensitive
    assert compare("synthetic", s, d) == []


def test_object_strings_both_sides_pass():
    # Both object-kind (strings) must NOT be flagged by the kind guard.
    s = pd.DataFrame({"k": ["a", "b"]})
    d = pd.DataFrame({"k": ["b", "a"]})
    assert compare("synthetic", s, d) == []
