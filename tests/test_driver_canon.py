"""The local canon must reproduce the driver's round-1 failure classes
(VERDICT.md "What's wrong"): int64-vs-float64 hash mismatch, Decimal-vs-
float mismatch, and unhashable list cells.  If these stop failing, the
local harness has drifted from the driver again.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
import pytest

from tools.driver_canon import canon_frame, compare_frames


def test_int_vs_float_sum_dtype_mismatch():
    # DuckDB SUM(int) → HUGEINT → float64; Spark → int64.  Must differ.
    spark_side = pd.DataFrame({"total": pd.array([1384], dtype="int64")})
    duck_side = pd.DataFrame({"total": pd.array([1384.0], dtype="float64")})
    assert compare_frames(spark_side, duck_side)


def test_decimal_vs_float_mismatch():
    spark_side = pd.DataFrame({"price": [Decimal("12.30")]})
    duck_side = pd.DataFrame({"price": [12.30]})
    assert compare_frames(spark_side, duck_side)


def test_list_cells_raise_like_driver():
    pdf = pd.DataFrame({"a": [[1, 2], [3]], "b": [1, 2]})
    with pytest.raises(TypeError):
        canon_frame(pdf)


def test_identical_frames_match():
    a = pd.DataFrame({"x": [2, 1], "y": ["b", "a"]})
    b = pd.DataFrame({"y": ["a", "b"], "x": [1, 2]})
    assert not compare_frames(a, b)


def test_timestamp_unit_difference_tolerated():
    # Spark toPandas gives ns, DuckDB gives us — driver r1 passed these.
    a = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"]).astype("datetime64[ns]")})
    b = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"]).astype("datetime64[us]")})
    assert not compare_frames(a, b)
