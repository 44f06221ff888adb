"""Byte-identical replica of the driver's correctness canonicalization.

Round-1 lesson (VERDICT.md "What's wrong"): the driver canonicalizes results
through *pandas* — ``spark_df.toPandas()`` vs ``duckdb_result.df()``,
``sort_values`` over every column, then a dtype-sensitive value hash.  The
repo's old repr-based canon silently papered over exactly the three failure
classes the driver caught:

* DuckDB ``SUM(int)`` → HUGEINT → float64 vs Spark int64 (``1384.0`` ≠ ``1384``)
* Spark DecimalType → ``Decimal('..')`` objects vs DuckDB float64
* list/map cells → pandas ``sort_values`` raises ``unhashable type: 'list'``

This module reproduces those behaviors: comparison goes through pandas
frames, ``sort_values`` is allowed to raise (a harness error, exactly like
the driver records), and numeric values keep their Python-type identity in
the canonical form so an int/float divergence is a mismatch.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal
from typing import Any

import pandas as pd


def canon_frame(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Driver-equivalent canonical form of a pandas result frame.

    Columns sorted by name, rows sorted by every column (raises on
    unhashable cells — deliberately, matching the driver), cells normalized
    to type-tagged strings.
    """
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return [
        tuple(_norm(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def _norm(v: Any) -> str:
    """Type-tagged scalar repr: int64 1384 and float64 1384.0 must differ."""
    if v is None:
        return "None"
    if isinstance(v, Decimal):
        return repr(v)  # Decimal('…') — intentionally ≠ float repr
    if isinstance(v, (bool,)) or type(v).__name__ == "bool_":
        return repr(bool(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # The driver errors before reaching here (sort_values raises); kept
        # for single-row frames that skip the sort.
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if pd.api.types.is_scalar(v):
        try:
            if pd.isna(v):
                return "NaN" if isinstance(v, float) else "None"
        except (TypeError, ValueError):
            pass
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    # Date/timestamp normalization: Spark DATE → datetime.date, DuckDB DATE
    # → midnight Timestamp; the driver hashes these as EQUAL (fn_date passed
    # round 1), so midnight timestamps canonicalize to their date.
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None and v.time() == _dt.time(0, 0):
            return v.date().isoformat()
        return str(v)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, int):
        return repr(v)
    return str(v)


def compare_frames(spdf: pd.DataFrame, dpdf: pd.DataFrame) -> list[str]:
    """Return the list of driver-visible problems (empty = hash match)."""
    problems: list[str] = []
    if sorted(spdf.columns) != sorted(dpdf.columns):
        problems.append(
            f"columns spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}"
        )
        return problems
    if len(spdf) != len(dpdf):
        problems.append(f"rowcount spark={len(spdf)} duck={len(dpdf)}")
        return problems
    try:
        sc = canon_frame(spdf)
    except Exception as exc:  # matches the driver's recorded harness error
        problems.append(f"spark frame not canonicalizable (driver err): {exc!r}")
        return problems
    try:
        dc = canon_frame(dpdf)
    except Exception as exc:
        problems.append(f"oracle frame not canonicalizable (driver err): {exc!r}")
        return problems
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        problems.append(f"values differ, first diffs: {diffs}")
    return problems
