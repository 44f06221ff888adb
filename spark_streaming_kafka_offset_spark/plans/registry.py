"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers itself here with its key and
(when oracle-able) the DuckDB-dialect ANSI SQL the driver runs side-by-side.
``__spark_entry__.py`` simply re-exports these dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``key`` with optional oracle SQL.

    Oracle-authoring rules (SURVEY.md §5.1 — learned dialect gap):
    alias every computed column identically on both sides; exact DECIMAL
    arithmetic for money sums; ROUND(...,N) floats on BOTH sides; UTC tz.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE_SQL[key] = oracle
        return fn

    return deco
