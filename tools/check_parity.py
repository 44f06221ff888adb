"""Local replica of the driver's oracle harness (SURVEY.md §5.1).

Runs every ``queries()`` entry on Spark and — when oracle SQL exists — the
same query on DuckDB over the same parquet files, then compares through the
SAME pandas canonicalization the driver uses (tools/driver_canon.py): row
count, column names, dtype-sensitive order-insensitive values.  Run this
BEFORE declaring any new oracle pair; it reproduces all six round-1 driver
failures that the old repr-based canon missed.

Usage:  python tools/check_parity.py [sf_dir] [key ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from spark_streaming_kafka_offset_spark import session as S  # noqa: E402
from tools.driver_canon import compare_frames  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in S.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    keys = args or list(qs)
    spark = S.get_spark("parity-check")
    con = duck_con(sf_dir)
    failures = []
    for key in keys:
        t0 = time.monotonic()
        try:
            sdf = qs[key](spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            print(f"FAIL  {key}: spark raised\n{traceback.format_exc()}")
            failures.append(key)
            continue
        if key not in oracles:
            # Driver rows-only path still canonicalizes the Spark frame —
            # an unhashable cell is recorded as a harness error.
            try:
                from tools.driver_canon import canon_frame

                canon_frame(spdf)
            except Exception as exc:
                print(f"FAIL  {key}: rows-only frame not canonicalizable: {exc!r}")
                failures.append(key)
                continue
            print(
                f"ok    {key}: rows-only ({len(spdf)} rows, "
                f"{time.monotonic() - t0:.1f}s)"
            )
            continue
        try:
            dpdf = con.execute(oracles[key]).df()
        except Exception:
            print(f"FAIL  {key}: duckdb raised\n{traceback.format_exc()}")
            failures.append(key)
            continue
        problems = compare_frames(spdf, dpdf)
        if problems:
            print(f"FAIL  {key}: " + "; ".join(problems))
            failures.append(key)
        else:
            print(f"ok    {key}: {len(spdf)} rows match ({time.monotonic()-t0:.1f}s)")
    print(f"\n{len(keys)-len(failures)}/{len(keys)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
