"""Local replica of the driver's oracle harness (SURVEY.md §5.1).

Runs every ``queries()`` entry on Spark and — when oracle SQL exists — the
same query on DuckDB over the same parquet files, then compares row count,
column names, and order-insensitive values.  Run this BEFORE declaring any
new oracle pair.

Usage:  python tools/check_parity.py [sf_dir] [key ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from spark_streaming_kafka_offset_spark import session as S  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in S.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(norm(x) for x in v) + "]"
        if isinstance(v, bytes):
            return v.hex()
        return repr(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    keys = args or sorted(qs)
    spark = S.get_spark("parity-check")
    con = duck_con(sf_dir)
    failures = []
    for key in keys:
        t0 = time.monotonic()
        try:
            sdf = qs[key](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {key}: spark raised\n{traceback.format_exc()}")
            failures.append(key)
            continue
        if key not in oracles:
            print(f"ok    {key}: rows-only ({len(srows)} rows, {time.monotonic()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[key])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            print(f"FAIL  {key}: duckdb raised\n{traceback.format_exc()}")
            failures.append(key)
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sc = canon([tuple(r) for r in srows], scols)
            dc = canon(drows, dcols)
            if sc != dc:
                diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {key}: " + "; ".join(problems))
            failures.append(key)
        else:
            print(f"ok    {key}: {len(srows)} rows match ({time.monotonic()-t0:.1f}s)")
    print(f"\n{len(keys)-len(failures)}/{len(keys)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
