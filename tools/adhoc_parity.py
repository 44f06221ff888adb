"""Ad-hoc parity check for a subset of keys at a given sf dir.

Usage: python tools/adhoc_parity.py key1 key2 ... [--sf /root/testdata/sf0.001]
Same canonicalization as the driver (tools/driver_canon.py).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from spark_streaming_kafka_offset_spark import session as S  # noqa: E402
from tools.driver_canon import compare_frames  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    keys = args
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    spark = S.get_spark("adhoc-parity", shuffle_partitions=8)
    con = duckdb.connect()
    for t in S.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad = 0
    for key in keys:
        try:
            spdf = queries[key](spark, sf).toPandas()
            dpdf = con.execute(oracles[key]).df()
            problems = compare_frames(spdf, dpdf)
        except Exception as e:  # noqa: BLE001
            problems = [f"ERR {type(e).__name__}: {e}"]
        status = "ok  " if not problems else "FAIL"
        bad += bool(problems)
        print(f"{status} {key}" + ("" if not problems else ": " + "; ".join(problems)[:500]))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
