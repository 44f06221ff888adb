"""Dump the formatted physical plan for any registered query.

Usage::

    python tools/explain_query.py q5_local_supplier [sf_dir]
    python tools/explain_query.py --all-summary [sf_dir]

``--all-summary`` prints one line per batch query: key, exchange count,
whether whole-stage codegen covers it, and any cartesian/BNL nodes —
the quick scale audit over the full registry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if not args:
        print(__doc__)
        return
    key = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"

    from spark_streaming_kafka_offset_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("sskos-explain")
    queries = entrymod.queries()

    if key == "--all-summary":
        skip = ("stream_", "sink_", "source_")
        for k, fn in queries.items():
            if k.startswith(skip):
                continue
            try:
                df = fn(spark, sf_dir)
                df.collect()  # AQE: codegen spans only appear in the FINAL plan
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as ex:  # noqa: BLE001 — audit tool, report and move on
                print(f"{k:28s} ERROR {type(ex).__name__}")
                continue
            n_ex = plan.count("Exchange ")
            # codegen stages print as "*(n) Operator" in the plan string
            wsc = "wsc" if "*(1)" in plan else "NO-CODEGEN"
            bad = []
            if "CartesianProduct" in plan:
                bad.append("CARTESIAN")
            if "BroadcastNestedLoopJoin" in plan:
                bad.append("BNL")
            print(f"{k:28s} exchanges={n_ex} {wsc} {' '.join(bad)}")
        return

    df = queries[key](spark, sf_dir)
    df.explain("formatted")


if __name__ == "__main__":
    main()
