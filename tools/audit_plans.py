"""Plan audit: sweep every registered BATCH query's executed plan for
scale-hostile shapes and print one line per flag.

Flags:
  CARTESIAN   CartesianProduct anywhere
  NLJ         BroadcastNestedLoopJoin (fine only for tiny literal sides —
              each hit is reviewed and either fixed or allowlisted below)
  SINGLE      Exchange SinglePartition feeding a non-trivial subtree
              (single-task bottleneck; allowlisted only for final top-k
              collects that TakeOrderedAndProject already bounds)
  PYUDF       BatchEvalPython in the plan (row-at-a-time Python in the
              hot path; allowlisted for the deliberate §2.11 UDF demos)

Usage: python tools/audit_plans.py [sf_dir]
Exit code 1 if any non-allowlisted flag fires (CI-able).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

#: (key, flag) pairs that are deliberate, each with the reason reviewed.
ALLOW: dict[tuple[str, str], str] = {
    ("join_cross", "CARTESIAN"): "the operator IS a cross join (5x5 dims)",
    ("join_cross", "NLJ"): "broadcast NLJ of two tiny dims",
    ("fn_fuzzy", "NLJ"): "3-row literal probe side, broadcast",
    ("join_theta_range", "NLJ"): "theta join over broadcast 25-row nation",
    ("join_interval", "NLJ"): "interval overlap is a theta join; small side broadcast",
    ("udf_python", "PYUDF"): "deliberate row-UDF demo (SURVEY 2.11)",
    ("udtf_python", "PYUDF"): "deliberate UDTF demo (SURVEY 2.11)",
}


def main() -> int:
    from pyspark.sql import SparkSession

    from spark_streaming_kafka_offset_spark import ordered_queries
    from spark_streaming_kafka_offset_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    bad = 0
    for key, fn in ordered_queries().items():
        if key.startswith(("stream_", "source_", "sink_")) or key.startswith(
            ("udaf", "multimodal")
        ):
            continue  # streaming/write/pandas entries execute, not plan-audited
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - audit tool
            print(f"ERR   {key}: {type(e).__name__}: {e}")
            bad += 1
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan:
            flags.append("NLJ")
        if "Exchange SinglePartition" in plan and "TakeOrderedAndProject" not in plan:
            flags.append("SINGLE")
        if "BatchEvalPython" in plan:
            flags.append("PYUDF")
        for flag in flags:
            reason = ALLOW.get((key, flag))
            if reason:
                print(f"ok    {key}: {flag} allowed ({reason})")
            else:
                print(f"FLAG  {key}: {flag}")
                bad += 1
    print(f"\naudit {'FAILED' if bad else 'clean'} ({bad} unexplained flags)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
