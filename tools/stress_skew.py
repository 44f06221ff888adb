"""Skew stress sweep (VERDICT r12 #5): run the headline join/agg
shapes on the Zipf-keyed sf1 fixture (tools/gen_skew.py) WITH and
WITHOUT AQE, and record wall + worst max/median task-duration ratio —
the 100 TB skew story (AQE skew-join splitting, map-side combine
absorbing hot groups) as measurements instead of design arguments.

Per (query, mode) the sweep records wall, rows, and the SkewReader
readout from tools/stress_sf1.py (``max_over_median`` over all stages
plus the ``real`` ≥200 ms-median variant that filters the split-
accounting artifact).  AQE on/off is flipped through the RUNTIME conf
(`spark.sql.adaptive.enabled` is runtime-settable), so both modes run
in one JVM on identical inputs; the row counts are asserted EQUAL
across modes (AQE must never change results).  The unskewed BENCH_sf1
rows are the third column for attribution: skew-fixture-vs-sf1 deltas
isolate key skew, AQE-on-vs-off isolates the optimizer's answer to it.

Output: one JSON line + BENCH_skew.json sidecar; the BASELINE.md skew
section is derived from it.

Usage: python tools/stress_skew.py [skew_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

SKEW_SET = [
    "join_inner_hash",   # orders(filtered) ⋈ customer on Zipf o_custkey
    "topk_per_group",    # window PARTITION BY Zipf c_mktsegment
    "dedup_exact",       # groupBy content_hash with Zipf-hot text groups
    "q3_shipping_priority",  # customer ⋈ orders ⋈ lineitem, both Zipf keys
]


def main() -> int:
    skew_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SSKOS_SKEW_DIR", "/root/repo/.scratch/skew1")
    )
    if not os.path.exists(f"{skew_dir}/lineitem.parquet"):
        raise SystemExit(f"run tools/gen_skew.py first ({skew_dir} missing)")

    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")
    from pyspark.sql import SparkSession

    from spark_streaming_kafka_offset_spark import session as S
    from tools.stress_sf1 import SkewReader
    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sskos-stress-skew")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")  # REST status API for skew
        .config("spark.ui.port", "4048")
        .config("spark.sql.ansi.enabled", "true")
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ["SPARK_GRAFT_MAX_PARTITION_BYTES"],
        )
        .getOrCreate()
    )
    S.ensure_configs(spark)
    queries = entrymod.queries()
    skew = SkewReader(spark)

    queries["agg_hash"](spark, skew_dir).collect()  # warm-up
    out: dict[str, dict] = {}
    # Scaled-down replica of real-cluster skew-join tuning: the stock
    # 256 MB skewedPartitionThreshold never fires at local fixture
    # scale (the whole shuffle is smaller than one production skewed
    # partition), so the threshold and advisory size shrink with the
    # data — the same ratio a 100 TB deployment would run at.
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")

    # Three modes.  'aqe_skewfix' exists because stock AQE left q3's
    # 11M-row hot join partition UNSPLIT for two stacked reasons found
    # while building this harness: (a) the downstream same-key
    # aggregate reuses the join's hash partitioning, so splitting
    # needs an extra shuffle and OptimizeSkewedJoin declines unless
    # forceOptimizeSkewedJoin=true; (b) at replica scale the hot
    # partition (~60 MB compressed) missed the factor-5 median test
    # that a GB-hot production key clears trivially — factor 2 models
    # the production ratio.  With both set the lineitem side reads
    # 'AQEShuffleRead coalesced and skewed' and q3 drops ~40%.
    from spark_streaming_kafka_offset_spark.session import (
        skew_join_tuned_confs,
    )

    MODES = (
        ("aqe_off", {"spark.sql.adaptive.enabled": "false"}),
        ("aqe_on", {"spark.sql.adaptive.enabled": "true"}),
        # the engine's documented posture for this shape — the harness
        # consumes the same dict the product exposes (single source).
        ("aqe_skewfix", skew_join_tuned_confs(advisory="16m")),
    )
    for key in SKEW_SET:
        rec: dict = {}
        for mode, confs in MODES:
            for k, v in confs.items():
                spark.conf.set(k, v)
            before = skew.seen_stages()
            t0 = time.monotonic()
            n = len(queries[key](spark, skew_dir).collect())
            rec[mode] = {
                "wall_sec": round(time.monotonic() - t0, 2),
                "rows": n,
                "skew": skew.worst_skew(before),
            }
            # restore defaults between modes
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set(
                "spark.sql.adaptive.forceOptimizeSkewedJoin", "false"
            )
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5"
            )
        assert (
            rec["aqe_on"]["rows"]
            == rec["aqe_off"]["rows"]
            == rec["aqe_skewfix"]["rows"]
        ), (key, rec)  # AQE must never change results
        out[key] = rec
        print(
            f"# {key}: "
            + ", ".join(
                f"{m} {rec[m]['wall_sec']}s"
                f" (real skew {(rec[m]['skew'] or {}).get('real')})"
                for m, _ in MODES
            ),
            file=sys.stderr,
        )

    payload = {
        "metric": "skew_stress_sweep",
        "skew_dir": skew_dir,
        "unit": "sec",
        "queries": out,
    }
    print(json.dumps(payload))
    with open("BENCH_skew.json", "w") as f:
        json.dump(payload, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
