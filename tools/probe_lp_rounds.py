"""graph_label_propagation rounds-vs-volume decomposition (VERDICT r11
#6): BENCH_sf10 records 4.95× wall growth for 10× data on the 3-round
synchronous LPA — superlinear-LOOKING, attributed by argument (growth is
per-round shuffle volume; the rounds are fixed) — this probe turns the
attribution into numbers: a per-component wall table at sf1 and sf10.

Components, measured with a hard materialization barrier between each
(stage() + count, so no lineage re-execution blurs rounds):

  edges     build + stage the weighted bidirectional edge list
  round1-3  one LPA round each: labels ⋈ edges on src (keyed), partial+
            final agg on (dst, lbl), argmax window on node, stage+count

The op itself stages only after round 2 — staging EVERY round here adds
a localCheckpoint per round, so the per-round walls are upper bounds of
the fused pipeline's (total overhead is reported as probe_total vs
op_wall).  The decomposition claim to check: each component's sf10/sf1
growth is ≈ its shuffle volume growth (≤ ~10× for 10× data, i.e. work
is LINEAR per round), and the headline 4.95× is just the sum of linear
rounds — no round is superlinear.

Output: one JSON line + BENCH_lp_rounds.json sidecar; the BASELINE.md
watch-item row cites it.

Usage: python tools/probe_lp_rounds.py [sf10_dir [sf1_dir]]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def lp_rounds(spark, sf_dir: str) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_streaming_kafka_offset_spark.common import stage
    from spark_streaming_kafka_offset_spark.session import load_table

    timings: dict[str, float] = {}
    t0 = time.monotonic()
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = stage(
        raw.select(
            F.col("c_node").alias("src"), F.col("s_node").alias("dst"), "w"
        ).unionAll(
            raw.select(
                F.col("s_node").alias("src"),
                F.col("c_node").alias("dst"),
                "w",
            )
        )
    )
    n_edges = edges.count()
    timings["edges"] = round(time.monotonic() - t0, 2)

    labels = stage(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    n_nodes = labels.count()
    wv = Window.partitionBy("node").orderBy(F.col("tw").desc(), "lbl")
    vols = []
    for it in range(3):
        t0 = time.monotonic()
        scored = (
            edges.join(
                labels.select(F.col("node").alias("src"), "lbl"), "src"
            )
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.sum("w").alias("tw"))
        )
        labels = stage(
            scored.withColumn("rn", F.row_number().over(wv))
            .where(F.col("rn") == 1)
            .select("node", "lbl")
        )
        n_lbl = labels.count()
        timings[f"round{it + 1}"] = round(time.monotonic() - t0, 2)
        # per-round shuffle volume proxy: (dst,lbl) groups scored
        vols.append(scored.count())
    return {
        "n_edges": n_edges,
        "n_nodes": n_nodes,
        "scored_groups_per_round": vols,
        "wall": timings,
        "wall_total": round(sum(timings.values()), 2),
    }


def main() -> int:
    sf10_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    sf1_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    for d in (sf10_dir, sf1_dir):
        if not os.path.exists(f"{d}/lineitem.parquet"):
            raise SystemExit(f"fixture missing: {d} (run tools/gen_sf1.py)")

    from pyspark.sql import SparkSession

    from spark_streaming_kafka_offset_spark import session as S
    from spark_streaming_kafka_offset_spark.plans.registry import QUERIES

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sskos-probe-lp-rounds")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g")
        )
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .getOrCreate()
    )
    S.ensure_configs(spark)

    report: dict = {"metric": "lp_rounds_decomposition", "unit": "sec"}
    for name, d in (("sf1", sf1_dir), ("sf10", sf10_dir)):
        t0 = time.monotonic()
        QUERIES["graph_label_propagation"](spark, d).collect()
        op_wall = round(time.monotonic() - t0, 2)
        rec = lp_rounds(spark, d)
        rec["op_wall"] = op_wall
        report[name] = rec
    g = {
        comp: round(
            report["sf10"]["wall"][comp]
            / max(report["sf1"]["wall"][comp], 0.01),
            2,
        )
        for comp in report["sf1"]["wall"]
    }
    report["growth_10x_per_component"] = g
    report["max_component_growth"] = max(g.values())
    line = json.dumps(report)
    print(line)
    with open("BENCH_lp_rounds.json", "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
