"""sf10 probe (VERDICT r6 #4): single-run wall-clock of the five
heaviest operators at sf10 (60M-row lineitem — 100x the bench fixture;
``SSKOS_REPLICAS=100 python tools/gen_sf1.py .scratch/sf10``), with the
same-session sf1 wall measured first so the growth column isolates the
second decade (sf1 → sf10 at fixed plans/host).

This is the last cheap decade before 100 TB claims rest on plan
assertions alone: the r6 sf1 sweep caught two fanout bugs invisible at
sf0.1; a clean ~linear second decade on the shuffle-heaviest ops is the
strongest single-machine scaling evidence this environment can produce.

Output: one JSON line + BENCH_sf10.json sidecar.

Usage: python tools/probe_sf10.py [sf10_dir [sf1_dir]]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

#: The five heaviest operators by r6 B-set/sweep wall, per VERDICT r6 #4.
PROBE_SET = [
    "graph_pagerank",
    "graph_kcore",
    "multimodal_dedup_phash",
    "dedup_minhash",
    "corpus_admission_pipeline",
    # r8 additions: the heaviest new shuffle shapes — the capped-slot
    # pair join with weight attach, the (month,part) basket join, the
    # vocab-graph iterations, and the LM train+score double pass.
    "graph_adamic_adar",
    "lineitem_price_index",
    "text_textrank_keywords",
    "docs_ccnet_perplexity_buckets",
    # r10 additions (VERDICT r9 #7): the two heaviest r9 shapes — the
    # 5-iteration BT contest join and the collapsed-representative
    # threshold curve.
    "docs_bradley_terry",
    "corpus_dedup_rate_curve",
    # r10-built heavies: the adaptive-k SemDeDup pair join (k tracks n,
    # so the second decade tests the linearity claim directly) and the
    # 3-round label-propagation join.
    "dedup_semantic",
    "graph_label_propagation",
    # r13 addition: the script/charset scan (scan-bound claim tested at
    # the second decade too).
    "text_script_profile",
    # r13 second/third batches: the remaining new ops' second decade.
    "text_code_detect",
    "orders_adi_cv2",
    "text_ocr_artifacts",
    "eval_krippendorff_alpha",
    "docs_bleu",
    # r14: the streaming semantic-admission twin (cell-blocked
    # stream-static anti-join; linearity claim tested at the second
    # decade like its batch siblings).
    "stream_dedup_embed",
    # r14 second batch: the fixed-panel agreement rollup and the
    # char-gram corpus F — the heaviest new shapes (chrF explodes
    # ~3x the corpus characters).
    "eval_fleiss_kappa",
    "docs_chrf",
    "docs_edit_distance",
    # r14 third batch.
    "text_hapax_ratio",
    "eval_mcc",
    "eval_concordance_ccc",
]


def main() -> int:
    sf10_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    sf1_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    for d in (sf10_dir, sf1_dir):
        if not os.path.exists(f"{d}/lineitem.parquet"):
            raise SystemExit(f"fixture missing: {d} (run tools/gen_sf1.py)")

    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "32m")
    from pyspark.sql import SparkSession

    from spark_streaming_kafka_offset_spark import session as S
    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sskos-probe-sf10")
        # 4x the cores: sf10 shuffle partitions must bound per-task
        # memory, not match core count (the 100 TB sizing rule scaled
        # down — SURVEY §6).
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.sql.ansi.enabled", "true")
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ["SPARK_GRAFT_MAX_PARTITION_BYTES"],
        )
        .getOrCreate()
    )
    S.ensure_configs(spark)
    queries = entrymod.queries()
    queries["agg_hash"](spark, sf1_dir).collect()  # warm-up

    # Optional key filter (argv[3:]): probe only the named keys and MERGE
    # into the existing BENCH_sf10.json — quiet-host re-runs of one
    # flagged op shouldn't re-pay the whole probe.
    selected = sys.argv[3:] or PROBE_SET

    out: dict[str, dict] = {}
    for key in selected:
        t0 = time.monotonic()
        n1 = len(queries[key](spark, sf1_dir).collect())
        w1 = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        n10 = len(queries[key](spark, sf10_dir).collect())
        w10 = round(time.monotonic() - t0, 2)
        rec = {
            "sf1_wall_sec": w1,
            "sf1_rows": n1,
            "sf10_wall_sec": w10,
            "sf10_rows": n10,
            "growth_10x": round(w10 / w1, 2) if w1 > 0 else None,
        }
        out[key] = rec
        print(
            f"# {key}: sf10 {w10}s ({n10} rows), sf1 {w1}s, "
            f"growth {rec['growth_10x']}x",
            file=sys.stderr,
        )

    merged = dict(out)
    if sys.argv[3:] and os.path.exists("BENCH_sf10.json"):
        with open("BENCH_sf10.json") as f:
            merged = {**json.load(f).get("queries", {}), **out}
    payload = {
        "metric": "sf10_probe",
        "sf10_dir": sf10_dir,
        "unit": "sec",
        "queries": merged,
        "total_sf10_wall": round(
            sum(r["sf10_wall_sec"] for r in merged.values()), 2
        ),
        "protocol": "single-run-per-op, same-session sf1 baseline",
    }
    print(json.dumps({**payload, "queries": out}))
    with open("BENCH_sf10.json", "w") as f:
        json.dump(payload, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
