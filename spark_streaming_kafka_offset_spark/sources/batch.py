"""§2.1 Batch scans and sinks (SURVEY.md).

The reference ingests only from Kafka [K] (mirror empty — SURVEY.md §0);
its batch-file story is nonexistent.  A real engine needs first-class
columnar scans, so these operators demonstrate the two properties that
make parquet scans survive 100 TB:

* **column pruning** — the scan's ``ReadSchema`` contains only referenced
  columns (a 2-column projection over a 16-column table reads 2 columns);
* **predicate pushdown** — filters appear as ``PushedFilters`` and prune
  row groups / pages before any row is materialized.

Both are asserted against ``explain()`` output in tests/test_plans.py —
not assumed.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..session import load_table


@register(
    "scan_parquet",
    oracle="SELECT * FROM supplier",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-fidelity parquet scan (schema preserved end-to-end)."""
    return load_table(spark, sf_dir, "supplier")


@register(
    "scan_pruned",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_extendedprice > 90000 AND l_returnflag = 'R'
    """,
)
def scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned + pushed scan: Catalyst pushes both predicates into the
    parquet reader (``PushedFilters: [GreaterThan(l_extendedprice,90000.0),
    EqualTo(l_returnflag,R)]``) and reads a 3-column ``ReadSchema`` out of
    lineitem's 11 columns.  At 100 TB this is the difference between
    scanning terabytes and scanning the row groups that can match."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_extendedprice") > 90000) & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_extendedprice")


@register("scan_csv_json")  # rows-only: no csv/json fixture file exists
def scan_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV + JSON batch read with explicit schemas (never inferSchema in
    production paths — a schema drift should fail loudly, not silently
    retype a column).  No csv/json fixture ships, so this writes a tiny
    deterministic file pair to a temp dir and reads it back through the
    real readers: the point is the reader surface, not the data."""
    tmp = tempfile.mkdtemp(prefix="sskos_csv_json_")
    csv_path, json_path = os.path.join(tmp, "t.csv"), os.path.join(tmp, "t.json")
    with open(csv_path, "w") as f:
        f.write("id,name,score\n1,alpha,0.5\n2,beta,1.5\n3,gamma,2.5\n")
    with open(json_path, "w") as f:
        f.write(
            '{"id": 1, "tag": "x"}\n{"id": 2, "tag": "y"}\n{"id": 3, "tag": "z"}\n'
        )
    csv_df = spark.read.schema("id long, name string, score double").option(
        "header", "true"
    ).csv(csv_path)
    json_df = spark.read.schema("id long, tag string").json(json_path)
    return csv_df.join(json_df, "id").orderBy("id")


@register("sink_parquet")  # rows-only: a write, not a query
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink: write lineitem aggregates partitioned by
    ``l_returnflag`` and read them back.  ``partitionBy`` is the batch
    analogue of topic partitioning [K]: downstream scans of one flag value
    touch one directory (partition pruning), and each of the 32 write
    tasks emits at most |flags| files.  At 100 TB the same code writes a
    date/key-partitioned lake table."""
    out = os.path.join(tempfile.mkdtemp(prefix="sskos_sink_"), "by_flag")
    l = load_table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows")
    )
    agg.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    # Partition-pruned read-back: only the A directory is listed.
    return back.where(F.col("l_returnflag") == "A").orderBy("l_linestatus")
