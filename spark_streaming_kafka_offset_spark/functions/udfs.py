"""§2.11 UDF / UDAF / UDTF extension surface (SURVEY.md).

Policy (SURVEY.md §2.11): every core operator is built-in-only — UDFs
break codegen and pushdown.  These four queries exist to prove the
extension surface works end-to-end, each with the perf posture stated:

* row-at-a-time Python UDF — the slow path (per-row serialization,
  ~10-100× slower than built-ins); escape hatch of last resort;
* Pandas UDF — Arrow-batched, vectorized; the acceptable escape hatch;
* ``applyInPandas`` — grouped-map "UDAF" for per-group logic no built-in
  aggregate expresses (here: per-group linear-regression slope);
* Python UDTF (Spark 4) — table function emitting multiple rows per
  input.

All four are registered rows-only: the driver's DuckDB oracle cannot run
Python, and that is the point — anything oracle-able is built-in-only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType, StringType

from ..plans.registry import register
from ..session import load_table


# useArrow pinned False: this row is the DELIBERATE pickle-serialized
# slow path (the ladder's bottom rung), and leaving it None makes
# pyspark try eval-type inference from the hints, which fails and
# prints an import-time UserWarning on every driver run (VERDICT r5 #5).
@udf(returnType=StringType(), useArrow=False)
def _priority_bucket(priority: str) -> str:
    """Row-at-a-time demo: '1-URGENT' → 'hot', others → 'cold'."""
    if priority is None:
        return None
    return "hot" if priority.split("-", 1)[0] in ("1", "2") else "cold"


@register("udf_python")
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF (deliberately the slow path — see module doc)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", _priority_bucket(F.col("o_orderpriority")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


@pandas_udf(DoubleType())
def _zscore(v: pd.Series) -> pd.Series:
    """Vectorized z-score within each Arrow batch (demo semantics —
    batch-local normalization; global stats would use a window/agg)."""
    s = v.std(ddof=0)
    return (v - v.mean()) / s if s and s > 0 else v * 0.0


@register("udf_pandas")
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar Pandas UDF — the preferred escape hatch.
    Aggregated to a stable per-flag summary so batch boundaries don't
    leak into the comparable output."""
    l = load_table(spark, sf_dir, "lineitem")
    z = l.select("l_returnflag", _zscore(F.col("l_extendedprice")).alias("z"))
    return (
        z.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.max("z") - F.min("z"), 2).alias("z_range"),
        )
        .orderBy("l_returnflag")
    )


def _slope(pdf: pd.DataFrame) -> pd.DataFrame:
    """OLS slope of value vs. time within one user — per-group logic no
    built-in aggregate expresses directly."""
    x = pdf["ts"].astype("int64") / 1e9
    y = pdf["value"]
    x = x - x.mean()
    denom = (x * x).sum()
    slope = float((x * y).sum() / denom) if denom > 0 else 0.0
    return pd.DataFrame(
        {"user_id": [pdf["user_id"].iloc[0]], "n": [len(pdf)], "slope": [round(slope, 6)]}
    )


@register("udaf_applyinpandas")
def udaf_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map 'UDAF' via applyInPandas: per-user value-over-time
    slope.  Each group becomes one pandas frame on one executor — the
    group-size bound (events per user) is the scale contract."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_slope, "user_id long, n long, slope double")
        .orderBy("user_id")
    )


@udtf(returnType="word string, pos int, is_stop boolean")
class _TokenizeUDTF:
    """Table function: one input text row → one row per token."""

    STOP = {"the", "a", "of", "and", "to", "in", "is"}

    def eval(self, text: str, max_tokens: int = 8):
        if text is None:
            return
        for i, w in enumerate(text.split(" ")[: max_tokens or 8]):
            yield w, i, w in self.STOP


@register("udtf_python")
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): tokenize the first 8 tokens of a document
    sample via a lateral join, then count stopword positions."""
    spark.udtf.register("sskos_tokenize", _TokenizeUDTF)
    load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 25 == 0
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT t.pos, COUNT(*) AS n, SUM(CASE WHEN t.is_stop THEN 1 ELSE 0 END) AS n_stop
        FROM udtf_docs d, LATERAL sskos_tokenize(d.text, 8) t
        GROUP BY t.pos ORDER BY t.pos
        """
    )


@register("udf_arrow_native")
def udf_arrow_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow` — the lowest-overhead Python extension point
    (pyarrow RecordBatch in, RecordBatch out; no pandas conversion on
    either side), completing the §2.11 ladder: row-UDF → pandas UDF →
    applyInPandas → UDTF → Arrow-native here.  The batch function
    length-buckets documents with pyarrow.compute kernels (C++ inside
    Python — no per-row interpreter work), then Spark aggregates.

    The pytest twin asserts equality with the pure-JVM formulation of
    the same bucketing — the extension point adds a capability surface,
    never a semantics fork.

    Scale notes: Arrow round-trip cost is per-BATCH, and compute
    kernels are vectorized C++; this is the right hop when pandas
    semantics (index, NaN coercion) are unwanted overhead.  Still the
    slow path vs built-ins — used here on a projected 2-column frame."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def bucketize(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            n = pc.utf8_length(t["text"])
            bucket = pc.multiply(pc.floor(pc.divide(n, 100)), 100)
            yield pa.RecordBatch.from_arrays(
                [t["doc_id"].combine_chunks(), bucket.combine_chunks().cast(pa.int64())],
                names=["doc_id", "len_bucket"],
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = d.mapInArrow(bucketize, "doc_id long, len_bucket long")
    return (
        out.groupBy("len_bucket")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("len_bucket")
    )
