"""Scale-pattern operators — the techniques that keep the engine fast at
100 TB, demonstrated as runnable, oracle-checked queries (SURVEY.md §4;
mirror empty §0, so these are anchored to public Spark practice, not
reference code).

Each of these exists because a naive formulation breaks down at cluster
scale in a specific way:

* ``join_skew_salted``  — one hot key melts a single reducer; salting
  splits it across S tasks with a deterministic salt and an S-way
  replicated build side.
* ``join_bucketed``     — two fact tables bucketed on the join key join
  with ZERO shuffle exchanges (co-located SortMergeJoin): at 100 TB the
  shuffle IS the cost, and bucketing amortizes it into the write path.
* ``rollup_time``       — hierarchical time rollup (hour → day) where the
  coarser level re-aggregates the finer one instead of rescanning the
  fact table: count/sum/min/max compose, so the daily pass reads
  |hours| rows, not |events|.
* ``rollup_hll``        — the same rollup for DISTINCT, which does NOT
  compose exactly: HLL sketches are built per hour and *merged* per day
  (Apache DataSketches via Spark 3.5+ ``hll_sketch_agg``/
  ``hll_union_agg``) — the standard re-aggregatable distinct at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..session import load_table

from ..common import dec2, global_row_number, round_dec, scratch_path

_SALT = 8  #: sub-splits per hot key; sized to the worst observed skew


@register(
    "join_skew_salted",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 4 = 0
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe equi-join: salt the probe side, replicate the build side.

    The probe row's salt is ``pmod(xxhash64(l_linenumber), S)`` —
    deterministic (no ``rand()``: reruns and retried tasks must land rows
    in the same bucket) but uncorrelated with the join key, so a hot
    orderkey's rows spread across S reducers.  The build side is exploded
    S ways (bounded: S× |orders|, far cheaper than one straggler task at
    scale).  Result set is byte-identical to the plain join — which is
    exactly what the oracle checks.  AQE's skewedJoin covers moderate
    skew at runtime; explicit salting is for the pathological keys AQE
    can't split (single-key hot spots within one partition).
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 4 == 0)
    salted_l = l.withColumn(
        "_salt", F.pmod(F.xxhash64("l_linenumber"), F.lit(_SALT)).cast("int")
    )
    salted_o = o.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT)]))
    )
    return (
        salted_l.join(
            salted_o,
            (salted_l.l_orderkey == salted_o.o_orderkey)
            & (salted_l._salt == salted_o._salt),
        )
        .select("l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus")
    )


def _bucketed_table(
    spark: SparkSession, sf_dir: str, name: str, key: str, buckets: int = 8
) -> DataFrame:
    """Materialize a fixture table as a bucketed catalog table (once per
    session × (sf_dir, table)); at production scale this is the
    ingest-time layout decision, not a per-query step.

    External table under a scratch dir: a *managed* table's warehouse
    location outlives the in-memory catalog, and a later session hits
    LOCATION_ALREADY_EXISTS on re-create (observed).  Scoping the name by
    applicationId and the data by tempdir makes re-creation safe on any
    session, including a driver-owned one."""
    safe = re.sub(r"[^A-Za-z0-9]", "_", sf_dir.strip("/"))
    app = re.sub(r"[^A-Za-z0-9]", "_", spark.sparkContext.applicationId)
    tbl = f"bkt_{app}_{safe}_{name}"
    if not spark.catalog.tableExists(tbl):
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .option("path", scratch_path(f"sskos-{tbl}-") + "/data")
            .bucketBy(buckets, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
    return spark.table(tbl)


@register(
    "join_bucketed",
    oracle="""
    SELECT l.l_orderkey,
           COUNT(*) AS n_lines,
           COUNT(DISTINCT o.o_custkey) AS n_cust
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_orderkey
    HAVING COUNT(*) >= 4
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join of two tables bucketed on the join key.

    Both sides are written ``bucketBy(8, orderkey).sortBy(orderkey)``;
    the SortMergeJoin then reads matching buckets pairwise with NO
    shuffle exchange on either side (asserted in tests/test_plans.py) —
    the fact-to-fact join strategy at 100 TB, where re-shuffling either
    table per query is the dominant cost.  ``hint('merge')`` pins SMJ so
    the demo doesn't degenerate to a broadcast at toy scale.  The
    downstream groupBy(orderkey) ALSO reuses the bucket partitioning —
    one layout serves join and aggregation.
    """
    lb = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    ob = _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    return (
        lb.hint("merge")
        .join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.countDistinct("o_custkey").alias("n_cust"),
        )
        .where(F.col("n_lines") >= 4)
    )


@register(
    "rollup_time",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, event_type,
             COUNT(*) AS n, CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
             MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
             MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(date_trunc('day', hour) AS DATE) AS day, event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(sum_k) AS BIGINT) AS sum_k,
           MIN(min_k) AS min_k,
           MAX(max_k) AS max_k
    FROM hourly GROUP BY 1, 2
    """,
)
def rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup: hour → day, daily computed FROM hourly.

    The decomposable aggregates (count/sum/min/max) re-aggregate without
    touching the fact table — the hypertable/materialized-rollup pattern:
    at 100 TB the daily job reads |hours|×|types| rows instead of the
    event stream, and the hourly table is the only scan of raw data.
    The oracle computes the same two-level rollup so equality proves the
    compose step, not just the final numbers.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        ).agg(
            F.count("*").alias("n"),
            F.sum(k.cast("long")).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour").cast("date").alias("day"),
            "event_type",
        ).agg(
            F.sum("n").alias("n_events"),
            F.sum("sum_k").alias("sum_k"),
            F.min("min_k").alias("min_k"),
            F.max("max_k").alias("max_k"),
        )
    )


@register(
    "resample_locf",
    oracle="""
    WITH agg AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS v
      FROM events WHERE user_id % 10 = 0
      GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM agg GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    )
    SELECT g.user_id, g.bucket,
           COALESCE(a.n, 0) AS n_events,
           last_value(a.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
    FROM grid g LEFT JOIN agg a
      ON g.user_id = a.user_id AND g.bucket = a.bucket
    """,
)
def resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill: per-user hourly value totals on a
    DENSE hour grid (every hour between the user's first and last event),
    missing buckets filled by last-observation-carried-forward — the
    hypertable ``time_bucket_gapfill`` / ``locf`` pattern.

    Scale shape: one aggregate to hourly granularity (the only pass over
    raw events), a per-user ``sequence()`` explode to synthesize the
    dense grid (output-sized: |users| × |hours|, independent of event
    count), a left join back on (user, bucket), and one window for the
    carry-forward — all partitioned on user_id, so the grid explode, the
    join, and the window reuse a single shuffle.  At 100 TB the grid side
    is millions of rows while events are billions: gap filling costs
    ~nothing beyond the hourly rollup itself."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 10 == 0)
    agg = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        round_dec(F.sum(dec2("value")), 2).alias("v"),
    )
    bounds = agg.groupBy("user_id").agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("interval 1 hour"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(agg, ["user_id", "bucket"], "left").select(
        "user_id",
        "bucket",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.last("v", ignorenulls=True).over(w).alias("v_locf"),
    )


@register("rollup_hll")  # rows-only: HLL estimates are sketch-dependent
def rollup_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable DISTINCT: per-hour HLL sketches merged per day.

    Exact distinct does not compose across rollup levels (you cannot sum
    distinct counts); sketches do.  ``hll_sketch_agg`` builds an Apache
    DataSketches HLL per (hour, type), ``hll_union_agg`` merges hours
    into days — the daily pass never revisits raw events, and the same
    merge serves weekly/monthly levels.  Estimate accuracy is checked
    against exact distincts in tests/test_properties.py.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"), F.count("*").alias("n"))
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour").cast("date").alias("day"), "event_type"
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.sum("n").alias("n_events"),
        )
        .orderBy("day", "event_type")
    )


@register(
    "scan_partition_pruned",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
             AS sum_k
    FROM events
    WHERE CAST(date_trunc('day', ts) AS DATE)
          BETWEEN DATE '2024-01-03' AND DATE '2024-01-04'
    GROUP BY 1, 2
    """,
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partition pruning — the first lever at 100 TB: a day
    filter on a day-partitioned table must touch only matching
    directories, skipping the rest at PLANNING time (PartitionFilters in
    the scan node, asserted in tests/test_plans.py), not as a row filter.

    The fixture parquet is unpartitioned, so the operator first lays
    events out as ``day=YYYY-MM-DD/`` directories (once per session ×
    sf_dir — at production scale this is the ingest layout, exactly like
    the bucketed-table write above), then queries two of the days.
    """
    e = spark.read.parquet(_events_by_day(spark, sf_dir))
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.where(
            F.col("day").between(F.lit("2024-01-03"), F.lit("2024-01-04"))
        )
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("n"), F.sum(k.cast("long")).alias("sum_k"))
    )


def _events_by_day(spark: SparkSession, sf_dir: str) -> str:
    """Events laid out as ``day=YYYY-MM-DD/`` directories (once per
    session × sf_dir) — the ingest layout both pruning operators read."""
    key = (spark.sparkContext.applicationId, sf_dir, "events_by_day")
    path = _PARTITIONED_CACHE.get(key)
    if path is None:
        path = scratch_path("sskos-events-day-") + "/events"
        (
            load_table(spark, sf_dir, "events")
            .withColumn("day", F.date_trunc("day", "ts").cast("date"))
            .write.partitionBy("day")
            .parquet(path)
        )
        _PARTITIONED_CACHE[key] = path
    return path


@register(
    "scan_dynamic_pruning",
    # The dim's kept days are deterministic (every 7th from 2024-01-01),
    # so the oracle is a literal IN list over the base events table.
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE CAST(date_trunc('day', ts) AS DATE) IN
          (DATE '2024-01-01', DATE '2024-01-08', DATE '2024-01-15',
           DATE '2024-01-22', DATE '2024-01-29')
    GROUP BY 1
    """,
)
def scan_dynamic_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning: the partition filter comes from a JOIN
    (fact.day ⋈ filtered dim), not a literal predicate — Spark plans a
    ``dynamicpruningexpression`` subquery that evaluates the dim first
    and prunes the fact's partitions at runtime (plan-asserted).

    This is the second pruning lever at 100 TB, and the one static
    filters can't give you: "scan only the days some other table
    selected" — the shape of every fact-to-date-dim star query.  The
    pruning reuses the join's broadcast exchange, so it costs nothing
    beyond the join itself."""
    e = spark.read.parquet(_events_by_day(spark, sf_dir))
    dim = (
        spark.range(31)
        .select(
            F.date_add(
                F.lit("2024-01-01").cast("date"), F.col("id").cast("int")
            ).alias("day"),
            (F.col("id") % 7).alias("m"),
        )
        .where(F.col("m") == 0)
        .select("day")
    )
    return (
        e.join(dim, "day")
        .groupBy("day")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_PARTITIONED_CACHE: dict[tuple[str, str, str], str] = {}


def misra_gries_candidates(df: DataFrame, key: str, k: int = 8) -> DataFrame:
    """Mergeable Misra-Gries heavy-hitter candidates over ``df[key]``.

    Pass 1 is shuffle-FREE: ``mapInPandas`` runs one bounded MG summary
    (k counters) per input partition — O(k) state regardless of
    partition size, the defining property that makes this viable where
    a per-key pre-aggregate would itself be skew-bound.  Pass 2 merges
    the P·k summary rows (tiny) in a single-group ``applyInPandas``:
    summing MG counters then decrementing by the (k+1)-th largest is
    itself a valid MG summary of the concatenated stream (Agarwal et
    al., "Mergeable Summaries", PODS'12).

    Guarantee carried to the caller: any key with true frequency
    > W/(k+1) (W = total rows) survives both passes; counter values are
    lower bounds with error ≤ W/(k+1).
    """
    import pandas as pd

    out_schema = f"{key} long, mg_count long"

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[key].dropna().astype("int64"):
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [kk for kk in counters if counters[kk] == 1]
                    for kk in counters:
                        counters[kk] -= 1
                    for kk in dead:
                        del counters[kk]
        if counters:
            yield pd.DataFrame(
                {key: list(counters), "mg_count": list(counters.values())}
            )

    def mg_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = pdf.groupby(key, as_index=False)["mg_count"].sum()
        if len(merged) > k:
            cut = merged["mg_count"].nlargest(k + 1).iloc[-1]
            merged["mg_count"] -= cut
            merged = merged[merged["mg_count"] > 0]
        return merged

    local = df.select(key).mapInPandas(mg_partition, out_schema)
    return (
        local.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(
            lambda p: mg_merge(p[[key, "mg_count"]]), out_schema
        )
    )


@register("detect_hot_keys")  # rows-only: sketch candidates are approximate
def detect_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key detection — the reconnaissance step that feeds
    `join_skew_salted`'s salt list and AQE's skew thresholds: find
    candidate heavy user_ids in events WITHOUT a per-key aggregate
    (which would itself shuffle the hot key to one reducer).

    Misra-Gries candidates (bounded state per partition, mergeable) →
    exact recount of ONLY the candidate keys (semi-join-shaped, probe
    side is k keys) → share-of-total flag at the W/(k+1) guarantee
    line.  Output = candidates with exact counts; any key above the
    guarantee line is PROVABLY present (tests/test_properties.py builds
    a skewed corpus and asserts coverage + exactness + the state
    bound)."""
    # Single source of truth for the sketch budget: the W/(K+1)
    # guarantee line below MUST use the same K as the sketch.
    K = 8
    e = load_table(spark, sf_dir, "events")
    cand = F.broadcast(misra_gries_candidates(e, "user_id", k=K))
    total = e.agg(F.count("*").alias("w_total"))
    return (
        e.join(cand.select("user_id"), "user_id")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_exact"))
        .join(F.broadcast(total))
        .select(
            "user_id",
            "n_exact",
            "w_total",
            ((F.col("n_exact") * (K + 1)) > F.col("w_total")).alias(
                "above_guarantee_line"
            ),
        )
        .orderBy(F.col("n_exact").desc(), "user_id")
    )


@register(
    "rollup_stats",
    # Oracle aggregates the RAW rows directly per day — the Spark side
    # composes day moments from hour moments, so exact integer equality
    # proves the merge law, not just the arithmetic.
    oracle="""
    SELECT event_type, date_trunc('day', ts) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                    * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sumsq_cents
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    """,
)
def rollup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable moment statistics: per-hour (n, Σx, Σx²) merged
    into per-day moments — the parallel/streaming variance pattern
    (Chan et al. pairwise update; what `stddev` physically does inside
    every distributed engine, surfaced as a rollup so coarser levels
    NEVER rescan the fact table).  Completes the rollup family:
    count/sum/min/max (`rollup_time`), distinct (`rollup_hll`,
    sketches), and now second moments — mean/variance/stddev at any
    granularity are pure arithmetic over these three integers.

    Exactness discipline: values are 2-decimal doubles → integer cents
    at the scan, so Σx and Σx² are EXACT BIGINTs and hour→day merge is
    integer addition — byte-identical to the oracle's direct per-day
    aggregation over raw rows, which is the point: the oracle takes the
    other path (no hour level), so a hash match proves the merge law.
    Any float stddev derived downstream is the caller's one division."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    hourly = (
        e.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            cents.alias("c"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("sum_cents"),
            F.sum(F.col("c") * F.col("c")).alias("sumsq_cents"),
        )
    )
    return (
        hourly.groupBy(
            "event_type", F.date_trunc("day", F.col("hour")).alias("day")
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
            F.sum("sumsq_cents").alias("sumsq_cents"),
        )
    )


_MANIFEST_CACHE: dict = {}


def _manifest_layout(spark: SparkSession, sf_dir: str):
    """Range-clustered lineitem layout + its file manifest, built once per
    (session, sf_dir).

    The write clusters rows by ``l_shipdate`` via repartitionByRange, so
    each parquet file covers a narrow date band; the manifest is one row
    per file — (path, n_rows, min/max shipdate) — the essence of an
    Iceberg/Delta manifest.  Here it's built by one post-write scan
    grouped on ``input_file_name()``; a production writer gets the same
    stats free from the write tasks' parquet footers."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _MANIFEST_CACHE:
        return _MANIFEST_CACHE[key]
    out = scratch_path("sskos_manifest_layout_") + "/lineitem"
    (
        load_table(spark, sf_dir, "lineitem")
        .repartitionByRange(8, "l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    manifest = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("path"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
        )
        .collect()
    )
    _MANIFEST_CACHE[key] = (out, manifest)
    return _MANIFEST_CACHE[key]


LO_SHIP, HI_SHIP = "1997-03-01", "1997-09-01"


def manifest_pruned_scan(spark: SparkSession, sf_dir: str):
    """The pruned read path + skip evidence: (DataFrame, files_read,
    files_total).  File selection happens on MANIFEST rows (metadata;
    never opens data files outside the predicate's range) — the
    driver-side planning step every lakehouse table format performs."""
    out, manifest = _manifest_layout(spark, sf_dir)
    lo, hi = LO_SHIP, HI_SHIP
    selected = [
        r["path"]
        for r in manifest
        if str(r["max_ship"]) >= lo and str(r["min_ship"]) < hi
    ]
    pruned = spark.read.parquet(*selected).where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    return pruned, len(selected), len(manifest)


@register(
    "scan_manifest_pruned",
    oracle="""
    SELECT CAST(l_shipdate AS DATE) AS ship_day,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS total_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-09-01'
    GROUP BY CAST(l_shipdate AS DATE)
    """,
)
def scan_manifest_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level data skipping via a min/max manifest — the third leg of
    the pruning triad (directory pruning = `scan_partition_pruned`,
    runtime pruning = `scan_dynamic_pruning`, file-stats pruning =
    this): a range-clustered layout + an Iceberg/Delta-essence manifest
    lets the planner open only the files whose [min,max] band overlaps
    the predicate, then a residual filter exacts the boundary files.

    The oracle runs the same aggregate over the ORIGINAL table — a hash
    match proves the pruned path loses and invents nothing.  The skip
    evidence (files_read < files_total) is asserted in
    tests/test_plans.py; at sf0.01 the 6-month window reads 2 of 8
    files.  At 100 TB this is the difference between a table scan and
    opening 1% of files — and why ingest should cluster on the
    dominant predicate column."""
    pruned, _, _ = manifest_pruned_scan(spark, sf_dir)
    return pruned.groupBy(
        F.col("l_shipdate").cast("date").alias("ship_day")
    ).agg(
        F.count("*").alias("n_lines"),
        round_dec(F.sum(dec2("l_extendedprice")), 2)
        .cast("double")
        .alias("total_price"),
    )


def _morton(a: Column, b: Column, bits: int = 10) -> Column:
    """Interleave the low ``bits`` of two bucket ids into a Morton
    (Z-order) key — pure shift/and/or codegen expressions."""
    m = F.lit(0).cast("long")
    for i in range(bits):
        m = m.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return m


_ZORDER_CACHE: dict = {}


def _zorder_layout(spark: SparkSession, sf_dir: str):
    """Lineitem rewritten in Z-order over (l_partkey, l_shipdate) + the
    per-file two-column min/max manifest.  Built once per session."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _ZORDER_CACHE:
        return _ZORDER_CACHE[key]
    li = load_table(spark, sf_dir, "lineitem")
    lo = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_shipdate"), F.max("l_shipdate")
    ).first()
    pk_lo, pk_hi = lo[0], lo[1]
    day = F.datediff(F.col("l_shipdate").cast("date"), F.lit(str(lo[2])[:10]).cast("date"))
    day_hi = (lo[3] - lo[2]).days + 1
    pk_bucket = ((F.col("l_partkey") - pk_lo) * 1024 / (pk_hi - pk_lo + 1)).cast("long")
    day_bucket = (day.cast("long") * 1024 / F.lit(day_hi)).cast("long")
    out = scratch_path("sskos_zorder_layout_") + "/lineitem"
    (
        li.withColumn("__z", _morton(pk_bucket, day_bucket))
        .repartitionByRange(8, "__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out)
    )
    manifest = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("path"))
        .agg(
            F.min("l_partkey").alias("pk_min"),
            F.max("l_partkey").alias("pk_max"),
            F.min("l_shipdate").alias("sd_min"),
            F.max("l_shipdate").alias("sd_max"),
        )
        .collect()
    )
    _ZORDER_CACHE[key] = (out, manifest)
    return _ZORDER_CACHE[key]


PK_LO, PK_HI = 100, 300


def zorder_pruned_scan(spark: SparkSession, sf_dir: str, pred: str):
    """Manifest-select files for a partkey-window ('pk') or date-window
    ('date') predicate over the Z-ordered layout; returns (DataFrame,
    files_read, files_total)."""
    out, manifest = _zorder_layout(spark, sf_dir)
    if pred == "pk":
        sel = [r["path"] for r in manifest if r["pk_max"] >= PK_LO and r["pk_min"] <= PK_HI]
        cond = (F.col("l_partkey") >= PK_LO) & (F.col("l_partkey") <= PK_HI)
    else:
        sel = [
            r["path"]
            for r in manifest
            if str(r["sd_max"]) >= LO_SHIP and str(r["sd_min"]) < HI_SHIP
        ]
        cond = (F.col("l_shipdate") >= LO_SHIP) & (F.col("l_shipdate") < HI_SHIP)
    return spark.read.parquet(*sel).where(cond), len(sel), len(manifest)


@register(
    "scan_zorder_pruned",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS total_price
    FROM lineitem WHERE l_partkey BETWEEN 100 AND 300
    """,
)
def scan_zorder_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering for MULTI-column data skipping —
    the Delta `OPTIMIZE ZORDER BY` technique: interleaving the bit-
    normalized (l_partkey, l_shipdate) buckets into one sort key gives
    every file a narrow min-max band on BOTH columns, so the same
    manifest prunes partkey windows AND date windows (a single-column
    range cluster only ever skips on its one column;
    `scan_manifest_pruned` is that baseline).  tests/test_plans.py
    asserts files are actually skipped under each predicate class.

    The registered query answers a partkey-window aggregate through the
    pruned path; the oracle aggregates the ORIGINAL table, proving the
    curve layout + manifest selection + residual filter lose nothing.
    The Morton key is 20 shift/and/or codegen expressions — no UDF; at
    100 TB the same rewrite is an offline OPTIMIZE pass and the
    manifest lives in the table format's metadata layer."""
    pruned, _, _ = zorder_pruned_scan(spark, sf_dir, "pk")
    return pruned.agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("l_partkey").alias("n_parts"),
        round_dec(F.sum(dec2("l_extendedprice")), 2)
        .cast("double")
        .alias("total_price"),
    )


@register(
    "resample_interp",
    # Exactness: the interpolation numerator ``pc·DT + (nc−pc)·dt`` is
    # pure integer (cents × hour-gaps) and the 6-decimal HALF-UP
    # rounding is done in INTEGER space ((|ic|·2·10⁶ + d) div 2d) —
    # interpolated values routinely land exactly on .5·10⁻⁶ boundaries
    # (DT a power of two), where float ROUND diverges between engines
    # (observed: 33.011563 vs 33.011562); the only float op left is a
    # shared exact-integer / 10⁶ division.
    oracle="""
    WITH agg AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))) * 100, 0) AS BIGINT)
               AS vc
      FROM events WHERE user_id % 10 = 0
      GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM agg GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    ), filled AS (
      SELECT g.user_id, g.bucket, a.vc,
             CAST(epoch(g.bucket) AS BIGINT) // 3600 AS h,
             last_value(a.vc IGNORE NULLS) OVER wp AS pc,
             last_value(CASE WHEN a.vc IS NOT NULL
                             THEN CAST(epoch(g.bucket) AS BIGINT) // 3600 END IGNORE NULLS)
               OVER wp AS ph,
             first_value(a.vc IGNORE NULLS) OVER wn AS nc,
             first_value(CASE WHEN a.vc IS NOT NULL
                              THEN CAST(epoch(g.bucket) AS BIGINT) // 3600 END IGNORE NULLS)
               OVER wn AS nh
      FROM grid g LEFT JOIN agg a
        ON g.user_id = a.user_id AND g.bucket = a.bucket
      WINDOW wp AS (PARTITION BY g.user_id ORDER BY g.bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY g.user_id ORDER BY g.bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket,
           CASE WHEN vc IS NOT NULL THEN TRUE ELSE FALSE END AS observed,
           CAST(CASE WHEN ic < 0 THEN -1 ELSE 1 END
                * ((ABS(ic) * 2000000 + dt100) // (2 * dt100)) AS DOUBLE)
             / 1000000.0 AS v_interp
    FROM (
      SELECT user_id, bucket, vc,
             pc * dt + (nc - pc) * (h - ph) AS ic,
             100 * dt AS dt100
      FROM (
        SELECT *, CASE WHEN nh = ph THEN 1 ELSE nh - ph END AS dt
        FROM filled
      )
    )
    ORDER BY user_id, bucket
    """,
)
def resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + LINEAR-interpolation gap fill on the dense
    per-user hour grid — `resample_locf`'s twin for signals where a gap
    means "the value kept moving", not "the value held" (the hypertable
    ``interpolate`` gapfill mode).

    The grid spans each user's observed [min, max] hour, so every gap is
    interior and both bracketing observations exist: the filled value is
    ``prev + (next − prev)·(h − h_prev)/(h_next − h_prev)``, computed as
    one integer numerator (cents·hour-gaps — exact), HALF-UP rounded to
    6 decimals in pure integer arithmetic (float ROUND is engine-
    divergent exactly here — interpolants sit ON .5 ulp-of-6-decimals
    boundaries whenever the gap length is a power of two), then one
    shared exact division for display.  Observed buckets degenerate to
    the observation itself (h = ph, nh = ph guarded to a unit
    denominator).

    Scale notes: identical plan shape to `resample_locf` — one hourly
    rollup over raw events (the only fact-table pass), an output-sized
    grid explode, a left join back, and BOTH direction windows
    (preceding-LOCF and following-NOCB) on the same user_id
    partitioning: the explode, join, and both windows reuse ONE
    shuffle; no extra pass for the second direction."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 10 == 0)
    agg = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum(dec2("value")) * 100, 0).cast("long").alias("vc"),
    )
    bounds = agg.groupBy("user_id").agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias(
            "bucket"
        ),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    h = (F.unix_timestamp("bucket") / 3600).cast("long")
    hv = F.when(F.col("vc").isNotNull(), h)
    filled = (
        grid.join(agg, ["user_id", "bucket"], "left")
        .withColumn("h", h)
        .withColumn("pc", F.last("vc", ignorenulls=True).over(wp))
        .withColumn("ph", F.last(hv, ignorenulls=True).over(wp))
        .withColumn("nc", F.first("vc", ignorenulls=True).over(wn))
        .withColumn("nh", F.first(hv, ignorenulls=True).over(wn))
    )
    # dt is the GUARDED gap (1 when nh == ph, i.e. an observed bucket):
    # it must scale the numerator's pv term too, or observed buckets
    # degenerate to 0 instead of pv (caught by the interp-laws pytest —
    # the oracle shared the bug, so parity alone never would have).
    dt = F.when(F.col("nh") == F.col("ph"), F.lit(1)).otherwise(
        F.col("nh") - F.col("ph")
    )
    ic = F.col("pc") * dt + (F.col("nc") - F.col("pc")) * (
        F.col("h") - F.col("ph")
    )
    dt100 = 100 * dt
    # Integer HALF-UP to 6 decimals: sign · ((|ic|·2·10⁶ + d) div 2d) —
    # `div` keeps the quotient in LONG space (a float division would
    # lose ulps past 2⁵³) — then ONE shared exact division for display.
    r6 = F.expr(
        "(case when ic < 0 then -1 else 1 end)"
        " * ((abs(ic) * 2000000 + dt100) div (2 * dt100))"
    )
    return (
        filled.withColumn("ic", ic)
        .withColumn("dt100", dt100)
        .select(
            "user_id",
            "bucket",
            F.col("vc").isNotNull().alias("observed"),
            (r6.cast("double") / F.lit(1000000.0)).alias("v_interp"),
        )
        .orderBy("user_id", "bucket")
    )


@register(
    "table_skew_stats",
    # Gini via the sorted-cumulative identity G = (2·Σ(i·cᵢ) − (n+1)·Σc)
    # / (n·Σc): every term is an exact integer (counts × ranks); the one
    # float division is shared and ROUND(..,6)-stable.
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
    ), r AS (
      SELECT cnt,
             ROW_NUMBER() OVER (ORDER BY cnt, user_id) AS i,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS j
      FROM c
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
           ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
             AS top1_share,
           ROUND(CAST(SUM(CASE WHEN j <= 10 THEN cnt ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(cnt) AS DOUBLE), 6) AS top10_share,
           ROUND(CAST(2 * SUM(i * cnt) - (COUNT(*) + 1) * SUM(cnt) AS DOUBLE)
                 / CAST(COUNT(*) * SUM(cnt) AS DOUBLE), 6) AS gini
    FROM r
    """,
)
def table_skew_stats(
    spark: SparkSession, sf_dir: str, scale_twopass: bool = False
) -> DataFrame:
    """Key-distribution skew profile for a join/grouping key: key count,
    top-1/top-10 share, and the Gini coefficient of rows-per-key — the
    diagnostic that decides whether `join_skew_salted` / AQE skew
    handling is needed BEFORE a 100 TB shuffle is attempted (the
    planning companion to `detect_hot_keys`' runtime sketch).

    Gini uses the sorted-cumulative identity over per-key counts; ranks
    are deterministic ((cnt, key) ordered), every sum is exact integer
    arithmetic, and one shared float division lands far from rounding
    boundaries.

    Scale notes: the fact table collapses to one row per key (partial+
    final agg — the only events-sized work); the rank windows and final
    agg run on the key-sized rollup.  Default path: global rank windows
    over the rollup (fine while |keys| is modest).  The 100 TB path is
    ``scale_twopass=True`` (VERDICT r5 #3): the ascending Gini rank i
    comes from `common.global_row_number` — range-partition on
    (cnt, key) with sampled boundaries, rank locally per range, offset
    by the broadcast numPartitions-row cumulative sizes — so |keys| rows
    are never sorted in one task; and the descending top-10 rank is
    replaced by `orderBy(...).limit(10)`, which Spark executes as
    TakeOrderedAndProject (per-partition top-10, merged — no global
    sort).  Identical output, pinned by
    tests/test_properties.py::test_table_skew_stats_twopass_equivalence;
    the two-pass plan's range exchange is plan-asserted there."""
    c = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").alias("cnt")
    )
    n = F.count("*")
    tot = F.sum("cnt")
    gini = lambda sic: F.round(  # noqa: E731 - shared by both paths
        (2 * sic - (n + 1) * tot).cast("double") / (n * tot).cast("double"), 6
    ).alias("gini")
    if scale_twopass:
        ranked = global_row_number(
            c, [F.col("cnt"), F.col("user_id")], out_col="i"
        )
        main = ranked.agg(
            n.cast("long").alias("n_keys"),
            tot.cast("long").alias("n_rows"),
            F.max("cnt").cast("long").alias("max_key_rows"),
            tot.cast("double").alias("_tot_d"),
            gini(F.sum(F.col("i") * F.col("cnt"))),
        )
        top10 = (
            c.orderBy(F.col("cnt").desc(), "user_id")
            .limit(10)
            .agg(F.sum("cnt").cast("double").alias("_t10"))
        )
        return main.join(F.broadcast(top10)).select(
            "n_keys",
            "n_rows",
            "max_key_rows",
            F.round(
                F.col("max_key_rows").cast("double") / F.col("_tot_d"), 6
            ).alias("top1_share"),
            F.round(F.col("_t10") / F.col("_tot_d"), 6).alias("top10_share"),
            "gini",
        )
    wi = Window.orderBy("cnt", "user_id")
    wj = Window.orderBy(F.col("cnt").desc(), "user_id")
    r = c.select(
        "cnt",
        F.row_number().over(wi).alias("i"),
        F.row_number().over(wj).alias("j"),
    )
    return r.agg(
        n.cast("long").alias("n_keys"),
        tot.cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_key_rows"),
        F.round(F.max("cnt").cast("double") / tot.cast("double"), 6).alias(
            "top1_share"
        ),
        F.round(
            F.sum(F.when(F.col("j") <= 10, F.col("cnt")).otherwise(0)).cast(
                "double"
            )
            / tot.cast("double"),
            6,
        ).alias("top10_share"),
        gini(F.sum(F.col("i") * F.col("cnt"))),
    )


_QSK_K = 64  #: centroids per sketch; rank error ≤ ~1/K after one merge


def _qsketch_compress(values, weights, k=_QSK_K):
    """Compress weighted points to ≤ k equal-weight centroids (sorted by
    value).  This is the t-digest idea with uniform (not quantile-biased)
    bucket sizing — simpler, mergeable, rank error ≤ total_weight/k per
    merge level."""
    import numpy as np

    order = np.argsort(values, kind="stable")
    v, w = np.asarray(values, dtype=float)[order], np.asarray(
        weights, dtype=float
    )[order]
    total = w.sum()
    if len(v) <= k:
        return v, w
    bucket = total / k
    out_v, out_w = [], []
    acc_w = 0.0
    acc_vw = 0.0
    for vi, wi in zip(v, w):
        acc_w += wi
        acc_vw += vi * wi
        if acc_w >= bucket:
            out_v.append(acc_vw / acc_w)
            out_w.append(acc_w)
            acc_w = acc_vw = 0.0
    if acc_w > 0:
        out_v.append(acc_vw / acc_w)
        out_w.append(acc_w)
    import numpy as _np

    return _np.asarray(out_v), _np.asarray(out_w)


def _qsketch_quantile(v, w, q):
    """Weighted-rank quantile estimate from a centroid list."""
    import numpy as np

    cum = np.cumsum(w) - w / 2.0
    target = q * w.sum()
    return float(np.interp(target, cum, v))


@register("rollup_tdigest")  # rows-only: sketch estimates are approx by design
def rollup_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable QUANTILES: per-hour value sketches merged into
    per-day p50/p95/p99 — the missing member of the rollup family
    (count/sum/min/max compose exactly in `rollup_time`, distincts via
    HLL in `rollup_hll`, moments in `rollup_stats`; quantiles do NOT
    compose exactly and need a mergeable sketch — the t-digest
    pattern).

    Two Arrow-batched `applyInPandas` levels, mirroring how a
    lakehouse maintains quantile rollups: (1) per (day, hour) build a
    ≤ 64-centroid equal-weight summary from raw values — the ONLY pass
    over events; (2) per day, merge that day's hourly centroid lists
    (concat → weighted recompress) and read p50/p95/p99 off the merged
    summary.  Rank error is bounded by ~W/64 per merge level
    (asserted against exact percentiles in tests/test_properties.py —
    observed ≤ 2·W/64 end-to-end).

    Scale notes: level-1 groups are (day, hour) — bounded state,
    embarrassingly parallel; level-2 groups are days whose input is
    24 × 64 centroids, not raw events.  Wire traffic after the first
    pass is centroids only (~1 KB/hour).  At 100 TB swap level 1's
    per-group numpy for a true streaming t-digest; every shape above
    it is unchanged."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        v, w = _qsketch_compress(
            pdf["value"].to_numpy(), [1.0] * len(pdf)
        )
        return pd.DataFrame(
            {
                "day": [pdf["day"].iloc[0]] * len(v),
                "c_value": v,
                "c_weight": w,
            }
        )

    hourly = e.groupBy("day", "hour").applyInPandas(
        build, "day date, c_value double, c_weight double"
    )

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        v, w = _qsketch_compress(
            pdf["c_value"].to_numpy(), pdf["c_weight"].to_numpy()
        )
        return pd.DataFrame(
            {
                "day": [pdf["day"].iloc[0]],
                "n": [float(w.sum())],
                "p50": [_qsketch_quantile(v, w, 0.50)],
                "p95": [_qsketch_quantile(v, w, 0.95)],
                "p99": [_qsketch_quantile(v, w, 0.99)],
            }
        )

    return (
        hourly.groupBy("day")
        .applyInPandas(merge, "day date, n double, p50 double, p95 double, p99 double")
        .orderBy("day")
    )


@register("rollup_hll_intersect")  # rows-only: sketch estimates approx by design
def rollup_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set ALGEBRA: estimated audience overlap |A∩B| for every pair
    of event types via inclusion–exclusion over mergeable sketches
    (|A| + |B| − |A∪B|) — the segment-overlap question every audience/
    feature-coverage dashboard asks, answered without ever co-shuffling
    the two user sets (HLL unions natively; intersections don't, and
    inclusion–exclusion is the standard estimator, error ∝ |A∪B|'s —
    which is why the pytest bounds error relative to the UNION size,
    not the intersection).

    Scale notes: ONE pass builds a sketch per type (partial+final
    `hll_sketch_agg`); the pair grid is |types|² rows of sketch pairs
    (tiny) and every estimate is sketch-local arithmetic — no re-scan,
    no distinct shuffle.  Same posture as `rollup_hll`'s hour→day
    merge: sketches are the only thing that moves."""
    e = load_table(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("exact").alias("exact_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("exact").alias("exact_b"),
    )
    # |event_types| is a bounded domain (5 in the fixture, O(100) in any
    # real catalog), so the inequality pair grid is an explicit broadcast
    # NL join over a sketch-sized frame — rows moved = |types|², never
    # corpus-sized.  tests/test_plans.py allowlists this BNL.
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    est_u = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    return pairs.select(
        "type_a",
        "type_b",
        est_a.cast("long").alias("approx_a"),
        est_b.cast("long").alias("approx_b"),
        est_u.cast("long").alias("approx_union"),
        (est_a + est_b - est_u).cast("long").alias("approx_intersect"),
    ).orderBy("type_a", "type_b")


@register(
    "rollup_bitmap_distinct",
    # Oracle is the DIRECT count-distinct — the hash match proves the
    # bitmap algebra (two OR-merge levels + popcount) exactly equals
    # naive distinct, cross-algorithm (cf. graph_triangle_count,
    # events_rolling_active).  Week boundaries are epoch-day integer
    # arithmetic on both sides — neither engine's week-truncation
    # convention is trusted (orders_seasonality's dow lesson).
    oracle="""
    WITH e AS (
      SELECT event_type,
             (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS week_id,
             user_id
      FROM events
    )
    SELECT event_type,
           CAST(week_id AS BIGINT) AS week_id,
           DATE '1970-01-01' + CAST(week_id * 7 AS INT) AS week_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM e GROUP BY event_type, week_id
    ORDER BY event_type, week_id
    """,
)
def rollup_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per (event_type, week) through a mergeable
    BITMAP rollup — the ClickHouse ``groupBitmap`` / roaring-bitmap
    pattern: distinct state that, unlike a plain COUNT(DISTINCT),
    COMPOSES across rollup levels (day words OR-merge into week words
    into month words; sketches do this approximately, bitmaps do it
    exactly).  The rollup family's fourth member: count/sum
    `rollup_time`, approx-distinct `rollup_hll`, moments
    `rollup_stats`, quantiles `rollup_tdigest` — and exact-distinct
    here.

    Encoding: user_id maps to (word_id = id div 62, bit = id mod 62) —
    62 bits per BIGINT word keeps both engines away from the sign-bit
    shift overflow (DuckDB raises on 1<<63, measured).  Level 1
    aggregates the fact table ONCE into per-(type, day, word) OR-words;
    level 2 merges day→week by OR without touching facts; the count is
    Σ popcount(word).  All integer-exact, partial-aggregable, and the
    per-key state is |id-universe|/62 words WORST case — dense-id
    universes (dim keys, hashed-and-bucketed ids) are where bitmap
    distinct beats HLL on both exactness and merge cost; sparse 64-bit
    universes belong to `rollup_hll`.

    Scale notes: one fact scan; both merge levels are partial+final
    hash aggs keyed (type, period, word_id) — word-parallel, no
    single-reducer popcount; week boundaries are epoch-day div 7 so no
    calendar function is on the cross-engine path."""
    e = load_table(spark, sf_dir, "events")
    day_words = (
        e.select(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .alias("epoch_day"),
            F.expr("user_id div 62").alias("word_id"),
            # SQL form: the python F.shiftleft wrapper only takes a
            # literal bit count; the engine function itself is fine
            # with a column.
            F.expr("shiftleft(1L, cast(user_id % 62 as int))").alias("bit"),
        )
        .groupBy("event_type", "epoch_day", "word_id")
        .agg(F.bit_or("bit").alias("word"))
    )
    week_words = (
        day_words.withColumn("week_id", F.expr("epoch_day div 7"))
        .groupBy("event_type", "week_id", "word_id")
        .agg(F.bit_or("word").alias("word"))
    )
    return (
        week_words.groupBy("event_type", "week_id")
        .agg(F.sum(F.bit_count("word")).cast("long").alias("n_users"))
        .select(
            "event_type",
            F.col("week_id").cast("long").alias("week_id"),
            F.date_add(
                F.lit("1970-01-01").cast("date"),
                (F.col("week_id") * 7).cast("int"),
            ).alias("week_start"),
            "n_users",
        )
        .orderBy("event_type", "week_id")
    )


_KMV_K = 64


@register(
    "agg_kmv_bottomk",
    # Deterministic by construction: the md5-derived 60-bit hash is the
    # SAME function on both engines (dedup_minhash_md5's recipe), so the
    # bottom-k multiset, the k-th minimum, and therefore the ESTIMATE
    # are bit-identical — a sketch whose full pipeline is oracle-proven,
    # not just error-bounded.  Ties at the k boundary keep the multiset
    # of hash values identical regardless of row_number tie order.
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), h AS (
      SELECT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM du
    ), rk AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
      FROM h
    ), k AS (
      SELECT event_type, MAX(h) AS u_k, COUNT(*) AS n_k,
             md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY h))
               AS bottomk_md5
      FROM rk WHERE rk <= {_KMV_K} GROUP BY event_type
    ), ex AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact FROM du
      GROUP BY event_type
    ), est AS (
      SELECT e.event_type, e.n_exact,
             CAST(CASE WHEN k.n_k < {_KMV_K} THEN k.n_k
                  ELSE floor(({_KMV_K} - 1.0) * 1152921504606846976.0
                             / k.u_k) END AS BIGINT) AS kmv_est,
             k.bottomk_md5
      FROM ex e JOIN k ON e.event_type = k.event_type
    )
    SELECT event_type, n_exact, kmv_est,
           CAST((abs(kmv_est - n_exact) * 1000) // n_exact AS BIGINT)
             AS err_permille,
           bottomk_md5
    FROM est ORDER BY event_type
    """,
)
def agg_kmv_bottomk(
    spark: SparkSession, sf_dir: str, scale_merge: bool = False
) -> DataFrame:
    """KMV (k-minimum-values) bottom-k sketch per event type — ONE
    mergeable state that is simultaneously (a) a uniform distinct-user
    SAMPLE (hash-rank sampling: the k smallest hashes are a uniform
    draw from the distinct universe — the deterministic eval-set
    constructor no `rand()` sample can give you) and (b) a distinct
    estimator: n̂ = (k−1)/U₍ₖ₎ (Bar-Yossef et al. 2002), the estimator
    family Theta sketches build on.  Completes the distinct toolbox:
    exact-dense `rollup_bitmap_distinct`, approx-sparse `rollup_hll`,
    and here sample+estimate in one pass.

    The 60-bit hash is md5-derived identically on both engines, so
    unlike HLL the WHOLE sketch is oracle-proven: bottom-k multiset
    (certified by an order-fixed md5 digest), k-th minimum, estimate
    and per-mille error all hash-match.  Sub-k groups fall back to the
    exact count (n̂ = n when n < k), exercised nowhere on this fixture
    but guarded on both sides.

    Scale notes: the only fact-sized work is the (type, user) distinct
    collapse.  Default path: rank window on the distinct-user frame
    partitioned by type — every distinct hash of a type flows through
    that type's one window task.  The 100 TB path is
    ``scale_merge=True`` (VERDICT r5 #3), the mergeable formulation the
    sketch is DEFINED by: per-input-partition bottom-k first (each
    (type, partition) cell collapses to ≤ k hashes map-side), then the
    per-type merge re-bottom-ks the union — the final per-type task
    sees ≤ k·partitions rows, never the full distinct universe, and no
    Window appears in the plan (asserted in tests).  Correct because
    bottomk is a semigroup: bottomk(A ∪ B) = bottomk(bottomk(A) ∪
    bottomk(B)) — the merge law proven by the hypothesis property test
    in tests/test_properties.py, and the Spark twin proven equal to the
    window form on the fixture."""
    du = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = du.select("event_type", h.alias("h"))
    if scale_merge:
        part = hashed.groupBy(
            "event_type", F.spark_partition_id().alias("_pid")
        ).agg(
            F.slice(F.array_sort(F.collect_list("h")), 1, _KMV_K).alias("hs")
        )
        bk = (
            part.select("event_type", F.explode("hs").alias("h"))
            .groupBy("event_type")
            .agg(
                F.slice(F.array_sort(F.collect_list("h")), 1, _KMV_K).alias(
                    "bk"
                )
            )
        )
        k = bk.select(
            "event_type",
            F.element_at("bk", F.size("bk")).alias("u_k"),
            F.size("bk").cast("long").alias("n_k"),
            F.md5(
                F.concat_ws(
                    ",", F.transform("bk", lambda x: x.cast("string"))
                )
            ).alias("bottomk_md5"),
        )
    else:
        w = Window.partitionBy("event_type").orderBy("h")
        topk = hashed.withColumn("rk", F.row_number().over(w)).where(
            F.col("rk") <= _KMV_K
        )
        k = topk.groupBy("event_type").agg(
            F.max("h").alias("u_k"),
            F.count("*").alias("n_k"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("h")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("bottomk_md5"),
        )
    ex = du.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    est = ex.join(k, "event_type").select(
        "event_type",
        "n_exact",
        F.when(F.col("n_k") < _KMV_K, F.col("n_k"))
        .otherwise(
            F.floor(
                F.lit(float(_KMV_K - 1)) * 1152921504606846976.0 / F.col("u_k")
            )
        )
        .cast("long")
        .alias("kmv_est"),
        "bottomk_md5",
    )
    return est.select(
        "event_type",
        "n_exact",
        "kmv_est",
        F.expr("(abs(kmv_est - n_exact) * 1000) div n_exact")
        .cast("long")
        .alias("err_permille"),
        "bottomk_md5",
    ).orderBy("event_type")


@register("scan_cached_reuse")
def scan_cached_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cache reuse — the interactive-analytics pattern distinct
    from `stage()`'s lineage truncation: one filtered projection is
    persisted, consumed by TWO different aggregations (by return flag,
    by month), and unpersisted — the second consumer must hit
    InMemoryTableScan, not re-read parquet (plan-asserted in
    tests/test_plans.py).  Output stitches both rollups with a source
    tag so the reuse is visible in the result.

    Scale notes: caching pays when (re-scan cost × consumers) exceeds
    memory-pressure cost — right for a pruned slice feeding a dashboard
    fan-out, wrong for a one-pass pipeline (which is why the engine's
    iterative loops use `stage()`/localCheckpoint instead: truncation
    without cross-job retention).  MEMORY_AND_DISK default spills
    rather than recomputes; unpersist is explicit because a 100 TB
    cluster's block manager is a shared resource -- and because the
    returned frame must not depend on the released cache, the stitched
    ROLLUP-sized result (flags + months ~= 90 rows) is materialized
    before the unpersist."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 25)
        .select("l_returnflag", "l_shipdate", dec2("l_extendedprice", 14).alias("p"))
    )
    li.persist()
    try:
        by_flag = li.groupBy(F.col("l_returnflag").alias("k")).agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("p").cast("double").alias("revenue"),
        ).select(F.lit("by_flag").alias("rollup"), "k", "n_rows", "revenue")
        by_month = li.groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("k")
        ).agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("p").cast("double").alias("revenue"),
        ).select(F.lit("by_month").alias("rollup"), "k", "n_rows", "revenue")
        out = by_flag.unionAll(by_month).orderBy("rollup", "k")
        # Bounded materialization (~90 rows: |returnflag| + |months| of a
        # bounded calendar): the result must OUTLIVE the unpersist below —
        # returning the lazy frame would recompute against an unpersisted
        # lineage.  Rollup-sized by construction, never corpus-sized.
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        li.unpersist()
    return out


@register(
    "agg_kmv_jaccard",
    # KMV set-similarity estimates for all 10 unordered event-type
    # pairs: per pair, the bottom-64 of the md5-derived 60-bit user
    # hashes over A∪B; Jaccard-hat = |{bottom-k} ∩ A ∩ B| / k_eff,
    # union-hat = (k−1)·2^60/u_k, intersect-hat = their product — the
    # exact values ride along so the error is REPORTED, not hoped.
    # Deterministic end to end: same hash both engines, ties keep the
    # bottom-k multiset identical.
    oracle=f"""
    WITH pairs(type_a, type_b) AS (
        VALUES ('click','error'), ('click','purchase'), ('click','signup'),
               ('click','view'), ('error','purchase'), ('error','signup'),
               ('error','view'), ('purchase','signup'), ('purchase','view'),
               ('signup','view')
    ), du AS (
        SELECT DISTINCT event_type, user_id FROM events
    ), mem AS (
        SELECT p.type_a, p.type_b, d.user_id,
               MAX(CASE WHEN d.event_type = p.type_a THEN 1 ELSE 0 END)
                   AS has_a,
               MAX(CASE WHEN d.event_type = p.type_b THEN 1 ELSE 0 END)
                   AS has_b,
               CAST(('0x' || substr(md5(CAST(d.user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM du d JOIN pairs p
          ON d.event_type IN (p.type_a, p.type_b)
        GROUP BY p.type_a, p.type_b, d.user_id
    ), exact AS (
        SELECT type_a, type_b,
               COUNT(*) AS exact_union,
               SUM(has_a * has_b) AS exact_both
        FROM mem GROUP BY type_a, type_b
    ), rk AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                                     ORDER BY h) AS rk
        FROM mem
    ), sk AS (
        SELECT type_a, type_b,
               COUNT(*) AS k_eff,
               SUM(has_a * has_b) AS both_in_k,
               MAX(h) AS u_k
        FROM rk WHERE rk <= {{K}} GROUP BY type_a, type_b
    )
    SELECT e.type_a, e.type_b,
           CAST(e.exact_union AS BIGINT) AS exact_union,
           CAST(e.exact_both AS BIGINT) AS exact_both,
           CAST(e.exact_both * 1000000 // e.exact_union AS BIGINT)
               AS exact_jaccard_ppm,
           CAST(s.k_eff AS BIGINT) AS k_eff,
           CAST(CASE WHEN s.k_eff < {{K}} THEN s.k_eff
                ELSE floor(({{K}} - 1.0) * 1152921504606846976.0 / s.u_k)
                END AS BIGINT) AS kmv_union_est,
           CAST(s.both_in_k * 1000000 // s.k_eff AS BIGINT)
               AS kmv_jaccard_ppm,
           CAST((s.both_in_k * 1000000 // s.k_eff)
                * (CASE WHEN s.k_eff < {{K}} THEN s.k_eff
                   ELSE floor(({{K}} - 1.0) * 1152921504606846976.0 / s.u_k)
                   END) // 1000000 AS BIGINT) AS kmv_intersect_est,
           CAST(abs(s.both_in_k * 1000000 // s.k_eff
                    - e.exact_both * 1000000 // e.exact_union) // 1000
                AS BIGINT) AS jaccard_err_permille
    FROM exact e JOIN sk s
      ON e.type_a = s.type_a AND e.type_b = s.type_b
    """.replace("{K}", str(_KMV_K)),
)
def agg_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) set-similarity sketch, full pipeline
    oracle-proven for every unordered event-type audience pair: the
    bottom-64 user hashes of each pair's union estimate the union size
    (k-th-minimum estimator), the bottom-k's A∩B fraction estimates
    Jaccard, and their product estimates the intersection — the
    mergeable-sketch answer to `audience_overlap_exact`, with the
    exact values computed alongside so the estimate error is REPORTED
    per pair, never assumed.  Deterministic by construction:
    `dedup_minhash_md5`'s 60-bit md5 hash is the same function on both
    engines, so sketch contents and estimates match bit-for-bit
    (`agg_kmv_bottomk`'s recipe, extended from cardinality to
    similarity).

    Scale notes: ONE distinct pass + a 10-row broadcast pair join
    fan the per-user membership flags (|users| x |pairs| frame, dim x
    10 — never event-grain); the bottom-k is a pair-partitioned top-k
    window (Spark's per-key sort-limit, no global sort) and every
    later frame is 10 rows.  At production scale the per-pair
    bottom-k travels as a 64-value state — the `scale_merge`
    semigroup pattern proven on `agg_kmv_bottomk`."""
    types = ["click", "error", "purchase", "signup", "view"]
    pair_rows = [
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    ]
    pairs = spark.createDataFrame(pair_rows, "type_a string, type_b string")
    e = load_table(spark, sf_dir, "events")
    du = e.select("event_type", "user_id").distinct()
    mem = (
        du.join(
            F.broadcast(pairs),
            (du.event_type == pairs.type_a)
            | (du.event_type == pairs.type_b),
        )
        .groupBy("type_a", "type_b", "user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("has_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("has_b"),
        )
        .withColumn(
            "h",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long"),
        )
    )
    exact = mem.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("exact_union"),
        F.sum(F.col("has_a") * F.col("has_b")).alias("exact_both"),
    )
    w = Window.partitionBy("type_a", "type_b").orderBy("h")
    sk = (
        mem.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _KMV_K)
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("k_eff"),
            F.sum(F.col("has_a") * F.col("has_b")).alias("both_in_k"),
            F.max("h").alias("u_k"),
        )
    )
    est = F.expr(
        f"CASE WHEN k_eff < {_KMV_K} THEN k_eff"
        f" ELSE CAST(floor(({_KMV_K} - 1.0) * 1152921504606846976.0 / u_k)"
        f" AS BIGINT) END"
    )
    return exact.join(sk, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        F.col("exact_union").cast("long").alias("exact_union"),
        F.col("exact_both").cast("long").alias("exact_both"),
        F.expr("exact_both * 1000000 div exact_union")
        .cast("long")
        .alias("exact_jaccard_ppm"),
        F.col("k_eff").cast("long").alias("k_eff"),
        est.cast("long").alias("kmv_union_est"),
        F.expr("both_in_k * 1000000 div k_eff")
        .cast("long")
        .alias("kmv_jaccard_ppm"),
        F.expr(
            f"(both_in_k * 1000000 div k_eff)"
            f" * (CASE WHEN k_eff < {_KMV_K} THEN k_eff"
            f"    ELSE CAST(floor(({_KMV_K} - 1.0) * 1152921504606846976.0"
            f" / u_k) AS BIGINT) END) div 1000000"
        )
        .cast("long")
        .alias("kmv_intersect_est"),
        F.expr(
            "abs(both_in_k * 1000000 div k_eff"
            " - exact_both * 1000000 div exact_union) div 1000"
        )
        .cast("long")
        .alias("jaccard_err_permille"),
    )


@register(
    "agg_incremental_state_merge",
    # Incremental-view-maintenance proof: the oracle RECOMPUTES the
    # per-type aggregate over the full table (with base/delta split
    # counts as conditional aggs); the Spark side computes the base
    # state (days before the cutover = max day - 7) and the delta
    # state SEPARATELY and merges them with semigroup arithmetic
    # (sum+sum, count+count, least/greatest) — hash-equality IS the
    # merge-law proof on real data.
    oracle="""
    WITH hz AS (
        SELECT CAST(MAX(ts) AS DATE) - 7 AS cut FROM events
    ), e AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CAST(ts AS DATE) AS d
        FROM events
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN d < cut THEN 1 ELSE 0 END) AS BIGINT)
               AS base_n,
           CAST(SUM(CASE WHEN d >= cut THEN 1 ELSE 0 END) AS BIGINT)
               AS delta_n,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean_cents,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM e, hz GROUP BY 1
    """,
)
def agg_incremental_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance, proven against recompute: the
    per-event-type rollup is computed as TWO independent aggregate
    states — the base (all days before a cutover at max day - 7, i.e.
    yesterday's materialized rollup) and the delta (the last week's
    arrivals) — merged with pure semigroup arithmetic (counts and sums
    add; min/max take least/greatest; mean derives from merged sums,
    never from merged means).  The oracle recomputes the same numbers
    from the full table in one pass, so the driver's hash equality is
    a merge-law proof on real data — the `agg_kmv_bottomk
    scale_merge` discipline applied to the plain-aggregate family.

    This is THE 100 TB maintenance pattern: yesterday's state is
    partition-pruned parquet (never rescanned), today's delta is the
    only fact-grain work, and the merge is dimension-sized.  At
    production scale the base state is `sink_txn_log`'s committed
    table and this operator is the refresh job's body.

    Scale notes: each branch is ONE map-side-combined hash agg over
    its partition-pruned slice (the cutover predicate prunes on the
    date column); the merge is a |types|-row full-outer join.  The
    1-row cutover frame broadcasts onto the scan (reviewed NLJ
    allowlist row — `stream_offset_commit_lag`'s horizon pattern)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.to_date("ts").alias("d"),
    )
    hz = e.agg(F.date_sub(F.max("d"), 7).alias("cut"))
    tagged = e.join(F.broadcast(hz))

    def state(df: DataFrame, prefix: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias(f"{prefix}_n"),
            F.sum("cents").alias(f"{prefix}_sum"),
            F.min("cents").alias(f"{prefix}_min"),
            F.max("cents").alias(f"{prefix}_max"),
        )

    base = state(tagged.where(F.col("d") < F.col("cut")), "b")
    delta = state(tagged.where(F.col("d") >= F.col("cut")), "dl")
    merged = base.join(delta, "event_type", "full_outer")
    bn = F.coalesce("b_n", F.lit(0))
    dn = F.coalesce("dl_n", F.lit(0))
    bs = F.coalesce("b_sum", F.lit(0))
    ds = F.coalesce("dl_sum", F.lit(0))
    return merged.select(
        "event_type",
        bn.cast("long").alias("base_n"),
        dn.cast("long").alias("delta_n"),
        (bn + dn).cast("long").alias("n"),
        (bs + ds).cast("long").alias("sum_cents"),
        F.expr(
            "(coalesce(b_sum, 0) + coalesce(dl_sum, 0))"
            " div (coalesce(b_n, 0) + coalesce(dl_n, 0))"
        )
        .cast("long")
        .alias("mean_cents"),
        F.least("b_min", "dl_min").cast("long").alias("min_cents"),
        F.greatest("b_max", "dl_max").cast("long").alias("max_cents"),
    )


#: Count-Min sketch geometry: d hash rows × w columns = 256 cells of
#: int64 state.  At this width the fixture's ~1.5k distinct users load
#: ~6 keys/cell/row, so overestimates are REAL and reported.
_CMS_D = 4
_CMS_W = 64
_CMS_TOPK = 10


@register(
    "agg_countmin_heavyhitters",
    # Full-sketch determinism (the agg_kmv_bottomk discipline): the
    # d=4 cell coordinates are md5-derived identically on both engines,
    # the 256-cell table is exact integer counts, and the CMS estimate
    # for each of the top-10 exact heavy hitters is the min over its 4
    # cells — so estimate AND overcount are bit-reproducible, not just
    # statistically plausible.
    oracle=f"""
    WITH ug AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
    ), cells AS (
        SELECT r.i AS i,
               CAST(('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || ':'
                                        || CAST(r.i AS VARCHAR)), 1, 15))
                    AS BIGINT) % {_CMS_W} AS cell,
               SUM(u.cnt) AS total
        FROM ug u, range({_CMS_D}) r(i)
        GROUP BY 1, 2
    ), top AS (
        SELECT user_id, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rk
        FROM ug ORDER BY cnt DESC, user_id LIMIT {_CMS_TOPK}
    ), est AS (
        SELECT t.user_id, t.cnt, t.rk, MIN(c.total) AS cms_est
        FROM top t CROSS JOIN range({_CMS_D}) r(i)
        JOIN cells c
          ON c.i = r.i
         AND c.cell = CAST(('0x' || substr(md5(CAST(t.user_id AS VARCHAR)
                                               || ':' || CAST(r.i AS VARCHAR)),
                                           1, 15)) AS BIGINT) % {_CMS_W}
        GROUP BY 1, 2, 3
    )
    SELECT CAST(rk AS BIGINT) AS rk,
           user_id,
           CAST(cnt AS BIGINT) AS exact_cnt,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - cnt AS BIGINT) AS overcount
    FROM est ORDER BY rk
    """,
)
def agg_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy-hitter readout: build the d=4 × w=64 CMS
    of per-user event counts (cell coordinates md5-derived, shared with
    the oracle), then for the top-10 exact heavy hitters report the
    exact count, the CMS estimate (min over the key's 4 cells), and the
    guaranteed-non-negative overcount — the error a production CMS
    would silently make, REPORTED on real data.  Complements
    `rollup_hll`/`agg_kmv_bottomk` (distinct sketches) and
    `rollup_tdigest` (quantile sketch) with the frequency sketch that
    completes the streaming-summary family; 256 int64 cells are the
    entire mergeable state (cells add — the semigroup law
    `agg_incremental_state_merge` proves for plain aggregates applies
    cell-wise).

    Scale notes: ONE user-grain hash agg (the corpus-sized work, the
    proven dau/mau shuffle shape); the 4× coordinate fanout runs on
    the |users| rollup, never event grain, collapsing to ≤256 cells;
    the top-10 is sort+limit (TakeOrdered — distributed, no global
    window); estimates join the 10×4 coordinate frame to the
    broadcast 256-cell table."""
    e = load_table(spark, sf_dir, "events")
    ug = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))

    def coord(uid, i):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", uid.cast("string"), i.cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(_CMS_W),
        )

    fan = ug.select(
        "user_id",
        "cnt",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("i"),
    )
    cells = fan.groupBy(
        "i", coord(F.col("user_id"), F.col("i")).alias("cell")
    ).agg(F.sum("cnt").alias("total"))
    top = (
        ug.orderBy(F.desc("cnt"), "user_id")
        .limit(_CMS_TOPK)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), "user_id")
            ),
        )
    )
    est = (
        top.select(
            "user_id",
            "cnt",
            "rk",
            F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("i"),
        )
        .withColumn("cell", coord(F.col("user_id"), F.col("i")))
        .join(F.broadcast(cells), ["i", "cell"])
        .groupBy("rk", "user_id", "cnt")
        .agg(F.min("total").alias("cms_est"))
    )
    return est.select(
        F.col("rk").cast("long").alias("rk"),
        "user_id",
        F.col("cnt").cast("long").alias("exact_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("cnt")).cast("long").alias("overcount"),
    ).orderBy("rk")
