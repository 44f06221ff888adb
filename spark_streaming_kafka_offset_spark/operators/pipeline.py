"""§2 extension: training-data-pipeline table operators — the ingestion
patterns every large-scale dataset build needs between "raw events" and
"training shards": reproducible splits, CDC latest-record compaction, and
batch sessionization.

Scale notes (100 TB):

* ``split_hash`` is a pure scan-side expression — no shuffle, no state,
  and (unlike ``df.sample``) STABLE: the same row lands in the same split
  on every run, engine, retry, and partition layout, because membership is
  a function of the row's key alone.  This is the only defensible way to
  cut train/val/test from 100 TB (a seeded ``sample`` changes membership
  whenever partitioning changes).
* ``latest_by_key`` is the standard CDC/upsert compaction: one shuffle on
  the key, per-key sort, keep rank 1.  At scale this is exactly
  ``max_by``-per-key; the window form keeps the whole row without a
  self-join.
* ``sessionize_batch`` shuffles once on ``user_id``; the gap-flag cumsum
  and the per-session aggregate reuse the SAME partitioning (Catalyst
  collapses the exchanges — asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..common import dec2, dsum2
from ..plans.registry import register
from ..session import load_table

#: Split boundaries on the first hex digit of md5(key): 16 buckets →
#: 12/2/2 = 75% / 12.5% / 12.5%.  Hex digits sort '0'..'9' < 'a'..'f' in
#: both engines (ASCII), so plain string comparison is portable.
_SPLIT_CASE = "CASE WHEN {b} < 'c' THEN 'train' WHEN {b} < 'e' THEN 'val' ELSE 'test' END"


@register(
    "split_hash",
    oracle=f"""
    SELECT {_SPLIT_CASE.format(b="substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)")}
               AS split,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY 1
    """,
)
def split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split of ``orders`` by hashed key,
    summarized per split.  md5 (not xxhash64) because the split must be
    engine-portable — the oracle reproduces the exact membership."""
    o = load_table(spark, sf_dir, "orders")
    b = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    split = (
        F.when(b < "c", "train").when(b < "e", "val").otherwise("test")
    ).alias("split")
    return o.groupBy(split).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum2("o_totalprice", "total_price", precision=14),
    )


@register(
    "latest_by_key",
    oracle="""
    SELECT user_id, ts, event_type, value FROM (
        SELECT user_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction: the most recent event per user (whole row), unique
    tie-break on event_id.  One shuffle, rank-1 filter — Spark pushes the
    ``rn = 1`` predicate into the window sort as a top-1 per key."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "ts", "event_type", "value")
    )


@register(
    "sessionize_batch",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with a 30-minute inactivity gap: lag → gap
    flag → running sum (the session number) → per-session stats.  The
    streaming twin is ``stream_session`` (session_window); this is the
    backfill/batch form every pipeline also needs.  Both windows and the
    final aggregate share the ``user_id`` hash partitioning — one shuffle
    total."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs-exact gap via timestamp subtraction (DayTimeInterval).  Interval
    # arithmetic is type-agnostic — works for TIMESTAMP and TIMESTAMP_NTZ
    # alike (unix_micros rejects NTZ) — and keeps sub-second precision, so
    # it agrees with the oracle's INTERVAL comparison on µs boundaries.
    gap = F.col("ts") - F.lag("ts").over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > F.expr("INTERVAL '30' MINUTE")), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "sample_stratified",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS min_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_id
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    GROUP BY source
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% per-stratum sample of documents, summarized per
    source — the balanced-corpus downsampling step of a training-data
    build.  Membership is a pure function of the row key (md5 bucket, as
    in ``split_hash``), so the sample is identical across runs, engines,
    retries, and partition layouts — unlike ``df.sampleBy``, whose seeded
    Bernoulli draw changes with partitioning.  Scan-side filter (no
    shuffle) + one tiny aggregate; at 100 TB the filter rides the parquet
    scan and sampled rows never leave the executor that read them."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return (
        d.where(bucket.isin("0", "1", "2", "3"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )

@register(
    "merge_upsert",
    # MERGE INTO expressed relationally: FULL OUTER JOIN base↔updates on
    # the key, COALESCE per column, tag the action.  DuckDB twin uses the
    # identical formulation, so equality proves the merge semantics
    # (matched→update, unmatched-source→insert, unmatched-target→keep).
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_name,
             CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer
    ), upd AS (
      SELECT c_custkey, c_name,
             CAST(c_acctbal AS DECIMAL(12,2)) + 100 AS bal
      FROM customer WHERE c_custkey % 4 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'new-' || CAST(c_custkey AS VARCHAR),
             CAST(0 AS DECIMAL(12,2))
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
           COALESCE(u.c_name, b.c_name) AS c_name,
           CAST(COALESCE(u.bal, b.bal) AS DOUBLE) AS c_acctbal,
           CASE WHEN u.c_custkey IS NULL THEN 'keep'
                WHEN b.c_custkey IS NULL THEN 'insert'
                ELSE 'update' END AS action
    FROM base b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO (upsert): apply an update set to a base table —
    matched keys take the update's values, unmatched update rows insert,
    untouched base rows carry through — tagged with the action taken.

    This is the Delta/Iceberg ``MERGE`` re-expressed as a FULL OUTER
    JOIN + per-column COALESCE, which is exactly what those engines
    compile MERGE to before file rewriting; the streaming sibling
    (stream_rollup_upsert) supplies the versioned-parquet commit.  At
    100 TB: one shuffle on the merge key — or ZERO with a bucketed base
    (join_bucketed's layout); update sets are typically small, so
    Catalyst/AQE broadcasts them and the base never moves."""
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("decimal(12,2)").alias("bal")
    )
    upd = (
        base.where(F.col("c_custkey") % 4 == 0)
        .select(
            "c_custkey",
            "c_name",
            (F.col("bal") + 100).cast("decimal(12,2)").alias("bal"),
        )
        .unionByName(
            base.where(F.col("c_custkey") % 10 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.concat(F.lit("new-"), F.col("c_custkey").cast("string")).alias(
                    "c_name"
                ),
                F.lit(0).cast("decimal(12,2)").alias("bal"),
            )
        )
    )
    b, u = base.alias("b"), upd.alias("u")
    return b.join(u, F.col("b.c_custkey") == F.col("u.c_custkey"), "full").select(
        F.coalesce("u.c_custkey", "b.c_custkey").alias("c_custkey"),
        F.coalesce("u.c_name", "b.c_name").alias("c_name"),
        F.coalesce("u.bal", "b.bal").cast("double").alias("c_acctbal"),
        F.when(F.col("u.c_custkey").isNull(), "keep")
        .when(F.col("b.c_custkey").isNull(), "insert")
        .otherwise("update")
        .alias("action"),
    )


@register(
    "merge_scd2",
    oracle="""
    WITH changes AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN 'MACHINERY'
                  ELSE c_mktsegment END AS new_seg,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS new_bal,
             c_mktsegment, c_acctbal
      FROM customer
      WHERE c_custkey % 5 = 0 OR c_custkey % 7 = 0
    ), real_changes AS (
      SELECT * FROM changes
      WHERE new_seg <> c_mktsegment OR new_bal <> c_acctbal
    ), unchanged AS (
      SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
             DATE '1992-01-01' AS valid_from,
             CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM real_changes r
                        WHERE r.c_custkey = c.c_custkey)
    ), closed AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             DATE '1992-01-01' AS valid_from,
             DATE '1998-01-01' AS valid_to, FALSE AS is_current
      FROM real_changes
    ), fresh AS (
      SELECT c_custkey, new_seg AS c_mktsegment, new_bal AS c_acctbal,
             DATE '1998-01-01' AS valid_from,
             CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
      FROM real_changes
    )
    SELECT * FROM unchanged
    UNION ALL SELECT * FROM closed
    UNION ALL SELECT * FROM fresh
    ORDER BY c_custkey, valid_from
    """,
)
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 merge — the dimension-history
    pattern every warehouse ships (Kimball SCD2): applying a change
    batch closes the current version (valid_to = effective date,
    is_current = false) and inserts a new current version, while NO-OP
    changes (incoming values identical to current) must NOT create a
    version — change detection is part of the contract, not an
    optimization.  `merge_upsert` is the type-1 (overwrite) sibling;
    this keeps history queryable ("segment of customer X *as of* any
    date" via valid_from/valid_to containment).

    The change batch is derived deterministically (custkey ≡ 0 mod 5 →
    segment rewrite, ≡ 0 mod 7 → balance adjustment) so the oracle can
    build the identical batch; customers already holding the target
    segment exercise the no-op path for real.

    Scale notes: one equi-join of the change batch against current
    rows on the dimension key (broadcast when the batch is small,
    shuffle-hash otherwise — left to AQE), one anti-join for the
    untouched majority; history rows are produced by projection, never
    by row-at-a-time mutation.  In production the write lands through
    `sink_txn_log`'s REPLACE commit so readers flip atomically from
    old history to new."""
    eff = F.lit("1998-01-01").cast("date")
    origin = F.lit("1992-01-01").cast("date")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    changes = c.where(
        (F.col("c_custkey") % 5 == 0) | (F.col("c_custkey") % 7 == 0)
    ).select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.when(F.col("c_custkey") % 5 == 0, F.lit("MACHINERY"))
        .otherwise(F.col("c_mktsegment"))
        .alias("new_seg"),
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("new_bal"),
    )
    real = changes.where(
        (F.col("new_seg") != F.col("c_mktsegment"))
        | (F.col("new_bal") != F.col("c_acctbal"))
    )
    unchanged = c.join(real.select("c_custkey"), "c_custkey", "left_anti").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        origin.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closed = real.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        origin.alias("valid_from"),
        eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    fresh = real.select(
        "c_custkey",
        F.col("new_seg").alias("c_mktsegment"),
        F.col("new_bal").alias("c_acctbal"),
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        unchanged.unionAll(closed)
        .unionAll(fresh)
        .orderBy("c_custkey", "valid_from")
    )


@register(
    "join_temporal_dim",
    # The as-of condition reuses merge_scd2's deterministically-derived
    # history (same change batch, eff date 1998-01-01 sits mid-range of
    # o_orderdate, so BOTH versions of changed customers get traffic —
    # the comparison is non-vacuous by construction).
    oracle="""
    WITH changes AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN 'MACHINERY'
                  ELSE c_mktsegment END AS new_seg,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS new_bal,
             c_mktsegment, c_acctbal
      FROM customer
      WHERE c_custkey % 5 = 0 OR c_custkey % 7 = 0
    ), real_changes AS (
      SELECT * FROM changes
      WHERE new_seg <> c_mktsegment OR new_bal <> c_acctbal
    ), hist AS (
      SELECT c.c_custkey, c.c_mktsegment,
             DATE '1992-01-01' AS valid_from, DATE '9999-12-31' AS valid_to
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM real_changes r
                        WHERE r.c_custkey = c.c_custkey)
      UNION ALL
      SELECT c_custkey, c_mktsegment, DATE '1992-01-01', DATE '1998-01-01'
      FROM real_changes
      UNION ALL
      SELECT c_custkey, new_seg, DATE '1998-01-01', DATE '9999-12-31'
      FROM real_changes
    ), cur AS (
      SELECT c_custkey, c_mktsegment AS cur_seg FROM hist
      WHERE valid_to = DATE '9999-12-31'
    ), joined AS (
      SELECT h.c_mktsegment AS asof_seg, cu.cur_seg,
             CAST(o.o_totalprice AS DECIMAL(14,2)) AS price
      FROM orders o
      JOIN hist h ON o.o_custkey = h.c_custkey
        AND o.o_orderdate >= h.valid_from AND o.o_orderdate < h.valid_to
      JOIN cur cu ON o.o_custkey = cu.c_custkey
    )
    SELECT asof_seg, cur_seg,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS revenue
    FROM joined GROUP BY asof_seg, cur_seg
    ORDER BY asof_seg, cur_seg
    """,
)
def join_temporal_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time-correct dimension enrichment — the query SCD2 history
    exists to answer: join each order to the customer segment that was
    TRUE ON ITS ORDER DATE (valid_from ≤ date < valid_to containment),
    next to the segment that is true NOW.  Where the two columns
    disagree, a current-state join would have silently misattributed
    revenue — the matrix's off-diagonal cells ARE the misattribution a
    type-1 dimension causes, quantified.

    Scale notes: dimension history is at most versions-per-key rows —
    broadcast class; the temporal condition is an equi-join on the
    customer key with the interval containment as a residual filter
    (each order matches EXACTLY one version, so no row explosion); at
    100 TB this is the standard Delta/Iceberg SCD2 lookup plan.  The
    rollup is |segments|²-sized."""
    eff = F.lit("1998-01-01").cast("date")
    origin = F.lit("1992-01-01").cast("date")
    forever = F.lit("9999-12-31").cast("date")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    changes = c.where(
        (F.col("c_custkey") % 5 == 0) | (F.col("c_custkey") % 7 == 0)
    ).select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.when(F.col("c_custkey") % 5 == 0, F.lit("MACHINERY"))
        .otherwise(F.col("c_mktsegment"))
        .alias("new_seg"),
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("new_bal"),
    )
    real = changes.where(
        (F.col("new_seg") != F.col("c_mktsegment"))
        | (F.col("new_bal") != F.col("c_acctbal"))
    )
    hist = (
        c.join(real.select("c_custkey"), "c_custkey", "left_anti")
        .select(
            "c_custkey",
            "c_mktsegment",
            origin.alias("valid_from"),
            forever.alias("valid_to"),
        )
        .unionAll(
            real.select(
                "c_custkey",
                "c_mktsegment",
                origin.alias("valid_from"),
                eff.alias("valid_to"),
            )
        )
        .unionAll(
            real.select(
                "c_custkey",
                F.col("new_seg").alias("c_mktsegment"),
                eff.alias("valid_from"),
                forever.alias("valid_to"),
            )
        )
    )
    cur = hist.where(F.col("valid_to") == forever).select(
        "c_custkey", F.col("c_mktsegment").alias("cur_seg")
    )
    o = load_table(spark, sf_dir, "orders")
    joined = (
        o.join(
            F.broadcast(hist),
            (o.o_custkey == hist.c_custkey)
            & (o.o_orderdate >= hist.valid_from)
            & (o.o_orderdate < hist.valid_to),
        )
        .select(
            F.col("c_mktsegment").alias("asof_seg"),
            "o_custkey",
            dec2("o_totalprice", 14).alias("price"),
        )
        .join(F.broadcast(cur), F.col("o_custkey") == cur.c_custkey)
    )
    return (
        joined.groupBy("asof_seg", "cur_seg")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
        )
        .orderBy("asof_seg", "cur_seg")
    )


@register(
    "cdc_net_changes",
    # Debezium-style batch compaction: collapse each key's op sequence
    # to ONE net change by comparing the first and last op —
    # insert(first=I,last!=D), delete(first!=I,last=D),
    # cancelled(first=I,last=D: created and dropped inside the batch),
    # update(otherwise) — carrying the last row's payload.
    oracle="""
    WITH ops AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'signup' THEN 'I'
                               WHEN 'error' THEN 'D'
                               ELSE 'U' END AS op,
               CAST(ROUND(value * 100) AS BIGINT) AS val_cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    ), fl AS (
        SELECT user_id,
               COUNT(*) AS n_ops,
               MAX(CASE WHEN rn_a = 1 THEN op END) AS first_op,
               MAX(CASE WHEN rn_d = 1 THEN op END) AS last_op,
               MAX(CASE WHEN rn_d = 1 THEN val_cents END) AS last_val_cents,
               MAX(CASE WHEN rn_d = 1 THEN ts END) AS last_ts
        FROM ops GROUP BY user_id
    )
    SELECT user_id, CAST(n_ops AS BIGINT) AS n_ops, first_op, last_op,
           CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'cancelled'
                WHEN first_op = 'I' THEN 'insert'
                WHEN last_op = 'D' THEN 'delete'
                ELSE 'update' END AS net_op,
           last_val_cents, last_ts
    FROM fl
    """,
)
def cdc_net_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-change compaction of a CDC batch: per key, the whole op
    sequence collapses to one insert / update / delete / cancelled
    row carrying the final payload — what a MERGE sink wants applied,
    and the reason multi-step histories never replay downstream.
    Events stand in for the change stream (signup→I, error→D,
    else→U), ordered by the total (ts, event_id) order.

    Scale notes: ONE shuffle on the key; both row_number directions
    share the same window sort (Spark evaluates the desc numbering by
    re-sorting within the already-partitioned frame), and the
    conditional aggregate collapses to key-grain immediately — no
    history self-join, no second shuffle.  This is the batch twin of
    `stream_cdc_apply` (streaming/core.py), which applies the same
    net-op classification per micro-batch."""
    e = load_table(spark, sf_dir, "events")
    w_a = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_d = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ops = e.select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.round(F.col("value") * 100).cast("long").alias("val_cents"),
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    fl = ops.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ops"),
        F.max(F.when(F.col("rn_a") == 1, F.col("op"))).alias("first_op"),
        F.max(F.when(F.col("rn_d") == 1, F.col("op"))).alias("last_op"),
        F.max(F.when(F.col("rn_d") == 1, F.col("val_cents"))).alias(
            "last_val_cents"
        ),
        F.max(F.when(F.col("rn_d") == 1, F.col("ts"))).alias("last_ts"),
    )
    return fl.select(
        "user_id",
        "n_ops",
        "first_op",
        "last_op",
        F.when(
            (F.col("first_op") == "I") & (F.col("last_op") == "D"), "cancelled"
        )
        .when(F.col("first_op") == "I", "insert")
        .when(F.col("last_op") == "D", "delete")
        .otherwise("update")
        .alias("net_op"),
        "last_val_cents",
        "last_ts",
    )


#: Compaction target: 16 KB of estimated file bytes per output group at
#: the fixture's ~200 B/row estimate — scaled-down stand-in for the
#: 128 MB small-file compaction target; the PLAN arithmetic (greedy
#: cumulative bin-packing) is scale-free.
_COMPACT_TARGET_BYTES = 16_384
_EST_ROW_BYTES = 200


@register(
    "table_compaction_plan",
    # Small-file compaction planner: days are the "files" of a
    # month-partitioned orders table (est bytes = rows x 200); the plan
    # greedily packs consecutive days into output groups of ~16 KB via
    # cumulative-sum // target — the deterministic bin-packing every
    # lakehouse OPTIMIZE job runs.
    oracle=f"""
    WITH files AS (
        SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
               CAST(o_orderdate AS DATE) AS day,
               COUNT(*) AS n_rows,
               COUNT(*) * {_EST_ROW_BYTES} AS est_bytes
        FROM orders GROUP BY 1, 2
    ), packed AS (
        SELECT month, day, n_rows, est_bytes,
               CAST((SUM(est_bytes) OVER (PARTITION BY month ORDER BY day)
                     - 1) // {_COMPACT_TARGET_BYTES} AS BIGINT) AS group_id
        FROM files
    )
    SELECT month, day, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(est_bytes AS BIGINT) AS est_bytes, group_id,
           CAST(SUM(est_bytes) OVER (PARTITION BY month, group_id)
                AS BIGINT) AS group_bytes,
           CAST(COUNT(*) OVER (PARTITION BY month, group_id)
                AS BIGINT) AS group_files
    FROM packed
    """,
)
def table_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction (small-file OPTIMIZE) planner: per month partition,
    pack consecutive per-day "files" into output groups of ~the target
    size by cumulative-sum bucketing — ``(cumsum − 1) div target`` —
    and report each group's total bytes and file count.  Greedy
    packing over a deterministic file order is exactly what
    lakehouse compaction jobs (Delta OPTIMIZE, Iceberg rewrite)
    schedule; the (cumsum−1) form makes a file that lands exactly on
    a target boundary close its group rather than open the next.

    Scale notes: the file inventory is one hash aggregate to
    (month, day) — calendar-sized, ~2.4k rows here and bounded by
    days-retained at any corpus size; both the cumulative window and
    the group rollup windows run partitioned by month on that
    inventory.  A real deployment feeds per-file sizes from the
    transaction log (`sources/txnlog.py` materializes one); the
    planner arithmetic is identical."""
    o = load_table(spark, sf_dir, "orders")
    files = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) * _EST_ROW_BYTES).cast("long").alias("est_bytes"),
    )
    packed = files.withColumn(
        "group_id",
        F.expr(
            f"CAST((SUM(est_bytes) OVER (PARTITION BY month ORDER BY day) - 1) "
            f"div {_COMPACT_TARGET_BYTES} AS BIGINT)"
        ),
    )
    w_grp = Window.partitionBy("month", "group_id")
    return packed.select(
        "month",
        "day",
        "n_rows",
        "est_bytes",
        "group_id",
        F.sum("est_bytes").over(w_grp).cast("long").alias("group_bytes"),
        F.count(F.lit(1)).over(w_grp).cast("long").alias("group_files"),
    )
