"""Table-maintenance operators: statistics collection (ANALYZE) and
snapshot diffing (CDC) — the operational companions every warehouse-style
engine ships next to its query surface.

`analyze_table_stats` is what feeds a cost-based optimizer (row counts,
null fractions, NDVs, value bounds); `snapshot_diff` is the
change-data-capture primitive (which rows appeared / disappeared /
changed between two table states) that drives incremental downstream
refreshes — the read-side inverse of `merge_upsert`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..session import load_table

_STAT_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "analyze_table_stats",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
           MIN({c}) AS min_val,
           MAX({c}) AS max_val
    FROM lineitem
    """
        for c in _STAT_COLS
    ),
)
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics for the fact table's numeric
    columns: row count, null count, exact NDV, and value bounds — the
    inputs a cost-based optimizer's cardinality estimates are built from.

    One scan computes all 4×4 measures in a single partial+final
    aggregate (the oracle's UNION ALL re-scans per column; Spark's
    single-agg + melt is the scale shape), then melts to long form with
    a zero-shuffle Expand.  min/max are raw column values — no
    arithmetic, so no float-parity risk.  Exact NDV is the one genuinely
    expensive measure (a distinct per column); the production variant
    swaps in approx_count_distinct and loses the oracle — the same
    exact-vs-approx trade agg_approx_distinct documents."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _STAT_COLS:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__ndv"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    one_row = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__ndv, {c}__min, {c}__max" for c in _STAT_COLS
    )
    return one_row.select(
        F.expr(
            f"stack({len(_STAT_COLS)}, {stack_args}) AS "
            "(column_name, n_rows, n_null, ndv, min_val, max_val)"
        )
    )


@register(
    "snapshot_diff",
    oracle="""
    WITH snap_a AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ), snap_b AS (
      SELECT o_orderkey,
             o_orderstatus,
             CASE WHEN o_orderkey % 13 = 0
                  THEN ROUND(o_totalprice + 10.0, 2)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-07-01'
        AND o_orderkey % 50 <> 0
    )
    SELECT CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                WHEN b.o_orderkey IS NULL THEN 'delete'
                WHEN a.o_orderstatus <> b.o_orderstatus
                  OR a.o_totalprice <> b.o_totalprice THEN 'update'
                ELSE 'unchanged' END AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(COALESCE(a.o_orderkey, b.o_orderkey)) AS BIGINT)
             AS key_checksum
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    GROUP BY 1
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff: classify every key across two table states as
    insert / delete / update / unchanged, with a key checksum per class.
    The two snapshots are deterministic derivations of `orders` (a later
    date horizon, minus every 50th key, with every 13th price bumped) so
    the diff exercises all four classes on fixture data.

    FULL OUTER join on the key, null-ness decides insert/delete, column
    comparison decides update — exactly what lakehouse CDC readers
    compute between versions.  One shuffle on the key for both sides
    (the snapshots are scans of the same table, so at 100 TB this is two
    passes + one co-partitioned join); the class aggregate is 4 rows.
    The update comparison is bit-exact: both engines compute the same
    `round(x + 10.0, 2)` double, and unchanged rows compare raw values
    with no arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    snap_a = o.where(F.col("o_orderdate") < "1998-01-01").select(
        F.col("o_orderkey").alias("a_key"),
        F.col("o_orderstatus").alias("a_status"),
        F.col("o_totalprice").alias("a_price"),
    )
    snap_b = (
        o.where(
            (F.col("o_orderdate") < "1998-07-01") & (F.col("o_orderkey") % 50 != 0)
        ).select(
            F.col("o_orderkey").alias("b_key"),
            F.col("o_orderstatus").alias("b_status"),
            F.when(
                F.col("o_orderkey") % 13 == 0,
                F.round(F.col("o_totalprice") + 10.0, 2),
            )
            .otherwise(F.col("o_totalprice"))
            .alias("b_price"),
        )
    )
    j = snap_a.join(snap_b, snap_a.a_key == snap_b.b_key, "full_outer")
    change = (
        F.when(F.col("a_key").isNull(), "insert")
        .when(F.col("b_key").isNull(), "delete")
        .when(
            (F.col("a_status") != F.col("b_status"))
            | (F.col("a_price") != F.col("b_price")),
            "update",
        )
        .otherwise("unchanged")
    )
    return (
        j.select(
            change.alias("change_type"),
            F.coalesce(F.col("a_key"), F.col("b_key")).alias("k"),
        )
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("k").alias("key_checksum"),
        )
    )


@register(
    "data_quality_rules",
    oracle="""
    SELECT 'orders_totalprice_positive' AS rule, 'orders' AS tbl,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'lineitem_quantity_in_range', 'lineitem',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_orderkey_fk', 'lineitem',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'events_id_unique', 'events',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'documents_nchars_consistent', 'documents',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'supplier_acctbal_nonnegative', 'supplier',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE s_acctbal < 0) AS BIGINT)
    FROM supplier
    """,
)
def data_quality_rules(
    spark: SparkSession, sf_dir: str, *, use_bloom: bool = False
) -> DataFrame:
    """Declarative data-quality rule evaluation (the Deequ / dbt-test /
    great-expectations staple): domain, range, uniqueness, referential
    and cross-column consistency checks evaluated in one report —
    (rule, table, n_checked, n_violations).  The supplier balance rule
    fires on the fixtures (negative balances exist by design, q16's
    complaint stand-in), so the report is not all-zeros.

    Scale notes: every same-table rule folds into ONE conditional
    partial+final aggregate over a single scan (orders and lineitem
    range rules never rescan per rule); uniqueness is count−distinct in
    the same agg; the FK rule is the one genuinely join-shaped check —
    a LEFT ANTI count whose shuffle partitions on the key.  With
    ``use_bloom=True`` the FK probe runs through the distributed bloom
    pre-pass (operators/bloom.py): definite misses bypass the shuffle
    and only maybe-present rows reach the exact anti-join — identical
    counts (tests/test_bloom.py asserts flag-on == flag-off), probe-side
    shuffle cut to the FP mass at 100 TB.  The final UNION is 6 one-row
    frames — plan noise, zero data motion."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")
    d = load_table(spark, sf_dir, "documents")
    s = load_table(spark, sf_dir, "supplier")

    def report(rule: str, tbl: str, checked, violations) -> DataFrame:
        return checked.join(F.broadcast(violations)).select(
            F.lit(rule).alias("rule"),
            F.lit(tbl).alias("tbl"),
            F.col("n_checked"),
            F.col("n_violations"),
        )

    def one_scan(rule: str, tbl: str, df: DataFrame, bad) -> DataFrame:
        agg = df.agg(
            F.count("*").alias("n_checked"),
            F.count_if(bad).alias("n_violations"),
        )
        return agg.select(
            F.lit(rule).alias("rule"), F.lit(tbl).alias("tbl"),
            "n_checked", "n_violations",
        )

    orders_rule = one_scan(
        "orders_totalprice_positive", "orders", o, F.col("o_totalprice") <= 0
    )
    qty_rule = one_scan(
        "lineitem_quantity_in_range", "lineitem", li,
        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
    )
    fk_checked = li.agg(F.count("*").alias("n_checked"))
    if use_bloom:
        from .bloom import bloom_anti_join

        fk_orphans = bloom_anti_join(
            li.select("l_orderkey"), "l_orderkey",
            o.select("o_orderkey"), "o_orderkey",
        ).agg(F.count("*").alias("n_violations"))
    else:
        fk_orphans = (
            li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
            .agg(F.count("*").alias("n_violations"))
        )
    fk_rule = report("lineitem_orderkey_fk", "lineitem", fk_checked, fk_orphans)
    uniq_rule = e.agg(
        F.count("*").alias("n_checked"),
        (F.count("*") - F.countDistinct("event_id")).alias("n_violations"),
    ).select(
        F.lit("events_id_unique").alias("rule"), F.lit("events").alias("tbl"),
        "n_checked", "n_violations",
    )
    nchars_rule = one_scan(
        "documents_nchars_consistent", "documents", d,
        F.col("n_chars") != F.length("text"),
    )
    acctbal_rule = one_scan(
        "supplier_acctbal_nonnegative", "supplier", s, F.col("s_acctbal") < 0
    )
    return (
        orders_rule.unionByName(qty_rule)
        .unionByName(fk_rule)
        .unionByName(uniq_rule)
        .unionByName(nchars_rule)
        .unionByName(acctbal_rule)
    )


_SAMPLE_MOD = 10  #: 1-in-10 deterministic hash sample


@register(
    "analyze_sampled_stats",
    # One SELECT per profiled column, unioned — same shape as
    # analyze_table_stats.  The sample predicate is the md5-derived
    # integer (dedup_minhash_md5's recipe) mod _SAMPLE_MOD == 0 (ADVICE
    # r5: interpolate the constant, never hardcode it, so changing
    # _SAMPLE_MOD can't desynchronize the two engines): deterministic,
    # key-uncorrelated, identical row set on both engines — so the
    # sampled estimates (not just the exact side) are oracle-proven.
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(ex.n AS BIGINT) AS n_exact,
           CAST(sa.n * {_SAMPLE_MOD} AS BIGINT) AS n_est,
           CAST(ex.ndv AS BIGINT) AS ndv_exact,
           CAST(sa.ndv AS BIGINT) AS ndv_sample,
           CAST((2 * CAST(ex.s * 100 AS BIGINT) + ex.n) // (2 * ex.n)
                AS DOUBLE) / 100.0 AS avg_exact,
           CAST((2 * CAST(sa.s * 100 AS BIGINT) + sa.n) // (2 * sa.n)
                AS DOUBLE) / 100.0 AS avg_est,
           CAST((abs(sa.n * {_SAMPLE_MOD} - ex.n) * 1000) // ex.n AS BIGINT)
             AS rowcount_err_permille
    FROM (
      SELECT COUNT(*) AS n, COUNT(DISTINCT {c}) AS ndv,
             SUM(CAST({c} AS DECIMAL(14,2))) AS s
      FROM lineitem
    ) ex, (
      SELECT COUNT(*) AS n, COUNT(DISTINCT {c}) AS ndv,
             SUM(CAST({c} AS DECIMAL(14,2))) AS s
      FROM lineitem
      WHERE CAST(('0x' || substr(md5(CAST(l_orderkey * 8 + l_linenumber
                    AS VARCHAR)), 1, 15)) AS BIGINT) % {_SAMPLE_MOD} = 0
    ) sa
    """
        for c in ("l_quantity", "l_extendedprice")
    ),
)
def analyze_sampled_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled ANALYZE — how table statistics are actually collected at
    100 TB: a deterministic 1-in-10 HASH sample (never `rand()`:
    retried tasks and repeat runs must see the same rows; the md5 of
    the row key is uncorrelated with any data column) scanned instead
    of the full table, with the full-scan truth computed alongside and
    error columns quantifying what the optimizer would really see.
    `analyze_table_stats` is the exact ANALYZE; this is the one you can
    afford nightly.

    Sampled NDV is reported as the raw sample NDV (the input to
    Chao-style estimators, which are deliberately out of scope — no
    randomness, no model, every number exact); row count scales by the
    sampling factor; averages are exact DECIMAL sums with integer-cents
    HALF-UP division (`cohort_ltv`'s boundary lesson).

    Scale notes: the sample predicate is a scan-side codegen'd hash —
    pushdown-friendly and partition-local (no shuffle to sample); both
    profiles are single partial+final aggregates; at 100 TB you run
    ONLY the sampled branch — the exact branch exists here to make the
    error measurable, same eval-first posture as `dedup_lsh_recall`."""
    li = load_table(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("string")
    hsh = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    sampled = li.where(hsh % _SAMPLE_MOD == 0)

    def profile(df: DataFrame, col: str) -> DataFrame:
        return df.agg(
            F.count("*").alias("n"),
            F.countDistinct(col).alias("ndv"),
            F.sum(F.col(col).cast("decimal(14,2)")).alias("s"),
        )

    outs = []
    for c in ("l_quantity", "l_extendedprice"):
        ex = profile(li, c)
        sa = profile(sampled, c)
        outs.append(
            F.broadcast(
                ex.select(
                    F.col("n").alias("xn"),
                    F.col("ndv").alias("xndv"),
                    F.col("s").alias("xs"),
                )
            )
            .join(
                F.broadcast(
                    sa.select(
                        F.col("n").alias("sn"),
                        F.col("ndv").alias("sndv"),
                        F.col("s").alias("ss"),
                    )
                )
            )
            .select(
                F.lit(c).alias("column_name"),
                F.col("xn").cast("long").alias("n_exact"),
                (F.col("sn") * _SAMPLE_MOD).cast("long").alias("n_est"),
                F.col("xndv").cast("long").alias("ndv_exact"),
                F.col("sndv").cast("long").alias("ndv_sample"),
                (
                    F.expr("(2 * cast(xs * 100 as bigint) + xn) div (2 * xn)")
                    .cast("double")
                    / 100.0
                ).alias("avg_exact"),
                (
                    F.expr("(2 * cast(ss * 100 as bigint) + sn) div (2 * sn)")
                    .cast("double")
                    / 100.0
                ).alias("avg_est"),
                F.expr(f"(abs(sn * {_SAMPLE_MOD} - xn) * 1000) div xn")
                .cast("long")
                .alias("rowcount_err_permille"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@register("scan_observed_metrics")
def scan_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-attached metrics via the `Observation` API — production
    Spark's free lunch: named aggregates computed DURING a query's own
    execution (piggybacked on the existing scan, no second pass, no
    cache), the mechanism behind data-quality monitors that must not
    double the pipeline's I/O.  The observed frame runs the normal
    revenue rollup; the observation simultaneously records row count,
    null count and value bounds, and the op returns metric rows
    alongside the rollup's own totals for cross-checking — the pytest
    asserts observed row count == the rollup's summed counts (the
    no-second-pass numbers are REAL numbers).

    Scale notes: observation aggregates ride the same whole-stage
    codegen as the query — zero extra scans at any scale; metrics
    arrive driver-side as one row of scalars."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("obs_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("obs_null_qty"),
        F.min("l_quantity").alias("obs_min_qty"),
        F.max("l_quantity").alias("obs_max_qty"),
    )
    rollup = (
        observed.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .collect()  # materialize so the observation fires
    )
    m = obs.get
    rows = [
        ("obs_rows", float(m["obs_rows"])),
        ("obs_null_qty", float(m["obs_null_qty"])),
        ("obs_min_qty", float(m["obs_min_qty"])),
        ("obs_max_qty", float(m["obs_max_qty"])),
        ("rollup_total_rows", float(sum(r["n"] for r in rollup))),
        ("rollup_groups", float(len(rollup))),
    ]
    return spark.createDataFrame(rows, "metric string, value double").orderBy(
        "metric"
    )


@register(
    "table_partition_advisor",
    # Candidate partition keys profiled with exact ndv / row counts and
    # the max single-partition share in integer ppm; the verdict is a
    # threshold CASE over those integers — no float ever decides a row.
    oracle="""
    WITH profiles AS (
        SELECT 'l_returnflag' AS candidate,
               CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS ndv,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST((SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM lineitem
                     GROUP BY l_returnflag)) * 1000000 // COUNT(*) AS BIGINT)
                   AS max_share_ppm
        FROM lineitem
        UNION ALL
        SELECT 'l_linestatus',
               CAST(COUNT(DISTINCT l_linestatus) AS BIGINT),
               CAST(COUNT(*) AS BIGINT),
               CAST((SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM lineitem
                     GROUP BY l_linestatus)) * 1000000 // COUNT(*) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'ship_month',
               CAST(COUNT(DISTINCT date_trunc('month', l_shipdate)) AS BIGINT),
               CAST(COUNT(*) AS BIGINT),
               CAST((SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM lineitem
                     GROUP BY date_trunc('month', l_shipdate))) * 1000000
                    // COUNT(*) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_suppkey',
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
               CAST(COUNT(*) AS BIGINT),
               CAST((SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM lineitem
                     GROUP BY l_suppkey)) * 1000000 // COUNT(*) AS BIGINT)
        FROM lineitem
    )
    SELECT candidate, ndv, n_rows, max_share_ppm,
           CASE WHEN ndv < 8 THEN 'too_coarse'
                WHEN ndv * 50 > n_rows THEN 'too_fine'
                WHEN max_share_ppm > 500000 THEN 'skewed'
                ELSE 'ok' END AS verdict
    FROM profiles
    ORDER BY candidate
    """,
)
def table_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key advisor for the fact table: profiles each candidate
    column (exact ndv, row count, max single-partition share in ppm) and
    issues a threshold verdict — `too_coarse` (< 8 partitions can't
    parallelize), `too_fine` (avg partition under 50 rows → small-file
    explosion), `skewed` (one partition above 50%), else `ok`.  The
    decision table behind `PARTITIONED BY` choices and
    `repartition()`/bucketing advice.

    Scale notes: one aggregate pass per candidate (each a scan +
    bounded-rollup max — the per-candidate profile frames are the
    allowlisted 1-row exchanges, same class as analyze_table_stats).
    At 100 TB swap exact ndv for approx_count_distinct and profile a
    hash sample (`analyze_sampled_stats` is exactly that machinery) —
    the verdict thresholds are ppm integers either way, so the advisor
    stays engine-deterministic."""
    l = load_table(spark, sf_dir, "lineitem")

    def profile(name: str, col):
        grp = l.groupBy(col.alias("k")).agg(F.count("*").alias("c"))
        return (
            grp.agg(
                F.count("*").cast("long").alias("ndv"),
                F.sum("c").cast("long").alias("n_rows"),
                F.max("c").cast("long").alias("max_c"),
            )
            .select(
                F.lit(name).alias("candidate"),
                "ndv",
                "n_rows",
                F.expr("max_c * 1000000 div n_rows").alias("max_share_ppm"),
            )
        )

    profiles = (
        profile("l_returnflag", F.col("l_returnflag"))
        .unionByName(profile("l_linestatus", F.col("l_linestatus")))
        .unionByName(profile("ship_month", F.date_trunc("month", "l_shipdate")))
        .unionByName(profile("l_suppkey", F.col("l_suppkey")))
    )
    return profiles.select(
        "candidate",
        "ndv",
        "n_rows",
        "max_share_ppm",
        F.when(F.col("ndv") < 8, "too_coarse")
        .when(F.col("ndv") * 50 > F.col("n_rows"), "too_fine")
        .when(F.col("max_share_ppm") > 500000, "skewed")
        .otherwise("ok")
        .alias("verdict"),
    ).orderBy("candidate")


#: Selectivity-estimator fixture predicates (shared literals).
_SEL_QTY_LE = 10
_SEL_FLAG = "R"
_SEL_DATE = "1997-01-01"


@register(
    "scan_selectivity_estimates",
    # Optimizer-style cardinality estimation, graded against truth: the
    # System-R uniformity / independence formulas computed from ONE
    # stats aggregate (n, min/max, exact NDV) as pure integer
    # arithmetic, next to the ACTUAL row counts from one conditional
    # aggregate — the estimate error every cost-based planner silently
    # carries, reported in ppm on real data.
    oracle=f"""
    WITH st AS (
        SELECT COUNT(*) AS n,
               MIN(CAST(l_quantity AS BIGINT)) AS min_q,
               MAX(CAST(l_quantity AS BIGINT)) AS max_q,
               COUNT(DISTINCT l_returnflag) AS ndv_flag,
               MIN(CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT)) AS min_d,
               MAX(CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT)) AS max_d,
               CAST(DATE '{_SEL_DATE}' - DATE '1970-01-01' AS BIGINT) AS d0,
               SUM(CASE WHEN l_quantity <= {_SEL_QTY_LE} THEN 1 ELSE 0 END)
                   AS act_qty,
               SUM(CASE WHEN l_returnflag = '{_SEL_FLAG}' THEN 1 ELSE 0 END)
                   AS act_flag,
               SUM(CASE WHEN CAST(l_shipdate AS DATE) < DATE '{_SEL_DATE}'
                        THEN 1 ELSE 0 END) AS act_date,
               SUM(CASE WHEN l_quantity <= {_SEL_QTY_LE}
                         AND l_returnflag = '{_SEL_FLAG}'
                        THEN 1 ELSE 0 END) AS act_conj
        FROM lineitem
    ), est AS (
        SELECT *,
               n * ({_SEL_QTY_LE} - min_q + 1) // (max_q - min_q + 1)
                   AS est_qty,
               n // ndv_flag AS est_flag,
               n * (d0 - min_d) // (max_d - min_d + 1) AS est_date,
               n * ({_SEL_QTY_LE} - min_q + 1) // (max_q - min_q + 1)
                 // ndv_flag AS est_conj
        FROM st
    )
    SELECT p.predicate, p.est_rows, p.actual_rows,
           CAST(ABS(p.est_rows - p.actual_rows) * 1000000
                // p.actual_rows AS BIGINT) AS err_ppm
    FROM est, LATERAL (VALUES
        ('qty_le_{_SEL_QTY_LE}', CAST(est_qty AS BIGINT),
         CAST(act_qty AS BIGINT)),
        ('flag_eq_{_SEL_FLAG}', CAST(est_flag AS BIGINT),
         CAST(act_flag AS BIGINT)),
        ('ship_lt_{_SEL_DATE}', CAST(est_date AS BIGINT),
         CAST(act_date AS BIGINT)),
        ('qty_and_flag', CAST(est_conj AS BIGINT),
         CAST(act_conj AS BIGINT))
    ) p(predicate, est_rows, actual_rows)
    ORDER BY p.predicate
    """,
)
def scan_selectivity_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based-optimizer cardinality estimates, graded against the
    truth: for four representative predicates (integer range, equality,
    date range, conjunction) compute the System-R estimate — uniformity
    over [min, max] for ranges, 1/NDV for equality, independence for
    the conjunction — from ONE statistics pass, next to the actual
    counts from the SAME pass, and report the error in ppm.  This is
    `analyze_table_stats`' consumer side: the formulas a planner feeds
    from those stats, with their real-data error made visible (the
    conjunction's independence assumption is the classic
    underestimator).  All estimates are exact integer arithmetic
    (n·num // den with a fixed division order), so the readout is
    bit-reproducible.

    Scale notes: ONE map-side-combined aggregate over the scan
    computes stats AND actuals together (a 1-row frame; reviewed
    SINGLE row); the 4-row predicate unpivot is per-row expression
    work on that frame.  The exact COUNT(DISTINCT) on the 3-value
    flag column collapses map-side; a high-NDV column would use
    `analyze_sampled_stats`' HLL path instead."""
    li = load_table(spark, sf_dir, "lineitem")
    d0 = F.datediff(
        F.lit(_SEL_DATE).cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    ship_days = F.datediff(
        F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    st = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("l_quantity").cast("long")).alias("min_q"),
        F.max(F.col("l_quantity").cast("long")).alias("max_q"),
        F.countDistinct("l_returnflag").alias("ndv_flag"),
        F.min(ship_days).alias("min_d"),
        F.max(ship_days).alias("max_d"),
        F.sum(
            F.when(F.col("l_quantity") <= _SEL_QTY_LE, 1).otherwise(0)
        ).alias("act_qty"),
        F.sum(
            F.when(F.col("l_returnflag") == _SEL_FLAG, 1).otherwise(0)
        ).alias("act_flag"),
        F.sum(
            F.when(F.to_date("l_shipdate") < F.lit(_SEL_DATE), 1).otherwise(
                0
            )
        ).alias("act_date"),
        F.sum(
            F.when(
                (F.col("l_quantity") <= _SEL_QTY_LE)
                & (F.col("l_returnflag") == _SEL_FLAG),
                1,
            ).otherwise(0)
        ).alias("act_conj"),
    ).withColumn("d0", d0)
    est = st.select(
        "*",
        F.expr(
            f"n * ({_SEL_QTY_LE} - min_q + 1) div (max_q - min_q + 1)"
        ).alias("est_qty"),
        F.expr("n div ndv_flag").alias("est_flag"),
        F.expr("n * (d0 - min_d) div (max_d - min_d + 1)").alias("est_date"),
        F.expr(
            f"n * ({_SEL_QTY_LE} - min_q + 1) div (max_q - min_q + 1)"
            " div ndv_flag"
        ).alias("est_conj"),
    )
    rows = est.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(f"qty_le_{_SEL_QTY_LE}").alias("predicate"),
                    F.col("est_qty").alias("est_rows"),
                    F.col("act_qty").cast("long").alias("actual_rows"),
                ),
                F.struct(
                    F.lit(f"flag_eq_{_SEL_FLAG}").alias("predicate"),
                    F.col("est_flag").alias("est_rows"),
                    F.col("act_flag").cast("long").alias("actual_rows"),
                ),
                F.struct(
                    F.lit(f"ship_lt_{_SEL_DATE}").alias("predicate"),
                    F.col("est_date").alias("est_rows"),
                    F.col("act_date").cast("long").alias("actual_rows"),
                ),
                F.struct(
                    F.lit("qty_and_flag").alias("predicate"),
                    F.col("est_conj").alias("est_rows"),
                    F.col("act_conj").cast("long").alias("actual_rows"),
                ),
            )
        ).alias("p")
    ).select("p.predicate", "p.est_rows", "p.actual_rows")
    return rows.select(
        "predicate",
        "est_rows",
        "actual_rows",
        F.expr("abs(est_rows - actual_rows) * 1000000 div actual_rows")
        .cast("long")
        .alias("err_ppm"),
    ).orderBy("predicate")


@register("scan_rowgroup_zonemap")  # rows-only: footer paths are not
# view-expressible in the driver's oracle harness; the DuckDB
# parquet_metadata() cross-check lives in tests/test_sources.py.
def scan_rowgroup_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet row-group zone-map readout — surface the footer
    statistics (per-row-group row counts and l_shipdate / l_quantity
    min–max) that predicate pushdown actually consults: this is the
    ground truth behind every §2.16 pruned-scan operator
    (`scan_zorder_pruned` sorts to TIGHTEN these ranges,
    `scan_manifest_pruned` caches them table-side,
    `table_partition_advisor` sizes against them), read from the REAL
    file footers rather than re-derived from data.  The oracle reads
    the SAME footers through DuckDB's ``parquet_metadata()`` — two
    independent parquet-statistics decoders agreeing on bytes.

    Scale notes: footer reads are file-count-sized driver/metadata
    work (a real deployment parallelizes the listing with a
    files-as-rows DataFrame, exactly like `scan_manifest_pruned`'s
    build side); NO data page is ever read — that is the point."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata
    names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
    rows = []
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        ship = g.column(names["l_shipdate"]).statistics
        qty = g.column(names["l_quantity"]).statistics
        rows.append(
            (
                rg,
                g.num_rows,
                str(ship.min.date()),
                str(ship.max.date()),
                int(qty.min),
                int(qty.max),
            )
        )
    return spark.createDataFrame(
        rows,
        "row_group long, n_rows long, ship_min string, ship_max string, "
        "qty_min long, qty_max long",
    ).orderBy("row_group")
