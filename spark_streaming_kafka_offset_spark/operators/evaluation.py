"""Model-evaluation and privacy-compliance operators (r7 batch) — §2.22.

The offline-evaluation stage of an ML pipeline and the compliance audit
a training-data release runs, as exact relational queries: a score
reliability/lift table, a threshold sweep of the binary confusion
matrix, and a k-anonymity audit over quasi-identifier classes.
Exactness discipline as in ``operators/statistics.py``: integer cents /
ppm everywhere a value crosses an aggregation boundary; the only float
operations are terminal and ROUND-absorbed on both engines.

Reference parity [K]: no citation into /root/reference possible (mirror
empty, SURVEY.md §0); the family reconstructs the evaluation surface a
Spark-based training pipeline needs (SURVEY §2.10 mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..session import load_table

#: $50 score buckets for the reliability table — the events ``value``
#: score spans [0, ~500), so the bucket rollup is ~10 rows and bounded
#: by the score RANGE (fixed-width rule, `feat_quantile_bins` rationale:
#: stable edges survive retraining; bucket count never tracks corpus
#: size).
_RELIABILITY_BUCKET_CENTS = 5_000

#: $1 buckets for the threshold sweep's score cdf — ≤ ~500 rollup rows
#: at any corpus size (range-bounded, not corpus-bounded); every window
#: below runs on that rollup.
_SWEEP_BUCKET_CENTS = 100

#: $1,000 account-balance bands for the k-anonymity quasi-identifier —
#: coarse enough to be a realistic generalization level, fine enough
#: that class sizes actually spread (audited: 1..17 at sf0.01).
_KANON_BAND_CENTS = 100_000


@register(
    "eval_score_reliability",
    # Reliability/lift table: $50 score buckets; per bucket the observed
    # purchase rate in ppm, the mean score in cents, and the lift vs the
    # global base rate in ppm-of-ppm — all integer divisions on integer
    # counts, the global base rate via a window over the ~10-row rollup.
    oracle=f"""
    WITH scored AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS score_cents,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events
    ), binned AS (
        SELECT score_cents // {_RELIABILITY_BUCKET_CENTS} AS bucket,
               COUNT(*) AS n, SUM(pos) AS n_pos,
               SUM(score_cents) AS sum_cents
        FROM scored GROUP BY 1
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(bucket * {_RELIABILITY_BUCKET_CENTS} AS BIGINT) AS edge_cents,
           CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(sum_cents // n AS BIGINT) AS avg_score_cents,
           CAST(n_pos * 1000000 // n AS BIGINT) AS obs_ppm,
           CAST((n_pos * 1000000 // n) * 1000000
                // (SUM(n_pos) OVER () * 1000000 // SUM(n) OVER ())
                AS BIGINT) AS lift_ppm
    FROM binned
    """,
)
def eval_score_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score reliability / lift table: bucket the model score (events
    ``value``, cents-quantized) into fixed $50 bins and report each
    bin's observed positive rate (``event_type = 'purchase'``) in ppm,
    its mean score, and its lift vs the global base rate — the
    calibration-curve input and the campaign-targeting lift report in
    one rollup.

    Scale notes: ONE hash aggregate from the corpus to the
    range-bounded (~10-row) bucket rollup; the global base rate is a
    window over that rollup, never a second corpus pass.  Fixed-width
    edges (not quantiles) are deliberate: stable bins survive corpus
    growth, so reliability curves from different snapshots compare
    bin-for-bin (`feat_quantile_bins` documents the same rule)."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.round(F.col("value") * 100).cast("long").alias("score_cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    binned = (
        scored.groupBy(
            F.expr(f"score_cents div {_RELIABILITY_BUCKET_CENTS}").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("pos").alias("n_pos"),
            F.sum("score_cents").alias("sum_cents"),
        )
    )
    return binned.select(
        F.col("bucket").cast("long").alias("bucket"),
        (F.col("bucket") * _RELIABILITY_BUCKET_CENTS)
        .cast("long")
        .alias("edge_cents"),
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.expr("sum_cents div n").cast("long").alias("avg_score_cents"),
        F.expr("n_pos * 1000000 div n").cast("long").alias("obs_ppm"),
        F.expr(
            "(n_pos * 1000000 div n) * 1000000"
            " div (SUM(n_pos) OVER () * 1000000 div SUM(n) OVER ())"
        )
        .cast("long")
        .alias("lift_ppm"),
    )


@register(
    "eval_confusion_thresholds",
    # Decile threshold sweep of the binary confusion matrix: $1-bucket
    # score cdf → decile-opening buckets (the (cum−1)*10 div T rule);
    # per threshold TP/FP/FN/TN from ascending cumulative counts and
    # precision/recall/F1 in ppm — integer arithmetic end to end.
    oracle=f"""
    WITH scored AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS score_cents,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events
    ), buckets AS (
        SELECT score_cents // {_SWEEP_BUCKET_CENTS} AS bucket,
               COUNT(*) AS n, SUM(pos) AS n_pos
        FROM scored GROUP BY 1
    ), cum AS (
        SELECT bucket, n, n_pos,
               SUM(n) OVER (ORDER BY bucket) AS cum_n,
               SUM(n_pos) OVER (ORDER BY bucket) AS cum_pos,
               SUM(n) OVER () AS total_n,
               SUM(n_pos) OVER () AS total_pos,
               (SUM(n) OVER (ORDER BY bucket) - 1) * 10
                   // SUM(n) OVER () AS decile
        FROM buckets
    ), openers AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY decile
                                     ORDER BY bucket) AS rn
        FROM cum
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(bucket * {_SWEEP_BUCKET_CENTS} AS BIGINT) AS threshold_cents,
           CAST(total_pos - (cum_pos - n_pos) AS BIGINT) AS tp,
           CAST((total_n - (cum_n - n)) - (total_pos - (cum_pos - n_pos))
                AS BIGINT) AS fp,
           CAST(cum_pos - n_pos AS BIGINT) AS fn,
           CAST((cum_n - n) - (cum_pos - n_pos) AS BIGINT) AS tn,
           CAST((total_pos - (cum_pos - n_pos)) * 1000000
                // (total_n - (cum_n - n)) AS BIGINT) AS precision_ppm,
           CAST((total_pos - (cum_pos - n_pos)) * 1000000
                // total_pos AS BIGINT) AS recall_ppm,
           CAST(2 * (total_pos - (cum_pos - n_pos)) * 1000000
                // ((total_n - (cum_n - n)) + total_pos) AS BIGINT) AS f1_ppm
    FROM openers
    WHERE rn = 1 AND decile >= 1
    """,
)
def eval_confusion_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sweep of the binary confusion matrix: for each decile
    of the score distribution, classify ``score >= threshold`` as
    positive and report TP/FP/FN/TN plus precision, recall and F1 in
    ppm — the PR-curve / operating-point table every model report
    carries.  The threshold of decile ``d`` is the score bucket that
    OPENS the decile under the ``(cum−1)·10 div total`` rule (shared
    with `feat_quantile_bins`), so both engines pick identical edges
    without any float quantile estimate.

    Scale notes: ONE corpus aggregate to the $1-bucket score cdf
    (range-bounded ≤ ~500 rows at any corpus size — the bucket count
    tracks the score RANGE, never the row count); every cumulative
    window, the decile assignment, and the confusion arithmetic run on
    that rollup.  TP at a threshold is ``total_pos − cum_pos_below``:
    suffix counts derived from ascending cumulatives, so one window
    ordering serves the whole sweep."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.round(F.col("value") * 100).cast("long").alias("score_cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    buckets = scored.groupBy(
        F.expr(f"score_cents div {_SWEEP_BUCKET_CENTS}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("n_pos"))
    w_cum = Window.orderBy("bucket")
    cum = buckets.select(
        "bucket",
        "n",
        "n_pos",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("n_pos").over(w_cum).alias("cum_pos"),
        F.sum("n").over(Window.partitionBy()).alias("total_n"),
        F.sum("n_pos").over(Window.partitionBy()).alias("total_pos"),
    ).withColumn("decile", F.expr("(cum_n - 1) * 10 div total_n"))
    openers = cum.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("decile").orderBy("bucket")),
    ).where((F.col("rn") == 1) & (F.col("decile") >= 1))
    tp = F.col("total_pos") - (F.col("cum_pos") - F.col("n_pos"))
    pp = F.col("total_n") - (F.col("cum_n") - F.col("n"))
    return openers.select(
        F.col("decile").cast("long").alias("decile"),
        (F.col("bucket") * _SWEEP_BUCKET_CENTS)
        .cast("long")
        .alias("threshold_cents"),
        tp.cast("long").alias("tp"),
        (pp - tp).cast("long").alias("fp"),
        (F.col("cum_pos") - F.col("n_pos")).cast("long").alias("fn"),
        ((F.col("cum_n") - F.col("n")) - (F.col("cum_pos") - F.col("n_pos")))
        .cast("long")
        .alias("tn"),
        F.expr(
            "(total_pos - (cum_pos - n_pos)) * 1000000"
            " div (total_n - (cum_n - n))"
        )
        .cast("long")
        .alias("precision_ppm"),
        F.expr("(total_pos - (cum_pos - n_pos)) * 1000000 div total_pos")
        .cast("long")
        .alias("recall_ppm"),
        F.expr(
            "2 * (total_pos - (cum_pos - n_pos)) * 1000000"
            " div ((total_n - (cum_n - n)) + total_pos)"
        )
        .cast("long")
        .alias("f1_ppm"),
    )


@register(
    "privacy_k_anonymity",
    # k-anonymity audit: quasi-identifier = (nation, segment, $1k
    # balance band); per (nation, k-band) the class and row counts,
    # plus each nation's share of rows in classes below k=5 (ppm) —
    # two stacked aggs + windows on the class rollup only.
    oracle=f"""
    WITH classes AS (
        SELECT c_nationkey,
               c_mktsegment,
               (CAST(ROUND(c_acctbal * 100) AS BIGINT) + {_KANON_BAND_CENTS})
                   // {_KANON_BAND_CENTS} AS bal_band,
               COUNT(*) AS class_size
        FROM customer
        GROUP BY 1, 2, 3
    ), banded AS (
        SELECT c_nationkey,
               CASE WHEN class_size = 1 THEN '1'
                    WHEN class_size <= 4 THEN '2-4'
                    WHEN class_size <= 9 THEN '5-9'
                    ELSE '10+' END AS k_band,
               class_size,
               CASE WHEN class_size < 5 THEN class_size ELSE 0 END AS at_risk
        FROM classes
    )
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, k_band,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(class_size) AS BIGINT) AS n_rows,
           CAST(MIN(class_size) AS BIGINT) AS min_class,
           CAST(SUM(SUM(at_risk)) OVER (PARTITION BY c_nationkey) * 1000000
                // SUM(SUM(class_size)) OVER (PARTITION BY c_nationkey)
                AS BIGINT) AS nation_at_risk_ppm
    FROM banded
    GROUP BY c_nationkey, k_band
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of a would-be data release: the
    quasi-identifier is (nation, market segment, $1,000 balance band);
    every equivalence class's size is computed and histogrammed into
    k-bands per nation, with each nation's share of rows living in
    classes below k=5 (the re-identification-risk mass) in ppm — the
    table a privacy review wants before a customer extract ships.

    Scale notes: ONE hash aggregate from the corpus to the class rollup
    (bounded by |nations|x|segments|x|bands| — QI-cardinality-sized, not
    corpus-sized), then a second agg to the (nation, k-band) histogram;
    the at-risk share is a nation-partitioned window over that rollup.
    The balance band shifts by one band width before the integer div so
    the operand stays non-negative and ``div`` equals floor division on
    both engines (negative balances exist — the `join_geo_grid`
    sign-boundary rule)."""
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            f"(CAST(ROUND(c_acctbal * 100) AS BIGINT) + {_KANON_BAND_CENTS})"
            f" div {_KANON_BAND_CENTS}"
        ).alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    banded = classes.select(
        "c_nationkey",
        F.when(F.col("class_size") == 1, "1")
        .when(F.col("class_size") <= 4, "2-4")
        .when(F.col("class_size") <= 9, "5-9")
        .otherwise("10+")
        .alias("k_band"),
        "class_size",
        F.when(F.col("class_size") < 5, F.col("class_size"))
        .otherwise(0)
        .alias("at_risk"),
    )
    grouped = banded.groupBy("c_nationkey", "k_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("class_size").alias("n_rows_raw"),
        F.min("class_size").cast("long").alias("min_class"),
        F.sum("at_risk").alias("at_risk_rows"),
    )
    w_nation = Window.partitionBy("c_nationkey")
    return grouped.select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "k_band",
        "n_classes",
        F.col("n_rows_raw").cast("long").alias("n_rows"),
        "min_class",
        F.expr(
            "SUM(at_risk_rows) OVER (PARTITION BY c_nationkey) * 1000000"
            " div SUM(n_rows_raw) OVER (PARTITION BY c_nationkey)"
        )
        .cast("long")
        .alias("nation_at_risk_ppm"),
    )


@register(
    "eval_isotonic_calibration",
    # Isotonic (PAVA) calibration of the per-$50k-bin F-status rate via
    # the minimax characterization on the bounded bin rollup:
    # iso(i) = max_{j<=i} min_{k>=i} pooled_rate_ppm(j..k), where the
    # pooled rate is an exact integer ppm division of cumulative
    # (positives, counts) differences — ppm-quantized isotonic fit,
    # identical integers on both engines, no floats anywhere.
    oracle="""
    WITH b AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) // 5000000
                   AS bin,
               COUNT(*) AS n,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                   AS pos
        FROM orders GROUP BY 1
    ), cum AS (
        SELECT bin, n, pos,
               SUM(n) OVER (ORDER BY bin) AS cn,
               SUM(pos) OVER (ORDER BY bin) AS cp
        FROM b
    ), pairs AS (
        SELECT j.bin AS j, k.bin AS k,
               (k.cp - (j.cp - j.pos)) * 1000000
                   // (k.cn - (j.cn - j.n)) AS avg_ppm
        FROM cum j JOIN cum k ON k.bin >= j.bin
    ), inner_min AS (
        SELECT b.bin, p.j, MIN(p.avg_ppm) AS mn
        FROM b JOIN pairs p ON p.j <= b.bin AND p.k >= b.bin
        GROUP BY 1, 2
    ), iso AS (
        SELECT bin, MAX(mn) AS iso_ppm FROM inner_min GROUP BY 1
    )
    SELECT CAST(b.bin AS BIGINT) AS bin,
           CAST(b.n AS BIGINT) AS n_orders,
           CAST(b.pos AS BIGINT) AS positives,
           CAST(b.pos * 1000000 // b.n AS BIGINT) AS raw_rate_ppm,
           CAST(i.iso_ppm AS BIGINT) AS iso_rate_ppm,
           CAST(CASE WHEN b.pos * 1000000 // b.n <> i.iso_ppm
                     THEN 1 ELSE 0 END AS BIGINT) AS pooled
    FROM b JOIN iso i ON b.bin = i.bin
    """,
)
def eval_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration (pool-adjacent-violators fit) of a binned
    score-to-rate curve — the post-hoc calibrator every production
    classifier pipeline fits when raw bin rates wiggle non-monotonically
    (`eval_score_reliability` DIAGNOSES miscalibration; this op FIXES
    it): the monotone step function closest to the observed per-bin
    F-status rates, computed through PAVA's minimax characterization
    iso(i) = max_{j<=i} min_{k>=i} pooledRate(j..k) — evaluable as two
    grouped aggregates over a bounded pair grid instead of the
    sequential pooling loop, which is what makes the textbook-serial
    algorithm embarrassingly parallel here.  Rates are ppm-quantized
    exact integers (pooled rate = cumulative-difference division), so
    the fit is deterministic to the last bit on both engines; fixture
    audit: raw rates wiggle 318k-340k ppm across the 10 bins, so the
    fit genuinely pools (non-vacuous).

    Scale notes: ONE corpus-grain hash agg to the ~10-row $50k-bin
    rollup (range-bounded at any corpus size — `feat_quantile_bins`'s
    stable-edge rule); the pair grid is |bins|^2/2 = 55 rows and the
    minimax is two aggs over a <=550-row broadcast frame (reviewed NLJ
    + SINGLE allowlist rows).  At 100 TB only the first agg touches
    data."""
    o = load_table(spark, sf_dir, "orders")
    b = o.groupBy(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) div 5000000")
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        ).alias("pos"),
    )
    w = Window.orderBy("bin")
    cum = b.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp"),
        (F.sum("n").over(w) - F.col("n")).alias("cn_prev"),
        (F.sum("pos").over(w) - F.col("pos")).alias("cp_prev"),
    )
    k_side = cum.select(
        F.col("bin").alias("k"), F.col("cn").alias("kcn"),
        F.col("cp").alias("kcp"),
    )
    j_side = cum.select(
        F.col("bin").alias("j"),
        F.col("cn_prev").alias("jcn"),
        F.col("cp_prev").alias("jcp"),
    )
    pairs = j_side.join(
        F.broadcast(k_side), F.col("k") >= F.col("j")
    ).select(
        "j",
        "k",
        F.expr("(kcp - jcp) * 1000000 div (kcn - jcn)").alias("avg_ppm"),
    )
    bins = b.select("bin", "n", "pos")
    inner_min = (
        bins.join(
            F.broadcast(pairs),
            (F.col("j") <= F.col("bin")) & (F.col("k") >= F.col("bin")),
        )
        .groupBy("bin", "j")
        .agg(
            F.first("n").alias("n"),
            F.first("pos").alias("pos"),
            F.min("avg_ppm").alias("mn"),
        )
    )
    iso = inner_min.groupBy("bin").agg(
        F.first("n").alias("n"),
        F.first("pos").alias("pos"),
        F.max("mn").alias("iso_ppm"),
    )
    raw = F.expr("pos * 1000000 div n")
    return iso.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n").cast("long").alias("n_orders"),
        F.col("pos").cast("long").alias("positives"),
        raw.cast("long").alias("raw_rate_ppm"),
        F.col("iso_ppm").cast("long").alias("iso_rate_ppm"),
        F.when(raw != F.col("iso_ppm"), 1).otherwise(0).cast("long").alias(
            "pooled"
        ),
    )


@register(
    "privacy_l_diversity",
    # l-diversity audit over the k-anonymity QI relaxed by one column:
    # QI = (nation, $1k balance band), sensitive attribute = market
    # segment; l = distinct sensitive values per equivalence class.  A
    # class can be k-anonymous yet expose its members' segment when all
    # rows agree (l = 1) — the attack l-diversity exists to name.
    oracle=f"""
    WITH classes AS (
        SELECT c_nationkey,
               (CAST(ROUND(c_acctbal * 100) AS BIGINT) + {_KANON_BAND_CENTS})
                   // {_KANON_BAND_CENTS} AS bal_band,
               COUNT(*) AS class_size,
               COUNT(DISTINCT c_mktsegment) AS l
        FROM customer
        GROUP BY 1, 2
    ), banded AS (
        SELECT c_nationkey,
               CASE WHEN l = 1 THEN '1'
                    WHEN l = 2 THEN '2'
                    ELSE '3+' END AS l_band,
               class_size,
               CASE WHEN l < 3 THEN class_size ELSE 0 END AS exposed
        FROM classes
    )
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, l_band,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(class_size) AS BIGINT) AS n_rows,
           CAST(MIN(class_size) AS BIGINT) AS min_class,
           CAST(SUM(SUM(exposed)) OVER (PARTITION BY c_nationkey) * 1000000
                // SUM(SUM(class_size)) OVER (PARTITION BY c_nationkey)
                AS BIGINT) AS nation_exposed_ppm
    FROM banded
    GROUP BY c_nationkey, l_band
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007, public) — the
    companion check `privacy_k_anonymity` cannot make: a class of 50
    identical-QI rows is safely 50-anonymous, but if all 50 share one
    market segment the release still discloses every member's segment.
    Per equivalence class of the release QI (nation, $1,000 balance
    band) we count l = distinct sensitive values (market segment), then
    histogram classes per nation into l-bands {1, 2, 3+} with the share
    of each nation's rows living in under-diverse (l < 3) classes.

    Scale notes: ONE hash aggregate from the corpus to the class rollup
    (QI-cardinality-sized; the distinct-sensitive count rides the same
    aggregate), one agg to the (nation, l-band) histogram, and a
    nation-partitioned window for the exposed share — the
    `privacy_k_anonymity` plan with l in place of k.  The band shift
    keeps the integer div a floor on negative balances (the
    sign-boundary rule)."""
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        F.expr(
            f"(CAST(ROUND(c_acctbal * 100) AS BIGINT) + {_KANON_BAND_CENTS})"
            f" div {_KANON_BAND_CENTS}"
        ).alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("c_mktsegment").alias("l"),
    )
    banded = classes.select(
        "c_nationkey",
        F.when(F.col("l") == 1, "1")
        .when(F.col("l") == 2, "2")
        .otherwise("3+")
        .alias("l_band"),
        "class_size",
        F.when(F.col("l") < 3, F.col("class_size")).otherwise(0).alias("exposed"),
    )
    grouped = banded.groupBy("c_nationkey", "l_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("class_size").alias("n_rows_raw"),
        F.min("class_size").cast("long").alias("min_class"),
        F.sum("exposed").alias("exposed_rows"),
    )
    return grouped.select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "l_band",
        "n_classes",
        F.col("n_rows_raw").cast("long").alias("n_rows"),
        "min_class",
        F.expr(
            "SUM(exposed_rows) OVER (PARTITION BY c_nationkey) * 1000000"
            " div SUM(n_rows_raw) OVER (PARTITION BY c_nationkey)"
        )
        .cast("long")
        .alias("nation_exposed_ppm"),
    )


#: t-closeness threshold in ppm (t = 0.35): fixture class sizes run
#: 1..17 over 5 segments, so singleton classes sit near TVD ≈ 0.8 and
#: large classes near the global mix — 0.35 splits the two regimes
#: non-degenerately (audited at sf0.01 before the oracle was written).
_TCLOSE_T_PPM = 350_000


@register(
    "privacy_t_closeness",
    # t-closeness with total-variation distance (the categorical EMD
    # under unit ground distance): TVD(class) in ppm = Σ_s |c·N − g·n|
    # · 1e6 // (2·n·N), every operand an exact integer (HUGEINT carry —
    # c·N crosses int64 at ~1e9-row releases).
    oracle=f"""
    WITH cells AS (
        SELECT c_nationkey,
               (CAST(ROUND(c_acctbal * 100) AS BIGINT) + {_KANON_BAND_CENTS})
                   // {_KANON_BAND_CENTS} AS bal_band,
               c_mktsegment AS seg,
               COUNT(*) AS c
        FROM customer
        GROUP BY 1, 2, 3
    ), class_n AS (
        SELECT c_nationkey, bal_band, SUM(c) AS n
        FROM cells GROUP BY 1, 2
    ), gmix AS (
        SELECT seg, SUM(c) AS g FROM cells GROUP BY 1
    ), tot AS (
        SELECT SUM(c) AS nn FROM cells
    ), grid AS (
        SELECT cn.c_nationkey, cn.bal_band, cn.n, t.nn,
               ABS(CAST(COALESCE(ce.c, 0) AS HUGEINT) * t.nn
                   - CAST(gl.g AS HUGEINT) * cn.n) AS dev
        FROM class_n cn
        CROSS JOIN gmix gl
        CROSS JOIN tot t
        LEFT JOIN cells ce ON ce.c_nationkey = cn.c_nationkey
                          AND ce.bal_band = cn.bal_band
                          AND ce.seg = gl.seg
    ), tvd AS (
        SELECT c_nationkey, n,
               CAST(SUM(dev) * 1000000 // (2 * n * nn) AS BIGINT)
                 AS tvd_ppm
        FROM grid
        GROUP BY c_nationkey, bal_band, n, nn
    )
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MAX(tvd_ppm) AS BIGINT) AS max_tvd_ppm,
           CAST(SUM(CASE WHEN tvd_ppm > {_TCLOSE_T_PPM} THEN 1 ELSE 0 END)
                AS BIGINT) AS classes_over_t,
           CAST(SUM(CASE WHEN tvd_ppm > {_TCLOSE_T_PPM} THEN n ELSE 0 END)
                * 1000000 // SUM(n) AS BIGINT) AS exposed_rows_ppm
    FROM tvd
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007, public) —
    the third member of the release-audit triple: `privacy_k_anonymity`
    bounds re-identification, `privacy_l_diversity` bounds attribute
    disclosure by COUNT of sensitive values, and t-closeness bounds it
    by DISTRIBUTION — a class may hold all 5 segments (l = 5) yet be
    99% one segment, leaking a near-certain inference.  Per QI class
    (nation, $1k balance band) the total-variation distance between the
    class's segment mix and the global mix (the categorical EMD under
    unit ground distance); per nation: the worst class, classes over
    t = 0.35, and the share of rows living in them.

    Exactness: TVD in ppm = Σ_s |c·N − g·n| · 1e6 // (2·n·N) — every
    operand an exact integer through the int128/DECIMAL(38,0) carry
    (c·N crosses int64 at ~1e9-row releases), one integer division.
    The LEFT join against the 5-segment global frame keeps zero-count
    (class, segment) cells in the sum — dropping them understates TVD
    exactly when disclosure is worst (the l=1 class).

    Scale notes: ONE hash aggregate to the (class, segment) cell rollup
    (QI × |segments| rows), a class rollup, a broadcast |segments|-row
    global mix, and the nation rollup — nothing corpus-sized after the
    first aggregate."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        F.expr(
            f"(CAST(ROUND(c_acctbal * 100) AS BIGINT) + {_KANON_BAND_CENTS})"
            f" div {_KANON_BAND_CENTS}"
        ).alias("bal_band"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count(F.lit(1)).alias("c"))
    class_n = cells.groupBy("c_nationkey", "bal_band").agg(
        F.sum("c").alias("n")
    )
    glob = cells.groupBy("seg").agg(F.sum("c").alias("g"))
    tot = cells.agg(F.sum("c").alias("nn"))
    # class × segment grid (zero cells kept), deviation per cell
    grid = (
        class_n.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["c_nationkey", "bal_band", "seg"], "left")
        .select(
            "c_nationkey",
            "bal_band",
            "n",
            "nn",
            F.abs(
                F.expr("CAST(coalesce(c, 0) AS DECIMAL(38,0)) * nn")
                - F.expr("CAST(g AS DECIMAL(38,0)) * n")
            ).alias("dev"),
        )
    )
    tvd = grid.groupBy("c_nationkey", "bal_band", "n", "nn").agg(
        F.sum("dev").alias("absdev")
    ).select(
        "c_nationkey",
        "n",
        F.expr("CAST(absdev * 1000000 div (2 * n * nn) AS BIGINT)").alias(
            "tvd_ppm"
        ),
    )
    return (
        tvd.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.max("tvd_ppm").cast("long").alias("max_tvd_ppm"),
            F.sum(
                F.when(F.col("tvd_ppm") > _TCLOSE_T_PPM, 1).otherwise(0)
            )
            .cast("long")
            .alias("classes_over_t"),
            F.sum(
                F.when(F.col("tvd_ppm") > _TCLOSE_T_PPM, F.col("n")).otherwise(0)
            ).alias("exposed_raw"),
            F.sum("n").alias("n_rows_raw"),
        )
        .select(
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            "n_classes",
            "max_tvd_ppm",
            "classes_over_t",
            F.expr("exposed_raw * 1000000 div n_rows_raw")
            .cast("long")
            .alias("exposed_rows_ppm"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "privacy_forget_user_purge",
    # Right-to-be-forgotten purge plan: the deterministic request set
    # (user_id % 97 == 0) swept across every user-keyed table — per
    # table the rows to purge, the rows that remain, and the residual
    # after the anti-join (which must be 0: the purge VERIFIES itself).
    oracle="""
    WITH req AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
    ), ev AS (
        SELECT 'events' AS table_name,
               COUNT(*) FILTER (WHERE user_id % 97 = 0) AS rows_to_purge,
               COUNT(*) FILTER (WHERE user_id % 97 <> 0) AS rows_kept
        FROM events
    ), ev_resid AS (
        SELECT COUNT(*) AS residual
        FROM events e JOIN req r ON e.user_id = r.user_id
        WHERE e.user_id % 97 <> 0
    ), cu AS (
        SELECT 'customer' AS table_name,
               COUNT(*) FILTER (WHERE c_custkey % 97 = 0) AS rows_to_purge,
               COUNT(*) FILTER (WHERE c_custkey % 97 <> 0) AS rows_kept
        FROM customer
    ), cu_resid AS (
        SELECT COUNT(*) AS residual
        FROM customer c JOIN req r ON c.c_custkey = r.user_id
        WHERE c.c_custkey % 97 <> 0
    ), orph AS (
        -- orders whose customer is purged must cascade
        SELECT 'orders_cascade' AS table_name,
               COUNT(*) FILTER (WHERE o_custkey % 97 = 0) AS rows_to_purge,
               COUNT(*) FILTER (WHERE o_custkey % 97 <> 0) AS rows_kept
        FROM orders
    ), or_resid AS (
        SELECT COUNT(*) AS residual
        FROM orders o JOIN req r ON o.o_custkey = r.user_id
        WHERE o.o_custkey % 97 <> 0
    )
    SELECT table_name,
           CAST(rows_to_purge AS BIGINT) AS rows_to_purge,
           CAST(rows_kept AS BIGINT) AS rows_kept,
           CAST(residual AS BIGINT) AS residual_after_purge
    FROM ev CROSS JOIN ev_resid
    UNION ALL
    SELECT table_name, CAST(rows_to_purge AS BIGINT),
           CAST(rows_kept AS BIGINT), CAST(residual AS BIGINT)
    FROM cu CROSS JOIN cu_resid
    UNION ALL
    SELECT table_name, CAST(rows_to_purge AS BIGINT),
           CAST(rows_kept AS BIGINT), CAST(residual AS BIGINT)
    FROM orph CROSS JOIN or_resid
    ORDER BY table_name
    """,
)
def privacy_forget_user_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten purge plan (GDPR Art. 17 — the deletion
    workload every 100 TB lake must support): given a deterministic
    deletion-request set (user_id % 97 == 0 — a worklist table in
    production), sweep every subject-keyed table and report, per table,
    the rows to purge, the rows that remain, and the RESIDUAL the
    verifying anti-join finds after the purge — which the operator
    computes (not asserts) so the report is the audit artifact: a
    non-zero residual means a missed key path.  The customer sweep
    cascades into orders (FK-reachable personal data is in scope).

    Scale notes: one aggregate per table with the membership predicate
    evaluated scan-side (conditional counts — no join for the plan
    counts); the residual verification joins each table against the
    request set on its key (broadcast — request sets are human-scale)
    and counts survivors that should be gone.  At a real lake this
    becomes a MERGE/DELETE per table plus this same report; the
    anti-join verification is the part teams forget."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    req = e.where(F.col("user_id") % 97 == 0).select("user_id").distinct()

    def plan(df: DataFrame, key: str, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.sum(F.when(F.col(key) % 97 == 0, 1).otherwise(0))
            .cast("long")
            .alias("rows_to_purge"),
            F.sum(F.when(F.col(key) % 97 != 0, 1).otherwise(0))
            .cast("long")
            .alias("rows_kept"),
        )

    # Residual verification, computed PER TABLE (ADVICE r10: the audit
    # must be genuinely computed everywhere, never hardcoded): the
    # purge-filtered table joined back to the request set — rows that
    # survive a purge they belong to.  Zero is the EXPECTED result, but
    # the report earns that zero with an actual join each time.
    req_keys = req.select(F.col("user_id").alias("__req_key"))

    def resid(df: DataFrame, key: str) -> DataFrame:
        return (
            df.where(F.col(key) % 97 != 0)
            .join(F.broadcast(req_keys), F.col(key) == F.col("__req_key"))
            .agg(F.count(F.lit(1)).cast("long").alias("residual"))
        )

    ev = plan(e, "user_id", "events").crossJoin(
        F.broadcast(resid(e, "user_id"))
    )
    cu = plan(c, "c_custkey", "customer").crossJoin(
        F.broadcast(resid(c, "c_custkey"))
    )
    orph = plan(o, "o_custkey", "orders_cascade").crossJoin(
        F.broadcast(resid(o, "o_custkey"))
    )
    return (
        ev.select(
            "table_name",
            "rows_to_purge",
            "rows_kept",
            F.col("residual").alias("residual_after_purge"),
        )
        .unionByName(
            cu.select(
                "table_name",
                "rows_to_purge",
                "rows_kept",
                F.col("residual").alias("residual_after_purge"),
            )
        )
        .unionByName(
            orph.select(
                "table_name",
                "rows_to_purge",
                "rows_kept",
                F.col("residual").alias("residual_after_purge"),
            )
        )
        .orderBy("table_name")
    )


#: NDCG@10 position weights: round(1e9 / log2(pos+1)) for pos 1..10,
#: computed ONCE in Python and shipped to BOTH engines as integer
#: literals — the price-elasticity literal recipe (zero cross-libm
#: exposure; the bounded domain here is the metric's own cutoff k=10).
_NDCG_W: tuple[int, ...] = (
    1000000000,
    630929754,
    500000000,
    430676558,
    386852807,
    356207187,
    333333333,
    315464877,
    301029996,
    289064826,
)


def _ndcg_weight_case(pos_col: str) -> str:
    """CASE expression mapping a 1-based position to its e9 weight —
    identical SQL text on both engines."""
    whens = " ".join(
        f"WHEN {p + 1} THEN {w}" for p, w in enumerate(_NDCG_W)
    )
    return f"CASE {pos_col} {whens} ELSE 0 END"


@register(
    "eval_ndcg",
    # NDCG@10 (Järvelin–Kekäläinen 2002, public) treating each order as
    # a ranked retrieval: position = rank of the line by extendedprice
    # (the "model score"), graded relevance = quantity.  DCG and IDCG
    # ride as EXACT integers: Σ rel·w_pos with w_pos the shared e9
    # literals above — so NDCG is ONE integer ppm division per order and
    # the whole metric is float-free end to end.
    oracle=f"""
    WITH ranked AS (
      SELECT l_orderkey,
             CAST(ROUND(l_quantity, 0) AS BIGINT) AS rel,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber, l_quantity)
                 AS pos,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_quantity DESC, l_linenumber, l_extendedprice)
                 AS ideal_pos
      FROM lineitem
    ), per_order AS (
      SELECT l_orderkey,
             CAST(SUM(rel * ({_ndcg_weight_case("pos")})) AS BIGINT)
               AS dcg_e9,
             CAST(SUM(rel * ({_ndcg_weight_case("ideal_pos")})) AS BIGINT)
               AS idcg_e9
      FROM ranked GROUP BY 1
    ), scored AS (
      SELECT dcg_e9 * 1000000 // idcg_e9 AS ndcg_ppm FROM per_order
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orders_total,
             CAST(SUM(ndcg_ppm) // COUNT(*) AS BIGINT) AS mean_ndcg_ppm
      FROM scored
    )
    SELECT CAST(LEAST(ndcg_ppm // 100000, 9) AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) * 1000000 // MAX(t.n_orders_total) AS BIGINT)
             AS share_ppm,
           MAX(t.mean_ndcg_ppm) AS mean_ndcg_ppm,
           MAX(t.n_orders_total) AS n_orders_total
    FROM scored CROSS JOIN tot t
    GROUP BY 1 ORDER BY decile
    """,
)
def eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the price ranking against quantity relevance — each
    order is a 'query': its lines are ranked by extendedprice (the
    model's score) and judged by quantity (the graded label), the
    standard offline eval for learned rankers.  A high mean says
    expensive lines are also high-quantity lines; the fixture's price ⊥
    quantity gives the mid-range honest baseline of a random ranking
    over ≤13 graded items, pinned by the law pytest's exact poles
    (aligned ranking → 1e6 exactly, reversed → the hand-computed
    minimum).

    Exactness: the e9 position weights are Python-computed literals
    shared by both engines (the `orders_price_elasticity` recipe —
    zero cross-libm exposure; NDCG's own cutoff k=10 bounds the
    domain); rel·w sums are exact integers (per-order DCG ≤ 5e11; the ppm numerator ≤ 5e17 ≪ int64 AT ANY corpus size — the k=10 cutoff bounds it per order);
    per-order NDCG is ONE integer ppm division; decile, shares and the
    mean are integer div — no float anywhere.

    Scale notes: two ROW_NUMBER windows PARTITIONED BY l_orderkey
    (keyed shuffle, never single-partition) → per-order hash agg →
    order-grain scored frame → 10-row decile rollup + broadcast 1-row
    total cross.  Work is linear in lineitems at every stage."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
    )
    w_pos = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_linenumber"),
        F.col("l_quantity"),
    )
    w_ideal = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_quantity").desc(),
        F.col("l_linenumber"),
        F.col("l_extendedprice"),
    )
    ranked = l.select(
        "l_orderkey",
        F.expr("CAST(ROUND(l_quantity, 0) AS BIGINT)").alias("rel"),
        F.row_number().over(w_pos).alias("pos"),
        F.row_number().over(w_ideal).alias("ideal_pos"),
    )
    per_order = ranked.groupBy("l_orderkey").agg(
        F.expr(
            f"CAST(SUM(rel * ({_ndcg_weight_case('pos')})) AS BIGINT)"
        ).alias("dcg_e9"),
        F.expr(
            f"CAST(SUM(rel * ({_ndcg_weight_case('ideal_pos')})) AS BIGINT)"
        ).alias("idcg_e9"),
    )
    scored = per_order.select(
        F.expr("dcg_e9 * 1000000 div idcg_e9").alias("ndcg_ppm")
    )
    tot = scored.agg(
        F.count("*").cast("long").alias("n_orders_total"),
        F.expr("CAST(SUM(ndcg_ppm) div COUNT(1) AS BIGINT)").alias(
            "mean_ndcg_ppm"
        ),
    )
    return (
        scored.select(
            F.least(F.expr("ndcg_ppm div 100000"), F.lit(9))
            .cast("long")
            .alias("decile")
        )
        .groupBy("decile")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_orders",
            F.expr("n_orders * 1000000 div n_orders_total")
            .cast("long")
            .alias("share_ppm"),
            "mean_ndcg_ppm",
            "n_orders_total",
        )
        .orderBy("decile")
    )


#: MRR@10 reciprocal-rank literals: round(1e6 / r) for r = 1..10 —
#: the _NDCG_W recipe at e6 (bounded by the metric's own cutoff).
_MRR_W: tuple[int, ...] = (
    1000000,
    500000,
    333333,
    250000,
    200000,
    166667,
    142857,
    125000,
    111111,
    100000,
)


def _mrr_weight_case(pos_col: str) -> str:
    whens = " ".join(
        f"WHEN {p + 1} THEN {w}" for p, w in enumerate(_MRR_W)
    )
    return f"CASE {pos_col} {whens} ELSE 0 END"


@register(
    "eval_mrr",
    # Mean reciprocal rank @10 (TREC QA track, public) — NDCG's binary
    # sibling: each order is a query ranked by extendedprice; a line is
    # RELEVANT when quantity ≥ 30; the order scores 1/rank of the FIRST
    # relevant line (0 when none lands in the top 10).  rr rides as an
    # e6 integer from the shared literal table, so the histogram groups
    # on the ≤11 possible exact values and the mean is one integer
    # division — float-free end to end.
    oracle=f"""
    WITH ranked AS (
      SELECT l_orderkey,
             CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END AS rel,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber, l_quantity)
                 AS pos
      FROM lineitem
    ), per_order AS (
      SELECT l_orderkey,
             COALESCE(MIN(CASE WHEN rel = 1 AND pos <= 10
                           THEN pos END), 0) AS first_pos
      FROM ranked GROUP BY 1
    ), scored AS (
      SELECT CAST({_mrr_weight_case("first_pos")} AS BIGINT) AS rr_e6
      FROM per_order
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orders_total,
             CAST(SUM(rr_e6) // COUNT(*) AS BIGINT) AS mean_rr_e6
      FROM scored
    )
    SELECT rr_e6,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) * 1000000 // MAX(t.n_orders_total) AS BIGINT)
             AS share_ppm,
           MAX(t.mean_rr_e6) AS mean_rr_e6,
           MAX(t.n_orders_total) AS n_orders_total
    FROM scored CROSS JOIN tot t
    GROUP BY 1 ORDER BY rr_e6
    """,
)
def eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank @10 of the price ranking against binary
    relevance (quantity ≥ 30) — the first-hit metric beside
    `eval_ndcg`'s graded one: MRR asks 'how far down does a user scan
    before the first good result', the navigational-search yardstick.
    An order with no relevant line in its top 10 scores exactly 0
    (the standard convention — excluding such queries inflates the
    metric).  The fixture's price ⊥ quantity gives the honest
    random-ranking baseline; the law pytest pins the pos-1 pole
    (rr = 1e6), the no-relevant zero, and engine == Python replica.

    Exactness: reciprocal ranks are shared e6 integer literals (the
    `eval_ndcg` recipe — the metric's own k=10 cutoff bounds the
    table); every order's score is ONE exact table lookup; the
    histogram groups on the ≤11 possible exact values; shares and the
    mean are integer divisions.  No float anywhere.

    Scale notes: ONE ROW_NUMBER window PARTITIONED BY l_orderkey →
    per-order min-agg → ≤11-row value rollup + broadcast 1-row total
    cross.  Linear in lineitems."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    w_pos = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_linenumber"),
        F.col("l_quantity"),
    )
    ranked = l.select(
        "l_orderkey",
        F.when(F.col("l_quantity") >= 30, 1).otherwise(0).alias("rel"),
        F.row_number().over(w_pos).alias("pos"),
    )
    per_order = ranked.groupBy("l_orderkey").agg(
        F.coalesce(
            F.min(
                F.when(
                    (F.col("rel") == 1) & (F.col("pos") <= 10),
                    F.col("pos"),
                )
            ),
            F.lit(0),
        ).alias("first_pos")
    )
    scored = per_order.select(
        F.expr(f"CAST({_mrr_weight_case('first_pos')} AS BIGINT)").alias(
            "rr_e6"
        )
    )
    tot = scored.agg(
        F.count("*").cast("long").alias("n_orders_total"),
        F.expr("CAST(SUM(rr_e6) div COUNT(1) AS BIGINT)").alias(
            "mean_rr_e6"
        ),
    )
    return (
        scored.groupBy("rr_e6")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "rr_e6",
            "n_orders",
            F.expr("n_orders * 1000000 div n_orders_total")
            .cast("long")
            .alias("share_ppm"),
            "mean_rr_e6",
            "n_orders_total",
        )
        .orderBy("rr_e6")
    )


@register(
    "eval_map",
    # Mean average precision @10 (TREC, public) — the third member of
    # the ranking-eval family: AP integrates precision at every
    # relevant position, rewarding rankers that pack relevant items
    # early (MRR sees only the FIRST hit, NDCG needs grades; AP is the
    # binary-relevance area under P-R).  AP@10 = Σ_{rel k ≤ 10}
    # P@k / min(R, 10) with P@k = r_k/k carried as r_k · round(1e6/k)
    # (the shared literal table) — exact integers end to end; queries
    # with no relevant item are EXCLUDED (the TREC convention).
    oracle=f"""
    WITH ranked AS (
      SELECT l_orderkey,
             CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END AS rel,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber, l_quantity)
                 AS pos
      FROM lineitem
    ), cum AS (
      SELECT l_orderkey, rel, pos,
             SUM(rel) OVER (PARTITION BY l_orderkey ORDER BY pos)
               AS r_k,
             SUM(rel) OVER (PARTITION BY l_orderkey) AS r_total
      FROM ranked
    ), per_order AS (
      SELECT l_orderkey,
             CAST(SUM(CASE WHEN rel = 1 AND pos <= 10
                  THEN r_k * ({_mrr_weight_case("pos")})
                  ELSE 0 END) AS BIGINT) AS ap_num_e6,
             CAST(LEAST(MAX(r_total), 10) AS BIGINT) AS r_cap
      FROM cum GROUP BY 1
      HAVING MAX(r_total) > 0
    ), scored AS (
      SELECT ap_num_e6 // r_cap AS ap_e6 FROM per_order
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orders_scored,
             CAST(SUM(ap_e6) // COUNT(*) AS BIGINT) AS map_e6
      FROM scored
    )
    SELECT CAST(LEAST(ap_e6 // 100000, 9) AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) * 1000000 // MAX(t.n_orders_scored) AS BIGINT)
             AS share_ppm,
           MAX(t.map_e6) AS map_e6,
           MAX(t.n_orders_scored) AS n_orders_scored
    FROM scored CROSS JOIN tot t
    GROUP BY 1 ORDER BY decile
    """,
)
def eval_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean average precision @10 of the price ranking against binary
    relevance (quantity ≥ 30) — completes the ranking-eval triple:
    `eval_mrr` scores the first hit, `eval_ndcg` graded positions,
    AP the whole precision–recall sweep (a ranker that buries half the
    relevant items keeps a decent MRR but loses AP).  Orders with no
    relevant line are excluded per the TREC convention — including
    them as 0 would conflate 'no relevant inventory' with 'bad
    ranking'.  The fixture's price ⊥ quantity gives the honest
    random-ranking baseline; the law pytest pins the perfect-packing
    pole (all relevant first → 1e6 exactly), a hand-computed split
    ranking, and engine == Python replica.

    Exactness: running relevant counts r_k are exact window integers;
    P@k rides as r_k·round(1e6/k) from the shared literal table (the
    `eval_mrr` weights — the metric's own cutoff bounds it); the AP
    division and the decile/mean rollups are integer div.  No float
    anywhere.

    Scale notes: one ROW_NUMBER + two running-sum windows PARTITIONED
    BY l_orderkey (keyed shuffle) → per-order agg with a HAVING that
    drops unjudgeable orders → 10-row decile rollup + broadcast 1-row
    total cross.  Linear in lineitems."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    w_pos = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_linenumber"),
        F.col("l_quantity"),
    )
    ranked = l.select(
        "l_orderkey",
        F.when(F.col("l_quantity") >= 30, 1).otherwise(0).alias("rel"),
        F.row_number().over(w_pos).alias("pos"),
    )
    w_cum = (
        Window.partitionBy("l_orderkey")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_orderkey")
    cum = ranked.select(
        "l_orderkey",
        "rel",
        "pos",
        F.sum("rel").over(w_cum).alias("r_k"),
        F.sum("rel").over(w_all).alias("r_total"),
    )
    per_order = (
        cum.groupBy("l_orderkey")
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN rel = 1 AND pos <= 10"
                f" THEN r_k * ({_mrr_weight_case('pos')})"
                f" ELSE 0 END) AS BIGINT)"
            ).alias("ap_num_e6"),
            F.expr("CAST(LEAST(MAX(r_total), 10) AS BIGINT)").alias(
                "r_cap"
            ),
            F.max("r_total").alias("r_total"),
        )
        .where(F.col("r_total") > 0)
    )
    scored = per_order.select(
        F.expr("ap_num_e6 div r_cap").alias("ap_e6")
    )
    tot = scored.agg(
        F.count("*").cast("long").alias("n_orders_scored"),
        F.expr("CAST(SUM(ap_e6) div COUNT(1) AS BIGINT)").alias("map_e6"),
    )
    return (
        scored.select(
            F.least(F.expr("ap_e6 div 100000"), F.lit(9))
            .cast("long")
            .alias("decile")
        )
        .groupBy("decile")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_orders",
            F.expr("n_orders * 1000000 div n_orders_scored")
            .cast("long")
            .alias("share_ppm"),
            "map_e6",
            "n_orders_scored",
        )
        .orderBy("decile")
    )


#: Truncated RBO@10 (p = 0.9) weight tables, Python-computed once and
#: shared by BOTH engines.  U_d = round((1−p)p^{d−1}/d · 1e9) is depth
#: d's agreement weight; V_m = Σ_{d≥m} U_d is the TOTAL weight an item
#: first co-present at depth m contributes (the suffix-sum trick that
#: turns RBO into one lookup per line); M_n = Σ_{p≤n} V_p is the
#: identical-ranking maximum for an n-item list (n capped at 10).
_RBO_V: tuple[int, ...] = (
    235416399,
    135416399,
    90416399,
    63416399,
    45191399,
    32069399,
    22227899,
    14635885,
    8657174,
    3874205,
)
_RBO_M: tuple[int, ...] = (
    235416399,
    370832798,
    461249197,
    524665596,
    569856995,
    601926394,
    624154293,
    638790178,
    647447352,
    651321557,
)


def _rbo_case(col: str, table: tuple[int, ...]) -> str:
    whens = " ".join(
        f"WHEN {i + 1} THEN {w}" for i, w in enumerate(table)
    )
    return f"CASE {col} {whens} ELSE 0 END"


@register(
    "eval_rbo",
    # Rank-biased overlap (Webber–Moffat–Zobel 2010, public), truncated
    # at depth 10 with p = 0.9, between the price ranking and the
    # quantity ranking of each order's lines — 'do the two rankers
    # agree at the top?', the standard top-weighted list-comparison
    # metric.  The key reduction: an item first co-present in both
    # top-d lists at depth m = max(pos_price, pos_qty) contributes
    # EXACTLY V_m = Σ_{d≥m} U_d, so the whole metric is ONE integer
    # lookup per line + an integer division by the identical-ranking
    # maximum M_min(n,10) — float-free end to end.
    oracle=f"""
    WITH ranked AS (
      SELECT l_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber, l_quantity)
                 AS pos_a,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_quantity DESC, l_linenumber, l_extendedprice)
                 AS pos_b
      FROM lineitem
    ), per_order AS (
      SELECT l_orderkey,
             CAST(SUM({_rbo_case("GREATEST(pos_a, pos_b)", _RBO_V)})
                  AS BIGINT) AS score_e9,
             CAST(LEAST(COUNT(*), 10) AS BIGINT) AS n_cap
      FROM ranked GROUP BY 1
    ), scored AS (
      SELECT score_e9 * 1000000
               // ({_rbo_case("n_cap", _RBO_M)}) AS rbo_ppm
      FROM per_order
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orders_total,
             CAST(SUM(rbo_ppm) // COUNT(*) AS BIGINT) AS mean_rbo_ppm
      FROM scored
    )
    SELECT CAST(LEAST(rbo_ppm // 100000, 9) AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) * 1000000 // MAX(t.n_orders_total) AS BIGINT)
             AS share_ppm,
           MAX(t.mean_rbo_ppm) AS mean_rbo_ppm,
           MAX(t.n_orders_total) AS n_orders_total
    FROM scored CROSS JOIN tot t
    GROUP BY 1 ORDER BY decile
    """,
)
def eval_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap @10 (p = 0.9) between each order's price
    ranking and its quantity ranking — the ranker-AGREEMENT member of
    the eval family: MRR/NDCG/MAP score one ranking against labels;
    RBO compares two rankings against each other, top-weighted so
    disagreement at rank 1 costs ~26× more than at rank 10 (the
    A/B-ranker regression check run before swapping a scorer).
    Truncated RBO (no residual extrapolation), normalized by the
    identical-ranking maximum so 1e6 means the rankers agree exactly.
    The fixture's price ⊥ quantity gives the honest same-set baseline
    (same items, independent orders — RBO well above 0 by set overlap
    alone, far below 1e6); the law pytests pin the identical-ranking
    pole at 1e6 EXACTLY and the engine == Python replica on arbitrary
    constructed orders.

    Exactness: an item first co-present at depth m = max(pos_price,
    pos_qty) contributes exactly V_m = Σ_{d≥m} U_d of agreement mass —
    shared e9 integer literals (the metric's own p^d decay bounds the
    table at its cutoff); per-order RBO is ONE integer division by
    M_min(n,10); histogram/mean are integer div.  No float anywhere.

    Scale notes: two ROW_NUMBER windows PARTITIONED BY l_orderkey →
    one order-grain agg → 10-row decile rollup + broadcast 1-row
    total cross.  Linear in lineitems (the eval_ndcg posture)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    w_a = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_linenumber"),
        F.col("l_quantity"),
    )
    w_b = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_quantity").desc(),
        F.col("l_linenumber"),
        F.col("l_extendedprice"),
    )
    ranked = l.select(
        "l_orderkey",
        F.row_number().over(w_a).alias("pos_a"),
        F.row_number().over(w_b).alias("pos_b"),
    )
    per_order = ranked.groupBy("l_orderkey").agg(
        F.expr(
            f"CAST(SUM({_rbo_case('GREATEST(pos_a, pos_b)', _RBO_V)})"
            " AS BIGINT)"
        ).alias("score_e9"),
        F.expr("CAST(LEAST(COUNT(1), 10) AS BIGINT)").alias("n_cap"),
    )
    scored = per_order.select(
        F.expr(
            f"score_e9 * 1000000 div ({_rbo_case('n_cap', _RBO_M)})"
        ).alias("rbo_ppm")
    )
    tot = scored.agg(
        F.count("*").cast("long").alias("n_orders_total"),
        F.expr("CAST(SUM(rbo_ppm) div COUNT(1) AS BIGINT)").alias(
            "mean_rbo_ppm"
        ),
    )
    return (
        scored.select(
            F.least(F.expr("rbo_ppm div 100000"), F.lit(9))
            .cast("long")
            .alias("decile")
        )
        .groupBy("decile")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_orders",
            F.expr("n_orders * 1000000 div n_orders_total")
            .cast("long")
            .alias("share_ppm"),
            "mean_rbo_ppm",
            "n_orders_total",
        )
        .orderBy("decile")
    )


@register(
    "eval_krippendorff_alpha",
    # Krippendorff's alpha, nominal scale (public; the many-rater,
    # missing-data generalization `eval_cohens_kappa` cannot reach —
    # kappa needs exactly two raters).  Units = orders, "raters" = the
    # order's lineitems, label = l_returnflag; units contribute with
    # 2..7 ratings (TPC-H's lineitem-per-order span, the panel-width
    # window).  EXACT integer form: the per-unit disagreement term
    # Σ_c o_uc(m_u−o_uc)/(m_u−1) is made integral by the LCM trick —
    # m_u−1 ∈ {1..6} all divide 60, so 60/(m_u−1) is exact and
    # do_num = Σ_u (60/(m_u−1))·Σ_c o_uc(m_u−o_uc) is a BIGINT;
    # De's N²−Σn_c² is exact; alpha_e6 = 1e6 − do_num·(N−1)·1e6 //
    # (60·(N²−Σn_c²)) rides HUGEINT/DECIMAL(38,0) (the product tops
    # ~1e26 at sf1).  Single-category corpora (N²=Σn²) yield NULL —
    # the family degenerate convention.
    oracle="""
    WITH r AS (
      SELECT l_orderkey AS unit, l_returnflag AS cat FROM lineitem
    ), m AS (
      SELECT unit, COUNT(*) AS mu FROM r GROUP BY unit
    ), inc AS (
      SELECT unit, mu FROM m WHERE mu BETWEEN 2 AND 7
    ), o AS (
      SELECT r.unit, r.cat, COUNT(*) AS ouc, MAX(i.mu) AS mu
      FROM r JOIN inc i ON r.unit = i.unit
      GROUP BY r.unit, r.cat
    ), dnum AS (
      SELECT CAST(SUM((60 // (mu - 1)) * ouc * (mu - ouc)) AS HUGEINT)
               AS do_num
      FROM o
    ), cats AS (
      SELECT cat, CAST(SUM(ouc) AS HUGEINT) AS n_c FROM o GROUP BY cat
    ), tot AS (
      SELECT CAST(SUM(n_c) AS HUGEINT) AS nn,
             CAST(SUM(n_c * n_c) AS HUGEINT) AS s2
      FROM cats
    ), units AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_units FROM inc
    )
    SELECT c.cat AS category,
           CAST(c.n_c AS BIGINT) AS n_ratings,
           u.n_units,
           CAST(t.nn AS BIGINT) AS n_ratings_total,
           CAST(CASE WHEN t.nn * t.nn > t.s2 THEN
                  1000000 - (d.do_num * (t.nn - 1) * 1000000)
                            // (60 * (t.nn * t.nn - t.s2))
                END AS BIGINT) AS alpha_e6
    FROM cats c CROSS JOIN tot t CROSS JOIN dnum d CROSS JOIN units u
    ORDER BY category
    """,
)
def eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) over the order "panels" — the
    inter-rater reliability measure that handles MANY raters and
    uneven panel sizes, which `eval_cohens_kappa` (two raters) cannot:
    each order's lineitems act as 2-7 raters labeling the order with
    their return flag.  alpha = 1 − Do/De with Do the within-unit
    pairwise disagreement rate and De the chance rate from the pooled
    category margins; 1 = perfect agreement, 0 = chance, negative =
    systematic disagreement.

    Exactness: the per-unit term Σ_c o_uc(m_u−o_uc)/(m_u−1) is made
    INTEGRAL by the LCM-60 trick (m_u−1 ∈ {1..6} all divide 60), so
    Do's numerator, the margins, N²−Σn_c², and the final e6 value are
    one exact integer-division chain — no float anywhere; the big
    product rides DECIMAL(38,0)/HUGEINT.  Single-category corpora
    (De = 0) yield NULL, the family degenerate convention.  Law
    pytests pin the poles: all-same-label units → exactly 1e6;
    one-of-each two-category panels → exactly 1e6 − (2U−1)·1e6 // U
    (the textbook 1 − (2 − 1/U) small-sample value).

    Scale notes: one (unit, cat) agg over the fact table, one
    unit-sized filter join, then three ≤|cats|-row rollups crossed
    broadcast-style — the `agg_partial_corr` posture; output is
    |cats| rows."""
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("unit"), F.col("l_returnflag").alias("cat")
    )
    m = l.groupBy("unit").agg(F.count(F.lit(1)).alias("mu"))
    inc = m.where((F.col("mu") >= 2) & (F.col("mu") <= 7))
    o = (
        l.join(inc, "unit")
        .groupBy("unit", "cat")
        .agg(F.count(F.lit(1)).alias("ouc"), F.max("mu").alias("mu"))
    )
    dnum = o.agg(
        F.expr(
            "CAST(SUM((60 div (mu - 1)) * ouc * (mu - ouc))"
            " AS DECIMAL(38,0))"
        ).alias("do_num")
    )
    cats = o.groupBy("cat").agg(
        F.expr("CAST(SUM(ouc) AS DECIMAL(38,0))").alias("n_c")
    )
    tot = cats.agg(
        F.expr("CAST(SUM(n_c) AS DECIMAL(38,0))").alias("nn"),
        F.expr("CAST(SUM(n_c * n_c) AS DECIMAL(38,0))").alias("s2"),
    )
    units = inc.agg(F.count(F.lit(1)).cast("long").alias("n_units"))
    return (
        cats.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dnum))
        .crossJoin(F.broadcast(units))
        .select(
            F.col("cat").alias("category"),
            F.col("n_c").cast("long").alias("n_ratings"),
            "n_units",
            F.col("nn").cast("long").alias("n_ratings_total"),
            F.expr(
                "CAST(CASE WHEN nn * nn > s2 THEN"
                " 1000000 - (do_num * (nn - 1) * 1000000)"
                "           div (60 * (nn * nn - s2))"
                " END AS BIGINT)"
            ).alias("alpha_e6"),
        )
        .orderBy("category")
    )


@register(
    "eval_fleiss_kappa",
    # Fleiss' kappa (public: Fleiss 1971, "Measuring nominal scale
    # agreement among many raters") — the FIXED-panel-size many-rater
    # agreement measure: `eval_cohens_kappa` needs exactly two raters
    # and `eval_krippendorff_alpha` pools uneven panels; Fleiss' kappa
    # is defined for N units each rated by exactly n raters, so the op
    # reports one kappa PER PANEL SIZE n ∈ {2..7} (TPC-H's
    # lineitem-per-order span) — each group satisfies the fixed-n
    # assumption exactly instead of forcing one arbitrary n.  Units =
    # orders, raters = the order's lineitems, label = l_returnflag.
    # EXACT integer form: with so2 = Σ_{u,c} o_uc², N units, n raters,
    # Nn = N·n, S2 = Σ_c n_c²:  P̄  = (so2 − Nn)/(Nn(n−1)),
    # P̄e = S2/(Nn)², and kappa = (P̄−P̄e)/(1−P̄e) collapses to ONE
    # exact rational:  (  (so2 − Nn)·(Nn)² − Nn(n−1)·S2  ) · 1e6
    #              div (  Nn(n−1)·((Nn)² − S2)  )
    # — every term integral, rides DECIMAL(38,0)/HUGEINT (the product
    # tops ~1e28 at sf10; headroom to ~sf3000 documented), both
    # engines' integer division truncating toward zero (the gamma_gk
    # verification).  Single-category groups ((Nn)² = S2) yield NULL —
    # the family degenerate convention.
    oracle="""
    WITH r AS (
      SELECT l_orderkey AS unit, l_returnflag AS cat FROM lineitem
    ), m AS (
      SELECT unit, COUNT(*) AS n FROM r GROUP BY unit
    ), inc AS (
      SELECT unit, n FROM m WHERE n BETWEEN 2 AND 7
    ), o AS (
      SELECT r.unit, MAX(i.n) AS n, r.cat, COUNT(*) AS ouc
      FROM r JOIN inc i ON r.unit = i.unit
      GROUP BY r.unit, r.cat
    ), per_n AS (
      SELECT n,
             CAST(COUNT(DISTINCT unit) AS HUGEINT) AS nu,
             CAST(SUM(ouc * ouc) AS HUGEINT) AS so2
      FROM o GROUP BY n
    ), margins AS (
      SELECT n, cat, CAST(SUM(ouc) AS HUGEINT) AS n_c
      FROM o GROUP BY n, cat
    ), s2 AS (
      SELECT n, CAST(SUM(n_c * n_c) AS HUGEINT) AS s2 FROM margins
      GROUP BY n
    )
    SELECT CAST(p.n AS BIGINT) AS panel_n,
           CAST(p.nu AS BIGINT) AS n_units,
           CAST(p.nu * p.n AS BIGINT) AS n_ratings,
           CAST(CASE WHEN (p.nu*p.n)*(p.nu*p.n) > s.s2 THEN
                  ((p.so2 - p.nu*p.n) * (p.nu*p.n) * (p.nu*p.n)
                   - p.nu*p.n * (p.n - 1) * s.s2) * 1000000
                  // (p.nu*p.n * (p.n - 1)
                      * ((p.nu*p.n)*(p.nu*p.n) - s.s2))
                END AS BIGINT) AS kappa_e6
    FROM per_n p JOIN s2 s ON p.n = s.n
    ORDER BY panel_n
    """,
)
def eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa per panel size over the order "panels" — N units
    each rated by exactly n raters (the order's n lineitems labeling
    the order with their return flag), one row per n ∈ {2..7}:
    kappa = (P̄ − P̄e)/(1 − P̄e) with P̄ the mean per-unit pairwise
    agreement rate and P̄e the chance rate from the pooled margins;
    1 = perfect, 0 = chance, negative = systematic disagreement.
    Grouping BY panel size keeps Fleiss' fixed-n assumption exact
    (pooling uneven panels is Krippendorff's job — the sibling op).

    Exactness: the whole statistic is ONE exact integer rational (see
    the registration comment for the algebra); kappa_e6 is a single
    DECIMAL(38,0) division, no float anywhere.  Law pytests pin the
    poles: unanimous panels with ≥2 categories across units →
    exactly 1e6; one-of-each-category panels (n = k, equal margins) →
    exactly −1e6 div (n−1) (the textbook −1/(n−1) floor);
    single-category groups → NULL.

    Scale notes: one (unit, cat) agg over the fact table, a unit-sized
    panel filter join, then three ≤6-row rollups joined on panel size
    — the eval_krippendorff_alpha movement with the group-by-n split;
    output ≤ 6 rows."""
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("unit"), F.col("l_returnflag").alias("cat")
    )
    m = l.groupBy("unit").agg(F.count(F.lit(1)).alias("n"))
    inc = m.where((F.col("n") >= 2) & (F.col("n") <= 7))
    o = (
        l.join(inc, "unit")
        .groupBy("unit", "cat")
        .agg(F.count(F.lit(1)).alias("ouc"), F.max("n").alias("n"))
    )
    per_n = o.groupBy("n").agg(
        F.expr("CAST(COUNT(DISTINCT unit) AS DECIMAL(38,0))").alias("nu"),
        F.expr("CAST(SUM(ouc * ouc) AS DECIMAL(38,0))").alias("so2"),
    )
    s2 = (
        o.groupBy("n", "cat")
        .agg(F.expr("CAST(SUM(ouc) AS DECIMAL(38,0))").alias("n_c"))
        .groupBy("n")
        .agg(F.expr("CAST(SUM(n_c * n_c) AS DECIMAL(38,0))").alias("s2"))
    )
    return (
        per_n.join(s2, "n")
        .select(
            F.col("n").cast("long").alias("panel_n"),
            F.col("nu").cast("long").alias("n_units"),
            F.expr("CAST(nu * n AS BIGINT)").alias("n_ratings"),
            F.expr(
                "CAST(CASE WHEN (nu*n)*(nu*n) > s2 THEN"
                " ((so2 - nu*n) * (nu*n) * (nu*n)"
                "  - nu*n * (n - 1) * s2) * 1000000"
                " div (nu*n * (n - 1) * ((nu*n)*(nu*n) - s2))"
                " END AS BIGINT)"
            ).alias("kappa_e6"),
        )
        .orderBy("panel_n")
    )


@register(
    "eval_mcc",
    # Matthews correlation coefficient (Matthews 1975, public; the
    # balanced-classes-robust single-number confusion summary) over
    # the SAME decile threshold sweep as `eval_confusion_thresholds`
    # — precision/recall/F1 all ignore TN, so on skewed corpora a
    # degenerate always-positive classifier scores deceptively well;
    # MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN)) is the
    # ±1-bounded correlation of the binary contingency table.  The
    # numerator is exact integer; the denominator is the house ONE
    # shared float composition (a single √ of the double product of
    # the four integer margins, written identically on both engines —
    # IEEE sqrt is correctly rounded and the 4-factor product is
    # evaluated in the same literal order, so the doubles are
    # bit-identical), floored at e6.  Any zero margin ⇒ NULL (the
    # undefined-MCC convention).
    oracle=f"""
    WITH scored AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS score_cents,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events
    ), buckets AS (
        SELECT score_cents // {_SWEEP_BUCKET_CENTS} AS bucket,
               COUNT(*) AS n, SUM(pos) AS n_pos
        FROM scored GROUP BY 1
    ), cum AS (
        SELECT bucket, n, n_pos,
               SUM(n) OVER (ORDER BY bucket) AS cum_n,
               SUM(n_pos) OVER (ORDER BY bucket) AS cum_pos,
               SUM(n) OVER () AS total_n,
               SUM(n_pos) OVER () AS total_pos,
               (SUM(n) OVER (ORDER BY bucket) - 1) * 10
                   // SUM(n) OVER () AS decile
        FROM buckets
    ), openers AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY decile
                                     ORDER BY bucket) AS rn
        FROM cum
    ), conf AS (
        SELECT decile, bucket,
               total_pos - (cum_pos - n_pos) AS tp,
               (total_n - (cum_n - n)) - (total_pos - (cum_pos - n_pos))
                 AS fp,
               cum_pos - n_pos AS fn,
               (cum_n - n) - (cum_pos - n_pos) AS tn
        FROM openers WHERE rn = 1 AND decile >= 1
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(bucket * {_SWEEP_BUCKET_CENTS} AS BIGINT) AS threshold_cents,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CAST(CASE WHEN (tp+fp) > 0 AND (tp+fn) > 0
                      AND (tn+fp) > 0 AND (tn+fn) > 0 THEN
                  floor((tp*tn - fp*fn) * 1000000.0
                        / sqrt(CAST(tp+fp AS DOUBLE) * CAST(tp+fn AS DOUBLE)
                               * CAST(tn+fp AS DOUBLE)
                               * CAST(tn+fn AS DOUBLE)))
                END AS BIGINT) AS mcc_e6
    FROM conf ORDER BY decile
    """,
)
def eval_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient per decile threshold — the
    TN-aware single-number confusion summary `eval_confusion_thresholds`'
    precision/recall/F1 columns cannot provide: on a skewed corpus an
    always-positive classifier posts high recall and decent F1 while
    its MCC is ~0, which is why MCC is the reported headline for
    imbalanced screens (quality classifiers, contamination flags).

    Exactness: TP/FP/FN/TN ride the identical integer cdf sweep as the
    confusion op (same bucket rule, same decile openers); the MCC
    numerator TP·TN − FP·FN is exact; the denominator is ONE shared
    float composition (single √ over the double product of the four
    margins, literal order identical on both engines), floored at e6
    — the docs_bleu posture.  Any zero margin ⇒ NULL.  Law pytests
    pin the poles on planted confusion tables: perfect ⇒ exactly 1e6,
    inverted ⇒ exactly −1e6, independent ⇒ 0.

    Scale notes: identical movement to `eval_confusion_thresholds` —
    ONE corpus agg to the $1-bucket cdf (range-bounded rollup), all
    windows/decile math on that ≤~500-row frame; output ≤9 rows."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.round(F.col("value") * 100).cast("long").alias("score_cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    buckets = scored.groupBy(
        F.expr(f"score_cents div {_SWEEP_BUCKET_CENTS}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("n_pos"))
    w_cum = Window.orderBy("bucket")
    cum = buckets.select(
        "bucket",
        "n",
        "n_pos",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("n_pos").over(w_cum).alias("cum_pos"),
        F.sum("n").over(Window.partitionBy()).alias("total_n"),
        F.sum("n_pos").over(Window.partitionBy()).alias("total_pos"),
    ).withColumn("decile", F.expr("(cum_n - 1) * 10 div total_n"))
    conf = (
        cum.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("decile").orderBy("bucket")
            ),
        )
        .where((F.col("rn") == 1) & (F.col("decile") >= 1))
        .select(
            "decile",
            "bucket",
            F.expr("total_pos - (cum_pos - n_pos)").alias("tp"),
            F.expr(
                "(total_n - (cum_n - n)) - (total_pos - (cum_pos - n_pos))"
            ).alias("fp"),
            F.expr("cum_pos - n_pos").alias("fn"),
            F.expr("(cum_n - n) - (cum_pos - n_pos)").alias("tn"),
        )
    )
    return conf.select(
        F.col("decile").cast("long").alias("decile"),
        F.expr(f"CAST(bucket * {_SWEEP_BUCKET_CENTS} AS BIGINT)").alias(
            "threshold_cents"
        ),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.expr(
            "CAST(CASE WHEN (tp+fp) > 0 AND (tp+fn) > 0"
            " AND (tn+fp) > 0 AND (tn+fn) > 0 THEN"
            " floor((tp*tn - fp*fn) * 1000000.0"
            " / sqrt(CAST(tp+fp AS DOUBLE) * CAST(tp+fn AS DOUBLE)"
            " * CAST(tn+fp AS DOUBLE) * CAST(tn+fn AS DOUBLE)))"
            " END AS BIGINT)"
        ).alias("mcc_e6"),
    ).orderBy("decile")


@register(
    "eval_concordance_ccc",
    # Lin's concordance correlation coefficient (Lin 1989, public) —
    # the agreement measure for two CONTINUOUS measurements of the
    # same quantity: Pearson r rewards any linear relationship, CCC
    # penalizes location and scale shifts too (CCC = 1 only at
    # y = x), which is what ledger reconciliation / model-vs-model
    # score agreement actually needs.  Pairing: per order, x = the
    # header total o_totalprice, y = the lineitem-derived gross total
    # Σ l_extendedprice — the classic two-books reconciliation.
    # EXACT integer form in cents: with n pairs and S-sums,
    #   ccc = 2(n·Sxy − Sx·Sy)
    #         / ((n·Sxx − Sx²) + (n·Syy − Sy²) + (Sx − Sy)²)
    # (the population form of 2·cov/(varx+vary+(μx−μy)²) scaled by
    # n²) — ONE exact rational on DECIMAL(38,0)/HUGEINT (n·Sxx·1e6 ≈
    # 7e35 at sf10; headroom ~sf40 documented, the tightest budget in
    # the family and named here deliberately); e6 by single integer
    # division; zero denominator (both measures constant) ⇒ NULL.
    # The location-shift share (Sx−Sy)²·1e6 div den attributes HOW
    # the two books disagree (level vs dispersion vs correlation).
    oracle="""
    WITH pair AS (
      SELECT CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS x,
             CAST(l.line_total * 100 AS BIGINT) AS y
      FROM orders o
      JOIN (SELECT l_orderkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS line_total
            FROM lineitem GROUP BY l_orderkey) l
        ON l.l_orderkey = o.o_orderkey
    ), s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * y) AS HUGEINT) AS sxy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(y * y) AS HUGEINT) AS syy
      FROM pair
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(CASE WHEN (n*sxx - sx*sx) + (n*syy - sy*sy)
                          + (sx-sy)*(sx-sy) > 0 THEN
                  2 * (n*sxy - sx*sy) * 1000000
                  // ((n*sxx - sx*sx) + (n*syy - sy*sy)
                      + (sx-sy)*(sx-sy))
                END AS BIGINT) AS ccc_e6,
           CAST(CASE WHEN (n*sxx - sx*sx) + (n*syy - sy*sy)
                          + (sx-sy)*(sx-sy) > 0 THEN
                  (sx-sy)*(sx-sy) * 1000000
                  // ((n*sxx - sx*sx) + (n*syy - sy*sy)
                      + (sx-sy)*(sx-sy))
                END AS BIGINT) AS location_shift_e6
    FROM s
    """,
)
def eval_concordance_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lin's concordance correlation coefficient between the order
    header total and the lineitem-derived gross total — the two-books
    reconciliation number: Pearson r is blind to a constant markup or
    a level shift between the books; CCC = 1 demands y = x exactly,
    and the companion location_shift_e6 attributes the discordance
    share owed to the LEVEL difference (vs dispersion/correlation).

    Exactness: cents are exact BIGINTs from DECIMAL(12,2); the
    statistic is ONE exact integer rational (see the registration
    comment) on DECIMAL(38,0)/HUGEINT — no float anywhere.  The ~7e35
    sf10 product is the family's tightest DECIMAL(38,0) budget
    (headroom ~sf40, documented).  Law pytests pin y = x ⇒ exactly
    1e6 with shift 0; y = x + c (equal spreads) ⇒ the closed form
    2v/(2v+c²) through the integer chain; y = −x with equal means ⇒
    exactly −1e6.

    Scale notes: one map-combined lineitem rollup to order grain, one
    equi-join with orders, ONE 6-sum corpus reduce to a 1-row frame —
    the agg_corr_exact movement with the reconciliation pairing."""
    # prices land as doubles; the house money discipline casts to
    # DECIMAL(12,2) at scan so the sum is exact and order-independent
    # (the aggregate-determinism audit rejects a raw double SUM here)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).alias("x"),
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.expr("SUM(CAST(l_extendedprice AS DECIMAL(12,2)))").alias(
                "line_total"
            )
        )
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.expr("CAST(line_total * 100 AS BIGINT)").alias("y"),
        )
    )
    # the per-row product fits a long but Spark's SUM(long) accumulator
    # does not (~4.5e19 at sf0.01) — accumulate in DECIMAL(38,0)
    s = o.join(l, "o_orderkey").agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("sx"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("sy"),
        F.expr("SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))").alias("sxy"),
        F.expr("SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))").alias("sxx"),
        F.expr("SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))").alias("syy"),
    )
    den = (
        "(n*sxx - sx*sx) + (n*syy - sy*sy) + (sx-sy)*(sx-sy)"
    )
    return s.select(
        F.col("n").cast("long").alias("n_orders"),
        F.expr(
            f"CAST(CASE WHEN {den} > 0 THEN"
            f" 2 * (n*sxy - sx*sy) * 1000000 div ({den})"
            " END AS BIGINT)"
        ).alias("ccc_e6"),
        F.expr(
            f"CAST(CASE WHEN {den} > 0 THEN"
            f" (sx-sy)*(sx-sy) * 1000000 div ({den})"
            " END AS BIGINT)"
        ).alias("location_shift_e6"),
    )
