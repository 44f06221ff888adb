"""ML feature-engineering operators (r7 batch) — §2.20.

The feature-preparation stage of a training pipeline, as exact
relational queries: smoothed leave-one-out target encoding, binned
quantile assignment, per-group min-max / z-score normalization,
frequency-capped one-hot indexing, and a deterministic k-fold split
balance audit.  Engine-wide exactness discipline as in
``operators/statistics.py``: cents/ppm integers everywhere a value
crosses an aggregation boundary; products that leave BIGINT at large
scale go through DECIMAL(38,0) (DuckDB HUGEINT) per the
``revenue_bridge_yoy`` recipe; the only float operations are terminal,
written with identical association on both engines, and ROUND-absorbed.

Reference parity [K]: no citation into /root/reference possible (mirror
empty, SURVEY.md §0); the family reconstructs the feature-prep surface
a Spark-based training-data pipeline needs (SURVEY §2.10 mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..session import load_table

#: Target-encoding smoothing pseudo-count: the encoded value shrinks a
#: segment's leave-one-out mean toward the global mean with the weight
#: of ``_TE_SMOOTH`` virtual rows — the standard high-cardinality
#: regularizer (here the cardinality is small; the ARITHMETIC is what
#: the oracle proves).
_TE_SMOOTH = 20

#: $5,000 price buckets for quantile binning — same rationale as
#: ``inference._KS_BUCKET_CENTS``: the per-segment cdf rollup stays
#: ≤~100 rows at EVERY corpus size, so every ordered window below runs
#: on a bounded frame.
_BIN_CENTS = 500_000


@register(
    "feat_target_encode",
    # Smoothed leave-one-out target encoding of c_mktsegment against
    # order total cents: enc = (S_g - y + m*mu) / (n_g - 1 + m) with
    # mu = S/N, carried as the exact rational
    # ((S_g - y)*N + m*S) / ((n_g - 1 + m)*N) in DECIMAL(38,0)
    # (numerator ~ S_g*N crosses BIGINT at ~sf1) and resolved by ONE
    # float division, ROUND 4.
    oracle=f"""
    WITH fact AS (
        SELECT o.o_orderkey, c.c_mktsegment AS seg,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS y_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), g AS (
        SELECT seg, COUNT(*) AS n_g, SUM(y_cents) AS s_g FROM fact GROUP BY seg
    ), tot AS (
        SELECT seg, n_g, s_g,
               SUM(n_g) OVER () AS n_all, SUM(s_g) OVER () AS s_all
        FROM g
    )
    SELECT f.o_orderkey, f.seg, f.y_cents,
           ROUND(CAST((t.s_g - f.y_cents)::HUGEINT * t.n_all
                      + {_TE_SMOOTH}::HUGEINT * t.s_all AS DOUBLE)
                 / CAST((t.n_g - 1 + {_TE_SMOOTH})::HUGEINT * t.n_all
                        AS DOUBLE), 4) AS enc_cents
    FROM fact f JOIN tot t ON f.seg = t.seg
    """,
)
def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the customer market segment
    against order-total cents, with additive smoothing toward the
    global mean (pseudo-count 20): the leakage-safe categorical
    encoder a tabular-ML pipeline applies before training.

    Scale notes: the corpus-sized work is one fact-dim equi-join and
    ONE hash aggregate down to the segment rollup; the global totals
    are a window over that ≤|segments|-row frame, and the encode join
    back to the fact is a broadcast (the rollup is dim-sized at any
    corpus size).  The numerator cross-product (S_g − y)·N crosses
    BIGINT around sf1, so both engines carry it as
    DECIMAL(38,0)/HUGEINT and spend exactly ONE float division,
    ROUND 4 (quotient ~1e7 cents, double headroom ~1e9 at that
    magnitude — the round is far above last-ulp drift)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    fact = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y_cents"),
    )
    g = fact.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("y_cents").alias("s_g")
    )
    w_all = Window.partitionBy()
    tot = g.select(
        "seg",
        "n_g",
        "s_g",
        F.sum("n_g").over(w_all).alias("n_all"),
        F.sum("s_g").over(w_all).alias("s_all"),
    )
    return fact.join(F.broadcast(tot), "seg").select(
        "o_orderkey",
        "seg",
        "y_cents",
        F.round(
            F.expr(
                "CAST(CAST(s_g - y_cents AS DECIMAL(38,0)) * n_all "
                f"     + CAST({_TE_SMOOTH} AS DECIMAL(38,0)) * s_all AS DOUBLE)"
            )
            / F.expr(
                f"CAST(CAST(n_g - 1 + {_TE_SMOOTH} AS DECIMAL(38,0)) * n_all "
                "      AS DOUBLE)"
            ),
            4,
        ).alias("enc_cents"),
    )


@register(
    "feat_quantile_bins",
    # Binned decile assignment per market segment: bucket the order
    # totals to $5k cells, cumulative-count the ≤100-row per-segment
    # bucket rollup, and label each bucket with the decile of its LAST
    # member row — floor((cum-1)*10 / n) in pure integer division.
    oracle=f"""
    WITH fact AS (
        SELECT c.c_mktsegment AS seg,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) // {_BIN_CENTS}
                   AS bucket
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), b AS (
        SELECT seg, bucket, COUNT(*) AS cnt FROM fact GROUP BY seg, bucket
    ), cum AS (
        SELECT seg, bucket, cnt,
               SUM(cnt) OVER (PARTITION BY seg ORDER BY bucket) AS cum_cnt,
               SUM(cnt) OVER (PARTITION BY seg) AS n_seg
        FROM b
    )
    SELECT seg, CAST(bucket AS BIGINT) AS bucket, CAST(cnt AS BIGINT) AS cnt,
           CAST(cum_cnt AS BIGINT) AS cum_cnt,
           CAST((cum_cnt - 1) * 10 // n_seg AS BIGINT) AS decile
    FROM cum
    """,
)
def feat_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile binning of order totals per market segment via the
    binned-cdf recipe: $5k integer buckets, per-segment cumulative
    counts, and the decile label of each bucket's last row —
    ``(cum−1)·10 div n``.  The bucket→decile table IS the feature
    (rows join to it by bucket arithmetic at apply time), so bin
    assignment never sorts raw rows.

    Scale notes: binning is the scale design (shared with
    ``agg_ks_test``): one corpus pass into a hash aggregate bounded by
    |segments|×~100 buckets; every ordered window runs on that rollup.
    An exact-quantile variant would need a per-segment global sort of
    the fact — the two-pass range-rank machinery (`table_skew_stats`)
    exists for that; binned deciles are what a feature pipeline
    actually ships (bin edges must be STABLE across training and
    serving, which exact sample quantiles are not)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    fact = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.expr(f"CAST(ROUND(o_totalprice * 100) AS BIGINT) div {_BIN_CENTS}").alias(
            "bucket"
        ),
    )
    b = fact.groupBy("seg", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.partitionBy("seg").orderBy("bucket")
    return b.select(
        "seg",
        F.col("bucket").cast("long").alias("bucket"),
        F.col("cnt").cast("long").alias("cnt"),
        F.sum("cnt").over(w_cum).cast("long").alias("cum_cnt"),
    ).withColumn(
        "decile",
        F.expr(
            "CAST((cum_cnt - 1) * 10 div SUM(cnt) OVER (PARTITION BY seg) AS BIGINT)"
        ),
    )


@register(
    "feat_minmax_zscore",
    # Per-brand min-max (ppm) and z-score normalization of part retail
    # price cents from ONE sufficient-statistics aggregate
    # (n, min, max, Σx, Σx²); the z denominator n·(nΣx² − (Σx)²)
    # crosses BIGINT for large groups, so both engines carry it wide
    # and spend sqrt/division float ops on identical integers, ROUND 6.
    oracle="""
    WITH x AS (
        SELECT p_partkey, p_brand,
               CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
        FROM part
    ), g AS (
        SELECT p_brand, COUNT(*) AS n, MIN(cents) AS mn, MAX(cents) AS mx,
               SUM(cents) AS sx, SUM(cents * cents) AS sxx
        FROM x GROUP BY p_brand
    )
    SELECT x.p_partkey, x.p_brand, x.cents,
           CASE WHEN g.mx > g.mn
                THEN CAST((x.cents - g.mn) * 1000000 // (g.mx - g.mn) AS BIGINT)
           END AS minmax_ppm,
           CASE WHEN g.n > 1 AND g.n::HUGEINT * g.sxx > g.sx::HUGEINT * g.sx
                THEN ROUND(CAST(g.n * x.cents - g.sx AS DOUBLE)
                           * sqrt(CAST(g.n - 1 AS DOUBLE))
                           / sqrt(CAST(g.n::HUGEINT
                                       * (g.n::HUGEINT * g.sxx
                                          - g.sx::HUGEINT * g.sx) AS DOUBLE)), 6)
           END AS zscore
    FROM x JOIN g ON x.p_brand = g.p_brand
    """,
)
def feat_minmax_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand min-max (ppm integer) and z-score normalization of
    part retail price — the two numeric feature scalers, computed from
    one sufficient-statistics pass.

    Scale notes: ONE hash aggregate emits (n, min, max, Σx, Σx²) per
    brand; the normalize join back is a broadcast of that dim-sized
    rollup, so the corpus is scanned twice and shuffled never (the
    group stats travel, the rows do not).  z = (n·x − Σx)·√(n−1) /
    √(n·(nΣx² − (Σx)²)) keeps every aggregation-boundary value integer;
    nΣx² crosses BIGINT for ~100k-row groups (cents² ~1e10 each), so
    the variance term is DECIMAL(38,0)/HUGEINT on both engines and the
    terminal float ops are written with identical association, ROUND 6.
    Degenerate guards: constant groups emit NULL for both features
    (mx=mn, var=0) rather than a divide-by-zero."""
    p = load_table(spark, sf_dir, "part")
    x = p.select(
        "p_partkey",
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    )
    g = x.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
        F.sum("cents").alias("sx"),
        F.sum(F.expr("cents * cents")).alias("sxx"),
    )
    return x.join(F.broadcast(g), "p_brand").select(
        "p_partkey",
        "p_brand",
        "cents",
        F.when(
            F.col("mx") > F.col("mn"),
            F.expr("CAST((cents - mn) * 1000000 div (mx - mn) AS BIGINT)"),
        ).alias("minmax_ppm"),
        F.when(
            F.expr(
                "n > 1 AND CAST(n AS DECIMAL(38,0)) * sxx "
                "> CAST(sx AS DECIMAL(38,0)) * sx"
            ),
            F.round(
                F.expr("CAST(n * cents - sx AS DOUBLE)")
                * F.sqrt(F.expr("CAST(n - 1 AS DOUBLE)"))
                / F.sqrt(
                    F.expr(
                        "CAST(CAST(n AS DECIMAL(38,0)) "
                        "     * (CAST(n AS DECIMAL(38,0)) * sxx "
                        "        - CAST(sx AS DECIMAL(38,0)) * sx) AS DOUBLE)"
                    )
                ),
                6,
            ),
        ).alias("zscore"),
    )


@register(
    "feat_onehot_topk",
    # Frequency-capped one-hot: rank p_type by (count DESC, type ASC)
    # on the ≤|types|-row rollup, keep the top 5 as indices 1..5,
    # everything else folds to OTHER (index 0); emit the index plus the
    # six indicator columns.
    oracle="""
    WITH freq AS (
        SELECT p_type, COUNT(*) AS cnt FROM part GROUP BY p_type
    ), ranked AS (
        SELECT p_type, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, p_type) AS rk
        FROM freq
    )
    SELECT p.p_partkey, p.p_type,
           CAST(CASE WHEN r.rk <= 5 THEN r.rk ELSE 0 END AS BIGINT) AS oh_index,
           CAST(CASE WHEN r.rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS oh_1,
           CAST(CASE WHEN r.rk = 2 THEN 1 ELSE 0 END AS BIGINT) AS oh_2,
           CAST(CASE WHEN r.rk = 3 THEN 1 ELSE 0 END AS BIGINT) AS oh_3,
           CAST(CASE WHEN r.rk = 4 THEN 1 ELSE 0 END AS BIGINT) AS oh_4,
           CAST(CASE WHEN r.rk = 5 THEN 1 ELSE 0 END AS BIGINT) AS oh_5,
           CAST(CASE WHEN r.rk > 5 THEN 1 ELSE 0 END AS BIGINT) AS oh_other
    FROM part p JOIN ranked r ON p.p_type = r.p_type
    """,
)
def feat_onehot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k one-hot encoding of the part type: the 5 most frequent
    categories get stable indices 1..5 (count-desc, name-asc tiebreak
    — deterministic across refreshes), the tail folds into OTHER.
    Capping the vocabulary is what makes one-hot survive
    high-cardinality columns at scale.

    Scale notes: the vocabulary rank is a window over the
    group-by-type ROLLUP (|distinct types| rows — the fixture has 6;
    a web-scale categorical has maybe 1e6, still dim-sized), never
    over the fact; the encode join back is a broadcast of that ranked
    vocabulary.  One corpus-sized hash aggregate + one broadcast join
    total."""
    p = load_table(spark, sf_dir, "part")
    freq = p.groupBy("p_type").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = freq.select(
        "p_type",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("p_type")))
        .alias("rk"),
    )
    out = p.join(F.broadcast(ranked), "p_type").select(
        "p_partkey",
        "p_type",
        F.when(F.col("rk") <= 5, F.col("rk")).otherwise(0).cast("long").alias("oh_index"),
        *[
            (F.col("rk") == i).cast("long").alias(f"oh_{i}")
            for i in range(1, 6)
        ],
        (F.col("rk") > 5).cast("long").alias("oh_other"),
    )
    return out


@register(
    "split_kfold_balance",
    # Deterministic 5-fold split by md5(custkey) (engine-portable, the
    # split_hash idiom) with the balance audit an ML pipeline runs
    # before trusting a fold assignment: per (fold, segment) order and
    # customer counts, revenue, and the fold's ppm share of its
    # segment.
    oracle="""
    WITH f AS (
        SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment AS seg,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
               CAST(('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR)), 1, 15))
                    AS BIGINT) % 5 AS fold
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), g AS (
        SELECT fold, seg,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_customers,
               SUM(cents) AS rev_cents
        FROM f GROUP BY fold, seg
    )
    SELECT CAST(fold AS BIGINT) AS fold, seg,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(n_orders * 1000000 // SUM(n_orders) OVER (PARTITION BY seg)
                AS BIGINT) AS share_ppm
    FROM g
    """,
)
def split_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation assignment by hashed customer key —
    GROUPED by customer so no customer's orders straddle folds (the
    leakage rule) — summarized as the per-(fold, segment) balance
    audit: counts, revenue, and each fold's ppm share of its segment.

    Scale notes: fold membership is pure scan-side arithmetic
    (md5 → BIGINT → mod; the `split_hash` portability idiom — xxhash64
    would be faster but is not oracle-reproducible), so the split
    never shuffles by itself; the audit is one fact-dim join + ONE
    hash aggregate to a |folds|×|segments| rollup, with the share
    window on that rollup.  COUNT(DISTINCT customer) rewrites to a
    two-level aggregate (expand + partial) in Spark — bounded by the
    rollup width, not the corpus."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    f = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        "o_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (
            F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10)
            .cast("long")
            % 5
        ).alias("fold"),
    )
    g = f.groupBy("fold", "seg").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum("cents").alias("rev_cents"),
    )
    return g.select(
        F.col("fold").cast("long").alias("fold"),
        "seg",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("rev_cents").cast("long").alias("rev_cents"),
        F.expr(
            "CAST(n_orders * 1000000 div SUM(n_orders) OVER (PARTITION BY seg) "
            "AS BIGINT)"
        ).alias("share_ppm"),
    )


@register(
    "feat_woe_iv",
    # Weight-of-evidence / information-value table: bins are
    # (segment, priority) via the broadcast customer dim; event =
    # order status 'F'.  Laplace +1 per bin (totals +|bins|) keeps the
    # log finite; WoE is ONE rounded ln over exact integer products
    # (milli-nats), IV contributions are ppm-share-diff x WoE integer
    # products summed over the 25-row rollup.
    oracle="""
    WITH labeled AS (
        SELECT c.c_mktsegment, o.o_orderpriority,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), bins AS (
        SELECT c_mktsegment, o_orderpriority,
               COUNT(*) AS n, SUM(bad) AS bad_n,
               COUNT(*) - SUM(bad) AS good_n
        FROM labeled GROUP BY 1, 2
    ), tot AS (
        SELECT *, SUM(good_n) OVER () AS good_tot,
               SUM(bad_n) OVER () AS bad_tot,
               COUNT(*) OVER () AS nb
        FROM bins
    ), woe AS (
        SELECT *,
               CAST(ROUND(1000.0 * ln(
                   (CAST(good_n + 1 AS DOUBLE) * (bad_tot + nb))
                   / (CAST(bad_n + 1 AS DOUBLE) * (good_tot + nb))
               )) AS BIGINT) AS woe_mnats,
               (good_n + 1) * 1000000 // (good_tot + nb)
                   - (bad_n + 1) * 1000000 // (bad_tot + nb) AS share_diff_ppm
        FROM tot
    )
    SELECT c_mktsegment, o_orderpriority,
           CAST(n AS BIGINT) AS n,
           CAST(bad_n AS BIGINT) AS bad_n,
           CAST(good_n AS BIGINT) AS good_n,
           woe_mnats,
           CAST(share_diff_ppm * woe_mnats AS BIGINT) AS iv_contrib,
           CAST(SUM(share_diff_ppm * woe_mnats) OVER () AS BIGINT) AS iv_total
    FROM woe
    """,
)
def feat_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding + information value: per
    (segment, priority) bin, the WoE of the order-status-'F' event in
    integer milli-nats and the bin's IV contribution — the classic
    credit-scoring feature transform and its predictive-power summary.
    Laplace smoothing (+1 per bin, +|bins| on each total) keeps the
    log finite when a bin has no goods or no bads at small scale.

    Exactness: counts stay integers through every aggregation; WoE is
    the ONE rounded float expression per bin — an ``ln`` over exact
    integer cross-products written with identical association on both
    engines (the `events_user_day_entropy` milli-nat recipe); IV
    contributions multiply two integers (ppm share diff x milli-nat
    WoE) so the total is an exact integer sum.  The integer products
    inside the log leave the double-exact 2^53 range only past ~1e8
    rows per cell (documented cliff, far beyond sf10).

    Scale notes: fact-dim broadcast join, ONE hash aggregate to the
    |segments|x|priorities| (25-row) rollup; totals and the IV sum are
    windows over that rollup.  The driver proves the arithmetic; the
    fixture's near-uniform bins make WoE small but non-constant
    (audited non-vacuous: milli-nat spread across bins)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    labeled = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(
        "c_mktsegment",
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
    )
    bins = labeled.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bad").alias("bad_n"),
        (F.count(F.lit(1)) - F.sum("bad")).alias("good_n"),
    )
    w_all = Window.partitionBy()
    tot = bins.select(
        "*",
        F.sum("good_n").over(w_all).alias("good_tot"),
        F.sum("bad_n").over(w_all).alias("bad_tot"),
        F.count(F.lit(1)).over(w_all).alias("nb"),
    )
    woe = tot.select(
        "*",
        F.expr(
            "CAST(ROUND(1000.0 * ln("
            "(CAST(good_n + 1 AS DOUBLE) * (bad_tot + nb))"
            " / (CAST(bad_n + 1 AS DOUBLE) * (good_tot + nb))"
            ")) AS BIGINT)"
        ).alias("woe_mnats"),
        F.expr(
            "(good_n + 1) * 1000000 div (good_tot + nb)"
            " - (bad_n + 1) * 1000000 div (bad_tot + nb)"
        ).alias("share_diff_ppm"),
    )
    return woe.select(
        "c_mktsegment",
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        F.col("bad_n").cast("long").alias("bad_n"),
        F.col("good_n").cast("long").alias("good_n"),
        "woe_mnats",
        (F.col("share_diff_ppm") * F.col("woe_mnats"))
        .cast("long")
        .alias("iv_contrib"),
        F.sum(F.col("share_diff_ppm") * F.col("woe_mnats"))
        .over(w_all)
        .cast("long")
        .alias("iv_total"),
    )


#: Hashing-trick bucket widths audited by `feat_hashing_collisions` —
#: the dimensionality sweep a feature-hashing rollout runs before
#: freezing B.  The feature space is word BIGRAMS (vocab² ≈ 1k distinct
#: on the fixture's ~31-word vocab) so every width shows a different
#: collision regime (B=64 saturated, B=1024 sparse).
_FH_WIDTHS = (64, 256, 1024)


@register(
    "feat_hashing_collisions",
    # Bucket id = first 8 hex chars of md5(bigram) as an integer, mod B
    # — md5 is bit-identical on both engines (verified: Spark
    # conv(substr(md5,1,8),16,10) == DuckDB CAST('0x'||substr(md5,1,8)
    # AS BIGINT)), unlike xxhash64 which is Spark-only.
    oracle=f"""
    WITH toks AS (
      SELECT string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
      FROM documents
    ), grams AS (
      SELECT DISTINCT unnest(list_transform(range(1, n),
                             i -> t[i] || ' ' || t[i + 1])) AS g
      FROM toks WHERE n >= 2
    ), hashed AS (
      SELECT g, CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) AS h
      FROM grams
    ), widths AS (
      SELECT unnest([{", ".join(str(b) for b in _FH_WIDTHS)}]) AS b
    ), loads AS (
      SELECT w.b, h.h % w.b AS bucket, COUNT(*) AS load
      FROM hashed h CROSS JOIN widths w
      GROUP BY 1, 2
    )
    SELECT CAST(b AS BIGINT) AS n_buckets,
           CAST(SUM(load) AS BIGINT) AS n_features,
           CAST(COUNT(*) AS BIGINT) AS n_occupied,
           CAST(MAX(load) AS BIGINT) AS max_load,
           CAST(SUM(CASE WHEN load >= 2 THEN load ELSE 0 END) AS BIGINT)
             AS n_collided,
           CAST(SUM(CASE WHEN load >= 2 THEN load ELSE 0 END) * 1000000
                // SUM(load) AS BIGINT) AS collided_ppm
    FROM loads
    GROUP BY b
    ORDER BY n_buckets
    """,
)
def feat_hashing_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick collision audit — the dimensionality sweep run
    before freezing a hashed feature space (Weinberger et al. 2009,
    public): hash every distinct word-bigram feature into B buckets for
    B ∈ {64, 256, 1024} and report, per width, the occupied-bucket
    count, the heaviest bucket, and the share of features that share a
    bucket with another feature (the information actually destroyed by
    the trick).  The curve tells you the smallest B whose collision
    mass is acceptable.

    Scale notes: ONE text pass builds the distinct-feature frame
    (bigram generation is a scan-side transform(sequence); distinct is
    one shuffle on the feature key, vocabulary-sized output); the
    width sweep is a broadcast |widths|-row literal dim crossed onto
    that VOCAB-SIZED frame (never corpus-sized), and the per-(B,
    bucket) load rollup is bounded by Σ B.  The md5-derived bucket id
    is engine-portable AND seed-stable across runs — what a feature
    store needs for online/offline consistency."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    toks = d.select(t.alias("t"), F.size(t).alias("n"))
    grams = (
        toks.where(F.col("n") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("t", i), F.element_at("t", i + 1)
                    ),
                )
            ).alias("g")
        )
        .distinct()
    )
    hashed = grams.select(
        F.conv(F.substring(F.md5("g"), 1, 8), 16, 10)
        .cast("long")
        .alias("h")
    )
    widths = spark.createDataFrame([(b,) for b in _FH_WIDTHS], "b long")
    loads = (
        hashed.crossJoin(F.broadcast(widths))
        .groupBy("b", (F.col("h") % F.col("b")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("load"))
    )
    return (
        loads.groupBy("b")
        .agg(
            F.sum("load").alias("n_features_raw"),
            F.count(F.lit(1)).cast("long").alias("n_occupied"),
            F.max("load").cast("long").alias("max_load"),
            F.sum(F.when(F.col("load") >= 2, F.col("load")).otherwise(0)).alias(
                "n_collided_raw"
            ),
        )
        .select(
            F.col("b").cast("long").alias("n_buckets"),
            F.col("n_features_raw").cast("long").alias("n_features"),
            "n_occupied",
            "max_load",
            F.col("n_collided_raw").cast("long").alias("n_collided"),
            F.expr("n_collided_raw * 1000000 div n_features_raw")
            .cast("long")
            .alias("collided_ppm"),
        )
        .orderBy("n_buckets")
    )


@register(
    "feat_split_gain",
    # Decision-stump feature ranking by Gini gain (CART, Breiman 1984,
    # public): for each candidate feature, the best single binary split
    # against the is-return label — the screening pass tree/GBM
    # pipelines run before training, and the classic 'which features
    # matter at all' report.  Every candidate feature has a BOUNDED
    # ordered bucket domain (11 discounts, 50 quantities, 12 ship
    # months, 9 tax levels), so the whole computation lives on a ≤82-
    # cell rollup: parent Gini and every split's weighted impurity are
    # deterministic double compositions of exact integer counts,
    # ROUND(6); the per-feature argmax orders by those identical
    # doubles with the smallest-threshold tie-break.
    oracle="""
    WITH base AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
             CAST(ROUND(l_quantity) AS BIGINT) AS quantity,
             CAST(month(l_shipdate) AS BIGINT) AS ship_month,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_pct
      FROM lineitem
    ), cells AS (
      SELECT 'disc_pct' AS feature, disc_pct AS v,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS r
      FROM base GROUP BY 2
      UNION ALL
      SELECT 'quantity', quantity, COUNT(*), SUM(y) FROM base GROUP BY 2
      UNION ALL
      SELECT 'ship_month', ship_month, COUNT(*), SUM(y)
      FROM base GROUP BY 2
      UNION ALL
      SELECT 'tax_pct', tax_pct, COUNT(*), SUM(y) FROM base GROUP BY 2
    ), cum AS (
      SELECT feature, v,
             SUM(n) OVER w AS n_l, SUM(r) OVER w AS r_l,
             SUM(n) OVER (PARTITION BY feature) AS n_tot,
             SUM(r) OVER (PARTITION BY feature) AS r_tot,
             ROW_NUMBER() OVER (PARTITION BY feature ORDER BY v DESC)
               AS from_top
      FROM cells
      WINDOW w AS (PARTITION BY feature ORDER BY v)
    ), gains AS (
      SELECT feature, v AS threshold, n_l, n_tot - n_l AS n_r,
             2.0 * r_tot * (n_tot - r_tot)
               / (CAST(n_tot AS DOUBLE) * n_tot) AS parent_gini,
             2.0 * r_tot * (n_tot - r_tot)
               / (CAST(n_tot AS DOUBLE) * n_tot)
             - 2.0 / n_tot
               * (CAST(r_l AS DOUBLE) * (n_l - r_l) / n_l
                  + CAST(r_tot - r_l AS DOUBLE)
                    * ((n_tot - n_l) - (r_tot - r_l)) / (n_tot - n_l))
               AS gain
      FROM cum WHERE from_top > 1
    ), best AS (
      SELECT feature, threshold, n_l, n_r, parent_gini, gain,
             ROW_NUMBER() OVER (PARTITION BY feature
                                ORDER BY gain DESC, threshold) AS rk
      FROM gains
    )
    SELECT feature, CAST(threshold AS BIGINT) AS best_threshold,
           CAST(n_l AS BIGINT) AS n_left, CAST(n_r AS BIGINT) AS n_right,
           ROUND(parent_gini, 6) AS parent_gini,
           ROUND(gain, 6) AS gini_gain
    FROM best WHERE rk = 1
    ORDER BY feature
    """,
)
def feat_split_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump Gini gain per candidate feature against the
    is-return label — 'if you could split on one feature once, which
    one, where, and how much would it buy?'  The screening report that
    precedes any tree/GBM training run and the honest notion of
    single-feature importance (contrast `feat_woe_iv`'s per-bucket
    evidence weights: this one commits to a SPLIT).  The fixture's
    return flag is independent of every candidate (gains ≈ 0 — an
    honest 'nothing predicts returns'); the planted pytest makes one
    feature perfectly separating and pins gain == parent Gini exactly,
    with an uninformative decoy at ≈ 0.

    Exactness: all counts live on the bounded ≤82-cell (feature,
    bucket) rollup — exact integers at any corpus size; parent Gini
    2r(n−r)/n² and each split's weighted impurity are deterministic
    double compositions of those integers (identical on both
    engines), ROUND(6); the per-feature argmax orders by the
    identical doubles with a smallest-threshold tie-break.

    Scale notes: ONE corpus scan fans into four bounded hash rollups
    (union of ≤82 cells); cumulative/argmax windows are PARTITIONED
    BY feature on that frame.  Nothing downstream of the first agg
    scales with the corpus."""
    l = load_table(spark, sf_dir, "lineitem")
    base = l.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        F.expr("CAST(ROUND(l_discount * 100) AS BIGINT)").alias("disc_pct"),
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("quantity"),
        F.month("l_shipdate").cast("long").alias("ship_month"),
        F.expr("CAST(ROUND(l_tax * 100) AS BIGINT)").alias("tax_pct"),
    )
    cells = None
    for feat in ("disc_pct", "quantity", "ship_month", "tax_pct"):
        c = base.groupBy(F.col(feat).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("r"),
        ).select(F.lit(feat).alias("feature"), "v", "n", "r")
        cells = c if cells is None else cells.unionAll(c)
    w_cum = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_feat = Window.partitionBy("feature")
    w_top = Window.partitionBy("feature").orderBy(F.col("v").desc())
    cum = cells.select(
        "feature",
        "v",
        F.sum("n").over(w_cum).alias("n_l"),
        F.sum("r").over(w_cum).alias("r_l"),
        F.sum("n").over(w_feat).alias("n_tot"),
        F.sum("r").over(w_feat).alias("r_tot"),
        F.row_number().over(w_top).alias("from_top"),
    )
    parent = (
        2.0
        * F.col("r_tot")
        * (F.col("n_tot") - F.col("r_tot"))
        / (F.col("n_tot").cast("double") * F.col("n_tot"))
    )
    gain = parent - 2.0 / F.col("n_tot") * (
        F.col("r_l").cast("double")
        * (F.col("n_l") - F.col("r_l"))
        / F.col("n_l")
        + (F.col("r_tot") - F.col("r_l")).cast("double")
        * (
            (F.col("n_tot") - F.col("n_l"))
            - (F.col("r_tot") - F.col("r_l"))
        )
        / (F.col("n_tot") - F.col("n_l"))
    )
    gains = cum.where(F.col("from_top") > 1).select(
        "feature",
        F.col("v").alias("threshold"),
        "n_l",
        (F.col("n_tot") - F.col("n_l")).alias("n_r"),
        parent.alias("parent_gini"),
        gain.alias("gain"),
    )
    w_best = Window.partitionBy("feature").orderBy(
        F.col("gain").desc(), F.col("threshold")
    )
    return (
        gains.withColumn("rk", F.row_number().over(w_best))
        .where(F.col("rk") == 1)
        .select(
            "feature",
            F.col("threshold").cast("long").alias("best_threshold"),
            F.col("n_l").cast("long").alias("n_left"),
            F.col("n_r").cast("long").alias("n_right"),
            F.round(F.col("parent_gini"), 6).alias("parent_gini"),
            F.round(F.col("gain"), 6).alias("gini_gain"),
        )
        .orderBy("feature")
    )
