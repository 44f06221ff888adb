"""Distribution-inference analytics (r7 batch) — §2.19.

Two-sample testing (Kolmogorov–Smirnov, Mann–Whitney U), a one-pass
covariance matrix, revenue concentration (Gini / Lorenz deciles), and two
distribution-drift detectors (Benford first-digit deviation, day-over-day
Jensen–Shannon divergence).  Engine-wide exactness discipline as in
``operators/statistics.py``: every decision value is integer arithmetic
or ONE IEEE operation over identical integers, never an order-dependent
float accumulation — the only float sums are over bounded small
cardinalities (≤10 terms) with ROUND absorbing last-ulp libm drift.

Reference parity [K]: no citation into /root/reference possible (mirror
empty, SURVEY.md §0); these extend the engine's exact-statistics family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..common import epoch_seconds
from ..plans.registry import register
from ..session import load_table

#: $5,000 price buckets: o_totalprice spans ~$1k–$500k, so the pooled
#: cdf rollup is ≤100 rows at EVERY scale — the ordered cumulative
#: window below never sees more than the bucket count.
_KS_BUCKET_CENTS = 500_000

_SEG_A = "BUILDING"
_SEG_B = "MACHINERY"


@register(
    "agg_ks_test",
    # Binned two-sample KS: D = max |cdf_A - cdf_B| over $5k price
    # buckets, carried as the exact integer |cumA*nB - cumB*nA| with
    # denominator nA*nB.  ONE float division of identical integers at
    # the end; ROUND 6.
    oracle=f"""
    WITH s AS (
        SELECT CAST(ROUND(o.o_totalprice * 100) AS BIGINT) // {_KS_BUCKET_CENTS}
                   AS bucket,
               c.c_mktsegment AS seg
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
    ), b AS (
        SELECT bucket,
               COUNT(*) FILTER (seg = '{_SEG_A}') AS c_a,
               COUNT(*) FILTER (seg = '{_SEG_B}') AS c_b
        FROM s GROUP BY bucket
    ), cum AS (
        SELECT bucket, c_a, c_b,
               SUM(c_a) OVER (ORDER BY bucket) AS cum_a,
               SUM(c_b) OVER (ORDER BY bucket) AS cum_b,
               SUM(c_a) OVER () AS n_a,
               SUM(c_b) OVER () AS n_b
        FROM b
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(c_a AS BIGINT) AS c_a,
           CAST(c_b AS BIGINT) AS c_b,
           CAST(cum_a AS BIGINT) AS cum_a,
           CAST(cum_b AS BIGINT) AS cum_b,
           CAST(abs(cum_a * n_b - cum_b * n_a) AS BIGINT) AS dev_num,
           ROUND(CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) OVER () AS DOUBLE)
                 / CAST(n_a * n_b AS DOUBLE), 6) AS ks_stat
    FROM cum
    """,
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the order-total
    distributions of BUILDING vs MACHINERY customers, over $5k price
    buckets: per-bucket counts, cumulative counts, and the exact
    integer deviation |cumA*nB − cumB*nA| whose max over buckets is D
    (denominator nA*nB applied in ONE final float division).

    Scale notes: the corpus-sized work is one fact-dim join and ONE
    hash aggregate down to ≤100 price buckets; every window (cumsum,
    totals, max) runs on that bucket rollup — an allowlisted
    single-partition exchange of ≤100 rows.  Binning is the scale
    design: an exact per-distinct-value KS would order the full value
    domain; $5k cents buckets keep the ordered state bounded at any
    corpus size while the decision statistic stays exactly integral."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = (
        o.join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment").isin(_SEG_A, _SEG_B))
        .select(
            F.expr(
                f"CAST(ROUND(o_totalprice * 100) AS BIGINT) div {_KS_BUCKET_CENTS}"
            ).alias("bucket"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    b = s.groupBy("bucket").agg(
        F.count(F.when(F.col("seg") == _SEG_A, 1)).alias("c_a"),
        F.count(F.when(F.col("seg") == _SEG_B, 1)).alias("c_b"),
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = b.select(
        "bucket",
        "c_a",
        "c_b",
        F.sum("c_a").over(w_cum).alias("cum_a"),
        F.sum("c_b").over(w_cum).alias("cum_b"),
        F.sum("c_a").over(w_all).alias("n_a"),
        F.sum("c_b").over(w_all).alias("n_b"),
    )
    dev = F.abs(
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    )
    return cum.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("c_a").cast("long").alias("c_a"),
        F.col("c_b").cast("long").alias("c_b"),
        F.col("cum_a").cast("long").alias("cum_a"),
        F.col("cum_b").cast("long").alias("cum_b"),
        dev.cast("long").alias("dev_num"),
        F.round(
            F.max(dev).over(w_all).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
            6,
        ).alias("ks_stat"),
    )


@register(
    "agg_mannwhitney_u",
    # Rank-sum over the same $5k buckets with midranks carried as
    # 2*midrank (integer): 2*mid = 2*prev_cum_total + c_tot + 1, so
    # 2*R_A = Σ c_a*(2*prev + c_tot + 1) is an exact BIGINT; U from the
    # rank-sum identity, tie correction Σ(t³−t) exact.  z and AUC are
    # single float expressions over those integers, ROUND 4/6.
    oracle=f"""
    WITH s AS (
        SELECT CAST(ROUND(o.o_totalprice * 100) AS BIGINT) // {_KS_BUCKET_CENTS}
                   AS bucket,
               c.c_mktsegment AS seg
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
    ), b AS (
        SELECT bucket,
               COUNT(*) FILTER (seg = '{_SEG_A}') AS c_a,
               COUNT(*) AS c_tot
        FROM s GROUP BY bucket
    ), r AS (
        SELECT c_a, c_tot,
               SUM(c_tot) OVER (ORDER BY bucket)
                   - c_tot AS prev_cum
        FROM b
    ), agg AS (
        SELECT SUM(c_a) AS n_a,
               SUM(c_tot) - SUM(c_a) AS n_b,
               SUM(c_tot) AS n,
               SUM(c_a * (2 * prev_cum + c_tot + 1)) AS two_r_a,
               SUM(c_tot * c_tot * c_tot - c_tot) AS tie_cubes
        FROM r
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(2 * n_a * n_b + n_a * (n_a + 1) - two_r_a AS BIGINT) AS two_u_a,
           ROUND(CAST(2 * n_a * n_b + n_a * (n_a + 1) - two_r_a AS DOUBLE)
                 / CAST(2 * n_a * n_b AS DOUBLE), 6) AS auc_a,
           CAST(tie_cubes AS BIGINT) AS tie_cubes,
           ROUND(
             (CAST(2 * n_a * n_b + n_a * (n_a + 1) - two_r_a AS DOUBLE)
              - CAST(n_a * n_b AS DOUBLE))
             / (2.0 * sqrt(
                 CAST(n_a * n_b AS DOUBLE) / 12.0
                 * (CAST(n + 1 AS DOUBLE)
                    - CAST(tie_cubes AS DOUBLE)
                      / CAST(n * (n - 1) AS DOUBLE)))), 4) AS z_score
    FROM agg
    """,
)
def agg_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between BUILDING and
    MACHINERY order totals over the same $5k buckets as ``agg_ks_test``
    (bucket = tie group): midranks carried as the INTEGER 2·midrank,
    U from the rank-sum identity, the Σ(t³−t) tie correction exact,
    and the normal-approximation z plus AUC (= U/(nA·nB), the
    common-language effect size) as single float expressions.

    Scale notes: identical shuffle posture to agg_ks_test — one join,
    one hash agg to ≤100 buckets, ordered windows on the bucket rollup
    only.  The rank-sum identity is why no global sort of the raw rows
    ever happens: ranks of a binned distribution depend only on the
    bucket rollup's cumulative totals."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = (
        o.join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment").isin(_SEG_A, _SEG_B))
        .select(
            F.expr(
                f"CAST(ROUND(o_totalprice * 100) AS BIGINT) div {_KS_BUCKET_CENTS}"
            ).alias("bucket"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    b = s.groupBy("bucket").agg(
        F.count(F.when(F.col("seg") == _SEG_A, 1)).alias("c_a"),
        F.count("*").alias("c_tot"),
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    r = b.select(
        "c_a",
        "c_tot",
        (F.sum("c_tot").over(w_cum) - F.col("c_tot")).alias("prev_cum"),
    )
    agg = r.agg(
        F.sum("c_a").alias("n_a"),
        (F.sum("c_tot") - F.sum("c_a")).alias("n_b"),
        F.sum("c_tot").alias("n"),
        F.sum(
            F.col("c_a") * (2 * F.col("prev_cum") + F.col("c_tot") + 1)
        ).alias("two_r_a"),
        F.sum(
            F.col("c_tot") * F.col("c_tot") * F.col("c_tot") - F.col("c_tot")
        ).alias("tie_cubes"),
    )
    two_u = (
        2 * F.col("n_a") * F.col("n_b")
        + F.col("n_a") * (F.col("n_a") + 1)
        - F.col("two_r_a")
    )
    sigma = F.sqrt(
        (F.col("n_a") * F.col("n_b")).cast("double") / F.lit(12.0)
        * (
            (F.col("n") + 1).cast("double")
            - F.col("tie_cubes").cast("double")
            / (F.col("n") * (F.col("n") - 1)).cast("double")
        )
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        two_u.cast("long").alias("two_u_a"),
        F.round(
            two_u.cast("double") / (2 * F.col("n_a") * F.col("n_b")).cast("double"),
            6,
        ).alias("auc_a"),
        F.col("tie_cubes").cast("long").alias("tie_cubes"),
        F.round(
            (two_u.cast("double") - (F.col("n_a") * F.col("n_b")).cast("double"))
            / (F.lit(2.0) * sigma),
            4,
        ).alias("z_score"),
    )


#: (column, integer unit factor, short name) — quantity is integral in
#: the fixture, price in cents, discount/tax in basis points.
_COV_COLS = [
    ("l_quantity", 1, "qty"),
    ("l_extendedprice", 100, "price"),
    ("l_discount", 10000, "disc"),
    ("l_tax", 10000, "tax"),
]


@register(
    "agg_covariance_matrix",
    # One-pass Gram matrix: integer-unit sums Σx, Σxy as HUGEINT /
    # DECIMAL(38,0) (Σ price² crosses BIGINT at ~sf0.1), then
    # cov = (nΣxy − ΣxΣy)/(n(n−1)) rescaled by the unit factors in ONE
    # float division; ROUND 6.
    oracle=f"""
    WITH u AS (
        SELECT CAST(ROUND(l_quantity * 1) AS BIGINT) AS x0,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 10000) AS BIGINT) AS x2,
               CAST(ROUND(l_tax * 10000) AS BIGINT) AS x3
        FROM lineitem
    ), sums AS (
        SELECT COUNT(*) AS n,
               {", ".join(f"SUM(CAST(x{i} AS HUGEINT)) AS s{i}" for i in range(4))},
               {", ".join(f"SUM(CAST(x{i} AS HUGEINT) * x{j}) AS p{i}{j}" for i in range(4) for j in range(4) if i <= j)}
        FROM u
    )
    SELECT x_name, y_name, CAST(n AS BIGINT) AS n, cov
    FROM (
        {" UNION ALL ".join(
            f"SELECT '{_COV_COLS[i][2]}' AS x_name, '{_COV_COLS[j][2]}' AS y_name, n, "
            f"ROUND(CAST(n * p{i}{j} - s{i} * s{j} AS DOUBLE) / "
            f"(CAST(n * (n - 1) AS DOUBLE) * {float(_COV_COLS[i][1] * _COV_COLS[j][1])}), 6) AS cov "
            f"FROM sums"
            for i in range(4) for j in range(4) if i <= j
        )}
    )
    """,
)
def agg_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sample covariance matrix of the four lineitem measures
    (quantity, extendedprice, discount, tax) in long form — the
    one-pass sufficient-statistics pattern: a SINGLE hash aggregate
    emits n, four Σx and ten Σxy in integer units (DECIMAL(38,0):
    Σprice² crosses BIGINT at ~sf0.1), and each covariance is ONE
    float division of exact integers, unit-rescaled; ROUND 6.

    Scale notes: this is the Gram-matrix recipe every downstream PCA /
    Mahalanobis / regression step reuses (functions/vectors.py): one
    corpus pass, no shuffle at all beyond the final 1-row partial-agg
    merge, output 10 rows regardless of corpus size.  The per-row
    integer products are BIGINT-safe (price² ≈ 1e14 per row); only the
    SUMS need the wide type."""
    li = load_table(spark, sf_dir, "lineitem")
    u = li.select(
        *[
            F.round(F.col(col) * unit).cast("bigint").alias(f"x{i}")
            for i, (col, unit, _) in enumerate(_COV_COLS)
        ]
    )
    aggs = [F.count("*").alias("n")]
    aggs += [
        F.sum(F.col(f"x{i}").cast("decimal(38,0)")).alias(f"s{i}")
        for i in range(4)
    ]
    aggs += [
        F.sum(
            (F.col(f"x{i}") * F.col(f"x{j}")).cast("decimal(38,0)")
        ).alias(f"p{i}{j}")
        for i in range(4)
        for j in range(4)
        if i <= j
    ]
    sums = u.agg(*aggs)
    parts = []
    for i in range(4):
        for j in range(4):
            if i > j:
                continue
            unit = float(_COV_COLS[i][1] * _COV_COLS[j][1])
            num = (
                F.col("n").cast("decimal(38,0)") * F.col(f"p{i}{j}")
                - F.col(f"s{i}") * F.col(f"s{j}")
            )
            parts.append(
                sums.select(
                    F.lit(_COV_COLS[i][2]).alias("x_name"),
                    F.lit(_COV_COLS[j][2]).alias("y_name"),
                    F.col("n").cast("long").alias("n"),
                    F.round(
                        num.cast("double")
                        / (
                            (F.col("n") * (F.col("n") - 1)).cast("double")
                            * F.lit(unit)
                        ),
                        6,
                    ).alias("cov"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "agg_gini_lorenz",
    # Gini by the rank formula over per-customer revenue cents:
    # G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx), ranks on (revenue, custkey)
    # so the order is total; Lorenz deciles via ntile(10) on the same
    # order.  All products DECIMAL(38,0); shares in exact ppm.
    oracle="""
    WITH rev AS (
        SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                               AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rk,
               NTILE(10) OVER (ORDER BY cents, o_custkey) AS decile
        FROM rev
    ), d AS (
        SELECT decile, COUNT(*) AS n_customers,
               SUM(CAST(cents AS HUGEINT)) AS rev_cents,
               SUM(CAST(rk AS HUGEINT) * cents) AS rank_cents
        FROM ranked GROUP BY decile
    ), t AS (
        SELECT decile, n_customers, rev_cents,
               SUM(rev_cents) OVER (ORDER BY decile) AS cum_rev_cents,
               SUM(rev_cents) OVER () AS tot,
               SUM(rank_cents) OVER () AS rank_sum,
               SUM(n_customers) OVER () AS n
        FROM d
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(cum_rev_cents AS BIGINT) AS cum_rev_cents,
           CAST(cum_rev_cents * 1000000 // tot AS BIGINT) AS cum_share_ppm,
           CAST((2 * rank_sum - (n + 1) * tot) * 1000000
                // (n * tot) AS BIGINT) AS gini_ppm
    FROM t
    """,
)
def agg_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue concentration: the Lorenz curve in deciles
    (ntile over total revenue order) with exact cumulative ppm shares,
    plus the Gini coefficient in ppm by the rank formula
    G = (2Σi·xᵢ − (n+1)Σx)/(nΣx) — all integer arithmetic on revenue
    cents, DECIMAL(38,0) products (n·Σx crosses BIGINT near sf10).

    Scale notes: the corpus collapses to the customer-dim rollup in one
    hash agg; the global revenue order is a single-partition window on
    that rollup here — the range-partitioned two-pass rank of
    ``table_skew_stats(scale_twopass=True)`` (operators/scale.py) is
    the drop-in 100 TB variant for a customer dim that outgrows one
    partition, and the rank formula itself is partitioning-invariant."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w_ord = Window.orderBy("cents", "o_custkey")
    ranked = rev.select(
        "cents",
        F.row_number().over(w_ord).alias("rk"),
        F.ntile(10).over(w_ord).alias("decile"),
    )
    w_dec = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    d = (
        ranked.groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("rev_cents"),
            F.sum(F.col("rk").cast("decimal(38,0)") * F.col("cents")).alias(
                "rank_cents"
            ),
        )
        .select(
            "decile",
            "n_customers",
            "rev_cents",
            F.sum("rev_cents").over(w_dec).alias("cum_rev_cents"),
            F.sum("rev_cents").over(w_all).alias("tot"),
            F.sum("rank_cents").over(w_all).alias("rank_sum"),
            F.sum("n_customers").over(w_all).alias("n"),
        )
    )
    return d.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("rev_cents").cast("long").alias("rev_cents"),
        F.col("cum_rev_cents").cast("long").alias("cum_rev_cents"),
        F.expr("CAST(cum_rev_cents * 1000000 div tot AS BIGINT)").alias(
            "cum_share_ppm"
        ),
        F.expr(
            "CAST((2 * rank_sum - (n + 1) * tot) * 1000000 div (n * tot)"
            " AS BIGINT)"
        ).alias("gini_ppm"),
    )


#: Benford expected first-digit frequencies in ppm — mathematical
#: constants round(log10(1+1/d)·1e6), hardcoded so NO engine computes a
#: transcendental at query time.
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@register(
    "events_benford_deviation",
    # First significant digit extracted in INTEGER space (value → cents
    # → first decimal digit via string head — no float log10 at any
    # point); expected ppm are hardcoded constants; observed ppm exact
    # integer division.
    oracle=f"""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR),
                           1, 1) AS INT) AS digit
        FROM events WHERE value > 0
    ), counts AS (
        SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
    )
    SELECT CAST(digit AS INT) AS digit,
           CAST(n AS BIGINT) AS n,
           CAST(n * 1000000 // SUM(n) OVER () AS BIGINT) AS obs_ppm,
           CAST(CASE digit
                {" ".join(f"WHEN {k} THEN {v}" for k, v in _BENFORD_PPM.items())}
                END AS BIGINT) AS exp_ppm,
           CAST(n * 1000000 // SUM(n) OVER ()
                - CASE digit
                  {" ".join(f"WHEN {k} THEN {v}" for k, v in _BENFORD_PPM.items())}
                  END AS BIGINT) AS dev_ppm
    FROM counts
    """,
)
def events_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of the event value column —
    the classic fabricated-data / instrumentation-bug detector: the
    first significant digit is extracted in INTEGER space (cents →
    first character of the integer's decimal string, no float log10
    anywhere), observed frequencies in exact ppm against the hardcoded
    Benford constants.

    Scale notes: pure scan-side string/arithmetic expressions into ONE
    hash aggregate over 9 digit groups; the ppm windows run on the
    9-row rollup.  (The fixture's uniform-ish value distribution is
    exactly what this op should flag: large positive dev_ppm on high
    digits — the MEASUREMENT is the product, deviation ≠ vacuity.)"""
    e = load_table(spark, sf_dir, "events")
    d = e.where(F.col("value") > 0).select(
        F.substring(
            F.round(F.col("value") * 100).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count("*").alias("n"))
    w_all = Window.partitionBy()
    exp_ppm = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
    )[F.col("digit")]
    return (
        counts.select(
            F.col("digit").cast("int").alias("digit"),
            F.col("n").cast("long").alias("n"),
            (F.col("n") * 1000000).cast("bigint").alias("_num"),
            F.sum("n").over(w_all).cast("bigint").alias("_tot"),
            exp_ppm.cast("long").alias("exp_ppm"),
        )
        .select(
            "digit",
            "n",
            F.expr("CAST(_num div _tot AS BIGINT)").alias("obs_ppm"),
            "exp_ppm",
        )
        .select(
            "digit",
            "n",
            "obs_ppm",
            "exp_ppm",
            (F.col("obs_ppm") - F.col("exp_ppm")).cast("long").alias("dev_ppm"),
        )
    )


#: The fixture's closed event-type enum — the day-mix pivot below is
#: fixed-width so consecutive-day alignment is a LAG on the day rollup,
#: never a join.
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_drift_jsd",
    # Day-over-day Jensen–Shannon divergence of the event-type mix.
    # With integer counts a_i (today), b_i (yesterday) and totals n1,
    # n2: JSD = Σ_i [A·ln(2A/(A+B)) + B·ln(2B/(A+B))] / (2·n1·n2)
    # where A = a_i·n2, B = b_i·n1 — exact integers into a ≤10-term
    # float sum; zero-count terms contribute 0 by definition; ROUND 6.
    oracle=f"""
    WITH day_mix AS (
        SELECT CAST(ts AS DATE) AS day,
               {", ".join(f"COUNT(*) FILTER (event_type = '{t}') AS c{i}" for i, t in enumerate(_EVENT_TYPES))},
               COUNT(*) AS n
        FROM events GROUP BY day
    ), pairs AS (
        SELECT day, n,
               LAG(day) OVER (ORDER BY day) AS prev_day,
               LAG(n) OVER (ORDER BY day) AS prev_n,
               {", ".join(f"c{i}, LAG(c{i}) OVER (ORDER BY day) AS p{i}" for i in range(len(_EVENT_TYPES)))}
        FROM day_mix
    )
    SELECT day, prev_day,
           CAST(n AS BIGINT) AS n_events,
           CAST(prev_n AS BIGINT) AS prev_n_events,
           ROUND((
             {" + ".join(
                 f"(CASE WHEN c{i} = 0 THEN 0.0 ELSE CAST(c{i} * prev_n AS DOUBLE)"
                 f" * ln(2.0 * CAST(c{i} * prev_n AS DOUBLE)"
                 f"      / CAST(c{i} * prev_n + p{i} * n AS DOUBLE)) END"
                 f" + CASE WHEN p{i} = 0 THEN 0.0 ELSE CAST(p{i} * n AS DOUBLE)"
                 f" * ln(2.0 * CAST(p{i} * n AS DOUBLE)"
                 f"      / CAST(c{i} * prev_n + p{i} * n AS DOUBLE)) END)"
                 for i in range(len(_EVENT_TYPES))
             )}
           ) / (2.0 * CAST(n AS DOUBLE) * CAST(prev_n AS DOUBLE)), 6) AS jsd_nats
    FROM pairs WHERE prev_day IS NOT NULL
    """,
)
def events_drift_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day distribution drift of the event-type mix as
    Jensen–Shannon divergence (symmetric, bounded by ln 2 — the
    standard training-data drift alarm): the daily mix is pivoted to
    the closed 5-type enum, yesterday's mix arrives by LAG on the day
    rollup, and JSD is computed from exact integer cross-products
    A = aᵢ·n₂, B = bᵢ·n₁ in a ≤10-term float sum (zero-count terms
    are 0 by definition); ROUND 6.

    Scale notes: ONE corpus-sized hash aggregate to the calendar-day
    rollup; the pivot is conditional aggregation (no second shuffle),
    and the LAG window runs on ≤|days| rows.  The closed enum is what
    makes alignment a lag instead of a join — an open type set would
    use the full-outer-join-per-day-pair form."""
    e = load_table(spark, sf_dir, "events")
    day_mix = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"c{i}")
            for i, t in enumerate(_EVENT_TYPES)
        ],
        F.count("*").alias("n"),
    )
    w = Window.orderBy("day")
    pairs = day_mix.select(
        "day",
        "n",
        F.lag("day").over(w).alias("prev_day"),
        F.lag("n").over(w).alias("prev_n"),
        *[F.col(f"c{i}") for i in range(len(_EVENT_TYPES))],
        *[
            F.lag(f"c{i}").over(w).alias(f"p{i}")
            for i in range(len(_EVENT_TYPES))
        ],
    ).where(F.col("prev_day").isNotNull())
    terms = []
    for i in range(len(_EVENT_TYPES)):
        a = (F.col(f"c{i}") * F.col("prev_n")).cast("double")
        bb = (F.col(f"p{i}") * F.col("n")).cast("double")
        tot = (
            F.col(f"c{i}") * F.col("prev_n") + F.col(f"p{i}") * F.col("n")
        ).cast("double")
        terms.append(
            F.when(F.col(f"c{i}") == 0, F.lit(0.0)).otherwise(
                a * F.log(F.lit(2.0) * a / tot)
            )
            + F.when(F.col(f"p{i}") == 0, F.lit(0.0)).otherwise(
                bb * F.log(F.lit(2.0) * bb / tot)
            )
        )
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return pairs.select(
        "day",
        "prev_day",
        F.col("n").cast("long").alias("n_events"),
        F.col("prev_n").cast("long").alias("prev_n_events"),
        F.round(
            total / (F.lit(2.0) * F.col("n").cast("double") * F.col("prev_n").cast("double")),
            6,
        ).alias("jsd_nats"),
    )


@register(
    "events_kaplan_meier",
    # Kaplan-Meier product-limit estimator, time-to-first-purchase with
    # staggered per-user administrative censoring (follow-up window
    # 3 + user_id % 9 days): per support point (a duration with >= 1
    # event), the at-risk count (suffix sum), events, censored,
    # discrete hazard ppm (integer), and survival ppm via the ordered
    # cumulative sum of ln(1 - d/n) — identical doubles summed in the
    # same (duration) order on both engines, ONE exp + ROUND at the
    # end; ulp noise ~1e-14 vs ppm granularity 1e-6.
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(MIN(ts) AS DATE) AS d0,
               CAST(MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                    AS DATE) AS dp
        FROM events GROUP BY user_id
    ), subj AS (
        SELECT user_id,
               CAST(3 + user_id % 9 AS BIGINT) AS fup,
               CASE WHEN dp IS NOT NULL
                         AND date_diff('day', d0, dp) <= 3 + user_id % 9
                    THEN date_diff('day', d0, dp)
                    ELSE 3 + user_id % 9 END AS dur,
               CASE WHEN dp IS NOT NULL
                         AND date_diff('day', d0, dp) <= 3 + user_id % 9
                    THEN 1 ELSE 0 END AS ev
        FROM u
    ), g AS (
        SELECT dur, SUM(ev) AS d_events,
               SUM(1 - ev) AS censored,
               COUNT(*) AS n_at
        FROM subj GROUP BY dur
    ), r AS (
        SELECT *, SUM(n_at) OVER (ORDER BY dur DESC) AS n_risk FROM g
    ), km AS (
        SELECT dur, d_events, censored, n_risk,
               CASE WHEN MAX(CASE WHEN d_events = n_risk THEN 1 ELSE 0
                             END) OVER (ORDER BY dur) = 1
                    THEN 0.0
                    ELSE EXP(SUM(CASE WHEN d_events < n_risk
                                 THEN LN(1.0 - CAST(d_events AS DOUBLE)
                                              / n_risk)
                                 ELSE 0.0 END) OVER (ORDER BY dur))
               END AS surv
        FROM r
    )
    SELECT CAST(dur AS BIGINT) AS dur_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d_events AS BIGINT) AS d_events,
           CAST(censored AS BIGINT) AS censored,
           CAST(d_events * 1000000 // n_risk AS BIGINT) AS hazard_ppm,
           CAST(ROUND(surv * 1000000) AS BIGINT) AS survival_ppm
    FROM km WHERE d_events > 0
    """,
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase under
    right censoring — the estimator every conversion/churn analysis
    reaches for when follow-up is incomplete.  Subjects enroll at their
    first event; the event is the first purchase within a staggered
    per-user follow-up window (3 + user_id % 9 days — uneven
    observation horizons, which is what makes censoring REAL here:
    fixture audit shows 143 events + 7 censored spread over durations
    0-10, so the at-risk set shrinks between support points and KM
    diverges from the naive empirical CDF).  Survival is the product
    limit Π(1 - d_i/n_i), computed as exp of the duration-ordered
    cumulative sum of ln terms — both engines sum identical doubles in
    the same order, ONE rounding at ppm scale absorbs last-ulp libm
    drift (`fn_geo_haversine`'s discipline); hazard and all counts are
    exact integers.

    Scale notes: ONE per-user collapse (hash agg on user_id) from
    event grain to the subject frame, then a duration-grain rollup
    bounded by the follow-up window (<= 12 rows at any corpus size) —
    the two global windows (suffix at-risk sum, cumulative ln) run on
    that bounded frame only (reviewed SINGLE allowlist rows)."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("dp"),
    )
    fup = F.lit(3) + F.col("user_id") % 9
    observed = F.col("dp").isNotNull() & (
        F.datediff("dp", "d0") <= fup
    )
    subj = u.select(
        F.when(observed, F.datediff("dp", "d0")).otherwise(fup).alias("dur"),
        F.when(observed, 1).otherwise(0).alias("ev"),
    )
    g = subj.groupBy("dur").agg(
        F.sum("ev").alias("d_events"),
        F.sum(F.lit(1) - F.col("ev")).alias("censored"),
        F.count(F.lit(1)).alias("n_at"),
    )
    w_desc = Window.orderBy(F.desc("dur"))
    w_asc = Window.orderBy("dur")
    r = g.withColumn("n_risk", F.sum("n_at").over(w_desc))
    # Terminal support point can absorb the whole risk set (d == n →
    # survival exactly 0); ln(1-d/n) is undefined there, so the zero is
    # carried by a cumulative flag instead of the log-sum (both engines
    # identically — DuckDB raises on LN(0), Spark yields NULL).
    km = r.withColumn(
        "surv",
        F.when(
            F.max(
                F.when(F.col("d_events") == F.col("n_risk"), 1).otherwise(0)
            ).over(w_asc)
            == 1,
            F.lit(0.0),
        ).otherwise(
            F.exp(
                F.sum(
                    F.when(
                        F.col("d_events") < F.col("n_risk"),
                        F.log(
                            F.lit(1.0)
                            - F.col("d_events").cast("double")
                            / F.col("n_risk")
                        ),
                    ).otherwise(F.lit(0.0))
                ).over(w_asc)
            )
        ),
    )
    return km.where(F.col("d_events") > 0).select(
        F.col("dur").cast("long").alias("dur_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d_events").cast("long").alias("d_events"),
        F.col("censored").cast("long").alias("censored"),
        F.expr("d_events * 1000000 div n_risk").cast("long").alias(
            "hazard_ppm"
        ),
        F.round(F.col("surv") * 1000000).cast("long").alias("survival_ppm"),
    )


@register(
    "events_forecast_backtest",
    # Rolling-origin backtest of the seasonal-naive forecaster on the
    # daily event-count series: for every day with a lag-7 available,
    # forecast = the count 7 days earlier (seasonal naive) and the
    # count 1 day earlier (naive baseline); per-day absolute errors,
    # window totals, and the snaive-vs-naive skill score ppm — all
    # pure integer arithmetic on the zero-filled calendar spine.
    oracle="""
    WITH bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
        FROM events
    ), spine AS (
        SELECT lo + CAST(i AS INTEGER) AS day
        FROM bounds, range(0, 10000) t(i)
        WHERE lo + CAST(i AS INTEGER) <= hi
    ), counts AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS y
        FROM events GROUP BY 1
    ), series AS (
        SELECT s.day, COALESCE(c.y, 0) AS y,
               LAG(COALESCE(c.y, 0), 7) OVER (ORDER BY s.day) AS f_snaive,
               LAG(COALESCE(c.y, 0), 1) OVER (ORDER BY s.day) AS f_naive
        FROM spine s LEFT JOIN counts c ON s.day = c.day
    ), eval AS (
        SELECT day, y, f_snaive, f_naive,
               ABS(y - f_snaive) AS ae_snaive,
               ABS(y - f_naive) AS ae_naive
        FROM series WHERE f_snaive IS NOT NULL
    )
    SELECT day, CAST(y AS BIGINT) AS y,
           CAST(f_snaive AS BIGINT) AS f_snaive,
           CAST(f_naive AS BIGINT) AS f_naive,
           CAST(ae_snaive AS BIGINT) AS ae_snaive,
           CAST(ae_naive AS BIGINT) AS ae_naive,
           CAST(SUM(ae_snaive) OVER () AS BIGINT) AS total_ae_snaive,
           CAST(SUM(ae_naive) OVER () AS BIGINT) AS total_ae_naive,
           CAST((SUM(ae_naive) OVER () - SUM(ae_snaive) OVER ())
                * 1000000 // SUM(ae_naive) OVER () AS BIGINT)
               AS snaive_skill_ppm
    FROM eval
    """,
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest — the offline evaluation a
    production forecaster ships with: walk the daily event-count
    series, at each origin forecast the next day with the seasonal
    naive rule (y[d-7]; the standard hard-to-beat baseline for weekly
    seasonality) and the plain naive rule (y[d-1]), and score both
    with absolute error plus the relative skill ppm ((naive - snaive)
    / naive) — positive skill means the weekly pattern is real signal
    (`events_holt_forecast` is the model this backtest would
    gatekeep).  The spine is zero-filled from min to max day so lag-7
    alignment never silently skips a gap day; every output value is
    exact integer arithmetic.

    Scale notes: ONE hash agg from event grain to the calendar-sized
    daily rollup; the lag/total windows run on that bounded frame
    (reviewed SINGLE allowlist rows); the spine is a 1-row bounds
    frame exploded by sequence (reviewed NLJ row — the
    `events_user_lifecycle` grid-generator pattern)."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    counts = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y0")
    )
    w = Window.orderBy("day")
    series = (
        spine.join(counts, "day", "left")
        .select("day", F.coalesce("y0", F.lit(0)).alias("y"))
        .withColumn("f_snaive", F.lag("y", 7).over(w))
        .withColumn("f_naive", F.lag("y", 1).over(w))
        .where(F.col("f_snaive").isNotNull())
    )
    ev = series.select(
        "day",
        F.col("y").cast("long").alias("y"),
        F.col("f_snaive").cast("long").alias("f_snaive"),
        F.col("f_naive").cast("long").alias("f_naive"),
        F.abs(F.col("y") - F.col("f_snaive")).cast("long").alias("ae_snaive"),
        F.abs(F.col("y") - F.col("f_naive")).cast("long").alias("ae_naive"),
    )
    w_all = Window.partitionBy()
    tot_s = F.sum("ae_snaive").over(w_all)
    tot_n = F.sum("ae_naive").over(w_all)
    return ev.select(
        "day",
        "y",
        "f_snaive",
        "f_naive",
        "ae_snaive",
        "ae_naive",
        tot_s.cast("long").alias("total_ae_snaive"),
        tot_n.cast("long").alias("total_ae_naive"),
        ((tot_n - tot_s) * 1000000)
        .cast("long")
        .alias("_num"),
    ).select(
        "day",
        "y",
        "f_snaive",
        "f_naive",
        "ae_snaive",
        "ae_naive",
        "total_ae_snaive",
        "total_ae_naive",
        F.expr("_num div total_ae_naive").cast("long").alias(
            "snaive_skill_ppm"
        ),
    )


#: Poisson(1) CDF split points scaled to 2^16 — exact integer
#: thresholds for 16-bit md5-derived draws, so both engines draw
#: IDENTICAL bootstrap weights (P(w)=e^-1/w!; w capped at 7; the
#: 2^-16 CDF quantization moves ≤1.2e-5 of probability mass per
#: split point, far below bootstrap noise, and is part of the
#: deterministic scheme both engines share).  16-bit draws are the
#: measured-throughput choice: one 128-bit md5 yields EIGHT draws
#: (4 hex chars each), so the per-order hash count is 8, not 64.
_POIS_T = (24109, 48219, 60273, 64292, 65296, 65497, 65531)

_BOOT_R = 64  # replicates; 2.5%/97.5% nearest-rank = ranks 2 and 63
_BOOT_G = 8  # md5 groups per order; 8 draws each (_BOOT_R = 8 x 8)


def _boot_oracle() -> str:
    """Oracle for agg_bootstrap_ci (built by loop — the replicate CASE
    chain and count are shared constants with the Spark side)."""
    case = "CASE " + " ".join(
        f"WHEN h < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    ) + " ELSE 7 END"
    return f"""
    WITH o AS (
        SELECT c.c_mktsegment AS segment,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
               o.o_orderkey AS k
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), hashed AS (
        SELECT segment, cents, g.g * {_BOOT_G} + j.j AS r,
               CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || ':'
                                        || CAST(g.g AS VARCHAR)),
                                    1 + 4 * CAST(j.j AS INTEGER), 4))
                    AS BIGINT) AS h
        FROM o, range({_BOOT_G}) g(g), range({_BOOT_G}) j(j)
    ), means AS (
        SELECT segment, r,
               SUM(({case}) * cents) // SUM({case}) AS mean_r
        FROM hashed GROUP BY 1, 2
    ), ranked AS (
        SELECT segment, r, mean_r,
               ROW_NUMBER() OVER (PARTITION BY segment
                                  ORDER BY mean_r, r) AS rk
        FROM means
    ), ci AS (
        SELECT segment,
               MAX(CASE WHEN rk = 2 THEN mean_r END) AS lo,
               MAX(CASE WHEN rk = {_BOOT_R - 1} THEN mean_r END) AS hi
        FROM ranked GROUP BY 1
    ), pt AS (
        SELECT segment, COUNT(*) AS n_orders,
               SUM(cents) // COUNT(*) AS mean_cents
        FROM o GROUP BY 1
    )
    SELECT pt.segment,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(mean_cents AS BIGINT) AS mean_cents,
           CAST(lo AS BIGINT) AS boot_lo_cents,
           CAST(hi AS BIGINT) AS boot_hi_cents,
           CAST(hi - lo AS BIGINT) AS ci_width_cents
    FROM pt JOIN ci ON pt.segment = ci.segment
    """


@register("agg_bootstrap_ci", oracle=_boot_oracle())
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-segment mean
    order value — the PRODUCTION bootstrap: instead of materializing R
    resamples, every row draws R independent Poisson(1) weights and
    all R replicate sums come out of ONE streaming pass (Chamandy et
    al.'s estimator, the standard at terabyte scale because resampling
    passes are unaffordable).  Weights are deterministic: a 60-bit
    md5-derived hash of (orderkey, replicate) inverse-CDF'd through
    exact integer Poisson(1) thresholds (`_POIS_T`, identical
    constants both engines) — so the WHOLE bootstrap, not just its
    expectation, is oracle-proven bit-for-bit.  Replicate means are
    integer cents division; the 95% CI is nearest-rank 2 / 63 of the
    64 ordered replicate means.

    Scale notes — three measured scale traps, all fixed here (each
    shape is the same 96M draws at sf1; only the physical form
    differs).  (1) The tempting no-explode form — 128 conditional-sum
    aggregate expressions — exceeds ``spark.sql.codegen.maxFields``
    (100), silently dropping the aggregate out of codegen into
    interpreted evaluation: 59 s.  (2) One md5 per (order, replicate)
    is 64 hashes/row: 63 s.  (3) Even with 8 md5/order, building the
    8-draw array + CASE chains + aggregate in ONE generated function
    exceeds HotSpot's JIT method limit, so the whole stage runs in the
    bytecode interpreter: 28 s (measured: adding ONE aggregate buffer
    or a string group key to an otherwise 4-s pipeline cost +22 s).
    The shipped shape explodes the 8 hash groups (one md5 each),
    explodes the 8 draw slots as ROWS, and evaluates one
    substring+conv+CASE per row — every generated method stays small
    and JIT-compiled, and ONE hash aggregate map-side-combines to
    |segments|×64 (= 320) groups: 7.7 s at sf1.  A round-robin
    repartition of the narrow pre-fanout frame decouples the draw CPU
    from parquet row-group granularity (sf1 fixtures are 2 row
    groups; without it the whole fanout ran on 2 tasks, 87 s).
    Nothing corpus-sized is materialized; at 100 TB this is THE way
    to put error bars on a corpus-sized mean."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents"),
        F.col("o_orderkey").alias("k"),
    )
    # CPU-rebalance shuffle (measured: sf1 fixtures are 1-2 parquet row
    # groups, and a scan-pipelined fanout then runs all 8·|orders| md5
    # draws on 1-2 tasks — 87 s single-task stage).  Round-robin
    # repartitioning the NARROW (segment, cents, k) frame costs one
    # ~tens-of-MB shuffle and buys full-cluster parallelism for the
    # hash work; with many-row-group production input it is a cheap
    # no-op by comparison with the draw CPU it balances.
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    hexed = base.repartition(nparts).select(
        "segment",
        "cents",
        "k",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_G - 1))).alias("g"),
    ).select(
        "segment",
        "cents",
        "g",
        F.md5(
            F.concat_ws(":", F.col("k").cast("string"), F.col("g").cast("string"))
        ).alias("hx"),
    )

    rows = hexed.select(
        "segment",
        "cents",
        "g",
        "hx",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_G - 1))).alias("j"),
    ).select(
        "segment",
        "cents",
        "g",
        "j",
        F.conv(F.expr("substring(hx, 1 + 4 * j, 4)"), 16, 10)
        .cast("int")
        .alias("hv"),
    )
    w = F.when(F.col("hv") < _POIS_T[0], 0)
    for k_, t in enumerate(_POIS_T[1:], start=1):
        w = w.when(F.col("hv") < t, k_)
    w = w.otherwise(7)
    reps = (
        rows.select("segment", "cents", "g", "j", w.alias("w"))
        .groupBy(
            "segment",
            (F.col("g") * _BOOT_G + F.col("j")).alias("r"),
        )
        .agg(
            # Each order appears exactly once per replicate id, so the
            # per-(segment, r) row count IS n_orders and the plain cents
            # sum IS sum_cents — the point estimate rides the same agg.
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.sum(F.col("w") * F.col("cents")).alias("v"),
            F.sum("w").alias("w_sum"),
        )
        .select(
            "segment",
            "n_orders",
            "sum_cents",
            "r",
            F.expr("v div w_sum").alias("mean_r"),
        )
    )
    w_seg = Window.partitionBy("segment").orderBy("mean_r", "r")
    ranked = reps.withColumn("rk", F.row_number().over(w_seg))
    return ranked.groupBy("segment").agg(
        F.first("n_orders").cast("long").alias("n_orders"),
        F.expr("first(sum_cents) div first(n_orders)")
        .cast("long")
        .alias("mean_cents"),
        F.max(F.when(F.col("rk") == 2, F.col("mean_r")))
        .cast("long")
        .alias("boot_lo_cents"),
        F.max(F.when(F.col("rk") == _BOOT_R - 1, F.col("mean_r")))
        .cast("long")
        .alias("boot_hi_cents"),
        (
            F.max(F.when(F.col("rk") == _BOOT_R - 1, F.col("mean_r")))
            - F.max(F.when(F.col("rk") == 2, F.col("mean_r")))
        )
        .cast("long")
        .alias("ci_width_cents"),
    )


@register(
    "agg_grouped_ols",
    # Exact grouped ordinary least squares: the five sufficient
    # statistics (n, Σx, Σy, Σxy, Σx², Σy²) are HUGEINT-exact on both
    # engines (DuckDB sums BIGINT into HUGEINT; Spark sums
    # decimal(38,0)), the closed-form slope / intercept / R² numerators
    # and denominators are int128 products of those sums, and the ONLY
    # float work is the final division of identical integers (IEEE
    # division and int→double conversion are correctly rounded, so both
    # engines produce bit-identical doubles).  ROUND fixes the digits.
    oracle="""
    WITH pts AS (
        SELECT l_returnflag, l_linestatus,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice) AS BIGINT) AS y
        FROM lineitem
    ), s AS (
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(x * y) AS HUGEINT) AS sxy,
               CAST(SUM(x * x) AS HUGEINT) AS sxx,
               CAST(SUM(y * y) AS HUGEINT) AS syy
        FROM pts GROUP BY 1, 2
    )
    SELECT l_returnflag, l_linestatus,
           CAST(n AS BIGINT) AS n,
           CAST(sx AS BIGINT) AS sum_qty,
           CAST(sy AS BIGINT) AS sum_usd,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6)
               AS slope_usd_per_unit,
           ROUND(CAST(sxx * sy - sx * sxy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 2)
               AS intercept_usd,
           CAST(ROUND(1000000.0
                 * (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE))
                 * (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
               AS r2_ppm
    FROM s ORDER BY 1, 2
    """,
)
def agg_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS regression of line revenue (integer dollars) on
    quantity per (returnflag, linestatus): closed-form slope, intercept
    and R² from exact int128 sufficient statistics — the five sums are
    decimal(38,0) (Spark) / HUGEINT (DuckDB) semigroup state, the
    normal-equation numerators/denominators are int128 products of
    them, and each reported value is a fixed tree of correctly-rounded
    IEEE ops over identical integers.  R² is reported in ppm as
    slope · (cov-term / y-variance-term), avoiding the int128-overflow
    of squaring the covariance numerator (documented envelope: the
    n·Σxy products stay < 10³⁸ past sf1000; the squared form dies at
    sf10).

    This is the mergeable-regression pattern: the sufficient-statistic
    vector is the ONLY state, so 1000 executors each emit one partial
    row per group and the combine is addition — `agg_moments_exact`'s
    discipline applied to the two-variable normal equations.

    Scale notes: ONE map-side-combined hash aggregate over lineitem to
    a 4-row group frame; every later expression is per-row arithmetic
    on that frame.  No windows, no second pass, no floats before the
    final divisions."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    d38 = "decimal(38,0)"
    s = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("x").cast(d38)).cast(d38).alias("sx"),
        F.sum(F.col("y").cast(d38)).cast(d38).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).cast(d38).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast(d38).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).cast(d38).alias("syy"),
    )
    cov_n = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    varx_n = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vary_n = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    int_n = (F.col("sxx") * F.col("sy") - F.col("sx") * F.col("sxy")).cast(
        "double"
    )
    return s.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast("long").alias("sum_qty"),
        F.col("sy").cast("long").alias("sum_usd"),
        F.round(cov_n / varx_n, 6).alias("slope_usd_per_unit"),
        F.round(int_n / varx_n, 2).alias("intercept_usd"),
        F.round(F.lit(1000000.0) * (cov_n / varx_n) * (cov_n / vary_n))
        .cast("long")
        .alias("r2_ppm"),
    ).orderBy("l_returnflag", "l_linestatus")


#: Experiment split: the last 14 event-days are the treatment window,
#: everything earlier is the CUPED pre-period covariate.
_CUPED_EXP_DAYS = 14


@register(
    "events_ab_cuped",
    # CUPED variance-reduced A/B readout: per-user (X, Y) = (pre-period
    # cents, experiment-period cents) from ONE conditional-sum user agg;
    # θ = cov(X,Y)/var(X) over all users from int128-exact pooled sums;
    # each variant's adjusted mean Ȳv − θ(X̄v − X̄) is a fixed IEEE
    # expression tree over identical integers on both engines.
    oracle=f"""
    WITH hz AS (
        SELECT CAST(MAX(ts) AS DATE) - {_CUPED_EXP_DAYS} AS cut FROM events
    ), u AS (
        SELECT user_id, user_id % 2 AS variant,
               SUM(CASE WHEN CAST(ts AS DATE) < cut
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS x,
               SUM(CASE WHEN CAST(ts AS DATE) >= cut
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS y
        FROM events, hz GROUP BY 1, 2
    ), pool AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(x * y) AS HUGEINT) AS sxy,
               CAST(SUM(x * x) AS HUGEINT) AS sxx,
               CAST(SUM(y * y) AS HUGEINT) AS syy
        FROM u
    ), v AS (
        SELECT variant, COUNT(*) AS n_users,
               SUM(x) AS vsx, SUM(y) AS vsy
        FROM u GROUP BY 1
    )
    SELECT variant,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(vsy AS BIGINT) AS sum_y_cents,
           ROUND(CAST(vsy AS DOUBLE) / CAST(n_users AS DOUBLE), 2)
               AS mean_y_cents,
           ROUND(CAST(vsy AS DOUBLE) / CAST(n_users AS DOUBLE)
                 - (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE))
                   * (CAST(vsx AS DOUBLE) / CAST(n_users AS DOUBLE)
                      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 2)
               AS mean_y_adj_cents,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS theta,
           CAST(ROUND(1000000.0
                 * (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE))
                 * (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
               AS var_reduction_ppm
    FROM v, pool ORDER BY variant
    """,
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Existing Data) adjusted
    A/B readout over events: users are deterministically split by
    ``user_id % 2``; Y is each user's spend in the last 14 event-days,
    X the same user's spend before the cutover; θ = cov(X,Y)/var(X)
    from pooled int128-exact sums, and the variant means are reported
    raw AND CUPED-adjusted (Ȳv − θ(X̄v − X̄)) with the achievable
    variance reduction (= R²(X,Y)) in ppm.  The adjusted mean needs
    ONLY per-variant sums plus pooled θ — no per-user second pass —
    because the adjustment is linear.

    Scale notes: one 1-row max-day aggregate broadcast onto the scan
    (the `agg_incremental_state_merge` horizon pattern, reviewed NLJ
    allowlist row), ONE user-grain conditional-sum hash aggregate
    (the corpus-sized work), ONE pooled + ONE 2-row variant aggregate
    on the user frame, and a 1-row × 2-row broadcast join.  The
    user-grain agg is the proven `events_dau_mau` shuffle shape."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.to_date("ts").alias("d"),
    )
    hz = e.agg(
        F.date_sub(F.max("d"), _CUPED_EXP_DAYS).alias("cut")
    )
    u = (
        e.join(F.broadcast(hz))
        .groupBy("user_id", F.pmod("user_id", F.lit(2)).alias("variant"))
        .agg(
            F.sum(
                F.when(F.col("d") < F.col("cut"), F.col("cents")).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("d") >= F.col("cut"), F.col("cents")).otherwise(
                    0
                )
            ).alias("y"),
        )
    )
    d38 = "decimal(38,0)"
    pool = u.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("x").cast(d38)).cast(d38).alias("sx"),
        F.sum(F.col("y").cast(d38)).cast(d38).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).cast(d38).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast(d38).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).cast(d38).alias("syy"),
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("vsx"),
        F.sum("y").alias("vsy"),
    )
    cov_n = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    varx_n = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vary_n = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    theta = cov_n / varx_n
    mean_y = F.col("vsy").cast("double") / F.col("n_users").cast("double")
    mean_x_v = F.col("vsx").cast("double") / F.col("n_users").cast("double")
    mean_x = F.col("sx").cast("double") / F.col("n").cast("double")
    return (
        v.join(F.broadcast(pool))
        .select(
            F.col("variant").cast("long").alias("variant"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("vsy").cast("long").alias("sum_y_cents"),
            F.round(mean_y, 2).alias("mean_y_cents"),
            F.round(mean_y - theta * (mean_x_v - mean_x), 2).alias(
                "mean_y_adj_cents"
            ),
            F.round(theta, 6).alias("theta"),
            F.round(F.lit(1000000.0) * theta * (cov_n / vary_n))
            .cast("long")
            .alias("var_reduction_ppm"),
        )
        .orderBy("variant")
    )


@register(
    "agg_welch_ttest",
    # Welch's unequal-variance t-test between the BUILDING and
    # MACHINERY order-total distributions: all six sufficient sums are
    # int128-exact conditional aggregates from ONE pass; means, sample
    # variances, t, and the Welch–Satterthwaite df are fixed IEEE
    # expression trees over identical integers (correctly-rounded ops
    # only), ROUNDed to the reported digits.
    oracle=f"""
    WITH s AS (
        SELECT c.c_mktsegment AS seg,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
    ), m AS (
        SELECT CAST(COUNT(*) FILTER (seg = '{_SEG_A}') AS HUGEINT) AS na,
               CAST(COUNT(*) FILTER (seg = '{_SEG_B}') AS HUGEINT) AS nb,
               CAST(SUM(cents) FILTER (seg = '{_SEG_A}') AS HUGEINT) AS sa,
               CAST(SUM(cents) FILTER (seg = '{_SEG_B}') AS HUGEINT) AS sb,
               CAST(SUM(cents * cents) FILTER (seg = '{_SEG_A}') AS HUGEINT)
                   AS qa,
               CAST(SUM(cents * cents) FILTER (seg = '{_SEG_B}') AS HUGEINT)
                   AS qb
        FROM s
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           ROUND(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE), 2) AS mean_a_cents,
           ROUND(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE), 2) AS mean_b_cents,
           ROUND((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                  - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)), 2)
               AS mean_diff_cents,
           ROUND((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                  - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                 / SQRT(CAST(na * qa - sa * sa AS DOUBLE)
                        / CAST(na * na * (na - 1) AS DOUBLE)
                        + CAST(nb * qb - sb * sb AS DOUBLE)
                        / CAST(nb * nb * (nb - 1) AS DOUBLE)), 6) AS t_stat,
           ROUND(POWER(CAST(na * qa - sa * sa AS DOUBLE)
                       / CAST(na * na * (na - 1) AS DOUBLE)
                       + CAST(nb * qb - sb * sb AS DOUBLE)
                       / CAST(nb * nb * (nb - 1) AS DOUBLE), 2)
                 / (POWER(CAST(na * qa - sa * sa AS DOUBLE)
                          / CAST(na * na * (na - 1) AS DOUBLE), 2)
                    / CAST(na - 1 AS DOUBLE)
                    + POWER(CAST(nb * qb - sb * sb AS DOUBLE)
                            / CAST(nb * nb * (nb - 1) AS DOUBLE), 2)
                    / CAST(nb - 1 AS DOUBLE)), 2) AS df_welch
    FROM m
    """,
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test on order totals
    (BUILDING vs MACHINERY), the parametric sibling of `agg_ks_test` /
    `agg_mannwhitney_u` that completes the two-sample family: exact
    int128 sufficient sums (n, Σx, Σx² per arm) from ONE conditional
    aggregate, then means, standard-error, t, and the
    Welch–Satterthwaite degrees of freedom as fixed trees of
    correctly-rounded IEEE ops over identical integers.  The standard
    error term s²ᵢ/nᵢ is computed as (nᵢΣx²−(Σx)²)/(nᵢ²(nᵢ−1)) — one
    division of two exact integers per arm, so no float variance is
    ever accumulated.

    Scale notes: ONE map-side-combined conditional hash aggregate over
    the fact-dim join down to a single 6-sum row (reviewed SINGLE
    allowlist row — the q6-style scalar-result exchange); every
    reported value is per-row arithmetic on that 1-row frame."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    d38 = "decimal(38,0)"
    s = (
        o.join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment").isin(_SEG_A, _SEG_B))
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    is_a = F.col("seg") == _SEG_A
    is_b = F.col("seg") == _SEG_B
    m = s.agg(
        F.count(F.when(is_a, 1)).cast(d38).alias("na"),
        F.count(F.when(is_b, 1)).cast(d38).alias("nb"),
        F.sum(F.when(is_a, F.col("cents")).otherwise(0))
        .cast(d38)
        .alias("sa"),
        F.sum(F.when(is_b, F.col("cents")).otherwise(0))
        .cast(d38)
        .alias("sb"),
        F.sum(
            F.when(is_a, (F.col("cents") * F.col("cents")).cast(d38)).otherwise(
                F.lit(0).cast(d38)
            )
        )
        .cast(d38)
        .alias("qa"),
        F.sum(
            F.when(is_b, (F.col("cents") * F.col("cents")).cast(d38)).otherwise(
                F.lit(0).cast(d38)
            )
        )
        .cast(d38)
        .alias("qb"),
    )
    mean_a = F.col("sa").cast("double") / F.col("na").cast("double")
    mean_b = F.col("sb").cast("double") / F.col("nb").cast("double")
    se2_a = (F.col("na") * F.col("qa") - F.col("sa") * F.col("sa")).cast(
        "double"
    ) / (F.col("na") * F.col("na") * (F.col("na") - 1)).cast("double")
    se2_b = (F.col("nb") * F.col("qb") - F.col("sb") * F.col("sb")).cast(
        "double"
    ) / (F.col("nb") * F.col("nb") * (F.col("nb") - 1)).cast("double")
    return m.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(mean_a, 2).alias("mean_a_cents"),
        F.round(mean_b, 2).alias("mean_b_cents"),
        F.round(mean_a - mean_b, 2).alias("mean_diff_cents"),
        F.round((mean_a - mean_b) / F.sqrt(se2_a + se2_b), 6).alias(
            "t_stat"
        ),
        F.round(
            F.pow(se2_a + se2_b, 2)
            / (
                F.pow(se2_a, 2) / (F.col("na") - 1).cast("double")
                + F.pow(se2_b, 2) / (F.col("nb") - 1).cast("double")
            ),
            2,
        ).alias("df_welch"),
    )


@register(
    "agg_cramer_von_mises",
    # Binned two-sample Cramér–von Mises: T = Σ_k (cA_k+cB_k)·Δ_k² ·
    # nm/N² with Δ_k = FA_k − FB_k carried as the exact integer
    # numerator cumA·nB − cumB·nA (denominator nA·nB).  The weighted
    # square-sum is HUGEINT-exact; ONE float division chain at the end.
    # Complements agg_ks_test: CvM integrates the cdf gap (sensitive to
    # body differences) where KS takes its supremum (tail-sensitive).
    oracle=f"""
    WITH s AS (
        SELECT CAST(ROUND(o.o_totalprice * 100) AS BIGINT) // {_KS_BUCKET_CENTS}
                   AS bucket,
               c.c_mktsegment AS seg
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
    ), b AS (
        SELECT bucket,
               COUNT(*) FILTER (seg = '{_SEG_A}') AS c_a,
               COUNT(*) FILTER (seg = '{_SEG_B}') AS c_b
        FROM s GROUP BY bucket
    ), cum AS (
        SELECT bucket, c_a, c_b,
               SUM(c_a) OVER (ORDER BY bucket) AS cum_a,
               SUM(c_b) OVER (ORDER BY bucket) AS cum_b,
               SUM(c_a) OVER () AS n_a,
               SUM(c_b) OVER () AS n_b
        FROM b
    ), agg AS (
        SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
               CAST(MAX(n_b) AS BIGINT) AS n_b,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(SUM(CAST(c_a + c_b AS HUGEINT)
                        * (cum_a * n_b - cum_b * n_a)
                        * (cum_a * n_b - cum_b * n_a)) AS HUGEINT) AS wsq
        FROM cum
    )
    SELECT n_a, n_b, n_buckets,
           CAST(wsq AS DOUBLE) AS wsq_num,
           ROUND(CAST(wsq AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                 / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)),
                 6) AS cvm_stat
    FROM agg
    """,
)
def agg_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises statistic between the BUILDING and
    MACHINERY order-total distributions over the same $5k buckets as
    `agg_ks_test` — T = nm/N² · Σ_k (cA_k+cB_k)·(FA_k−FB_k)², the
    INTEGRATED cdf gap where KS takes the supremum, so CvM detects
    body-of-distribution differences a single extreme bucket would
    mask.  The cdf gap is carried as the exact integer numerator
    cumA·nB − cumB·nA and the weighted square-sum is decimal(38,0) /
    HUGEINT (envelope: N·(N²)² = N⁵ < 10³⁸ holds to N ≈ 4·10⁷
    filtered orders; past that, widen the buckets or normalize the
    carry — documented, not silent), with ONE float division chain at
    the end.

    Scale notes: identical physical shape to `agg_ks_test` — one
    fact-dim join, ONE hash aggregate to ≤100 price buckets, cumsum /
    total / final windows and the 1-row reduction all on that bucket
    rollup (reviewed SINGLE rows)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = (
        o.join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment").isin(_SEG_A, _SEG_B))
        .select(
            F.expr(
                f"CAST(ROUND(o_totalprice * 100) AS BIGINT) div {_KS_BUCKET_CENTS}"
            ).alias("bucket"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    b = s.groupBy("bucket").agg(
        F.count(F.when(F.col("seg") == _SEG_A, 1)).alias("c_a"),
        F.count(F.when(F.col("seg") == _SEG_B, 1)).alias("c_b"),
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = b.select(
        "c_a",
        "c_b",
        F.sum("c_a").over(w_cum).alias("cum_a"),
        F.sum("c_b").over(w_cum).alias("cum_b"),
        F.sum("c_a").over(w_all).alias("n_a"),
        F.sum("c_b").over(w_all).alias("n_b"),
    )
    d38 = "decimal(38,0)"
    dev = (
        F.col("cum_a").cast(d38) * F.col("n_b")
        - F.col("cum_b").cast(d38) * F.col("n_a")
    )
    agg = cum.agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum((F.col("c_a") + F.col("c_b")).cast(d38) * dev * dev)
        .cast(d38)
        .alias("wsq"),
    )
    return agg.select(
        "n_a",
        "n_b",
        "n_buckets",
        F.col("wsq").cast("double").alias("wsq_num"),
        F.round(
            F.col("wsq").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            / (
                (F.col("n_a") + F.col("n_b")).cast("double")
                * (F.col("n_a") + F.col("n_b")).cast("double")
            ),
            6,
        ).alias("cvm_stat"),
    )


#: ln fixed-point scale (nano-units) for the entropy-rate cells: the
#: per-transition contribution c_ab·(ln c_a − ln c_ab) becomes an exact
#: integer product, so the Σ over the |types|² matrix is exact.
_ENTR_SCALE = 1_000_000_000


@register(
    "events_entropy_rate",
    # Markov entropy rate of the per-user event-type chain: transition
    # counts from ONE lead window (the events_markov_transitions
    # shuffle), per-cell surprisal ln(c_a/c_ab) as nano-unit BIGINTs,
    # so row conditional entropies and the chain rate are exact integer
    # dot products with ONE float division at the end.
    oracle=f"""
    WITH seq AS (
        SELECT event_type AS a,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS b
        FROM events
    ), t AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM seq WHERE b IS NOT NULL GROUP BY 1, 2
    ), rowsum AS (
        SELECT a, b, c_ab,
               SUM(c_ab) OVER (PARTITION BY a) AS c_a,
               SUM(c_ab) OVER () AS total
        FROM t
    ), cell AS (
        SELECT a, b, c_ab, c_a, total,
               c_ab * CAST(ROUND((ln(CAST(c_a AS DOUBLE))
                                  - ln(CAST(c_ab AS DOUBLE)))
                                 * {_ENTR_SCALE}) AS BIGINT) AS h_nano
        FROM rowsum
    )
    SELECT a AS from_type, b AS to_type,
           CAST(c_ab AS BIGINT) AS c_ab,
           CAST(c_ab * 1000000 // c_a AS BIGINT) AS p_ppm,
           CAST(h_nano AS BIGINT) AS h_nano,
           ROUND(CAST(SUM(h_nano) OVER (PARTITION BY a) AS DOUBLE)
                 / CAST(c_a AS DOUBLE) / {_ENTR_SCALE}.0, 6)
               AS row_entropy_nats,
           ROUND(CAST(SUM(h_nano) OVER () AS DOUBLE)
                 / CAST(total AS DOUBLE) / {_ENTR_SCALE}.0, 6)
               AS entropy_rate_nats
    FROM cell ORDER BY from_type, to_type
    """,
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain — how many
    nats of surprise the NEXT event carries given the current one,
    with the empirical transition distribution as the model: H =
    −Σ_ab (c_ab/total)·ln(c_ab/c_a), plus each state's conditional
    entropy H(next|a) — the predictability readout behind
    next-event-prediction models and session-complexity scoring
    (uniform 5-type chain ⇒ ln 5 ≈ 1.60944; the fixture reads
    ≈1.60871, near-uniform but decisively below, and per-row
    entropies vary).
    Every per-cell surprisal ln(c_a/c_ab) is a nano-unit BIGINT, so
    row and chain sums are exact integer dot products (Σ over the
    ≤|types|² matrix) and each reported value is ONE float division —
    no order-dependent float accumulation.

    Scale notes: sequence construction is ONE lead window on the
    user_id partitioning — the `events_markov_transitions` shuffle,
    the only corpus-grain work; everything downstream (row sums,
    surprisals, entropy windows) runs on the ≤25-row transition
    rollup (reviewed SINGLE rows)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).where(F.col("b").isNotNull())
    t = seq.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    w_row = Window.partitionBy("a")
    w_all = Window.partitionBy()
    rowsum = t.select(
        "a",
        "b",
        "c_ab",
        F.sum("c_ab").over(w_row).alias("c_a"),
        F.sum("c_ab").over(w_all).alias("total"),
    )
    h_nano = (
        F.col("c_ab")
        * F.round(
            (
                F.log(F.col("c_a").cast("double"))
                - F.log(F.col("c_ab").cast("double"))
            )
            * _ENTR_SCALE
        ).cast("long")
    )
    cell = rowsum.withColumn("h_nano", h_nano)
    return cell.select(
        F.col("a").alias("from_type"),
        F.col("b").alias("to_type"),
        F.col("c_ab").cast("long").alias("c_ab"),
        F.expr("CAST(c_ab * 1000000 div c_a AS BIGINT)").alias("p_ppm"),
        F.col("h_nano").cast("long").alias("h_nano"),
        F.round(
            F.sum("h_nano").over(w_row).cast("double")
            / F.col("c_a").cast("double")
            / float(_ENTR_SCALE),
            6,
        ).alias("row_entropy_nats"),
        F.round(
            F.sum("h_nano").over(w_all).cast("double")
            / F.col("total").cast("double")
            / float(_ENTR_SCALE),
            6,
        ).alias("entropy_rate_nats"),
    ).orderBy("from_type", "to_type")


#: Jackknife fixed-point scale (micro-units) — every leave-one-out
#: ratio is floored to an integer immediately after its ONE division,
#: so the pseudo-value variance is exact integer arithmetic.
_JK_SCALE = 1_000_000


@register(
    "agg_jackknife_ratio",
    # Delete-one-GROUP jackknife for a ratio statistic (corpus weighted
    # mean discount = Σ(disc·price) / Σ price): per-nation int sums
    # from one joined aggregate; each leave-one-out ratio is ONE float
    # division floored to micro-units; the jackknife SE over the ≤25
    # pseudo-values is exact integer variance arithmetic + one sqrt.
    oracle=f"""
    WITH g AS (
        SELECT n.n_name AS nation,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * l.l_discount * 100)
                        AS BIGINT)) AS BIGINT) AS a,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS b
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(b) AS BIGINT) AS tb,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM g
    ), loo AS (
        SELECT nation, a, b, n,
               CAST(floor(CAST(ta AS DOUBLE) / tb * {_JK_SCALE})
                    AS BIGINT) AS theta_micro,
               CAST(floor(CAST(ta - a AS DOUBLE) / (tb - b) * {_JK_SCALE})
                    AS BIGINT) AS theta_loo_micro
        FROM g, tot
    ), jk AS (
        SELECT nation, a, b, theta_micro, theta_loo_micro,
               n,
               SUM(theta_loo_micro) OVER () AS s1,
               SUM(theta_loo_micro * theta_loo_micro) OVER () AS s2
        FROM loo
    )
    SELECT nation,
           a AS disc_cents, b AS price_cents,
           theta_micro, theta_loo_micro,
           ROUND(sqrt(CAST((n - 1) AS DOUBLE) / n
                      * (CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * n))), 2)
               AS jk_se_micro
    FROM jk ORDER BY nation
    """,
)
def agg_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife standard error for a RATIO statistic
    — the corpus weighted mean discount Σ(disc·price)/Σprice, whose
    variance no closed-form single-pass formula gives (ratio
    estimators are biased; the jackknife is the standard fix) — with
    nations as the delete groups: the production pattern where the
    resampling unit is a shard/stratum, not a row, so the whole
    procedure needs only the ≤25-row per-group sufficient-sum rollup.
    Complements `agg_bootstrap_ci` (resampling rows) with the
    grouped-deletion method.  Each leave-one-out ratio is ONE float
    division floored to micro-units; the pseudo-value variance
    n·Σθ²−(Σθ)² is exact integer arithmetic; SE needs one sqrt.

    Scale notes: corpus-grain work is the lineitem→orders→customer
    fact join (dims broadcast) feeding ONE map-combined nation
    aggregate; everything after runs on the ≤25-row group rollup
    (reviewed SINGLE/BNL rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    g = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(ROUND(l_extendedprice * l_discount * 100)"
                    " AS BIGINT)"
                )
            ).alias("a"),
            F.sum(
                F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
            ).alias("b"),
        )
    )
    tot = g.agg(
        F.sum("a").alias("ta"),
        F.sum("b").alias("tb"),
        F.count(F.lit(1)).alias("n"),
    )
    loo = g.join(F.broadcast(tot)).select(
        "nation",
        "a",
        "b",
        "n",
        F.floor(
            F.col("ta").cast("double") / F.col("tb") * _JK_SCALE
        )
        .cast("long")
        .alias("theta_micro"),
        F.floor(
            (F.col("ta") - F.col("a")).cast("double")
            / (F.col("tb") - F.col("b"))
            * _JK_SCALE
        )
        .cast("long")
        .alias("theta_loo_micro"),
    )
    w_all = Window.partitionBy()
    jk = loo.select(
        "nation",
        "a",
        "b",
        "n",
        "theta_micro",
        "theta_loo_micro",
        F.sum("theta_loo_micro").over(w_all).alias("s1"),
        F.sum(F.col("theta_loo_micro") * F.col("theta_loo_micro"))
        .over(w_all)
        .alias("s2"),
    )
    return jk.select(
        "nation",
        F.col("a").alias("disc_cents"),
        F.col("b").alias("price_cents"),
        "theta_micro",
        "theta_loo_micro",
        F.round(
            F.sqrt(
                (F.col("n") - 1).cast("double")
                / F.col("n")
                * (
                    (
                        F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
                    ).cast("double")
                    / (F.col("n") * F.col("n"))
                )
            ),
            2,
        ).alias("jk_se_micro"),
    ).orderBy("nation")


@register(
    "events_burstiness_index",
    # Goh–Barabási burstiness B = (σ−μ)/(σ+μ) and the memory
    # coefficient (lag-1 gap autocorrelation) per user, each from
    # integer gap-moment carries with ONE sqrt-division floored to
    # micro-units; the readout is the B-bin distribution — bursty
    # users (B→1) vs metronomes (B→−1) vs Poisson (B≈0).
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(epoch_us(ts) // 1000000 AS BIGINT)
               - LAG(CAST(epoch_us(ts) // 1000000 AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
    ), u AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(gap) AS BIGINT) AS s,
               CAST(SUM(gap * gap) AS BIGINT) AS sq
        FROM seq WHERE gap IS NOT NULL GROUP BY 1 HAVING COUNT(*) >= 8
    ), b AS (
        SELECT user_id, n,
               CAST(floor((sqrt(CAST(n * sq - s * s AS DOUBLE)) - s)
                          / (sqrt(CAST(n * sq - s * s AS DOUBLE)) + s)
                          * 1000000) AS BIGINT) AS b_micro
        FROM u WHERE n * sq - s * s > 0
    )
    SELECT CAST(floor(CAST(b_micro AS DOUBLE) / 100000) AS BIGINT)
               AS b_bin,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(floor(CAST(SUM(b_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS mean_b_micro,
           CAST(SUM(n) AS BIGINT) AS n_gaps
    FROM b GROUP BY 1 ORDER BY b_bin
    """,
)
def events_burstiness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási burstiness of per-user interarrival times: B =
    (σ−μ)/(σ+μ) ∈ (−1, 1) — the scale-free activity-pattern readout
    (B→1 bursty, B≈0 Poisson, B→−1 periodic) used for bot/human
    separation and session-model selection.  σ and μ come from integer
    gap-moment carries (n, Σg, Σg²), so B = (√(nΣg²−S²) − S)/
    (√(nΣg²−S²) + S) needs exactly ONE sqrt and ONE division per
    user, floored to micro-units; users need ≥ 8 gaps (below that B is
    estimator noise — the small-n bias is the documented caveat of the
    original paper).  The readout is the 0.1-wide B-bin histogram —
    the population's activity-pattern fingerprint.

    Scale notes: ONE lag window on the user_id partitioning (the
    `interarrival_stats` shuffle) feeding ONE user-grain aggregate;
    the histogram is a ≤20-row rollup.  The fixture's md5-uniform
    timestamps read B ≈ 0 (exponential-ish gaps, σ≈μ) with real
    spread across users — decisive and truthful."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = epoch_seconds("ts")
    seq = e.select(
        "user_id", (sec - F.lag(sec).over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    u = (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("gap").alias("s"),
            F.sum(F.col("gap") * F.col("gap")).alias("sq"),
        )
        .where(F.col("n") >= 8)
    )
    var_n = (F.col("n") * F.col("sq") - F.col("s") * F.col("s")).cast(
        "double"
    )
    b = u.where(
        F.col("n") * F.col("sq") - F.col("s") * F.col("s") > 0
    ).select(
        "n",
        F.floor(
            (F.sqrt(var_n) - F.col("s"))
            / (F.sqrt(var_n) + F.col("s"))
            * 1_000_000
        )
        .cast("long")
        .alias("b_micro"),
    )
    # floor (not `div`) everywhere a NEGATIVE b_micro can appear:
    # Spark's div truncates toward zero while DuckDB's // floors, so
    # truncation semantics would split the B<0 bins differently.
    return (
        b.groupBy(
            F.floor(F.col("b_micro").cast("double") / 100000)
            .cast("long")
            .alias("b_bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.floor(
                F.sum("b_micro").cast("double") / F.count(F.lit(1))
            )
            .cast("long")
            .alias("mean_b_micro"),
            F.sum("n").cast("long").alias("n_gaps"),
        )
        .orderBy("b_bin")
    )


@register(
    "agg_ttest_paired",
    # Paired t-test on per-user (pre, post) spend around the global
    # median event date: differences are integer cents, the t statistic
    # is ONE fixed IEEE tree over (n, Σd, Σd²) — t = d̄/(s_d/√n)
    # algebraically rearranged to Σd·√(n−1) / √(nΣd²−(Σd)²) so no
    # intermediate variance float ever accumulates.
    oracle="""
    WITH cut AS (
        SELECT CAST(MIN(ts) AS DATE)
               + CAST((CAST(MAX(ts) AS DATE)
                       - CAST(MIN(ts) AS DATE)) // 2 AS INTEGER)
                   AS mid
        FROM events
    ), u AS (
        SELECT user_id,
               SUM(CASE WHEN CAST(ts AS DATE) < mid
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS pre,
               SUM(CASE WHEN CAST(ts AS DATE) >= mid
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS post
        FROM events, cut GROUP BY 1
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(post - pre) AS BIGINT) AS sd,
               CAST(SUM((post - pre) * (post - pre)) AS HUGEINT) AS sdd,
               CAST(SUM(pre) AS BIGINT) AS spre,
               CAST(SUM(post) AS BIGINT) AS spost
        FROM u
    )
    SELECT n, spre AS pre_cents, spost AS post_cents, sd AS sum_diff_cents,
           ROUND(CAST(sd AS DOUBLE) * sqrt(CAST(n - 1 AS DOUBLE))
                 / sqrt(CAST(n * sdd - CAST(sd AS HUGEINT) * sd
                             AS DOUBLE)), 6) AS t_paired
    FROM s
    """,
)
def agg_ttest_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test of per-user spend, second half of the observation
    window vs the first (paired at the USER, the design that removes
    between-user variance — the within-subjects counterpart of
    `agg_welch_ttest`'s independent-samples test, completing the
    parametric family).  Each user's (pre, post) cents come from ONE
    conditional-sum aggregate around the global median date; the
    statistic is algebraically rearranged to t = Σd·√(n−1) /
    √(nΣd²−(Σd)²) so it is ONE fixed IEEE tree over exact integer
    sums — no float variance accumulation, no intermediate mean.

    Scale notes: 1-row date-cut broadcast (the `events_ab_cuped`
    horizon pattern) → ONE map-combined user-grain aggregate (the
    corpus work) → a 1-row five-sum frame (reviewed SINGLE); the
    t statistic is per-row arithmetic on it."""
    e = load_table(spark, sf_dir, "events")
    cut = e.agg(
        F.expr(
            "date_add(MIN(CAST(ts AS DATE)),"
            " CAST(datediff(MAX(CAST(ts AS DATE)),"
            " MIN(CAST(ts AS DATE))) div 2 AS INT))"
        ).alias("mid")
    )
    u = (
        e.join(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.to_date("ts") < F.col("mid"),
                    F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
                ).otherwise(0)
            ).alias("pre"),
            F.sum(
                F.when(
                    F.to_date("ts") >= F.col("mid"),
                    F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
                ).otherwise(0)
            ).alias("post"),
        )
    )
    d38 = "decimal(38,0)"
    s = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("post") - F.col("pre")).cast("long").alias("sd"),
        F.sum(
            ((F.col("post") - F.col("pre")) * (F.col("post") - F.col("pre"))).cast(
                d38
            )
        )
        .cast(d38)
        .alias("sdd"),
        F.sum("pre").cast("long").alias("spre"),
        F.sum("post").cast("long").alias("spost"),
    )
    return s.select(
        "n",
        F.col("spre").alias("pre_cents"),
        F.col("spost").alias("post_cents"),
        F.col("sd").alias("sum_diff_cents"),
        F.round(
            F.col("sd").cast("double")
            * F.sqrt((F.col("n") - 1).cast("double"))
            / F.sqrt(
                (
                    F.col("n").cast(d38) * F.col("sdd")
                    - F.col("sd").cast(d38) * F.col("sd").cast(d38)
                ).cast("double")
            ),
            6,
        ).alias("t_paired"),
    )


#: Two-sided alpha=0.05 / power=0.80 normal quantiles — LITERAL
#: constants on both engines (z_{0.975}, z_{0.80}), the standard
#: power-analysis pair.
_PWR_ZA = 1.959964
_PWR_ZB = 0.841621


@register(
    "agg_power_analysis",
    # A/B power analysis on the Welch fixture (BUILDING vs MACHINERY
    # order totals): per-arm int128 moment sums from ONE conditional
    # agg; MDE = (z_a+z_b)·SE and required-n-per-arm from the observed
    # effect — each ONE fixed IEEE tree over identical integers and
    # two literal z constants.
    oracle=f"""
    WITH s AS (
        SELECT
            CAST(COUNT(*) FILTER (c.c_mktsegment = '{_SEG_A}') AS BIGINT)
                AS n_a,
            CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                 FILTER (c.c_mktsegment = '{_SEG_A}') AS HUGEINT) AS sa,
            CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                     * CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                 FILTER (c.c_mktsegment = '{_SEG_A}') AS HUGEINT) AS sqa,
            CAST(COUNT(*) FILTER (c.c_mktsegment = '{_SEG_B}') AS BIGINT)
                AS n_b,
            CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                 FILTER (c.c_mktsegment = '{_SEG_B}') AS HUGEINT) AS sb,
            CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                     * CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                 FILTER (c.c_mktsegment = '{_SEG_B}') AS HUGEINT) AS sqb
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
    )
    SELECT n_a, n_b,
           ROUND(CAST(sa AS DOUBLE) / n_a
                 - CAST(sb AS DOUBLE) / n_b, 2) AS observed_diff_cents,
           ROUND(({_PWR_ZA} + {_PWR_ZB})
                 * sqrt(CAST(n_a * sqa - sa * sa AS DOUBLE)
                          / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1))
                        + CAST(n_b * sqb - sb * sb AS DOUBLE)
                          / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1))), 2)
               AS mde_cents,
           CAST(CEIL(({_PWR_ZA} + {_PWR_ZB}) * ({_PWR_ZA} + {_PWR_ZB})
                 * (CAST(n_a * sqa - sa * sa AS DOUBLE)
                      / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1))
                    + CAST(n_b * sqb - sb * sb AS DOUBLE)
                      / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1)))
                 * (CAST(n_a + n_b AS DOUBLE) / 2)
                 / ((CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b)
                    * (CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b)))
               AS BIGINT) AS n_required_per_arm
    FROM s
    """,
)
def agg_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment power analysis on the `agg_welch_ttest` fixture:
    the minimum detectable effect at alpha = 0.05 (two-sided) / power
    = 0.80 given the current arm sizes — MDE = (z_α/2 + z_β)·SE with
    SE from exact int128 per-arm moment sums — and the sample size
    per arm that would make the OBSERVED difference detectable (the
    "how much longer must this experiment run" readout, scaling the
    current per-observation variance to the observed effect).  The z
    quantiles are shared LITERAL constants; every reported value is
    one fixed IEEE tree over identical integers, completing the
    experimentation family (lift → CUPED → Welch → power).

    Scale notes: ONE map-side-combined conditional aggregate over the
    fact-dim join to a 1-row six-sum frame (reviewed SINGLE); all
    readouts are per-row arithmetic on it."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
    d38 = "decimal(38,0)"
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment").isin(_SEG_A, _SEG_B))
        .select(F.col("c_mktsegment").alias("seg"), cents.alias("x"))
    )
    s = j.agg(
        F.count(F.when(F.col("seg") == _SEG_A, 1)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("seg") == _SEG_A, F.col("x")).otherwise(0))
        .cast(d38)
        .alias("sa"),
        F.sum(
            F.when(F.col("seg") == _SEG_A, F.col("x") * F.col("x")).otherwise(
                0
            ).cast(d38)
        )
        .cast(d38)
        .alias("sqa"),
        F.count(F.when(F.col("seg") == _SEG_B, 1)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("seg") == _SEG_B, F.col("x")).otherwise(0))
        .cast(d38)
        .alias("sb"),
        F.sum(
            F.when(F.col("seg") == _SEG_B, F.col("x") * F.col("x")).otherwise(
                0
            ).cast(d38)
        )
        .cast(d38)
        .alias("sqb"),
    )
    se2 = (
        (F.col("n_a") * F.col("sqa") - F.col("sa") * F.col("sa")).cast(
            "double"
        )
        / (
            F.col("n_a").cast("double")
            * F.col("n_a")
            * (F.col("n_a") - 1)
        )
    ) + (
        (F.col("n_b") * F.col("sqb") - F.col("sb") * F.col("sb")).cast(
            "double"
        )
        / (
            F.col("n_b").cast("double")
            * F.col("n_b")
            * (F.col("n_b") - 1)
        )
    )
    diff = F.col("sa").cast("double") / F.col("n_a") - F.col("sb").cast(
        "double"
    ) / F.col("n_b")
    z = _PWR_ZA + _PWR_ZB
    return s.select(
        "n_a",
        "n_b",
        F.round(diff, 2).alias("observed_diff_cents"),
        F.round(F.lit(z) * F.sqrt(se2), 2).alias("mde_cents"),
        F.ceil(
            F.lit(z * z)
            * se2
            * ((F.col("n_a") + F.col("n_b")).cast("double") / 2)
            / (diff * diff)
        )
        .cast("long")
        .alias("n_required_per_arm"),
    )


_MSTAT_ITERS = 5


def _oracle_markov_stationary() -> str:
    """Unrolled power iteration on the event-type transition matrix —
    the graph_pagerank fixed-iteration codegen pattern on the ≤|types|²
    rollup."""
    steps = []
    prev = "p0"
    for i in range(1, _MSTAT_ITERS + 1):
        steps.append(
            f"""p{i} AS (
        SELECT tn.b AS state, SUM(tn.p * {prev}.pi) AS pi
        FROM tn JOIN {prev} ON tn.a = {prev}.state
        GROUP BY tn.b
    )"""
        )
        prev = f"p{i}"
    return f"""
    WITH seq AS (
        SELECT event_type AS a,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS b
        FROM events
    ), t AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
        FROM seq WHERE b IS NOT NULL GROUP BY 1, 2
    ), tn AS (
        SELECT a, b, CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY a) AS p
        FROM t
    ), emp AS (
        SELECT a AS emp_state,
               CAST(SUM(c) * 1000000 // (SELECT SUM(c) FROM t) AS BIGINT)
                   AS empirical_ppm
        FROM t GROUP BY a
    ), states AS (
        SELECT DISTINCT a AS state FROM t
    ), p0 AS (
        SELECT state, 1.0 / (SELECT COUNT(*) FROM states) AS pi
        FROM states
    ), {", ".join(steps)}
    SELECT p{_MSTAT_ITERS}.state,
           ROUND(p{_MSTAT_ITERS}.pi * 1000000, 4) AS stationary_ppm,
           emp.empirical_ppm,
           ROUND(abs(p{_MSTAT_ITERS}.pi * 1000000 - emp.empirical_ppm), 4)
               AS gap_ppm
    FROM p{_MSTAT_ITERS} JOIN emp ON p{_MSTAT_ITERS}.state = emp.emp_state
    ORDER BY state
    """


@register("events_markov_stationary", oracle=_oracle_markov_stationary())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain
    by five unrolled power iterations from the uniform start — where
    does the journey settle, independent of where users begin — placed
    NEXT TO the empirical state frequencies so the gap (mixing
    already-converged vs transient structure) is the readout; the
    chain-theory sibling of `events_entropy_rate` over the same
    transition matrix.  Five iterations are unrolled IDENTICALLY on
    both engines (the `graph_pagerank` fixed-iteration codegen-oracle
    pattern), double arithmetic throughout with ROUND 4 absorbing
    last-ulp drift; transition counts and empirical frequencies are
    exact integers.

    Scale notes: the ONE corpus-grain pass is the lead window on the
    user_id partitioning (shared shape with `events_markov_transitions`
    / `events_entropy_rate`); every iteration is a join + aggregate on
    the ≤|types|²-row normalized matrix (reviewed SINGLE rows)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).where(F.col("b").isNotNull())
    from ..common import stage

    # Stage the transition rollup: the five power iterations plus
    # emp/states all consume it, and unlike the single-consumer cases
    # ReuseExchange does not cover the iterative joins — measured
    # 7.7 s → 5.4 s at sf1 (the graph_pagerank lineage-truncation
    # discipline; staging the OTHER r8 rollups measured neutral to
    # negative and was reverted — ReuseExchange already dedupes their
    # identical agg subtrees).
    t = stage(seq.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c")))
    w_row = Window.partitionBy("a")
    w_all = Window.partitionBy()
    tn = t.select(
        "a",
        "b",
        (F.col("c").cast("double") / F.sum("c").over(w_row)).alias("p"),
    )
    emp = t.select(
        "a",
        F.col("c"),
        F.sum("c").over(w_all).alias("tot"),
    ).groupBy("a").agg(
        F.expr("CAST(SUM(c) * 1000000 div MAX(tot) AS BIGINT)").alias(
            "empirical_ppm"
        )
    )
    states = t.select(F.col("a").alias("state")).distinct()
    n_states = states.count()
    pi = states.select("state", F.lit(1.0 / n_states).alias("pi"))
    for _ in range(_MSTAT_ITERS):
        pi = (
            tn.join(pi, tn.a == pi.state)
            .groupBy(F.col("b").alias("state2"))
            .agg(F.sum(F.col("p") * F.col("pi")).alias("pi"))
            .select(F.col("state2").alias("state"), "pi")
        )
    return (
        pi.join(emp, pi.state == emp.a)
        .select(
            "state",
            F.round(F.col("pi") * 1000000, 4).alias("stationary_ppm"),
            "empirical_ppm",
            F.round(
                F.abs(F.col("pi") * 1000000 - F.col("empirical_ppm")), 4
            ).alias("gap_ppm"),
        )
        .orderBy("state")
    )


# --------------------------------------------------------------------------
# r9 batch (§2.38): two-sample survival comparison + panel experimentation.
# --------------------------------------------------------------------------

#: Log-rank groups.  r9 audit: l_shipdate is INDEPENDENT of
#: o_orderdate in the fixture (delays uniform ±2400 days; the apparent
#: 54-vs-26-day per-priority mean gap is tail noise that scrambles
#: across SFs), so the two groups share one survival curve and the
#: fixture readout is a CORRECT NULL (chi2 ~ O(1)).  The estimator
#: itself is verified by the pytest, which injects a group-dependent
#: delay shift and asserts the test flags it — the same
#: null-fixture + injected-effect pattern as `agg_fdr_bh` and
#: `orders_diff_in_diff`.
_LR_GROUP_A = "1-URGENT"
_LR_GROUP_B = "3-MEDIUM"

#: Diff-in-diff design: segment-vs-segment panel around a mid-corpus
#: intervention date (fixture orders span 1995-01..2001-08; the r9
#: first cut used 1995-01-01 and audited with an EMPTY pre-period —
#: NaN cells — moved to the span midpoint).  Order totals are segment-independent by fixture
#: construction, so the true effect is ZERO — the operator's pytest
#: injects a shift and asserts recovery; the fixture run documents the
#: correct null (|t| small, DiD ~ 0).
_DID_TREAT = "BUILDING"
_DID_CTRL = "MACHINERY"
_DID_CUT = "1998-01-01"


@register(
    "orders_logrank_delay",
    # Two-group log-rank test on days-to-first-shipment: exact integer
    # death/at-risk tables at day grain (rollup bounded by the delay
    # RANGE), the hypergeometric expectation/variance per day as floats
    # ON that rollup, chi2 as the terminal readout.
    oracle=f"""
    WITH surv AS (
        SELECT CASE WHEN o.o_orderpriority = '{_LR_GROUP_A}' THEN 1 ELSE 0 END
                   AS grp_a,
               DATEDIFF('day', o.o_orderdate, l.l_shipdate) AS t
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority IN ('{_LR_GROUP_A}', '{_LR_GROUP_B}')
          AND l.l_shipdate >= o.o_orderdate
    ), per_day AS (
        SELECT t, SUM(grp_a) AS d1, SUM(1 - grp_a) AS d2
        FROM surv GROUP BY t
    ), risk AS (
        SELECT t, d1, d2,
               SUM(d1) OVER () - COALESCE(SUM(d1) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS n1,
               SUM(d2) OVER () - COALESCE(SUM(d2) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS n2
        FROM per_day
    ), terms AS (
        SELECT d1, d2, n1, n2, d1 + d2 AS d, n1 + n2 AS n FROM risk
    )
    SELECT CAST(SUM(d1) AS BIGINT) AS events_a,
           CAST(SUM(d2) AS BIGINT) AS events_b,
           ROUND(SUM(CAST(d * n1 AS DOUBLE) / n), 4) AS expected_a,
           ROUND(SUM(CAST(d1 AS DOUBLE)
                     - CAST(d * n1 AS DOUBLE) / n), 4) AS o_minus_e,
           ROUND(SUM(CASE WHEN n > 1 THEN
                     CAST(d AS DOUBLE) * n1 * n2 * (n - d)
                     / (CAST(n AS DOUBLE) * n * (n - 1))
                 ELSE 0 END), 4) AS variance,
           ROUND(POW(SUM(CAST(d1 AS DOUBLE) - CAST(d * n1 AS DOUBLE) / n), 2)
                 / SUM(CASE WHEN n > 1 THEN
                       CAST(d AS DOUBLE) * n1 * n2 * (n - d)
                       / (CAST(n AS DOUBLE) * n * (n - 1))
                   ELSE 0 END), 4) AS chi2
    FROM terms
    """,
)
def orders_logrank_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test comparing forward shipping latency
    (lineitems shipped ON/AFTER their order date — the meaningful
    latency population in a fixture whose ship dates are otherwise
    unanchored) between '1-URGENT' and '3-MEDIUM' orders — the
    standard nonparametric comparison of two survival curves, the
    decision procedure for the curves `events_kaplan_meier` draws.
    At each distinct latency day: exact deaths d1/d2 and at-risk
    counts n1/n2, hypergeometric expectation d*n1/n and variance
    d*n1*n2*(n-d)/(n^2*(n-1)); chi2 = (O1-E1)^2 / sum(V).

    Fixture honesty (r9 audit): l_shipdate is INDEPENDENT of both
    o_orderdate and priority in the synthetic data, so the two latency
    curves coincide and the readout is a CORRECT NULL (chi2 ~ O(1),
    far below the 3.84 = chi2_{{1,0.05}} line).  The estimator is
    verified by the pytest, which injects a priority-dependent shift
    and asserts chi2 blows past the line — null fixture + injected
    effect, the causal-operator audit pattern (SURVEY §8).

    Scale notes: the corpus pass is ONE fact-dim join + hash aggregate
    to the day-grain rollup (bounded by the latency RANGE, ~2400 rows
    at any SF); at-risk counts are suffix sums via two windows on that
    rollup (reviewed SINGLE), and the E/V terms are floats on rollup
    rows, ROUND(4)-absorbed."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    surv = (
        o.where(F.col("o_orderpriority").isin(_LR_GROUP_A, _LR_GROUP_B))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.when(F.col("o_orderpriority") == _LR_GROUP_A, 1)
            .otherwise(0)
            .alias("grp_a"),
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("t"),
        )
    )
    per_day = surv.groupBy("t").agg(
        F.sum("grp_a").alias("d1"), F.sum(F.lit(1) - F.col("grp_a")).alias("d2")
    )
    w_all = Window.partitionBy()
    w_before = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_day.select(
        "t",
        "d1",
        "d2",
        (
            F.sum("d1").over(w_all)
            - F.coalesce(F.sum("d1").over(w_before), F.lit(0))
        ).alias("n1"),
        (
            F.sum("d2").over(w_all)
            - F.coalesce(F.sum("d2").over(w_before), F.lit(0))
        ).alias("n2"),
    )
    terms = risk.select(
        "d1",
        "d2",
        "n1",
        "n2",
        (F.col("d1") + F.col("d2")).alias("d"),
        (F.col("n1") + F.col("n2")).alias("n"),
    )
    e_term = F.col("d").cast("double") * F.col("n1") / F.col("n")
    v_term = F.when(
        F.col("n") > 1,
        F.col("d").cast("double")
        * F.col("n1")
        * F.col("n2")
        * (F.col("n") - F.col("d"))
        / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1)),
    ).otherwise(F.lit(0.0))
    return terms.agg(
        F.sum("d1").cast("long").alias("events_a"),
        F.sum("d2").cast("long").alias("events_b"),
        F.round(F.sum(e_term), 4).alias("expected_a"),
        F.round(F.sum(F.col("d1").cast("double") - e_term), 4).alias("o_minus_e"),
        F.round(F.sum(v_term), 4).alias("variance"),
        F.round(
            F.pow(F.sum(F.col("d1").cast("double") - e_term), F.lit(2))
            / F.sum(v_term),
            4,
        ).alias("chi2"),
    )


@register(
    "orders_diff_in_diff",
    # 2x2 difference-in-differences on order totals (cents-exact sums;
    # intervention at the 1998-01-01 span midpoint — the 1995-01-01 first
    # cut audited with an empty pre-period
    # per cell): DiD = (T_post - T_pre) - (C_post - C_pre) of cell
    # means, SE from per-cell variances (DECIMAL(38,0) sum-of-squares),
    # t = DiD / SE.  Cell stats are exact integers until the four
    # terminal mean divisions.
    oracle=f"""
    WITH cells AS (
        SELECT CASE WHEN c.c_mktsegment = '{_DID_TREAT}' THEN 1 ELSE 0 END
                   AS treat,
               CASE WHEN o.o_orderdate >= DATE '{_DID_CUT}' THEN 1 ELSE 0 END
                   AS post,
               COUNT(*) AS n,
               SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS s,
               SUM(CAST(ROUND(o.o_totalprice * 100) AS HUGEINT)
                   * CAST(ROUND(o.o_totalprice * 100) AS HUGEINT)) AS ss
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('{_DID_TREAT}', '{_DID_CTRL}')
        GROUP BY 1, 2
    ), wide AS (
        SELECT
          MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n_t1,
          MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n_t0,
          MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n_c1,
          MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n_c0,
          MAX(CASE WHEN treat = 1 AND post = 1 THEN s END) AS s_t1,
          MAX(CASE WHEN treat = 1 AND post = 0 THEN s END) AS s_t0,
          MAX(CASE WHEN treat = 0 AND post = 1 THEN s END) AS s_c1,
          MAX(CASE WHEN treat = 0 AND post = 0 THEN s END) AS s_c0,
          SUM((CAST(ss AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
              / (CAST(n AS DOUBLE) - 1) / n) AS se2
        FROM cells
    )
    SELECT CAST(n_t1 AS BIGINT) AS n_t1, CAST(n_t0 AS BIGINT) AS n_t0,
           CAST(n_c1 AS BIGINT) AS n_c1, CAST(n_c0 AS BIGINT) AS n_c0,
           ROUND((CAST(s_t1 AS DOUBLE) / n_t1 - CAST(s_t0 AS DOUBLE) / n_t0)
                 - (CAST(s_c1 AS DOUBLE) / n_c1
                    - CAST(s_c0 AS DOUBLE) / n_c0), 2) AS did_cents,
           ROUND(SQRT(se2), 2) AS se_cents,
           ROUND(((CAST(s_t1 AS DOUBLE) / n_t1 - CAST(s_t0 AS DOUBLE) / n_t0)
                  - (CAST(s_c1 AS DOUBLE) / n_c1
                     - CAST(s_c0 AS DOUBLE) / n_c0)) / SQRT(se2), 4)
               AS t_stat
    FROM wide
    """,
)
def orders_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 difference-in-differences: treatment segment BUILDING vs
    control MACHINERY, intervention 1998-01-01, outcome = order total
    cents — the panel-experimentation workhorse when randomization
    isn't available and both groups share a time trend.  DiD =
    (treat_post − treat_pre) − (ctrl_post − ctrl_pre) of cell means;
    SE = sqrt(Σ s²_cell/n_cell) (unequal-variance, the Welch-style
    conservative form); t = DiD/SE.

    Fixture: order totals are segment- and date-independent by
    construction, so the TRUE effect is zero — the run documents the
    correct null (|t| ≈ O(1), DiD within noise of 0).  The estimator
    itself is verified by the pytest, which injects a known post-period
    shift into the treatment cell and asserts DiD recovers it; a
    constructed-null fixture readout plus an injected-effect test is
    the honest pair for causal estimators (same pattern as the NB
    quality gate's unlearnable-label audit, SURVEY §8 r8).

    Scale notes: ONE fact-dim join + hash aggregate to the 4-cell
    rollup carrying exact cents sums and DECIMAL(38,0) sums of
    squares; every division/sqrt is terminal on that rollup,
    ROUND-absorbed."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment").isin(_DID_TREAT, _DID_CTRL))
        .groupBy(
            F.when(F.col("c_mktsegment") == _DID_TREAT, 1)
            .otherwise(0)
            .alias("treat"),
            F.when(F.col("o_orderdate") >= F.lit(_DID_CUT).cast("date"), 1)
            .otherwise(0)
            .alias("post"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("s"),
            F.sum(
                F.round(F.col("o_totalprice") * 100)
                .cast("decimal(38,0)")
                * F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")
            ).alias("ss"),
        )
    )

    def cell(col: str, t: int, p: int):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col(col))
        )

    wide = cells.agg(
        cell("n", 1, 1).alias("n_t1"),
        cell("n", 1, 0).alias("n_t0"),
        cell("n", 0, 1).alias("n_c1"),
        cell("n", 0, 0).alias("n_c0"),
        cell("s", 1, 1).alias("s_t1"),
        cell("s", 1, 0).alias("s_t0"),
        cell("s", 0, 1).alias("s_c1"),
        cell("s", 0, 0).alias("s_c0"),
        F.sum(
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
            )
            / (F.col("n").cast("double") - 1)
            / F.col("n")
        ).alias("se2"),
    )
    did = (
        F.col("s_t1").cast("double") / F.col("n_t1")
        - F.col("s_t0").cast("double") / F.col("n_t0")
    ) - (
        F.col("s_c1").cast("double") / F.col("n_c1")
        - F.col("s_c0").cast("double") / F.col("n_c0")
    )
    return wide.select(
        F.col("n_t1").cast("long").alias("n_t1"),
        F.col("n_t0").cast("long").alias("n_t0"),
        F.col("n_c1").cast("long").alias("n_c1"),
        F.col("n_c0").cast("long").alias("n_c0"),
        F.round(did, 2).alias("did_cents"),
        F.round(F.sqrt(F.col("se2")), 2).alias("se_cents"),
        F.round(did / F.sqrt(F.col("se2")), 4).alias("t_stat"),
    )


#: Pinball-loss evaluation: train/test split date and the quantiles
#: evaluated (ppm) — named so the oracle embeds identical literals.
_PIN_SPLIT = "1999-01-01"
_PIN_QUANTILES = (500_000, 900_000)


@register(
    "agg_pinball_loss",
    # Quantile-forecast evaluation: freeze the P50/P90 of TRAIN daily
    # revenue (lower/disc quantile by integer rank — no interpolation,
    # so both engines pick the same day), then score each TEST day with
    # the pinball loss in exact (cents x ppm) integers; the only floats
    # are the two terminal mean divisions, ROUND 2.
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
        FROM orders GROUP BY 1
    ), train AS (
        SELECT y, ROW_NUMBER() OVER (ORDER BY y, d) AS rk,
               COUNT(*) OVER () AS n
        FROM daily WHERE d < DATE '{_PIN_SPLIT}'
    ), q(q_ppm) AS (VALUES ({_PIN_QUANTILES[0]}), ({_PIN_QUANTILES[1]})),
    fcast AS (
        SELECT q.q_ppm, t.y AS f
        FROM q JOIN train t
          ON t.rk = (t.n * q.q_ppm + 999999) // 1000000
    ), test_days AS (
        SELECT y FROM daily WHERE d >= DATE '{_PIN_SPLIT}'
    ), losses AS (
        SELECT f.q_ppm, f.f,
               CASE WHEN t.y >= f.f
                    THEN CAST(f.q_ppm AS HUGEINT) * (t.y - f.f)
                    ELSE CAST(1000000 - f.q_ppm AS HUGEINT) * (f.f - t.y)
               END AS loss_num
        FROM fcast f CROSS JOIN test_days t
    )
    SELECT CAST(q_ppm AS BIGINT) AS q_ppm,
           CAST(MAX(f) AS BIGINT) AS forecast_cents,
           CAST(COUNT(*) AS BIGINT) AS n_test_days,
           ROUND(CAST(SUM(loss_num) AS DOUBLE) / 1000000 / COUNT(*), 2)
               AS mean_pinball_cents
    FROM losses
    GROUP BY q_ppm
    ORDER BY q_ppm
    """,
)
def agg_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss — the scoring rule for quantile
    forecasts, completing the forecast-eval family next to
    `events_forecast_backtest`'s point metrics: freeze the P50/P90 of
    TRAIN-period daily revenue (orders before 1999-01-01) as two static
    quantile forecasts, then score every TEST day with
    L_q(y, f) = q·(y−f)⁺ + (1−q)·(f−y)⁺.  A well-placed P90 forecast
    shows pinball far below P50's on the same days — the asymmetry is
    the point (under-forecasting the tail is punished 9× harder).

    The train quantile is the DISCRETE (lower) quantile selected by
    integer rank ceil(q·n) over the (y, day) total order — no
    interpolation, so both engines elect the same training day and the
    forecast is a single exact integer.  Losses are (cents × ppm)
    integer products carried in DECIMAL(38,0)/HUGEINT; the two mean
    divisions are terminal, ROUND(2).

    Scale notes: the corpus pass is ONE hash aggregate to the
    calendar-day rollup (~1.7k rows at any SF); ranking, the 2-row
    quantile dim join, and the loss scoring all run on that rollup
    (reviewed SINGLE/NLJ — the CROSS JOIN is 2 forecast rows × test
    days, calendar-bounded)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
    )
    split = F.lit(_PIN_SPLIT).cast("date")
    w_rank = Window.orderBy("y", "d")
    w_all = Window.partitionBy()
    train = daily.where(F.col("d") < split).select(
        "y",
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    q = spark.createDataFrame([(qq,) for qq in _PIN_QUANTILES], "q_ppm long")
    fcast = F.broadcast(q).join(
        train,
        train.rk == F.expr("(n * q_ppm + 999999) div 1000000"),
    ).select("q_ppm", F.col("y").alias("f"))
    test_days = daily.where(F.col("d") >= split).select("y")
    losses = F.broadcast(fcast).crossJoin(test_days).select(
        "q_ppm",
        "f",
        F.when(
            F.col("y") >= F.col("f"),
            F.col("q_ppm").cast("decimal(38,0)") * (F.col("y") - F.col("f")),
        )
        .otherwise(
            (F.lit(1000000) - F.col("q_ppm")).cast("decimal(38,0)")
            * (F.col("f") - F.col("y"))
        )
        .alias("loss_num"),
    )
    return (
        losses.groupBy("q_ppm")
        .agg(
            F.max("f").cast("long").alias("forecast_cents"),
            F.count(F.lit(1)).cast("long").alias("n_test_days"),
            F.round(
                F.sum("loss_num").cast("double") / 1000000 / F.count(F.lit(1)),
                2,
            ).alias("mean_pinball_cents"),
        )
        .select(
            F.col("q_ppm").cast("long").alias("q_ppm"),
            "forecast_cents",
            "n_test_days",
            "mean_pinball_cents",
        )
        .orderBy("q_ppm")
    )


#: Wald SPRT constants for `events_sprt_purchase_rate` — H0: purchase
#: share = 0.18 vs H1: 0.22, alpha = beta = 0.05.  The log-likelihood
#: increments and the decision boundaries are PYTHON-COMPUTED double
#: literals shared verbatim by both engines (the `events_periodogram`
#: trig-literal rule): ln() never executes in SQL, so the cumulative
#: LLR is the same IEEE product/sum on both sides and ROUND(4) is
#: drift-free.  The fixture's true share ≈ 0.20 sits BETWEEN the
#: hypotheses, so the LLR is an honest random walk (decisions may stay
#: 'continue'); the pytest plants a high-rate corpus and asserts the
#: H1 boundary is crossed.
_SPRT_LLR_POS = 0.20067069546215124   # ln(0.22/0.18), per success
_SPRT_LLR_NEG = -0.05001042057466142  # ln(0.78/0.82), per failure
_SPRT_BOUND = 2.9444389791664403      # ln((1-beta)/alpha)


@register(
    "events_sprt_purchase_rate",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
        FROM events GROUP BY 1
    ), cum AS (
        SELECT day,
               SUM(n) OVER w AS n_cum,
               SUM(s) OVER w AS s_cum
        FROM daily
        WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    )
    SELECT day,
           CAST(n_cum AS BIGINT) AS n_cum,
           CAST(s_cum AS BIGINT) AS s_cum,
           ROUND(s_cum * {_SPRT_LLR_POS!r}
                 + (n_cum - s_cum) * {_SPRT_LLR_NEG!r}, 4) AS llr,
           CASE WHEN s_cum * {_SPRT_LLR_POS!r}
                     + (n_cum - s_cum) * {_SPRT_LLR_NEG!r}
                     >= {_SPRT_BOUND!r} THEN 'accept_h1'
                WHEN s_cum * {_SPRT_LLR_POS!r}
                     + (n_cum - s_cum) * {_SPRT_LLR_NEG!r}
                     <= -{_SPRT_BOUND!r} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum
    ORDER BY day
    """,
)
def events_sprt_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test (SPRT, 1945 — public)
    monitoring the purchase share day by day: H0 share = 0.18 vs H1
    share = 0.22 at α = β = 0.05.  The always-valid-inference staple of
    modern experimentation platforms — unlike a fixed-horizon z-test
    (`agg_welch_ttest` family), the analyst may look EVERY day and stop
    the moment |LLR| crosses ln((1−β)/α) without inflating error rates.
    Output per day: cumulative trials/successes, the LLR, the decision.

    Exactness: the per-success / per-failure LLR increments and the
    boundary are Python-computed double literals shared by both engines
    (no ln() executes in SQL — the `events_periodogram` literal rule),
    so LLR = s·a + (n−s)·b is the identical IEEE expression and
    ROUND(4) is drift-free.  The fixture's true share ≈ 0.20 sits
    between the hypotheses (an honest drift-free random walk); the
    pytest plants a 0.30-share corpus and asserts the H1 boundary is
    crossed, and asserts monotone trial counts here.

    Scale notes: ONE hash aggregate from the corpus to the ≤31-row
    daily rollup; the cumulative window and decision rule run on that
    rollup (reviewed SINGLE)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("s"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day",
        F.sum("n").over(w).alias("n_cum"),
        F.sum("s").over(w).alias("s_cum"),
    )
    llr = F.col("s_cum") * _SPRT_LLR_POS + (
        F.col("n_cum") - F.col("s_cum")
    ) * _SPRT_LLR_NEG
    return cum.select(
        "day",
        F.col("n_cum").cast("long").alias("n_cum"),
        F.col("s_cum").cast("long").alias("s_cum"),
        F.round(llr, 4).alias("llr"),
        F.when(llr >= _SPRT_BOUND, "accept_h1")
        .when(llr <= -_SPRT_BOUND, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


@register(
    "events_ab_srm",
    # Sample-ratio-mismatch check: randomization unit = USER (distinct
    # users per variant, never events — traffic mix would confound);
    # chi-square GoF vs the designed 1:1 split is (n0-n1)^2/N on exact
    # integers with ONE terminal IEEE division, ROUND(6).
    oracle="""
    WITH assign AS (
        SELECT DISTINCT user_id, user_id % 2 AS variant FROM events
    ), counts AS (
        SELECT variant, COUNT(*) AS n_users FROM assign GROUP BY 1
    )
    SELECT CAST(variant AS BIGINT) AS variant,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_users * 1000000 // SUM(n_users) OVER () AS BIGINT)
             AS share_ppm,
           ROUND(CAST((MAX(n_users) OVER () - MIN(n_users) OVER ())
                      * (MAX(n_users) OVER () - MIN(n_users) OVER ())
                      AS DOUBLE)
                 / SUM(n_users) OVER (), 6) AS chi2,
           CASE WHEN CAST((MAX(n_users) OVER () - MIN(n_users) OVER ())
                          * (MAX(n_users) OVER () - MIN(n_users) OVER ())
                          AS DOUBLE)
                     / SUM(n_users) OVER () > 3.841459 THEN 1 ELSE 0 END
             AS srm_flag
    FROM counts
    ORDER BY variant
    """,
)
def events_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check (Fabijan et al. 2019, public) — the
    FIRST health check any A/B platform runs before reading a metric:
    assign each user to a variant by user_id parity (the designed 1:1
    split) and chi-square-test the realized user counts against it; a
    significant mismatch means broken randomization/logging and every
    downstream readout is invalid.  For two cells at equal expectation
    the GoF statistic collapses to (n0−n1)²/N — exact integers into one
    terminal division.  Fixture assignment is exactly the design (an
    honest null, flag 0 at every SF); the pytest plants a 10% one-sided
    user drop and asserts the flag fires.

    Scale notes: ONE distinct on the user grain (the randomization
    unit — counting events instead would confound traffic mix with
    assignment), one 2-row aggregate, windows on that 2-row frame
    (reviewed SINGLE)."""
    e = load_table(spark, sf_dir, "events")
    assign = e.select(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).distinct()
    counts = assign.groupBy("variant").agg(F.count(F.lit(1)).alias("n_users"))
    w_all = Window.partitionBy()
    diff = F.max("n_users").over(w_all) - F.min("n_users").over(w_all)
    chi2 = (diff * diff).cast("double") / F.sum("n_users").over(w_all)
    return counts.select(
        F.col("variant").cast("long").alias("variant"),
        F.col("n_users").cast("long").alias("n_users"),
        F.expr("n_users * 1000000 div SUM(n_users) OVER ()")
        .cast("long")
        .alias("share_ppm"),
        F.round(chi2, 6).alias("chi2"),
        F.when(chi2 > 3.841459, 1).otherwise(0).alias("srm_flag"),
    ).orderBy("variant")


@register(
    "agg_trend_cochran_armitage",
    # Cochran-Armitage trend test across the ordered $50 value buckets:
    # numerator T·N = Σw·(s·N − n·S) and variance·N³ = S(N−S)(N·Σw²n −
    # (Σwn)²) are EXACT integers (HUGEINT/DECIMAL(38,0) carry); z is
    # assembled from them with the identical double expression on both
    # engines, ROUND(4).
    oracle="""
    WITH cells AS MATERIALIZED (
        SELECT LEAST(9, CAST(floor(value / 50) AS BIGINT)) AS w,
               COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
        FROM events WHERE value IS NOT NULL
        GROUP BY 1
    ), t0 AS MATERIALIZED (
        SELECT SUM(n) AS nn, SUM(s) AS ss,
               SUM(w * n) AS wn, SUM(w * w * n) AS wwn
        FROM cells
    ), tn AS (
        SELECT SUM(CAST(c.w AS HUGEINT)
                   * (c.s * t0.nn - c.n * t0.ss)) AS tnum
        FROM cells c CROSS JOIN t0
    )
    SELECT CAST(c.w AS BIGINT) AS bucket,
           CAST(c.n AS BIGINT) AS n,
           CAST(c.s AS BIGINT) AS n_pos,
           CAST(c.s * 1000000 // c.n AS BIGINT) AS pos_ppm,
           ROUND(CAST(tn.tnum AS DOUBLE)
                 / sqrt(CAST(CAST(t.ss AS HUGEINT) * (t.nn - t.ss)
                             * (t.nn * t.wwn - CAST(t.wn AS HUGEINT) * t.wn)
                             AS DOUBLE))
                 * sqrt(CAST(t.nn AS DOUBLE)), 4) AS z_trend
    FROM cells c CROSS JOIN t0 t CROSS JOIN tn
    ORDER BY bucket
    """,
)
def agg_trend_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test (1954/1955, public): is the purchase
    share MONOTONICALLY associated with the ordered value buckets?  The
    dose-response sibling of `agg_chisq_independence` — chi-square asks
    "any association", this asks "an ordered one", with far more power
    when the alternative is a trend.  Scores w = bucket index; z =
    Σw(s_i − n_i·p̄) / √(p̄(1−p̄)(Σw²n − (Σwn)²/N)).

    Exactness: numerator·N and variance·N³ are exact integers through
    the int128/DECIMAL(38,0) carry; z is assembled with the identical
    double expression on both engines and ROUND(4)-absorbed.  (The
    trailing √(N/N) factor keeps the two engines' expression trees
    literally identical after the N-scalings cancel.)  Fixture: value
    is independent of event type (the `agg_mutual_information` null),
    so z sits near 0 — the pytest plants a monotone dose-response and
    asserts |z| blows past 1.96, and pins the per-bucket table here.

    Scale notes: ONE corpus agg to the ≤10-bucket rollup; totals and
    the statistic are windows/aggregates on that rollup (reviewed
    SINGLE)."""
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cells = e.groupBy(
        F.least(F.lit(9), F.floor(F.col("value") / 50).cast("long")).alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("s"),
    )
    t0 = cells.agg(
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum(F.col("w") * F.col("n")).alias("wn"),
        F.sum(F.col("w") * F.col("w") * F.col("n")).alias("wwn"),
    )
    tn = (
        cells.crossJoin(F.broadcast(t0))
        .agg(
            F.sum(
                F.expr("CAST(w AS DECIMAL(38,0)) * (s * nn - n * ss)")
            ).alias("tnum")
        )
    )
    enriched = cells.crossJoin(F.broadcast(t0)).crossJoin(F.broadcast(tn))
    z = F.round(
        F.col("tnum").cast("double")
        / F.sqrt(
            F.expr(
                "CAST(CAST(ss AS DECIMAL(38,0)) * (nn - ss)"
                " * (nn * wwn - CAST(wn AS DECIMAL(38,0)) * wn)"
                " AS DOUBLE)"
            )
        )
        * F.sqrt(F.col("nn").cast("double")),
        4,
    )
    return enriched.select(
        F.col("w").cast("long").alias("bucket"),
        F.col("n").cast("long").alias("n"),
        F.col("s").cast("long").alias("n_pos"),
        F.expr("s * 1000000 div n").cast("long").alias("pos_ppm"),
        z.alias("z_trend"),
    ).orderBy("bucket")


#: Python-computed floor(ln(q)*1e6) literals for the bounded integral
#: l_quantity domain (1..50 per TPC-H) — shared verbatim by the Spark
#: plan and the DuckDB oracle so the x side of the elasticity
#: regression has ZERO cross-libm exposure (ADVICE r10: a per-row floor
#: over a libm ln does not absorb a 1-ulp JVM/DuckDB divergence, and
#: the flip probability grows with corpus size).
_LN_QTY_E6: dict[int, int] = {
    q: math.floor(math.log(q) * 1e6) for q in range(1, 51)
}
_LN_QTY_E6_SQL = (
    "CASE CAST(l_quantity AS BIGINT) "
    + " ".join(f"WHEN {q} THEN {v}" for q, v in _LN_QTY_E6.items())
    + " ELSE CAST(floor(ln(l_quantity) * 1000000) AS BIGINT) END"
)


@register(
    "orders_price_elasticity",
    # Grouped log-log OLS.  ln(qty) comes from the Python-computed e6
    # literal table above (out-of-domain quantities fall back to
    # floor(ln) — defensive; the fixture never hits it), so the x side
    # is exact integer arithmetic.  The price side has a 583k-distinct
    # unbounded domain where no literal table exists, so it follows the
    # repo's ROUND-terminal float discipline instead of flooring: raw
    # ln doubles, double sums, ONE terminal division, ROUND(4) — a
    # 1-ulp per-row ln divergence now perturbs the slope at ~1e-9,
    # absorbed by the rounding, instead of flipping a floored integer
    # (ADVICE r10, the medium item).
    oracle=f"""
    WITH q AS (
        SELECT l_returnflag AS grp,
               {_LN_QTY_E6_SQL} AS lx,
               ln(l_extendedprice) AS ly
        FROM lineitem
    ), m AS (
        SELECT grp, COUNT(*) AS n,
               SUM(lx) AS sx, SUM(ly) AS sy,
               SUM(lx * ly) AS sxy,
               SUM(ly * ly) AS syy
        FROM q GROUP BY 1
    )
    SELECT grp AS returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) * 0.000001
                 / (n * syy - sy * sy), 4) AS elasticity,
           CAST(sx // n AS BIGINT) AS mean_ln_qty_e6,
           ROUND(sy / n, 6) AS mean_ln_price
    FROM m
    ORDER BY returnflag
    """,
)
def orders_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand by return flag — the log-log OLS
    slope ∂ln(qty)/∂ln(price), the pricing team's first regression
    (elasticity < −1 = elastic, revenue falls when price rises).
    Fixture: quantity is INDEPENDENT of price by construction
    (FIXTURES.md; probed slopes −0.003..0.006), so the fixture is an
    honest null and the pytest injects a constructed elastic frame
    (qty ∝ price^−1.5) through the same quantized arithmetic and
    recovers the planted −1.5 within quantization error.

    Exactness (ADVICE r10, the medium item): ln(qty) is a Python-
    computed e6 literal lookup over the bounded 1..50 quantity domain
    (both engines consume the SAME integers — zero cross-libm
    exposure; out-of-domain falls back to floor(ln), which the fixture
    never hits), so the x side stays exact integer arithmetic.  The
    price side (583k distinct values, unbounded at scale) follows the
    ROUND-terminal float discipline: raw ln doubles, double sums, ONE
    terminal division, ROUND(4) — a 1-ulp per-row ln divergence
    perturbs the slope at ~1e-9, absorbed by the rounding, instead of
    flipping a floored integer with probability growing in corpus size.

    Scale notes: ONE hash aggregate from the fact scan to the 3-row
    group frame; nothing else."""
    li = load_table(spark, sf_dir, "lineitem")
    lx = F.coalesce(
        F.element_at(
            F.create_map(
                *[
                    F.lit(x)
                    for kv in _LN_QTY_E6.items()
                    for x in kv
                ]
            ),
            F.col("l_quantity").cast("int"),
        ),
        F.floor(F.log(F.col("l_quantity")) * 1000000).cast("long"),
    )
    q = li.select(
        F.col("l_returnflag").alias("grp"),
        lx.cast("long").alias("lx"),
        F.log(F.col("l_extendedprice")).alias("ly"),
    )
    m = q.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
    )
    return m.select(
        F.col("grp").alias("returnflag"),
        F.col("n").cast("long").alias("n"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * 0.000001
            / (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
            4,
        ).alias("elasticity"),
        F.expr("sx div n").cast("long").alias("mean_ln_qty_e6"),
        F.round(F.col("sy") / F.col("n"), 6).alias("mean_ln_price"),
    ).orderBy("returnflag")


@register(
    "events_nelson_aalen",
    # Nelson–Aalen cumulative hazard (public) on the SAME subject frame
    # as events_kaplan_meier (time-to-first-purchase, staggered
    # administrative censoring): per support point the hazard increment
    # d_i/n_i rides as the e12-floored integer (d·1e12) div n — both
    # engines floor identical integers, so the running SUM is exact and
    # engine-identical; the Fleming–Harrington survival exp(−H) is ONE
    # libm exp on an identical double, ROUND at ppm absorbing its last
    # ulp (the kaplan_meier discipline).
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(MIN(ts) AS DATE) AS d0,
               CAST(MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                    AS DATE) AS dp
        FROM events GROUP BY user_id
    ), subj AS (
        SELECT user_id,
               CASE WHEN dp IS NOT NULL
                         AND date_diff('day', d0, dp) <= 3 + user_id % 9
                    THEN date_diff('day', d0, dp)
                    ELSE 3 + user_id % 9 END AS dur,
               CASE WHEN dp IS NOT NULL
                         AND date_diff('day', d0, dp) <= 3 + user_id % 9
                    THEN 1 ELSE 0 END AS ev
        FROM u
    ), g AS (
        SELECT dur, SUM(ev) AS d_events,
               SUM(1 - ev) AS censored,
               COUNT(*) AS n_at
        FROM subj GROUP BY dur
    ), r AS (
        SELECT *, SUM(n_at) OVER (ORDER BY dur DESC) AS n_risk FROM g
    ), na AS (
        SELECT dur, d_events, censored, n_risk,
               SUM(d_events * 1000000000000 // n_risk)
                   OVER (ORDER BY dur) AS cumhaz_e12
        FROM r
    )
    SELECT CAST(dur AS BIGINT) AS dur_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d_events AS BIGINT) AS d_events,
           CAST(censored AS BIGINT) AS censored,
           CAST(d_events * 1000000000000 // n_risk AS BIGINT)
             AS hazard_step_e12,
           CAST(cumhaz_e12 AS BIGINT) AS cum_hazard_e12,
           CAST(ROUND(EXP(-(CAST(cumhaz_e12 AS DOUBLE) / 1e12)) * 1000000)
                AS BIGINT) AS survival_fh_ppm
    FROM na WHERE d_events > 0
    """,
)
def events_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator on the same censored
    time-to-first-purchase frame as `events_kaplan_meier` — the OTHER
    classical survival summary: where KM multiplies survival factors,
    NA sums hazard increments Σ d_i/n_i, and exp(−H) is the
    Fleming–Harrington survival estimate (≥ KM everywhere, close when
    increments are small — the pytest pins both laws against the KM
    rows).  Production survival stacks report both: NA's cumulative
    hazard is the quantity additive over disjoint time windows, which
    is what incremental/streaming survival updates need.

    Exactness: each increment is the e12-floored integer division
    (d·1e12) div n — identical integers on both engines, so the
    duration-ordered cumulative SUM is exact (no float summation
    anywhere); exp(−H) is one libm call on an identical double, ROUND
    at ppm absorbing its last ulp (the `events_kaplan_meier`
    discipline).

    Scale notes: ONE per-user hash agg to the subject frame, then a
    duration rollup bounded by the ≤12-day follow-up window; the
    suffix-risk and cumulative windows run on that bounded frame only
    (reviewed SINGLE class, kaplan_meier's rows)."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("dp"),
    )
    fup = F.lit(3) + F.col("user_id") % 9
    observed = F.col("dp").isNotNull() & (F.datediff("dp", "d0") <= fup)
    subj = u.select(
        F.when(observed, F.datediff("dp", "d0")).otherwise(fup).alias("dur"),
        F.when(observed, 1).otherwise(0).alias("ev"),
    )
    g = subj.groupBy("dur").agg(
        F.sum("ev").alias("d_events"),
        F.sum(F.lit(1) - F.col("ev")).alias("censored"),
        F.count(F.lit(1)).alias("n_at"),
    )
    w_desc = Window.orderBy(F.desc("dur"))
    w_asc = Window.orderBy("dur")
    r = g.withColumn("n_risk", F.sum("n_at").over(w_desc))
    step = F.expr("d_events * 1000000000000 div n_risk")
    na = r.withColumn("cumhaz_e12", F.sum(step).over(w_asc))
    return na.where(F.col("d_events") > 0).select(
        F.col("dur").cast("long").alias("dur_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d_events").cast("long").alias("d_events"),
        F.col("censored").cast("long").alias("censored"),
        step.cast("long").alias("hazard_step_e12"),
        F.col("cumhaz_e12").cast("long").alias("cum_hazard_e12"),
        F.round(
            F.exp(-(F.col("cumhaz_e12").cast("double") / 1e12)) * 1000000
        )
        .cast("long")
        .alias("survival_fh_ppm"),
    )


@register(
    "agg_partial_corr",
    # Partial correlation (Yule 1907, public) — the confounder-control
    # demo that lives NATIVELY in the fixture: order price total and
    # order quantity total correlate strongly (r ≈ 0.74 at sf0.01) yet
    # BOTH are driven by line count; conditioning on it collapses the
    # association to ≈ −0.01.  r_ab from exact HUGEINT/DECIMAL(38,0)
    # moment sums over order-grain integers (cents / unit counts);
    # r_xz.y = (r_xz − r_xy r_zy)/√((1−r_xy²)(1−r_zy²)) — deterministic
    # double compositions of exact integers, ROUND(4)-terminal.
    oracle="""
    WITH o AS (
      SELECT l_orderkey,
             CAST(SUM(ROUND(l_extendedprice * 100)) AS BIGINT) AS x,
             CAST(SUM(ROUND(l_quantity)) AS BIGINT) AS z,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM lineitem GROUP BY 1
    ), m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(z AS HUGEINT)) AS sz,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(z AS HUGEINT) * z) AS szz,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * z) AS sxz,
             SUM(CAST(y AS HUGEINT) * z) AS syz
      FROM o
    ), r AS (
      SELECT CAST(n AS BIGINT) AS n_orders,
             (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                       - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
               AS r_xz,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               AS r_xy,
             (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                       - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
               AS r_zy
      FROM m
    )
    SELECT n_orders,
           ROUND(r_xz, 4) AS r_price_qty,
           ROUND(r_xy, 4) AS r_price_lines,
           ROUND(r_zy, 4) AS r_qty_lines,
           CASE WHEN (1 - r_xy * r_xy) * (1 - r_zy * r_zy) > 0
                THEN ROUND((r_xz - r_xy * r_zy)
                     / sqrt((1 - r_xy * r_xy) * (1 - r_zy * r_zy)), 4)
                ELSE NULL END AS r_partial_given_lines
    FROM r
    """,
)
def agg_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of order price total and order quantity
    total, CONTROLLING for line count — the estimator that separates
    'correlated' from 'directly related'.  The fixture carries the
    textbook confounder natively: price and quantity totals correlate
    at r ≈ 0.74 purely because both accumulate over the same number of
    lines; given line count the partial collapses to ≈ −0.01.  The
    planted-effect pytest builds data with a genuine direct link and
    shows the partial SURVIVES conditioning — and a pure-confounder
    construction where it vanishes (the law parity cannot check).

    Exactness: order-grain sums are exact integers (cents / units /
    counts); the nine moment sums ride as HUGEINT/DECIMAL(38,0)
    (Σx² ≈ 4e19 already passes int64 at sf0.01 — the r10 hazard
    class); every r is a deterministic double composition of exact
    integers, the partial one more such composition, ROUND(4); a
    PERFECTLY collinear conditioning variable (either |r·y| = 1 —
    zero residual variance) yields NULL on both engines rather than
    an ANSI divide-by-zero / a fabricated ±inf.

    Scale notes: ONE lineitem hash agg to order grain, ONE reduce to
    the 1-row moment frame — two map-side-combining aggregations,
    no windows, no joins."""
    l = load_table(spark, sf_dir, "lineitem")
    o = l.groupBy("l_orderkey").agg(
        F.expr("CAST(SUM(ROUND(l_extendedprice * 100)) AS BIGINT)").alias(
            "x"
        ),
        F.expr("CAST(SUM(ROUND(l_quantity)) AS BIGINT)").alias("z"),
        F.count(F.lit(1)).cast("long").alias("y"),
    )
    m = o.agg(
        F.expr("CAST(COUNT(1) AS DECIMAL(38,0))").alias("n"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)))").alias("sx"),
        F.expr("SUM(CAST(y AS DECIMAL(38,0)))").alias("sy"),
        F.expr("SUM(CAST(z AS DECIMAL(38,0)))").alias("sz"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * x)").alias("sxx"),
        F.expr("SUM(CAST(y AS DECIMAL(38,0)) * y)").alias("syy"),
        F.expr("SUM(CAST(z AS DECIMAL(38,0)) * z)").alias("szz"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * y)").alias("sxy"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * z)").alias("sxz"),
        F.expr("SUM(CAST(y AS DECIMAL(38,0)) * z)").alias("syz"),
    )

    def _corr(sab: str, saa: str, sa: str, sbb: str, sb: str):
        n = F.col("n").cast("double")
        return (
            n * F.col(sab).cast("double")
            - F.col(sa).cast("double") * F.col(sb).cast("double")
        ) / F.sqrt(
            (
                n * F.col(saa).cast("double")
                - F.col(sa).cast("double") * F.col(sa).cast("double")
            )
            * (
                n * F.col(sbb).cast("double")
                - F.col(sb).cast("double") * F.col(sb).cast("double")
            )
        )

    r = m.select(
        F.col("n").cast("long").alias("n_orders"),
        _corr("sxz", "sxx", "sx", "szz", "sz").alias("r_xz"),
        _corr("sxy", "sxx", "sx", "syy", "sy").alias("r_xy"),
        _corr("syz", "syy", "sy", "szz", "sz").alias("r_zy"),
    )
    return r.select(
        "n_orders",
        F.round(F.col("r_xz"), 4).alias("r_price_qty"),
        F.round(F.col("r_xy"), 4).alias("r_price_lines"),
        F.round(F.col("r_zy"), 4).alias("r_qty_lines"),
        F.when(
            (1 - F.col("r_xy") * F.col("r_xy"))
            * (1 - F.col("r_zy") * F.col("r_zy"))
            > 0,
            F.round(
                (F.col("r_xz") - F.col("r_xy") * F.col("r_zy"))
                / F.sqrt(
                    (1 - F.col("r_xy") * F.col("r_xy"))
                    * (1 - F.col("r_zy") * F.col("r_zy"))
                ),
                4,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("r_partial_given_lines"),
    )
