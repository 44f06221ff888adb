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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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
