"""§2.8 Scalar functions: string / date / math / conditional / array /
map / json / cast (SURVEY.md).

These mirror the reference's per-record parse step [K] (delimiter payloads,
JSON payloads) as Catalyst expressions — JVM-side, codegen'd, pushdown-safe;
never Python row lambdas.  Dialect twins chosen per SURVEY.md §5.1 (e.g.
``get_json_object`` ↔ ``json_extract_string``, 0- vs 1-indexed arrays,
``ceil`` return types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..session import load_table


@register(
    "fn_string",
    oracle="""
    SELECT o_orderkey,
           CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
           regexp_extract(o_orderpriority, '-(.*)$', 1) AS prio_word,
           lower(o_orderpriority) AS lowered,
           upper(o_orderpriority) AS uppered,
           length(o_orderpriority) AS len,
           replace(o_orderpriority, '-', '_') AS replaced,
           concat(o_orderstatus, ':', o_orderpriority) AS tagged,
           trim('  pad  ') AS trimmed,
           (o_orderpriority LIKE '%URGENT%') AS is_urgent
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface over the delimiter-payload pattern ('1-URGENT')."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    p = F.col("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.substring(p, 1, 1).cast("int").alias("prio_num"),
        F.regexp_extract(p, "-(.*)$", 1).alias("prio_word"),
        F.lower(p).alias("lowered"),
        F.upper(p).alias("uppered"),
        F.length(p).alias("len"),
        F.replace(p, F.lit("-"), F.lit("_")).alias("replaced"),
        F.concat(F.col("o_orderstatus"), F.lit(":"), p).alias("tagged"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        p.like("%URGENT%").alias("is_urgent"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS order_month,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mth,
           dayofweek(o_orderdate) + 1 AS dow,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing of o_orderdate.

    Dialect notes: DuckDB ``dayofweek`` is 0=Sunday while Spark's is
    1=Sunday (oracle adds 1); DuckDB ``date_diff`` argument order is
    (unit, start, end) ≡ Spark ``datediff(end, start)``; ``+ INTERVAL 1
    MONTH`` end-of-month clamps identically to Spark ``add_months``.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").alias("order_month"),
        F.year(d).alias("yr"),
        F.month(d).alias("mth"),
        F.dayofweek(d).alias("dow"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias(
            "days_to_2002"
        ),
        F.add_months(d.cast("date"), 1).alias("next_month"),
        d.cast("date").alias("order_date"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS rounded,
           abs(l_extendedprice - 50000) AS abs_dev,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q,
           CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q,
           round(pow(l_quantity, 2), 1) AS qty_sq,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(exp(l_discount), 6) AS exp_disc,
           CAST(sign(l_extendedprice - 50000) AS INTEGER) AS dev_sign,
           floor(l_extendedprice / nullif(l_quantity, 0) * 10000) / 10000 AS unit_price
    FROM lineitem
    WHERE l_orderkey % 20 = 0
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface incl. safe division (try_divide ↔ x/nullif(y,0)).

    Dialect: DuckDB ceil/floor on double return double (oracle casts to
    BIGINT to match Spark); integer ``/`` is float division in DuckDB, so
    l_quantity (double) divides identically.  round(x,1) on 2-decimal
    inputs sits exactly on .x5 only at one decimal shift — inputs here are
    exact 2-decimal doubles whose 1-digit rounding agrees (verified by the
    parity harness).
    """
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 20 == 0)
    price, qty = F.col("l_extendedprice"), F.col("l_quantity")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(price, 1).alias("rounded"),
        F.abs(price - 50000).alias("abs_dev"),
        F.ceil(qty / 7).alias("ceil_q"),
        F.floor(qty / 7).alias("floor_q"),
        F.round(F.pow(qty, 2), 1).alias("qty_sq"),
        F.round(F.log(price), 6).alias("ln_price"),
        F.round(F.exp(F.col("l_discount")), 6).alias("exp_disc"),
        F.signum(price - 50000).cast("int").alias("dev_sign"),
        # floor-truncation, not round: round(double, n) is implemented
        # differently across engines at half-way bits; floor(x*1e4)/1e4 is
        # pure IEEE arithmetic and bit-identical in Spark and DuckDB.
        (F.floor(F.try_divide(price, F.nullif(qty, F.lit(0))) * 10000) / 10000).alias(
            "unit_price"
        ),
    )


@register(
    "fn_case",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_tier,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
           greatest(c_acctbal, 0.0) AS floor_bal,
           least(c_acctbal, 9000.0) AS capped_bal
    FROM customer
    """,
)
def fn_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / greatest / least."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debt").when(bal < 5000, "low").otherwise("high").alias(
            "bal_tier"
        ),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER"))
        .alias("seg_or_other"),
        F.greatest(bal, F.lit(0.0)).alias("floor_bal"),
        F.least(bal, F.lit(9000.0)).alias("capped_bal"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT t.token, COUNT(*) AS n, COUNT(DISTINCT d.doc_id) AS n_docs
    FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
    GROUP BY t.token
    HAVING COUNT(*) >= 10
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split(text)) token counts — Spark 0-cost lateral explode ↔
    DuckDB unnest(string_split)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n") >= 10)
    )


@register(
    "fn_array_ops",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           string_split(text, ' ')[1] AS first_token,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
             AS first3_distinct
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / array_contains / indexing / slice+sort — 0- vs 1-indexed
    dialect handled in the oracle."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        toks.getItem(0).alias("first_token"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ",").alias(
            "first3_distinct"
        ),
    )


@register(
    "fn_map",
    # Harness rule (CORRECTNESS_r01): no Map/Array types in returned
    # schemas — the driver's pandas canonicalizer can't hash them.  The map
    # is still built and probed (create_map / element_at / map_keys); all
    # outputs are serialized to scalars.  create_map preserves insertion
    # order, so to_json / array_join are deterministic.
    #
    # Oracle JSON is built with DuckDB's to_json on each VALUE (quote-
    # escaping matches Spark's) and COALESCE(...,'null') because Spark's
    # to_json(map) emits `"k":null` for a NULL map value (verified) while
    # bare '||' would NULL-propagate the whole string.
    # json_valid guard: DuckDB's json_extract_string THROWS on malformed
    # JSON where Spark's get_json_object returns NULL (proved by the
    # adversarial pair test) — same guard scan_corrupt_tolerant uses.
    oracle="""
    WITH p AS (
      SELECT event_id, event_type,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS k_str
      FROM events
    )
    SELECT event_id,
           '{"type":' || COALESCE(to_json(event_type), 'null')
             || ',"k":' || COALESCE(to_json(k_str), 'null')
             || '}' AS props_json,
           TRY_CAST(k_str AS INTEGER) AS k_val,
           'type,k' AS keys_csv
    FROM p
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at over parsed JSON props, serialized."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    return e.select(
        "event_id",
        F.to_json(m).alias("props_json"),
        # try_cast, not cast: ANSI cast THROWS on a non-numeric $.k — one
        # dirty record would kill a 100 TB job (tests/test_properties.py
        # proves the pair on adversarial values; clean-fixture hash is
        # unchanged).
        F.element_at(m, "k").try_cast("int").alias("k_val"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props — the reference's schema-on-read
    payload parse [K] as an expression."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    ).where(k > 50)


@register(
    "fn_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
           CAST(l_quantity AS INTEGER) AS qty_int,
           CAST(l_linenumber AS VARCHAR) AS line_str,
           TRY_CAST('not a number' AS INTEGER) AS bad_int,
           TRY_CAST('123' AS INTEGER) AS good_int
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts incl. decimal and try_cast (ANSI-safe overflow → NULL).

    The decimal cast is exercised round-trip but returned as double —
    harness rule: no DecimalType in returned schemas (pandas renders
    Decimal objects vs DuckDB's float64 and the value-hash diverges).
    """
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("string").alias("line_str"),
        F.try_to_number(F.lit("not a number"), F.lit("999")).cast("int").alias("bad_int"),
        F.try_to_number(F.lit("123"), F.lit("999")).cast("int").alias("good_int"),
    )


@register(
    "fn_null",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(masked)') AS seg_masked,
           CAST(COALESCE(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 0.0)
                AS DOUBLE) AS bal_nonneg,
           CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS was_null,
           IFNULL(NULLIF(c_name, c_name), 'same') AS always_default
    FROM customer
    """,
)
def fn_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: nullif / coalesce / ifnull / conditional
    masking — the fill/default operations a cleaning pipeline applies
    before training-shard export.  The fixtures contain no natural NULLs
    (FIXTURES.md), so NULLs are manufactured with nullif/CASE and then
    repaired, exercising both directions.  All scan-side expressions —
    no shuffle, fully codegen'd."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(masked)")
        ).alias("seg_masked"),
        F.coalesce(
            F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal")), F.lit(0.0)
        ).cast("double").alias("bal_nonneg"),
        F.when(F.col("c_acctbal") < 0, 1).otherwise(0).alias("was_null"),
        F.ifnull(F.nullif(F.col("c_name"), F.col("c_name")), F.lit("same")).alias(
            "always_default"
        ),
    )


@register(
    "fn_fuzzy",
    oracle="""
    SELECT c_custkey, c_name, probe,
           levenshtein(lower(c_name), probe) AS edit_dist
    FROM customer
    CROSS JOIN (VALUES ('customer#000000001'), ('customer#000000100'),
                       ('custmer#00000001')) AS probes(probe)
    WHERE levenshtein(lower(c_name), probe) <= 3
    """,
)
def fn_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: edit-distance lookup of a small probe list
    against customer names (typo-tolerant entity matching).  The probe
    side is a 3-row literal table — broadcast, so the "cross join" is a
    map-side nested loop over a constant; the fact side never shuffles.
    At 100 TB the same shape holds for any small dirty-name probe list;
    large-vs-large fuzzy join needs blocking first (see
    dedup_ngram_jaccard for the blocked-similarity pattern)."""
    c = load_table(spark, sf_dir, "customer")
    probes = F.broadcast(
        c.sparkSession.createDataFrame(
            [("customer#000000001",), ("customer#000000100",), ("custmer#00000001",)],
            "probe string",
        )
    )
    dist = F.levenshtein(F.lower(F.col("c_name")), F.col("probe"))
    return (
        c.crossJoin(probes)
        .where(dist <= 3)
        .select("c_custkey", "c_name", "probe", dist.alias("edit_dist"))
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS lo_byte,
           event_id >> 8 AS hi_bits,
           xor(event_id, 6148914691236517205) AS xored,
           CAST(bit_count(CAST(event_id AS BIGINT)) AS INT) AS popcount,
           event_id << 2 AS shifted
    FROM events WHERE event_id % 7 = 0
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators (&, |, XOR, shifts, popcount) — §2.8
    completeness; the building blocks the engine already leans on
    internally (SimHash band slicing, salting, hash splits) exposed as
    scalar functions.  All JVM-side codegen expressions."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 7 == 0)
    eid = F.col("event_id")
    return e.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("lo_byte"),
        F.shiftright(eid, 8).alias("hi_bits"),
        eid.bitwiseXOR(F.lit(6148914691236517205)).alias("xored"),
        F.bit_count(eid.cast("long")).alias("popcount"),
        F.shiftleft(eid, 2).alias("shifted"),
    )


@register(
    "fn_hof",
    # Array outputs aren't driver-canonicalizable (lists are unhashable
    # in the pandas canon — observed), so every lambda's result is
    # flattened to scalar evidence: sums, booleans, and a CSV string.
    # The filtered list is never empty by construction (the i=3 element
    # 3·base is always divisible by 3), so DuckDB's NULL-on-empty
    # string_agg vs Spark's ''-on-empty concat_ws divergence is
    # unreachable here.  The base is (k//100)%9+1, NOT k%10 — the row
    # filter k%100=0 forces k%10=0, which would make every element 0 and
    # every lambda output a constant (ADVICE r5: a vacuous oracle that a
    # broken HOF engine would still pass).  base∈[1,9] varies per row, so
    # transform/filter/exists/forall/aggregate/zip_with are all exercised
    # on non-degenerate values (any_gt20 flips at base≥5).
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             list_transform(range(1, 6),
                            i -> ((o_orderkey // 100) % 9 + 1) * i) AS xs
      FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT o_orderkey,
           CAST(list_sum(list_transform(xs, x -> x * 2)) AS BIGINT)
             AS doubled_sum,
           list_aggr(list_transform(list_filter(xs, x -> x % 3 = 0),
                     x -> CAST(x AS VARCHAR)), 'string_agg', ',') AS div3_csv,
           list_bool_or(list_transform(xs, x -> x > 20)) AS any_gt20,
           list_bool_and(list_transform(xs, x -> x >= 0)) AS all_nonneg,
           CAST(list_sum(list_transform(xs, x -> x * x)) AS BIGINT)
             AS sumsq,
           CAST(list_sum(list_transform(range(1, 6),
                  i -> xs[i] * xs[6 - i])) AS BIGINT) AS dot_rev
    FROM t ORDER BY o_orderkey
    """,
)
def fn_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function surface — the lambda algebra over array
    columns (`transform` / `filter` / `exists` / `forall` / `aggregate`
    / `zip_with`) that keeps per-element logic inside codegen where
    row-at-a-time UDFs would fall out of it; the building blocks the
    similarity and vector modules lean on, demonstrated as first-class
    §2.8 surface.  The test array derives deterministically from the
    order key — base (k//100)%9+1 ∈ [1,9], deliberately coprime with
    the k%100=0 row filter so element values VARY per row (ADVICE r5
    fixed the earlier k%10 base, which the filter forced to 0 on every
    row, making all lambda outputs constants); DuckDB mirrors with its
    list_* combinators (fold spelled as transform+sum — same element
    order, exact integers).

    Scale notes: zero shuffles — pure scan-side expression work; all
    integer arithmetic."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    base = (F.col("o_orderkey") / F.lit(100)).cast("long") % 9 + 1
    xs = F.transform(F.sequence(F.lit(1), F.lit(5)), lambda i: base * i)
    t = o.select("o_orderkey", xs.alias("xs"))
    rev = F.reverse("xs")
    return t.select(
        "o_orderkey",
        F.aggregate(
            F.transform("xs", lambda x: x * 2),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("doubled_sum"),
        F.concat_ws(
            ",",
            F.transform(
                F.filter("xs", lambda x: x % 3 == 0),
                lambda x: x.cast("string"),
            ),
        ).alias("div3_csv"),
        F.exists("xs", lambda x: x > 20).alias("any_gt20"),
        F.forall("xs", lambda x: x >= 0).alias("all_nonneg"),
        F.aggregate(
            "xs", F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ).alias("sumsq"),
        F.aggregate(
            F.zip_with("xs", rev, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("dot_rev"),
    ).orderBy("o_orderkey")


@register(
    "fn_regexp",
    # The regex family on the RE2 ∩ java.util.regex common subset
    # (character classes, quantifiers, anchors — no lookaround, no
    # backrefs, which RE2 rejects).  DuckDB's regexp_replace is
    # first-match-only by default — the 'g' flag is mandatory to match
    # Spark's replace-all semantics (classic cross-engine trap).
    oracle="""
    SELECT doc_id,
           COALESCE(array_to_string(
               regexp_extract_all(text, '\\b[a-z]{6,}\\b'), ','), '')
               AS long_words,
           CAST(len(regexp_extract_all(text, 'ba[a-z]+')) AS BIGINT)
               AS n_ba_words,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
           CAST(regexp_matches(text, '^the\\b') AS BOOLEAN) AS starts_the
    FROM documents
    WHERE doc_id % 7 = 2
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family: extract-all (serialized — no array columns
    in driver results), match counting, global replace, and anchored
    match — all JVM-side codegen'd expressions, zero UDFs.

    Scale notes: per-row scan-side work that pushes the doc_id filter
    into the parquet scan; regex evaluation is the dominant cost and
    stays inside whole-stage codegen.  Patterns are restricted to the
    RE2/Java common subset so both engines compile identical automata
    semantics."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 2)
    return d.select(
        "doc_id",
        F.array_join(
            F.expr(r"regexp_extract_all(text, '\\b([a-z]{6,})\\b', 0)"), ","
        ).alias("long_words"),
        F.size(F.expr(r"regexp_extract_all(text, '(ba[a-z]+)', 0)"))
        .cast("long")
        .alias("n_ba_words"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
        F.col("text").rlike(r"^the\b").alias("starts_the"),
    )


@register(
    "fn_date_trunc_iso",
    # The ISO-calendar minefield, pinned: both engines agree on ISO
    # week-of-year, ISO week-year (Spark extract(YEAROFWEEK) = DuckDB
    # isoyear — probed: 1993-01-01 -> 1992/W53 both), and Monday
    # date_trunc('week'); day-of-week does NOT agree natively (Spark
    # dayofweek is 1=Sunday, DuckDB isodow is 1=Monday) and is aligned
    # here by the (dow+5)%7+1 rebase on the Spark side.
    oracle="""
    SELECT o_orderkey,
           CAST(isoyear(o_orderdate) AS INTEGER) AS iso_year,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
    FROM orders
    WHERE o_orderkey % 13 = 4
    """,
)
def fn_date_trunc_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-calendar scalar family: ISO week/week-year (the year a week
    BELONGS to, not the year its days fall in — 1993-01-01 is 1992-W53),
    Monday-anchored week truncation, ISO day-of-week, and quarter
    truncation — the date bucketing every weekly-reporting pipeline
    gets subtly wrong once a year.

    Scale notes: pure scan-side expressions inside whole-stage codegen
    with the key filter pushed to parquet; zero shuffles.  The
    Spark-side ISO day-of-week is derived as ((dayofweek+5) mod 7)+1
    because the native functions disagree across engines (1=Sunday vs
    1=Monday) — the alignment is the operator's documentation."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 13 == 4)
    return o.select(
        "o_orderkey",
        F.expr("extract(YEAROFWEEK FROM o_orderdate)").cast("int").alias("iso_year"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).cast("int").alias("iso_dow"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
    )


@register(
    "fn_binary_codec",
    # Payload codec family over the Kafka-record pattern [K]: base64
    # round-trip and hex of the serialized record.  DuckDB's
    # from_base64 returns BLOB (rendered as bytes), so the round-trip
    # is re-decoded to text on both sides; hex output is uppercased to
    # one casing (Spark hex() is uppercase, DuckDB hex() is uppercase
    # too — pinned explicitly anyway).
    oracle="""
    SELECT o_orderkey,
           base64(CAST(o_orderpriority AS BLOB)) AS b64,
           CAST(from_base64(base64(CAST(o_orderpriority AS BLOB))) AS VARCHAR)
               AS roundtrip,
           upper(hex(CAST(o_orderstatus AS BLOB))) AS status_hex,
           length(base64(CAST(o_orderpriority AS BLOB))) AS b64_len
    FROM orders
    WHERE o_orderkey % 17 = 3
    """,
)
def fn_binary_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec scalar family: base64 encode / decode round-trip
    and hex rendering of string payloads — the serialization surface of
    the reference's Kafka record path [K] (opaque payload bytes in,
    printable encodings out), all JVM-side codegen'd expressions.

    Scale notes: pure scan-side work with the key filter pushed to
    parquet; zero shuffles, zero UDFs."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 17 == 3)
    p = F.col("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.base64(p.cast("binary")).alias("b64"),
        F.unbase64(F.base64(p.cast("binary"))).cast("string").alias("roundtrip"),
        F.upper(F.hex(F.col("o_orderstatus").cast("binary"))).alias("status_hex"),
        F.length(F.base64(p.cast("binary"))).alias("b64_len"),
    )


@register(
    "fn_hash_digests",
    # Content-digest family: md5 and sha256 hex digests agree across
    # engines byte-for-byte (both lowercase hex of the same UTF-8
    # input), which is exactly why the engine's dedup/quantization ops
    # use md5 as their portable certified-hash primitive.
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           substr(md5(text), 1, 8) AS md5_prefix,
           md5(concat(source, '|', text)) AS salted_md5
    FROM documents
    WHERE doc_id % 11 = 5
    """,
)
def fn_hash_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digest scalar family: md5 / sha256 hex digests and
    a salted variant — the content-addressing primitive behind
    ``dedup_exact``'s collapse keys, ``embed_quantize_int8``'s code
    certificates and ``multimodal_dedup_phash``'s signatures, exposed
    as a first-class surface (the portable-across-engines property IS
    the feature: any system can re-derive and verify the keys).

    Scale notes: scan-side digest evaluation inside codegen; digests
    shuffle as fixed-width strings (or should be truncated/cast to
    BIGINT for shuffle keys, as the dedup ops do)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 11 == 5)
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
        F.substring(F.md5("text"), 1, 8).alias("md5_prefix"),
        F.md5(F.concat(F.col("source"), F.lit("|"), F.col("text"))).alias(
            "salted_md5"
        ),
    )


#: Derived-URI recipe for fn_uri_parse — richer than curation's URL
#: (optional port, deeper path, multi-param query, optional fragment)
#: so every parse_url part is exercised both present and absent.  One
#: shared constant so the engines can never drift on inputs.
_URI_SQL = (
    "concat('https://', source, '.example.com', "
    "CASE WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END, "
    "'/a/', CAST(doc_id % 7 AS STRING), '/item', "
    "'?id=', CAST(doc_id % 100 AS STRING), '&utm_source=feed', "
    "CASE WHEN doc_id % 3 = 0 THEN '&page=2' ELSE '' END, "
    "CASE WHEN doc_id % 2 = 0 THEN concat('#s', CAST(doc_id % 4 AS STRING)) "
    "ELSE '' END)"
)

_URI_DUCK = (
    "concat('https://', source, '.example.com', "
    "CASE WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END, "
    "'/a/', CAST(doc_id % 7 AS VARCHAR), '/item', "
    "'?id=', CAST(doc_id % 100 AS VARCHAR), '&utm_source=feed', "
    "CASE WHEN doc_id % 3 = 0 THEN '&page=2' ELSE '' END, "
    "CASE WHEN doc_id % 2 = 0 THEN concat('#s', CAST(doc_id % 4 AS VARCHAR)) "
    "ELSE '' END)"
)


@register(
    "fn_uri_parse",
    # Spark's parse_url (java.net.URI semantics) vs DuckDB regexes over
    # the SAME derived URI; absent parts (fragment) are NULL on both
    # sides (NULLIF(...,'') aligns DuckDB's empty-match convention with
    # parse_url's NULL).  The recipe has no userinfo and always has a
    # path+query, so the regex subset is total on its inputs.
    oracle=f"""
    WITH uris AS (
        SELECT doc_id, {_URI_DUCK} AS uri FROM documents
        WHERE doc_id % 4 < 3
    )
    SELECT doc_id, uri,
           regexp_extract(uri, '^([a-z]+)://', 1) AS protocol,
           regexp_extract(uri, '^[a-z]+://([^/?#]*)', 1) AS authority,
           regexp_extract(uri, '^[a-z]+://([^:/?#]*)', 1) AS host,
           regexp_extract(uri, '^[a-z]+://[^/?#]*(/[^?#]*)', 1) AS path,
           regexp_extract(uri, '\\?([^#]*)', 1) AS query,
           NULLIF(regexp_extract(uri, '#(.*)$', 1), '') AS fragment,
           regexp_extract(uri, '[?&]id=([^&#]*)', 1) AS param_id,
           NULLIF(regexp_extract(uri, '[?&]page=([^&#]*)', 1), '')
               AS param_page
    FROM uris
    """,
)
def fn_uri_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URI-parsing scalar family over ``parse_url``: protocol,
    authority (host:port), host, path, query, fragment, and named
    query-parameter extraction — the log-sessionization workhorse.  The
    derived URI exercises every part both present and absent (optional
    port, optional fragment, optional second parameter), and the DuckDB
    twin parses the identical strings with regexes, NULLIF-aligned to
    parse_url's NULL-for-absent convention.

    Scale notes: pure scan-side expressions (parse_url compiles to one
    java.net.URI parse per row inside codegen); zero shuffles, zero
    UDFs.  The regex twin documents the exact public subset parsed —
    no userinfo, mandatory path/query — so the equivalence claim is
    scoped, not accidental."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 4 < 3)
    uris = d.select("doc_id", F.expr(_URI_SQL).alias("uri"))
    u = F.col("uri")
    return uris.select(
        "doc_id",
        "uri",
        F.parse_url(u, F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url(u, F.lit("AUTHORITY")).alias("authority"),
        F.parse_url(u, F.lit("HOST")).alias("host"),
        F.parse_url(u, F.lit("PATH")).alias("path"),
        F.parse_url(u, F.lit("QUERY")).alias("query"),
        F.parse_url(u, F.lit("REF")).alias("fragment"),
        F.parse_url(u, F.lit("QUERY"), F.lit("id")).alias("param_id"),
        F.parse_url(u, F.lit("QUERY"), F.lit("page")).alias("param_page"),
    )


@register(
    "fn_interval_arith",
    # Interval arithmetic minefield, pinned: DuckDB `+ INTERVAL n
    # MONTH` end-of-month clamps exactly like Spark add_months (probed
    # in fn_date); day intervals are exact on DATE; next-Friday has no
    # DuckDB builtin and is derived from isodow — Spark's next_day
    # is strictly-after semantics (Friday -> +7), mirrored by the
    # (11 - isodow) % 7 + 1 rebase.
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE)
               AS plus_90d,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 30 DAY AS DATE)
               AS minus_30d,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 6 MONTH AS DATE)
               AS plus_6m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(day(last_day(CAST(o_orderdate AS DATE))) AS INTEGER)
               AS days_in_month,
           CAST(CAST(o_orderdate AS DATE)
                + to_days(CAST((11 - isodow(o_orderdate)) % 7 + 1 AS INTEGER))
                AS DATE) AS next_friday,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '2002-01-01') // 7 AS INTEGER)
               AS full_weeks_to_2002
    FROM orders
    WHERE o_orderkey % 11 = 3
    """,
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-arithmetic scalar family: day/month interval shifts
    (with the end-of-month clamp both engines share), last-day /
    days-in-month, strictly-next Friday, and whole-week distances —
    the due-date / SLA arithmetic every fulfillment query leans on.

    Scale notes: scan-side codegen with the key filter pushed down;
    zero shuffles.  The dialect landmines are the documentation:
    DuckDB has no next_day (derived via isodow: (11−isodow)%7+1 days
    ahead reproduces Spark's strictly-after Friday), and integer week
    distance uses truncating division on exact day counts."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 11 == 3)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("order_date"),
        F.date_add(d, 90).alias("plus_90d"),
        F.date_sub(d, 30).alias("minus_30d"),
        F.add_months(d, 6).alias("plus_6m"),
        F.last_day(d).alias("month_end"),
        F.dayofmonth(F.last_day(d)).cast("int").alias("days_in_month"),
        F.next_day(d, "FRI").alias("next_friday"),
        F.expr(
            "CAST(datediff(DATE '2002-01-01', CAST(o_orderdate AS DATE))"
            " div 7 AS INT)"
        ).alias("full_weeks_to_2002"),
    )


@register(
    "fn_geo_haversine",
    # Geospatial scalar family: synthetic-but-deterministic coords from
    # the `join_geo_grid` coprime recipe (0.01-degree fixed point);
    # haversine + meridian distances ROUND to whole meters (double
    # inputs are identical rationals, trig ulp noise is ~1e-9 m — far
    # from the rounding boundary); bbox and grid-cell are pure integer
    # arithmetic.
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey * 7919) % 12001 - 6000 AS lat_cdeg,
               (c_custkey * 104729) % 36001 - 18000 AS lon_cdeg
        FROM customer WHERE c_custkey % 5 = 0
    )
    SELECT c_custkey,
           CAST(lat_cdeg AS BIGINT) AS lat_cdeg,
           CAST(lon_cdeg AS BIGINT) AS lon_cdeg,
           CAST(ROUND(12742000.0 * asin(sqrt(
               pow(sin(radians((CAST(lat_cdeg AS DOUBLE) / 100.0 - 51.48)
                               / 2)), 2)
               + cos(radians(CAST(lat_cdeg AS DOUBLE) / 100.0))
                 * cos(radians(51.48))
                 * pow(sin(radians(CAST(lon_cdeg AS DOUBLE) / 100.0 / 2)), 2)
           ))) AS BIGINT) AS hav_ref_m,
           CAST(ROUND(abs(CAST(lat_cdeg AS DOUBLE)) * 1111.949266445587)
                AS BIGINT) AS meridian_m,
           CAST(CASE WHEN lat_cdeg BETWEEN -1000 AND 1000
                      AND lon_cdeg BETWEEN -2000 AND 2000
                     THEN 1 ELSE 0 END AS INTEGER) AS in_bbox,
           CAST((lat_cdeg + 6000) // 100 * 1000
                + (lon_cdeg + 18000) // 100 AS BIGINT) AS cell_id
    FROM pts
    """,
)
def fn_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial scalar family: great-circle (haversine) distance to a
    reference point, meridian distance from the equator, bounding-box
    membership, and the radius-sized grid-cell id — the per-row geo
    toolkit under any spatial filter or distance join.  Coordinates are
    the deterministic 0.01-degree fixed-point synthesis shared with
    `join_geo_grid` (fixtures carry no geo columns).

    Exactness: the fixed-point coords, bbox flag, and cell id never
    touch floats; the two distances are ONE rounded float expression
    each, written with identical association on both engines — inputs
    are identical two-decimal rationals, so cross-engine libm ulp
    differences perturb a ~1e7 m value by ~1e-9 m, nine orders from
    the half-meter rounding boundary.  The cell id shifts operands
    non-negative before ``div`` (the sign-boundary rule).

    Scale notes: pure scan-side codegen over a pushed key filter — no
    shuffle, no UDF; at 100 TB this is a whole-stage-codegen map over
    the pruned scan, and the cell id feeds `join_geo_grid`'s
    equi-join recipe."""
    c = load_table(spark, sf_dir, "customer").where(
        F.expr("c_custkey % 5 = 0")
    )
    pts = c.select(
        "c_custkey",
        F.expr("(c_custkey * 7919) % 12001 - 6000").alias("lat_cdeg"),
        F.expr("(c_custkey * 104729) % 36001 - 18000").alias("lon_cdeg"),
    )
    return pts.select(
        "c_custkey",
        F.col("lat_cdeg").cast("long").alias("lat_cdeg"),
        F.col("lon_cdeg").cast("long").alias("lon_cdeg"),
        F.expr(
            "CAST(ROUND(12742000.0 * asin(sqrt("
            "pow(sin(radians((CAST(lat_cdeg AS DOUBLE) / 100.0 - 51.48)"
            " / 2)), 2)"
            " + cos(radians(CAST(lat_cdeg AS DOUBLE) / 100.0))"
            " * cos(radians(51.48))"
            " * pow(sin(radians(CAST(lon_cdeg AS DOUBLE) / 100.0 / 2)), 2)"
            "))) AS BIGINT)"
        ).alias("hav_ref_m"),
        F.expr(
            "CAST(ROUND(abs(CAST(lat_cdeg AS DOUBLE)) * 1111.949266445587)"
            " AS BIGINT)"
        ).alias("meridian_m"),
        F.expr(
            "CAST(CASE WHEN lat_cdeg BETWEEN -1000 AND 1000"
            " AND lon_cdeg BETWEEN -2000 AND 2000"
            " THEN 1 ELSE 0 END AS INTEGER)"
        ).alias("in_bbox"),
        F.expr(
            "CAST((lat_cdeg + 6000) div 100 * 1000"
            " + (lon_cdeg + 18000) div 100 AS BIGINT)"
        ).alias("cell_id"),
    )


def _ip_int(s: str) -> int:
    a, b, c, d = (int(x) for x in s.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


#: CIDR routing table: (name, base dotted-quad, prefix length).  The
#: prefixes NEST three deep (default/0 ⊃ half-high/1 ⊃ quarter-160/3 ⊃
#: slice-168/5) so longest-prefix-match is decisive at every depth for
#: a uniform address space, and every block gets a real population at
#: sf0.01 (a first-draft table of RFC-1918 privates matched ~0 rows —
#: uniform addresses almost never land in /12s; non-degeneracy audit).
_CIDR_BLOCKS = (
    ("net-10/8", "10.0.0.0", 8),
    ("slice-168/5", "168.0.0.0", 5),
    ("quarter-160/3", "160.0.0.0", 3),
    ("half-high/1", "128.0.0.0", 1),
    ("default/0", "0.0.0.0", 0),
)

#: Distinct prefix lengths, with the per-length shift (2^(32-p)) and the
#: per-block truncated key precomputed in Python so BOTH engines join on
#: literal integers — no runtime power/shift arithmetic to misalign.
_CIDR_KEYED = tuple(
    (name, base, p, _ip_int(base) // (1 << (32 - p)) if p else 0)
    for name, base, p in _CIDR_BLOCKS
)


@register(
    "fn_ip_cidr",
    # IPv4 / CIDR arithmetic family: parse, format, truncate, and
    # longest-prefix-match — all pure integer div/mod over a synthetic
    # 32-bit address (md5-derived from c_custkey, so the address space
    # is uniformly exercised), against a literal 5-block routing table
    # with Python-precomputed (prefix, truncated-base) join keys.
    oracle=f"""
    WITH ips AS (
        SELECT c_custkey,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
                    AS BIGINT) % 4294967296 AS ip
        FROM customer
    ), blocks(name, prefix_len, shift, key) AS (VALUES
        {", ".join(f"('{n}', {p}, {1 << (32 - p)}, {k})" for n, _, p, k in _CIDR_KEYED)}
    ), matched AS (
        SELECT i.c_custkey, i.ip, b.name, b.prefix_len,
               ROW_NUMBER() OVER (PARTITION BY i.c_custkey
                                  ORDER BY b.prefix_len DESC) AS pref_rank
        FROM ips i JOIN blocks b ON i.ip // b.shift = b.key
    ), lpm AS (
        SELECT * FROM matched WHERE pref_rank = 1
    )
    SELECT name AS block, CAST(prefix_len AS BIGINT) AS prefix_len,
           CAST(COUNT(*) AS BIGINT) AS n_ips,
           CAST(MIN(ip) AS BIGINT) AS min_ip_int,
           CAST(MAX(ip) AS BIGINT) AS max_ip_int,
           CAST(MIN(ip) // 16777216 AS VARCHAR) || '.' ||
           CAST(MIN(ip) // 65536 % 256 AS VARCHAR) || '.' ||
           CAST(MIN(ip) // 256 % 256 AS VARCHAR) || '.' ||
           CAST(MIN(ip) % 256 AS VARCHAR) AS min_ip_str
    FROM lpm GROUP BY 1, 2 ORDER BY prefix_len DESC, block
    """,
)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 / CIDR scalar family — the network-log workhorse missing
    from vanilla SQL: address↔integer conversion, dotted-quad
    formatting, prefix truncation, CIDR membership, and
    longest-prefix-match classification against a routing table.  Each
    customer key is deterministically mapped to a 32-bit address
    (md5-derived, both engines), matched against the literal 5-block
    table by integer-division equality on Python-precomputed
    (shift, key) pairs, and classified by the ROUTER rule: the most
    specific (longest-prefix) matching block wins, which the
    disjoint-privates + catch-all-default table makes observable.

    Scale notes: the per-length truncations make CIDR matching an
    EQUI-join against the tiny keyed table (the classic LPM-as-join
    rewrite; no inequality predicate, no BNL): each address emits
    |distinct prefix lengths| = 5 truncation rows, the join is a
    5-row broadcast, and LPM is a c_custkey-partitioned keyed window.
    The final rollup is ≤5 rows; formatting runs on the rollup."""
    c = load_table(spark, sf_dir, "customer")
    ips = c.select(
        "c_custkey",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(4294967296),
        ).alias("ip"),
    )
    blocks = spark.createDataFrame(
        [(n, p, k) for n, _, p, k in _CIDR_KEYED],
        "name string, prefix_len int, key long",
    )
    # LPM-as-equi-join: each address emits its truncation at every
    # prefix length in the table (literal shifts, so `ip div shift`
    # never references the build side and the join stays a hash join,
    # not a BNL).
    trunc = ips.select(
        "c_custkey",
        "ip",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("prefix_len"),
                        F.expr(f"ip div {1 << (32 - p)}").alias("trunc")
                        if p
                        else F.lit(0).cast("long").alias("trunc"),
                    )
                    for _, _, p, _ in _CIDR_KEYED
                ]
            )
        ).alias("t"),
    ).select(
        "c_custkey", "ip", F.col("t.prefix_len").alias("prefix_len"),
        F.col("t.trunc").alias("trunc"),
    )
    matched = trunc.join(
        F.broadcast(blocks),
        (trunc.prefix_len == blocks.prefix_len)
        & (trunc.trunc == blocks.key),
    ).drop(blocks.prefix_len)
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_custkey").orderBy(F.desc("prefix_len"))
    lpm = matched.withColumn("pref_rank", F.row_number().over(w)).where(
        F.col("pref_rank") == 1
    )
    quad = (
        F.concat_ws(
            ".",
            F.expr("min(ip) div 16777216").cast("string"),
            F.expr("min(ip) div 65536 % 256").cast("string"),
            F.expr("min(ip) div 256 % 256").cast("string"),
            F.expr("min(ip) % 256").cast("string"),
        )
    )
    return (
        lpm.groupBy(F.col("name").alias("block"), "prefix_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ips"),
            F.min("ip").cast("long").alias("min_ip_int"),
            F.max("ip").cast("long").alias("max_ip_int"),
            quad.alias("min_ip_str"),
        )
        .select(
            "block",
            F.col("prefix_len").cast("long").alias("prefix_len"),
            "n_ips",
            "min_ip_int",
            "max_ip_int",
            "min_ip_str",
        )
        .orderBy(F.desc("prefix_len"), "block")
    )


@register(
    "fn_luhn_checksum",
    # Luhn mod-10 validation of deterministically injected card-like
    # tokens: doc_id%2==0 docs carry a VALID 16-digit number (15 base
    # digits from doc_id arithmetic + the computed check digit),
    # doc_id%4==1 carry a CORRUPTED one (+1 on the last base digit),
    # the rest carry none.  The digit fold (double every second digit
    # from the right, subtract 9 past 9, sum mod 10) is identical
    # integer arithmetic on both engines.
    oracle="""
    WITH staged AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 2 = 0 OR doc_id % 4 = 1
                    THEN lpad(CAST(400000000000000 + doc_id * 37
                                   + CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0
                                     END AS VARCHAR), 15, '0')
               END AS base15
        FROM documents
    ), summed AS (
        SELECT doc_id, source, base15,
               list_sum(list_transform(range(1, 16), i ->
                   CASE WHEN (15 - i) % 2 = 0
                        THEN CASE WHEN CAST(base15[i] AS INT) * 2 > 9
                                  THEN CAST(base15[i] AS INT) * 2 - 9
                                  ELSE CAST(base15[i] AS INT) * 2 END
                        ELSE CAST(base15[i] AS INT) END)) AS s
        FROM staged WHERE base15 IS NOT NULL
    ), tokens AS (
        -- check digit computed from the UNCORRUPTED doc_id so the
        -- %4==1 corruption genuinely breaks the checksum
        SELECT st.doc_id, st.source,
               st.base15 || CAST((10 - (
                   SELECT list_sum(list_transform(range(1, 16), i ->
                       CASE WHEN (15 - i) % 2 = 0
                            THEN CASE WHEN CAST(b[i] AS INT) * 2 > 9
                                      THEN CAST(b[i] AS INT) * 2 - 9
                                      ELSE CAST(b[i] AS INT) * 2 END
                            ELSE CAST(b[i] AS INT) END))
                   FROM (SELECT lpad(CAST(400000000000000 + st.doc_id * 37
                                          AS VARCHAR), 15, '0') AS b)
               ) % 10) % 10 AS VARCHAR) AS tok
        FROM summed st
    ), validated AS (
        SELECT doc_id, source,
               CASE WHEN list_sum(list_transform(range(1, 17), i ->
                        CASE WHEN (16 - i) % 2 = 1
                             THEN CASE WHEN CAST(tok[i] AS INT) * 2 > 9
                                       THEN CAST(tok[i] AS INT) * 2 - 9
                                       ELSE CAST(tok[i] AS INT) * 2 END
                             ELSE CAST(tok[i] AS INT) END)) % 10 = 0
                    THEN 'valid' ELSE 'invalid' END AS status
        FROM tokens
    ), labeled AS (
        SELECT d.doc_id, d.source, COALESCE(v.status, 'none') AS status
        FROM documents d LEFT JOIN validated v ON v.doc_id = d.doc_id
    )
    SELECT source, status,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM labeled
    GROUP BY source, status
    ORDER BY source, status
    """,
)
def fn_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn mod-10 checksum validation (ISO/IEC 7812, public) — the
    payment-card-token detector a PII/data-quality scan runs beside
    `text_pii_redact`'s regex pass: a 16-digit match is only a card
    number if its check digit verifies, and the checksum cuts regex
    false positives by ~90%.  Fixture text carries no numbers, so both
    sides stage deterministic tokens (the `text_normalize` mangle
    rule): half the docs carry a VALID Luhn token (15 digits from
    doc_id arithmetic plus the computed check digit), a quarter carry
    the same token with one corrupted digit, the rest none — the
    validator must recover exactly that partition (pytest-pinned per
    residue class).

    The fold (double every second digit from the right, subtract 9
    above 9, sum ≡ 0 mod 10) is a scan-side transform/aggregate over a
    16-element literal sequence — pure integer arithmetic, identical
    on both engines.

    Scale notes: scan-side codegen'd expressions, zero shuffle, ONE
    (source, status) rollup."""
    d = load_table(spark, sf_dir, "documents")

    def luhn_sum(col: Column, length: int) -> Column:
        # positions counted from the RIGHT of the final 16-digit token:
        # for a 15-digit base (check digit appended later) position i
        # (1-based from left) has right-offset (length - i) + 1 in the
        # final token, so doubling applies when (length - i) % 2 == 0
        # for the base and (16 - i) % 2 == 1 for the full token.
        # STATICALLY UNROLLED (a Python loop over literal positions,
        # not transform/aggregate): higher-order functions run
        # INTERPRETED per row in Spark — the HOF form measured 0.38 ms
        # per row (10 s at sf1); 16 plain when-expressions stay inside
        # whole-stage codegen.
        parity = 0 if length == 15 else 1
        total = F.lit(0)
        for i in range(1, length + 1):
            dig = F.substring(col, i, 1).cast("int")
            doubled = F.when(dig * 2 > 9, dig * 2 - 9).otherwise(dig * 2)
            total = total + (
                doubled if (length - i) % 2 == parity else dig
            )
        return total

    # Intermediates materialize as COLUMNS between selects: inlining
    # them nests the whole token subtree into each of the 16 digit
    # extractions (the check digit alone embeds a 15-term fold), which
    # blew past whole-stage codegen into interpreted fallback —
    # measured 12 s at sf0.1 before this staging.
    staged = d.select(
        "doc_id",
        "source",
        F.lpad(
            (F.lit(400000000000000) + F.col("doc_id") * 37).cast("string"),
            15,
            "0",
        ).alias("clean15"),
        F.lpad(
            (
                F.lit(400000000000000)
                + F.col("doc_id") * 37
                + F.when(F.col("doc_id") % 4 == 1, 1).otherwise(0)
            ).cast("string"),
            15,
            "0",
        ).alias("staged15"),
    )
    with_tok = staged.select(
        "doc_id",
        "source",
        F.concat(
            F.col("staged15"),
            ((10 - luhn_sum(F.col("clean15"), 15) % 10) % 10).cast("string"),
        ).alias("tok"),
    )
    has_tok = (F.col("doc_id") % 2 == 0) | (F.col("doc_id") % 4 == 1)
    status = (
        F.when(~has_tok, "none")
        .when(luhn_sum(F.col("tok"), 16) % 10 == 0, "valid")
        .otherwise("invalid")
    )
    return (
        with_tok.select("source", status.alias("status"))
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("source", "status")
    )
