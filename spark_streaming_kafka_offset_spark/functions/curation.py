"""Corpus-curation operators (r6 batch) — §2.18.

The data-engineering layer of a training-data pipeline that sits ABOVE
the per-document quality signals (functions/text.py): URL
canonicalization + URL-level dedup, per-source token budgeting, mixture
planning across languages, corpus-level n-gram novelty, and blocked
entity resolution.  Everything is deterministic integer/regex work so
every operator carries a DuckDB oracle twin.

Reference parity [K]: no citation into /root/reference possible (mirror
empty, SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..session import load_table
from .text import _JACCARD_PAIRS_SQL

#: Derived-URL recipe shared by both engines (the fixtures carry no URL
#: column, so the op derives one deterministically from (source, doc_id)
#: and then proves the PARSING path: scheme strip, www strip, tracking-
#: param removal, canonical dedup).  Kept as one module constant so the
#: Spark and DuckDB sides can never drift.
#: Path/id moduli (35, 4) are chosen so canonical collisions actually
#: occur: canon = (source, doc_id%35, doc_id%4) repeats with period
#: lcm(20, 35, 4) = 140 under the fixtures' 20-source doc_id cycle, so
#: docs {d, d+140, d+280, ...} collapse to one canonical URL while their
#: raw urls still differ in the www/tracking decorations — without this
#: alignment every canonical group had size 1 and the dedup semantics
#: were vacuous (audited at sf0.01).
_URL_SQL = (
    "concat('https://', CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END, "
    "source, '.example.com/p/', CAST(doc_id % 35 AS STRING), "
    "'?utm_source=feed&id=', CAST(doc_id % 4 AS STRING), "
    "CASE WHEN doc_id % 2 = 0 THEN '&ref=tw' ELSE '' END)"
)
_URL_DUCK = (
    "concat('https://', CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END, "
    "source, '.example.com/p/', CAST(doc_id % 35 AS VARCHAR), "
    "'?utm_source=feed&id=', CAST(doc_id % 4 AS VARCHAR), "
    "CASE WHEN doc_id % 2 = 0 THEN '&ref=tw' ELSE '' END)"
)


@register(
    "text_url_canonicalize",
    # Host/path/query parsing via the RE2-and-Java-regex common subset
    # (no lookarounds, no backrefs); tracking params (utm_*, ref)
    # removed by rebuilding the query from the kept params only.
    oracle=f"""
    WITH urls AS (
        SELECT doc_id, {_URL_DUCK} AS url FROM documents
    ), parsed AS (
        SELECT doc_id, url,
               lower(regexp_replace(
                   regexp_extract(url, 'https?://([^/]+)', 1),
                   '^www\\.', '')) AS host,
               regexp_extract(url, 'https?://[^/]+(/[^?#]*)', 1) AS path,
               regexp_extract(url, 'id=([0-9]+)', 1) AS kept_id
        FROM urls
    ), canon AS (
        SELECT doc_id, url, host, path,
               concat(host, path, '?id=', kept_id) AS canon_url
        FROM parsed
    )
    SELECT doc_id, url, host, path, canon_url,
           CAST(COUNT(*) OVER (PARTITION BY canon_url) AS BIGINT)
               AS canon_group_size
    FROM canon
    """,
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + canonical-group sizing — the first gate of
    any web-scale crawl pipeline: strip scheme and ``www.``, lowercase
    the host, drop tracking parameters (``utm_*``, ``ref``), keep the
    identifying ones, then size each canonical group (group size > 1 =
    URL-level duplicates to collapse before any content hashing runs).

    Scale notes: parsing is per-row scan-side regex (whole-stage
    codegen, no UDF); the only shuffle is the canonical-group count —
    keyed on the canonical URL, the same partitioning a downstream
    ``dedup_exact`` collapse would reuse.  The derived-URL recipe is a
    shared module constant so both engines parse identical inputs."""
    d = load_table(spark, sf_dir, "documents")
    urls = d.select("doc_id", F.expr(_URL_SQL).alias("url"))
    parsed = urls.select(
        "doc_id",
        "url",
        F.lower(
            F.regexp_replace(
                F.regexp_extract("url", r"https?://([^/]+)", 1), r"^www\.", ""
            )
        ).alias("host"),
        F.regexp_extract("url", r"https?://[^/]+(/[^?#]*)", 1).alias("path"),
        F.regexp_extract("url", r"id=([0-9]+)", 1).alias("kept_id"),
    )
    canon = parsed.select(
        "doc_id",
        "url",
        "host",
        "path",
        F.concat(F.col("host"), F.col("path"), F.lit("?id="), F.col("kept_id")).alias(
            "canon_url"
        ),
    )
    return canon.select(
        "doc_id",
        "url",
        "host",
        "path",
        "canon_url",
        F.count("*")
        .over(Window.partitionBy("canon_url"))
        .cast("long")
        .alias("canon_group_size"),
    )


@register(
    "corpus_token_budget",
    # Greedy budget admission: per source, admit docs in (tokens DESC,
    # doc_id) order while the running token total stays <= 150.  The
    # cumsum is integer, the order is total, so the admitted set is
    # deterministic in both engines.
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        FROM documents
    ), ranked AS (
        SELECT doc_id, source, tokens,
               SUM(tokens) OVER (PARTITION BY source
                                 ORDER BY tokens DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM toks
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN cum <= 150 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_admitted,
           CAST(SUM(CASE WHEN cum <= 150 THEN tokens ELSE 0 END) AS BIGINT)
               AS admitted_tokens,
           CAST(SUM(tokens) AS BIGINT) AS avail_tokens
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget admission: order documents by token count
    (quality proxy; any score column slots in), admit greedily while the
    per-source running total stays inside the budget — how a pretraining
    mix caps over-represented sources at a fixed token allowance.

    Scale notes: ONE shuffle on the source key; the cumsum window is
    partitioned by source (never global).  A skewed mega-source makes
    one partition hot — the mitigation is the documented two-pass
    range-partitioned rank (``common.global_row_number``) within that
    source, or pre-capping with ``detect_hot_keys``.  Token counting is
    scan-side ``size(split(..))`` — no UDF, no materialized token
    arrays past the scan."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("tokens").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = toks.withColumn("cum", F.sum("tokens").over(w))
    admitted = F.col("cum") <= 150
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(admitted, 1).otherwise(0)).cast("long").alias("n_admitted"),
            F.sum(F.when(admitted, F.col("tokens")).otherwise(0))
            .cast("long")
            .alias("admitted_tokens"),
            F.sum("tokens").cast("long").alias("avail_tokens"),
        )
        .orderBy("source")
    )


@register(
    "corpus_mixture_plan",
    # Uniform-target mixture: the bottleneck language (min available
    # tokens) sets the per-language sampling weight L/avail, carried as
    # integer parts-per-million so expected token counts stay in exact
    # integer arithmetic end-to-end.
    oracle="""
    WITH avail AS (
        SELECT lang,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS avail_tokens
        FROM documents GROUP BY lang
    ), floor_lang AS (
        SELECT lang, avail_tokens,
               MIN(avail_tokens) OVER () AS target_tokens
        FROM avail
    )
    SELECT lang, avail_tokens,
           CAST(target_tokens AS BIGINT) AS target_tokens,
           CAST(target_tokens * 1000000 // avail_tokens AS BIGINT)
               AS weight_ppm,
           CAST(avail_tokens * (target_tokens * 1000000 // avail_tokens)
                // 1000000 AS BIGINT) AS expected_tokens
    FROM floor_lang
    ORDER BY lang
    """,
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture plan for a uniform target: the scarcest language
    is the bottleneck, every other language gets a down-sampling weight
    of target/available (parts-per-million integer), and the expected
    post-sampling token count is reported per language — the planning
    step before ``lang_balanced_sample`` executes the draw.

    Scale notes: the corpus collapses to ONE |langs|-row rollup in a
    single hash aggregate; the global-min window runs on that rollup
    (allowlisted single-partition exchange of ~5 rows).  Weights are
    ppm integers via `div` — both engines agree exactly, no float
    fraction ever decides a token count."""
    d = load_table(spark, sf_dir, "documents")
    avail = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("avail_tokens")
    )
    floor_lang = avail.withColumn(
        "target_tokens", F.min("avail_tokens").over(Window.partitionBy())
    )
    return floor_lang.select(
        "lang",
        "avail_tokens",
        F.col("target_tokens").cast("long").alias("target_tokens"),
        F.expr("target_tokens * 1000000 div avail_tokens").alias("weight_ppm"),
        F.expr(
            "avail_tokens * (target_tokens * 1000000 div avail_tokens) div 1000000"
        ).alias("expected_tokens"),
    ).orderBy("lang")


@register(
    "text_ngram_novelty",
    # Novelty = share of a doc's DISTINCT word trigrams appearing in no
    # other document (corpus df == 1).  Distinct-within-doc first, so a
    # doc repeating its own trigram cannot inflate the df.
    oracle="""
    WITH grams AS (
        SELECT DISTINCT doc_id, g
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1] || ' ' ||
                            string_split(text, ' ')[i+2])) AS g
            FROM documents
            WHERE len(string_split(text, ' ')) >= 3
        )
    ), df AS (
        SELECT g, COUNT(*) AS n_docs_with FROM grams GROUP BY g
    )
    SELECT grams.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df.n_docs_with = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique,
           ROUND(CAST(SUM(CASE WHEN df.n_docs_with = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
    FROM grams JOIN df ON grams.g = df.g
    GROUP BY grams.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    distinct word trigrams that appear in NO other document — the
    flip side of ``contamination_check``/``text_repetition``: high
    novelty marks fresh content worth keeping, near-zero novelty marks
    boilerplate assembled from corpus-common phrases.

    Scale notes: trigrams shuffle once keyed on the gram for the
    document-frequency count, then once back on doc_id for the rollup —
    the same two-shuffle posture as text_tfidf.  At 100 TB the gram key
    should travel as a 64-bit hash (xxhash64) instead of the string;
    kept as the string here so the oracle twin stays expressible.  The
    within-doc DISTINCT collapses repeated phrases map-side before the
    first shuffle."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    # Split ONCE into a named column: the inline form re-evaluated
    # split(text) four times per row (sequence bound + three lambda
    # accesses) — measured in the r6 sf1 sweep as part of a 7.6x
    # growth.  Grams then travel as 64-bit xxhash64 keys through the
    # df shuffle and join (8 bytes vs ~20-char strings); the output
    # depends only on COUNTS per gram, so hashing the key cannot
    # change results short of a 64-bit collision (~1e-12 at 1e5
    # distinct grams — and a collision would be deterministic, not
    # flaky; the oracle keeps the string key as the semantic
    # definition).
    grams = (
        d.where(F.size(w) >= 3)
        .select("doc_id", w.alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 3), "
                    "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"
                )
            ).alias("g"),
        )
        .select("doc_id", F.xxhash64("g").alias("gh"))
        .distinct()
    )
    df = grams.groupBy("gh").agg(F.count("*").alias("n_docs_with"))
    return (
        grams.join(df, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("n_docs_with") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
            F.round(
                F.sum(F.when(F.col("n_docs_with") == 1, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


@register(
    "entity_resolution_blocked",
    # Blocked fuzzy matching: block on the head noun (the second token
    # of 'adjective noun' part names), pair within a block only, match
    # at levenshtein <= 4 with a canonical a < b ordering.
    oracle="""
    WITH names AS (
        SELECT DISTINCT p_name,
               string_split(p_name, ' ')[2] AS block_key
        FROM part
    )
    SELECT a.block_key,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev
    FROM names a JOIN names b
      ON a.block_key = b.block_key AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    ORDER BY a.block_key, name_a, name_b
    """,
)
def entity_resolution_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity resolution over product names: candidate pairs
    are generated ONLY within a blocking key (the head noun), then
    scored with edit distance — the classic record-linkage shape
    (Fellegi-Sunter blocking) that turns an O(n^2) name comparison
    into per-block work.

    Scale notes: the self-join is an equi-join on the block key — no
    cartesian anywhere (plan-audited engine-wide).  Block-size skew is
    THE production risk: a degenerate key ('widget') quadratically
    dominates — at 100 TB, cap or salt hot blocks first
    (``detect_hot_keys``) or refine the key (noun + first adjective
    char).  Distinct-names-first collapses the corpus to the entity
    vocabulary before any pairing."""
    p = load_table(spark, sf_dir, "part")
    names = p.select(
        "p_name", F.split("p_name", " ").getItem(1).alias("block_key")
    ).distinct()
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 4)
        .select(
            F.col("a.block_key").alias("block_key"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("long")
            .alias("lev"),
        )
        .orderBy("block_key", "name_a", "name_b")
    )


@register(
    "docs_curriculum_order",
    # Deterministic curriculum position WITHOUT a global sort: rank
    # within language (partitioned window), then interleave across
    # languages arithmetically — pos = (rank-1)*|langs| + lang_index.
    # Positions are collision-free by construction (pos mod |langs|
    # recovers the language).
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id) AS rank_in_lang
        FROM documents
    ), langs AS (
        SELECT lang AS l,
               ROW_NUMBER() OVER (ORDER BY lang) - 1 AS lang_index,
               COUNT(*) OVER () AS n_langs
        FROM (SELECT DISTINCT lang FROM documents)
    )
    SELECT r.doc_id, r.lang,
           CAST(r.rank_in_lang AS BIGINT) AS rank_in_lang,
           CAST((r.rank_in_lang - 1) * langs.n_langs + langs.lang_index
                AS BIGINT) AS curriculum_pos
    FROM ranked r JOIN langs ON r.lang = langs.l
    """,
)
def docs_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training: documents ranked by a quality
    proxy (length) within each language, then round-robin interleaved
    across languages into one global position — every language's best
    docs lead, no language starves, and the schedule is reproducible
    run-to-run.

    Scale notes: the global total order is computed WITHOUT a global
    sort — the only corpus-sized operations are the per-language rank
    window (partitioned shuffle) and a broadcast join against the
    |langs|-row index frame; the interleave is pure arithmetic.  This
    is the scale-safe alternative to `ORDER BY quality` over the whole
    corpus (a single-task sort at 100 TB; cf. common.global_row_number
    when a true dense global rank is required)."""
    d = load_table(spark, sf_dir, "documents")
    wr = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = d.select(
        "doc_id", "lang", F.row_number().over(wr).alias("rank_in_lang")
    )
    wl = Window.orderBy("lang")
    langs = (
        d.select("lang")
        .distinct()
        .select(
            F.col("lang").alias("l"),
            (F.row_number().over(wl) - 1).alias("lang_index"),
            F.count("*").over(Window.partitionBy()).alias("n_langs"),
        )
    )
    return ranked.join(F.broadcast(langs), ranked.lang == langs.l).select(
        "doc_id",
        "lang",
        F.col("rank_in_lang").cast("long").alias("rank_in_lang"),
        ((F.col("rank_in_lang") - 1) * F.col("n_langs") + F.col("lang_index"))
        .cast("long")
        .alias("curriculum_pos"),
    )


@register(
    "corpus_source_similarity",
    # Source-level vocabulary Jaccard: candidates via the gram
    # equi-join (per-gram source lists are bounded by |sources|), the
    # same candidate-generation posture as graph_common_neighbors with
    # the roles swapped (shared vocabulary instead of shared time).
    oracle="""
    WITH grams AS (
        SELECT DISTINCT source, g
        FROM (
            SELECT source,
                   unnest(list_transform(
                       range(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1] || ' ' ||
                            string_split(text, ' ')[i+2])) AS g
            FROM documents
            WHERE len(string_split(text, ' ')) >= 3
        )
    ), deg AS (
        SELECT source, COUNT(*) AS n_grams FROM grams GROUP BY source
    ), pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS n_shared
        FROM grams a JOIN grams b
          ON a.g = b.g AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT p.source_a, p.source_b,
           CAST(p.n_shared AS BIGINT) AS n_shared,
           CAST(da.n_grams AS BIGINT) AS grams_a,
           CAST(db.n_grams AS BIGINT) AS grams_b,
           ROUND(CAST(p.n_shared AS DOUBLE)
                 / CAST(da.n_grams + db.n_grams - p.n_shared AS DOUBLE), 6)
               AS jaccard
    FROM pairs p
    JOIN deg da ON p.source_a = da.source
    JOIN deg db ON p.source_b = db.source
    """,
)
def corpus_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source similarity by shared trigram vocabulary — the
    corpus-cartography readout behind "these two crawls are the same
    site" / "this source is a mirror" decisions, upstream of any
    per-document dedup.

    Scale notes: the corpus collapses to the DISTINCT (source, gram)
    frame first (grams travel as xxhash64 keys — the
    text_ngram_novelty fix); pair candidates come from the gram
    equi-join whose fanout is sum-over-grams of C(sources-with-gram, 2)
    — bounded by |sources|^2 per gram, never |docs|^2.  A
    universally-shared gram is the hot key; with 20 sources the worst
    per-gram fanout is C(20,2)=190, constant.  The degree join is a
    |sources|-row broadcast."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    grams = (
        d.where(F.size(w) >= 3)
        .select("source", w.alias("w"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 3), "
                    "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"
                )
            ).alias("g"),
        )
        .select("source", F.xxhash64("g").alias("gh"))
        .distinct()
    )
    deg = grams.groupBy("source").agg(F.count("*").alias("n_grams"))
    a = grams.select(F.col("source").alias("source_a"), "gh")
    b = grams.select(F.col("source").alias("source_b"), F.col("gh").alias("gh_b"))
    pairs = (
        a.join(b, (a.gh == b.gh_b) & (a.source_a < b.source_b))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    da = deg.select(F.col("source").alias("sa"), F.col("n_grams").alias("grams_a"))
    db = deg.select(F.col("source").alias("sb"), F.col("n_grams").alias("grams_b"))
    return (
        pairs.join(F.broadcast(da), pairs.source_a == da.sa)
        .join(F.broadcast(db), pairs.source_b == db.sb)
        .select(
            "source_a",
            "source_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("grams_a").cast("long").alias("grams_a"),
            F.col("grams_b").cast("long").alias("grams_b"),
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("grams_a") + F.col("grams_b") - F.col("n_shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "corpus_heaps_curve",
    # Vocabulary-growth (Heaps'-law) curve via the first-seen collapse:
    # each distinct trigram contributes at its MIN doc position (a
    # mergeable aggregate — never a running distinct over the corpus),
    # bucketed by 50-doc corpus position; the cumulative curve is a
    # window over the position rollup.
    oracle="""
    WITH grams AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2])) AS g
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ), first_seen AS (
        SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
    ), buckets AS (
        SELECT first_doc // 50 AS pos_bucket,
               CAST(COUNT(*) AS BIGINT) AS new_types
        FROM first_seen GROUP BY pos_bucket
    )
    SELECT CAST(pos_bucket AS BIGINT) AS pos_bucket, new_types,
           CAST(SUM(new_types) OVER (ORDER BY pos_bucket
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_types
    FROM buckets
    ORDER BY pos_bucket
    """,
)
def corpus_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth curve (Heaps' law): how many NEW trigram types
    each 50-document slice of the corpus contributes, plus the
    cumulative type count — the saturation readout behind "is more of
    this source still adding new content?" dedup/acquisition decisions
    (a flattening curve = the source is mined out).

    Scale notes: the running-distinct trap is avoided by the first-seen
    collapse — MIN(doc_id) per gram is a mergeable aggregate on the
    gram key (grams travel as xxhash64 longs), the bucket rollup is
    corpus-position-sized, and the cumsum window runs on that rollup
    (allowlisted single-partition exchange).  Same pattern as
    `events_new_users_daily` for users."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    grams = (
        d.where(F.size(w) >= 3)
        .select("doc_id", w.alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 3), "
                    "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"
                )
            ).alias("g"),
        )
        .select("doc_id", F.xxhash64("g").alias("gh"))
    )
    first_seen = grams.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    buckets = (
        first_seen.select(F.expr("first_doc div 50").alias("pos_bucket"))
        .groupBy("pos_bucket")
        .agg(F.count("*").cast("long").alias("new_types"))
    )
    win = Window.orderBy("pos_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return buckets.select(
        F.col("pos_bucket").cast("long").alias("pos_bucket"),
        "new_types",
        F.sum("new_types").over(win).cast("long").alias("cum_types"),
    ).orderBy("pos_bucket")


#: Winnowing parameters: k-gram size and window width (MOSS defaults
#: scaled to the fixture's ~300-char docs).  Guarantee: every w
#: consecutive k-grams contribute ≥1 fingerprint (coverage), and any
#: match of length ≥ w+k-1 shares a fingerprint.
_WINNOW_K = 5
_WINNOW_W = 4


@register(
    "docs_winnowing_fingerprint",
    # Winnowing (MOSS) WITHOUT a stack or self-join: position p is
    # selected iff some w-window picks it as its (rightmost) minimum,
    # which reduces to span arithmetic over six fixed lag/lead frame
    # minima — left extension Lext (ties extend: left neighbor >= h
    # loses to p), right extension Rext (strict: a right tie wins over
    # p), then ∃ℓ: max(0, w-1-Rext, w-1-(G-p)) <= min(Lext, p-1).
    # Hashes are the md5-derived 60-bit integers both engines compute
    # identically (dedup_minhash_md5 recipe).
    oracle=f"""
    WITH g0 AS (
        SELECT doc_id,
               unnest(generate_series(1, length(text) - {_WINNOW_K - 1})) AS pos
        FROM documents WHERE length(text) >= {_WINNOW_K + _WINNOW_W - 1}
    ), grams AS (
        SELECT g0.doc_id, g0.pos,
               CAST(('0x' || substr(md5(substr(d.text,
                    CAST(g0.pos AS INTEGER), {_WINNOW_K})), 1, 15)) AS BIGINT)
                   AS h,
               length(d.text) - {_WINNOW_K - 1} AS n_grams
        FROM g0 JOIN documents d ON g0.doc_id = d.doc_id
    ), spans AS (
        SELECT doc_id, pos, h, n_grams,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING) AS ml1,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS ml2,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS ml3,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS mr1,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS mr2,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS mr3
        FROM grams
    ), sel AS (
        SELECT doc_id, pos, h, n_grams,
               CASE WHEN ml3 >= h THEN 3 WHEN ml2 >= h THEN 2
                    WHEN ml1 >= h THEN 1 ELSE 0 END AS lext,
               CASE WHEN mr3 > h THEN 3 WHEN mr2 > h THEN 2
                    WHEN mr1 > h THEN 1 ELSE 0 END AS rext
        FROM spans
    )
    SELECT doc_id,
           CAST(MAX(n_grams) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (
               GREATEST(0, 3 - rext, 3 - (n_grams - pos))
               <= LEAST(lext, pos - 1)) AS BIGINT) AS n_fps,
           CAST(bit_xor(CASE WHEN
               GREATEST(0, 3 - rext, 3 - (n_grams - pos))
               <= LEAST(lext, pos - 1) THEN h END) AS BIGINT) AS fp_xor,
           CAST(MIN(CASE WHEN
               GREATEST(0, 3 - rext, 3 - (n_grams - pos))
               <= LEAST(lext, pos - 1) THEN h END) AS BIGINT) AS fp_min,
           CAST(COUNT(*) FILTER (
               GREATEST(0, 3 - rext, 3 - (n_grams - pos))
               <= LEAST(lext, pos - 1)) * 1000000 // MAX(n_grams) AS BIGINT)
               AS density_ppm
    FROM sel GROUP BY doc_id
    """,
)
def docs_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): hash every
    5-char k-gram, slide a w=4 window, keep each window's minimum hash
    (rightmost on ties) — the selection with the COVERAGE guarantee
    (every w consecutive grams yield a fingerprint, so any shared
    substring of length ≥ w+k−1 shares a fingerprint between two
    documents).  Emitted per doc: fingerprint count, xor/min identity,
    and density ppm.

    The selection is computed WITHOUT a per-window argmin pass, stack,
    or self-join: position p is picked by some window iff its
    tie-asymmetric smaller-neighbor spans allow one — left extension
    Lext counts consecutive left neighbors ≥ h (a left tie loses to
    p), right extension Rext counts strict > h (a right tie wins), and
    p is selected iff max(0, w−1−Rext, w−1−(G−p)) ≤ min(Lext, p−1).
    Six fixed-frame window minima replace the stack; the rule is
    validated against a brute-force reference in
    tests/test_properties.py.

    Scale notes: the explode is corpus-chars-sized (the same cost class
    as every text op here), all six windows are doc-partitioned over
    consecutive positions (one shuffle on doc_id, then sorted frames),
    and the output is one row per doc.  Hashes travel as 60-bit
    integers, never gram strings.  Cite: winnowing = Schleimer, Wilkerson
    & Aiken, SIGMOD 2003 (public paper; PAPERS.md)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.length("text") >= _WINNOW_K + _WINNOW_W - 1
    )
    grams = d.select(
        "doc_id",
        (F.length("text") - (_WINNOW_K - 1)).alias("n_grams"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(text) - {_WINNOW_K - 1}),"
                f" i -> substring(text, i, {_WINNOW_K}))"
            )
        ).alias("pos0", "g"),
    ).select(
        "doc_id",
        "n_grams",
        (F.col("pos0") + 1).alias("pos"),
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("bigint").alias("h"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    spans = grams.select(
        "doc_id",
        "pos",
        "h",
        "n_grams",
        F.min("h").over(wdoc.rowsBetween(-1, -1)).alias("ml1"),
        F.min("h").over(wdoc.rowsBetween(-2, -1)).alias("ml2"),
        F.min("h").over(wdoc.rowsBetween(-3, -1)).alias("ml3"),
        F.min("h").over(wdoc.rowsBetween(1, 1)).alias("mr1"),
        F.min("h").over(wdoc.rowsBetween(1, 2)).alias("mr2"),
        F.min("h").over(wdoc.rowsBetween(1, 3)).alias("mr3"),
    )
    sel = spans.select(
        "doc_id",
        "pos",
        "h",
        "n_grams",
        F.when(F.col("ml3") >= F.col("h"), 3)
        .when(F.col("ml2") >= F.col("h"), 2)
        .when(F.col("ml1") >= F.col("h"), 1)
        .otherwise(0)
        .alias("lext"),
        F.when(F.col("mr3") > F.col("h"), 3)
        .when(F.col("mr2") > F.col("h"), 2)
        .when(F.col("mr1") > F.col("h"), 1)
        .otherwise(0)
        .alias("rext"),
    )
    picked = F.greatest(
        F.lit(0), 3 - F.col("rext"), 3 - (F.col("n_grams") - F.col("pos"))
    ) <= F.least(F.col("lext"), F.col("pos") - 1)
    return sel.groupBy("doc_id").agg(
        F.max("n_grams").cast("long").alias("n_grams"),
        F.count(F.when(picked, 1)).cast("long").alias("n_fps"),
        F.expr(
            "CAST(bit_xor(CASE WHEN greatest(0, 3 - rext, 3 - (n_grams - pos))"
            " <= least(lext, pos - 1) THEN h END) AS BIGINT)"
        ).alias("fp_xor"),
        F.min(F.when(picked, F.col("h"))).cast("long").alias("fp_min"),
        F.expr(
            "CAST(count(CASE WHEN greatest(0, 3 - rext, 3 - (n_grams - pos))"
            " <= least(lext, pos - 1) THEN 1 END) * 1000000"
            " div max(n_grams) AS BIGINT)"
        ).alias("density_ppm"),
    )


@register(
    "corpus_dedup_survivorship",
    # Golden-record selection over the near-dup clusters: the oracle
    # recomputes the clusters by recursive-CTE reachability (the
    # dedup_clusters oracle) and picks each cluster's survivor by the
    # deterministic (n_chars DESC, doc_id ASC) rule.
    oracle=f"""
    WITH RECURSIVE {_JACCARD_PAIRS_SQL},
    edges AS (
      SELECT id_a AS s, id_b AS t FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT s AS node, t AS other FROM edges
      UNION
      SELECT r.node, e.t FROM reach r JOIN edges e ON r.other = e.s
    ),
    clusters AS (
      SELECT node AS doc_id, LEAST(node, MIN(other)) AS cluster_id
      FROM reach GROUP BY node
    ),
    members AS (
      SELECT c.cluster_id, c.doc_id, d.n_chars, d.lang, d.source,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id) AS rn
      FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    )
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
               AS survivor_doc_id,
           CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
               AS survivor_n_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM members GROUP BY cluster_id
    """,
)
def corpus_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record) selection — the step AFTER near-dup
    clustering that every dedup pipeline needs before it can drop rows:
    within each Jaccard cluster (``dedup_clusters``' connected
    components), elect the survivor by the deterministic
    (n_chars DESC, doc_id ASC) rule and merge the cluster's lineage
    facts (member count, total chars, distinct langs/sources) into one
    golden row.

    Scale notes (r9 exact-collapse rewrite — the sf10 probe KILLED the
    r8 shape): running pair generation over raw documents ships the
    shingle arrays of every candidate pair through the verify join, and
    on a duplicate-heavy corpus (the sf10 fixture is ~99% replicas;
    real crawl corpora are 30-60% exact dups) identical texts form
    QUADRATIC candidate cliques — ~25M pairs x 2 shingle arrays filled
    the probe host's 77 GB of shuffle disk at sf10.  Every production
    dedup pipeline collapses EXACT duplicates first, so this operator
    now does the same: (1) hash-group texts (128-bit md5) and elect the
    min-doc_id representative per distinct text — ONE linear shuffle;
    (2) run prefix-filtered pair generation + pointer-jumping CC over
    REPRESENTATIVES only (candidate volume now tracks distinct texts);
    (3) expand labels back to members through the text-hash join —
    linear, one label per doc.  The result is IDENTICAL by
    construction: identical-text docs are Jaccard-1 pairs, so a doc
    component is exactly the expansion of its text-group component
    (plus multi-member groups whose text has no other near-dup, which
    become their own cluster; groups under 3 tokens are excluded to
    match the pair generator's shingle floor).  cluster_id = min
    member doc_id is preserved because CC labels by min rep_id and
    each rep_id is its group's min doc_id.  The oracle recomputes raw
    reachability independently (recursive CTE) so parity validates the
    collapse end-to-end at three SFs."""
    from .text import connected_components, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    dd = docs.select(
        "doc_id", "text", "n_chars", "lang", "source",
        # 128-bit group key: a 64-bit xxhash64 collision (~n²/2⁶⁵)
        # would silently merge two distinct texts' groups and diverge
        # from the raw-reachability oracle; at the 100-TB corpora this
        # collapse is pitched for, md5's ~n²/2¹²⁹ bound is the
        # collision-proof choice (ADVICE r9).  The key is internal —
        # the oracle recomputes reachability from raw text.
        F.md5("text").alias("th"),
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    groups = dd.groupBy("th").agg(
        F.min("doc_id").alias("rep_id"),
        F.count(F.lit(1)).alias("g_n"),
        F.first("n_tok").alias("g_tok"),
    )
    rep_docs = (
        dd.join(groups.select("th", "rep_id"), "th")
        .where(F.col("doc_id") == F.col("rep_id"))
        .select("doc_id", "text")
    )
    pairs = ngram_jaccard_pairs(rep_docs)
    rep_lbl = connected_components(pairs).select(
        F.col("node").alias("rep_id"), F.col("lbl").alias("cc_lbl")
    )
    labels = (
        dd.select("doc_id", "th")
        .join(groups, "th")
        .join(rep_lbl, "rep_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("cc_lbl"),
                F.when(
                    (F.col("g_n") >= 2) & (F.col("g_tok") >= 3),
                    F.col("rep_id"),
                ),
            ).alias("cluster_id"),
        )
        .where(F.col("cluster_id").isNotNull())
    )
    members = labels.join(
        docs.select("doc_id", "n_chars", "lang", "source"), "doc_id"
    ).select(
        "cluster_id",
        "doc_id",
        "n_chars",
        "lang",
        "source",
        F.row_number()
        .over(
            Window.partitionBy("cluster_id").orderBy(
                F.col("n_chars").desc(), F.col("doc_id")
            )
        )
        .alias("rn"),
    )
    return members.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("n_members"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
        .cast("long")
        .alias("survivor_doc_id"),
        F.max(F.when(F.col("rn") == 1, F.col("n_chars")))
        .cast("long")
        .alias("survivor_n_chars"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )


@register(
    "corpus_eval_allocation",
    # Largest-remainder (Hamilton) apportionment of a fixed 1000-doc
    # eval budget across (lang, source) strata proportional to corpus
    # chars: base = floor(K*w/W) exact integer; the K - sum(base)
    # leftover seats go to the largest integer remainders K*w mod W
    # (ties broken lang, source ascending) — sum(alloc) == K exactly,
    # the property proportional-rounding always violates.
    oracle="""
    WITH s AS (
        SELECT lang, source, COUNT(*) AS n_docs,
               SUM(n_chars) AS w
        FROM documents GROUP BY 1, 2
    ), t AS (
        SELECT *, SUM(w) OVER () AS tot,
               1000 * w // SUM(w) OVER () AS base,
               (1000 * w) % SUM(w) OVER () AS rem
        FROM s
    ), r AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY rem DESC, lang, source)
                   AS rem_rank,
               1000 - SUM(base) OVER () AS leftover
        FROM t
    )
    SELECT lang, source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(w AS BIGINT) AS w_chars,
           CAST(base AS BIGINT) AS base_alloc,
           CAST(rem_rank AS BIGINT) AS rem_rank,
           CAST(CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS extra,
           CAST(base + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM r
    """,
)
def corpus_eval_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set budget apportionment: split a FIXED evaluation budget
    (K = 1000 documents) across (lang, source) strata proportional to
    their character mass, using the largest-remainder (Hamilton)
    method — the apportionment rule whose defining property is that
    the integer allocations sum to EXACTLY K (independent rounding
    of quotas never does, and an eval set that silently holds 993 or
    1008 docs breaks every downstream per-mille metric).  base =
    floor(K*w/W); the K - Σbase leftover seats go to the strata with
    the largest integer remainders (K*w mod W), ties broken by (lang,
    source) ascending so the apportionment is total-order
    deterministic.  Pure integer arithmetic end to end.

    Companion to `lang_balanced_sample` (which CAPS per-language mass)
    and `corpus_mixture_plan` (which plans token shares): this op
    answers "exactly how many eval docs does each stratum get".

    Scale notes: ONE corpus-grain hash agg to the |lang|x|source|
    stratum rollup (~100 rows at any corpus size); the total/leftover
    windows and the remainder rank run on that rollup only (reviewed
    SINGLE allowlist row).  The subsequent per-stratum draw is
    `sample_stratified`'s hash-rank recipe with these counts as the
    quota column."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("w")
    )
    w_all = Window.partitionBy()
    t = s.select(
        "lang",
        "source",
        "n_docs",
        "w",
        F.expr("1000 * w").alias("kw"),
        F.sum("w").over(w_all).alias("tot"),
    ).select(
        "lang",
        "source",
        "n_docs",
        "w",
        F.expr("kw div tot").alias("base"),
        (F.col("kw") % F.col("tot")).alias("rem"),
    )
    r = t.select(
        "lang",
        "source",
        "n_docs",
        "w",
        "base",
        "rem",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), "lang", "source"))
        .alias("rem_rank"),
        (F.lit(1000) - F.sum("base").over(w_all)).alias("leftover"),
    )
    extra = F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
    return r.select(
        "lang",
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("w").cast("long").alias("w_chars"),
        F.col("base").cast("long").alias("base_alloc"),
        F.col("rem_rank").cast("long").alias("rem_rank"),
        extra.cast("long").alias("extra"),
        (F.col("base") + extra).cast("long").alias("alloc"),
    )


#: DSIR feature space: hashed unigram buckets.  64 buckets keeps the
#: importance model a broadcastable rollup at ANY corpus size while
#: still separating sources on the fixture (non-degeneracy audited).
_DSIR_BUCKETS = 64

#: ln-ratio fixed-point scale (nano-units): keeps the per-doc score an
#: exact INTEGER dot product — a 64-term float sum would be
#: association-order-dependent across engines.
_DSIR_SCALE = 1_000_000_000

_DSIR_TOPK = 25


@register(
    "corpus_dsir_weights",
    # DSIR (Data Selection via Importance Resampling, Xie et al. 2023)
    # importance weights over hashed unigram features: target = 'en'
    # docs, source = everything else; per-bucket add-1-smoothed
    # log-probability ratios are fixed-point BIGINT nano-units, so each
    # candidate doc's score is an exact integer dot product and the
    # top-k cut is deterministic under (score, doc_id).
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)
                   % {_DSIR_BUCKETS} AS b
        FROM (SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS t
              FROM documents)
        WHERE t <> ''
    ), bucket_stats AS (
        SELECT b,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS tc,
               CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS sc
        FROM tok GROUP BY b
    ), tot AS (
        SELECT CAST(SUM(tc) AS BIGINT) AS t_total,
               CAST(SUM(sc) AS BIGINT) AS s_total
        FROM bucket_stats
    ), lr AS (
        SELECT b,
               CAST(ROUND((ln(CAST(tc + 1 AS DOUBLE))
                           - ln(CAST(t_total + {_DSIR_BUCKETS} AS DOUBLE))
                           - ln(CAST(sc + 1 AS DOUBLE))
                           + ln(CAST(s_total + {_DSIR_BUCKETS} AS DOUBLE)))
                          * {_DSIR_SCALE}) AS BIGINT) AS lr_nano
        FROM bucket_stats, tot
    ), cand AS (
        SELECT tok.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(lr.lr_nano) AS BIGINT) AS score_nano
        FROM tok JOIN lr ON tok.b = lr.b
        WHERE tok.lang <> 'en'
        GROUP BY 1
    )
    SELECT doc_id, n_tokens, score_nano,
           CAST((CASE WHEN score_nano >= 0 THEN score_nano // 1000
                      ELSE -((-score_nano) // 1000) END) AS DOUBLE)
               / 1000000.0 AS dsir_logweight
    FROM cand
    ORDER BY score_nano DESC, doc_id
    LIMIT {_DSIR_TOPK}
    """,
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Data Selection via Importance Resampling,
    Xie et al. 2023): score every out-of-target document by how much a
    hashed-unigram bag-of-words model of the TARGET distribution
    (lang='en' here; production: the curated high-quality corpus)
    prefers it over the SOURCE distribution — the importance
    log-weight Σ_b c_b·(ln p̂_t(b) − ln p̂_s(b)) with add-1 smoothing
    over 64 md5-hashed buckets.  The per-bucket log-ratio is a
    fixed-point BIGINT (nano-units), so each document's score is an
    exact INTEGER dot product — a float Σ over 64 buckets would be
    association-order-dependent across engines — and the top-25 cut
    is deterministic under (score, doc_id).

    Scale notes: the token explode is scan-side; bucket statistics are
    ONE hash aggregate to a 64-row rollup (the whole
    importance model — broadcastable at any corpus size, exactly why
    DSIR hashes features); candidate scoring joins per-doc bucket
    counts against that broadcast rollup and aggregates doc-grain; the
    cut is TakeOrdered.  At 100 TB the model fits in L1 and the
    pipeline is two map-combined aggregates and a sort-limit."""
    # Pre-fanout round-robin repartition (the agg_bootstrap_ci
    # row-group lesson): without it the token explode scan-pipelines
    # on the fixture's 2 parquet row groups.
    d = load_table(spark, sf_dir, "documents").repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
    tok = (
        d.select(
            "doc_id",
            "lang",
            F.explode(F.split("text", " ")).alias("t"),
        )
        .where(F.col("t") != "")
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
                % _DSIR_BUCKETS
            ).alias("b"),
        )
    )
    bucket_stats = tok.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("tc"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0))
        .cast("long")
        .alias("sc"),
    )
    tot = bucket_stats.agg(
        F.sum("tc").cast("long").alias("t_total"),
        F.sum("sc").cast("long").alias("s_total"),
    )
    lr = bucket_stats.join(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log((F.col("tc") + 1).cast("double"))
                - F.log(
                    (F.col("t_total") + _DSIR_BUCKETS).cast("double")
                )
                - F.log((F.col("sc") + 1).cast("double"))
                + F.log(
                    (F.col("s_total") + _DSIR_BUCKETS).cast("double")
                )
            )
            * _DSIR_SCALE
        )
        .cast("long")
        .alias("lr_nano"),
    )
    cand = (
        tok.where(F.col("lang") != "en")
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lr_nano").cast("long").alias("score_nano"),
        )
    )
    return (
        cand.select(
            "doc_id",
            "n_tokens",
            "score_nano",
            # toward-zero truncation to micro-units before the division
            # — nano values ending in ...500 hit an exact 6-decimal
            # half and ROUND half-handling differs across engines (the
            # graph_adamic_adar sf0.1 lesson); Spark div truncates
            # toward zero, DuckDB // floors, hence the CASE mirror.
            (
                F.expr("CAST(score_nano div 1000 AS DOUBLE)")
                / 1_000_000.0
            ).alias("dsir_logweight"),
        )
        .orderBy(F.desc("score_nano"), "doc_id")
        .limit(_DSIR_TOPK)
    )


#: NB classifier feature space — same hashed-unigram buckets as DSIR.
_NB_BUCKETS = 64
_NB_SCALE = 1_000_000_000


@register(
    "docs_nb_quality_classifier",
    # Supervised Naive Bayes quality gate over hashed unigram buckets:
    # the label is the integer word-density median split (the
    # text_quality-style signal), the median found by cumsum over the
    # bounded density-value rollup; trained on the even-doc_id half,
    # evaluated held-out on the odd half (81% accuracy — the model
    # really generalizes; lang/source labels audited UNLEARNABLE on
    # this fixture, text is label-independent there).  Per-bucket
    # log-likelihood ratios and the log-prior gap are nano-unit
    # BIGINTs, so each decision score is an exact integer dot product.
    oracle=f"""
    WITH d AS (
        SELECT doc_id, text,
               CAST(len(list_filter(string_split(text, ' '),
                    t -> t <> '')) AS BIGINT) * 1000000
                   // CAST(length(text) AS BIGINT) AS dens
        FROM documents WHERE length(text) > 0
    ), dv AS (
        SELECT dens, COUNT(*) AS c FROM d GROUP BY dens
    ), med AS (
        SELECT MIN(dens) AS median FROM (
            SELECT dens, SUM(c) OVER (ORDER BY dens) AS cum,
                   SUM(c) OVER () AS n
            FROM dv) WHERE cum * 2 >= n
    ), lab AS (
        SELECT doc_id, text, doc_id % 2 AS fold,
               CASE WHEN dens >= median THEN 1 ELSE 0 END AS y
        FROM d, med
    ), tok AS (
        SELECT doc_id, fold, y,
               CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)
                   % {_NB_BUCKETS} AS b
        FROM (SELECT doc_id, fold, y,
                     UNNEST(string_split(text, ' ')) AS t
              FROM lab)
        WHERE t <> ''
    ), model AS (
        SELECT b,
               CAST(SUM(y) AS BIGINT) AS c1,
               CAST(SUM(1 - y) AS BIGINT) AS c0
        FROM tok WHERE fold = 0 GROUP BY b
    ), tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS t1,
               CAST(SUM(c0) AS BIGINT) AS t0
        FROM model
    ), lr AS (
        SELECT b,
               CAST(ROUND((ln(CAST(c1 + 1 AS DOUBLE))
                           - ln(CAST(t1 + {_NB_BUCKETS} AS DOUBLE))
                           - ln(CAST(c0 + 1 AS DOUBLE))
                           + ln(CAST(t0 + {_NB_BUCKETS} AS DOUBLE)))
                          * {_NB_SCALE}) AS BIGINT) AS w_nano
        FROM model, tot
    ), prior AS (
        SELECT CAST(ROUND((ln(CAST(SUM(y) AS DOUBLE))
                           - ln(CAST(SUM(1 - y) AS DOUBLE)))
                          * {_NB_SCALE}) AS BIGINT) AS b_nano
        FROM (SELECT DISTINCT doc_id, y FROM tok WHERE fold = 0)
    ), scored AS (
        SELECT tok.doc_id, MAX(tok.y) AS y,
               CAST(SUM(lr.w_nano) + MAX(prior.b_nano) AS BIGINT) AS score
        FROM tok JOIN lr ON tok.b = lr.b, prior
        WHERE tok.fold = 1
        GROUP BY tok.doc_id
    )
    SELECT CAST(y AS BIGINT) AS label_hi,
           CAST(CASE WHEN score > 0 THEN 1 ELSE 0 END AS BIGINT)
               AS pred_hi,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(score) AS BIGINT) AS min_score_nano,
           CAST(MAX(score) AS BIGINT) AS max_score_nano
    FROM scored GROUP BY 1, 2 ORDER BY label_hi, pred_hi
    """,
)
def docs_nb_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised Naive Bayes quality gate — the fastText-classifier
    shape every production data-selection pipeline runs (train a cheap
    linear model on labeled docs, gate the corpus with it; the learned
    sibling of the rule-based `text_quality` and the argmax sibling of
    `corpus_dsir_weights`\' ratio weighting): multinomial NB over 64
    md5-hashed unigram buckets, label = integer word density above the
    corpus median (the median by cumsum over the BOUNDED density-value
    rollup, never a corpus-grain rank window), trained on the
    even-doc_id half and evaluated on the held-out odd half.  The
    fixture reads 81% held-out accuracy — real generalization, gated
    ≥ 70% by pytest; lang and source labels were audited UNLEARNABLE
    here (both held-out at chance: this fixture\'s text is independent
    of those columns), so the density label is the non-vacuous task.
    Per-bucket log-likelihood ratios and the log-prior gap are
    nano-unit BIGINTs — every decision score an exact integer dot
    product, the confusion matrix bit-reproducible.

    Scale notes: training is ONE hash aggregate to the 64-row bucket
    model (broadcastable at any corpus size); scoring joins eval-doc
    bucket counts against the broadcast model and aggregates
    doc-grain; the label median costs one bounded-rollup cumsum;
    output is the ≤4-row confusion matrix."""
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.length("text") > 0)
        .repartition(nparts)
        .select(
            "doc_id",
            "text",
            F.expr(
                "CAST(size(filter(split(text, ' '), t -> t <> ''))"
                " AS BIGINT) * 1000000 div CAST(length(text) AS BIGINT)"
            ).alias("dens"),
        )
    )
    dv = d.groupBy("dens").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("dens").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    med = (
        dv.select(
            "dens",
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_all).alias("n"),
        )
        .where(F.col("cum") * 2 >= F.col("n"))
        .agg(F.min("dens").alias("median"))
    )
    lab = d.join(F.broadcast(med)).select(
        "doc_id",
        "text",
        (F.col("doc_id") % 2).alias("fold"),
        F.when(F.col("dens") >= F.col("median"), 1).otherwise(0).alias("y"),
    )
    tok = (
        lab.select(
            "doc_id",
            "fold",
            "y",
            F.explode(F.split("text", " ")).alias("t"),
        )
        .where(F.col("t") != "")
        .select(
            "doc_id",
            "fold",
            "y",
            (
                F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
                % _NB_BUCKETS
            ).alias("b"),
        )
    )
    train = tok.where(F.col("fold") == 0)
    model = train.groupBy("b").agg(
        F.sum("y").cast("long").alias("c1"),
        F.sum(1 - F.col("y")).cast("long").alias("c0"),
    )
    tot = model.agg(F.sum("c1").alias("t1"), F.sum("c0").alias("t0"))
    lr = model.join(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log((F.col("c1") + 1).cast("double"))
                - F.log((F.col("t1") + _NB_BUCKETS).cast("double"))
                - F.log((F.col("c0") + 1).cast("double"))
                + F.log((F.col("t0") + _NB_BUCKETS).cast("double"))
            )
            * _NB_SCALE
        )
        .cast("long")
        .alias("w_nano"),
    )
    prior = (
        train.select("doc_id", "y")
        .distinct()
        .agg(
            F.round(
                (
                    F.log(F.sum("y").cast("double"))
                    - F.log(F.sum(1 - F.col("y")).cast("double"))
                )
                * _NB_SCALE
            )
            .cast("long")
            .alias("b_nano")
        )
    )
    scored = (
        tok.where(F.col("fold") == 1)
        .join(F.broadcast(lr), "b")
        .join(F.broadcast(prior))
        .groupBy("doc_id")
        .agg(
            F.max("y").alias("y"),
            (F.sum("w_nano") + F.max("b_nano")).cast("long").alias("score"),
        )
    )
    return (
        scored.groupBy(
            F.col("y").cast("long").alias("label_hi"),
            F.when(F.col("score") > 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("pred_hi"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("score").cast("long").alias("min_score_nano"),
            F.max("score").cast("long").alias("max_score_nano"),
        )
        .orderBy("label_hi", "pred_hi")
    )


#: Sampling temperature for the mixture reweighting (T = 2 → square
#: root): the standard multilingual-pretraining knob (GPT-3 / mT5 use
#: T ∈ [2, 3.33]) that upweights small sources at the expense of the
#: head.
_TEMP_SCALE = 1_000_000
_TEMP_BUDGET = 1000  #: shard budget to allocate (Hamilton rounding)


@register(
    "corpus_temperature_mixture",
    # Temperature-scaled sampling mixture over (lang, source) corpora:
    # w_i ∝ tokens_i^(1/T) with T=2 — ONE correctly-rounded sqrt per
    # group floored to micro-units, so shares and the Hamilton
    # largest-remainder allocation of the 1000-shard budget are exact
    # integer arithmetic; raw-share vs tempered-share ppm side by side
    # shows the reweighting (head suppressed, tail boosted).
    oracle=f"""
    WITH g AS (
        SELECT lang, source,
               CAST(SUM(len(list_filter(string_split(text, ' '),
                    t -> t <> ''))) AS BIGINT) AS tokens
        FROM documents GROUP BY 1, 2
    ), w AS (
        SELECT lang, source, tokens,
               CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * {_TEMP_SCALE})
                    AS BIGINT) AS w_micro,
               SUM(tokens) OVER () AS tok_total
        FROM g
    ), sh AS (
        SELECT lang, source, tokens,
               CAST(tokens * 1000000 // tok_total AS BIGINT) AS raw_ppm,
               CAST(w_micro * 1000000 // SUM(w_micro) OVER () AS BIGINT)
                   AS tempered_ppm,
               w_micro * {_TEMP_BUDGET} AS kw,
               SUM(w_micro) OVER () AS w_total
        FROM w
    ), alloc AS (
        SELECT lang, source, tokens, raw_ppm, tempered_ppm,
               kw // w_total AS base,
               kw % w_total AS rem,
               ROW_NUMBER() OVER (ORDER BY kw % w_total DESC,
                                  lang, source) AS rem_rank,
               {_TEMP_BUDGET} - SUM(kw // w_total) OVER () AS leftover
        FROM sh
    )
    SELECT lang, source, tokens, raw_ppm, tempered_ppm,
           CAST(base + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS shards
    FROM alloc ORDER BY lang, source
    """,
)
def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled pretraining mixture: reweight the (lang,
    source) corpora by tokens^(1/T) with T = 2 — the standard
    multilingual sampling-temperature knob (T = 1 reproduces raw
    proportions and starves the tail; T → ∞ is uniform and
    over-samples tiny corpora into repetition) — and allocate a
    1000-shard sampling budget by Hamilton largest-remainder on the
    tempered weights (the `corpus_eval_allocation` rounding recipe,
    exact-total by construction).  Each weight is ONE correctly-
    rounded sqrt floored to micro-units, so shares and the allocation
    are exact integer arithmetic; raw vs tempered ppm side by side
    makes the head-suppression/tail-boost the readout (pytest asserts
    the crossover: every below-average corpus gains share, every
    above-average one loses).

    Scale notes: ONE map-side-combined aggregate to the (lang, source)
    rollup (≤ langs×sources rows at any corpus size); weights, shares,
    ranks, and the allocation all run on that ≤100-row frame
    (reviewed SINGLE rows)."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("lang", "source").agg(
        F.expr(
            "CAST(SUM(size(filter(split(text, ' '), t -> t <> '')))"
            " AS BIGINT)"
        ).alias("tokens")
    )
    w_all = Window.partitionBy()
    w = g.select(
        "lang",
        "source",
        "tokens",
        F.floor(F.sqrt(F.col("tokens").cast("double")) * _TEMP_SCALE)
        .cast("long")
        .alias("w_micro"),
        F.sum("tokens").over(w_all).alias("tok_total"),
    )
    sh = w.select(
        "lang",
        "source",
        "tokens",
        "w_micro",
        F.expr("CAST(tokens * 1000000 div tok_total AS BIGINT)").alias(
            "raw_ppm"
        ),
        F.expr(f"w_micro * {_TEMP_BUDGET}").alias("kw"),
        F.sum("w_micro").over(w_all).alias("w_total"),
    ).withColumn(
        "tempered_ppm",
        F.expr("CAST(w_micro * 1000000 div w_total AS BIGINT)"),
    )
    alloc = sh.select(
        "lang",
        "source",
        "tokens",
        "raw_ppm",
        "tempered_ppm",
        F.expr("kw div w_total").alias("base"),
        (F.col("kw") % F.col("w_total")).alias("rem"),
        F.row_number()
        .over(Window.orderBy(F.desc(F.col("kw") % F.col("w_total")), "lang", "source"))
        .alias("rem_rank"),
        (
            F.lit(_TEMP_BUDGET) - F.sum(F.expr("kw div w_total")).over(w_all)
        ).alias("leftover"),
    )
    return alloc.select(
        "lang",
        "source",
        "tokens",
        "raw_ppm",
        "tempered_ppm",
        (
            F.col("base")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("shards"),
    ).orderBy("lang", "source")


@register(
    "corpus_dedup_rate_curve",
    # Dedup yield curve: how many near-dup pairs (and how many affected
    # documents) survive as the Jaccard threshold sweeps 0.5 -> 0.9.
    # The pair generator's floor is 0.5, and every pair carries exact
    # integer (n_inter, n_union), so each higher threshold is a pure
    # integer filter over the SAME pair set: 100 * n_inter >= t * n_union
    # — no recomputation, no float.
    oracle=f"""
    WITH {_JACCARD_PAIRS_SQL},
    thr(t) AS (VALUES (50), (60), (70), (80), (90)),
    surviving AS (
        SELECT thr.t, p.id_a, p.id_b
        FROM pairs p JOIN thr ON 100 * p.n_inter >= thr.t * p.n_union
    ), docs_hit AS (
        SELECT t, id_a AS doc_id FROM surviving
        UNION
        SELECT t, id_b FROM surviving
    )
    SELECT CAST(thr.t AS BIGINT) AS threshold_pct,
           CAST(COALESCE(s.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(COALESCE(d.n_docs, 0) AS BIGINT) AS n_docs_affected
    FROM thr
    LEFT JOIN (SELECT t, COUNT(*) AS n_pairs FROM surviving GROUP BY t) s
      ON s.t = thr.t
    LEFT JOIN (SELECT t, COUNT(DISTINCT doc_id) AS n_docs FROM docs_hit
               GROUP BY t) d
      ON d.t = thr.t
    ORDER BY threshold_pct
    """,
)
def corpus_dedup_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield curve — the tuning readout every near-dup rollout
    runs before picking its threshold: for Jaccard cutoffs 0.5..0.9,
    the surviving candidate-pair count and the number of documents
    touched by at least one surviving pair.  Because the prefix-filtered
    pair generator already emits exact integer (n_inter, n_union) at
    its 0.5 floor, the whole curve is integer FILTERS over one pair
    set — the expensive candidate generation is paid once, not per
    threshold (the mistake a naive sweep makes five times over).

    Scale notes (exact-collapse form, the `corpus_dedup_survivorship`
    recipe with MULTIPLICITY arithmetic): pair generation runs once
    over exact-dup-collapsed representatives, never raw documents — on
    a duplicate-heavy corpus raw identical-text cliques are quadratic
    (the r9 first cut measured 67 s / 5.6× growth at sf1 on the
    ~90%-replica fixture; this form is ~9 s / flat).  Raw-pair counts
    are recovered EXACTLY from group sizes: a surviving representative
    pair (a, b) stands for g_a·g_b raw pairs, and every ≥2-member
    identical-text group contributes C(g, 2) Jaccard-1 pairs that
    survive EVERY threshold; affected docs = Σ g over the distinct
    groups touched at each threshold.  The oracle still counts raw
    pairs by brute force, so parity proves the multiplicity algebra.
    The threshold dim is a broadcast 5-row literal (reviewed NLJ);
    rollups are threshold-sized."""
    from .text import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    dd = docs.select(
        "doc_id",
        "text",
        # 128-bit group key: a 64-bit xxhash64 collision (~n²/2⁶⁵)
        # would silently merge two distinct texts' groups and diverge
        # from the raw-reachability oracle; at the 100-TB corpora this
        # collapse is pitched for, md5's ~n²/2¹²⁹ bound is the
        # collision-proof choice (ADVICE r9).  The key is internal —
        # the oracle recomputes reachability from raw text.
        F.md5("text").alias("th"),
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    groups = dd.groupBy("th").agg(
        F.min("doc_id").alias("rep_id"),
        F.count(F.lit(1)).alias("g_n"),
        F.first("n_tok").alias("g_tok"),
    )
    rep_docs = (
        dd.join(groups.select("th", "rep_id"), "th")
        .where(F.col("doc_id") == F.col("rep_id"))
        .select("doc_id", "text")
    )
    pairs = ngram_jaccard_pairs(rep_docs)
    thr = spark.createDataFrame([(50,), (60,), (70,), (80,), (90,)], "t int")
    ga = groups.select(F.col("rep_id").alias("id_a"), F.col("g_n").alias("g_a"))
    gb = groups.select(F.col("rep_id").alias("id_b"), F.col("g_n").alias("g_b"))
    cross = (
        pairs.join(
            F.broadcast(thr),
            100 * F.col("n_inter") >= F.col("t") * F.col("n_union"),
        )
        .join(ga, "id_a")
        .join(gb, "id_b")
    )
    cross_pairs = cross.groupBy("t").agg(
        F.sum(F.col("g_a").cast("long") * F.col("g_b")).alias("pairs_cross")
    )
    # distinct groups touched at each threshold (either side of a pair)
    touched_cross = cross.select(
        "t", F.col("id_a").alias("rep"), F.col("g_a").alias("g")
    ).unionByName(
        cross.select("t", F.col("id_b").alias("rep"), F.col("g_b").alias("g"))
    )
    within = groups.where((F.col("g_n") >= 2) & (F.col("g_tok") >= 3))
    within_tot = within.agg(
        F.coalesce(
            F.sum(F.expr("CAST(g_n AS BIGINT) * (g_n - 1) div 2")), F.lit(0)
        ).alias("pairs_within")
    )
    touched_within = thr.crossJoin(
        within.select(F.col("rep_id").alias("rep"), F.col("g_n").alias("g"))
    ).select("t", "rep", "g")
    docs_hit = (
        touched_cross.unionByName(touched_within)
        .groupBy("t", "rep")
        .agg(F.max("g").alias("g"))
        .groupBy("t")
        .agg(F.sum("g").alias("n_docs"))
    )
    return (
        thr.join(cross_pairs, "t", "left")
        .join(docs_hit, "t", "left")
        .crossJoin(F.broadcast(within_tot))
        .select(
            F.col("t").cast("long").alias("threshold_pct"),
            (F.coalesce(F.col("pairs_cross"), F.lit(0)) + F.col("pairs_within"))
            .cast("long")
            .alias("n_pairs"),
            F.coalesce(F.col("n_docs"), F.lit(0))
            .cast("long")
            .alias("n_docs_affected"),
        )
        .orderBy("threshold_pct")
    )


#: Frozen-vocabulary size for the OOV-rate audit: the fixture vocabulary
#: is ~31 words, so K=20 leaves a real out-of-vocab tail on the held-out
#: half (audited non-degenerate at sf0.01 before the oracle was written).
_OOV_VOCAB_K = 20


@register(
    "corpus_tokenizer_oov_rate",
    # Train/serve vocabulary drift: freeze the top-K vocab on the EVEN
    # doc_ids (by count desc, term asc — deterministic election), then
    # measure each source's out-of-vocab token share on the ODD half.
    # Pure integer counts and ppm division.
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ), vocab AS (
        SELECT w FROM (
            SELECT w, row_number() OVER (ORDER BY COUNT(*) DESC, w) AS rk
            FROM toks WHERE doc_id % 2 = 0 GROUP BY w
        ) WHERE rk <= {_OOV_VOCAB_K}
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(COUNT(DISTINCT CASE WHEN v.w IS NULL THEN t.w END)
                AS BIGINT) AS n_oov_types,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS oov_ppm
    FROM toks t LEFT JOIN vocab v ON v.w = t.w
    WHERE t.doc_id % 2 = 1
    GROUP BY t.source
    ORDER BY t.source
    """,
)
def corpus_tokenizer_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer / vocabulary drift audit: freeze a top-K vocabulary on
    one half of the corpus (the "train" split, even doc_ids) and
    measure the out-of-vocabulary token share per source on the other
    half — the number that decides whether a frozen tokenizer (or a
    feature-store vocab, or an embedding table) still covers incoming
    data.  A rising per-source OOV curve is the earliest signal a
    source's language shifted under the model.  Complements
    `bpe_train_iterative` (builds a vocab) and
    `feat_hashing_collisions` (what hashing loses INSTEAD of a vocab).

    Determinism: vocab election is (count DESC, term ASC)
    row_number ≤ K — tie-stable on both engines; everything after is
    integer counts and ppm division.

    Scale notes: one token explode feeds the train-half vocab aggregate
    (vocabulary-sized) and the serve-half scan; the membership check is
    a LEFT join against the broadcast K-row vocab; ONE (source) rollup.
    The vocab window runs on the vocabulary-sized count frame (reviewed
    SINGLE)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    )
    w_rank = Window.orderBy(F.col("cnt").desc(), "w")
    vocab = (
        toks.where(F.col("doc_id") % 2 == 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(w_rank))
        .where(F.col("rk") <= _OOV_VOCAB_K)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    serve = toks.where(F.col("doc_id") % 2 == 1)
    joined = serve.join(F.broadcast(vocab), "w", "left")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens_raw"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias(
                "n_oov_raw"
            ),
            F.countDistinct(
                F.when(F.col("in_vocab").isNull(), F.col("w"))
            )
            .cast("long")
            .alias("n_oov_types"),
        )
        .select(
            "source",
            F.col("n_tokens_raw").cast("long").alias("n_tokens"),
            F.col("n_oov_raw").cast("long").alias("n_oov"),
            "n_oov_types",
            F.expr("n_oov_raw * 1000000 div n_tokens_raw")
            .cast("long")
            .alias("oov_ppm"),
        )
        .orderBy("source")
    )


@register(
    "corpus_psi_drift",
    # Population stability index (the credit-scoring drift measure,
    # public) of the doc-length profile between the corpus's even- and
    # odd-doc_id halves — the snapshot-drift check a training pipeline
    # runs before appending a new crawl: PSI = Σ (p−q)·ln(p/q) over
    # the 10 fixed eval_ece length bins, +1-smoothed so empty bins
    # stay finite (textbook bands: <0.1 stable, >0.25 drifted).
    # Counts exact integers; ln runs on the IDENTICAL smoothed-count
    # ratio expression in both engines (the events_drift_jsd posture);
    # ROUND(6)-terminal.
    oracle="""
    WITH binned AS (
      SELECT LEAST(9, LEAST(1000000,
                 GREATEST(0, (n_chars - 50) * 2000)) // 100000) AS bin,
             CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_b
      FROM documents GROUP BY 1
    ), dense AS (
      SELECT g.bin, COALESCE(b.c_a, 0) AS c_a, COALESCE(b.c_b, 0) AS c_b
      FROM generate_series(0, 9) g(bin) LEFT JOIN binned b ON b.bin = g.bin
    ), tot AS (
      SELECT CAST(SUM(c_a) + 10 AS BIGINT) AS n_a,
             CAST(SUM(c_b) + 10 AS BIGINT) AS n_b
      FROM dense
    ), terms AS (
      SELECT b.bin, b.c_a, b.c_b,
             (CAST(b.c_a + 1 AS DOUBLE) / t.n_a
              - CAST(b.c_b + 1 AS DOUBLE) / t.n_b)
             * ln((CAST(b.c_a + 1 AS DOUBLE) * t.n_b)
                  / (CAST(b.c_b + 1 AS DOUBLE) * t.n_a)) AS term
      FROM dense b CROSS JOIN tot t
    )
    SELECT bin, c_a AS n_even_half, c_b AS n_odd_half,
           ROUND(SUM(term) OVER (), 6) AS psi
    FROM terms ORDER BY bin
    """,
)
def corpus_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the document-length profile
    between the corpus's even- and odd-doc_id halves — the
    distribution-drift gate a training-data pipeline runs before
    admitting a new snapshot (PSI < 0.1 stable, 0.1–0.25 watch,
    > 0.25 drifted — the credit-scoring convention).  The
    deterministic parity split makes the op self-contained on one
    table while exercising the real machinery: fixed bins (the
    eval_ece edges, so the two calibration/drift ops share one
    binning), densified to the full 10-bin frame so bins empty on
    BOTH halves still carry their smoothed term, +1 Laplace smoothing
    so a bin empty on one side stays finite, and the (p−q)·ln(p/q)
    accumulation.  The fixture's halves
    draw from one distribution (PSI ≈ 0 — honest null); the planted
    pytests pin identical halves at PSI == 0.0 exactly (every ln
    ratio is ln 1 = 0 exactly — no float dust) and a planted
    length shift in the odd half past the 0.25 drift band.

    Exactness: bin counts are exact integers; each term's ln runs on
    the IDENTICAL smoothed integer-count ratio expression in both
    engines (the events_drift_jsd posture — one shared libm call per
    bin, not a both-sides-different decomposition); the 10-term sum is
    ROUND(6)-absorbed (BOUNDED class in the aggregate-determinism
    audit).

    Scale notes: ONE corpus aggregate to the 10-row bin rollup; the
    1-row smoothed-total frame broadcast-crosses back; the PSI sum is
    an unpartitioned window over the 10-row frame (reviewed
    SINGLE)."""
    d = load_table(spark, sf_dir, "documents")
    binned = d.groupBy(
        F.least(
            F.lit(9),
            F.expr(
                "LEAST(1000000, GREATEST(0, (n_chars - 50) * 2000))"
                " div 100000"
            ),
        ).alias("bin")
    ).agg(
        F.expr(
            "CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("c_a"),
        F.expr(
            "CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("c_b"),
    )
    # Densify to the full fixed 10-bin frame BEFORE smoothing
    # (ADVICE r12 #2): a bin empty on BOTH halves still contributes
    # its smoothed term (1/n_a − 1/n_b)·ln(n_b/n_a), which is nonzero
    # whenever the halves are unequal — dropping it understated PSI on
    # sparse inputs versus the documented "+1-smoothed over the 10
    # fixed bins" definition.  The 10-row literal frame broadcasts.
    bins = spark.range(0, 10).select(F.col("id").alias("bin"))
    dense = bins.join(F.broadcast(binned), "bin", "left").select(
        "bin",
        F.coalesce("c_a", F.lit(0)).alias("c_a"),
        F.coalesce("c_b", F.lit(0)).alias("c_b"),
    )
    tot = dense.agg(
        F.expr("CAST(SUM(c_a) + 10 AS BIGINT)").alias("n_a"),
        F.expr("CAST(SUM(c_b) + 10 AS BIGINT)").alias("n_b"),
    )
    terms = dense.crossJoin(F.broadcast(tot)).select(
        "bin",
        "c_a",
        "c_b",
        (
            (
                F.expr("CAST(c_a + 1 AS DOUBLE)") / F.col("n_a")
                - F.expr("CAST(c_b + 1 AS DOUBLE)") / F.col("n_b")
            )
            * F.log(
                F.expr("CAST(c_a + 1 AS DOUBLE) * n_b")
                / F.expr("CAST(c_b + 1 AS DOUBLE) * n_a")
            )
        ).alias("term"),
    )
    w_all = Window.partitionBy()
    return (
        terms.select(
            "bin",
            F.col("c_a").alias("n_even_half"),
            F.col("c_b").alias("n_odd_half"),
            F.round(F.sum("term").over(w_all), 6).alias("psi"),
        )
        .orderBy("bin")
    )


@register(
    "text_template_prefixes",
    # Boilerplate-template detector: per source, the top-5 32-char
    # document prefixes shared by ≥ 2 docs, with counts and corpus
    # share — the cheap screen that finds scraped-template families
    # BEFORE the shingle dedup pays for them (a prefix family is the
    # classic crawler artifact: cookie banners, license headers,
    # forum scaffolding).  Counts exact; share is an integer ppm div;
    # the rank window carries (count DESC, prefix ASC) — a TOTAL
    # order, window-audit-proven.
    oracle="""
    WITH pref AS (
      SELECT source, substr(text, 1, 32) AS prefix,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents
      WHERE length(text) >= 32
      GROUP BY 1, 2
    ), src AS (
      SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_src
      FROM pref GROUP BY 1
    ), ranked AS (
      SELECT p.source, p.prefix, p.n_docs,
             CAST(p.n_docs * 1000000 // s.n_src AS BIGINT) AS share_ppm,
             ROW_NUMBER() OVER (PARTITION BY p.source
                                ORDER BY p.n_docs DESC, p.prefix)
               AS rk
      FROM pref p JOIN src s ON p.source = s.source
      WHERE p.n_docs >= 2
    )
    SELECT source, prefix, n_docs, share_ppm
    FROM ranked WHERE rk <= 5
    ORDER BY source, n_docs DESC, prefix
    """,
)
def text_template_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-prefix families per source: the top-5 32-char document
    prefixes shared by at least 2 docs, with exact counts and ppm
    corpus share — the cheapest boilerplate screen in the dedup
    family: `dedup_containment` finds wrapped COPIES, this finds the
    WRAPPER (cookie banners, license headers, forum scaffolding) with
    one aggregate, no shingles, no pair join.  A pipeline runs it
    first and feeds the hits to targeted stripping, shrinking what
    the expensive set-similarity passes must chew.  The fixture's
    synthetic vocabulary yields few genuine 32-char collisions
    (honest near-empty output at small SF); the planted pytests wrap
    doc families in shared banners and recover exact counts, shares,
    deterministic (count DESC, prefix ASC) ranking, and the <2-doc
    exclusion.

    Exactness: prefix counts are exact integers off ONE (source,
    prefix) aggregate; share_ppm is a nonnegative integer div
    (identical floor); the top-5 window's ordering appends the prefix
    to the count — a TOTAL order on the aggregate's own grain
    (window-audit-proven), so ranking never depends on tie arrival.

    Scale notes: the (source, prefix) aggregate collapses map-side
    (boilerplate prefixes are exactly the hot keys that combine
    well); the rank window runs on the collision-family frame
    (n_docs ≥ 2), not the corpus; output ≤ 5 rows per source."""
    d = load_table(spark, sf_dir, "documents")
    pref = (
        d.where(F.length("text") >= 32)
        .groupBy(
            "source", F.expr("substr(text, 1, 32)").alias("prefix")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    from ..common import stage

    pref = stage(pref)
    src = pref.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_src")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_docs").desc(), F.col("prefix")
    )
    return (
        pref.join(F.broadcast(src), "source")
        .where(F.col("n_docs") >= 2)
        .select(
            "source",
            "prefix",
            "n_docs",
            F.expr("CAST(n_docs * 1000000 div n_src AS BIGINT)").alias(
                "share_ppm"
            ),
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 5)
        .drop("rk")
        .orderBy("source", F.col("n_docs").desc(), "prefix")
    )
