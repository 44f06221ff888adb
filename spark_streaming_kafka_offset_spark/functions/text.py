"""§2.10 Text analysis + deduplication for LLM-data pipelines [N]
(SURVEY.md; mandate: BASELINE.json:6 — the reference itself has no text
surface [K], mirror empty §0).

Design for 100 TB:

* Everything here is built-in Catalyst expressions — no Python UDFs, so
  whole-stage codegen applies and the hot path never crosses the JVM/
  Python boundary.
* Dedup keeps one winner per group via ``min_by`` over a deterministic
  tie-break (``doc_id``) — map-side partial aggregation collapses
  duplicate groups before the shuffle on the hash key, the minimum
  possible data movement for exact dedup.
* MinHash-LSH generates candidate pairs only within LSH band buckets —
  never an unblocked self-join.  Bucket join + Jaccard verification is
  the published scale pattern (band/bucket counts are tunable).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..common import stage
from ..plans.registry import register
from ..session import load_table


def _norm_text(c: Column) -> Column:
    """Canonical text normalization: lowercase + collapse whitespace."""
    return F.regexp_replace(F.lower(c), r"\s+", " ")


@register(
    "dedup_exact",
    oracle="""
    WITH h AS (
      SELECT doc_id, source,
             sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS content_hash
      FROM documents
    )
    SELECT doc_id, source, content_hash
    FROM (SELECT *, row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
          FROM h)
    WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalize → sha256 → keep lowest doc_id per hash.

    Expressed as ``min_by`` aggregation, not a row_number window: the
    aggregate gets a map-side partial pass, so duplicate groups collapse
    BEFORE the shuffle and only one survivor row per hash crosses the
    wire — at 100 TB with a high dup rate that is a many-fold shuffle
    reduction over the sort-window formulation (which ships every row).
    One skew-free shuffle on a 256-bit key; hash computed scan-side."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", "source", F.sha2(_norm_text(F.col("text")), 256).alias("content_hash")
    )
    return (
        hashed.groupBy("content_hash")
        .agg(F.min_by(F.struct("doc_id", "source"), "doc_id").alias("keep"))
        .select(
            F.col("keep.doc_id").alias("doc_id"),
            F.col("keep.source").alias("source"),
            "content_hash",
        )
    )


@register(
    "text_stats",
    oracle="""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           ROUND(AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS avg_tokens
    FROM documents
    GROUP BY source, lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics by (source, lang): doc/token/char counts.

    Token counting is ``size(split(..))`` — scan-side, codegen'd, then a
    single partial+final aggregate on low-cardinality keys."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    return d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tokens.cast("long")).alias("total_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg(n_tokens.cast("double")), 4).alias("avg_tokens"),
    )


@register(
    "text_quality",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           floor(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) * 100) / 100
             AS avg_token_len,
           floor(
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t IN ('the','a','of','and','to','in','is')))
                  AS DOUBLE)
             / len(string_split(text, ' ')) * 10000) / 10000 AS stopword_ratio,
           (n_chars BETWEEN 50 AND 5000
            AND len(string_split(text, ' ')) >= 10) AS passes_length_gate
    FROM documents
    WHERE doc_id % 3 = 0
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: avg token length, stopword ratio, and a
    length gate — the standard cheap pre-filters of an LLM data pipeline.
    Ratios floor-truncated (not rounded) for cross-engine determinism."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stop = F.array([F.lit(s) for s in ["the", "a", "of", "and", "to", "in", "is"]])
    # filter, not array_intersect: intersect has set semantics and would
    # undercount repeated stopwords.
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (F.floor(F.col("n_chars").cast("double") / n_tokens * 100) / 100).alias(
            "avg_token_len"
        ),
        (F.floor(n_stop.cast("double") / n_tokens * 10000) / 10000).alias(
            "stopword_ratio"
        ),
        (
            F.col("n_chars").between(50, 5000) & (n_tokens >= 10)
        ).alias("passes_length_gate"),
    )


@register(
    "text_langid",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t IN ('the','a','of','and','to','in','is')))
                  AS DOUBLE)
               / len(string_split(text, ' ')) AS en_score
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN en_score >= 0.05 THEN 'en' ELSE 'other' END AS pred_lang,
           floor(en_score * 10000) / 10000 AS en_score
    FROM scored
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English function-word hit-rate.  A real
    pipeline swaps the word list per language; the plumbing (scan-side
    scoring, no shuffle) is the point."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array([F.lit(s) for s in ["the", "a", "of", "and", "to", "in", "is"]])
    score = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast(
        "double"
    ) / F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        F.when(score >= 0.05, "en").otherwise("other").alias("pred_lang"),
        (F.floor(score * 10000) / 10000).alias("en_score"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                 t -> CAST(length(t) * 131 + ascii(t) AS BIGINT))),
             (acc, x) -> (acc * 1000003 + x) % 2147483647) AS fingerprint
    FROM documents
    WHERE doc_id % 7 = 0
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling document fingerprint (polynomial hash over
    the token stream, mod 2^31-1) — cheap near-identity signature that,
    unlike sha256-of-text, is computable incrementally and survives
    chunked processing.  Pure integer arithmetic → bit-identical in any
    engine."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    toks = F.split(_norm_text(F.col("text")), " ")
    token_codes = F.transform(
        toks, lambda t: (F.length(t) * 131 + F.ascii(t)).cast("long")
    )
    fp = F.aggregate(
        token_codes,
        F.lit(7).cast("long"),
        lambda acc, x: (acc * 1000003 + x) % 2147483647,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT d.doc_id, d.source, t.token
      FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
    ),
    tf AS (
      SELECT source, token, COUNT(*) AS tf
      FROM toks GROUP BY source, token
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df
      FROM toks GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.source, tf.token,
             floor(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 10000) / 10000
               AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT source, token, tfidf
    FROM (SELECT *, row_number() OVER (PARTITION BY source
                                       ORDER BY tfidf DESC, token) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-5 terms per source.

    Shape at scale: explode → two partial+final aggregates (tf by
    (source, token), df by token) → tf⋈df on token → per-source top-k
    window.  The doc-frequency side is vocabulary-sized and deliberately
    UNHINTED (a web-scale vocab can reach billions of entries; Catalyst/
    AQE broadcasts it only when actually small — the same no-unbounded-
    broadcast rule as dedup_simhash); the corpus-sized explode never
    re-shuffles more than (source, token, count) rows."""
    from ..common import stage

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", F.explode(F.split("text", " ")).alias("token"))
    # One corpus pass (r14, made STRUCTURAL r15): tf and df previously
    # hung two independent aggregates off the explode, so the
    # scan+explode ran twice (and countDistinct(doc_id) expanded to its
    # own two-phase dedup).  Both derive from the (token, doc_id)
    # grain: tf = Σ per-doc counts, df = row count per token (doc_id is
    # unique, source is functionally dependent on it) — so aggregate to
    # that grain once and STAGE it (r15): the r14 form left the grain
    # subtree inlined into both rollups, which put TWO Generates in the
    # static plan and left the dedup to runtime AQE exchange reuse —
    # the exact plan-canonicalization fragility docs_chrf's staging
    # removed.  Staged, the corpus is scanned and exploded exactly once
    # by construction (plan-gated: one Generate, tests/test_plans.py).
    # Integer counts, so the scored floats are bit-identical.
    g1 = stage(
        toks.groupBy("token", "doc_id", "source").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    tf = g1.groupBy("source", "token").agg(F.sum("c").alias("tf"))
    df = g1.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # n_docs as a broadcast 1-row aggregate frame (NOT a driver-side
    # d.count()): the whole query stays one lazy plan with no eager job
    # in the build path; the cross join is 1-row-broadcast, cost-free.
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    scored = tf.join(df, "token").crossJoin(F.broadcast(n)).select(
        "source",
        "token",
        (
            F.floor(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")) * 10000
            )
            / 10000
        ).alias("tfidf"),
    )
    w = Window.partitionBy("source").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate detection (rows-only: banding uses xxhash64,
# which DuckDB cannot reproduce; the shingling stage is oracle-checked via
# dedup_shingle below).
# ---------------------------------------------------------------------------

_MINHASH_PERMS = 16  #: signature length
_LSH_BANDS = 4  #: bands of 4 rows each → catches Jaccard ≳ 0.5 pairs


@register(
    "dedup_shingle",
    oracle="""
    SELECT doc_id, len(shingles) AS n_shingles, shingles[1] AS first_shingle
    FROM (
      SELECT doc_id,
             list_sort(list_distinct(
               list_transform(range(1, len(string_split(text, ' ')) - 1),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2])))
               AS shingles
      FROM documents WHERE doc_id % 11 = 0
    )
    """,
)
def dedup_shingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-token shingling — the oracle-checkable stage of MinHash dedup.
    (DuckDB range(1, n-1) is end-exclusive and its lists are 1-indexed;
    Spark sequence(0, n-3) is end-inclusive and 0-indexed — same set.)"""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 11 == 0)
    shingles = _shingles(F.col("text"))
    return d.select(
        "doc_id",
        F.size(shingles).alias("n_shingles"),
        # try_element_at: a <3-token doc has an empty shingle set and ANSI
        # element_at would throw; NULL matches DuckDB's shingles[1].
        F.try_element_at(shingles, F.lit(1)).alias("first_shingle"),
    )


def _shingles(text: Column, k: int = 3) -> Column:
    """Sorted distinct k-token shingles of a space-tokenized text column.

    Guarded for short documents: ``sequence(0, negative)`` yields a
    *descending* sequence in Spark and ``element_at(.., 0)`` then throws —
    any doc with fewer than k tokens must map to an empty set instead.
    """
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    return F.when(F.size(toks) < k, F.array().cast("array<string>")).otherwise(
        F.array_sort(
            F.array_distinct(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
                    ),
                )
            )
        )
    )


def shingle_sets(docs: DataFrame, id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, distinct-shingle-hash set) pairs, materialized once.

    Three deliberate choices, each measured at sf0.1 (5k docs):

    * **Hash shingles to longs at scan time.** Signatures and the Jaccard
      verify only need set *identity*, so carrying ``xxhash64`` longs
      instead of 3-token strings shrinks the materialized set ~8× and
      makes every downstream array op integer-wide.  Jaccard over 64-bit
      hashes equals Jaccard over shingles up to negligible collision mass.
    * **Stage tokenization in its own projection.** Referencing
      ``F.split(text)`` inside the ``transform`` lambda re-evaluates the
      split per shingle (no common-subexpression elimination across a
      higher-order-function boundary) — measured 3× slower.
    * **Repartition before the heavy projection — with an explicit
      partition count.** A small parquet file arrives as ONE input
      split; without the spread the shingling runs on a single core of
      32.  The count must be explicit: a bare ``repartition(col)``
      exchange is AQE-coalesced back to 1 partition on byte-size grounds
      (bytes ≪ advisory target) even though the downstream projection is
      CPU-bound — measured: every stage after it ran as a single task.

    The result is staged (``common.stage``): it feeds the signature
    columns AND both sides of the band self-join AND the Jaccard verify;
    without staging Catalyst inlines the shingling tree into every
    consumer (measured: 10× wall-clock).  ``SSKOS_STAGE_MODE=table``
    switches from ``localCheckpoint`` to the production parquet-staging
    path; both modes are test-verified equal."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks_df = docs.repartition(par, F.col(id_col)).select(
        id_col, F.split(F.col("text"), " ").alias("_toks")
    )
    return stage(
        toks_df.select(id_col, _shingle_hashes(F.col("_toks"), k).alias("sh"))
    )


def _shingle_hashes(toks: Column, k: int = 3) -> Column:
    """xxhash64'd distinct k-token shingles of a PRE-PROJECTED token
    array.  The tokenization must live in its own projection (see the
    shingle_sets docstring: a split referenced inside the transform
    lambda re-evaluates per shingle — measured 3×).  Short-doc guard as
    in _shingles: <k tokens → empty set, never a descending sequence
    (which would throw on element_at index 0)."""
    return F.when(F.size(toks) < k, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - k),
                lambda i: F.xxhash64(
                    F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)])
                ),
            )
        )
    )


def minhash_candidates(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """MinHash/LSH candidate pairs: (id_a, id_b, n_common_bands)."""
    return _candidates_from_sets(shingle_sets(docs, id_col), id_col)


def _candidates_from_sets(sets_: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Candidate pairs from (id, sh) sets.

    Pipeline (all built-in; ``sh`` arrives pre-hashed to longs from
    ``shingle_sets``):
      **explode** the set → 16 per-permutation re-hashes
      ``min(xxhash64(j, h))`` in ONE codegen'd hash aggregate → band
      signature → posexplode bands (|bands| rows/doc) → self-join per
      (band, band_sig) bucket.

    Why explode instead of per-row ``array_min(transform(...))``: Spark
    evaluates higher-order array functions interpreted, outside
    whole-stage codegen — 16 interpreted array traversals per doc
    measured 5× slower than the exploded formulation, whose 16 hash+min
    expressions are codegen'd and partially aggregated map-side (the
    shuffle still carries one row per doc, not one per shingle).  The
    only shuffles are that agg, the bucket join, and the pair-count;
    documents never compare outside a shared bucket, so candidate work
    is output-sized, not O(n²) — the property that lets this run at
    100 TB."""
    mins = (
        sets_.select(id_col, F.explode("sh").alias("h"))
        .groupBy(id_col)
        .agg(
            *[
                F.min(F.xxhash64(F.lit(j), F.col("h"))).alias(f"h{j}")
                for j in range(_MINHASH_PERMS)
            ]
        )
    )
    rows_per_band = _MINHASH_PERMS // _LSH_BANDS
    bands = mins.select(
        id_col,
        F.array(
            *[
                F.xxhash64(
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias(f"b{b}")
                for b in range(_LSH_BANDS)
            ]
        ).alias("band_sigs"),
    ).select(id_col, F.posexplode("band_sigs").alias("band", "band_sig"))
    left = bands.select(
        F.col(id_col).alias("id_a"), "band", "band_sig"
    )
    right = bands.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    return (
        left.join(right, ["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common_bands"))
    )


_SIMHASH_BANDS = 4  #: 16-bit bands; hamming ≤ 3 pairs share ≥ 1 band


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, 64-bit SimHash) pairs — one scan, zero shuffles, no UDFs.

    Classic SimHash: hash every token to 64 bits; for each bit position,
    +1 if set else -1, summed over tokens; signature bit = (sum > 0).
    Expressed entirely with higher-order array functions so the whole
    thing runs inside whole-stage codegen:

    * token hashes: ``transform(split(text), xxhash64)``
    * per-bit counters: one ``aggregate`` with a 64-element array
      accumulator, ``zip_with``-ing each token hash against a constant
      bitmask array (single pass over the tokens, not 64 passes)
    * signature: sum of the masks whose counter is positive — masks are
      disjoint bits, so the sum IS the bitwise OR (no overflow possible,
      ANSI-safe; bit 63's mask is the sign bit, handled as a negative
      literal).

    One interpreted pass beats 64 codegen'd aggregates here: the explode
    → ``sum(CASE WHEN bit)``×64 formulation was measured 1.7× *slower*
    (3.8 s vs 2.2 s at sf0.1) — the opposite verdict from MinHash, where
    16 single-min aggregates win.  Lesson recorded: HOF-vs-explode is a
    per-operator measurement, not a doctrine.

    Staged (``common.stage``): the signature feeds both sides of the band
    self-join and the hamming verify (same rationale as MinHash above);
    ``SSKOS_STAGE_MODE=table`` selects the production parquet staging.
    Explicit partition count on the repartition for the same AQE-
    coalesce reason documented in ``shingle_sets``."""
    masks = [F.lit(1 << j) for j in range(63)] + [F.lit(-(2**63))]
    mask_arr = F.array(*masks)
    th = F.transform(F.split(F.col("text"), " "), lambda t: F.xxhash64(t))
    counts = F.aggregate(
        th,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            mask_arr,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    sig = F.aggregate(
        F.zip_with(counts, mask_arr, lambda c, m: F.when(c > 0, m).otherwise(F.lit(0))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    par = docs.sparkSession.sparkContext.defaultParallelism
    return stage(
        docs.repartition(par, F.col(id_col)).select(id_col, sig.alias("sig"))
    )


@register("dedup_simhash")  # rows-only: xxhash64 signatures not in DuckDB
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: banded-signature LSH + exact hamming verify.

    64-bit signature split into 4×16-bit bands; by pigeonhole every pair
    at hamming ≤ 3 collides on at least one band, so the self-join is
    bucket-blocked (never O(n²)) with *guaranteed* recall at the stated
    radius.  Verify = ``bit_count(sig_a XOR sig_b) ≤ 3`` on candidates
    only.  Same scale shape as MinHash: the only shuffles are the bucket
    join and the pair distinct."""
    sigs = simhash_signatures(load_table(spark, sf_dir, "documents"))
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sig", 16 * b).bitwiseAND(0xFFFF)
                    for b in range(_SIMHASH_BANDS)
                ]
            )
        ).alias("band", "band_val"),
    )
    # Join carries ids only (a template-heavy corpus skews band buckets —
    # sf0.1 measured 236k raw collisions for 5k docs), pairs are distinct'd
    # BEFORE verify.  The signature lookups are deliberately UNHINTED: the
    # sig table is corpus-sized (16 B/doc -> tens of GB at 10^9+ docs), so
    # a broadcast would OOM the driver at scale.  Candidates are pair-sized,
    # so a plain shuffle hash join on the id key is output-sized work and
    # Catalyst may still choose broadcast on its own when the side is tiny.
    left = bands.select(F.col("doc_id").alias("id_a"), "band", "band_val")
    right = bands.select(F.col("doc_id").alias("id_b"), "band", "band_val")
    pairs = (
        left.join(right, ["band", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sig_a = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= 3)
        .orderBy("id_a", "id_b")
    )


_BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"  #: word | number | punct rune


@register(
    "text_bigram_pmi",
    # PMI ratio (no log): (c_ab/N_b) / ((c_a/N_u)·(c_b/N_u)).  Monotone in
    # PMI, and every operand is an exact integer cast to double with the
    # SAME operation order in both engines — IEEE ops are exactly
    # rounded, so the doubles are bit-identical and the ordering is
    # engine-independent (no last-ulp log() drift to truncate away).
    oracle="""
    WITH toks AS (
      SELECT string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
      FROM documents
    ), uni AS (
      SELECT unnest(t) AS w FROM toks
    ), uni_counts AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w
    ), totals AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_u,
             CAST(SUM(n - 1) AS BIGINT) AS n_b
      FROM toks
    ), bi AS (
      SELECT unnest(list_transform(range(1, n), i -> t[i] || ' ' || t[i + 1]))
               AS bigram
      FROM toks WHERE n >= 2
    ), bi_counts AS (
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM bi GROUP BY bigram
    )
    SELECT b.bigram, b.c_ab,
           floor(((CAST(b.c_ab AS DOUBLE) / t.n_b)
                  / ((CAST(a1.c AS DOUBLE) / t.n_u)
                     * (CAST(a2.c AS DOUBLE) / t.n_u))) * 100) / 100
             AS pmi_ratio
    FROM bi_counts b
    JOIN uni_counts a1 ON a1.w = string_split(b.bigram, ' ')[1]
    JOIN uni_counts a2 ON a2.w = string_split(b.bigram, ' ')[2]
    CROSS JOIN totals t
    WHERE b.c_ab >= 5
    ORDER BY pmi_ratio DESC, bigram
    LIMIT 20
    """,
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 bigrams by pointwise-mutual-information
    ratio (how much more often a word pair co-occurs than independence
    predicts) — the phrase-detection step of corpus analysis (and the
    classic word2vec-phrases preprocessing).

    Plan: bigram generation is a scan-side ``transform(sequence)``;
    unigram and bigram counts are partial+final aggregates; the PMI join
    touches only vocabulary-sized tables (deliberately UNHINTED — a web-
    scale token vocab can reach billions of entries, so Catalyst/AQE
    picks broadcast only when the side is actually small), and the two
    corpus totals ride in as a broadcast 1-row frame — one pass over
    text, everything after it output-sized.  Top-20 is
    TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    toks = d.select(t.alias("t"), F.size(t).alias("n"))
    uni_counts = toks.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    totals = toks.agg(
        F.sum("n").alias("n_u"), F.sum(F.col("n") - 1).alias("n_b")
    )
    bigrams = toks.where(F.col("n") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("bigram")
    )
    bi_counts = bigrams.groupBy("bigram").agg(F.count("*").alias("c_ab"))
    a1 = uni_counts.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    a2 = uni_counts.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    ratio = (F.col("c_ab").cast("double") / F.col("n_b")) / (
        (F.col("c_a").cast("double") / F.col("n_u"))
        * (F.col("c_b").cast("double") / F.col("n_u"))
    )
    return (
        bi_counts.where(F.col("c_ab") >= 5)
        .withColumn("w1", F.split("bigram", " ").getItem(0))
        .withColumn("w2", F.split("bigram", " ").getItem(1))
        .join(a1, "w1")
        .join(a2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "bigram",
            "c_ab",
            (F.floor(ratio * 100) / 100).alias("pmi_ratio"),
        )
        .orderBy(F.col("pmi_ratio").desc(), "bigram")
        .limit(20)
    )


@register(
    "text_repetition",
    oracle="""
    WITH tok_counts AS (
      SELECT doc_id, token, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE doc_id % 5 = 1)
      GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           floor(CAST(COUNT(*) AS DOUBLE) / SUM(c) * 10000) / 10000
             AS distinct_ratio,
           floor(CAST(MAX(c) AS DOUBLE) / SUM(c) * 10000) / 10000
             AS top_token_ratio,
           (CAST(MAX(c) AS DOUBLE) / SUM(c) > 0.1
            OR CAST(COUNT(*) AS DOUBLE) / SUM(c) < 0.3) AS flagged
    FROM tok_counts
    GROUP BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher rules): per-document
    distinct-token ratio and top-token share, with a flag for documents
    dominated by repeated tokens — the filter that removes boilerplate
    and keyword-stuffed pages from a pre-training corpus.

    Two-level aggregate, both partial+final: token counts per (doc,
    token), then doc-level distinct/max/sum over those counts.  Both
    group keys contain doc_id, so the second aggregate reuses the first
    shuffle's partitioning — one exchange total; ratios floor-truncated
    for cross-engine determinism, the FLAG compares raw doubles (same
    IEEE division both engines)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 1)
    tok_counts = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    distinct_ratio = F.count("*").cast("double") / F.sum("c")
    top_ratio = F.max("c").cast("double") / F.sum("c")
    return tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        (F.floor(distinct_ratio * 10000) / 10000).alias("distinct_ratio"),
        (F.floor(top_ratio * 10000) / 10000).alias("top_token_ratio"),
        ((top_ratio > 0.1) | (distinct_ratio < 0.3)).alias("flagged"),
    )


@register(
    "contamination_check",
    # Benchmark stand-in: every 97th doc plays the eval set.  Overlap =
    # count of shared 3-token shingles (set semantics) between each
    # benchmark doc and each other corpus doc, via a shingle equi-join —
    # output-sized (shared-shingle pairs), never |corpus|×|bench|.
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(sh)) AS shingle
      FROM (
        SELECT doc_id,
               CASE WHEN len(string_split(text, ' ')) < 3 THEN []
                    ELSE list_transform(
                      range(1, len(string_split(text, ' ')) - 1),
                      i -> string_split(text, ' ')[i] || ' ' ||
                           string_split(text, ' ')[i+1] || ' ' ||
                           string_split(text, ' ')[i+2]) END AS sh
        FROM documents)
    ), bench AS (
      SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 97 = 0
    ), corpus AS (
      SELECT doc_id AS corpus_id, shingle FROM sh WHERE doc_id % 97 <> 0
    ), overlap_counts AS (
      SELECT b.bench_id, c.corpus_id,
             CAST(COUNT(*) AS BIGINT) AS shared_shingles
      FROM bench b JOIN corpus c ON b.shingle = c.shingle
      GROUP BY b.bench_id, c.corpus_id
    )
    SELECT * FROM overlap_counts WHERE shared_shingles >= 3
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination detection: find corpus documents sharing
    ≥ 3 distinct 3-token shingles with any benchmark document — the
    decontamination step every serious pre-training corpus runs against
    its eval suites (the benchmark side here is a deterministic sample
    standing in for an external eval table).

    The join is shingle-equi (inverted-index shape): work scales with
    the number of SHARED shingles, not |corpus| × |bench|.  At 100 TB
    the benchmark side is tiny (eval suites are ~10⁵ docs) → broadcast;
    shingles are the same `_shingles` used by MinHash, so a pipeline
    computes them once and feeds both dedup and decontamination."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(F.array_distinct(_shingles(F.col("text")))).alias("shingle")
    )
    bench = sh.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    corpus = sh.where(F.col("doc_id") % 97 != 0).select(
        F.col("doc_id").alias("corpus_id"), "shingle"
    )
    return (
        bench.join(corpus, "shingle")
        .groupBy("bench_id", "corpus_id")
        .agg(F.count("*").alias("shared_shingles"))
        .where(F.col("shared_shingles") >= 3)
    )


@register(
    "vocab_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM toks
    GROUP BY token
    ORDER BY tf DESC, token
    LIMIT 50
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: global top-50 tokens by term frequency with
    document frequency — the seed-vocab step of a tokenizer build (and
    the stopword-candidate list of a quality pipeline).

    Explode is scan-side; the aggregate is partial+final on the token
    key; the top-k is TakeOrderedAndProject (no global sort).  At 100 TB
    the combiner collapses each partition to its distinct tokens before
    the shuffle, so wire volume is vocabulary-sized, not corpus-sized —
    the (tf DESC, token) tie-break keeps the cut deterministic."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), "token")
        .limit(50)
    )


@register(
    "text_tokens",
    oracle="""
    SELECT source,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')))
             AS BIGINT) AS bpe_tokens,
           ROUND(AVG(CAST(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS DOUBLE)
               / len(string_split(text, ' '))), 4) AS bpe_per_ws
    FROM documents
    GROUP BY source
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace vs a BPE-ish pre-tokenizer
    (letter runs | digit runs | single punctuation — the GPT-2-style
    split that approximates BPE token counts before merges).  Both are
    scan-side regex built-ins feeding one partial+final aggregate, so the
    100 TB cost is one pass over text plus a 20-group shuffle."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " "))
    bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_ISH), F.lit(0)))
    return d.groupBy("source").agg(
        F.sum(ws.cast("long")).alias("ws_tokens"),
        F.sum(bpe.cast("long")).alias("bpe_tokens"),
        F.round(F.avg(bpe.cast("double") / ws), 4).alias("bpe_per_ws"),
    )


@register("dedup_minhash")  # rows-only: xxhash64 signatures not in DuckDB
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified by exact Jaccard ≥ 0.5
    on the (hashed) shingle sets.  The verify join touches only candidate
    pairs, and set ops run over longs, not 3-token strings.

    Exact-collapse form (r11 — VERDICT r10 #2 killed the raw-pair shape):
    on a replica-heavy corpus (the sf10 fixture is ~99% replicas; real
    crawl corpora 30-60% exact dups) every identical-text clique of g
    members contributes C(g,2) Jaccard-1.0 pairs, so the raw pair LIST is
    quadratic in clique size — the sf10 probe measured 49.6× wall / 109×
    output (27.3M pairs) for 10× data: the OUTPUT, not the plan, is the
    100 TB killer.  Production recipe (the `corpus_dedup_survivorship`
    collapse, proven byte-identical against its raw-reachability oracle
    at three SFs): (1) hash-group texts on 128-bit md5 and elect the
    min-doc_id representative — ONE linear shuffle; (2) run LSH + exact
    Jaccard verify over REPRESENTATIVES only; (3) emit MULTIPLICITY
    algebra instead of expanded pairs: a rep pair (a, b) carries
    ``n_member_pairs = g_a·g_b`` (Jaccard is text-determined, so it is
    identical for every member pair it represents), and each exact-dup
    group of g ≥ 2 members (text ≥ 3 tokens — the shingle floor) emits
    one self row (rep, rep, all bands, jaccard 1.0, C(g,2) pairs).
    Σ n_member_pairs reproduces the raw pair count exactly; output is
    now linear in the DISTINCT-text near-dup structure."""
    d = load_table(spark, sf_dir, "documents")
    dd = d.select(
        "doc_id",
        "text",
        # 128-bit group key: a 64-bit hash collision would silently merge
        # two distinct texts' groups (same rationale as the
        # corpus_dedup_survivorship collapse, ADVICE r9).
        F.md5("text").alias("th"),
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    # Single-pass collapse (r14): carry the representative's text in the
    # min_by buffer instead of electing rep_id and joining back — the
    # r11 shape scanned+md5'd the corpus a second time and shuffled the
    # full text through a th-keyed join just to recover the survivor
    # rows.  min_by's map-side partial keeps ONE text per group per
    # task, so exact replicas collapse before the exchange and the
    # corpus crosses the wire once (it also removes the join's
    # th-shuffle of every text byte).  Staged: the group table feeds
    # FOUR consumers (signature sets, both multiplicity lookups, the
    # self rows).
    #
    # r15: the survivor's SHINGLE HASHES are computed inside this same
    # staging job (projections over the agg output — the th-hash
    # exchange already spreads the CPU evenly) and ``text`` is dropped
    # from the checkpoint: downstream only ever needs the hashed sets,
    # so the r14 shape's second staging pass (repartition + shingle +
    # checkpoint of the rep TEXTS via shingle_sets) was a whole extra
    # job and a text-sized checkpoint for nothing.  Shingling after the
    # collapse also keeps the duplicate texts un-shingled (dup-heavy
    # corpora shingle only survivors).  Segment profile at sf0.1:
    # groups 1.5 s + shingle stage 1.3 s → one ~1.9 s job.
    groups = stage(
        dd.groupBy("th").agg(
            F.min_by(F.struct("doc_id", "text"), "doc_id").alias("keep"),
            F.count(F.lit(1)).alias("g_n"),
            F.first("n_tok").alias("g_tok"),
        )
        .select(
            F.col("keep.doc_id").alias("rep_id"),
            F.split(F.col("keep.text"), " ").alias("_toks"),
            "g_n",
            "g_tok",
        )
        .select(
            "rep_id",
            _shingle_hashes(F.col("_toks")).alias("sh"),
            "g_n",
            "g_tok",
        )
    )
    sets_ = groups.select(F.col("rep_id").alias("doc_id"), "sh")
    cands = _candidates_from_sets(sets_)
    a = sets_.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets_.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    ga = groups.select(F.col("rep_id").alias("id_a"), F.col("g_n").alias("g_a"))
    gb = groups.select(F.col("rep_id").alias("id_b"), F.col("g_n").alias("g_b"))
    rep_pairs = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common_bands",
            (F.floor(inter / union * 10000) / 10000).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.5)
        .join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common_bands",
            "jaccard",
            (F.col("g_a") * F.col("g_b")).cast("long").alias("n_member_pairs"),
        )
    )
    # Identical texts share every band and sit at Jaccard exactly 1.0;
    # texts under the k=3 shingle floor have empty sets (null Jaccard in
    # the raw form) and are excluded there too.
    self_rows = groups.where((F.col("g_n") >= 2) & (F.col("g_tok") >= 3)).select(
        F.col("rep_id").alias("id_a"),
        F.col("rep_id").alias("id_b"),
        F.lit(_LSH_BANDS).cast("long").alias("n_common_bands"),
        F.lit(1.0).alias("jaccard"),
        (F.col("g_n") * (F.col("g_n") - 1) / 2).cast("long").alias("n_member_pairs"),
    )
    return rep_pairs.unionByName(self_rows).orderBy("id_a", "id_b")


#: Shared oracle CTE: the blocked Jaccard pair set (see
#: dedup_ngram_jaccard for semantics) — reused by the cluster oracle.
_JACCARD_PAIRS_SQL = """
    sets AS (
      SELECT doc_id,
             len(string_split(text, ' ')) // 8 AS blk,
             list_distinct(
               list_transform(range(1, len(string_split(text, ' ')) - 1),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2])) AS sh
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ), pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
           CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
                AS BIGINT) AS n_union
    FROM sets a JOIN sets b
      ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE 2 * len(list_intersect(a.sh, b.sh))
          >= len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
    )"""


def ngram_jaccard_pairs(d: DataFrame) -> DataFrame:
    """Blocked exact-Jaccard near-dup pairs (id_a < id_b) — see
    dedup_ngram_jaccard for the declared semantics and scale notes.

    Candidate generation is PPJoin-style PREFIX FILTERING, not a
    length-bucket self-join: each document indexes only its
    ``floor(|A|/2)+1`` globally-rarest shingles (sorted by corpus df,
    ties by shingle), and candidates are pairs sharing an indexed
    shingle in the same length bucket.  For Jaccard ≥ 0.5,
    ``|A∩B| ≥ ceil(|A|/2)`` on both sides, so by pigeonhole the
    smallest common shingle sits inside BOTH prefixes — recall is
    EXACT, results are byte-identical to the naive bucket join.

    Why it matters: the length-bucket self-join is O(Σ bucket²) — on
    the template-heavy fixture it went superlinear (measured 32× wall
    at 10× docs).  Prefix filtering makes candidate count track the
    number of docs sharing RARE shingles (hot template shingles sort
    last and never enter the index), and the verify join carries the
    shingle arrays only for candidate pairs — measured 34.4 s → 1.1 s
    at sf0.1 with identical output."""
    toks = F.split(F.col("text"), " ")
    sets = stage(
        d.where(F.size(toks) >= 3).select(
            "doc_id",
            (F.size(toks).cast("long") / 8).cast("long").alias("blk"),
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - 3),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(toks, i + 1),
                        F.element_at(toks, i + 2),
                        F.element_at(toks, i + 3),
                    ),
                )
            ).alias("sh"),
        )
    )
    idx = sets.select("doc_id", "blk", F.explode("sh").alias("shingle"))
    df_tbl = idx.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = (
        idx.join(df_tbl, "shingle")
        .groupBy("doc_id", "blk")
        .agg(F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("ordered"))
    )
    prefix = ranked.select(
        "doc_id",
        "blk",
        F.explode(
            F.slice(
                F.col("ordered"),
                F.lit(1),
                (F.floor(F.size("ordered") / 2) + 1).cast("int"),
            )
        ).alias("ps"),
    ).select("doc_id", "blk", F.col("ps.shingle").alias("shingle"))
    left = prefix.select(
        F.col("doc_id").alias("id_a"), F.col("blk").alias("blk_a"), "shingle"
    )
    right = prefix.select(
        F.col("doc_id").alias("id_b"), F.col("blk").alias("blk_b"), "shingle"
    )
    cand = (
        left.join(right, "shingle")
        .where((F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .where(2 * inter >= union)
        .select(
            "id_a",
            "id_b",
            inter.cast("long").alias("n_inter"),
            union.cast("long").alias("n_union"),
        )
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_JACCARD_PAIRS_SQL}
    SELECT id_a, id_b, n_inter, n_union FROM pairs
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (Jaccard ≥ 0.5) within
    length-bucket blocks — the third dedup family (exact set similarity)
    next to MinHash-LSH (approximate) and SimHash (bitwise).

    Semantics: 3-token shingle sets; candidate pairs are blocked on
    ``n_tokens div 8`` (a Jaccard ≥ 0.5 pair has token counts within 2×
    of each other, so near-dups land in the same or adjacent buckets —
    the operator's declared contract is same-bucket, mirrored exactly by
    the oracle).  The similarity test is INTEGER-only
    (``2·|A∩B| ≥ |A∪B|``): no float division, so the oracle hash can
    never drift on rounding.

    Scale: the block key bounds the self-join — each bucket joins only
    with itself (equi-join on ``blk``, one shuffle per side), never an
    unblocked cross product.  At 100 TB the same verify runs against
    LSH-band candidates instead of length buckets (``dedup_minhash``);
    this operator IS that verify step with an oracle-checkable blocking
    rule."""
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_clusters",
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
    )
    SELECT node AS doc_id,
           CAST(LEAST(node, MIN(other)) AS BIGINT) AS cluster_id,
           CAST(CASE WHEN node <= MIN(other) THEN 1 ELSE 0 END AS BIGINT)
               AS is_canonical
    FROM reach GROUP BY node
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER formation: connected components over the Jaccard
    pair graph — the step that turns pairwise matches into dedup groups
    (keep ``is_canonical``, drop the rest).

    Algorithm: hash-to-min label propagation WITH pointer jumping.
    Every node starts with label = min(self, neighbors); each round
    propagates the smallest label one hop (edges ⋈ labels, min per
    node) and then shortcuts through the label graph (adopt the label's
    label), which is what actually delivers O(log diameter) rounds —
    near-dup components are tiny (pairs/triples), so 2-3 rounds in
    practice.  Each round is two shuffles on the node id (hop + jump);
    per-round convergence check is a count on
    the changed-label set (a deliberate scalar driver action — this is
    an iterative algorithm, the loop lives on the driver by design, as
    in GraphX/Pregel).  Intermediate labels are ``stage``d so lineage
    does not grow with iterations (prod: staged table, common.stage).

    The oracle is an independent formulation — DuckDB recursive-CTE
    transitive closure (O(n·m), fine at fixture scale, NOT the scale
    algorithm) — so the parity check validates the propagation against
    closed-form reachability."""
    pairs = ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        F.when(F.col("node") == F.col("lbl"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_canonical"),
    )


def connected_components(pairs: DataFrame, max_rounds: int = 25) -> DataFrame:
    """Hash-to-min + pointer-jumping connected components over an
    undirected pair list (columns ``id_a``/``id_b``) → (node, lbl) where
    ``lbl`` is the component's minimum node id.

    Each round does TWO propagation steps: (1) one-hop min over the edge
    graph (edges ⋈ labels, min per node), then (2) a pointer-jumping
    shortcut through the LABEL graph — every node also adopts the label
    of its current label (labels self-join on lbl == node).  Step 2 is
    what makes convergence O(log diameter): label chains halve every
    round (path-doubling), so a d-hop chain resolves in ~log2(d) rounds
    instead of d (verified by tests/test_properties.py on a 33-hop
    chain).  max_rounds=25 therefore covers components of diameter
    ~2^25 — unreachable in practice; the RuntimeError is a corruption
    guard, not a real ceiling.  See dedup_clusters for scale notes."""
    fwd = pairs.select(F.col("id_a").alias("s"), F.col("id_b").alias("t"))
    edges = stage(fwd.union(fwd.select(F.col("t").alias("s"), F.col("s").alias("t"))))
    labels = (
        edges.groupBy("s")
        .agg(F.least(F.first("s"), F.min("t")).alias("lbl"))
        .select(F.col("s").alias("node"), "lbl")
    )
    for _ in range(max_rounds):
        labels = stage(labels)
        msgs = edges.join(labels, edges.s == labels.node).select(
            F.col("t").alias("node"), "lbl"
        )
        hop = labels.union(msgs).groupBy("node").agg(F.min("lbl").alias("lbl"))
        # Pointer jump: adopt the label of the label (lbl is a node id,
        # and its own label is ≤ it).  Left join + coalesce guards the
        # round-0 case where a min label has no row yet.
        jumped = (
            hop.join(
                hop.select(F.col("node").alias("lbl"), F.col("lbl").alias("lbl2")),
                "lbl",
                "left",
            )
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("lbl2", F.col("lbl"))).alias("lbl"),
            )
        )
        new_labels = stage(jumped)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lbl") < F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"label propagation did not converge in {max_rounds} rounds")


_MD5_PERMS = 8  #: md5-derived signature length for the oracle-backed variant
_MD5_BAND_ROWS = 4  #: 2 bands of 4 rows


def _md5_hash(col: Column, perm: int) -> Column:
    """Permutation hash both engines can compute bit-identically: the
    first 15 hex digits of md5(shingle || perm) parsed as a BIGINT.
    (15 hex digits < 2^60 — no sign/overflow divergence.)"""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(str(perm)))), 1, 15), 16, 10
    ).cast("long")


@register(
    "dedup_minhash_md5",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_sort(list_distinct(
               list_transform(range(1, len(string_split(text, ' ')) - 1),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2]))) AS sh
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ), ex AS (
      SELECT doc_id, unnest(sh) AS s FROM tok
    ), sig AS (
      SELECT doc_id,
             {", ".join(f"MIN(CAST(('0x' || substr(md5(s || '{p}'), 1, 15)) AS BIGINT)) AS h{p}" for p in range(_MD5_PERMS))}
      FROM ex GROUP BY doc_id
    ), banded AS (
      SELECT doc_id,
             {" || '_' || ".join(f"CAST(h{p} AS VARCHAR)" for p in range(_MD5_BAND_ROWS))} AS b0,
             {" || '_' || ".join(f"CAST(h{p} AS VARCHAR)" for p in range(_MD5_BAND_ROWS, _MD5_PERMS))} AS b1
      FROM sig
    ), cand AS (
      SELECT x.doc_id AS a, y.doc_id AS b
      FROM banded x JOIN banded y ON x.b0 = y.b0 AND x.doc_id < y.doc_id
      UNION
      SELECT x.doc_id, y.doc_id
      FROM banded x JOIN banded y ON x.b1 = y.b1 AND x.doc_id < y.doc_id
    )
    SELECT c.a, c.b,
           CAST(len(list_intersect(ta.sh, tb.sh)) AS BIGINT) AS n_inter,
           CAST(len(ta.sh) + len(tb.sh)
                - len(list_intersect(ta.sh, tb.sh)) AS BIGINT) AS n_union
    FROM cand c
    JOIN tok ta ON ta.doc_id = c.a
    JOIN tok tb ON tb.doc_id = c.b
    WHERE 2 * len(list_intersect(ta.sh, tb.sh))
          >= len(ta.sh) + len(tb.sh) - len(list_intersect(ta.sh, tb.sh))
    """,
)
def dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with a FULLY oracle-checkable hash: md5-derived
    permutations (8 perms, 2 bands of 4) instead of xxhash64.  The
    production `dedup_minhash` stays on xxhash64 (cheaper, but DuckDB
    cannot mirror it, so it is rows-only); this variant proves the
    entire pipeline — shingle → signature → band → candidate join →
    exact-Jaccard verify — end to end against the oracle, because every
    stage is deterministic integer/string arithmetic in both engines.

    Plan shape is identical to dedup_minhash: explode + 8 MIN aggregates
    build signatures in one pass, candidates come from band-key
    equi-joins only (never all-pairs), and the Jaccard gate
    `2·|∩| ≥ |∪|` is exact integer arithmetic on the shingle sets.  At
    100 TB you'd run the xxhash64 variant; this one is the semantic
    contract both are held to."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", _shingles(F.col("text")).alias("sh")).where(
        F.size("sh") > 0
    )
    ex = tok.select("doc_id", F.explode("sh").alias("s"))
    sig = ex.groupBy("doc_id").agg(
        *[F.min(_md5_hash(F.col("s"), p)).alias(f"h{p}") for p in range(_MD5_PERMS)]
    )
    b0 = F.concat_ws("_", *[F.col(f"h{p}") for p in range(_MD5_BAND_ROWS)])
    b1 = F.concat_ws(
        "_", *[F.col(f"h{p}") for p in range(_MD5_BAND_ROWS, _MD5_PERMS)]
    )
    banded = sig.select("doc_id", b0.alias("b0"), b1.alias("b1"))
    x = banded.select(
        F.col("doc_id").alias("a"), F.col("b0").alias("xb0"), F.col("b1").alias("xb1")
    )
    y = banded.select(
        F.col("doc_id").alias("b"), F.col("b0").alias("yb0"), F.col("b1").alias("yb1")
    )
    cand = (
        x.join(y, (F.col("xb0") == F.col("yb0")) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .union(
            x.join(y, (F.col("xb1") == F.col("yb1")) & (F.col("a") < F.col("b")))
            .select("a", "b")
        )
        .distinct()
    )
    ta = tok.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha"))
    tb = tok.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size("sha") + F.size("shb") - inter
    return (
        cand.join(ta, "a")
        .join(tb, "b")
        .where(2 * inter >= union)
        .select(
            "a",
            "b",
            inter.cast("long").alias("n_inter"),
            union.cast("long").alias("n_union"),
        )
    )


@register(
    "bpe_merge_candidates",
    oracle="""
    WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    vocab AS (SELECT w, COUNT(*) AS f FROM words GROUP BY w),
    pairs AS (
      SELECT unnest(list_transform(
               generate_series(1, length(w) - 1),
               i -> substr(w, CAST(i AS INTEGER), 2))) AS pair, f
      FROM vocab WHERE length(w) >= 2
    )
    SELECT pair, CAST(SUM(f) AS BIGINT) AS freq
    FROM pairs GROUP BY pair
    ORDER BY freq DESC, pair LIMIT 20
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge decision: the 20 most frequent adjacent character
    pairs across the corpus, weighted by word frequency — the counting
    step a byte-pair-encoding tokenizer trainer iterates (Sennrich et
    al. 2016; each merge round recounts pairs over the updated vocab,
    and this query IS one round).

    Scale notes: pairs are counted over the VOCABULARY (distinct words
    + frequency), not the token stream — the corpus-sized explode
    collapses to a vocab-sized frame in the first partial+final agg,
    and the per-word pair explode (|w|−1 per word) runs on that small
    frame.  On 100 TB of text the vocab is ~10⁶-10⁷ rows regardless of
    corpus size, so every BPE round after the first scan is
    vocab-local; tie-break (freq DESC, pair) makes the merge choice —
    and hence the whole learned tokenizer — engine-independent.
    Char-level `substr` in both engines; no UDF anywhere."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .where(F.length("w") >= 2)
    )
    pairs = vocab.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "f",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").alias("freq"))
        .orderBy(F.col("freq").desc(), "pair")
        .limit(20)
    )


@register(
    "char_ngram_profile",
    oracle="""
    WITH grams AS (
      SELECT lang,
             unnest(list_transform(
               generate_series(1, length(text) - 2),
               i -> substr(text, CAST(i AS INTEGER), 3))) AS g
      FROM documents WHERE length(text) >= 3
    )
    SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS n
    FROM grams GROUP BY lang, g
    QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, g) <= 10
    """,
)
def char_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language profile: the top-10 char 3-grams per
    language — the model table behind n-gram language identification
    (Cavnar-Trenkle out-of-place ranking trains on exactly this; our
    heuristic `text_langid` consumes hand-picked marker grams, this
    builds the full profile from data).

    Scale notes: the per-position explode is scan-side and collapses in
    the FIRST partial aggregate to (lang × distinct-trigram)
    cardinality — bounded by |alphabet|³ per language, not corpus size
    — so the shuffle is model-sized.  The top-10 rank window runs on
    that small frame, partitioned by lang.  Deterministic (n DESC, g)
    tie-break keeps the learned profile engine-independent, same
    discipline as `vocab_topk`/`bpe_merge_candidates`.

    Dirty-data guard (ADVICE r4): texts shorter than 3 chars are
    filtered on BOTH sides — Spark's sequence(1, len-2) would step -1
    for len<3 (e.g. sequence(1,0) = [1,0]) and emit junk grams from
    substr at pos <= 0, while DuckDB's generate_series(1,0) is empty;
    the shared filter removes the engine divergence."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") >= 3)
    grams = d.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 2),
                lambda i: F.col("text").substr(i, F.lit(3)),
            )
        ).alias("g"),
    )
    counts = grams.groupBy("lang", "g").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "g")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .drop("rn")
    )


@register(
    "dedup_incremental_merge",
    oracle="""
    WITH corpus AS (
      SELECT DISTINCT sha256(regexp_replace(lower(text), '\\s+', ' ', 'g'))
               AS content_hash
      FROM documents WHERE doc_id % 5 <> 0
    ), incoming AS (
      SELECT doc_id, source,
             sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS content_hash
      FROM documents WHERE doc_id % 5 = 0
    ), novel AS (
      SELECT i.doc_id, i.source, i.content_hash
      FROM incoming i
      WHERE NOT EXISTS (SELECT 1 FROM corpus c
                        WHERE c.content_hash = i.content_hash)
    )
    SELECT content_hash, MIN(doc_id) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_in_batch
    FROM novel GROUP BY content_hash
    """,
)
def dedup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingestion: dedupe a NEW document batch against
    an existing deduped corpus, then within itself — the two-stage
    admission check every recurring crawl/ingest pipeline runs (the
    batch flavor of `stream_dedup_corpus`).  Docs with doc_id % 5 == 0
    play the incoming batch; the rest, the standing corpus.

    Order matters at scale and is encoded in the plan: the
    CORPUS-membership anti-join runs FIRST on the raw batch (the corpus
    ledger is hash-only — narrow — and the anti-join discards most
    dupes before any batch-internal work), then the intra-batch min_by
    collapse runs on survivors only.  Both stages key on content_hash,
    so the second reuses the first's partitioning.  At 100 TB the
    corpus side is a hash-only ledger table (or an offline bloom with
    exact verification on hits — `stream_dedup_corpus` documents that
    variant)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.sha2(_norm_text(F.col("text")), 256).alias("content_hash")
    corpus = d.where(F.col("doc_id") % 5 != 0).select(h).distinct()
    incoming = d.where(F.col("doc_id") % 5 == 0).select("doc_id", "source", h)
    novel = incoming.join(corpus, "content_hash", "left_anti")
    return novel.groupBy("content_hash").agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("n_in_batch"),
    )


@register(
    "text_pii_redact",
    # Both sides inject the SAME deterministic PII derived from doc_id
    # before redacting — fixture texts carry no natural PII, and an
    # identity-transform oracle would prove nothing.  Injection into
    # doc_id % 2 == 0 docs only, so the no-match path is exercised too.
    # Raw string: \b must reach RE2 as a word boundary, not a backspace.
    oracle=r"""
    WITH staged AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN
                   text || ' contact user' || doc_id ||
                   '@example.com or 10.0.' || (doc_id % 256) || '.' ||
                   (doc_id % 100) || ' phone 555-' ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE text END AS text
        FROM documents WHERE doc_id % 3 = 1
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(text, '\b555-\d{4}\b')) AS BIGINT)
             AS n_phones,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\b555-\d{4}\b', '<PHONE>', 'g')) AS BIGINT) AS redacted_len,
           right(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\b555-\d{4}\b', '<PHONE>', 'g'), 40) AS redacted_tail
    FROM staged
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the compliance pass every LLM
    training corpus runs before anything else: emails, IPv4 addresses
    and phone-shaped numbers found, counted, and masked with typed
    placeholders.

    Scale notes: pure scan-side ``regexp_count``/``regexp_replace``
    chain — codegen'd JVM regex per row, no shuffle at all (the
    narrowest possible pipeline shape); at 100 TB this runs at scan
    throughput and column-prunes to (doc_id, text).  Patterns are kept
    to the Java∩RE2 regex subset so the DuckDB oracle runs the
    byte-identical expressions."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 1)
    injected = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.col("text"), F.lit(" contact user"), F.col("doc_id"),
            F.lit("@example.com or 10.0."), F.col("doc_id") % 256,
            F.lit("."), F.col("doc_id") % 100, F.lit(" phone 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ipv4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    phone = r"\b555-\d{4}\b"
    staged = d.select("doc_id", injected.alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email, "<EMAIL>"),
            ipv4, "<IP>",
        ),
        phone, "<PHONE>",
    )
    return staged.select(
        "doc_id",
        F.regexp_count("text", F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(ipv4)).cast("long").alias("n_ips"),
        F.regexp_count("text", F.lit(phone)).cast("long").alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"),
        F.substring(redacted, -40, 40).alias("redacted_tail"),
    )


#: Zero-width (ZWSP/ZWNJ/ZWJ/BOM) + C0-control strip class — identical
#: escapes compile in Java regex (Spark) and RE2 (DuckDB).
_ZW_CTRL = r"[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{0000}-\x{001F}]"


def unicode_fold(col: Column) -> Column:
    """Accent/NFC fold: NFD-decompose, drop combining marks, recompose
    NFC — the classic unaccent, representation-insensitive (composed
    'é' and decomposed 'e'+U+0301 both fold to 'e').

    This is the repo's one hot-path Python stage outside the §2.11
    demos: Spark ships NO Unicode-normalization builtin (probed: no
    normalize/nfc/strip_accents in SHOW FUNCTIONS, and `reflect` can't
    pass java.text.Normalizer's Form enum), so the fold runs as an
    Arrow-batched pandas UDF over `unicodedata` — vectorized transfer,
    ~10-100× over a row UDF; a production deployment would register a
    JVM ICU function instead.  The DuckDB twin is
    ``strip_accents(nfc_normalize(x))`` (equality on composed,
    decomposed, zero-width, control and BOM inputs verified in the
    r10 probe and continuously by oracle parity)."""
    import unicodedata

    @F.pandas_udf("string")
    def _fold(s: pd.Series) -> pd.Series:
        def f(x):
            if x is None:
                return None
            decomp = unicodedata.normalize("NFD", x)
            kept = "".join(
                c for c in decomp if not unicodedata.combining(c)
            )
            return unicodedata.normalize("NFC", kept)

        return s.map(f)

    return _fold(col)


@register(
    "text_normalize",
    # Both sides MANGLE deterministically first (case flips, doubled
    # whitespace, punctuation noise, and — r10 — Unicode damage:
    # zero-width joiners, C0 controls, a BOM, and composed é for every
    # 'e', keyed on doc_id) — fixture text is already clean ascii, so
    # normalizing it directly would test nothing.  chr() codepoints
    # keep the SQL free of invisible characters.
    oracle="""
    WITH mangled AS (
        SELECT doc_id,
               CASE doc_id % 3
                   WHEN 0 THEN upper(text) || '!!!'
                            || chr(8203) || chr(8205)
                   WHEN 1 THEN '  ' || replace(text, ' ', '   ') || '??'
                            || chr(7) || chr(65279)
                   ELSE replace(text, 'e', chr(233)) || ' ' || chr(769)
               END AS raw
        FROM documents WHERE doc_id % 4 = 2
    ), folded AS (
        SELECT doc_id,
               regexp_replace(strip_accents(nfc_normalize(raw)),
                   '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}\\x{0000}-\\x{001F}]',
                   '', 'g') AS f
        FROM mangled
    )
    SELECT doc_id,
           CAST(length(trim(regexp_replace(regexp_replace(lower(f),
               '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT)
             AS norm_len,
           CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(f),
               '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT)
             AS n_tokens,
           sha256(trim(regexp_replace(regexp_replace(lower(f),
               '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash
    FROM folded
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization — Unicode accent/NFC fold, zero-width/control
    strip, casefold, strip non-alphanumerics, collapse whitespace, trim:
    the canonical cleanup pass before fingerprinting or dedup
    (``_norm_text`` is its hash-pipeline sibling).  Real multilingual
    corpora carry homoglyph/ZWJ/BOM noise that defeats hash-based dedup
    keys — a composed 'é' and its decomposed twin are different bytes
    for the same glyph — so the fold runs FIRST (VERDICT r9 #4).  The
    pytest twin asserts two semantic laws: normalize(mangled) ==
    original fixture text (the damage — including é-substitution and
    appended combining marks — is fully undone), and composed/decomposed
    representations of the same text normalize identically.

    Scale notes: the fold is the repo's one hot-path pandas UDF (see
    `unicode_fold` — no Spark builtin exists); everything after it is
    a scan-side lower/regexp chain, zero shuffle, codegen'd.  Output
    carries the sha256 of the normalized text (what a dedup ledger
    would store), not the text itself."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 2)
    raw = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.upper("text"), F.lit("!!!" + chr(8203) + chr(8205))),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("  "),
                     F.regexp_replace("text", " ", "   "),
                     F.lit("??" + chr(7) + chr(65279))),
        )
        .otherwise(
            F.concat(F.replace(F.col("text"), F.lit("e"), F.lit(chr(233))),
                     F.lit(" " + chr(769)))
        )
    )
    folded = F.regexp_replace(unicode_fold(raw), _ZW_CTRL, "")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(folded), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return d.select(
        "doc_id",
        F.length(norm).cast("long").alias("norm_len"),
        F.size(F.split(norm, " ")).cast("long").alias("n_tokens"),
        F.sha2(norm, 256).alias("norm_hash"),
    )


@register(
    "text_entropy",
    # Entropy over the TOKEN distribution: H = ln(n) - Σ c·ln(c) / n.
    # Integer counts keep both engines' doubles far from the 4-decimal
    # rounding boundary.
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id % 5 = 3
    ), counts AS (
        SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(ln(CAST(SUM(c) AS DOUBLE))
                 - SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c), 4) AS entropy_nats
    FROM counts
    GROUP BY doc_id
    """,
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution entropy per document — the repetition/
    diversity quality signal (low entropy = boilerplate or degenerate
    repetition; complements `text_repetition`'s top-ngram share).

    Scale notes: explode → two-level partial+final aggregate, both
    keyed on doc_id so the second agg reuses the first's partitioning
    (one shuffle total); the per-doc token map never materializes on
    the driver.  H = ln(n) − Σc·ln(c)/n is computed from integer
    counts — numerically stable and engine-agnostic at 4 decimals."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 3)
    counts = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double")))
            / F.sum("c"),
            4,
        ).alias("entropy_nats"),
    )


@register(
    "dedup_containment",
    # Ordered pairs (containment is asymmetric); the 0.8 threshold is
    # the integer inequality 5·|A∩B| ≥ 4·|A| — no float anywhere.  The
    # oracle is the UNBLOCKED inverted-index overlap count (exact,
    # fixture-scale); the engine's prefix-filtered candidates must
    # reproduce it byte-for-byte, proving the filter loses nothing.
    oracle="""
    WITH sets AS (
      SELECT doc_id,
             list_distinct(
               list_transform(range(1, len(string_split(text, ' ')) - 1),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2])) AS sh
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ), ix AS (
      SELECT doc_id, unnest(sh) AS s FROM sets
    ), ov AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM ix a JOIN ix b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT ov.id_a, ov.id_b, ov.n_inter,
           CAST(len(sa.sh) AS BIGINT) AS n_a
    FROM ov JOIN sets sa ON ov.id_a = sa.doc_id
    WHERE 5 * ov.n_inter >= 4 * len(sa.sh)
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-SUBSET detection: ordered pairs (a, b) where ≥ 80% of a's
    3-token shingles appear in b — the asymmetric twin of Jaccard dedup
    that Jaccard misses by construction (a short document quoted inside
    a long one has low Jaccard but high containment; the
    boilerplate-wrapped-copy case every corpus dedup pipeline needs).

    Candidate generation is the asymmetric prefix filter: each document
    indexes its ``⌊|A|/5⌋+1`` globally-RAREST shingles (df-ranked), and
    candidates pair an A-prefix entry with the FULL inverted index on
    the B side.  If C(A→B) ≥ 0.8, at most ⌊|A|/5⌋ of A's shingles miss
    B, so by pigeonhole one prefix shingle is shared — recall is EXACT
    (the oracle computes the unblocked answer).  Verification carries
    shingle arrays for candidate pairs only.

    Scale notes: prefix entries are A's rarest shingles, so join
    fan-out per entry tracks that shingle's corpus df (hot template
    shingles never enter the prefix); candidate count scales with
    docs-sharing-rare-shingles, not |corpus|².  Three shuffles total
    (df count, candidate join, verify join) — same posture as
    `dedup_ngram_jaccard`, measured there at 30× over the naive
    self-join."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sets = stage(
        d.where(F.size(toks) >= 3).select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - 3),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(toks, i + 1),
                        F.element_at(toks, i + 2),
                        F.element_at(toks, i + 3),
                    ),
                )
            ).alias("sh"),
        )
    )
    idx = sets.select("doc_id", F.explode("sh").alias("shingle"))
    df_tbl = idx.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = (
        idx.join(df_tbl, "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias(
                "ordered"
            )
        )
    )
    prefix = ranked.select(
        F.col("doc_id").alias("id_a"),
        F.explode(
            F.transform(
                F.slice(
                    F.col("ordered"),
                    1,
                    (F.size("ordered") / 5).cast("int") + 1,
                ),
                lambda s: s["shingle"],
            )
        ).alias("shingle"),
    )
    cand = (
        prefix.join(idx.withColumnRenamed("doc_id", "id_b"), "shingle")
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sha"))
    sb = sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("shb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sha", "shb")).cast("long").alias(
                "n_inter"
            ),
            F.size("sha").cast("long").alias("n_a"),
        )
        .where(5 * F.col("n_inter") >= 4 * F.col("n_a"))
    )


@register(
    "text_dedup_paragraph",
    # Unit = '. '-delimited sentence ≥ 20 chars, distinct per doc; keys
    # travel as md5 digests (16 B) — both engines split/filter/digest
    # identically, and the retained fraction is integer-HALF-UP rounded.
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0
                  THEN 'This content is provided for informational purposes only. ' || text
                  ELSE text END AS text0
      FROM documents
    ), seeded2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text0 || '. All rights reserved by the original publisher'
                  ELSE text0 END AS text
      FROM seeded
    ), units AS (
      SELECT doc_id, md5(u) AS uh
      FROM (
        SELECT doc_id, unnest(list_distinct(string_split(text, '. '))) AS u
        FROM seeded2
      ) WHERE len(u) >= 20
    ), df AS (
      SELECT uh, COUNT(DISTINCT doc_id) AS n_docs FROM units GROUP BY uh
    )
    SELECT u.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_units,
           CAST(SUM(CASE WHEN df.n_docs >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_units,
           CAST(((SUM(CASE WHEN df.n_docs < 3 THEN 1 ELSE 0 END) * 2000000
                  + COUNT(*)) // (2 * COUNT(*))) AS DOUBLE) / 1000000.0
             AS retained_frac
    FROM units u JOIN df ON u.uh = df.uh
    GROUP BY u.doc_id
    ORDER BY u.doc_id
    """,
)
def text_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-paragraph accounting: sentence units that
    recur across ≥ 3 distinct documents are flagged as boilerplate, and
    each document reports its unit count, duplicated-unit count, and
    retained fraction — the C4/Gopher "remove any line shared by N
    pages" step, as the per-document audit that decides the cut.

    The fixture's units are all cross-doc unique, so both engine and
    oracle deterministically seed shared boilerplate (header on
    doc_id%4==0, footer on doc_id%7==0 — the `text_pii_redact`
    injection discipline): the duplicated-unit path is PROVEN, not
    assumed, and the pytest asserts the flagged counts are non-zero.

    Units are '. '-delimited spans ≥ 20 chars, DISTINCT per document
    (a doc repeating its own sentence is self-repetition —
    `text_repetition`'s job — not corpus boilerplate).

    Scale notes: units travel as md5 DIGESTS (16 B) from the scan
    onward — the raw span text never shuffles (at 100 TB the unit
    strings dwarf the doc table; digests make the frequency shuffle
    key-sized).  One explode → one digest-keyed agg → join back on the
    digest → per-doc agg: the digest agg and the join reuse the same
    hash partitioning.  The ≥ 3-doc threshold is a broadcast-free
    HAVING on the frequency table."""
    d = load_table(spark, sf_dir, "documents")
    # The fixture has NO cross-doc repeated unit (measured: max df = 1),
    # so — as with text_pii_redact — both sides deterministically seed
    # boilerplate (a header on doc_id%4, a footer on doc_id%7) to prove
    # the flagging path as well as the pass-through path.
    seeded = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(
                    "This content is provided for informational purposes only. "
                ),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text0"),
    ).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text0"),
                F.lit(". All rights reserved by the original publisher"),
            ),
        )
        .otherwise(F.col("text0"))
        .alias("text"),
    )
    units = (
        seeded.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.col("text"), "\\. "))
            ).alias("u"),
        )
        .where(F.length("u") >= 20)
        .select("doc_id", F.md5("u").alias("uh"))
    )
    freq = units.groupBy("uh").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return (
        units.join(freq, "uh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_units"),
            F.sum(F.when(F.col("n_docs") >= 3, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_units"),
            (
                F.expr(
                    "(sum(case when n_docs < 3 then 1 else 0 end) * 2000000"
                    " + count(*)) div (2 * count(*))"
                ).cast("double")
                / 1000000.0
            ).alias("retained_frac"),
        )
        .orderBy("doc_id")
    )


_BPE_ROUNDS = 3


def _bpe_apply_merge(syms: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (left, right)
    symbol pairs — canonical BPE application (Sennrich et al. 2016) as
    a pure catalyst fold: state = (result list, carry symbol); a
    (carry==left, x==right) hit emits the merged symbol and clears the
    carry so overlaps never double-merge ("aaa" + (a,a) → [aa, a])."""
    merged = F.lit(left + right)

    def step(acc: Column, x: Column) -> Column:
        hit = (acc["carry"] == F.lit(left)) & (x == F.lit(right))
        return F.when(
            hit,
            F.struct(
                F.array_append(acc["res"], merged).alias("res"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(
            F.struct(
                F.when(acc["carry"].isNull(), acc["res"])
                .otherwise(F.array_append(acc["res"], acc["carry"]))
                .alias("res"),
                x.alias("carry"),
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("res"),
        F.lit(None).cast("string").alias("carry"),
    )
    return F.aggregate(
        syms,
        init,
        step,
        lambda acc: F.when(acc["carry"].isNull(), acc["res"]).otherwise(
            F.array_append(acc["res"], acc["carry"])
        ),
    )


def _bpe_learn_merges(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, str, str, int]]:
    """The shared Sennrich training loop behind `bpe_train_iterative`
    (which ships the merge table) and `bpe_encode_corpus` (which applies
    it) — one implementation, two registered surfaces."""
    d = load_table(spark, sf_dir, "documents")
    vocab = stage(
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .where(F.length("w") >= 2)
        .select(
            # Spark split keeps the trailing empty match of the
            # char-split lookahead ("abc" -> [a,b,c,""]) -- drop it, or
            # round 2 merges real symbols with phantoms.
            F.filter(
                F.split("w", "(?!^)"), lambda x: x != ""
            ).alias("syms"),
            "f",
        )
    )
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(_BPE_ROUNDS):
        pairs = vocab.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("syms") - 2),
                    lambda i: F.struct(
                        F.element_at("syms", i + 1).alias("l"),
                        F.element_at("syms", i + 2).alias("r"),
                    ),
                )
            ).alias("p"),
            "f",
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("f").alias("freq"))
            .orderBy(F.col("freq").desc(), "l", "r")
            .first()
        )
        merges.append((rnd, best["l"], best["r"], int(best["freq"])))
        vocab = stage(
            vocab.select(
                _bpe_apply_merge(F.col("syms"), best["l"], best["r"]).alias(
                    "syms"
                ),
                "f",
            )
        )
    return merges


@register("bpe_train_iterative")  # rows-only: python-reference twin in pytest
def bpe_train_iterative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING, three full merge rounds —
    `bpe_merge_candidates` is one counting step; this is the actual
    Sennrich et al. loop: count weighted adjacent symbol pairs over the
    vocabulary, adopt the (freq DESC, left, right) argmax as the next
    merge, rewrite every word's symbol sequence, repeat.  Output is the
    learned merge table — the artifact a tokenizer ships.

    Merge APPLICATION is a catalyst `aggregate` fold (no UDF): plain
    string replace cannot express left-to-right non-overlapping merges
    (the consumed-separator/lookaround problem — RE2 has no
    lookbehind), so the fold carries (result, last-symbol) state per
    word.  The pytest twin trains the same rounds with an independent
    canonical python implementation and asserts the merge tables are
    IDENTICAL — exact cross-implementation evidence where no SQL
    oracle is expressible.

    Scale notes: after the one corpus-sized scan builds (word, freq),
    every round is vocab-local (~10⁶-10⁷ rows at any corpus size): a
    pair explode + partial+final agg, a 1-row argmax pull (the merge
    DECISION — driver-coordinated by design, like the pagerank loop),
    and a map-side fold rewrite; `stage()` truncates lineage per
    round."""
    return spark.createDataFrame(
        _bpe_learn_merges(spark, sf_dir),
        "round long, left string, right string, freq long",
    )


@register("bpe_encode_corpus")  # rows-only: python-reference twin in pytest
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — the other half of the tokenizer
    lifecycle: take the merge table `bpe_train_iterative` learns and
    tokenize the whole corpus with it, reporting per-document token
    counts (the numbers a training-mix planner actually consumes:
    tokens per doc, fertility = tokens per word).

    The key scale decision: encode the DISTINCT-WORD VOCABULARY, not
    the token stream — each word type is split to symbols and run
    through the same `_bpe_apply_merge` catalyst fold once per learned
    merge (map-side, no UDF), then per-doc counts come from joining
    (doc, word, count) back to (word, n_toks) and one aggregate.  At
    100 TB the corpus has ~10⁹ word occurrences per 10⁶ word types —
    encoding work scales with the vocabulary, the join is
    vocab×occurrence equi-keyed, and the merge table itself is the
    only driver-side artifact (3 rows here; ~50k in a real tokenizer).

    Single-char words never merge and bypass the vocab (cost 1 token);
    empty strings from repeated separators are dropped on both the
    engine and twin sides.  The pytest twin encodes every document with
    the canonical in-memory BPE implementation and asserts EXACT
    per-doc equality."""
    merges = _bpe_learn_merges(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    syms: Column = F.filter(F.split("w", "(?!^)"), lambda x: x != "")
    for _, left, right, _ in merges:
        syms = _bpe_apply_merge(syms, left, right)
    vtok = (
        wc.select("w")
        .distinct()
        .where(F.length("w") >= 2)
        .select("w", F.size(syms).alias("n_toks"))
    )
    return (
        wc.join(vtok, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.coalesce("n_toks", F.lit(1)))
            .cast("long")
            .alias("n_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            F.expr("(n_tokens * 1000) div n_words")
            .cast("long")
            .alias("fertility_e3"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_lm_perplexity",
    # Float discipline: each bigram's surprisal is ONE log2 over an
    # exact-IEEE quotient of integers, floored into integer MILLI-BIT
    # units at the model-entry level (granularity 1e-3 vs cross-engine
    # log ulp drift ~1e-12 — no realistic boundary flip); every
    # aggregate after that is exact integer arithmetic, immune to
    # partition-order summation drift (same posture as vectors.py).
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, text FROM documents WHERE length(text) >= 2
    ), grams AS (
      SELECT doc_id, lang, unnest(list_transform(
               generate_series(1, length(text) - 1),
               i -> substr(text, i, 2))) AS g
      FROM d
    ), model AS (
      SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS c
      FROM grams GROUP BY lang, g
    ), lang_tot AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM model GROUP BY lang
    ), costs AS (
      SELECT m.lang, m.g,
             CAST(floor(log2(CAST(t.tot + t.v AS DOUBLE) / (m.c + 1))
                        * 1000) AS BIGINT) AS mbits
      FROM model m JOIN lang_tot t ON m.lang = t.lang
    ), scored AS (
      SELECT g.doc_id, g.lang,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(c.mbits) AS BIGINT) AS total_mbits
      FROM grams g JOIN costs c ON g.lang = c.lang AND g.g = c.g
      GROUP BY g.doc_id, g.lang
    )
    SELECT doc_id, lang, n_bigrams, total_mbits,
           CAST(total_mbits // n_bigrams AS BIGINT) AS avg_mbits
    FROM scored
    ORDER BY avg_mbits DESC, doc_id
    LIMIT 20
    """,
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language-model surprisal scoring — the CCNet-style
    "perplexity filter" reduced to a char LM trainable in one aggregate:
    train add-one-smoothed bigram models per language on the corpus
    itself, score every document by its average surprisal (milli-bits
    per bigram), and report the 20 most surprising documents — the
    reject list a model-based quality gate feeds to review.  Unlike the
    rule-based `text_quality`, the filter here is LEARNED from the
    corpus distribution (the distinction between C4's heuristics and
    CCNet's KenLM gate).

    Surprisal of bigram g in lang L is −log2 p(g) with
    p = (c_g + 1) / (tot_L + V_L) — every operand an exact integer, the
    quotient one exactly-rounded IEEE division, ONE log2 per model
    ENTRY (not per token), floored to integer milli-bits.  Documents
    shorter than 2 chars are filtered on both sides (sequence-step
    guard, same as `char_ngram_profile`).

    Scale notes: the model is (lang × observed-char-pair) rows — bounded
    by |alphabet|² per language, NOT corpus size — so the scoring join
    broadcasts the model to the token stream; training and scoring are
    each one partial+final aggregate over the same scan-side explode.
    Total: two passes over text, zero UDFs, zero windows on fact-sized
    frames, top-20 via TakeOrderedAndProject."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.length("text") >= 2)
        .select("doc_id", "lang", "text")
    )
    grams = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 1),
                lambda i: F.col("text").substr(i, F.lit(2)),
            )
        ).alias("g"),
    )
    model = grams.groupBy("lang", "g").agg(F.count("*").alias("c"))
    lang_tot = model.groupBy("lang").agg(
        F.sum("c").alias("tot"), F.count("*").alias("v")
    )
    costs = (
        model.join(lang_tot, "lang")
        .select(
            "lang",
            "g",
            F.floor(
                F.log2(
                    (F.col("tot") + F.col("v")).cast("double")
                    / (F.col("c") + 1)
                )
                * 1000
            )
            .cast("long")
            .alias("mbits"),
        )
    )
    scored = (
        grams.join(F.broadcast(costs), ["lang", "g"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("mbits").cast("long").alias("total_mbits"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "lang",
            "n_bigrams",
            "total_mbits",
            # `div` is Spark's EXACT integer division (DuckDB twin: `//`)
            # — floor(double-division) can misround for 40-bit totals.
            F.expr("total_mbits div n_bigrams").cast("long").alias("avg_mbits"),
        )
        .orderBy(F.col("avg_mbits").desc(), "doc_id")
        .limit(20)
    )


@register(
    "dedup_lsh_recall",
    # Truth = the declared same-bucket exact-Jaccard pair set (the only
    # oracle-checkable ground truth); the eval is itself deterministic
    # end to end because the LSH side is the md5-derived variant.
    oracle=f"""
    WITH {_JACCARD_PAIRS_SQL},
    mtok AS (
      SELECT doc_id,
             list_sort(list_distinct(
               list_transform(range(1, len(string_split(text, ' ')) - 1),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2]))) AS sh
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ), mex AS (
      SELECT doc_id, unnest(sh) AS s FROM mtok
    ), msig AS (
      SELECT doc_id,
             {", ".join(f"MIN(CAST(('0x' || substr(md5(s || '{p}'), 1, 15)) AS BIGINT)) AS h{p}" for p in range(_MD5_PERMS))}
      FROM mex GROUP BY doc_id
    ), mbanded AS (
      SELECT doc_id,
             {" || '_' || ".join(f"CAST(h{p} AS VARCHAR)" for p in range(_MD5_BAND_ROWS))} AS b0,
             {" || '_' || ".join(f"CAST(h{p} AS VARCHAR)" for p in range(_MD5_BAND_ROWS, _MD5_PERMS))} AS b1
      FROM msig
    ), mcand AS (
      SELECT x.doc_id AS a, y.doc_id AS b
      FROM mbanded x JOIN mbanded y ON x.b0 = y.b0 AND x.doc_id < y.doc_id
      UNION
      SELECT x.doc_id, y.doc_id
      FROM mbanded x JOIN mbanded y ON x.b1 = y.b1 AND x.doc_id < y.doc_id
    ), truth AS (
      SELECT id_a AS a, id_b AS b FROM pairs
    ), verified AS (
      SELECT c.a, c.b FROM mcand c
      JOIN mtok ta ON ta.doc_id = c.a
      JOIN mtok tb ON tb.doc_id = c.b
      WHERE 2 * len(list_intersect(ta.sh, tb.sh))
            >= len(ta.sh) + len(tb.sh) - len(list_intersect(ta.sh, tb.sh))
    ), counts AS (
      SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
             (SELECT COUNT(*) FROM mcand) AS n_candidates,
             (SELECT COUNT(*) FROM mcand c JOIN truth t
               ON c.a = t.a AND c.b = t.b) AS n_hits,
             (SELECT COUNT(*) FROM verified) AS n_verified
    )
    SELECT CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_verified AS BIGINT) AS n_verified,
           CAST(CASE WHEN n_truth = 0 THEN 1000
                ELSE (n_hits * 1000) // n_truth END AS BIGINT)
             AS recall_permille,
           CAST(CASE WHEN n_candidates = 0 THEN 1000
                ELSE (n_verified * 1000) // n_candidates END AS BIGINT)
             AS efficiency_permille
    FROM counts
    """,
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-pipeline EVALUATION: measure the md5-MinHash LSH candidate
    generator against the exact near-dup pair set — the
    measure-don't-guess step every production dedup rollout runs before
    trusting banded LSH at corpus scale.  Reports candidate RECALL vs
    the exact truth set (`dedup_ngram_jaccard`'s declared same-bucket
    Jaccard ≥ 0.5 pairs) and candidate EFFICIENCY (fraction of
    candidates that survive exact verification — the wasted-verify-work
    metric); 2 bands × 4 rows at J = 0.5 gives pair-catch probability
    1 − (1 − 0.5⁴)² ≈ 12% per band pattern, so the measured recall is
    the empirical check that banding parameters fit the corpus's
    similarity profile, not a theoretical hope.  Both pipelines are
    deterministic (md5 hashing, integer Jaccard), so the whole
    evaluation — counts AND ratios — is oracle-proven.

    Scale notes: the truth side reuses `ngram_jaccard_pairs`' prefix
    filter, the LSH side the band equi-join — no all-pairs path; the
    hit join is (candidate ∩ truth)-sized; the four counts ride as
    1-row broadcast frames (allowlisted BNL, cf. q22)."""
    d = load_table(spark, sf_dir, "documents")
    # staged: consumed twice (n_truth count + hit join) — without it the
    # whole prefix-filter pipeline re-runs per consumer.
    truth = stage(
        ngram_jaccard_pairs(d).select(
            F.col("id_a").alias("a"), F.col("id_b").alias("b")
        )
    )
    tok = d.select("doc_id", _shingles(F.col("text")).alias("sh")).where(
        F.size("sh") > 0
    )
    ex = tok.select("doc_id", F.explode("sh").alias("s"))
    sig = ex.groupBy("doc_id").agg(
        *[
            F.min(_md5_hash(F.col("s"), p)).alias(f"h{p}")
            for p in range(_MD5_PERMS)
        ]
    )
    b0 = F.concat_ws("_", *[F.col(f"h{p}") for p in range(_MD5_BAND_ROWS)])
    b1 = F.concat_ws(
        "_", *[F.col(f"h{p}") for p in range(_MD5_BAND_ROWS, _MD5_PERMS)]
    )
    banded = stage(sig.select("doc_id", b0.alias("b0"), b1.alias("b1")))
    x = banded.select(
        F.col("doc_id").alias("a"),
        F.col("b0").alias("xb0"),
        F.col("b1").alias("xb1"),
    )
    y = banded.select(
        F.col("doc_id").alias("b"),
        F.col("b0").alias("yb0"),
        F.col("b1").alias("yb1"),
    )
    cand = stage(
        x.join(y, (F.col("xb0") == F.col("yb0")) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .union(
            x.join(
                y, (F.col("xb1") == F.col("yb1")) & (F.col("a") < F.col("b"))
            ).select("a", "b")
        )
        .distinct()
    )
    ta = tok.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha"))
    tb = tok.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size("sha") + F.size("shb") - inter
    verified = cand.join(ta, "a").join(tb, "b").where(2 * inter >= union)
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_hits = cand.join(truth, ["a", "b"]).agg(F.count("*").alias("n_hits"))
    n_ver = verified.agg(F.count("*").alias("n_verified"))
    return (
        F.broadcast(n_truth)
        .join(F.broadcast(n_cand))
        .join(F.broadcast(n_hits))
        .join(F.broadcast(n_ver))
        .select(
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.col("n_verified").cast("long").alias("n_verified"),
            F.when(F.col("n_truth") == 0, F.lit(1000))
            .otherwise(F.expr("(n_hits * 1000) div n_truth"))
            .cast("long")
            .alias("recall_permille"),
            F.when(F.col("n_candidates") == 0, F.lit(1000))
            .otherwise(F.expr("(n_verified * 1000) div n_candidates"))
            .cast("long")
            .alias("efficiency_permille"),
        )
    )


@register(
    "text_langid_confusion",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, text FROM documents WHERE length(text) >= 3
    ), grams AS (
      SELECT doc_id, lang, unnest(list_transform(
               generate_series(1, length(text) - 2),
               i -> substr(text, i, 3))) AS g
      FROM d
    ), counts AS (
      SELECT lang AS plang, g, COUNT(*) AS n FROM grams GROUP BY 1, 2
    ), profile AS (
      SELECT plang, g FROM (
        SELECT plang, g,
               row_number() OVER (PARTITION BY plang
                                  ORDER BY n DESC, g) AS rn
        FROM counts
      ) WHERE rn <= 10
    ), hits AS (
      SELECT gr.doc_id, gr.lang, p.plang, CAST(COUNT(*) AS BIGINT) AS n
      FROM grams gr JOIN profile p ON gr.g = p.g
      GROUP BY 1, 2, 3
    ), pred AS (
      SELECT doc_id, lang, plang AS pred_lang FROM (
        SELECT doc_id, lang, plang,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY n DESC, plang) AS rn
        FROM hits
      ) WHERE rn = 1
    ), labelled AS (
      SELECT d.doc_id, d.lang,
             COALESCE(p.pred_lang, 'unknown') AS pred_lang
      FROM d LEFT JOIN pred p ON d.doc_id = p.doc_id
    )
    SELECT lang AS true_lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM labelled GROUP BY 1, 2
    ORDER BY true_lang, pred_lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass language identification + its honest evaluation in one
    op: train Cavnar–Trenkle-style per-language profiles (the top-10
    char trigrams `char_ngram_profile` computes) on the corpus, classify
    every document by which language's profile its trigrams hit most
    (ties → lexicographically first language; no hits → 'unknown'), and
    report the CONFUSION MATRIX against the labeled ``lang`` column —
    the eval-first discipline of `dedup_lsh_recall` applied to the
    model-based langid (the binary `text_langid` stays the cheap
    rule-based gate).

    All scoring is integer trigram-occurrence counting — no floats
    anywhere, so the learned profiles, the per-doc argmax and the
    matrix are engine-exact.

    Scale notes: profiles are (lang × 10) rows — broadcast to the
    trigram stream; the per-(doc, lang) hit count collapses in the
    first partial aggregate; the argmax window runs on the
    (docs × langs) hit frame, partitioned by doc; the matrix is
    |langs|²-sized.  Two passes over text (train + score), same as
    `text_lm_perplexity`."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.length("text") >= 3)
        .select("doc_id", "lang", "text")
    )
    grams = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 2),
                lambda i: F.col("text").substr(i, F.lit(3)),
            )
        ).alias("g"),
    )
    counts = grams.groupBy(
        F.col("lang").alias("plang"), "g"
    ).agg(F.count("*").alias("n"))
    wprof = Window.partitionBy("plang").orderBy(F.col("n").desc(), "g")
    profile = (
        counts.withColumn("rn", F.row_number().over(wprof))
        .where(F.col("rn") <= 10)
        .select("plang", "g")
    )
    hits = (
        grams.join(F.broadcast(profile), "g")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.count("*").alias("n"))
    )
    wpred = Window.partitionBy("doc_id").orderBy(F.col("n").desc(), "plang")
    pred = (
        hits.withColumn("rn", F.row_number().over(wpred))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("plang").alias("pred_lang"))
    )
    labelled = d.join(pred, "doc_id", "left").select(
        "lang", F.coalesce("pred_lang", F.lit("unknown")).alias("pred_lang")
    )
    return (
        labelled.groupBy(
            F.col("lang").alias("true_lang"), "pred_lang"
        )
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


_ADMIT_DUP_TEXT = (
    "the quick brown fox jumps over the lazy dog and then runs to the "
    "edge of the wide green field where a river bends to the north and "
    "the morning light settles in the tall grass near the old stone "
    "bridge that marks the end of the village road"
)
# Carries stopwords on purpose: with none, the language gate would claim
# these docs before the repetition gate ever saw them (observed — the
# 'repetitive' reason vanished from the funnel).
_ADMIT_SPAM_TEXT = ("the spam of ham " * 50).strip()


@register(
    "corpus_admission_pipeline",
    # Stage order IS the scale design: cheap scan-side gates first
    # (length, langid, repetition — zero shuffles), content-hash dedup
    # LAST so the only corpus-wide shuffle prices in just the survivors.
    # Fixture carries no duplicates and max natural repetition 0.07
    # (measured), so the damage injection below makes 'duplicate' and
    # 'repetitive' real, not vacuous.
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 17 = 0 THEN '{_ADMIT_DUP_TEXT}'
                  WHEN doc_id % 19 = 0 THEN '{_ADMIT_SPAM_TEXT}'
                  ELSE text END AS text
      FROM documents
    ), feat AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_tok,
             CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('the','a','of','and','to','in','is')))
                  AS DOUBLE) / len(string_split(text, ' ')) AS en_score,
             CASE WHEN len(string_split(text, ' ')) >= 3 THEN
               1.0 - CAST(len(list_distinct(list_transform(
                     range(1, len(string_split(text, ' ')) - 1),
                     i -> string_split(text, ' ')[i] || ' ' ||
                          string_split(text, ' ')[i+1] || ' ' ||
                          string_split(text, ' ')[i+2]))) AS DOUBLE)
                   / (len(string_split(text, ' ')) - 2)
             ELSE 0.0 END AS rep_frac
      FROM raw
    ), gated AS (
      SELECT doc_id, text,
             CASE WHEN n_chars < 200 THEN 'too_short'
                  WHEN en_score < 0.02 THEN 'lang_filtered'
                  WHEN rep_frac > 0.25 THEN 'repetitive'
             END AS early_reason
      FROM feat
    ), hashed AS (
      SELECT doc_id,
             sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS h
      FROM gated WHERE early_reason IS NULL
    ), keep AS (
      SELECT h, MIN(doc_id) AS keeper FROM hashed GROUP BY h
    ), final AS (
      SELECT g.doc_id,
             COALESCE(g.early_reason,
                      CASE WHEN hd.doc_id = k.keeper THEN 'admitted'
                           ELSE 'duplicate' END) AS reason
      FROM gated g
      LEFT JOIN hashed hd ON g.doc_id = hd.doc_id
      LEFT JOIN keep k ON hd.h = k.h
    )
    SELECT reason, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM final GROUP BY reason
    ORDER BY reason
    """,
)
def corpus_admission_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus ADMISSION gate — the composition the individual
    quality ops exist for, run as one pipeline with per-stage reject
    accounting: length gate → language gate (stopword-rate langid) →
    repetition gate (duplicate-shingle fraction) → content-hash dedup →
    admitted.  First failing stage claims the document (triage
    precedence), and the output is the funnel report every ingestion
    run ships to its dashboard.

    STAGE ORDER IS THE SCALE DESIGN: the three cheap gates are pure
    scan-side expressions (no shuffle, pushdown-friendly), and the only
    corpus-wide shuffle — dedup's hash groupBy — prices in just the
    survivors; running dedup first would shuffle the rejects too.

    The fixture is clean of duplicates and heavy repetition (measured:
    500/500 distinct hashes, max natural rep_frac 0.07), so docs
    ≡ 0 (mod 17) are rewritten to one shared template (exact-duplicate
    path: first doc_id admitted, rest rejected) and ≡ 0 (mod 19) to a
    50× repeated phrase (repetition path) — both paths proven, the
    damage deterministic on both engines.

    Scale notes: ONE scan computes every gate feature and the survivor
    content hash; rejects get a synthetic unique key so the whole frame
    flows through ONE hash shuffle whose map-side partial aggregate
    collapses each group to (n, reason) before the exchange — the
    shuffle carries distinct-hash-sized state, never documents.  Group
    accounting (admitted=1, duplicate=n−1 per survivor group) replaces
    the r5 join-back, which re-evaluated the shingle-gate scan THREE
    times (gated fed `hashed` twice through two joins, plus itself —
    the B-set bench surfaced it at 12.2 s; this form is one scan —
    plan-verified single occurrence of the shingle transform — and,
    with the conditional single-split spread below, measured ~1.0 s at
    sf0.1).  The funnel report is |reasons|-sized."""
    docs = load_table(spark, sf_dir, "documents")
    # The gate expressions are the dominant cost (token HOFs per doc)
    # and are embarrassingly parallel — but the fixture parquet is ONE
    # split, so without spreading, the entire gate scan ran in a single
    # task (B-set bench).  The repartition is CONDITIONAL on observed
    # scan parallelism: a production many-split scan skips it (a
    # corpus-wide text shuffle at 100 TB would be a real cost; here it
    # moves a few MB once).
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < max(2, par // 2):
        docs = docs.repartition(par, "doc_id")
    raw = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 17 == 0, F.lit(_ADMIT_DUP_TEXT))
        .when(F.col("doc_id") % 19 == 0, F.lit(_ADMIT_SPAM_TEXT))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    toks = F.split("text", " ")
    stop = F.array(
        *[F.lit(s) for s in ["the", "a", "of", "and", "to", "in", "is"]]
    )
    en_score = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast(
        "double"
    ) / F.size(toks)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        )
    )
    rep_frac = F.when(
        F.size(toks) >= 3,
        1.0 - F.size(shingles).cast("double") / (F.size(toks) - 2),
    ).otherwise(F.lit(0.0))
    gated = raw.select(
        "doc_id",
        "text",
        F.when(F.length("text") < 200, "too_short")
        .when(en_score < 0.02, "lang_filtered")
        .when(rep_frac > 0.25, "repetitive")
        .alias("early_reason"),
    )
    # One pass: survivors key on the content hash; rejects key on a
    # per-doc synthetic token (never a shared null/hot key) so every
    # group is either one survivor-hash class or one reject.
    keyed = gated.select(
        "doc_id",
        "early_reason",
        F.when(
            F.col("early_reason").isNull(),
            F.sha2(F.regexp_replace(F.lower("text"), r"\s+", " "), 256),
        )
        .otherwise(F.concat(F.lit("r:"), F.col("doc_id").cast("string")))
        .alias("h_eff"),
    )
    # Partial+final agg: each group collapses to (n, reason) map-side.
    # min(early_reason) is NULL exactly for survivor-hash groups (all
    # members passed the gates; reject keys are singletons).
    g = keyed.groupBy("h_eff").agg(
        F.count("*").alias("n"), F.min("early_reason").alias("er")
    )
    # Group-level funnel accounting — no join back to the corpus:
    # a reject group contributes (reason, n); a survivor-hash group
    # contributes one admitted (min doc_id) and n−1 duplicates.
    rc = g.select(
        F.explode(
            F.when(
                F.col("er").isNotNull(),
                F.array(
                    F.struct(
                        F.col("er").alias("reason"),
                        F.col("n").cast("long").alias("cnt"),
                    )
                ),
            ).otherwise(
                F.array(
                    F.struct(
                        F.lit("admitted").alias("reason"),
                        F.lit(1).cast("long").alias("cnt"),
                    ),
                    F.struct(
                        F.lit("duplicate").alias("reason"),
                        (F.col("n") - 1).cast("long").alias("cnt"),
                    ),
                )
            )
        ).alias("rc")
    ).where(F.col("rc.cnt") > 0)
    return (
        rc.groupBy(F.col("rc.reason").alias("reason"))
        .agg(F.sum("rc.cnt").cast("long").alias("n_docs"))
        .orderBy("reason")
    )


@register(
    "text_readability",
    # Flesch reading ease per doc from three regexp token counts
    # (words \S+, sentence enders [.!?]+, vowel-group syllable proxy);
    # the score is ONE rounded float expression over integer counts
    # (milli-points), banded by the standard cut points.
    oracle="""
    WITH words AS (
        SELECT doc_id, lang,
               GREATEST(1, len(regexp_extract_all(text, '\\S+')))
                   AS n_words,
               len(regexp_extract_all(text, '[.!?]+')) AS n_enders,
               GREATEST(1, len(regexp_extract_all(text, '[aeiouyAEIOUY]+')))
                   AS n_syllables
        FROM documents
    ), counts AS (
        SELECT doc_id, lang, n_words, n_syllables,
               GREATEST(n_enders, (n_words + 14) // 15, 1) AS n_sentences
        FROM words
    )
    SELECT doc_id, lang,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           CAST(ROUND(1000.0 * (206.835
                - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)))
                AS BIGINT) AS flesch_milli,
           CASE WHEN CAST(ROUND(1000.0 * (206.835
                     - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                     - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)))
                     AS BIGINT) >= 90000 THEN 'easy'
                WHEN CAST(ROUND(1000.0 * (206.835
                     - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                     - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)))
                     AS BIGINT) >= 60000 THEN 'standard'
                WHEN CAST(ROUND(1000.0 * (206.835
                     - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                     - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)))
                     AS BIGINT) >= 30000 THEN 'difficult'
                ELSE 'very-difficult' END AS band
    FROM counts
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease score per document — the classic readability
    gate a curation pipeline applies before admitting text to a
    training mix (too-hard and too-degenerate both signal non-prose).
    Words are ``\\S+`` runs, sentences are ``[.!?]+`` runs WITH a
    fixed 15-token segmentation fallback (integer ``(words+14) div
    15``) for terminator-free text — the fixture corpus carries no
    punctuation at all (audited), and a real pipeline meets the same
    case on ASR transcripts and OCR output — and syllables use the
    vowel-group proxy (``[aeiouy]+`` runs); all counts are
    floor-guarded to 1 so the ratios stay finite on degenerate docs.

    Exactness: the three counts are integers from identical regexes
    (patterns chosen inside the POSIX-compatible subset both regex
    engines treat identically); the score is ONE rounded float over
    integer ratios written with identical association on both engines
    (milli-points), and the band is integer comparison on the rounded
    score — no float ever crosses an aggregation or comparison
    boundary unrounded.

    Scale notes: pure scan-side row arithmetic (three regexp counts +
    one expression) in whole-stage codegen — no shuffle, no UDF; at
    100 TB this rides the same one-pass scan as `text_quality` and
    feeds the same admission funnel (`corpus_admission_pipeline`)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        "lang",
        F.greatest(
            F.lit(1), F.expr("size(regexp_extract_all(text, '\\\\S+', 0))")
        ).alias("n_words"),
        F.expr("size(regexp_extract_all(text, '[.!?]+', 0))").alias(
            "n_enders"
        ),
        F.greatest(
            F.lit(1),
            F.expr("size(regexp_extract_all(text, '[aeiouyAEIOUY]+', 0))"),
        ).alias("n_syllables"),
    )
    counts = words.select(
        "doc_id",
        "lang",
        "n_words",
        "n_syllables",
        F.greatest(
            F.col("n_enders"),
            F.expr("(n_words + 14) div 15"),
            F.lit(1),
        ).alias("n_sentences"),
    )
    flesch = F.expr(
        "CAST(ROUND(1000.0 * (206.835"
        " - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)"
        " - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)))"
        " AS BIGINT)"
    )
    return counts.select(
        "doc_id",
        "lang",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
        F.col("n_syllables").cast("long").alias("n_syllables"),
        flesch.alias("flesch_milli"),
        F.when(flesch >= 90000, "easy")
        .when(flesch >= 60000, "standard")
        .when(flesch >= 30000, "difficult")
        .otherwise("very-difficult")
        .alias("band"),
    )


#: RAKE stopword list (shared literal — both engines split candidate
#: phrases at these words and at any non-[a-z space] character).
_RAKE_STOPS = (
    "the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by|be|this|that"
    "|are|was|from|we|not|has|have|had"
)
_RAKE_TOPK = 20
#: Standard RAKE candidate cap: runs longer than 4 words are noise,
#: not collocations (without it the fixture's stopword-sparse docs
#: surface as single 70-word "phrases" — caught by the non-degeneracy
#: audit), and the cap also BOUNDS phrase cardinality at any corpus.
_RAKE_MAX_WORDS = 4


@register(
    "text_rake_keywords",
    # RAKE (Rapid Automatic Keyword Extraction): candidate phrases =
    # maximal stopword/punctuation-free word runs; word score =
    # degree/frequency in ppm (degree = Σ length of phrases containing
    # the word); phrase score = Σ word scores — all integer arithmetic
    # (ONE ppm division per word), top-20 by (score, occurrences,
    # phrase) total order.
    oracle=f"""
    WITH cleaned AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(lower(text), '[^a-z ]', '|', 'g'),
                   '\\b({_RAKE_STOPS})\\b', '|', 'g') AS seg
        FROM documents
    ), phrases AS (
        SELECT doc_id, phrase,
               LENGTH(phrase) - LENGTH(REPLACE(phrase, ' ', '')) + 1
                   AS n_words
        FROM (
            SELECT doc_id,
                   trim(regexp_replace(p, ' +', ' ', 'g')) AS phrase
            FROM cleaned, unnest(string_split(seg, '|')) AS t(p)
        )
        WHERE phrase <> ''
          AND LENGTH(phrase) - LENGTH(REPLACE(phrase, ' ', '')) + 1
              <= {_RAKE_MAX_WORDS}
    ), phrase_words AS (
        SELECT phrase, n_words, w AS word
        FROM phrases, unnest(string_split(phrase, ' ')) AS t(w)
    ), word_stats AS (
        SELECT word,
               COUNT(*) AS freq,
               SUM(n_words) AS degree
        FROM phrase_words GROUP BY 1
    ), phrase_scores AS (
        SELECT pw.phrase,
               MAX(pw.n_words) AS n_words,
               COUNT(*) // MAX(pw.n_words) AS n_occurrences,
               SUM(ws.degree * 1000000 // ws.freq)
                 // (COUNT(*) // MAX(pw.n_words)) AS score_ppm
        FROM phrase_words pw JOIN word_stats ws ON pw.word = ws.word
        GROUP BY 1
    )
    SELECT phrase,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_occurrences AS BIGINT) AS n_occurrences,
           CAST(score_ppm AS BIGINT) AS score_ppm
    FROM phrase_scores
    ORDER BY score_ppm DESC, n_occurrences DESC, phrase
    LIMIT {_RAKE_TOPK}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction over the corpus — the classic
    unsupervised keyphrase algorithm: candidate phrases are maximal
    runs of content words (split at stopwords and at any
    non-[a-z space] character), each word is scored degree/frequency
    (degree = total length of phrases it appears in — rewards words
    that co-occur in long collocations), and a phrase's score is the
    sum of its words' scores.  All arithmetic is integer ppm (one
    division per word, one per phrase); the top-20 is a (score,
    occurrences, phrase) total order, so the extraction is
    reproducible to the hash.

    Scale notes: phrase/word explosion is scan-side Generate work
    (rows ∝ corpus tokens, the `text_tokens` shape); word stats are
    ONE keyed hash agg over the word column; scoring joins the
    phrase-word frame to word stats on the word key (both sides
    word-keyed — co-partitioned by the join) and re-aggregates per
    phrase; the top-20 is sort+limit (TakeOrdered).  No window ever
    sees corpus-grain data."""
    d = load_table(spark, sf_dir, "documents")
    cleaned = d.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", "|"),
            f"\\b({_RAKE_STOPS})\\b",
            "|",
        ).alias("seg"),
    )
    phrases = (
        cleaned.select(
            "doc_id", F.explode(F.split(F.col("seg"), "\\|")).alias("p")
        )
        .select(
            "doc_id",
            F.trim(F.regexp_replace(F.col("p"), " +", " ")).alias("phrase"),
        )
        .select(
            "doc_id",
            "phrase",
            (
                F.length("phrase")
                - F.length(F.regexp_replace(F.col("phrase"), " ", ""))
                + 1
            ).alias("n_words"),
        )
        .where(
            (F.col("phrase") != "")
            & (F.col("n_words") <= _RAKE_MAX_WORDS)
        )
    )
    phrase_words = phrases.select(
        "phrase",
        "n_words",
        F.explode(F.split(F.col("phrase"), " ")).alias("word"),
    )
    word_stats = phrase_words.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("n_words").alias("degree"),
    )
    phrase_scores = (
        phrase_words.join(word_stats, "word")
        .groupBy("phrase")
        .agg(
            F.max("n_words").alias("n_words"),
            F.expr("count(1) div max(n_words)").alias("n_occurrences"),
            F.expr(
                "sum(degree * 1000000 div freq)"
                " div (count(1) div max(n_words))"
            ).alias("score_ppm"),
        )
    )
    return (
        phrase_scores.select(
            "phrase",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("score_ppm").cast("long").alias("score_ppm"),
        )
        .orderBy(F.desc("score_ppm"), F.desc("n_occurrences"), "phrase")
        .limit(_RAKE_TOPK)
    )


#: Zipf fit window: the global top-100 vocabulary (tf DESC, token
#: tie-break) — a vocabulary-bounded frame at any corpus size.
_ZIPF_TOPK = 100

#: ln fixed-point scale (micro-units): the OLS sufficient sums over the
#: 100 (ln rank, ln tf) points are exact integer arithmetic; a float
#: accumulation would be association-order-dependent across engines.
_ZIPF_SCALE = 1_000_000


@register(
    "text_zipf_fit",
    # Zipf's-law fit over the top-100 vocabulary: OLS of ln(tf) on
    # ln(rank) with both logs carried as micro-unit BIGINTs, so the
    # five sufficient sums are exact integers (HUGEINT) and the slope
    # (-s, the Zipf exponent), intercept, and R² are fixed IEEE trees
    # over identical integers — grouped_ols' discipline on log-log.
    oracle=f"""
    WITH tf AS (
        SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT UNNEST(string_split(text, ' ')) AS t FROM documents)
        WHERE t <> '' GROUP BY 1
    ), top AS (
        SELECT tf, ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS r
        FROM tf ORDER BY tf DESC, token LIMIT {_ZIPF_TOPK}
    ), pts AS (
        SELECT CAST(ROUND(ln(CAST(r AS DOUBLE)) * {_ZIPF_SCALE})
                    AS BIGINT) AS x,
               CAST(ROUND(ln(CAST(tf AS DOUBLE)) * {_ZIPF_SCALE})
                    AS BIGINT) AS y
        FROM top
    ), s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           ROUND(-(CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)), 6)
               AS zipf_exponent,
           ROUND(CAST(sxx * sy - sx * sxy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
                 / {_ZIPF_SCALE}.0, 6) AS intercept_ln,
           CAST(ROUND(1000000.0
                 * (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE))
                 * (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
               AS r2_ppm
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostic: fit ln(tf) = a − s·ln(rank) by OLS over
    the global top-100 vocabulary and report the exponent s, the
    intercept, and R² — the standard corpus-health readout (natural
    text sits near s ≈ 1; synthetic or boilerplate-heavy corpora
    deviate, making this a curation gate next to `corpus_heaps_curve`'s
    vocabulary-growth law).  Both logs are carried as micro-unit
    BIGINTs so the five OLS sums are EXACT integers (decimal(38,0) /
    HUGEINT) and every reported value is one fixed IEEE tree over
    identical integers on both engines — `agg_grouped_ols`' exactness
    discipline applied in log-log space.

    Scale notes: the token explode is scan-side and the tf aggregate
    is map-side-combined (wire volume vocabulary-sized, the
    `vocab_topk` posture); the top-100 cut is TakeOrdered under the
    (tf, token) total order; ranking + the OLS sums run on the 100-row
    frame (reviewed SINGLE rows)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), "t")
        .limit(_ZIPF_TOPK)
    )
    top = tf.select(
        "tf",
        F.row_number()
        .over(Window.orderBy(F.desc("tf"), "t"))
        .alias("r"),
    )
    pts = top.select(
        F.round(F.log(F.col("r").cast("double")) * _ZIPF_SCALE)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("tf").cast("double")) * _ZIPF_SCALE)
        .cast("long")
        .alias("y"),
    )
    d38 = "decimal(38,0)"
    s = pts.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("x").cast(d38)).cast(d38).alias("sx"),
        F.sum(F.col("y").cast(d38)).cast(d38).alias("sy"),
        F.sum((F.col("x").cast(d38) * F.col("y"))).cast(d38).alias("sxy"),
        F.sum((F.col("x").cast(d38) * F.col("x"))).cast(d38).alias("sxx"),
        F.sum((F.col("y").cast(d38) * F.col("y"))).cast(d38).alias("syy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    varx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vary = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    intn = (F.col("sxx") * F.col("sy") - F.col("sx") * F.col("sxy")).cast(
        "double"
    )
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(-(cov / varx), 6).alias("zipf_exponent"),
        F.round(intn / varx / float(_ZIPF_SCALE), 6).alias("intercept_ln"),
        F.round(F.lit(1000000.0) * (cov / varx) * (cov / vary))
        .cast("long")
        .alias("r2_ppm"),
    )


@register(
    "docs_ccnet_perplexity_buckets",
    # CCNet's head/middle/tail corpus split: score every doc with the
    # text_lm_perplexity char-bigram model (identical integer milli-bit
    # costs), then cut each language into surprisal terciles by exact
    # integer rank arithmetic — bucket = 3·(rank−1) // n_lang under the
    # (avg_mbits, doc_id) total order.  The readout is the per-(lang,
    # bucket) admission table a CCNet-style pipeline feeds downstream.
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, text FROM documents WHERE length(text) >= 2
    ), grams AS (
      SELECT doc_id, lang, unnest(list_transform(
               generate_series(1, length(text) - 1),
               i -> substr(text, i, 2))) AS g
      FROM d
    ), model AS (
      SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS c
      FROM grams GROUP BY lang, g
    ), lang_tot AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM model GROUP BY lang
    ), costs AS (
      SELECT m.lang, m.g,
             CAST(floor(log2(CAST(t.tot + t.v AS DOUBLE) / (m.c + 1))
                        * 1000) AS BIGINT) AS mbits
      FROM model m JOIN lang_tot t ON m.lang = t.lang
    ), scored AS (
      SELECT g.doc_id, g.lang,
             CAST(SUM(c.mbits) // COUNT(*) AS BIGINT) AS avg_mbits
      FROM grams g JOIN costs c ON g.lang = c.lang AND g.g = c.g
      GROUP BY g.doc_id, g.lang
    ), ranked AS (
      SELECT lang, avg_mbits,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY avg_mbits, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM scored
    )
    SELECT lang,
           CAST(3 * (r - 1) // n_lang AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(avg_mbits) AS BIGINT) AS min_mbits,
           CAST(MAX(avg_mbits) AS BIGINT) AS max_mbits,
           CAST(SUM(avg_mbits) // COUNT(*) AS BIGINT) AS mean_mbits
    FROM ranked
    GROUP BY 1, 2 ORDER BY lang, bucket
    """,
)
def docs_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus partition: score every document
    with the SAME char-bigram language model as `text_lm_perplexity`
    (identical integer milli-bit surprisals), then split each language
    into surprisal TERCILES — head = the most-fluent third that CCNet
    admits outright, tail = the third its KenLM gate rejects — using
    exact integer rank arithmetic (bucket = 3·(rank−1) // n_lang under
    the (avg_mbits, doc_id) total order, no NTILE float quantiles).
    The per-(lang, bucket) boundary/mass table is the admission
    manifest the downstream sampler consumes.

    Scale notes: model training and doc scoring are the
    `text_lm_perplexity` plan (two passes, model broadcast, zero
    UDFs); the tercile rank is ONE lang-partitioned window over the
    doc-grain score frame (the `orders_rfm_segments` NTILE posture —
    per-lang partitions parallelize; the giant-lang variant would
    range-partition rank the way `table_skew_stats`' two-pass path
    does); the output aggregate is ≤3·|langs| rows."""
    # Round-robin repartition of the narrow doc frame BEFORE the
    # ~|text|× gram fanout: the sf1 fixture is 2 parquet row groups, so
    # the explode otherwise scan-pipelines on 2 tasks (measured 19 s/
    # task in the r8 sweep — the agg_bootstrap_ci row-group lesson).
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.length("text") >= 2)
        .select("doc_id", "lang", "text")
        .repartition(nparts)
    )
    grams = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 1),
                lambda i: F.col("text").substr(i, F.lit(2)),
            )
        ).alias("g"),
    )
    model = grams.groupBy("lang", "g").agg(F.count("*").alias("c"))
    lang_tot = model.groupBy("lang").agg(
        F.sum("c").alias("tot"), F.count("*").alias("v")
    )
    costs = model.join(lang_tot, "lang").select(
        "lang",
        "g",
        F.floor(
            F.log2(
                (F.col("tot") + F.col("v")).cast("double") / (F.col("c") + 1)
            )
            * 1000
        )
        .cast("long")
        .alias("mbits"),
    )
    scored = (
        grams.join(F.broadcast(costs), ["lang", "g"])
        .groupBy("doc_id", "lang")
        .agg(F.expr("CAST(SUM(mbits) div COUNT(*) AS BIGINT)").alias("avg_mbits"))
    )
    w_rank = Window.partitionBy("lang").orderBy("avg_mbits", "doc_id")
    w_lang = Window.partitionBy("lang")
    ranked = scored.select(
        "lang",
        "avg_mbits",
        F.row_number().over(w_rank).alias("r"),
        F.count(F.lit(1)).over(w_lang).alias("n_lang"),
    )
    return (
        ranked.groupBy(
            "lang",
            F.expr("CAST(3 * (r - 1) div n_lang AS BIGINT)").alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("avg_mbits").cast("long").alias("min_mbits"),
            F.max("avg_mbits").cast("long").alias("max_mbits"),
            F.expr("CAST(SUM(avg_mbits) div COUNT(*) AS BIGINT)").alias(
                "mean_mbits"
            ),
        )
        .orderBy("lang", "bucket")
    )


_TEXTRANK_DAMP = 0.85
_TEXTRANK_ITERS = 5
_TEXTRANK_TOPK = 20


def _oracle_textrank() -> str:
    """Unrolled weighted-PageRank oracle over the word co-occurrence
    graph — the graph_pagerank codegen pattern (operators/graph.py)
    applied to TextRank: identical iteration count and arithmetic by
    construction."""
    steps = []
    prev = "r0"
    for i in range(1, _TEXTRANK_ITERS + 1):
        steps.append(
            f"""r{i} AS (
        SELECT en.dst AS w,
               (1 - {_TEXTRANK_DAMP}) / (SELECT cnt FROM nn) +
               {_TEXTRANK_DAMP} * SUM(en.wn * {prev}.r) AS r
        FROM en JOIN {prev} ON en.src = {prev}.w
        GROUP BY en.dst
    )"""
        )
        prev = f"r{i}"
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), pairs AS (
        SELECT ws[i] AS w1, ws[i + 1] AS w2
        FROM (SELECT ws, UNNEST(generate_series(1, len(ws) - 1)) AS i
              FROM toks)
        WHERE ws[i] <> '' AND ws[i + 1] <> '' AND ws[i] <> ws[i + 1]
    ), raw_edges AS (
        SELECT LEAST(w1, w2) AS wa, GREATEST(w1, w2) AS wb,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM pairs GROUP BY 1, 2
    ), edges AS (
        SELECT wa AS src, wb AS dst, w FROM raw_edges
        UNION ALL
        SELECT wb AS src, wa AS dst, w FROM raw_edges
    ), out_w AS (
        SELECT src, SUM(w) AS sw FROM edges GROUP BY src
    ), en AS (
        SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.sw AS wn
        FROM edges e JOIN out_w o ON e.src = o.src
    ), nn AS (
        SELECT CAST(COUNT(DISTINCT src) AS DOUBLE) AS cnt FROM edges
    ), r0 AS (
        SELECT src AS w, 1.0 / (SELECT cnt FROM nn) AS r
        FROM (SELECT DISTINCT src FROM edges)
    ), {", ".join(steps)}
    SELECT w AS word, ROUND(r{_TEXTRANK_ITERS}.r * 1000, 6)
               AS rank_permille
    FROM r{_TEXTRANK_ITERS}
    ORDER BY rank_permille DESC, word
    LIMIT {_TEXTRANK_TOPK}
    """


@register("text_textrank_keywords", oracle=_oracle_textrank())
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction — weighted PageRank over the word
    co-occurrence graph (adjacent-token edges, symmetrized, weight =
    co-occurrence count), the Mihalcea–Tarau method that ranks words
    by global graph centrality where RAKE (`text_rake_keywords`)
    scores by local degree/frequency: a word bridging many contexts
    outranks a word merely frequent in one.  Five damped iterations
    (d = 0.85) unrolled identically on both engines — the
    `graph_pagerank` fixed-iteration codegen oracle pattern applied
    to text — with the top-20 cut under the (rank, word) total order.

    Scale notes: the pair explode is scan-side; the edge aggregate is
    vocabulary²-BOUNDED (never corpus-sized — the graph is the model,
    not the data); each iteration is one co-partitioned join + one
    dst aggregate on that bounded frame.  At 100 TB the edge build is
    the only corpus pass; a production variant would floor edge
    weights to bound the vocabulary tail."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("ws"))
    pairs = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at("ws", i).alias("w1"),
                        F.element_at("ws", i + 1).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .where(
            (F.col("w1") != "")
            & (F.col("w2") != "")
            & (F.col("w1") != F.col("w2"))
        )
    )
    raw_edges = pairs.groupBy(
        F.least("w1", "w2").alias("wa"),
        F.greatest("w1", "w2").alias("wb"),
    ).agg(F.count(F.lit(1)).alias("w"))
    edges = raw_edges.select(
        F.col("wa").alias("src"), F.col("wb").alias("dst"), "w"
    ).unionByName(
        raw_edges.select(
            F.col("wb").alias("src"), F.col("wa").alias("dst"), "w"
        )
    )
    out_w = edges.groupBy("src").agg(F.sum("w").alias("sw"))
    en = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("w").cast("double") / F.col("sw")).alias("wn"))
    )
    nn = edges.select("src").distinct().count()
    r = edges.select("src").distinct().select(
        F.col("src").alias("w"), F.lit(1.0 / nn).alias("r")
    )
    for _ in range(_TEXTRANK_ITERS):
        r = (
            en.join(r, en.src == r.w)
            .groupBy(F.col("dst").alias("w2"))
            .agg(
                (
                    F.lit((1 - _TEXTRANK_DAMP) / nn)
                    + F.lit(_TEXTRANK_DAMP) * F.sum(F.col("wn") * F.col("r"))
                ).alias("r")
            )
            .select(F.col("w2").alias("w"), "r")
        )
    return (
        r.select(
            F.col("w").alias("word"),
            F.round(F.col("r") * 1000, 6).alias("rank_permille"),
        )
        .orderBy(F.desc("rank_permille"), "word")
        .limit(_TEXTRANK_TOPK)
    )


# --------------------------------------------------------------------------
# r9: the Gopher quality-rule battery (§2.38).
# --------------------------------------------------------------------------

#: Gopher (Rae et al. 2021, public) document-quality rules, adapted to
#: the fixture's lowercase space-separated text (no newlines — the
#: bullet/ellipsis line rules are structurally inapplicable and
#: documented as such).  Word-count bounds use the paper's lower gate
#: scaled to the fixture's 10..99-word span so the rule actually
#: discriminates (the paper's 50..100k bounds would fail ~46% / 0%).
_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MIN_WORDLEN_MICRO = 3_000_000   # mean word length >= 3 chars
_GOPHER_MAX_WORDLEN_MICRO = 10_000_000  # mean word length <= 10 chars
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_MIN_STOPWORDS = 2


@register(
    "text_gopher_rules",
    # Per-rule failure rates (ppm) + the all-rules admission rate, per
    # source: every rule is a pure string expression evaluated
    # scan-side; mean word length carried in exact micro-chars-per-word
    # (chars*1e6 // words) so the bound comparison is integer on both
    # engines.
    oracle=f"""
    WITH flags AS (
        SELECT source,
               (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS words,
               LENGTH(REPLACE(text, ' ', '')) AS letters,
               ({" + ".join(
                   f"CASE WHEN ' ' || text || ' ' LIKE '% {w} %' THEN 1 ELSE 0 END"
                   for w in _GOPHER_STOPWORDS
               )}) AS n_stop
        FROM documents
    ), rated AS (
        SELECT source,
               CASE WHEN words < {_GOPHER_MIN_WORDS}
                      OR words > {_GOPHER_MAX_WORDS} THEN 1 ELSE 0 END
                   AS fail_words,
               CASE WHEN letters * 1000000 // words
                        < {_GOPHER_MIN_WORDLEN_MICRO}
                      OR letters * 1000000 // words
                        > {_GOPHER_MAX_WORDLEN_MICRO} THEN 1 ELSE 0 END
                   AS fail_wordlen,
               CASE WHEN n_stop < {_GOPHER_MIN_STOPWORDS} THEN 1 ELSE 0 END
                   AS fail_stopwords
        FROM flags
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(fail_words) * 1000000 // COUNT(*) AS BIGINT)
               AS fail_words_ppm,
           CAST(SUM(fail_wordlen) * 1000000 // COUNT(*) AS BIGINT)
               AS fail_wordlen_ppm,
           CAST(SUM(fail_stopwords) * 1000000 // COUNT(*) AS BIGINT)
               AS fail_stopwords_ppm,
           CAST(SUM(CASE WHEN fail_words = 0 AND fail_wordlen = 0
                          AND fail_stopwords = 0 THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS admit_ppm
    FROM rated
    GROUP BY source
    ORDER BY source
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher document-quality rule battery (Rae et al. 2021,
    public) as a per-source admission report: word-count bounds, mean
    word-length bounds [3, 10], and the minimum-stopword rule (≥ 2 of
    the paper's 8 function words present) — per-rule failure rates in
    ppm plus the all-rules admission rate.  Complements `text_quality`
    (a continuous score) with the NAMED pass/fail battery production
    corpus filters actually deploy.  Fixture behavior is audited, not
    assumed: the word-count rule genuinely splits the corpus (~46%
    fail at 50 words), the word-length rule passes essentially all
    docs (fixture mean 5.5 ± 0.2 — a correct no-op, reported so the
    dashboard shows WHICH rules bite), and the stopword rule fails
    ~100% because the 31-word tech vocabulary carries only 'the' —
    exactly what Gopher's rule is designed to catch in
    non-natural-language text.  Newline-dependent rules
    (bullet/ellipsis line ratios) are structurally inapplicable (the
    fixture has no newlines) and intentionally absent.

    Scale notes: every rule is a scan-side string expression (LIKE +
    LENGTH arithmetic, no UDF, no explode); ONE hash aggregate to the
    8-source rollup; ratios are exact integer ppm.  Mean word length
    compares in exact micro-chars-per-word (chars·10⁶ div words), so
    no float crosses the rule boundary."""
    d = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    n_stop = None
    for w in _GOPHER_STOPWORDS:
        term = F.when(padded.like(f"% {w} %"), 1).otherwise(0)
        n_stop = term if n_stop is None else n_stop + term
    words = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    )
    letters = F.length(F.regexp_replace("text", " ", ""))
    flags = d.select(
        "source",
        words.alias("words"),
        letters.alias("letters"),
        n_stop.alias("n_stop"),
    )
    rated = flags.select(
        "source",
        F.when(
            (F.col("words") < _GOPHER_MIN_WORDS)
            | (F.col("words") > _GOPHER_MAX_WORDS),
            1,
        )
        .otherwise(0)
        .alias("fail_words"),
        F.when(
            (F.expr("letters * 1000000 div words") < _GOPHER_MIN_WORDLEN_MICRO)
            | (F.expr("letters * 1000000 div words") > _GOPHER_MAX_WORDLEN_MICRO),
            1,
        )
        .otherwise(0)
        .alias("fail_wordlen"),
        F.when(F.col("n_stop") < _GOPHER_MIN_STOPWORDS, 1)
        .otherwise(0)
        .alias("fail_stopwords"),
    )
    return (
        rated.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("fail_words").alias("fw"),
            F.sum("fail_wordlen").alias("fl"),
            F.sum("fail_stopwords").alias("fs"),
            F.sum(
                F.when(
                    (F.col("fail_words") == 0)
                    & (F.col("fail_wordlen") == 0)
                    & (F.col("fail_stopwords") == 0),
                    1,
                ).otherwise(0)
            ).alias("adm"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.expr("fw * 1000000 div n_docs").cast("long").alias("fail_words_ppm"),
            F.expr("fl * 1000000 div n_docs")
            .cast("long")
            .alias("fail_wordlen_ppm"),
            F.expr("fs * 1000000 div n_docs")
            .cast("long")
            .alias("fail_stopwords_ppm"),
            F.expr("adm * 1000000 div n_docs").cast("long").alias("admit_ppm"),
        )
        .orderBy("source")
    )


@register(
    "text_bm25_topk",
    # BM25 (k1=1.2, b=0.75) for the 5 highest-DF vocabulary terms.
    # Rank key (ADVICE r10): within a term idf is a POSITIVE CONSTANT,
    # so the per-term ordering depends only on the length-normalized tf
    # gain g = 2.2·tf / (tf + 0.3 + 0.9·dl·N/Σdl) — multiplied through
    # by 10·Σdl it is the ratio of two EXACT integers,
    # 22·tf·Σdl / (10·tf·Σdl + 3·Σdl + 9·dl·N), and ONE IEEE division
    # of exact integers is correctly rounded, hence BIT-IDENTICAL
    # across engines (unlike ln, whose last ulp is libm-specific and
    # was flipping the old e4-floored rank/display key at a boundary).
    # The display score keeps idf — ln((2N+2)/(2df+1)), an exact-
    # integer-argument form — but is ROUND-terminal (ROUND(.,4)), which
    # absorbs the 1-ulp ln drift instead of flooring it into the key.
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_dl
      FROM dl
    ), df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), topterms AS (
      SELECT term, df
      FROM (SELECT term, df,
                   row_number() OVER (ORDER BY df DESC, term) AS rn
            FROM df)
      WHERE rn <= 5
    ), scored AS (
      SELECT t.term, f.doc_id, f.tf, d.dl,
             CAST(22 * f.tf * n.total_dl AS DOUBLE)
               / CAST(10 * f.tf * n.total_dl + 3 * n.total_dl
                      + 9 * d.dl * n.n_docs AS DOUBLE) AS g_exact,
             ROUND(
               ln(CAST(2 * n.n_docs + 2 AS DOUBLE)
                  / CAST(2 * t.df + 1 AS DOUBLE))
               * (CAST(22 * f.tf * n.total_dl AS DOUBLE)
                  / CAST(10 * f.tf * n.total_dl + 3 * n.total_dl
                         + 9 * d.dl * n.n_docs AS DOUBLE)), 4) AS score_r4
      FROM topterms t
      JOIN tf f ON f.term = t.term
      JOIN dl d ON d.doc_id = f.doc_id
      CROSS JOIN n
    )
    SELECT term, CAST(doc_id AS BIGINT) AS doc_id,
           CAST(tf AS BIGINT) AS tf, CAST(dl AS BIGINT) AS dl, score_r4
    FROM (SELECT *, row_number() OVER (PARTITION BY term
                                       ORDER BY g_exact DESC, doc_id)
                      AS rn
          FROM scored)
    WHERE rn <= 5
    ORDER BY term, g_exact DESC, doc_id
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (Robertson–Spärck Jones, public; k1=1.2,
    b=0.75) — `text_tfidf`'s production sibling with tf saturation and
    document-length normalization: for each of the 5 highest-DF
    vocabulary terms (the fixture's stand-in for a query workload), the
    top-5 documents by BM25.  Length normalization genuinely reorders
    vs raw tf — short docs win ties — which the pytest pins.

    Scale notes: ONE token explode feeds tf (doc,term), dl (doc) and df
    (term) aggregates; the corpus constants ride a broadcast 1-row
    frame; scoring joins tf against the 5-row term dim (vocab-sized ×
    5, never corpus × vocab) and the dl dim on doc_id; top-5 is a
    per-term window.  Ranking is engine-independent by construction
    (ADVICE r10): idf is constant within a term, so the rank key is the
    idf-free gain as ONE correctly-rounded IEEE division of exact
    integers (22·tf·Σdl / (10·tf·Σdl + 3·Σdl + 9·dl·N)) — bit-identical
    cross-engine, no libm in the key; the displayed BM25 score is
    ROUND-terminal so ln's last-ulp drift is absorbed, never floored
    into the emitted value.  (Integer terms stay < 2^53 up to ~10¹²
    total tokens per corpus shard; beyond that, carry them in
    DECIMAL(38,0) before the terminal division.)"""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    w_df = Window.orderBy(F.col("df").desc(), "term")
    topterms = (
        df_.withColumn("rn", F.row_number().over(w_df))
        .where(F.col("rn") <= 5)
        .select("term", "df")
    )
    g_exact = (22 * F.col("tf") * F.col("total_dl")).cast("double") / (
        10 * F.col("tf") * F.col("total_dl")
        + 3 * F.col("total_dl")
        + 9 * F.col("dl") * F.col("n_docs")
    ).cast("double")
    idf = F.log(
        (2 * F.col("n_docs") + 2).cast("double")
        / (2 * F.col("df") + 1).cast("double")
    )
    scored = (
        tf.join(F.broadcast(topterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            "doc_id",
            "tf",
            "dl",
            g_exact.alias("g_exact"),
            F.round(idf * g_exact, 4).alias("score_r4"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.col("g_exact").desc(), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select(
            "term",
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("tf").cast("long").alias("tf"),
            F.col("dl").cast("long").alias("dl"),
            "score_r4",
        )
        .orderBy("term", F.col("score_r4").desc(), "doc_id")
    )


def _word_gram_tables(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Staged (grams, sizes) word-grain tables for the corpus-F pair ops
    (docs_rouge_n / docs_bleu) — the docs_chrf r15 staging recipe at
    word grain.  ONE corpus pass: a single explode emits unigrams and
    bigrams together as (ng, g) structs (the prior shape ran two
    explode branches whose union was inlined into every consumer — the
    static plans carried 16 documents scans), hash-spread by doc_id
    before the explode (the single-split fixture trap, shingle_sets
    note; deterministic key, not round-robin — guide on rand-derived
    repartitions under retry).  Per-order sizes need NO aggregation
    over the gram table: Σc over an order's grams = the instance count
    = n − ng + 1, a pure function of the per-doc token count.  Both
    tables are staged — grams feeds both roles of the pairing, sizes
    feeds sr/sc.
    """
    par = d.sparkSession.sparkContext.defaultParallelism
    t = F.split("text", " ")
    toks = d.repartition(par, F.col("doc_id")).select(
        "doc_id", t.alias("t"), F.size(t).alias("n")
    )
    all_grams = F.expr(
        "flatten(transform(array(1, 2), ng -> CASE"
        " WHEN ng = 1 THEN transform(t, tok -> struct(ng AS ng, tok AS g))"
        " WHEN n >= 2 THEN transform(sequence(1, n - 1),"
        " i -> struct(ng AS ng, concat_ws(' ', element_at(t, i),"
        " element_at(t, i + 1)) AS g))"
        " ELSE CAST(array() AS array<struct<ng:int,g:string>>) END))"
    )
    # grams stays LAZY: its only consumer is _pair_clipped_overlap,
    # whose inline-role explode reads it exactly once — the whole
    # grams→pairs chain is one pipeline, no checkpoint (r15).
    grams = (
        toks.select("doc_id", F.explode(all_grams).alias("x"))
        .select(F.col("x.ng").alias("ng"), "doc_id", F.col("x.g").alias("g"))
        .groupBy("ng", "doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sizes = stage(
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "filter(transform(array(1, 2),"
                    " ng -> struct(ng AS ng, CAST(n - ng + 1 AS BIGINT) AS sz)),"
                    " p -> p.sz >= 1)"
                )
            ).alias("p"),
        ).select(F.col("p.ng").alias("ng"), "doc_id", F.col("p.sz").alias("sz"))
    )
    return grams, sizes


def _pair_clipped_overlap(grams: DataFrame) -> DataFrame:
    """Clipped n-gram overlap Σ min(c_ref, c_cand) of each (doc, doc+1)
    pair from a unique-keyed (ng, doc_id, g, c) gram-count table —
    the corpus-F pairing shared by docs_rouge_n / docs_bleu / docs_chrf.

    No self-join and no duplicated input subtree (r15): each gram row
    explodes into its TWO roles in one pass — ref keyed by doc_id,
    candidate keyed by doc_id−1 — and the roles are paired by ONE
    groupBy.  The join form shuffled the gram table through two
    exchanges and, at corpus scale where neither side broadcasts,
    sorted both for a sort-merge join; a two-branch union form still
    instantiated the gram subtree twice (forcing its producers to
    checkpoint).  The inline-role explode consumes the gram table
    EXACTLY ONCE, so callers need no staging at all: the whole
    grams→pairs chain is one pipeline — one exchange of 2×rows into a
    hash aggregate, no sort, no broadcast-dependence, no checkpoint.
    (ng, doc_id, g) is unique, so min() recovers each role's count
    exactly; rows where only one role appears are non-pairs (the
    former inner join) and drop.  Measured vs the staged-union form at
    sf0.1: [2.30, 1.92, 1.76, 1.67] → [1.54, 1.48, 1.44, 1.36] s noop,
    equal 14,995 chrf pair rows.
    """
    u = (
        grams.select(
            "ng",
            "g",
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_id").alias("ref_id"),
                        F.col("c").alias("c_ref"),
                        F.lit(None).cast("long").alias("c_cand"),
                    ),
                    F.struct(
                        (F.col("doc_id") - 1).alias("ref_id"),
                        F.lit(None).cast("long").alias("c_ref"),
                        F.col("c").alias("c_cand"),
                    ),
                )
            ).alias("r"),
        )
        .select(
            "ng",
            F.col("r.ref_id").alias("ref_id"),
            "g",
            F.col("r.c_ref").alias("c_ref"),
            F.col("r.c_cand").alias("c_cand"),
        )
    )
    return (
        u.groupBy("ng", "ref_id", "g")
        .agg(F.min("c_ref").alias("cr"), F.min("c_cand").alias("cc"))
        .where(F.col("cr").isNotNull() & F.col("cc").isNotNull())
        .groupBy("ng", "ref_id")
        .agg(F.sum(F.least("cr", "cc")).alias("ov"))
    )



@register(
    "docs_rouge_n",
    # ROUGE-1/2 between each document and its doc_id successor (the
    # deterministic pair rule docs_bradley_terry uses): clipped-count
    # n-gram overlap; recall/precision/F1 are EXACT integer ppm —
    # F1 = 2PR/(P+R) collapses to 2·ov·1e6 // (r+c), no float ever.
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), uni AS (
      SELECT doc_id, unnest(t) AS g FROM toks
    ), bi AS (
      SELECT doc_id,
             unnest(list_transform(range(1, n), i -> t[i] || ' ' || t[i+1]))
               AS g
      FROM toks WHERE n >= 2
    ), grams AS (
      SELECT 1 AS ng, doc_id, g, COUNT(*) AS c FROM uni GROUP BY 2, 3
      UNION ALL
      SELECT 2 AS ng, doc_id, g, COUNT(*) AS c FROM bi GROUP BY 2, 3
    ), sizes AS (
      SELECT ng, doc_id, SUM(c) AS sz FROM grams GROUP BY 1, 2
    ), pairs AS (
      SELECT r.ng, r.doc_id AS ref_id,
             SUM(LEAST(r.c, cnd.c)) AS ov
      FROM grams r JOIN grams cnd
        ON cnd.ng = r.ng AND cnd.doc_id = r.doc_id + 1 AND cnd.g = r.g
      GROUP BY 1, 2
    ), scored AS (
      SELECT sr.ng, sr.doc_id AS ref_id,
             COALESCE(p.ov, 0) AS ov, sr.sz AS ref_n, sc.sz AS cand_n
      FROM sizes sr
      JOIN sizes sc ON sc.ng = sr.ng AND sc.doc_id = sr.doc_id + 1
      LEFT JOIN pairs p ON p.ng = sr.ng AND p.ref_id = sr.doc_id
    )
    SELECT CAST(ng AS BIGINT) AS n_gram,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(ov * 1000000 // ref_n) // COUNT(*) AS BIGINT)
             AS mean_recall_ppm,
           CAST(SUM(ov * 1000000 // cand_n) // COUNT(*) AS BIGINT)
             AS mean_precision_ppm,
           CAST(SUM(2 * ov * 1000000 // (ref_n + cand_n)) // COUNT(*)
                AS BIGINT) AS mean_f1_ppm,
           CAST(SUM(CASE WHEN ov = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_overlap_pairs
    FROM scored
    GROUP BY ng
    ORDER BY n_gram
    """,
)
def docs_rouge_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-N overlap scoring (Lin 2004, public) — the summarization /
    generation eval staple: clipped-count n-gram recall, precision and
    F1 between each document and its doc_id successor (the same
    deterministic pairing `docs_bradley_terry` uses — in production the
    pairs are (reference, candidate) from an eval set).  Reported as
    the corpus rollup per n ∈ {1, 2} with the zero-overlap pair count
    (the degenerate-generation detector).

    Exactness: clipped overlap Σ min(c_ref, c_cand) is an integer;
    recall/precision are integer ppm divisions; F1 = 2PR/(P+R)
    COLLAPSES algebraically to 2·ov·1e6 // (ref_n + cand_n) — no float
    exists anywhere in the operator, so the oracle matches bit-for-bit
    by construction.

    Scale notes: ONE token/bigram explode feeds per-doc gram counts
    (doc-keyed aggs); the pair overlap is an equi-join on (n, doc_id+1,
    gram) — candidate volume is bounded by the SHARED-gram mass of
    adjacent pairs, never all-pairs — and the LEFT join from the sizes
    frame keeps zero-overlap pairs in the rollup (dropping them is the
    classic ROUGE-pipeline bug: it inflates every mean exactly when
    generation is worst)."""
    d = load_table(spark, sf_dir, "documents")
    # Pre-fanout repartition lives inside _word_gram_tables (the
    # standing text-scan rule: the fixture parquet holds 2-6 row
    # groups, so the explode pipeline otherwise runs on single-digit
    # tasks — measured a 4-task 6.3 s-max stage at sf1, real skew
    # 2.4×; now a deterministic doc_id hash spread).
    grams, sizes = _word_gram_tables(d)
    pairs = _pair_clipped_overlap(grams)
    sr = sizes.select("ng", F.col("doc_id").alias("ref_id"), F.col("sz").alias("ref_n"))
    sc = sizes.select(
        "ng", (F.col("doc_id") - 1).alias("ref_id"), F.col("sz").alias("cand_n")
    )
    scored = (
        sr.join(sc, ["ng", "ref_id"])
        .join(pairs, ["ng", "ref_id"], "left")
        .select(
            "ng",
            "ref_id",
            F.coalesce("ov", F.lit(0)).alias("ov"),
            "ref_n",
            "cand_n",
        )
    )
    return (
        scored.groupBy("ng")
        .agg(
            F.count(F.lit(1)).alias("n_pairs_raw"),
            F.sum(F.expr("ov * 1000000 div ref_n")).alias("rec_sum"),
            F.sum(F.expr("ov * 1000000 div cand_n")).alias("prec_sum"),
            F.sum(F.expr("2 * ov * 1000000 div (ref_n + cand_n)")).alias(
                "f1_sum"
            ),
            F.sum(F.when(F.col("ov") == 0, 1).otherwise(0))
            .cast("long")
            .alias("zero_overlap_pairs"),
        )
        .select(
            F.col("ng").cast("long").alias("n_gram"),
            F.col("n_pairs_raw").cast("long").alias("n_pairs"),
            F.expr("rec_sum div n_pairs_raw").cast("long").alias(
                "mean_recall_ppm"
            ),
            F.expr("prec_sum div n_pairs_raw").cast("long").alias(
                "mean_precision_ppm"
            ),
            F.expr("f1_sum div n_pairs_raw").cast("long").alias("mean_f1_ppm"),
            "zero_overlap_pairs",
        )
        .orderBy("n_gram")
    )


@register(
    "docs_instruction_format_check",
    # SFT-format QA over a deterministically injected chat template:
    # doc_id%3==0 wraps the text correctly, %3==1 injects a BROKEN
    # wrapper (missing assistant tag), %3==2 stays plain.  Checks are
    # string/regexp counts — exact integers on both engines.
    oracle="""
    WITH staged AS (
        SELECT doc_id, source,
               CASE doc_id % 3
                   WHEN 0 THEN '<|user|> ' || text || ' <|assistant|> '
                               || reverse(text)
                   WHEN 1 THEN '<|user|> ' || text
                   ELSE text
               END AS raw
        FROM documents
    ), checked AS (
        SELECT doc_id, source,
               CAST(length(raw) - length(replace(raw, '<|user|>', ''))
                    AS BIGINT) / 8 AS n_user,
               CAST(length(raw) - length(replace(raw, '<|assistant|>', ''))
                    AS BIGINT) / 13 AS n_asst
        FROM staged
    ), labeled AS (
        SELECT doc_id, source,
               CASE WHEN n_user = 0 AND n_asst = 0 THEN 'plain'
                    WHEN n_user = n_asst AND n_user > 0 THEN 'well_formed'
                    ELSE 'malformed' END AS status
        FROM checked
    )
    SELECT source, status,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) * 1000000
                // SUM(COUNT(*)) OVER (PARTITION BY source) AS BIGINT)
             AS share_ppm
    FROM labeled
    GROUP BY source, status
    ORDER BY source, status
    """,
)
def docs_instruction_format_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction/chat-template format QA — the validation pass an SFT
    data pipeline runs before training: count role-tag occurrences and
    classify each document as plain (no template), well_formed
    (balanced user/assistant turns) or malformed (unbalanced tags — the
    truncated-sample failure that silently teaches a model to stop
    mid-turn).  Fixture text carries no markup, so both sides STAGE a
    deterministic template first (the `text_normalize` mangle rule):
    one third wrapped correctly, one third wrapped with the assistant
    tag missing, one third left plain — the classifier must recover
    exactly that partition, which the pytest pins per doc_id residue.

    Tag counting is the length-difference idiom (len(s) −
    len(replace(s, tag, ''))) / len(tag) — pure integer string math,
    no regex dialect surface at all.

    Scale notes: scan-side string expressions (codegen'd, zero
    shuffle) into ONE (source, status) rollup; the share window runs
    per source on that ≤|sources|×3-row frame (reviewed SINGLE)."""
    d = load_table(spark, sf_dir, "documents")
    raw = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("<|user|> "),
                F.col("text"),
                F.lit(" <|assistant|> "),
                F.reverse(F.col("text")),
            ),
        )
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("<|user|> "), F.col("text")))
        .otherwise(F.col("text"))
    )
    staged = d.select("doc_id", "source", raw.alias("raw"))
    n_user = (
        (F.length("raw") - F.length(F.replace(F.col("raw"), F.lit("<|user|>"), F.lit(""))))
        / 8
    ).cast("long")
    n_asst = (
        (
            F.length("raw")
            - F.length(F.replace(F.col("raw"), F.lit("<|assistant|>"), F.lit("")))
        )
        / 13
    ).cast("long")
    labeled = staged.select(
        "source",
        F.when((n_user == 0) & (n_asst == 0), "plain")
        .when((n_user == n_asst) & (n_user > 0), "well_formed")
        .otherwise("malformed")
        .alias("status"),
    )
    w_src = Window.partitionBy("source")
    return (
        labeled.groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs_raw"))
        .select(
            "source",
            "status",
            F.col("n_docs_raw").cast("long").alias("n_docs"),
            F.expr(
                "n_docs_raw * 1000000"
                " div SUM(n_docs_raw) OVER (PARTITION BY source)"
            )
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy("source", "status")
    )


@register(
    "text_script_profile",
    # Script/charset mix screen (r13 — the text family's missing
    # corpus-intake check [N]): per language, the character-class
    # composition of the text column — latin letters, digits,
    # whitespace, non-ASCII, other — as exact integer ppm, plus the
    # per-lang count of docs containing ANY non-ASCII byte and of
    # digit-heavy docs (5·digits > chars).  A corpus tagged lang=en
    # whose nonascii_ppm or digit share spikes is mis-tagged, OCR
    # noise, or markup — the screen a pipeline runs BEFORE langid
    # believes the label.  Counts are length-diff regexp (one scan,
    # no explode); every output is an integer or an integer ppm
    # division, zero-doc langs guarded on both engines.
    oracle="""
    WITH per AS (
      SELECT lang,
             length(text) AS n_c,
             length(text)
               - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_lat,
             length(text)
               - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_dig,
             length(text)
               - length(regexp_replace(text, '[ \\t\\n\\r]', '', 'g'))
               AS n_sp,
             length(text)
               - length(regexp_replace(text, '[^\\x00-\\x7f]', '', 'g'))
               AS n_na
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CASE WHEN SUM(n_c) > 0
                THEN SUM(n_lat) * 1000000 // SUM(n_c) END AS BIGINT)
             AS latin_ppm,
           CAST(CASE WHEN SUM(n_c) > 0
                THEN SUM(n_dig) * 1000000 // SUM(n_c) END AS BIGINT)
             AS digit_ppm,
           CAST(CASE WHEN SUM(n_c) > 0
                THEN SUM(n_sp) * 1000000 // SUM(n_c) END AS BIGINT)
             AS space_ppm,
           CAST(CASE WHEN SUM(n_c) > 0
                THEN SUM(n_na) * 1000000 // SUM(n_c) END AS BIGINT)
             AS nonascii_ppm,
           CAST(CASE WHEN SUM(n_c) > 0
                THEN (SUM(n_c) - SUM(n_lat) - SUM(n_dig) - SUM(n_sp)
                      - SUM(n_na)) * 1000000 // SUM(n_c) END AS BIGINT)
             AS other_ppm,
           CAST(SUM(CASE WHEN n_na > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_nonascii,
           CAST(SUM(CASE WHEN 5 * n_dig > n_c THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_digit_heavy,
           CAST(MAX(CASE WHEN n_c > 0
                THEN n_na * 1000000 // n_c ELSE 0 END) AS BIGINT)
             AS max_doc_nonascii_ppm
    FROM per GROUP BY lang ORDER BY lang
    """,
)
def text_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script/charset composition profile per language — the corpus
    intake screen the text family lacked: BEFORE trusting a lang
    label (or feeding `text_langid`), check what the bytes actually
    are.  Per lang: exact ppm of latin letters / digits / whitespace /
    non-ASCII / other characters, the count of docs containing ANY
    non-ASCII character, the count of digit-heavy docs (5·digits >
    chars — tables and logs masquerading as prose), and the worst
    per-doc non-ASCII ppm (one mojibake doc hides inside a clean
    corpus mean; the max finds it).

    Exactness: class counts are length-minus-replaced-length integers
    (the `dedup_exact` normalization idiom); 'other' derives by exact
    subtraction so the five classes partition n_chars; ppm values are
    single integer divisions; zero-char langs yield NULL ppm on both
    engines (guarded — DuckDB's // raises on 0).  The whitespace
    class is the EXPLICIT [ \\t\\n\\r] set, not \\s (Java includes
    \\x0B where RE2 does not — an engine-divergence trap).

    Scale notes: ONE projection scan computes all five counts per doc
    (regexp on the already-read text column, no explode, no shuffle of
    text), then ONE map-combined agg to the ≤|langs|-row rollup —
    the minimal-movement shape; at 100 TB the text column never
    crosses the wire."""
    d = load_table(spark, sf_dir, "documents")

    def cls(pat: str) -> Column:
        return F.length("text") - F.length(
            F.regexp_replace(F.col("text"), pat, "")
        )

    per = d.select(
        "lang",
        F.length("text").alias("n_c"),
        cls("[A-Za-z]").alias("n_lat"),
        cls("[0-9]").alias("n_dig"),
        cls("[ \\t\\n\\r]").alias("n_sp"),
        cls("[^\\x00-\\x7F]").alias("n_na"),
    )

    def ppm(expr: str) -> Column:
        return (
            F.expr(f"CASE WHEN SUM(n_c) > 0 THEN ({expr}) * 1000000"
                   " div SUM(n_c) END")
            .cast("long")
        )

    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            ppm("SUM(n_lat)").alias("latin_ppm"),
            ppm("SUM(n_dig)").alias("digit_ppm"),
            ppm("SUM(n_sp)").alias("space_ppm"),
            ppm("SUM(n_na)").alias("nonascii_ppm"),
            ppm(
                "SUM(n_c) - SUM(n_lat) - SUM(n_dig) - SUM(n_sp)"
                " - SUM(n_na)"
            ).alias("other_ppm"),
            F.expr("SUM(CASE WHEN n_na > 0 THEN 1 ELSE 0 END)")
            .cast("long")
            .alias("n_docs_nonascii"),
            F.expr("SUM(CASE WHEN 5 * n_dig > n_c THEN 1 ELSE 0 END)")
            .cast("long")
            .alias("n_docs_digit_heavy"),
            F.expr(
                "MAX(CASE WHEN n_c > 0 THEN n_na * 1000000 div n_c"
                " ELSE 0 END)"
            )
            .cast("long")
            .alias("max_doc_nonascii_ppm"),
        )
        .orderBy("lang")
    )


@register(
    "text_code_detect",
    # Code-vs-prose screen (r13 [N]): training-corpus curation routes
    # code to a code pipeline (different dedup granularity, different
    # quality rules) and keeps accidental code OUT of prose corpora.
    # Deterministic integer rule — no classifier weights: a doc is
    # code-like when structural symbols exceed 2% of characters
    # (50·n_sym > n_chars) OR more than a quarter of its lines are
    # indented (4·n_indent > n_lines).  Rollup per source with exact
    # ppm composition.  Newlines are counted via chr(10) replacement
    # (engine-shared exact form); the symbol/indent counts use
    # regexp_extract_all length, probed IDENTICAL on both engines
    # (the (?m)^ anchor matches at pos 0 and after every newline in
    # BOTH Java regex and RE2).
    oracle="""
    WITH per AS (
      SELECT source,
             length(text) AS n_c,
             len(regexp_extract_all(text, '[{};()=<>\\[\\]]')) AS n_sym,
             length(text) - length(replace(text, chr(10), '')) + 1
               AS n_lines,
             len(regexp_extract_all(text, '(?m)^(\\t|  )')) AS n_ind
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN 50 * n_sym > n_c
                          OR 4 * n_ind > n_lines
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
           CAST(SUM(CASE WHEN 50 * n_sym > n_c
                          OR 4 * n_ind > n_lines
                    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
             AS code_ppm,
           CAST(CASE WHEN SUM(n_c) > 0
                THEN SUM(n_sym) * 1000000 // SUM(n_c) END AS BIGINT)
             AS sym_ppm,
           CAST(CASE WHEN SUM(n_lines) > 0
                THEN SUM(n_ind) * 1000000 // SUM(n_lines) END AS BIGINT)
             AS indent_ppm
    FROM per GROUP BY source ORDER BY source
    """,
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection per source — the curation screen that
    routes code to a code pipeline and keeps stray code out of prose
    corpora (code wants different dedup granularity, different quality
    rules, different tokenizer stats).  Deterministic INTEGER rule, no
    model: code-like ⇔ structural symbols ({};()=<>[]) exceed 2% of
    chars OR >25% of lines are indented (leading tab or 2 spaces).
    Output per source: doc count, code-like count and ppm, and the
    corpus-level symbol/indent composition that justifies the verdict.

    Exactness: all four features are integer counts —
    regexp_extract_all array length for symbols/indents (probed
    byte-identical across Java regex and RE2, including the (?m)^
    anchor), chr(10)-replacement length diff for lines; the rule and
    every ppm are integer arithmetic; zero-char/zero-line groups are
    NULL-guarded on both engines.  The synthetic fixture is word soup
    (≈0 symbols) so the honest output is near-zero code_ppm; the
    planted pytests pin real code/prose/indent poles exactly.

    Scale notes: ONE projection scan (two regexp passes + one replace
    over the already-read text column, no explode), then ONE
    map-combined agg to the ≤|sources|-row rollup — text never
    crosses the wire (the `text_script_profile` shape)."""
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "source",
        F.length("text").alias("n_c"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[{};()=<>\[\]]"), F.lit(0)
            )
        ).cast("long").alias("n_sym"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("\n"), F.lit("")))
            + 1
        ).cast("long").alias("n_lines"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"(?m)^(\t|  )"), F.lit(0)
            )
        ).cast("long").alias("n_ind"),
    )
    is_code = "CASE WHEN 50 * n_sym > n_c OR 4 * n_ind > n_lines" \
              " THEN 1 ELSE 0 END"
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr(f"SUM({is_code})").cast("long").alias("n_code"),
            F.expr(f"SUM({is_code}) * 1000000 div COUNT(*)")
            .cast("long")
            .alias("code_ppm"),
            F.expr(
                "CASE WHEN SUM(n_c) > 0 THEN SUM(n_sym) * 1000000"
                " div SUM(n_c) END"
            )
            .cast("long")
            .alias("sym_ppm"),
            F.expr(
                "CASE WHEN SUM(n_lines) > 0 THEN SUM(n_ind) * 1000000"
                " div SUM(n_lines) END"
            )
            .cast("long")
            .alias("indent_ppm"),
        )
        .orderBy("source")
    )


@register(
    "text_ocr_artifacts",
    # OCR/extraction-noise screen (r13 [N]): scanned-PDF pipelines leak
    # three mechanical artifacts that poison tokenizers and dedup —
    # hyphen-linebreak word splits ("exam-\nple"), punctuation runs
    # (≥4 of .,:;!?), and stray single-letter tokens (column-break
    # shrapnel).  All three are exact integer counts: the hyphen-break
    # count is a fixed-2-length replace diff (chr(10) shared form),
    # the punct-run count is regexp_extract_all length (RE2/Java
    # agree; no backreference anywhere — RE2 has none), and the
    # single-token count is a lambda list filter over the space split
    # (probed identical).  A doc is suspect when any break exists, any
    # run exists, or singles exceed 5% of tokens (20·singles >
    # tokens).  Rollup per source — the intake grain.
    oracle="""
    WITH per AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_tok,
             len(list_filter(string_split(text, ' '),
                 t -> length(t) = 1 AND regexp_matches(t, '^[a-zA-Z]$')))
               AS n_single,
             (length(text) - length(replace(text, '-' || chr(10), '')))
               // 2 AS n_hyb,
             len(regexp_extract_all(text, '[.,:;!?]{4,}')) AS n_runs
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_hyb > 0 OR n_runs > 0
                          OR 20 * n_single > n_tok
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect,
           CAST(SUM(CASE WHEN n_hyb > 0 OR n_runs > 0
                          OR 20 * n_single > n_tok
                    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
             AS suspect_ppm,
           CAST(SUM(n_hyb) AS BIGINT) AS hyphen_breaks,
           CAST(SUM(n_runs) AS BIGINT) AS punct_runs,
           CAST(CASE WHEN SUM(n_tok) > 0
                THEN SUM(n_single) * 1000000 // SUM(n_tok) END AS BIGINT)
             AS single_token_ppm
    FROM per GROUP BY source ORDER BY source
    """,
)
def text_ocr_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCR/extraction-artifact screen per source — the intake check a
    scanned-document pipeline runs before text reaches the tokenizer:
    hyphen-linebreak word splits (de-hyphenation candidates; they also
    defeat shingle dedup because "exam-\\nple" shares no n-gram with
    "example"), punctuation runs (table rules / redaction residue),
    and stray single-letter tokens (column-break shrapnel; >5% of
    tokens flips the doc suspect).

    Exactness: the three features are exact integer counts — a
    fixed-length replace diff (hyphen+chr(10), shared form), a
    regexp_extract_all length (RE2/Java-identical class repeat, no
    backreference — RE2 has none, which is also why the repeated-CHAR
    run screen is NOT here: (.)\\1{3,} needs a backreference), and a
    lambda list filter over the space split (probed identical both
    engines); the suspect rule and all ppm are integer arithmetic,
    zero-token sources NULL-guarded.  The word-soup fixture honestly
    reads ≈0 suspects; planted pytests pin each artifact pole exactly.

    Scale notes: ONE projection scan (split + filter + replace + one
    regexp over the already-read text), ONE map-combined agg to the
    ≤|sources|-row rollup — the `text_script_profile` shape; text
    never crosses the wire."""
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.size(
            F.filter(
                F.split("text", " "),
                lambda t: (F.length(t) == 1) & t.rlike("^[a-zA-Z]$"),
            )
        ).cast("long").alias("n_single"),
        (
            (
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit("-\n"), F.lit("")))
            )
            / 2
        ).cast("long").alias("n_hyb"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[.,:;!?]{4,}"), F.lit(0))
        ).cast("long").alias("n_runs"),
    )
    suspect = (
        "CASE WHEN n_hyb > 0 OR n_runs > 0 OR 20 * n_single > n_tok"
        " THEN 1 ELSE 0 END"
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr(f"SUM({suspect})").cast("long").alias("n_suspect"),
            F.expr(f"SUM({suspect}) * 1000000 div COUNT(*)")
            .cast("long")
            .alias("suspect_ppm"),
            F.sum("n_hyb").cast("long").alias("hyphen_breaks"),
            F.sum("n_runs").cast("long").alias("punct_runs"),
            F.expr(
                "CASE WHEN SUM(n_tok) > 0 THEN SUM(n_single) * 1000000"
                " div SUM(n_tok) END"
            )
            .cast("long")
            .alias("single_token_ppm"),
        )
        .orderBy("source")
    )


@register(
    "docs_bleu",
    # Corpus-level BLEU-2 (Papineni et al. 2002, public) over the same
    # deterministic (doc, successor) pairing as `docs_rouge_n` — the
    # generation-eval pair: ROUGE aggregates per-pair means, BLEU is
    # DEFINED as the corpus-level ratio of clipped-overlap sums with a
    # corpus brevity penalty, which is exactly why it gets its own op
    # (a mean of per-pair BLEUs is the classic implementation bug).
    # Pairs where either side lacks a bigram are excluded (documented;
    # the modified-precision geometric mean needs both orders).
    # OV/C/R sums are exact integers; p1/p2 ppm are integer divisions;
    # BP and the geometric mean are ONE shared double composition
    # (exp/sqrt) floored at 1e-6 on both engines.
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), uni AS (
      SELECT doc_id, unnest(t) AS g FROM toks
    ), bi AS (
      SELECT doc_id,
             unnest(list_transform(range(1, n), i -> t[i] || ' ' || t[i+1]))
               AS g
      FROM toks WHERE n >= 2
    ), grams AS (
      SELECT 1 AS ng, doc_id, g, COUNT(*) AS c FROM uni GROUP BY 2, 3
      UNION ALL
      SELECT 2 AS ng, doc_id, g, COUNT(*) AS c FROM bi GROUP BY 2, 3
    ), sizes AS (
      SELECT ng, doc_id, SUM(c) AS sz FROM grams GROUP BY 1, 2
    ), pairs AS (
      SELECT r.ng, r.doc_id AS ref_id,
             SUM(LEAST(r.c, cnd.c)) AS ov
      FROM grams r JOIN grams cnd
        ON cnd.ng = r.ng AND cnd.doc_id = r.doc_id + 1 AND cnd.g = r.g
      GROUP BY 1, 2
    ), scored AS (
      SELECT sr.ng, sr.doc_id AS ref_id,
             COALESCE(p.ov, 0) AS ov, sr.sz AS ref_n, sc.sz AS cand_n
      FROM sizes sr
      JOIN sizes sc ON sc.ng = sr.ng AND sc.doc_id = sr.doc_id + 1
      LEFT JOIN pairs p ON p.ng = sr.ng AND p.ref_id = sr.doc_id
    ), paired AS (
      SELECT ref_id,
             MAX(CASE WHEN ng = 1 THEN ov END) AS ov1,
             MAX(CASE WHEN ng = 1 THEN cand_n END) AS c1,
             MAX(CASE WHEN ng = 1 THEN ref_n END) AS r1,
             MAX(CASE WHEN ng = 2 THEN ov END) AS ov2,
             MAX(CASE WHEN ng = 2 THEN cand_n END) AS c2
      FROM scored GROUP BY ref_id
      HAVING MAX(CASE WHEN ng = 2 THEN cand_n END) IS NOT NULL
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(ov1) AS BIGINT) AS ov1,
             CAST(SUM(c1) AS BIGINT) AS c1,
             CAST(SUM(r1) AS BIGINT) AS r1,
             CAST(SUM(ov2) AS BIGINT) AS ov2,
             CAST(SUM(c2) AS BIGINT) AS c2
      FROM paired
    )
    SELECT n_pairs,
           CAST(c1 AS BIGINT) AS cand_tokens,
           CAST(r1 AS BIGINT) AS ref_tokens,
           CAST(ov1 * 1000000 // c1 AS BIGINT) AS p1_ppm,
           CAST(ov2 * 1000000 // c2 AS BIGINT) AS p2_ppm,
           CAST(floor(CASE WHEN c1 >= r1 THEN 1000000.0
                 ELSE exp(1.0 - CAST(r1 AS DOUBLE) / c1) * 1000000.0 END)
                AS BIGINT) AS bp_ppm,
           CAST(floor((CASE WHEN c1 >= r1 THEN 1.0
                       ELSE exp(1.0 - CAST(r1 AS DOUBLE) / c1) END)
                * sqrt((CAST(ov1 AS DOUBLE) / c1)
                       * (CAST(ov2 AS DOUBLE) / c2))
                * 1000000.0) AS BIGINT) AS bleu2_ppm
    FROM tot WHERE n_pairs > 0
    """,
)
def docs_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BLEU-2 with brevity penalty over the (doc,
    successor) pairs — the generation-eval companion to
    `docs_rouge_n`: BLEU is DEFINED as corpus-level clipped-precision
    sums (Σov_n / Σcand_n) under a corpus brevity penalty, NOT a mean
    of per-pair scores — averaging per-pair BLEUs is the classic
    implementation bug this op's shape forecloses.  BLEU-2 =
    BP·√(p1·p2), BP = min(1, e^(1−r/c)).  Pairs lacking a bigram on
    either side are excluded (the geometric mean needs both orders;
    documented).

    Exactness: all overlap/length sums are exact integers; p1/p2 ppm
    are single integer divisions; BP and the geometric mean are ONE
    shared exp/sqrt double composition floored at 1e-6 on both
    engines (the corpus_psi_drift posture).  Law pytests pin the
    poles: identical pairs → bleu2_ppm == 1000000 exactly; a
    half-length perfect-prefix candidate → BP = e^(−1) exactly
    (floor 367879); zero bigram overlap → 0.

    Scale notes: identical movement to `docs_rouge_n` — one
    token/bigram explode into doc-keyed gram counts, the pair overlap
    an equi-join on (n, doc_id+1, gram), then ONE corpus reduce to a
    1-row frame; never all-pairs."""
    d = load_table(spark, sf_dir, "documents")
    grams, sizes = _word_gram_tables(d)
    pairs = _pair_clipped_overlap(grams)
    sr = sizes.select(
        "ng", F.col("doc_id").alias("ref_id"), F.col("sz").alias("ref_n")
    )
    sc = sizes.select(
        "ng", (F.col("doc_id") - 1).alias("ref_id"), F.col("sz").alias("cand_n")
    )
    scored = (
        sr.join(sc, ["ng", "ref_id"])
        .join(pairs, ["ng", "ref_id"], "left")
        .select("ng", "ref_id", F.coalesce("ov", F.lit(0)).alias("ov"),
                "ref_n", "cand_n")
    )
    both = (
        scored.groupBy("ref_id")
        .agg(
            F.expr("MAX(CASE WHEN ng = 1 THEN ov END)").alias("ov1"),
            F.expr("MAX(CASE WHEN ng = 1 THEN cand_n END)").alias("c1"),
            F.expr("MAX(CASE WHEN ng = 1 THEN ref_n END)").alias("r1"),
            F.expr("MAX(CASE WHEN ng = 2 THEN ov END)").alias("ov2"),
            F.expr("MAX(CASE WHEN ng = 2 THEN cand_n END)").alias("c2"),
        )
        .where(F.col("c2").isNotNull())
    )
    tot = both.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("ov1").cast("long").alias("ov1"),
        F.sum("c1").cast("long").alias("c1"),
        F.sum("r1").cast("long").alias("r1"),
        F.sum("ov2").cast("long").alias("ov2"),
        F.sum("c2").cast("long").alias("c2"),
    )
    return tot.where(F.col("n_pairs") > 0).select(
        "n_pairs",
        F.col("c1").alias("cand_tokens"),
        F.col("r1").alias("ref_tokens"),
        F.expr("ov1 * 1000000 div c1").cast("long").alias("p1_ppm"),
        F.expr("ov2 * 1000000 div c2").cast("long").alias("p2_ppm"),
        F.expr(
            "CAST(floor(CASE WHEN c1 >= r1 THEN 1000000.0"
            " ELSE exp(1.0 - CAST(r1 AS DOUBLE) / c1) * 1000000.0 END)"
            " AS BIGINT)"
        ).alias("bp_ppm"),
        F.expr(
            "CAST(floor((CASE WHEN c1 >= r1 THEN 1.0"
            "            ELSE exp(1.0 - CAST(r1 AS DOUBLE) / c1) END)"
            " * sqrt((CAST(ov1 AS DOUBLE) / c1)"
            "        * (CAST(ov2 AS DOUBLE) / c2))"
            " * 1000000.0) AS BIGINT)"
        ).alias("bleu2_ppm"),
    )


@register(
    "docs_chrf",
    # Corpus-level chrF (Popović 2015, public) over the same
    # deterministic (doc, successor) pairing as `docs_bleu` — the
    # character-grain generation-eval sibling: chrF is whitespace-free
    # CHARACTER n-gram F-β with β = 2 (recall-weighted), robust to
    # tokenization and morphology where BLEU's word grams are brittle.
    # Orders 1..3 (the span the fixture's word lengths support;
    # standard chrF6's orders 4-6 add nothing on short synthetic docs
    # — documented reduction).  The β = 2 F-score collapses to ONE
    # exact integer rational per order:  F = 5PR/(4P+R) with
    # P = ov/c, R = ov/r  ⇒  F = 5·ov/(4r + c)  (ov = 0 ⇒ 0), so
    # f{1,2,3}_e6 are single integer divisions and chrf3_e6 is their
    # floored mean — no float anywhere, unlike BLEU's exp/sqrt tail.
    # Pairs where either side lacks an order-3 gram (< 3 chars after
    # space removal) are excluded (documented, the docs_bleu posture).
    oracle="""
    WITH s AS (
      SELECT doc_id, replace(text, ' ', '') AS s,
             length(replace(text, ' ', '')) AS len
      FROM documents
    ), grams_raw AS (
      SELECT 1 AS ng, doc_id, unnest(list_transform(range(1, len + 1),
               i -> substr(s, i, 1))) AS g
      FROM s WHERE len >= 1
      UNION ALL
      SELECT 2 AS ng, doc_id, unnest(list_transform(range(1, len),
               i -> substr(s, i, 2))) AS g
      FROM s WHERE len >= 2
      UNION ALL
      SELECT 3 AS ng, doc_id, unnest(list_transform(range(1, len - 1),
               i -> substr(s, i, 3))) AS g
      FROM s WHERE len >= 3
    ), grams AS (
      SELECT ng, doc_id, g, COUNT(*) AS c FROM grams_raw GROUP BY 1, 2, 3
    ), sizes AS (
      SELECT ng, doc_id, SUM(c) AS sz FROM grams GROUP BY 1, 2
    ), pairs AS (
      SELECT r.ng, r.doc_id AS ref_id, SUM(LEAST(r.c, cnd.c)) AS ov
      FROM grams r JOIN grams cnd
        ON cnd.ng = r.ng AND cnd.doc_id = r.doc_id + 1 AND cnd.g = r.g
      GROUP BY 1, 2
    ), scored AS (
      SELECT sr.ng, sr.doc_id AS ref_id,
             COALESCE(p.ov, 0) AS ov, sr.sz AS ref_n, sc.sz AS cand_n
      FROM sizes sr
      JOIN sizes sc ON sc.ng = sr.ng AND sc.doc_id = sr.doc_id + 1
      LEFT JOIN pairs p ON p.ng = sr.ng AND p.ref_id = sr.doc_id
    ), pair_ok AS (
      SELECT ref_id,
             MAX(CASE WHEN ng = 1 THEN ov END) AS ov1,
             MAX(CASE WHEN ng = 1 THEN cand_n END) AS c1,
             MAX(CASE WHEN ng = 1 THEN ref_n END) AS r1,
             MAX(CASE WHEN ng = 2 THEN ov END) AS ov2,
             MAX(CASE WHEN ng = 2 THEN cand_n END) AS c2,
             MAX(CASE WHEN ng = 2 THEN ref_n END) AS r2,
             MAX(CASE WHEN ng = 3 THEN ov END) AS ov3,
             MAX(CASE WHEN ng = 3 THEN cand_n END) AS c3,
             MAX(CASE WHEN ng = 3 THEN ref_n END) AS r3
      FROM scored GROUP BY ref_id
      HAVING MAX(CASE WHEN ng = 3 THEN cand_n END) IS NOT NULL
         AND MAX(CASE WHEN ng = 3 THEN ref_n END) IS NOT NULL
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(ov1) AS BIGINT) AS ov1,
             CAST(SUM(c1) AS BIGINT) AS c1,
             CAST(SUM(r1) AS BIGINT) AS r1,
             CAST(SUM(ov2) AS BIGINT) AS ov2,
             CAST(SUM(c2) AS BIGINT) AS c2,
             CAST(SUM(r2) AS BIGINT) AS r2,
             CAST(SUM(ov3) AS BIGINT) AS ov3,
             CAST(SUM(c3) AS BIGINT) AS c3,
             CAST(SUM(r3) AS BIGINT) AS r3
      FROM pair_ok
    )
    SELECT n_pairs,
           c1 AS cand_chars, r1 AS ref_chars,
           CAST(5 * ov1 * 1000000 // (4 * r1 + c1) AS BIGINT) AS f1_e6,
           CAST(5 * ov2 * 1000000 // (4 * r2 + c2) AS BIGINT) AS f2_e6,
           CAST(5 * ov3 * 1000000 // (4 * r3 + c3) AS BIGINT) AS f3_e6,
           CAST((5 * ov1 * 1000000 // (4 * r1 + c1)
               + 5 * ov2 * 1000000 // (4 * r2 + c2)
               + 5 * ov3 * 1000000 // (4 * r3 + c3)) // 3 AS BIGINT)
             AS chrf3_e6
    FROM tot WHERE n_pairs > 0
    """,
)
def docs_chrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level chrF (β = 2, character orders 1..3) over the
    (doc, successor) pairs — the character-grain sibling of
    `docs_bleu`: whitespace is removed, per-order clipped character
    n-gram overlaps are summed CORPUS-LEVEL (never a mean of per-pair
    scores — the same definitional trap BLEU's shape forecloses), and
    chrF3 is the mean of the three per-order F-β scores.

    Exactness: β = 2 makes each per-order F-score one exact integer
    division — F = 5PR/(4P+R) with P = Σov/Σc, R = Σov/Σr collapses
    to 5·Σov/(4·Σr + Σc) — so f1/f2/f3_e6 and their floored mean
    chrf3_e6 form an all-integer chain with NO float anywhere (chrF's
    advantage over BLEU's exp/sqrt tail, preserved by the algebra).
    Law pytests pin the poles: identical pairs → every f_e6 and
    chrf3_e6 exactly 1e6; disjoint alphabets → all exactly 0; a
    hand-computed aaaa/aaa pair pins the integer chain end-to-end.

    Scale notes: identical movement to `docs_bleu` at character grain
    — one char-gram explode (~3× the text volume in rows, the cost of
    tokenization robustness) into doc-keyed gram counts, pair overlap
    an equi-join on (ng, doc_id+1, gram), then ONE corpus reduce to a
    1-row frame; never all-pairs."""
    d = load_table(spark, sf_dir, "documents")
    # CPU-rebalance before the explode (r14, the shingle_sets recipe):
    # the sf fixtures read as ONE ~0.6 MB split, so all three char-gram
    # explodes (~3× the corpus characters in rows) ran single-task.
    # Explicit count for the documented AQE-coalesce reason.
    par = spark.sparkContext.defaultParallelism
    s = d.repartition(par, F.col("doc_id")).select(
        "doc_id",
        F.expr("replace(text, ' ', '')").alias("s"),
        F.expr("length(replace(text, ' ', ''))").alias("len"),
    )
    # stage(): the gram-count table feeds FOUR consumers (r, cnd, and
    # sizes twice via sr/sc); without it Catalyst inlines the char-gram
    # explode + count subtree into every consumer — the r14-before
    # formatted plan carried 24 documents scans for one logical pass
    # (the "12-scan diamond" SURVEY noted).  r15: the staging job
    # itself is now ONE corpus pass — a single explode emits all three
    # orders as (ng, g) structs from one flattened per-doc array
    # (the r14 form ran three per-order explode branches, re-reading
    # the repartition exchange 3×).  Plan-gated: one Generate, one
    # documents scan in the staging job (tests/test_plans.py).
    all_grams = F.expr(
        "flatten(transform(array(1, 2, 3), n -> CASE WHEN len >= n THEN"
        " transform(sequence(1, len - n + 1),"
        "           i -> struct(n AS ng, substring(s, i, n) AS g))"
        " ELSE CAST(array() AS array<struct<ng:int,g:string>>) END))"
    )
    # grams stays LAZY (r15): its only consumer is the inline-role
    # pairing below, which reads it exactly once — the whole
    # scan→explode→count→pair chain is ONE pipeline with no checkpoint
    # (the r14 staging existed for a 4-consumer diamond that the
    # len-derived sizes and the single-consumption pairing dissolved).
    grams = (
        s.select("doc_id", F.explode(all_grams).alias("x"))
        .select(F.col("x.ng").alias("ng"), "doc_id", F.col("x.g").alias("g"))
        .groupBy("ng", "doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Per-order gram totals need NO aggregation over the gram table:
    # Σc over an order's distinct grams = the number of gram INSTANCES,
    # which is len - ng + 1 by construction — a pure function of the
    # per-doc char length (the r14 form paid a second shuffle+agg pass
    # over the gram-count table + a checkpoint for exactly this).
    sizes = stage(
        s.select(
            "doc_id",
            F.explode(
                F.expr(
                    "filter(transform(array(1, 2, 3),"
                    " n -> struct(n AS ng, CAST(len - n + 1 AS BIGINT) AS sz)),"
                    " p -> p.sz >= 1)"
                )
            ).alias("p"),
        ).select(F.col("p.ng").alias("ng"), "doc_id", F.col("p.sz").alias("sz"))
    )
    pairs = _pair_clipped_overlap(grams)
    sr = sizes.select(
        "ng", F.col("doc_id").alias("ref_id"), F.col("sz").alias("ref_n")
    )
    sc = sizes.select(
        "ng", (F.col("doc_id") - 1).alias("ref_id"), F.col("sz").alias("cand_n")
    )
    scored = (
        sr.join(sc, ["ng", "ref_id"])
        .join(pairs, ["ng", "ref_id"], "left")
        .select("ng", "ref_id", F.coalesce("ov", F.lit(0)).alias("ov"),
                "ref_n", "cand_n")
    )
    both = (
        scored.groupBy("ref_id")
        .agg(
            *[
                F.expr(f"MAX(CASE WHEN ng = {n} THEN {c} END)").alias(
                    f"{a}{n}"
                )
                for n in (1, 2, 3)
                for c, a in (("ov", "ov"), ("cand_n", "c"), ("ref_n", "r"))
            ]
        )
        .where(F.col("c3").isNotNull() & F.col("r3").isNotNull())
    )
    tot = both.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        *[
            F.sum(f"{a}{n}").cast("long").alias(f"{a}{n}")
            for n in (1, 2, 3)
            for a in ("ov", "c", "r")
        ],
    )
    f = {
        n: f"(5 * ov{n} * 1000000 div (4 * r{n} + c{n}))" for n in (1, 2, 3)
    }
    return tot.where(F.col("n_pairs") > 0).select(
        "n_pairs",
        F.col("c1").alias("cand_chars"),
        F.col("r1").alias("ref_chars"),
        F.expr(f"CAST({f[1]} AS BIGINT)").alias("f1_e6"),
        F.expr(f"CAST({f[2]} AS BIGINT)").alias("f2_e6"),
        F.expr(f"CAST({f[3]} AS BIGINT)").alias("f3_e6"),
        F.expr(
            f"CAST(({f[1]} + {f[2]} + {f[3]}) div 3 AS BIGINT)"
        ).alias("chrf3_e6"),
    )


@register(
    "docs_edit_distance",
    # Corpus edit-distance profile (Levenshtein 1966, public) over the
    # (doc, successor) pairing shared with docs_bleu/docs_chrf — the
    # third generation-eval grain: BLEU counts word n-grams, chrF
    # character n-grams, edit distance the minimal character
    # EDIT SCRIPT (the TER-family primitive; also the post-OCR /
    # near-dup adjudication metric).  Both engines implement the SAME
    # dynamic program as a builtin (`levenshtein`), so the whole op is
    # EXACT with no float anywhere: per pair, similarity_e6 =
    # (maxlen − lev)·1e6 div maxlen, bucketed into deciles (identical
    # pairs fold into the top bucket via least(9, ·) — documented).
    # Output: one row per occupied decile with pair count, summed
    # distance, and the floored mean similarity.
    oracle="""
    WITH p AS (
      SELECT r.doc_id AS ref_id,
             levenshtein(r.text, c.text) AS lev,
             GREATEST(length(r.text), length(c.text)) AS maxlen
      FROM documents r JOIN documents c ON c.doc_id = r.doc_id + 1
      WHERE length(r.text) > 0 AND length(c.text) > 0
    ), scored AS (
      SELECT lev, maxlen,
             (maxlen - lev) * 1000000 // maxlen AS sim_e6
      FROM p
    )
    SELECT CAST(LEAST(9, sim_e6 // 100000) AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(lev) AS BIGINT) AS sum_lev,
           CAST(SUM(sim_e6) // COUNT(*) AS BIGINT) AS mean_sim_e6
    FROM scored
    GROUP BY 1 ORDER BY decile
    """,
)
def docs_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus edit-distance profile over the (doc, successor) pairs —
    the character edit-script grain completing the generation-eval
    triple (word n-grams = `docs_bleu`, char n-grams = `docs_chrf`):
    per pair, Levenshtein distance and the normalized similarity
    (maxlen − lev)/maxlen, rolled into a decile histogram with the
    corpus mean.

    Exactness: `levenshtein` is the SAME exact dynamic program as a
    JVM builtin on both engines, distances and lengths are integers,
    similarity_e6 and the mean are single integer divisions — the
    entire op is float-free end-to-end (no floor() composition at
    all, unlike BLEU's exp/sqrt tail).  Identical pairs (sim_e6 =
    1e6) fold into decile 9 via least(9, ·), documented.  Law
    pytests pin identical → (0 distance, decile 9), disjoint
    equal-length → (len, decile 0), the half-length prefix →
    sim exactly 500000, and kitten/sitting → exactly 3.

    Scale notes: the successor pairing is ONE equi-join on doc_id+1
    (adjacent pairs, never all-pairs), but it ships full text both
    sides and the DP is O(len_a·len_b) per pair — the one op in the
    triple whose cost is quadratic in DOCUMENT length (not corpus
    size).  At 100 TB the production posture is edit distance as the
    VERIFY stage over blocked candidate pairs only (dedup_minhash /
    dedup_containment emit the candidates); this pairing is the
    deterministic eval-harness shape, same as its siblings."""
    d = load_table(spark, sf_dir, "documents")
    # CPU-rebalance on the PROBE side (r14, the shingle_sets /
    # agg_bootstrap_ci recipe): the DP stage is pipelined onto the
    # documents scan, and the sf fixtures read as ONE ~0.6 MB split, so
    # the whole O(len²)-per-pair Levenshtein stage ran in a single task
    # (31 cores idle; measured at sf0.1: ~5.4 s → ~2.3 s cold,
    # 4.5 s → 1.0 s warm).  Hashing on
    # ref_id is deterministic under task retry; the explicit count
    # stops AQE coalescing the byte-tiny exchange back to 1 partition
    # even though the downstream is CPU-bound, exactly as documented in
    # shingle_sets.
    par = spark.sparkContext.defaultParallelism
    r = d.where(F.length("text") > 0).select(
        F.col("doc_id").alias("ref_id"),
        F.col("text").alias("rt"),
        F.length("text").alias("rl"),
    ).repartition(par, F.col("ref_id"))
    c = d.where(F.length("text") > 0).select(
        (F.col("doc_id") - 1).alias("ref_id"),
        F.col("text").alias("ct"),
        F.length("text").alias("cl"),
    )
    scored = r.join(c, "ref_id").select(
        F.levenshtein("rt", "ct").cast("long").alias("lev"),
        F.greatest("rl", "cl").cast("long").alias("maxlen"),
    ).select(
        "lev",
        F.expr("(maxlen - lev) * 1000000 div maxlen").alias("sim_e6"),
    )
    return (
        scored.groupBy(
            F.expr("CAST(LEAST(9, sim_e6 div 100000) AS BIGINT)").alias(
                "decile"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("lev").cast("long").alias("sum_lev"),
            F.expr("CAST(SUM(sim_e6) div COUNT(*) AS BIGINT)").alias(
                "mean_sim_e6"
            ),
        )
        .orderBy("decile")
    )


@register(
    "text_hapax_ratio",
    # Hapax legomena profile per language (public lexicostatistics —
    # the Zipf-tail summary): the share of vocabulary occurring
    # exactly once (hapax) and exactly twice (dis legomena) is the
    # standard lexical-richness / corpus-maturity signal the Heaps
    # curve (`corpus_heaps_curve`) integrates — a crawl slice whose
    # hapax share collapses is template-saturated, one whose share
    # explodes is OCR-shrapnel-ridden (the two tails the curation
    # screens chase).  All counts are exact integers; ratios are
    # single e6 integer divisions; token shares use the hapax rule at
    # TOKEN grain too (hapax tokens == hapax types by definition, so
    # the token share reuses the type count — the arithmetic identity
    # the law test pins).
    oracle="""
    WITH w AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    ), wc AS (
      SELECT lang, word, COUNT(*) AS c FROM w WHERE word <> ''
      GROUP BY lang, word
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dis,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                  // COUNT(*) AS BIGINT) AS hapax_type_e6,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                  // SUM(c) AS BIGINT) AS hapax_token_e6
    FROM wc GROUP BY lang ORDER BY lang
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena profile per language — the Zipf-tail summary of
    lexical richness: type count, token count, words occurring exactly
    once (hapax) and exactly twice (dis legomena), with the hapax
    share of TYPES and of TOKENS as e6 integers.  The curation read:
    a collapsing hapax share flags template saturation, an exploding
    one flags OCR shrapnel — the integrand of `corpus_heaps_curve`'s
    growth law at one snapshot.

    Exactness: pure integer counting end-to-end; both ratios are
    single e6 integer divisions.  Law pytests pin the poles: an
    all-unique corpus → both shares exactly 1e6; an everything-twice
    corpus → both exactly 0; and the token-share identity (hapax
    tokens ≡ hapax types, so hapax_token_e6 = n_hapax·1e6 div
    n_tokens with the SAME numerator as the type share).

    Scale notes: one token explode into a (lang, word) count — the
    `vocab_topk` movement — then a ≤|langs|-row conditional rollup;
    the explode is the only corpus-sized stage and combines
    map-side."""
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return (
        wc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("c").cast("long").alias("n_tokens"),
            hapax.cast("long").alias("n_hapax"),
            F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dis"),
        )
        .select(
            "lang",
            "n_types",
            "n_tokens",
            "n_hapax",
            "n_dis",
            F.expr("n_hapax * 1000000 div n_types").alias("hapax_type_e6"),
            F.expr("n_hapax * 1000000 div n_tokens").alias("hapax_token_e6"),
        )
        .orderBy("lang")
    )
