"""Training-data pipeline composition ops [N] (mandate: BASELINE.json:6
— "the operations a large-scale training-data pipeline would need").

Three ops every LLM pre-training data pipeline runs between "corpus" and
"training shards", each expressed as pure DataFrame plans with exact
DuckDB oracles:

* ``pack_sequences`` — assign documents to fixed-token-budget training
  shards (sequence packing at the shard granularity).
* ``chunk_documents`` — split documents into overlapping context-window
  chunks (the tokenize-and-chunk step before packing).
* ``sample_weighted`` — deterministic per-source weighted sampling
  (domain reweighting / data mixing).
* ``pipeline_corpus_shards`` — the end-to-end composition (quality gate
  → exact dedup → packing) as one lazy plan.

All of these are scan-side + one window or one broadcast join; none
shuffles more than the grouped output, so each survives a 100 TB corpus
unchanged (see per-op notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..session import load_table

#: tokens per training shard (pack_sequences)
_SHARD_BUDGET = 256
#: context-window chunking: chunk length / stride in whitespace tokens
_CHUNK_LEN = 32
_CHUNK_STRIDE = 24


@register(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT source, n_tokens,
             CAST(floor(
               COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {_SHARD_BUDGET}.0) AS BIGINT) AS shard
      FROM toks
    )
    SELECT source, shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
    FROM packed
    GROUP BY source, shard
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign each document to a training shard so
    every shard holds ~``_SHARD_BUDGET`` tokens, preserving a stable
    (source, doc_id) order — shard = floor(running-tokens-before / B).

    This is the streaming-cumulative formulation of greedy packing: one
    pass, no driver loop, and deterministic given the sort key.  At
    100 TB: token counts are scan-side (split+size inside codegen), the
    only shuffle is the per-source range for the running-sum window —
    the same partitioning the final shard write needs anyway, so the
    window is free in a real pipeline.  A skewed giant source is handled
    by sub-bucketing the window key (source, doc_id div N) exactly like
    sort_multi's range trick; per-doc truncation to the budget happens
    in chunk_documents upstream, so a single doc can't straddle shards
    by more than one chunk."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.select(
        "source",
        "n_tokens",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / _SHARD_BUDGET
        ).alias("shard"),
    )
    return packed.groupBy("source", "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
    )


@register(
    "chunk_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents
      WHERE doc_id % 7 = 0
    )
    SELECT doc_id,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(least(n - s, {_CHUNK_LEN}) AS BIGINT) AS chunk_len,
           array_to_string(t[s + 1 : s + {_CHUNK_LEN}], ' ') AS chunk_text
    FROM toks, unnest(range(0, n, {_CHUNK_STRIDE})) AS u(s)
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into overlapping
    ``_CHUNK_LEN``-token windows every ``_CHUNK_STRIDE`` tokens (8-token
    overlap) — the tokenize-and-chunk step that feeds sequence packing.

    Pure generate-and-explode: tokenization and ``sequence()`` of chunk
    starts are scan-side, ``explode`` multiplies rows inside the same
    stage (no shuffle at all — the plan is Scan → Project → Generate),
    and chunk text is a ``slice``+``array_join`` over the already-split
    token array.  At 100 TB this is embarrassingly parallel; output
    size ~ corpus × (1 + overlap/stride)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    toks = d.select(
        "doc_id",
        F.split("text", " ").alias("t"),
        F.size(F.split("text", " ")).alias("n"),
    )
    starts = F.sequence(
        F.lit(0), F.col("n") - 1, F.lit(_CHUNK_STRIDE)
    )
    return (
        toks.select("doc_id", "t", "n", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.col("s").cast("long").alias("chunk_start"),
            F.least(F.col("n") - F.col("s"), F.lit(_CHUNK_LEN))
            .cast("long")
            .alias("chunk_len"),
            F.array_join(
                F.slice(F.col("t"), F.col("s") + 1, _CHUNK_LEN), " "
            ).alias("chunk_text"),
        )
    )


@register(
    "sample_weighted",
    # Deterministic "hash" = ((doc_id % 1000003) * 2654435761) % 100
    # (Knuth multiplicative over a prime-bounded operand).  The inner
    # modulo keeps the product under 2^62 for ANY doc_id — a raw
    # doc_id × constant overflows int64 past doc_id ≈ 3.5e9, i.e. at
    # real corpus scale — and the arithmetic stays exact BIGINT on both
    # engines, so the oracle reproduces the sample without sharing an RNG.
    oracle="""
    WITH weights(source, pct) AS (VALUES
      ('src0', 100), ('src1', 75), ('src2', 50), ('src3', 25),
      ('src4', 10)),
    kept AS (
      SELECT d.source, d.doc_id,
             len(string_split(d.text, ' ')) AS n_tokens
      FROM documents d JOIN weights w ON d.source = w.source
      WHERE ((d.doc_id % 1000003) * 2654435761) % 100 < w.pct
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
    FROM kept GROUP BY source
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain reweighting: keep a per-source fraction of documents
    (100%/75%/50%/25%/10%) via a deterministic multiplicative hash on
    doc_id — the data-mixing step that turns a raw corpus into a
    training mixture.

    The weight table is a literal dim → broadcast join; the keep/drop
    decision is a scan-side integer expression, so the plan is a
    filtered scan plus one partial+final aggregate.  At 100 TB the
    filter prunes before any shuffle and the hash is reproducible across
    engines and runs — re-running the pipeline yields the same mixture
    (the property that makes dataset ablations comparable)."""
    d = load_table(spark, sf_dir, "documents")
    weights = F.broadcast(
        spark.createDataFrame(
            [("src0", 100), ("src1", 75), ("src2", 50), ("src3", 25), ("src4", 10)],
            "source string, pct int",
        )
    )
    kept = (
        d.join(weights, "source")
        .where(((F.col("doc_id") % 1000003) * F.lit(2654435761)) % 100 < F.col("pct"))
        .select(
            "source", F.size(F.split("text", " ")).alias("n_tokens")
        )
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
    )

@register(
    "pipeline_corpus_shards",
    # End-to-end oracle: the same quality→dedup→pack chain as one SQL CTE
    # pipeline.  Matching here proves the COMPOSITION, not just the parts.
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, source,
             regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
      WHERE n_chars BETWEEN 50 AND 5000
        AND len(string_split(text, ' ')) >= 10
    ), dedup AS (
      SELECT doc_id, source, n_tokens
      FROM (SELECT *, row_number() OVER (PARTITION BY sha256(norm)
                                         ORDER BY doc_id) AS rn
            FROM gated)
      WHERE rn = 1
    ), packed AS (
      SELECT source, n_tokens,
             CAST(floor(
               COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {_SHARD_BUDGET}.0) AS BIGINT) AS shard
      FROM dedup
    )
    SELECT source, shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
    FROM packed
    GROUP BY source, shard
    """,
)
def pipeline_corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus→training-shards pipeline as ONE lazy plan:
    quality gate (length bounds, min tokens) → exact dedup (normalized
    sha256, keep lowest doc_id) → token-budget sequence packing → per-
    shard stats.  This is the composition a real dataset build runs; a
    user of the individual operators gets exactly this by chaining them,
    and the oracle verifies the chain end-to-end.

    Plan: gate is a pushed scan filter; dedup is one min_by aggregate on
    the content hash; packing reuses the per-source window partitioning;
    nothing materializes between stages — Catalyst fuses the whole chain
    into scan → agg → window → agg, three shuffles total at any scale
    (hash, source window, final group — the last two share partitioning)."""
    d = load_table(spark, sf_dir, "documents")
    gated = d.where(
        F.col("n_chars").between(50, 5000)
        & (F.size(F.split("text", " ")) >= 10)
    ).select(
        "doc_id",
        "source",
        F.sha2(
            F.regexp_replace(F.lower("text"), r"\s+", " "), 256
        ).alias("content_hash"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    dedup = (
        gated.groupBy("content_hash")
        .agg(
            F.min_by(
                F.struct("doc_id", "source", "n_tokens"), "doc_id"
            ).alias("keep")
        )
        .select("keep.doc_id", "keep.source", "keep.n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = dedup.select(
        "source",
        "n_tokens",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / _SHARD_BUDGET
        ).alias("shard"),
    )
    return packed.groupBy("source", "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
    )



@register(
    "events_outliers",
    oracle="""
    WITH x AS (
      SELECT event_type, CAST(ROUND(value * 100, 0) AS HUGEINT) AS xc
      FROM events
    ), g AS (
      SELECT event_type,
             CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(xc) AS s,
             SUM(xc * xc) AS q
      FROM x GROUP BY event_type
    )
    SELECT x.event_type,
           CAST(g.n AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN (g.n * x.xc - g.s) * (g.n * x.xc - g.s)
                              > 9 * (g.n * g.q - g.s * g.s)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM x JOIN g ON x.event_type = g.event_type
    GROUP BY x.event_type, g.n
    """,
)
def events_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier counts per event type — the monitoring/data-quality
    staple — with the z-score test rearranged into pure integer
    arithmetic so the oracle comparison is exact.

    ``|x − μ| > 3σ``, with μ = s/n and σ² = (n·q − s²)/n², multiplies out
    to ``(n·x − s)² > 9·(n·q − s²)`` — no division, no square root, no
    float anywhere: values are 2-decimal doubles converted to integer
    cents up front (round(x·100) is exact for 2-decimal inputs), and
    every product stays in integer space (DECIMAL(38,0) Spark-side,
    HUGEINT oracle-side — n·q ≈ 10²⁶ at 10¹² rows, inside both).

    Scale notes: one partial+final agg builds (n, s, q) per type — a
    handful of rows — which broadcasts back onto the scan for the
    outlier test; the second agg reuses the same grouping key.  Two
    passes over events (agg + test) is the price of a global μ,σ; at
    100 TB both passes are scan-bound and shuffle only group-sized
    rows."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("xc")
    )
    big = F.col("xc").cast("decimal(38,0)")
    g = e.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(big).alias("s"),
        F.sum(big * F.col("xc")).alias("q"),
    )
    lhs = F.col("n") * F.col("xc") - F.col("s")
    is_out = (lhs * lhs) > (F.lit(9) * (F.col("n") * F.col("q") - F.col("s") * F.col("s")))
    return (
        e.join(F.broadcast(g), "event_type")
        .groupBy("event_type", "n")
        .agg(F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
        )
    )


@register(
    "source_p75_gate",
    oracle="""
    WITH r AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    ), th AS (
      SELECT source, n_chars AS p75
      FROM r WHERE rn = CAST(CEIL(0.75 * n) AS BIGINT)
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MIN(d.n_chars) AS BIGINT) AS min_kept_chars,
           CAST(ANY_VALUE(th.p75) AS BIGINT) AS p75_chars
    FROM documents d JOIN th ON d.source = th.source
    WHERE d.n_chars > th.p75
    GROUP BY d.source
    """,
)
def source_p75_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gating by per-source length percentile: keep documents
    above their source's 75th percentile of n_chars.  The percentile is
    DISCRETE — the value at rank ceil(0.75·n) under a total (n_chars,
    doc_id) order — because interpolated percentiles are float quotients
    with engine-specific rounding, while a ranked element is exact in
    any engine.  (0.75·n is itself exact: 3/4 is a binary-representable
    factor.)

    Scale notes: one shuffle on source for the rank window; the
    thresholds table is sources-sized → broadcast back onto the scan.
    At 100 TB the window sort is the cost — per-source, not global, and
    spillable; a production variant would swap in approx_percentile and
    lose the oracle, which is exactly the trade this query documents."""
    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = d.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    th = r.where(
        F.col("rn") == F.ceil(0.75 * F.col("n")).cast("long")
    ).select("source", F.col("n_chars").alias("p75"))
    return (
        d.join(F.broadcast(th), "source")
        .where(F.col("n_chars") > F.col("p75"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("n_chars").alias("min_kept_chars"),
            F.any_value(F.col("p75")).alias("p75_chars"),
        )
    )


@register(
    "lang_balanced_sample",
    oracle="""
    WITH r AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
    )
    SELECT lang, doc_id FROM r WHERE rn <= 30
    """,
)
def lang_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced subcorpus: cap every language at 30 documents,
    chosen by deterministic hash order (md5 of the doc id) so the sample
    is reproducible across engines, runs, and cluster sizes — the
    multilingual-mixing step that stops a 90%-English corpus from
    drowning low-resource languages.

    Scale notes: one shuffle on lang for the rank window.  Languages are
    a skewed key (English IS the hot partition) — at 100 TB the
    production form pre-filters with a cheap per-partition local top-K
    on the same hash order before the global window (K rows per
    partition survive), which this plan's hash-order determinism makes
    semantics-preserving; the fixture-scale plan keeps the single
    window, and the oracle pins the exact sample either way."""
    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 30)
        .select("lang", "doc_id")
    )


@register(
    "docs_preference_pairs",
    # RLHF preference-pair construction: per (lang, source) prompt
    # group, chosen = highest-scoring doc, rejected = lowest-scoring
    # doc, under a deterministic integer quality score (word density
    # ppm — words per char) with (score, doc_id) total-order
    # tie-breaks; groups need >= 2 docs and a strictly positive margin
    # (a zero-margin pair teaches nothing and is dropped on BOTH
    # engines).
    oracle="""
    WITH scored AS (
        SELECT lang, source, doc_id,
               (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                 * 1000000 // LENGTH(text) AS score_ppm
        FROM documents WHERE LENGTH(text) > 0
    ), ranked AS (
        SELECT lang, source, doc_id, score_ppm,
               ROW_NUMBER() OVER (PARTITION BY lang, source
                                  ORDER BY score_ppm DESC, doc_id) AS rk_top,
               ROW_NUMBER() OVER (PARTITION BY lang, source
                                  ORDER BY score_ppm ASC, doc_id DESC)
                   AS rk_bot,
               COUNT(*) OVER (PARTITION BY lang, source) AS grp_n
        FROM scored
    ), chosen AS (
        SELECT lang, source, grp_n, doc_id AS chosen_doc,
               score_ppm AS chosen_score
        FROM ranked WHERE rk_top = 1 AND grp_n >= 2
    ), rejected AS (
        SELECT lang, source, doc_id AS rejected_doc,
               score_ppm AS rejected_score
        FROM ranked WHERE rk_bot = 1
    )
    SELECT c.lang, c.source,
           CAST(grp_n AS BIGINT) AS grp_n,
           c.chosen_doc, CAST(c.chosen_score AS BIGINT) AS chosen_score,
           r.rejected_doc, CAST(r.rejected_score AS BIGINT)
               AS rejected_score,
           CAST(c.chosen_score - r.rejected_score AS BIGINT) AS margin_ppm
    FROM chosen c JOIN rejected r
      ON c.lang = r.lang AND c.source = r.source
    WHERE c.chosen_score > r.rejected_score
    ORDER BY c.lang, c.source
    """,
)
def docs_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for reward-model / DPO training —
    the corpus-side step of an RLHF pipeline: treat each (lang,
    source) stratum as a prompt group, score every document with a
    deterministic integer quality proxy (word-density ppm; in
    production this column is the reward-model score), and emit one
    (chosen, rejected) pair per group — the argmax and argmin under a
    (score, doc_id) total order, with degenerate pairs (group size
    < 2 or zero margin) dropped.  Margins are exact score
    differences, so downstream margin-weighted losses are
    reproducible.

    Scale notes: scoring is scan-side expression work; both argmax
    and argmin come out of the SAME (lang, source)-keyed window
    shuffle (two row_numbers + the group count share one partition
    sort — the `win_running_distinct` chaining pattern), and the
    chosen⋈rejected join is group-grain (≤ |lang|×|source| rows).
    Nothing event-grain ever leaves its partition."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    scored = d.select(
        "lang",
        "source",
        "doc_id",
        F.expr(
            "(length(text) - length(replace(text, ' ', '')) + 1)"
            " * 1000000 div length(text)"
        ).alias("score_ppm"),
    )
    w_grp = Window.partitionBy("lang", "source")
    ranked = scored.select(
        "lang",
        "source",
        "doc_id",
        "score_ppm",
        F.row_number()
        .over(w_grp.orderBy(F.desc("score_ppm"), "doc_id"))
        .alias("rk_top"),
        F.row_number()
        .over(w_grp.orderBy(F.asc("score_ppm"), F.desc("doc_id")))
        .alias("rk_bot"),
        F.count(F.lit(1)).over(w_grp).alias("grp_n"),
    )
    chosen = ranked.where(
        (F.col("rk_top") == 1) & (F.col("grp_n") >= 2)
    ).select(
        "lang",
        "source",
        "grp_n",
        F.col("doc_id").alias("chosen_doc"),
        F.col("score_ppm").alias("chosen_score"),
    )
    rejected = ranked.where(F.col("rk_bot") == 1).select(
        "lang",
        "source",
        F.col("doc_id").alias("rejected_doc"),
        F.col("score_ppm").alias("rejected_score"),
    )
    return (
        chosen.join(rejected, ["lang", "source"])
        .where(F.col("chosen_score") > F.col("rejected_score"))
        .select(
            "lang",
            "source",
            F.col("grp_n").cast("long").alias("grp_n"),
            "chosen_doc",
            F.col("chosen_score").cast("long").alias("chosen_score"),
            "rejected_doc",
            F.col("rejected_score").cast("long").alias("rejected_score"),
            (F.col("chosen_score") - F.col("rejected_score"))
            .cast("long")
            .alias("margin_ppm"),
        )
        .orderBy("lang", "source")
    )
