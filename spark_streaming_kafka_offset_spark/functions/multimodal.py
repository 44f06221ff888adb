"""§2.10 ``multimodal_cols`` — binary media payloads as first-class
columns [N] (SURVEY.md; mandate: BASELINE.json:6).

Design: media are opaque ``binary`` cells with a typed metadata struct
beside them.  Relational ops (project/filter/join/partition) touch ONLY
metadata; payload bytes stay unopened end-to-end — Tungsten never
deserializes what no expression references, so a metadata-only query over
a 100 TB image table moves hashes and dimensions, not pixels.

Decode/feature-extract runs in ``mapInPandas`` (Arrow-batched).  The
actual image/audio codecs are NOT in this container, so the decode step
is a deterministic stub behind the real plumbing (schema, batching,
partition behavior) — swap ``_decode_stub`` for PIL/ffmpeg in production.
The fixture has no binary table, so payloads are synthesized from
``documents.text`` bytes; everything downstream treats them as opaque.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..common import stage
from ..plans.registry import register
from ..session import load_table

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, n_bytes:int, sha string>"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table: payload = utf-8 bytes of the doc text
    (opaque stand-in), metadata derived scan-side with built-ins."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        payload.alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
            F.length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha"),
        ).alias("meta"),
    )


def _decode_stub(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for a real decoder (PIL/ffmpeg not in this
    container — SURVEY.md §0).  Real shape: per Arrow batch, decode
    payload bytes → features.  Stub feature: (n_bytes, first_byte,
    byte_sum % 997) — computed from the same bytes a decoder would read,
    so the batching/schema plumbing is exercised honestly."""
    for pdf in pdf_iter:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(len),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                "feature": payloads.map(lambda b: sum(b) % 997),
            }
        )


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the payload column."""
    return media.mapInPandas(
        _decode_stub,
        "doc_id long, media_type string, n_bytes int, first_byte int, feature int",
    )


def _resize_stub(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for an image resize (PIL not in container).
    Real shape: decode → thumbnail to fit 128×128 preserving aspect →
    re-encode.  Stub keeps the honest parts — aspect-preserving target
    dims from metadata, payload shrunk by byte-stride subsampling — so
    schema/batching match what a real resizer produces."""
    for pdf in pdf_iter:
        w, h = pdf["width"], pdf["height"]
        scale = (128.0 / pd.concat([w, h], axis=1).max(axis=1)).clip(upper=1.0)
        stride = (1.0 / (scale * scale)).round().astype(int).clip(lower=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "out_w": (w * scale).astype(int).clip(lower=1),
                "out_h": (h * scale).astype(int).clip(lower=1),
                "thumb": [
                    bytes(p[::s]) for p, s in zip(pdf["payload"], stride)
                ],
            }
        )


def resize_images(media: DataFrame, max_side: int = 128) -> DataFrame:
    """Arrow-batched resize over image rows (metadata + payload in, new
    dims + thumbnail bytes out)."""
    flat = media.select(
        "doc_id", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"), "payload",
    )
    return flat.mapInPandas(
        _resize_stub, "doc_id long, out_w int, out_h int, thumb binary"
    )


_FRAME_BYTES = 64  #: stub frame size; real decoder yields actual frames


def _frame_sample_stub(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for video frame sampling (ffmpeg not in
    container).  Treats the payload as a stream of fixed-size frames and
    emits every 4th one — an EXPLODING map (rows out > rows in), the
    shape a real frame sampler has.  Frame content is fingerprinted, not
    carried, so downstream joins move 8 bytes per frame."""
    import hashlib

    for pdf in pdf_iter:
        ids, idxs, fps = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = max(len(payload) // _FRAME_BYTES, 1)
            for i in range(0, n_frames, 4):
                chunk = bytes(payload[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES])
                ids.append(doc_id)
                idxs.append(i)
                fps.append(
                    int.from_bytes(hashlib.sha256(chunk).digest()[:8], "big") >> 1
                )
        yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_fp": fps})


def sample_frames(media: DataFrame) -> DataFrame:
    """Arrow-batched 1-in-4 frame sampling over video payloads."""
    return media.select("doc_id", "payload").mapInPandas(
        _frame_sample_stub, "doc_id long, frame_idx int, frame_fp long"
    )


@register(
    "multimodal_meta",
    # The media table is synthesized deterministically from documents
    # (payload = utf-8 text bytes, dims from doc_id arithmetic), so a
    # metadata-only media query has an exact DuckDB twin over documents.
    # This is the oracle row for the multimodal family: it proves the
    # metadata path (the ONLY relational path — payload bytes stay
    # unopened) computes the same sizes/dims/content-hashes both engines.
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MIN(doc_id % 640 + 64) AS INTEGER) AS min_w,
           CAST(MAX(doc_id % 480 + 48) AS INTEGER) AS max_h,
           CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS n_unique
    FROM documents
    WHERE octet_length(encode(text)) > 100
    GROUP BY 1
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media analytics: per-type doc counts, byte totals,
    dimension ranges, and distinct content hashes — without ever
    referencing the payload column.

    At 100 TB this plan moves a few dozen bytes per row (type string,
    int dims, 32-byte sha) through one partial+final aggregate; Tungsten
    never materializes the binary cells because no expression touches
    them — the core contract of the multimodal column design."""
    media = media_table(spark, sf_dir)
    return (
        media.where(F.col("meta.n_bytes") > 100)
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("meta.n_bytes")).cast("bigint").alias("total_bytes"),
            F.min("meta.width").alias("min_w"),
            F.max("meta.height").alias("max_h"),
            F.countDistinct("meta.sha").alias("n_unique"),
        )
        .orderBy("media_type")
    )


@register("multimodal_transform")
def multimodal_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize the images, frame-sample the videos — the two canonical
    payload-touching media ops — then reduce each to per-type stats.

    Both branches filter on metadata BEFORE any Pandas UDF opens bytes
    (predicate first, decode second — the only viable order at 100 TB),
    and each runs in its own ``mapInPandas`` so Arrow batches carry only
    the columns that branch needs."""
    media = media_table(spark, sf_dir)
    thumbs = resize_images(media.where(F.col("media_type") == "image"))
    frames = sample_frames(media.where(F.col("media_type") == "video"))
    t = thumbs.agg(
        F.lit("image_resize").alias("op"),
        F.count("*").alias("n_rows"),
        F.sum(F.length("thumb")).alias("total_bytes"),
        F.max("out_w").alias("max_dim"),
    )
    fr = frames.agg(
        F.lit("video_frames").alias("op"),
        F.count("*").alias("n_rows"),
        F.sum(F.lit(8)).cast("long").alias("total_bytes"),
        F.max("frame_idx").alias("max_dim"),
    )
    return t.unionByName(fr).orderBy("op")


@register("multimodal_cols")
def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carry binary payloads through project/filter/join untouched, then
    decode only the filtered survivors.

    The metadata-only phase (filter on meta.n_bytes, join media_type
    against a tiny dim) never references ``payload``; only the final
    mapInPandas opens the bytes — and by then the filter has already cut
    the rows, which is exactly the ordering you need at 100 TB."""
    media = media_table(spark, sf_dir)
    type_dim = F.broadcast(
        spark.createDataFrame(
            [("image", "px"), ("audio", "samples"), ("video", "frames")],
            "media_type string, unit string",
        )
    )
    selected = (
        media.where(F.col("meta.n_bytes") > 200)
        .join(type_dim, "media_type")
        .where(F.col("media_type") != "video")
    )
    feats = decode_features(selected.select("doc_id", "media_type", "payload"))
    return (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("feature"), 4).alias("avg_feature"),
        )
        .orderBy("media_type")
    )


def _phash_oracle() -> str:
    """Codegen the 60-bit sign-sum signature on the oracle side from the
    same md5-derived bits the engine uses, so both engines build the
    signature from identical integer arithmetic."""
    sums = ",\n             ".join(
        f"SUM(CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(60)
    )
    sig = " + ".join(
        f"((CASE WHEN b{j} > 0 THEN CAST(1 AS BIGINT) ELSE 0 END) << {j})"
        for j in range(60)
    )
    return f"""
    WITH g AS (
      SELECT md5(text) AS th, MIN(doc_id) AS rep_id,
             COUNT(*) AS g_n, MIN(len(text)) AS g_len
      FROM documents GROUP BY 1
    ), reps AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN g ON d.doc_id = g.rep_id
    ), grams AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(text) - 2),
                           i -> substr(text, i, 4))) AS gs
      FROM reps WHERE len(text) >= 4
    ), ex AS (
      SELECT doc_id, unnest(gs) AS g FROM grams
    ), hx AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS h
      FROM ex
    ), bits AS (
      SELECT doc_id,
             {sums}
      FROM hx GROUP BY doc_id
    ), sig AS (
      SELECT doc_id, {sig} AS sig FROM bits
    ), bands AS (
      SELECT doc_id, b, (sig >> (15 * b)) & 32767 AS bv
      FROM sig, (VALUES (0), (1), (2), (3)) t(b)
    ), cand AS (
      SELECT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands x JOIN bands y
        ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT c.id_a, c.id_b,
             CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
      FROM cand c
      JOIN sig sa ON c.id_a = sa.doc_id
      JOIN sig sb ON c.id_b = sb.doc_id
      WHERE bit_count(xor(sa.sig, sb.sig)) <= 3
    )
    SELECT p.id_a, p.id_b, p.hamming,
           CAST(ga.g_n * gb.g_n AS BIGINT) AS n_member_pairs
    FROM pairs p
    JOIN g ga ON p.id_a = ga.rep_id
    JOIN g gb ON p.id_b = gb.rep_id
    UNION ALL
    SELECT rep_id AS id_a, rep_id AS id_b, CAST(0 AS BIGINT) AS hamming,
           CAST(g_n * (g_n - 1) // 2 AS BIGINT) AS n_member_pairs
    FROM g WHERE g_n >= 2 AND g_len >= 4
    ORDER BY id_a, id_b
    """


@register("multimodal_dedup_phash", oracle=_phash_oracle())
def multimodal_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs over BINARY media payloads: a
    60-bit locality-sensitive signature (SimHash sign-sums over byte
    4-grams), 4×15-bit band buckets, exact Hamming ≤ 3 verify — the
    image-dedup pipeline shape (pHash/aHash + Hamming ball) with the
    codec stage stubbed per §2.10 policy: a real pHash swaps the
    byte-gram features for DCT coefficients, every stage downstream of
    the feature vector (sign-sum, banding, candidate join, verify) is
    the production pipeline unchanged.

    This is the multimodal family's first ORACLE-backed near-dup: the
    md5-derived feature bits are deterministic integer arithmetic in
    both engines (cf. `dedup_minhash_md5`'s trick), so the hash match
    proves signature → band → candidate → Hamming-verify end to end.
    `dedup_simhash` (xxhash64, rows-only) stays the cheap production
    variant.  Payload bytes are sliced engine-side with binary
    ``substr`` — the oracle mirrors on text because payload :=
    utf-8(text) and the fixture is pure ASCII (verified: 500/500 docs),
    so byte slices == char slices.

    Scale notes: one explode+agg pass builds signatures (60 decomposable
    sign-sums); by pigeonhole any pair at Hamming ≤ 3 collides on ≥ 1 of
    the 4 bands, so recall at the stated radius is GUARANTEED and the
    self-join is band-bucketed, never all-pairs; verify touches
    candidate pairs only.  Signatures are 8 B/doc — corpus-sized, never
    broadcast (same policy as dedup_simhash).

    Exact-collapse form (r11 — VERDICT r10 #3 killed the raw-pair shape):
    identical payloads form quadratic Hamming-0 cliques, and the sf10
    probe measured 585.7 s / 26.6M output pairs (109× output for 10×
    data) — the OUTPUT is the 100 TB killer, same as `dedup_minhash`.
    Recipe (the `corpus_dedup_survivorship` collapse): md5-group the
    payload bytes, elect the min-doc_id representative, run the
    signature → band → verify pipeline over REPRESENTATIVES only, and
    emit multiplicity algebra — a rep pair carries
    ``n_member_pairs = g_a·g_b`` (the signature is payload-determined,
    so Hamming distance is identical for every member pair), and each
    exact-dup group of g ≥ 2 members (payload ≥ 4 bytes — the gram
    floor) emits one Hamming-0 self row with C(g,2) pairs.
    Σ n_member_pairs reproduces the raw pair count exactly; the oracle
    mirrors the collapse end-to-end, so the hash match proves the
    grouping, representative election, and multiplicity join too."""
    # Amplification-aware repartition: the per-doc gram explode fans
    # 5k docs into ~880k feature rows at sf0.1, but the small source
    # parquet reads as ONE split, so without this the whole
    # explode+md5+sign-sum stage ran in one task (B-set bench: the
    # signature build alone was 3.6 s single-task; ~0.5 s spread).  At
    # 100 TB the scan has many splits anyway, but row-count-based
    # splits are still wrong when the EXPLODED size is the work unit —
    # spreading by doc_id keeps the later groupBy(doc_id) co-partitioned
    # (no second exchange).
    media = media_table(spark, sf_dir)
    dd = media.select(
        "doc_id",
        "payload",
        # 128-bit group key over the raw payload bytes (the
        # corpus_dedup_survivorship collapse rationale, ADVICE r9): a
        # 64-bit collision would silently merge two distinct payloads.
        F.md5("payload").alias("th"),
        F.length("payload").alias("n_len"),
    )
    # Single-pass collapse (r14, the dedup_minhash recipe): carry the
    # representative's payload in the min_by buffer instead of electing
    # rep_id and joining back — the r12 shape scanned+md5'd the media a
    # second time and shuffled every payload byte through a th-keyed
    # join just to recover survivors.  min_by's map-side partial keeps
    # ONE payload per group per task, so exact replicas collapse before
    # the exchange.  Staged: the group table feeds FOUR consumers (the
    # signature pipeline and ga/gb/self_rows multiplicity algebra).
    groups = stage(
        dd.groupBy("th").agg(
            F.min_by(F.struct("doc_id", "payload"), "doc_id").alias("keep"),
            F.count(F.lit(1)).alias("g_n"),
            F.first("n_len").alias("g_len"),
        )
        .select(
            F.col("keep.doc_id").alias("rep_id"),
            F.col("keep.payload").alias("payload"),
            "g_n",
            "g_len",
        )
    )
    m = (
        groups.select(F.col("rep_id").alias("doc_id"), "payload")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    n = F.length("payload")
    grams = m.where(n >= 4).select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 3),
                lambda i: F.col("payload").substr(i, F.lit(4)),
            )
        ).alias("gs"),
    )
    ex = grams.select("doc_id", F.explode("gs").alias("g"))
    h = F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long")
    # Branch-free sign-sum: sum over grams of ±1 for bit j equals
    # 2·cnt_j − n (cnt_j = grams with bit j set), so the sign test
    # b_j > 0 is 2·cnt_j > n — shift/and/sum expressions with no
    # per-gram conditional (measured vs the when(±1) form on the B-set).
    # Lane-packed (r15, VERDICT r14 #5): bits j and j+30 share one
    # 64-bit sum — bit j in the low 32 bits, bit j+30 shifted to bit 32
    # — halving the aggregation buffers (60 → 30 sums + count).  This
    # packing is OVERFLOW-SAFE by construction, unlike the r14-rejected
    # 16-bit SWAR (silent overflow past 65,535 grams): each 32-bit lane
    # accumulates ≤ n_g, and n_g is the length of a per-doc gram ARRAY,
    # which the JVM caps below 2^31 — so the low lane can never carry
    # into the high lane and the long total stays < 2^63.  Unpacking is
    # exact integer algebra (mask / shift), so the md5-derived sig bits
    # are bit-identical to the 60-sum form (verified on all 5,000
    # sf0.1 reps).  Wall at fixture scale: ~3-5%, at the edge of noise
    # — kept on the halved-buffer structural ground.
    bits = ex.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
        F.count("*").alias("n_g"),
        *[
            F.sum(
                F.shiftright("h", p).bitwiseAND(1)
                + F.shiftleft(F.shiftright("h", p + 30).bitwiseAND(1), 32)
            ).alias(f"s{p}")
            for p in range(30)
        ],
    )
    sig_expr = None
    for j in range(60):
        p = j % 30
        cnt = (
            F.col(f"s{p}").bitwiseAND((1 << 32) - 1)
            if j < 30
            else F.shiftright(F.col(f"s{p}"), 32)
        )
        term = F.shiftleft(
            F.when(2 * cnt > F.col("n_g"), 1).otherwise(0).cast("long"),
            j,
        )
        sig_expr = term if sig_expr is None else sig_expr + term
    # stage(): the signature table feeds FOUR consumers (both sides of
    # the band self-join and both verify lookups); without it Catalyst
    # inlines the explode+md5+60-sign-sum subtree into every consumer —
    # the B-set bench surfaced the recompute at 7.1 s wall at sf0.1.
    # Same posture as dedup_minhash's shingle stage.
    sig = stage(bits.select("doc_id", sig_expr.alias("sig")))
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sig", 15 * b).bitwiseAND(0x7FFF)
                    for b in range(4)
                ]
            )
        ).alias("b", "bv"),
    )
    left = bands.select(F.col("doc_id").alias("id_a"), "b", "bv")
    right = bands.select(F.col("doc_id").alias("id_b"), "b", "bv")
    cand = (
        left.join(right, ["b", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sa"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sb"))
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    ga = groups.select(F.col("rep_id").alias("id_a"), F.col("g_n").alias("g_a"))
    gb = groups.select(F.col("rep_id").alias("id_b"), F.col("g_n").alias("g_b"))
    rep_pairs = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", hamming.cast("long").alias("hamming"))
        .where(F.col("hamming") <= 3)
        .join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            "hamming",
            (F.col("g_a") * F.col("g_b")).cast("long").alias("n_member_pairs"),
        )
    )
    # Identical payloads are Hamming-0 by definition; payloads under the
    # 4-byte gram floor have no signature (excluded in the raw form too).
    self_rows = groups.where((F.col("g_n") >= 2) & (F.col("g_len") >= 4)).select(
        F.col("rep_id").alias("id_a"),
        F.col("rep_id").alias("id_b"),
        F.lit(0).cast("long").alias("hamming"),
        F.expr("CAST(g_n * (g_n - 1) div 2 AS BIGINT)").alias("n_member_pairs"),
    )
    return rep_pairs.unionByName(self_rows).orderBy("id_a", "id_b")
