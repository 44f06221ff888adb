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
