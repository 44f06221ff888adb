"""Bloom pre-pass correctness (operators/bloom.py).

The sketch is only allowed to ACCELERATE — never to change an answer.
These tests pin the three load-bearing claims: no false negatives
(ever, by construction), bounded false positives (geometry holds), and
end-to-end exactness of every consumer (`bloom_anti_join`,
`data_quality_rules(use_bloom=True)`, `stream_dedup_corpus(use_bloom=True)`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_kafka_offset_spark.operators.bloom import (
    bloom_anti_join,
    build_bloom_bitmap,
    with_bloom_probe,
)
from spark_streaming_kafka_offset_spark.operators.maintenance import (
    data_quality_rules,
)
from spark_streaming_kafka_offset_spark.session import load_table
from spark_streaming_kafka_offset_spark.streaming.core import (
    stream_dedup_corpus,
)

from tests.conftest import SF_DIR


def test_bloom_no_false_negatives(spark):
    """Every build-side key must probe maybe_present=True — a single
    false negative would silently drop real matches from the exact
    join, corrupting results rather than just wasting work."""
    build = load_table(spark, SF_DIR, "customer").select("c_custkey")
    bitmap = build_bloom_bitmap(build, "c_custkey")
    probed = with_bloom_probe(build, "c_custkey", bitmap)
    assert probed.where(~F.col("maybe_present")).count() == 0


def test_bloom_fp_rate_bounded(spark):
    """Keys guaranteed absent (shifted far outside the build domain)
    should pass the filter only at the sketch's designed FP rate —
    generous 2% bound at default geometry and fixture cardinality."""
    build = load_table(spark, SF_DIR, "customer").select("c_custkey")
    bitmap = build_bloom_bitmap(build, "c_custkey")
    absent = spark.range(10_000_000, 10_010_000).select(
        F.col("id").alias("c_custkey")
    )
    probed = with_bloom_probe(absent, "c_custkey", bitmap)
    fp = probed.where(F.col("maybe_present")).count()
    assert fp / 10_000 < 0.02, f"FP rate {fp / 10_000} above bound"


def test_bloom_anti_join_equals_plain_anti_join(spark):
    """bloom_anti_join(probe, build) must return EXACTLY the plain
    LEFT ANTI rows — definite misses + FP-cleared survivors recompose
    the full orphan set with no loss and no double count."""
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    holdout = (
        load_table(spark, SF_DIR, "customer")
        .where(F.col("c_custkey") % 7 != 0)
        .select("c_custkey")
    )
    fast = bloom_anti_join(o, "o_custkey", holdout, "c_custkey")
    plain = o.join(holdout, o.o_custkey == holdout.c_custkey, "left_anti")
    assert fast.count() == plain.count()
    assert fast.exceptAll(plain).count() == 0
    assert plain.exceptAll(fast).count() == 0
    # The holdout (every 7th key) guarantees the definite-miss branch
    # actually carries rows on the fixtures — the pre-pass is exercised,
    # not vacuously bypassed.
    assert plain.count() > 0


def test_data_quality_rules_bloom_flag_is_pure_acceleration(spark):
    base = data_quality_rules(spark, SF_DIR).orderBy("rule").collect()
    accel = (
        data_quality_rules(spark, SF_DIR, use_bloom=True)
        .orderBy("rule")
        .collect()
    )
    assert base == accel


def test_stream_dedup_corpus_bloom_flag_is_pure_acceleration(spark):
    base = stream_dedup_corpus(spark, SF_DIR).collect()
    accel = stream_dedup_corpus(spark, SF_DIR, use_bloom=True).collect()
    assert base == accel
