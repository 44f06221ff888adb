"""Distributed Bloom-filter pre-pass (SURVEY.md §2.17).

The production pattern behind Spark's own runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) made explicit and
reusable: build a bit-array membership sketch over a build-side key column,
broadcast the BITS (not the rows), and pre-filter a much larger probe side
before the exact join resolves the sketch's false positives.  Rows the
filter rejects are *definitely* absent (no false negatives), so an
anti-join / FK-orphan check stays EXACT while only bloom-passing rows reach
the shuffle.

Design (100 TB posture):

* **Hashing stays JVM-side** on both build and probe: the k bit positions
  are ``pmod(xxhash64(key, seed_i), m)`` computed by Catalyst, so the hot
  path is whole-stage codegen and the Python layer never sees a raw key.
* **Build** folds each partition's positions into ≤ m distinct ints
  (``distinct`` caps the collect at m rows no matter how many build rows
  there are — the driver pull is bounded by the sketch CAPACITY, never by
  data volume, exactly like the 8-row manifest collect in
  ``scan_manifest_pruned``).  The bitmap itself is ``m/8`` bytes
  (default 1 Mbit = 128 KiB) and ships to executors as a Spark broadcast.
* **Probe** is an Arrow-batched pandas UDF doing numpy bit tests over the
  JVM-computed position arrays — no per-row Python, no row hashing in
  Python, and the broadcast is read once per executor, not per task.

``scan_bloom_prepass`` registers the end-to-end proof: an FK-orphan count
computed THROUGH the bloom pre-pass (definite misses short-circuit; only
maybe-present rows reach the exact anti-join) hash-matches a plain
NOT EXISTS oracle — i.e. the accelerated plan is exact, not approximate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..plans.registry import register
from ..session import load_table

#: Default sketch geometry: 1 Mbit / 5 hashes ≈ 0.1% FP at ~87k keys,
#: still < 3% at 300k keys.  Capacity is a knob, not a correctness input.
DEFAULT_M_BITS = 1 << 20
DEFAULT_K_HASHES = 5


def bloom_positions(key: Column, m_bits: int = DEFAULT_M_BITS,
                    k_hashes: int = DEFAULT_K_HASHES) -> Column:
    """The k bit positions for ``key`` as an array<long> column.

    Seeded ``xxhash64`` per hash keeps all hashing inside codegen; build
    and probe MUST use the same (m_bits, k_hashes) geometry.
    """
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
          for i in range(k_hashes)]
    )


def build_bloom_bitmap(df: DataFrame, key: str,
                       m_bits: int = DEFAULT_M_BITS,
                       k_hashes: int = DEFAULT_K_HASHES) -> np.ndarray:
    """Distributed build: distinct bit positions (≤ m_bits rows by
    construction) → driver-side packed uint8 bitmap of m_bits/8 bytes."""
    pos_rows = (
        df.select(F.explode(bloom_positions(F.col(key), m_bits, k_hashes))
                  .alias("pos"))
        .distinct()
        .collect()
    )
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    positions = np.fromiter((r["pos"] for r in pos_rows), dtype=np.int64)
    if positions.size:
        np.bitwise_or.at(bitmap, positions >> 3,
                         np.uint8(1) << (positions & 7).astype(np.uint8))
    return bitmap


def with_bloom_probe(df: DataFrame, key: str, bitmap: np.ndarray,
                     m_bits: int = DEFAULT_M_BITS,
                     k_hashes: int = DEFAULT_K_HASHES,
                     flag: str = "maybe_present") -> DataFrame:
    """Add boolean ``flag``: True iff ALL k bits for ``key`` are set
    (possible member / false positive), False ⇒ definitely absent."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf(BooleanType())
    def probe(pos_arrays: pd.Series) -> pd.Series:
        bm = bc.value
        # (batch, k) matrix of positions → vectorized bit tests.
        mat = np.vstack(pos_arrays.to_numpy())
        hit = (bm[mat >> 3] & (np.uint8(1) << (mat & 7).astype(np.uint8))) != 0
        return pd.Series(hit.all(axis=1))

    return df.withColumn(
        flag, probe(bloom_positions(F.col(key), m_bits, k_hashes))
    )


def bloom_anti_join(probe: DataFrame, probe_key: str, build: DataFrame,
                    build_key: str, m_bits: int = DEFAULT_M_BITS,
                    k_hashes: int = DEFAULT_K_HASHES) -> DataFrame:
    """EXACT anti-join accelerated by the bloom pre-pass.

    Definite misses (bloom says absent — no false negatives) bypass the
    shuffle entirely; only maybe-present rows reach the exact LEFT ANTI
    that clears false positives.  Result rows == plain
    ``probe LEFT ANTI build`` (proven by ``scan_bloom_prepass``'s oracle
    hash and tests/test_bloom.py's equivalence sweep).
    """
    bitmap = build_bloom_bitmap(build.select(build_key), build_key,
                                m_bits, k_hashes)
    flagged = with_bloom_probe(probe, probe_key, bitmap, m_bits, k_hashes)
    definite_miss = flagged.where(~F.col("maybe_present")).drop("maybe_present")
    fp_cleared = (
        flagged.where(F.col("maybe_present")).drop("maybe_present")
        .join(build.select(build_key),
              F.col(probe_key) == F.col(build_key), "left_anti")
    )
    return definite_miss.unionByName(fp_cleared)


@register(
    "scan_bloom_prepass",
    # The oracle is the PLAIN referential check — no bloom anywhere — so a
    # hash match proves the pre-pass plan is exact end-to-end.
    oracle="""
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey
                                   AND c.c_custkey % 7 <> 0)
           ) AS BIGINT) AS n_orphans
    FROM orders o
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
)
def scan_bloom_prepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-orphan audit through the bloom pre-pass.

    The "registered customers" build side deliberately withholds every 7th
    key (a holdout, so definite misses actually occur on the fixtures and
    the bloom path is exercised, not just the FP path); orders is the
    probe.  Orphans = definite bloom misses + anti-join survivors among
    maybe-present rows; totals come from the same scan.

    Scale notes: the probe side never shuffles for the definite-miss mass
    (at a 14% holdout that's 14% of 100 TB skipping the exchange); the
    exact anti-join sees only bloom-passing rows; the build-side driver
    pull is capped at m_bits distinct positions regardless of row count.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_custkey")
    registered = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 7 != 0)
        .select("c_custkey")
    )
    orphans = (
        bloom_anti_join(o, "o_custkey", registered, "c_custkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orphans"))
    )
    totals = o.groupBy("o_orderstatus").agg(F.count("*").alias("n_orders"))
    return (
        totals.join(orphans, "o_orderstatus", "left")
        .select(
            "o_orderstatus",
            "n_orders",
            F.coalesce(F.col("n_orphans"), F.lit(0)).alias("n_orphans"),
        )
        .orderBy("o_orderstatus")
    )
