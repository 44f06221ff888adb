"""Invariant tests for the §2.22 evaluation/compliance family.

Oracle parity (tests/test_parity.py) already proves engine equality;
these assert the MATHEMATICAL identities the oracle can't see — the
confusion-matrix partition of the corpus, the k-anonymity mass balance,
and the WoE/IV internal consistency — so a both-engines-wrong bug
(shared oracle mistake) cannot slip through.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QUERIES = entrymod.queries()


def test_confusion_rows_partition_corpus(spark):
    """At every threshold TP+FP+FN+TN must equal the corpus row count,
    TP+FN the positive total, and precision/recall stay within [0, 1e6]."""
    rows = QUERIES["eval_confusion_thresholds"](spark, SF_DIR).collect()
    assert rows, "threshold sweep produced no operating points"
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    total = events.count()
    pos = events.where("event_type = 'purchase'").count()
    for r in rows:
        assert r.tp + r.fp + r.fn + r.tn == total
        assert r.tp + r.fn == pos
        assert 0 <= r.precision_ppm <= 1_000_000
        assert 0 <= r.recall_ppm <= 1_000_000
        assert 0 <= r.f1_ppm <= 1_000_000
    # Monotonicity of the sweep: raising the threshold can only shrink
    # the predicted-positive set, so recall is non-increasing in decile.
    by_decile = sorted(rows, key=lambda r: r.decile)
    recalls = [r.recall_ppm for r in by_decile]
    assert recalls == sorted(recalls, reverse=True)


def test_k_anonymity_mass_balance(spark):
    """Per nation, band row counts must sum to the nation's customer
    count, and the at-risk share is constant across that nation's rows."""
    rows = QUERIES["privacy_k_anonymity"](spark, SF_DIR).collect()
    assert rows
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nation_counts = {
        r.c_nationkey: r.cnt
        for r in cust.groupBy("c_nationkey").count().withColumnRenamed(
            "count", "cnt"
        ).collect()
    }
    per_nation: dict[int, list] = {}
    for r in rows:
        per_nation.setdefault(r.c_nationkey, []).append(r)
    for nk, nrows in per_nation.items():
        assert sum(r.n_rows for r in nrows) == nation_counts[nk]
        assert len({r.nation_at_risk_ppm for r in nrows}) == 1
        for r in nrows:
            assert r.min_class >= 1
            assert 0 <= r.nation_at_risk_ppm <= 1_000_000


def test_woe_iv_internal_consistency(spark):
    """Bin counts must partition the orders table, good+bad = n per bin,
    and iv_total must equal the sum of per-bin contributions."""
    rows = QUERIES["feat_woe_iv"](spark, SF_DIR).collect()
    assert rows
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(r.n for r in rows) == orders
    for r in rows:
        assert r.good_n + r.bad_n == r.n
    totals = {r.iv_total for r in rows}
    assert totals == {sum(r.iv_contrib for r in rows)}


def test_reliability_bins_cover_corpus(spark):
    """Reliability bins must partition the events table and the bucket
    edges must be exact multiples of the fixed width."""
    rows = QUERIES["eval_score_reliability"](spark, SF_DIR).collect()
    assert rows
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r.n for r in rows) == events
    for r in rows:
        assert r.edge_cents == r.bucket * 5_000
        assert r.n_pos <= r.n
        assert 0 <= r.obs_ppm <= 1_000_000


def test_geo_family_integer_columns_exact(spark):
    """Grid cell and bbox flags must be consistent with the fixed-point
    coords, and the haversine distance bounded by half the great circle."""
    rows = QUERIES["fn_geo_haversine"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.cell_id == (r.lat_cdeg + 6000) // 100 * 1000 + (
            r.lon_cdeg + 18000
        ) // 100
        assert r.in_bbox == int(
            -1000 <= r.lat_cdeg <= 1000 and -2000 <= r.lon_cdeg <= 2000
        )
        assert 0 <= r.hav_ref_m <= 20_015_087  # half Earth circumference
        assert r.meridian_m == round(abs(r.lat_cdeg) * 1111.949266445587)
