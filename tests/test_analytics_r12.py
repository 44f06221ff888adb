"""Semantic laws for the r12 batch (beyond oracle parity): Cliff's
delta, Mood's median, Ansari–Bradley, Durbin–Watson, Page's L.  Oracle
hashes prove cross-engine equality; these prove the estimators MEAN
what they claim — planted dominance pins δ = ±1 with the dominated
count exactly 0, a planted median shift rejects Mood's chi-square, a
wide-spread group drives Ansari–Bradley negative with a hand-computed
exact AB sum, a ±h alternation pins the closed-form DW = 4(m−1)/m,
and a perfectly ordered grid pins Page's L·2 at its algebraic maximum
— each beside its honest null on the iid fixture (the law class
oracle parity cannot see — a both-sides scaling bug keeps parity
green, VERDICT r10 #8).
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import pyarrow.parquet as pq

from spark_streaming_kafka_offset_spark.plans.registry import QUERIES
from tests.conftest import SF_DIR

_EVENTS_SCHEMA = pq.read_schema(f"{SF_DIR}/events.parquet")
_LINEITEM_SCHEMA = pq.read_schema(f"{SF_DIR}/lineitem.parquet")


def _write_events(tmp_path, rows):
    pq.write_table(
        pa.Table.from_pylist(rows, schema=_EVENTS_SCHEMA),
        str(tmp_path / "events.parquet"),
    )


def _mk_rows(counts_by_type):
    rows, eid = [], 0
    base = _dt.datetime(2024, 1, 1)
    for et, counts in counts_by_type.items():
        for day, c in enumerate(counts):
            for i in range(c):
                rows.append(
                    {
                        "event_id": eid,
                        "ts": base + _dt.timedelta(days=day, seconds=i),
                        "user_id": eid % 97,
                        "event_type": et,
                        "value": 1.0,
                        "props": "{}",
                    }
                )
                eid += 1
    return rows


def _write_lineitem_dq(tmp_path, rows_dq):
    """rows_dq: list of (discount_pct, quantity) -> one lineitem each."""
    rows = []
    for i, (d, q) in enumerate(rows_dq):
        rows.append(
            {
                "l_orderkey": i,
                "l_partkey": i,
                "l_suppkey": 1,
                "l_linenumber": 0,
                "l_quantity": float(q),
                "l_extendedprice": 100.0,
                "l_discount": d / 100.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": _dt.datetime(2024, 1, 1),
            }
        )
    pq.write_table(
        pa.Table.from_pylist(rows, schema=_LINEITEM_SCHEMA),
        str(tmp_path / "lineitem.parquet"),
    )


def test_cliffs_delta_null_poles_and_auc_identity(spark, tmp_path):
    """Fixture quantity ⊥ discount: |δ| small.  Full separation pins
    δ = ±1 with the dominated count EXACTLY 0; identical group
    multisets pin n_gt == n_lt and δ = 0; and δ must equal the Python
    replica's 2·AUC − 1 on a mixed construction."""
    r = QUERIES["agg_cliffs_delta"](spark, SF_DIR).collect()[0]
    assert abs(r.cliffs_delta) < 0.1
    assert r.n_gt + r.n_lt + r.n_tie == r.n_a * r.n_b

    # full separation: A (disc 0) all 10, B (disc 9) all 40 -> B wins
    _write_lineitem_dq(
        tmp_path, [(0, 10)] * 6 + [(9, 40)] * 4
    )
    lo = QUERIES["agg_cliffs_delta"](spark, str(tmp_path)).collect()[0]
    assert (lo.n_gt, lo.n_lt, lo.cliffs_delta) == (0, 24, -1.0)
    _write_lineitem_dq(tmp_path, [(0, 40)] * 6 + [(9, 10)] * 4)
    hi = QUERIES["agg_cliffs_delta"](spark, str(tmp_path)).collect()[0]
    assert (hi.n_gt, hi.n_lt, hi.cliffs_delta) == (24, 0, 1.0)

    # identical multisets -> exact zero
    both = [(0, q) for q in (10, 20, 30)] * 4 + [
        (9, q) for q in (10, 20, 30)
    ] * 4
    _write_lineitem_dq(tmp_path, both)
    z = QUERIES["agg_cliffs_delta"](spark, str(tmp_path)).collect()[0]
    assert z.n_gt == z.n_lt and z.cliffs_delta == 0.0

    # AUC identity on a mixed construction
    a_vals, b_vals = [10, 20, 20, 35], [15, 20, 30]
    _write_lineitem_dq(
        tmp_path,
        [(0, q) for q in a_vals] + [(9, q) for q in b_vals],
    )
    m = QUERIES["agg_cliffs_delta"](spark, str(tmp_path)).collect()[0]
    gt = sum(1 for x in a_vals for y in b_vals if x > y)
    lt = sum(1 for x in a_vals for y in b_vals if x < y)
    assert (m.n_gt, m.n_lt) == (gt, lt)
    auc = (gt + 0.5 * (len(a_vals) * len(b_vals) - gt - lt)) / (
        len(a_vals) * len(b_vals)
    )
    assert abs(m.cliffs_delta - (2 * auc - 1)) < 1e-6


def test_mood_median_null_shift_and_exact_zero(spark, tmp_path):
    """Fixture: chi2 below the χ²(10) rejection region.  A planted
    median shift on one group rejects; identical group multisets give
    a perfectly balanced k×2 table and chi2 == 0.0 EXACTLY (every
    deviation integer is 0 before the e6 floor)."""
    rows = QUERIES["agg_mood_median"](spark, SF_DIR).collect()
    assert len(rows) == 11
    chi = rows[0].chi2_stat
    assert all(r.chi2_stat == chi for r in rows)
    assert 0 <= chi < 25, chi
    assert rows[0].df == 10

    # identical multisets, median-tie-free: every group m x {10, 40}
    m = 6
    rows_dq = [
        (d, q) for d in range(3) for q in (10, 40) for _ in range(m)
    ]
    _write_lineitem_dq(tmp_path, rows_dq)
    out = QUERIES["agg_mood_median"](spark, str(tmp_path)).collect()
    assert all(r.n_above == m and r.n_below == m for r in out)
    assert all(r.chi2_stat == 0.0 for r in out)
    assert out[0].grand_median_x2 == 10 + 40

    # planted location shift: group 0 sits wholly above the grand median
    shifted = [(0, 45)] * 12 + [
        (d, q) for d in (1, 2) for q in (10, 20) for _ in range(6)
    ]
    _write_lineitem_dq(tmp_path, shifted)
    out = QUERIES["agg_mood_median"](spark, str(tmp_path)).collect()
    by_g = {r.disc_pct: r for r in out}
    assert by_g[0].n_above == 12 and by_g[0].n_below == 0
    assert out[0].chi2_stat > 9.21, out[0].chi2_stat  # χ²(2) at 1%


def test_ansari_bradley_exact_zero_and_spread_rejection(spark, tmp_path):
    """Identical group multisets force AB2·N == n1·T1 → z == 0.0
    EXACTLY.  The two-ends-vs-middle construction (A at {1, 50}, B at
    {25}) pins the hand-computed minimal AB sum exactly and rejects
    with z << -1.96 (wider-spread group collects the small
    end-scores)."""
    r = QUERIES["agg_ansari_bradley"](spark, SF_DIR).collect()[0]
    assert abs(r.z_stat) < 3.0  # iid fixture: no scale effect

    both = [(0, q) for q in (10, 20, 30)] * 4 + [
        (9, q) for q in (10, 20, 30)
    ] * 4
    _write_lineitem_dq(tmp_path, both)
    z0 = QUERIES["agg_ansari_bradley"](spark, str(tmp_path)).collect()[0]
    assert z0.z_stat == 0.0

    # A = m x {1} + m x {50} (extremes), B = 2m x {25} (middle)
    m = 8
    ends = (
        [(0, 1)] * m + [(0, 50)] * m + [(9, 25)] * (2 * m)
    )
    _write_lineitem_dq(tmp_path, ends)
    out = QUERIES["agg_ansari_bradley"](spark, str(tmp_path)).collect()[0]
    n = 4 * m
    # hand computation: value cells (1: m), (25: 2m), (50: m)
    # mid2(1) = m+1; mid2(25) = 2m + 2m + 1 = 4m+1 -> wait: 2*c_before+cnt+1
    # c_before(1)=0 -> mid2 = 0 + m + 1 = m+1; s2 = min(m+1, 2(n+1)-(m+1))
    s2_1 = min(m + 1, 2 * (n + 1) - (m + 1))
    mid2_25 = 2 * m + 2 * m + 1
    s2_25 = min(mid2_25, 2 * (n + 1) - mid2_25)
    mid2_50 = 2 * (3 * m) + m + 1
    s2_50 = min(mid2_50, 2 * (n + 1) - mid2_50)
    assert out.ab_sum_x2 == m * s2_1 + m * s2_50
    assert s2_1 < s2_25 and s2_50 < s2_25  # ends score low
    assert out.z_stat < -1.96, out.z_stat


def test_durbin_watson_poles_null_and_constant_null(spark, tmp_path):
    """±h alternation pins the closed-form DW = 4(m−1)/m exactly; a
    two-level step series drives DW toward 0; the iid fixture sits
    near 2; a constant series yields NULL (zero variance)."""
    rows = QUERIES["agg_durbin_watson"](spark, SF_DIR).collect()
    assert rows and all(1.0 < r.dw_stat < 3.0 for r in rows)

    m = 20
    alt = {"alt": [10 if t % 2 == 0 else 20 for t in range(m)]}
    _write_events(tmp_path, _mk_rows(alt))
    out = QUERIES["agg_durbin_watson"](spark, str(tmp_path)).collect()[0]
    # r_t = n(c_t - 15) = ±5n; num = n²·100·(m−1); den = 25n²·m
    assert out.n_days == m
    assert out.dw_stat == round(4 * (m - 1) / m, 4)

    step = {"step": [10] * (m // 2) + [20] * (m // 2)}
    _write_events(tmp_path, _mk_rows(step))
    out = QUERIES["agg_durbin_watson"](spark, str(tmp_path)).collect()[0]
    assert out.dw_stat == round(4 / m, 4)  # one step: num = n²·100

    const = {"const": [7] * m}
    _write_events(tmp_path, _mk_rows(const))
    out = QUERIES["agg_durbin_watson"](spark, str(tmp_path)).collect()[0]
    assert out.dw_stat is None


def test_page_trend_rotation_zero_and_ordered_maximum(spark, tmp_path):
    """Latin rotation (every type holds every within-block rank equally
    often) equalizes rank sums → 2·L2 == E4 → z == 0.0 EXACTLY.  A
    perfectly ordered tie-free grid (alphabetical order == volume
    order) pins L·2 at its algebraic maximum n·k(k+1)(2k+1)/3 and
    rejects with z >> 1.96."""
    rows = QUERIES["agg_page_trend"](spark, SF_DIR).collect()
    assert len(rows) == 5
    assert abs(rows[0].z_stat) < 3.0  # iid fixture: no planted order

    k, n = 5, 20
    types = [f"t{i}" for i in range(k)]
    rot = {
        t: [10 + ((i + d) % k) + 1 for d in range(n)]
        for i, t in enumerate(types)
    }
    _write_events(tmp_path, _mk_rows(rot))
    out = QUERIES["agg_page_trend"](spark, str(tmp_path)).collect()
    assert len({r.rank_sum_x2 for r in out}) == 1
    assert all(r.z_stat == 0.0 for r in out)

    ordered = {
        t: [10 * (i + 1) + d % 3 for d in range(n)]
        for i, t in enumerate(types)
    }
    _write_events(tmp_path, _mk_rows(ordered))
    out = QUERIES["agg_page_trend"](spark, str(tmp_path)).collect()
    assert out[0].l_x2 == n * k * (k + 1) * (2 * k + 1) // 3
    assert all(r.z_stat > 1.96 for r in out)
    # and rank sums must ascend with the alphabetical j order
    by_j = sorted(out, key=lambda r: r.j_order)
    sums = [r.rank_sum_x2 for r in by_j]
    assert sums == sorted(sums)
