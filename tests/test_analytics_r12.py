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
    # mid2 = 2*c_before + cnt + 1; s2 = min(mid2, 2(n+1) - mid2)
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


_DOCS_SCHEMA = pq.read_schema(f"{SF_DIR}/documents.parquet")


def _write_docs(tmp_path, rows):
    pq.write_table(
        pa.Table.from_pylist(rows, schema=_DOCS_SCHEMA),
        str(tmp_path / "documents.parquet"),
    )


def test_ece_perfect_calibration_and_anti_pole(spark, tmp_path):
    """A construction whose per-bin outcome rate equals the bin
    midpoint exactly pins ECE == 0.0 and gap_ppm == 0 in EVERY bin
    (2b+1 positives of 20 docs in bin b: (2b+1)/20 == (b+0.5)/10).
    The anti-calibrated pole (bin 9, zero positives) pins gap_ppm ==
    conf_ppm == 950000 and ECE == 0.95.  The fixture itself must be
    honestly miscalibrated (ECE visibly > 0)."""
    base = QUERIES["eval_ece"](spark, SF_DIR).collect()
    assert base[0].ece > 0.05  # length is not a probability model

    rows, did = [], 0
    for b in range(10):
        n_chars = 50 + 50 * b + 10  # lands strictly inside bin b
        for i in range(20):
            pos = i < 2 * b + 1
            body = "a the " if pos else "axthex"
            text = body + "x" * (n_chars - len(body))
            rows.append(
                {
                    "doc_id": did,
                    "text": text,
                    "lang": "en",
                    "source": "cal",
                    "n_chars": n_chars,
                }
            )
            did += 1
    _write_docs(tmp_path, rows)
    out = QUERIES["eval_ece"](spark, str(tmp_path)).collect()
    assert len(out) == 10
    assert all(r.gap_ppm == 0 for r in out), out
    assert out[0].ece == 0.0 and out[0].mce_ppm == 0

    anti = [
        {
            "doc_id": i,
            "text": "x" * 510,
            "lang": "en",
            "source": "cal",
            "n_chars": 510,  # bin 9, conf 950000 ppm, outcome 0
        }
        for i in range(20)
    ]
    _write_docs(tmp_path, anti)
    out = QUERIES["eval_ece"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert (out[0].conf_ppm, out[0].acc_ppm, out[0].gap_ppm) == (
        950000,
        0,
        950000,
    )
    assert out[0].ece == 0.95 and out[0].mce_ppm == 950000


_ORDERS_SCHEMA = None


def _write_lineitem_orders_ship(tmp_path, lines):
    """lines: (orderkey, partkey, qty, orderdate, shipdate) rows; writes
    lineitem + orders + a 1-brand part dim."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    li, seen_parts, orders = [], set(), {}
    for i, (ok, pk, q, od, sd) in enumerate(lines):
        li.append(
            {
                "l_orderkey": ok,
                "l_partkey": pk,
                "l_suppkey": 1,
                "l_linenumber": i,
                "l_quantity": float(q),
                "l_extendedprice": 100.0,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": sd,
            }
        )
        seen_parts.add(pk)
        orders[ok] = od
    pq.write_table(
        pa.Table.from_pylist(li, schema=_LINEITEM_SCHEMA),
        str(tmp_path / "lineitem.parquet"),
    )
    oschema = pq.read_schema(f"{SF_DIR}/orders.parquet")
    ocols = {f.name for f in oschema}
    orows = []
    for ok, od in orders.items():
        row = {
            "o_orderkey": ok,
            "o_custkey": 1,
            "o_orderstatus": "O",
            "o_totalprice": 100.0,
            "o_orderdate": od,
            "o_orderpriority": "1-URGENT",
            "o_shippriority": 0,
        }
        orows.append({k: v for k, v in row.items() if k in ocols})
    pq.write_table(
        pa.Table.from_pylist(orows, schema=oschema),
        str(tmp_path / "orders.parquet"),
    )
    pschema = pq.read_schema(f"{SF_DIR}/part.parquet")
    pcols = {f.name for f in pschema}
    prows = []
    for pk in sorted(seen_parts):
        row = {
            "p_partkey": pk,
            "p_name": f"part{pk}",
            "p_brand": "Brand#1",
            "p_type": "t",
            "p_size": 1,
            "p_retailprice": 10.0,
            "p_mfgr": "m",
            "p_container": "BOX",
        }
        prows.append({k: v for k, v in row.items() if k in pcols})
    pq.write_table(
        pa.Table.from_pylist(prows, schema=pschema),
        str(tmp_path / "part.parquet"),
    )


def test_bullwhip_identity_and_batched_amplification(spark, tmp_path):
    """Shipping the day it was ordered makes both weekly series
    identical → ratio == 1.0 exactly.  Batching all shipping into
    every 4th week amplifies CV² → ratio well above 1."""
    base = _dt.datetime(2024, 1, 1)
    # 8 weeks of orders, one line/day, qty varies 10..16 by weekday
    lines = []
    for day in range(56):
        d = base + _dt.timedelta(days=day)
        lines.append((day, day % 5, 10 + day % 7, d, d))
    _write_lineitem_orders_ship(tmp_path, lines)
    out = QUERIES["orders_bullwhip_ratio"](spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].bullwhip_ratio == 1.0

    # same orders; shipping batched to the Monday of every 4th week
    batched = []
    for day in range(56):
        d = base + _dt.timedelta(days=day)
        ship = base + _dt.timedelta(days=(day // 28) * 28)
        batched.append((day, day % 5, 10 + day % 7, d, ship))
    _write_lineitem_orders_ship(tmp_path, batched)
    out = QUERIES["orders_bullwhip_ratio"](spark, str(tmp_path)).collect()
    # the zero-filled spine is what makes this measurable: two equal
    # spikes over observed-weeks-only would read as ZERO variance
    assert out[0].bullwhip_ratio > 1.5, out
    assert out[0].n_weeks >= 8  # spine spans the full 8-week horizon


def test_turning_points_poles_and_null(spark, tmp_path):
    """Monotone series: T = 0, z at its hand-computed negative pole;
    perfect alternation: T = n − 2 (every interior day an extremum);
    the iid fixture sits near the null."""
    import math

    rows = QUERIES["events_turning_points"](spark, SF_DIR).collect()
    # the fixture is NOT direction-neutral for every type: signup's
    # sf0.001 daily series shows genuine momentum (z ≈ -4.3, T = 9 of
    # E = 18.7) — an honest measurement, so only sanity-bound it
    assert rows and all(-6 < r.z_stat < 3.5 for r in rows)

    n = 18
    _write_events(tmp_path, _mk_rows({"mono": [10 + d for d in range(n)]}))
    out = QUERIES["events_turning_points"](spark, str(tmp_path)).collect()[0]
    z = (3 * 0 - 2 * (n - 2)) / (3 * math.sqrt((16 * n - 29) / 90))
    assert out.n_turning == 0 and out.z_stat == round(z, 4)

    _write_events(
        tmp_path,
        _mk_rows({"alt": [10 if d % 2 == 0 else 20 for d in range(n)]}),
    )
    out = QUERIES["events_turning_points"](spark, str(tmp_path)).collect()[0]
    z = (3 * (n - 2) - 2 * (n - 2)) / (3 * math.sqrt((16 * n - 29) / 90))
    assert out.n_turning == n - 2 and out.z_stat == round(z, 4)


def test_cohens_d_exact_zero_planted_shift_and_delta_coherence(
    spark, tmp_path
):
    """Identical group multisets pin d == 0.0 exactly; a planted shift
    matches the Python pooled-SD replica to the rounding grain and
    agrees in sign with Cliff's delta on the same fixture."""
    both = [(0, q) for q in (10, 20, 30)] * 4 + [
        (9, q) for q in (10, 20, 30)
    ] * 4
    _write_lineitem_dq(tmp_path, both)
    z0 = QUERIES["agg_cohens_d"](spark, str(tmp_path)).collect()[0]
    assert z0.cohens_d == 0.0

    a_vals = [10, 20] * 8
    b_vals = [20, 30] * 8
    _write_lineitem_dq(
        tmp_path,
        [(0, q) for q in a_vals] + [(9, q) for q in b_vals],
    )
    out = QUERIES["agg_cohens_d"](spark, str(tmp_path)).collect()[0]
    n1, n2 = len(a_vals), len(b_vals)
    m1 = sum(a_vals) / n1
    m2 = sum(b_vals) / n2
    ss1 = sum(x * x for x in a_vals) - n1 * m1 * m1
    ss2 = sum(x * x for x in b_vals) - n2 * m2 * m2
    import math

    d = (m1 - m2) / math.sqrt((ss1 + ss2) / (n1 + n2 - 2))
    assert abs(out.cohens_d - d) < 1e-4
    delta = QUERIES["agg_cliffs_delta"](spark, str(tmp_path)).collect()[0]
    assert (out.cohens_d < 0) == (delta.cliffs_delta < 0)


def test_quade_rotation_zero_and_consistent_rejection(spark, tmp_path):
    """Latin rotation on equal-range blocks: every type's weighted
    centered-rank sum is 0 → F == 0.0 exactly.  A consistent ordering
    across blocks rejects (F far above the F(4, 76) critical
    value)."""
    rows = QUERIES["agg_quade_test"](spark, SF_DIR).collect()
    assert len(rows) == 5 and rows[0].df1 == 4
    assert rows[0].f_stat is None or rows[0].f_stat < 4.0  # null fixture

    k, n = 5, 20
    types = [f"t{i}" for i in range(k)]
    rot = {
        t: [10 + ((i + d) % k) + 1 for d in range(n)]
        for i, t in enumerate(types)
    }
    _write_events(tmp_path, _mk_rows(rot))
    out = QUERIES["agg_quade_test"](spark, str(tmp_path)).collect()
    assert all(r.s_weighted_x4 == 0 for r in out)
    assert all(r.f_stat == 0.0 for r in out)

    consistent = {
        t: [10 * (i + 1) + d % 3 for d in range(n)]
        for i, t in enumerate(types)
    }
    _write_events(tmp_path, _mk_rows(consistent))
    out = QUERIES["agg_quade_test"](spark, str(tmp_path)).collect()
    assert all(r.f_stat is None or r.f_stat > 6.0 for r in out)
    assert out[0].df2 == (k - 1) * (n - 1)


def test_psi_identical_halves_zero_and_planted_drift(spark, tmp_path):
    """Mirrored halves (every even doc has an odd twin with the same
    length) pin PSI == 0.0 exactly — every smoothed ratio is ln 1.
    A planted length shift in the odd half lands past the 0.25
    textbook drift band."""
    base = QUERIES["corpus_psi_drift"](spark, SF_DIR).collect()
    assert len(base) == 10 or len(base) > 0
    assert abs(base[0].psi) < 0.1  # one distribution, honest null

    rows = []
    for i in range(60):
        n_chars = 60 + (i % 6) * 80
        text = "w" * n_chars
        for par in (0, 1):  # identical even/odd twins
            rows.append(
                {
                    "doc_id": 2 * i + par,
                    "text": text,
                    "lang": "en",
                    "source": "s",
                    "n_chars": n_chars,
                }
            )
    _write_docs(tmp_path, rows)
    out = QUERIES["corpus_psi_drift"](spark, str(tmp_path)).collect()
    assert all(r.n_even_half == r.n_odd_half for r in out)
    assert out[0].psi == 0.0

    drifted = []
    for i in range(60):
        even_chars, odd_chars = 80, 480  # short vs long halves
        drifted.append(
            {
                "doc_id": 2 * i,
                "text": "w" * even_chars,
                "lang": "en",
                "source": "s",
                "n_chars": even_chars,
            }
        )
        drifted.append(
            {
                "doc_id": 2 * i + 1,
                "text": "w" * odd_chars,
                "lang": "en",
                "source": "s",
                "n_chars": odd_chars,
            }
        )
    _write_docs(tmp_path, drifted)
    out = QUERIES["corpus_psi_drift"](spark, str(tmp_path)).collect()
    assert out[0].psi > 0.25, out[0].psi


def test_template_prefixes_planted_banners(spark, tmp_path):
    """Planted banner families recover exact counts, ppm shares, the
    deterministic (count DESC, prefix ASC) ranking, the <2-doc
    exclusion, and the top-5 cut."""
    banner_a = "COOKIE-BANNER-" + "A" * 18  # 32 chars
    banner_b = "COOKIE-BANNER-" + "B" * 18
    rows, did = [], 0

    def doc(text, source="s1"):
        nonlocal did
        rows.append(
            {
                "doc_id": did,
                "text": text,
                "lang": "en",
                "source": source,
                "n_chars": len(text),
            }
        )
        did += 1

    for i in range(6):
        doc(banner_a + f" body {i}")
    for i in range(3):
        doc(banner_b + f" body {i}")
    doc("unique doc with its own very specific opening line here")
    # a second source with 7 two-doc families -> top-5 cut applies
    for fam in range(7):
        pref = f"TEMPLATE-{fam:02d}-" + "x" * 20
        for i in range(2):
            doc(pref + f" tail {i}", source="s2")
    _write_docs(tmp_path, rows)
    out = QUERIES["text_template_prefixes"](spark, str(tmp_path)).collect()
    s1 = [r for r in out if r.source == "s1"]
    assert [(r.prefix[:14], r.n_docs) for r in s1] == [
        ("COOKIE-BANNER-", 6),
        ("COOKIE-BANNER-", 3),
    ]
    assert s1[0].share_ppm == 600000 and s1[1].share_ppm == 300000
    s2 = [r for r in out if r.source == "s2"]
    assert len(s2) == 5  # top-5 cut of the 7 families
    assert [r.prefix[:12] for r in s2] == [
        f"TEMPLATE-{f:02d}-" for f in range(5)
    ]  # count ties broken by prefix ASC


def test_embed_dim_variance_exact_poles(spark, tmp_path):
    """A constant dimension pins variance == 0.0 exactly; a ±1
    alternating dimension pins exactly 1.0 (e6 scales cancel)."""
    base = QUERIES["embed_dim_variance"](spark, SF_DIR).collect()
    assert len(base) == 64 and all(r.variance >= 0 for r in base)

    eschema = pq.read_schema(f"{SF_DIR}/embeddings.parquet")
    rows = []
    for i in range(40):
        vec = [0.5, 1.0 if i % 2 == 0 else -1.0, 0.25 * (i % 4)]
        rows.append({"vec_id": i, "embedding": vec, "label": 0})
    pq.write_table(
        pa.Table.from_pylist(rows, schema=eschema),
        str(tmp_path / "embeddings.parquet"),
    )
    out = {
        r.dim: r
        for r in QUERIES["embed_dim_variance"](spark, str(tmp_path)).collect()
    }
    assert out[1].variance == 0.0  # constant dim
    assert out[1].sum_v_e6 == 40 * 500000
    assert out[2].variance == 1.0  # ±1 alternation, zero mean
    assert out[2].sum_v_e6 == 0
