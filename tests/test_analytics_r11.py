"""Semantic laws for the r11 batch (beyond oracle parity): the
rank-test siblings.  Oracle hashes prove cross-engine equality; these
prove the estimators MEAN what they claim — a planted group shift blows
Kruskal–Wallis past the χ² critical value, a planted monotone series
drives Mann–Kendall past ±1.96, and both sit at honest nulls on the
trendless same-traffic fixture (the law class oracle parity cannot see:
a both-sides scaling bug keeps parity green — VERDICT r10 #8).
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import pyarrow.parquet as pq

from spark_streaming_kafka_offset_spark.plans.registry import QUERIES
from tests.conftest import SF_DIR

_EVENTS_SCHEMA = pq.read_schema(f"{SF_DIR}/events.parquet")


def _write_events(tmp_path, rows):
    pq.write_table(
        pa.Table.from_pylist(rows, schema=_EVENTS_SCHEMA),
        str(tmp_path / "events.parquet"),
    )


def _mk_rows(counts_by_type):
    """counts_by_type: {event_type: [daily_count, ...]} -> event rows."""
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


def test_kruskal_wallis_null_and_planted_shift(spark, tmp_path):
    """Fixture types share one traffic law: H far below the χ²(4)
    critical value.  A planted +3σ level shift on one group must blow H
    far past it — and the per-group rank sums must order accordingly."""
    rows = QUERIES["agg_kruskal_wallis"](spark, SF_DIR).collect()
    assert len(rows) == 5
    h = rows[0].h_stat
    assert all(r.h_stat == h for r in rows), "H must be a global scalar"
    assert 0 <= h < 9.49, f"null fixture produced H={h}"
    assert sum(r.n_days for r in rows) == rows[0].n_total

    # planted: 4 groups oscillate 20/24, one group sits at 60+
    counts = {et: [20 + (d % 2) * 4 for d in range(20)]
              for et in ("a", "b", "c", "d")}
    counts["shifted"] = [60 + (d % 3) for d in range(20)]
    _write_events(tmp_path, _mk_rows(counts))
    planted = QUERIES["agg_kruskal_wallis"](spark, str(tmp_path)).collect()
    hp = planted[0].h_stat
    assert hp > 9.49, f"planted shift must reject the null, H={hp}"
    by_type = {r.event_type: r for r in planted}
    others = [v.rank_sum_x2 for k, v in by_type.items() if k != "shifted"]
    assert by_type["shifted"].rank_sum_x2 > max(others)


def test_mann_kendall_null_and_planted_trends(spark, tmp_path):
    """Fixture daily volume is trendless: |z| < 1.96 for every type.
    A planted strictly increasing series must give z > 1.96 with
    S = C(n,2) exactly (all pairs concordant, no ties), and the
    mirrored decreasing series the exact negative."""
    rows = QUERIES["agg_mann_kendall"](spark, SF_DIR).collect()
    assert len(rows) == 5
    # 5 null tests at the 5% level leave ~23% odds of one excursion
    # past 1.96 — the null gate is "no overwhelming trend anywhere and
    # most types comfortably inside".
    assert all(abs(r.z_mk) < 3.2 for r in rows), rows
    assert sum(abs(r.z_mk) < 1.96 for r in rows) >= 4, rows
    assert all(r.var18 > 0 for r in rows)
    assert any(  # tie correction genuinely active on count data
        r.var18 < r.n_days * (r.n_days - 1) * (2 * r.n_days + 5)
        for r in rows
    )

    n = 15
    counts = {
        "up": [10 + 3 * d for d in range(n)],
        "down": [10 + 3 * (n - 1 - d) for d in range(n)],
    }
    _write_events(tmp_path, _mk_rows(counts))
    planted = {
        r.event_type: r
        for r in QUERIES["agg_mann_kendall"](spark, str(tmp_path)).collect()
    }
    full_s = n * (n - 1) // 2
    assert planted["up"].s_stat == full_s
    assert planted["down"].s_stat == -full_s
    assert planted["up"].z_mk > 1.96
    assert planted["down"].z_mk == -planted["up"].z_mk
    # no ties in a strictly monotone series: var18 is the untied form
    assert planted["up"].var18 == n * (n - 1) * (2 * n + 5)


def test_nelson_aalen_laws_against_kaplan_meier(spark):
    """NA and KM run on the SAME subject frame: support points, risk
    sets, event and censor counts must match row-for-row; the
    cumulative hazard is monotone and exactly the running sum of the
    e12 steps; Fleming–Harrington survival exp(−H) dominates KM
    survival everywhere (a strict estimator law) while staying within
    a few percent where increments are small."""
    na = sorted(
        QUERIES["events_nelson_aalen"](spark, SF_DIR).collect(),
        key=lambda r: r.dur_days,
    )
    km = sorted(
        QUERIES["events_kaplan_meier"](spark, SF_DIR).collect(),
        key=lambda r: r.dur_days,
    )
    assert [(r.dur_days, r.n_risk, r.d_events, r.censored) for r in na] == [
        (r.dur_days, r.n_risk, r.d_events, r.censored) for r in km
    ]
    running = 0
    for r in na:
        assert r.hazard_step_e12 == r.d_events * 10**12 // r.n_risk
        running += r.hazard_step_e12
        assert r.cum_hazard_e12 == running
    for a, k in zip(na, km):
        assert a.survival_fh_ppm >= k.survival_ppm, (a, k)
    # non-degenerate: hazard accumulates and survival genuinely decays
    assert na[-1].cum_hazard_e12 > na[0].cum_hazard_e12 > 0
    assert na[-1].survival_fh_ppm < na[0].survival_fh_ppm


def test_clustering_coefficient_planted_cliques_and_partition(spark, tmp_path):
    """Fixture: deciles partition the degree>=2 node set and shares sum
    to ~1e6.  Planted graph — one triangle order {1,2,3}, one star
    order pair {10,11},{10,12}, one 4-clique minus an edge — pins the
    exact per-node coefficients through the decile histogram and the
    WS average computed by hand."""
    import pyarrow as pa

    rows = QUERIES["graph_clustering_coefficient"](spark, SF_DIR).collect()
    tot = rows[0].n_nodes_total
    assert sum(r.n_nodes for r in rows) == tot
    share = sum(r.share_ppm for r in rows)
    assert 1_000_000 - len(rows) <= share <= 1_000_000
    assert all(r.avg_cc_ppm == rows[0].avg_cc_ppm for r in rows)
    assert 0 < rows[0].avg_cc_ppm <= 1_000_000
    assert len(rows) >= 2  # the distribution is not a point mass

    # planted: order 1 = triangle {1,2,3}; orders 2,3 = star center 10
    # with leaves 11, 12; order 4 = {20,21,22,23} minus edge (22,23)
    # via two overlapping orders {20,21,22} and {20,21,23}.
    li = []
    for ok, parts in [
        (1, [1, 2, 3]),
        (2, [10, 11]),
        (3, [10, 12]),
        (4, [20, 21, 22]),
        (5, [20, 21, 23]),
    ]:
        li += [{"l_orderkey": ok, "l_partkey": p} for p in parts]
    pa_tbl = pa.Table.from_pylist(li)
    import pyarrow.parquet as pq

    pq.write_table(pa_tbl, str(tmp_path / "lineitem.parquet"))
    got = {
        r.decile: r
        for r in QUERIES["graph_clustering_coefficient"](
            spark, str(tmp_path)
        ).collect()
    }
    # hand truth: nodes 1,2,3 -> deg 2, tri 1 -> cc 1.0 (decile 9);
    # node 10 -> deg 2, tri 0 -> cc 0 (decile 0); 11,12 deg 1 excluded;
    # 20,21 -> deg 3, tri 2 -> cc 2/3 (666666 ppm, decile 6);
    # 22,23 -> deg 2, tri 1 -> cc 1.0 (decile 9).
    assert got[9].n_nodes == 5
    assert got[0].n_nodes == 1
    assert got[6].n_nodes == 2
    assert got[9].n_nodes_total == 8
    want_avg = (5 * 1_000_000 + 0 + 2 * 666_666) // 8
    assert got[9].avg_cc_ppm == want_avg


_LINEITEM_SCHEMA = pq.read_schema(f"{SF_DIR}/lineitem.parquet")


def _write_lineitem_orders(tmp_path, orders):
    """orders: list of part-key lists; each inner list becomes one order
    whose parts pairwise co-purchase (the co-purchase graph generator:
    an order with parts [a, b] contributes exactly the edge a—b)."""
    rows = []
    for okey, parts in enumerate(orders):
        for ln, pk in enumerate(parts):
            rows.append(
                {
                    "l_orderkey": okey,
                    "l_partkey": pk,
                    "l_suppkey": 1,
                    "l_linenumber": ln,
                    "l_quantity": 1.0,
                    "l_extendedprice": 100.0,
                    "l_discount": 0.0,
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


def test_friedman_rotating_null_and_consistent_ceiling(spark, tmp_path):
    """Friedman's two exact laws: a latin-square rotation (every type
    takes every within-block rank equally often) gives Q = 0 EXACTLY —
    equal rank sums, zero deviation; a perfectly consistent ranking
    (same strict order every block, no ties) gives the classic ceiling
    Q = n(k−1) exactly.  The sf fixture sits at an honest null."""
    rows = QUERIES["agg_friedman_test"](spark, SF_DIR).collect()
    assert len(rows) == 5
    q = rows[0].q_stat
    assert all(r.q_stat == q for r in rows), "Q must be a global scalar"
    assert 0 <= q < 9.49, f"null fixture produced Q={q}"
    assert rows[0].df == 4

    k, n = 5, 20
    types = [f"t{i}" for i in range(k)]
    # latin rotation: type i has within-block rank ((i + d) % k) + 1,
    # realized as count 10 + rank (strictly distinct within block)
    rot = {
        t: [10 + ((i + d) % k) + 1 for d in range(n)]
        for i, t in enumerate(types)
    }
    _write_events(tmp_path, _mk_rows(rot))
    rotated = QUERIES["agg_friedman_test"](spark, str(tmp_path)).collect()
    assert all(r.q_stat == 0.0 for r in rotated), rotated
    sums = {r.rank_sum_x2 for r in rotated}
    assert len(sums) == 1, "rotation must equalize rank sums"

    consistent = {t: [10 * (i + 1) + d % 3 for d in range(n)]
                  for i, t in enumerate(types)}
    _write_events(tmp_path, _mk_rows(consistent))
    ceiling = QUERIES["agg_friedman_test"](spark, str(tmp_path)).collect()
    assert all(r.q_stat == float(n * (k - 1)) for r in ceiling), ceiling
    assert all(r.n_blocks == n for r in ceiling)


def test_assortativity_star_and_regular_union_exact_poles(spark, tmp_path):
    """Newman's two exact poles: a star K1,n is perfectly DISassortative
    (every edge joins the hub to a degree-1 leaf) → r = −1 exactly; a
    node-disjoint union of two cliques K4 ∪ K10 has constant equal
    endpoint degrees per edge → r = +1 exactly.  The sf fixture's
    co-purchase graph is degree-neutral (|r| small)."""
    rows = QUERIES["graph_assortativity"](spark, SF_DIR).collect()
    assert rows and abs(rows[0].r_assort) < 0.05
    assert sum(r.n_endpoints for r in rows) == 2 * rows[0].m_edges

    # star: center part 100, leaves 1..4, one 2-part order per edge
    _write_lineitem_orders(tmp_path, [[100, leaf] for leaf in range(1, 5)])
    star = QUERIES["graph_assortativity"](spark, str(tmp_path)).collect()
    assert all(r.r_assort == -1.0 for r in star), star
    by_class = {r.degree_class: r for r in star}
    assert by_class[0].n_endpoints == 4  # four degree-1 leaves
    assert by_class[0].avg_nbr_degree_ppm == 4_000_000  # all see the hub
    assert by_class[2].avg_nbr_degree_ppm == 1_000_000  # hub sees leaves

    # K4 (parts 0..3) ∪ K10 (parts 10..19): each clique is one order
    _write_lineitem_orders(
        tmp_path, [list(range(4)), list(range(10, 20))]
    )
    cliques = QUERIES["graph_assortativity"](spark, str(tmp_path)).collect()
    assert all(r.r_assort == 1.0 for r in cliques), cliques
    assert cliques[0].m_edges == 6 + 45

    # degenerate input (ADVICE r11): a SINGLE clique K6 is degree-regular
    # (every degree = 5), so 2·M·S3 − S2² = 0 exactly — r is undefined
    # and must surface as NULL (the sibling convention), never NaN
    _write_lineitem_orders(tmp_path, [list(range(6))])
    regular = QUERIES["graph_assortativity"](spark, str(tmp_path)).collect()
    assert len(regular) == 1 and regular[0].m_edges == 15
    assert regular[0].r_assort is None, regular


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


def _write_lineitem_pq_rel(tmp_path, orders_pq):
    """orders_pq: list of [(price, rel), ...] per order -> NDCG fixture."""
    rows = []
    for okey, lines in enumerate(orders_pq):
        for ln, (price, rel) in enumerate(lines):
            rows.append(
                {
                    "l_orderkey": okey,
                    "l_partkey": ln,
                    "l_suppkey": 1,
                    "l_linenumber": ln,
                    "l_quantity": float(rel),
                    "l_extendedprice": float(price),
                    "l_discount": 0.0,
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


def _ndcg_spec_ppm(lines):
    """Executable Python spec of eval_ndcg for one order's
    [(price, rel), ...] — the engine must equal this exactly."""
    from spark_streaming_kafka_offset_spark.operators.evaluation import (
        _NDCG_W,
    )

    by_price = sorted(
        range(len(lines)), key=lambda i: (-lines[i][0], i)
    )
    rels = [lines[i][1] for i in by_price]
    ideal = sorted((r for _, r in lines), reverse=True)
    dcg = sum(r * w for r, w in zip(rels[:10], _NDCG_W))
    idcg = sum(r * w for r, w in zip(ideal[:10], _NDCG_W))
    return dcg * 1_000_000 // idcg


def test_ndcg_exact_poles_and_python_spec(spark, tmp_path):
    """NDCG exact laws: an aligned ranking scores 1e6 exactly; a
    reversed 3-item ranking equals the hand-computable literal ratio;
    an arbitrary >10-line order equals the executable Python spec
    (cutoff@10 included).  The sf fixture (price ⊥ quantity) must sit
    strictly between the poles with every order scored."""
    rows = QUERIES["eval_ndcg"](spark, SF_DIR).collect()
    assert sum(r.n_orders for r in rows) == rows[0].n_orders_total
    assert 300_000 < rows[0].mean_ndcg_ppm < 999_999

    aligned = [(100.0 - i, 10 - i) for i in range(5)]
    reversed3 = [(90.0, 1), (80.0, 2), (70.0, 3)]
    long12 = [(200.0 - i, (i * 7) % 13 + 1) for i in range(12)]
    _write_lineitem_pq_rel(tmp_path, [aligned, reversed3, long12])
    out = QUERIES["eval_ndcg"](spark, str(tmp_path)).collect()
    # order-grain scores aren't exposed by the registered plan —
    # assert through the decile/mean algebra against the Python spec:
    spec = sorted(
        _ndcg_spec_ppm(o) for o in (aligned, reversed3, long12)
    )
    assert spec[2] == 1_000_000  # aligned pole
    mean_spec = sum(spec) // 3
    assert out[0].n_orders_total == 3
    assert out[0].mean_ndcg_ppm == mean_spec
    deciles = {r.decile: r.n_orders for r in out}
    for s in spec:
        assert deciles.get(min(s // 100_000, 9), 0) > 0


def test_jonckheere_exact_null_and_dose_response(spark, tmp_path):
    """JT exact laws: identical per-group value multisets give
    jt_u_ppm = 500000 and z = 0 EXACTLY (every ordered pair contributes
    n_i·n_j to 2J); a strict dose-response (all values in a higher
    discount group exceed every value below) gives jt_u_ppm = 1e6 and
    z ≫ 1.96; the mirrored anti-trend gives 0 and a strongly negative
    z.  The sf fixture (quantity ⊥ discount) is an honest null."""
    rows = QUERIES["agg_jonckheere_terpstra"](spark, SF_DIR).collect()
    assert len(rows) == 11
    assert abs(rows[0].jt_u_ppm - 500_000) < 20_000
    assert abs(rows[0].z_jt) < 3.2
    assert sum(r.n_rows for r in rows) == rows[0].n_total

    # identical multisets across 3 discount levels, with ties
    null_rows = [
        (g, q) for g in (0, 5, 10) for q in (1, 1, 2, 3, 3, 3, 7)
    ]
    _write_lineitem_dq(tmp_path, null_rows)
    out = QUERIES["agg_jonckheere_terpstra"](spark, str(tmp_path)).collect()
    assert all(r.jt_u_ppm == 500_000 for r in out), out
    assert all(r.z_jt == 0.0 for r in out), out

    dose = [(g, 10 * g + k) for g in (0, 2, 4) for k in range(1, 9)]
    _write_lineitem_dq(tmp_path, dose)
    up = QUERIES["agg_jonckheere_terpstra"](spark, str(tmp_path)).collect()
    assert all(r.jt_u_ppm == 1_000_000 for r in up), up
    assert up[0].z_jt > 1.96

    anti = [(g, 100 - 10 * g + k) for g in (0, 2, 4) for k in range(1, 9)]
    _write_lineitem_dq(tmp_path, anti)
    dn = QUERIES["agg_jonckheere_terpstra"](spark, str(tmp_path)).collect()
    assert all(r.jt_u_ppm == 0 for r in dn), dn
    assert dn[0].z_jt < -1.96
    assert dn[0].z_jt == -up[0].z_jt


def _write_lineitem_xyz(tmp_path, orders_xyz):
    """orders_xyz: list of (total_price_cents, total_qty, n_lines) —
    realized as n_lines lines splitting the totals (partial-corr
    fixture; only order-grain sums matter to the estimator)."""
    rows = []
    for okey, (px, qz, ny) in enumerate(orders_xyz):
        for ln in range(ny):
            price_c = px // ny + (px % ny if ln == 0 else 0)
            qty = qz // ny + (qz % ny if ln == 0 else 0)
            rows.append(
                {
                    "l_orderkey": okey,
                    "l_partkey": ln,
                    "l_suppkey": 1,
                    "l_linenumber": ln,
                    "l_quantity": float(qty),
                    "l_extendedprice": price_c / 100.0,
                    "l_discount": 0.0,
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


def test_partial_corr_confounder_vanishes_direct_link_survives(
    spark, tmp_path
):
    """The partial-correlation law: when price and quantity are driven
    ONLY by a shared confounder (line count), conditioning on it must
    collapse the strong marginal correlation toward 0; when the link
    is direct (quantity drives price within a fixed line count),
    conditioning must NOT remove it.  The sf fixture carries the
    confounder natively (r ≈ 0.74 marginal → ≈ −0.01 partial)."""
    row = QUERIES["agg_partial_corr"](spark, SF_DIR).collect()[0]
    assert row.r_price_qty > 0.5
    assert abs(row.r_partial_given_lines) < 0.1

    # pure confounder: x = 1000*y + e1, z = 10*y + e2 (e ⊥ y, e1 ⊥ e2)
    conf = [
        (100_000 * y + 700 * (i % 7), 100 * y + (i * 5) % 11, y)
        for i, y in enumerate([1, 2, 3, 4, 5] * 40)
    ]
    _write_lineitem_xyz(tmp_path, conf)
    c = QUERIES["agg_partial_corr"](spark, str(tmp_path)).collect()[0]
    assert c.r_price_qty > 0.8, c
    assert abs(c.r_partial_given_lines) < 0.25, c
    assert abs(c.r_partial_given_lines) < c.r_price_qty / 3

    # direct link: x = 120*z + jitter; line count varies INDEPENDENTLY
    direct = [
        (120 * (50 + (i * 13) % 90) + (i % 3), 50 + (i * 13) % 90,
         3 + (i * 7) % 4)
        for i in range(200)
    ]
    _write_lineitem_xyz(tmp_path, direct)
    d = QUERIES["agg_partial_corr"](spark, str(tmp_path)).collect()[0]
    assert d.r_price_qty > 0.95, d
    assert d.r_partial_given_lines > 0.95, d


def test_lead_lag_cmh_directional_and_degenerate(spark, tmp_path):
    """The CMH lead-lag laws: a series that REPLAYS another with a
    one-day lag must give a large forward CMH and a small reverse one
    (directionality — the asymmetry parity cannot check); a monotone
    series has degenerate margins in every stratum → NULL, not a
    fabricated statistic.  The sf fixture's independent types sit at
    the null on every pair."""
    rows = QUERIES["events_lead_lag_cmh"](spark, SF_DIR).collect()
    assert len(rows) == 20  # 5 types, ordered pairs
    vals = [r.cmh_stat for r in rows if r.cmh_stat is not None]
    assert vals and sorted(vals)[len(vals) // 2] < 6.63  # median at null

    import random

    rng = random.Random(11)
    n = 42
    moves = [rng.randint(0, 1) for _ in range(n)]
    lead, c = [], 500
    for m in moves:
        c += 7 if m else -5
        lead.append(c)
    follow = [500] + lead[:-1]  # replays lead, one day behind
    mono = [300 + 3 * t for t in range(n)]  # strictly increasing
    _write_events(
        tmp_path,
        _mk_rows({"lead": lead, "follow": follow, "mono": mono}),
    )
    out = {
        (r.type_x, r.type_y): r
        for r in QUERIES["events_lead_lag_cmh"](
            spark, str(tmp_path)
        ).collect()
    }
    fwd = out[("lead", "follow")].cmh_stat
    rev = out[("follow", "lead")].cmh_stat
    assert fwd is not None and fwd > 6.63, (fwd, rev)
    assert rev is None or rev < 6.63, (fwd, rev)
    assert fwd > 4 * (rev or 0.0)
    # monotone series: up-margin degenerate in every stratum -> NULL
    assert out[("lead", "mono")].cmh_stat is None
    assert out[("mono", "follow")].lead_delta == 0.0


def _write_lineitem_demand(tmp_path, demand, brands=None):
    """demand: list of (partkey, day_offset, qty); writes lineitem AND a
    part table mapping partkey -> brand (default one shared brand)."""
    rows = []
    base = _dt.datetime(2024, 1, 1)
    for i, (pk, day, q) in enumerate(demand):
        rows.append(
            {
                "l_orderkey": i,
                "l_partkey": pk,
                "l_suppkey": 1,
                "l_linenumber": 0,
                "l_quantity": float(q),
                "l_extendedprice": 100.0,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": base + _dt.timedelta(days=day),
            }
        )
    pq.write_table(
        pa.Table.from_pylist(rows, schema=_LINEITEM_SCHEMA),
        str(tmp_path / "lineitem.parquet"),
    )
    part_schema = pq.read_schema(f"{SF_DIR}/part.parquet")
    pks = sorted({pk for pk, _, _ in demand})
    parts = [
        {
            "p_partkey": pk,
            "p_name": f"part {pk}",
            "p_brand": (brands or {}).get(pk, "Brand#1"),
            "p_type": "t",
            "p_size": 1,
            "p_retailprice": 100.0,
        }
        for pk in pks
    ]
    pq.write_table(
        pa.Table.from_pylist(parts, schema=part_schema),
        str(tmp_path / "part.parquet"),
    )


def test_croston_constant_series_and_python_spec(spark, tmp_path):
    """Croston laws: a part demanding a CONSTANT size s every k days
    must smooth to rate ≈ s/k (weights sum to 1 up to e12 coefficient
    quantization); the engine must equal the executable Python
    replica of the weighted dot product EXACTLY; single-demand-day
    parts are excluded (no interval exists)."""
    from spark_streaming_kafka_offset_spark.operators.statistics import (
        _croston_weights,
    )

    rows = QUERIES["orders_croston_demand"](spark, SF_DIR).collect()
    assert rows and all(r.mean_rate_e6 > 0 for r in rows)
    assert all(r.mean_interval_x100 >= 100 for r in rows)

    # part 1: qty 6 every 3 days x 12; part 2: bursty; part 3: one day
    demand = [(1, 3 * t, 6) for t in range(12)]
    demand += [(2, d, q) for d, q in
               [(0, 1), (1, 9), (7, 2), (8, 8), (30, 5)]]
    demand += [(3, 10, 99)]
    _write_lineitem_demand(tmp_path, demand)
    out = {r.brand: r for r in QUERIES["orders_croston_demand"](
        spark, str(tmp_path)).collect()}
    r = out["Brand#1"]
    assert r.n_parts == 2  # part 3 has a single demand day -> excluded

    def croston(xs, gaps):
        w = _croston_weights()
        n = len(xs)
        s_size = sum(
            xs[p - 1] * (w[n - p][1] if p >= 2 else w[n - p][2])
            for p in range(1, n + 1)
        )
        m = len(gaps)
        s_gap = sum(
            gaps[q - 1] * (w[m - q][1] if q >= 2 else w[m - q][2])
            for q in range(1, m + 1)
        )
        return s_size, s_gap

    s1, g1 = croston([6] * 12, [3] * 11)
    s2, g2 = croston([1, 9, 2, 8, 5], [1, 6, 1, 22])
    rates = [s1 * 10**6 // g1, s2 * 10**6 // g2]
    assert r.mean_rate_e6 == sum(rates) // 2
    assert r.mean_interval_x100 == (g1 // 10**10 + g2 // 10**10) // 2
    # constant series pole: rate ~= 6/3 = 2 units/day at e6
    assert abs(rates[0] - 2_000_000) < 10, rates[0]


def test_newsvendor_exact_quantiles_and_monotone(spark, tmp_path):
    """Newsvendor laws: on 100 distinct equally-frequent demand values
    1..100 the 50/80/95% stocks are EXACTLY 50/80/95 (inf{q: F >=
    ratio} on the empirical CDF); stocks are monotone in the service
    level everywhere; zero-demand days (spine densification) pull the
    median down on a sparse brand."""
    rows = QUERIES["orders_newsvendor"](spark, SF_DIR).collect()
    by_brand = {}
    for r in rows:
        by_brand.setdefault(r.brand, {})[r.level_pct] = r.stock_qty
    for b, lv in by_brand.items():
        assert lv[50] <= lv[80] <= lv[95], (b, lv)

    # brand A: demands 1..100 on 100 consecutive days (no zero days);
    # brand B: demand 10 on 3 of 100 days -> median 0 via the spine
    demand = [(1, d, d + 1) for d in range(100)]
    demand += [(2, d, 10) for d in (0, 50, 99)]
    _write_lineitem_demand(
        tmp_path, demand, brands={1: "Brand#A", 2: "Brand#B"}
    )
    out = {}
    for r in QUERIES["orders_newsvendor"](spark, str(tmp_path)).collect():
        out.setdefault(r.brand, {})[r.level_pct] = r
    a = out["Brand#A"]
    assert (a[50].stock_qty, a[80].stock_qty, a[95].stock_qty) == (
        50, 80, 95)
    assert a[50].n_days == 100
    b = out["Brand#B"]
    assert b[50].stock_qty == 0  # 97 zero-demand days dominate
    assert b[95].stock_qty == 0
    assert b[50].mean_demand_x100 == 30  # 30 units / 100 days x100


_EMB_SCHEMA = pq.read_schema(f"{SF_DIR}/embeddings.parquet")


def _write_embeddings(tmp_path, rows_lab_xy):
    """rows_lab_xy: list of (label, x, y) -> 64-d vectors with the
    first two coords set and the rest zero (the feature plane the
    silhouette/kmeans family quantizes)."""
    rows = [
        {
            "vec_id": i,
            "embedding": [float(x), float(y)] + [0.0] * 62,
            "label": lab,
        }
        for i, (lab, x, y) in enumerate(rows_lab_xy)
    ]
    pq.write_table(
        pa.Table.from_pylist(rows, schema=_EMB_SCHEMA),
        str(tmp_path / "embeddings.parquet"),
    )


def test_silhouette_separated_swapped_and_null(spark, tmp_path):
    """Silhouette laws: two tightly separated label blobs score near
    +1e6; swapping the two blobs' labels (every point now nearest the
    FOREIGN centroid) drives the mean strongly negative; the sf
    fixture's geometrically unstructured labels sit near 0 — the
    honest 'labels are not clusters' reading."""
    rows = QUERIES["embed_silhouette"](spark, SF_DIR).collect()
    assert len(rows) == 10
    assert sum(r.n_members for r in rows) >= 400
    assert abs(rows[0].overall_sil_e6) < 250_000  # null: |s| well below the poles

    blob_a = [(0, 1.0 + 0.001 * i, 1.0) for i in range(20)]
    blob_b = [(1, -1.0 - 0.001 * i, -1.0) for i in range(20)]
    _write_embeddings(tmp_path, blob_a + blob_b)
    sep = QUERIES["embed_silhouette"](spark, str(tmp_path)).collect()
    assert all(r.mean_sil_e6 > 900_000 for r in sep), sep

    # misassigned label: label 0 = 6 pts AT label 1's blob + 4 pts far
    # away -> its own centroid sits near (-0.2, 0), so the 6 majority
    # points are on the foreign centroid (s = -1) and the label mean is
    # (6*(-1e6) + 4*(+4e5))/10 = -440000 up to the half-up centroid
    # quantization (a few e-6).
    mixed = [(0, -1.0, 0.0)] * 6 + [(0, 1.0, 0.0)] * 4
    mixed += [(1, -1.0, 0.0)] * 20
    _write_embeddings(tmp_path, mixed)
    neg = {r.label: r for r in QUERIES["embed_silhouette"](
        spark, str(tmp_path)).collect()}
    assert -441_000 < neg[0].mean_sil_e6 < -439_000, neg
    assert neg[1].mean_sil_e6 > 999_000  # sits on own centroid, b >> a


def test_mrr_poles_and_python_spec(spark, tmp_path):
    """MRR laws: a relevant line at price-rank 1 scores exactly 1e6;
    an order with no relevant line scores exactly 0; a relevant line
    first reached at rank 3 scores exactly 333333; the registered
    mean equals the Python replica over the constructed corpus."""
    rows = QUERIES["eval_mrr"](spark, SF_DIR).collect()
    assert sum(r.n_orders for r in rows) == rows[0].n_orders_total
    assert 0 < rows[0].mean_rr_e6 < 1_000_000

    from spark_streaming_kafka_offset_spark.operators.evaluation import (
        _MRR_W,
    )

    # order 0: relevant at rank 1; order 1: none relevant;
    # order 2: ranks 1-2 irrelevant, rank 3 relevant
    orders = [
        [(100.0, 45), (90.0, 5)],
        [(100.0, 5), (90.0, 7)],
        [(100.0, 5), (90.0, 6), (80.0, 31), (70.0, 40)],
    ]
    _write_lineitem_pq_rel(tmp_path, orders)
    out = QUERIES["eval_mrr"](spark, str(tmp_path)).collect()
    got = {r.rr_e6: r.n_orders for r in out}
    assert got == {_MRR_W[0]: 1, 0: 1, _MRR_W[2]: 1}
    assert out[0].mean_rr_e6 == (_MRR_W[0] + 0 + _MRR_W[2]) // 3


def _write_trade_graph(tmp_path, edges_with_nations):
    """edges_with_nations: list of (custkey, suppkey, cust_nation,
    supp_nation) -> lineitem+orders+customer+supplier parquet."""
    li, od, seen_c, seen_s = [], [], {}, {}
    for i, (ck, sk, cn, sn) in enumerate(edges_with_nations):
        od.append({"o_orderkey": i, "o_custkey": ck,
                   "o_orderstatus": "F", "o_totalprice": 100.0,
                   "o_orderdate": _dt.datetime(2024, 1, 1),
                   "o_orderpriority": "1-URGENT"})
        li.append({"l_orderkey": i, "l_partkey": 1, "l_suppkey": sk,
                   "l_linenumber": 0, "l_quantity": 1.0,
                   "l_extendedprice": 100.0, "l_discount": 0.0,
                   "l_tax": 0.0, "l_returnflag": "N",
                   "l_linestatus": "O",
                   "l_shipdate": _dt.datetime(2024, 1, 1)})
        seen_c[ck] = cn
        seen_s[sk] = sn
    pq.write_table(pa.Table.from_pylist(
        li, schema=_LINEITEM_SCHEMA), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.Table.from_pylist(
        od, schema=pq.read_schema(f"{SF_DIR}/orders.parquet")),
        str(tmp_path / "orders.parquet"))
    pq.write_table(pa.Table.from_pylist(
        [{"c_custkey": k, "c_name": "c", "c_nationkey": v,
          "c_acctbal": 0.0, "c_mktsegment": "BUILDING"}
         for k, v in seen_c.items()],
        schema=pq.read_schema(f"{SF_DIR}/customer.parquet")),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.Table.from_pylist(
        [{"s_suppkey": k, "s_name": "s", "s_nationkey": v,
          "s_acctbal": 0.0} for k, v in seen_s.items()],
        schema=pq.read_schema(f"{SF_DIR}/supplier.parquet")),
        str(tmp_path / "supplier.parquet"))


def test_modularity_aligned_and_anti_poles(spark, tmp_path):
    """Modularity exact poles: a perfectly nation-aligned trade graph
    (two nations, 4 edges each) scores Q = 1 − Σ(D_c/2m)² = 0.5
    exactly; a strictly CROSS-nation graph scores −Σ(D_c/2m)² = −0.5
    exactly.  The sf fixture's nations are trade-independent (honest
    null, |Q| tiny) and per-nation contributions must sum to Q."""
    rows = QUERIES["graph_modularity"](spark, SF_DIR).collect()
    assert len(rows) == 25
    q = rows[0].q_modularity
    assert abs(q) < 0.05, q
    assert abs(sum(r.contribution for r in rows) - q) < 1e-4

    # disjoint key spaces per nation: 2 customers x 2 suppliers fully
    # connected inside each nation -> e_c = 4, D_c = 8, m = 8,
    # Q = 2*(4/8 - (8/16)^2) = 0.5 exactly
    aligned = [(100 * n + c, 100 * n + 50 + s, n, n)
               for n in (0, 1) for c in (1, 2) for s in (1, 2)]
    _write_trade_graph(tmp_path, aligned)
    al = QUERIES["graph_modularity"](spark, str(tmp_path)).collect()
    assert all(r.q_modularity == 0.5 for r in al), al
    assert all(r.e_intra * 2 == r.d_total for r in al)

    cross = [(10 + i, 20 + i, 0, 1) for i in range(4)]
    cross += [(30 + i, 40 + i, 1, 0) for i in range(4)]
    _write_trade_graph(tmp_path, cross)
    cr = QUERIES["graph_modularity"](spark, str(tmp_path)).collect()
    assert all(r.q_modularity == -0.5 for r in cr), cr
    assert all(r.e_intra == 0 for r in cr)


def test_map_perfect_packing_and_python_spec(spark, tmp_path):
    """MAP laws: all relevant items ranked first gives AP = 1e6
    exactly; a ranking with relevant items at positions 1 and 3 gives
    AP = (1/1 + 2/3)/2 = 833333 exactly in the quantized algebra; an
    order with NO relevant line is excluded (TREC), not scored 0."""
    rows = QUERIES["eval_map"](spark, SF_DIR).collect()
    assert rows[0].n_orders_scored == sum(r.n_orders for r in rows)
    assert 0 < rows[0].map_e6 < 1_000_000

    orders = [
        [(100.0, 45), (90.0, 31), (80.0, 5)],   # perfect packing
        [(100.0, 40), (90.0, 5), (80.0, 35)],   # rel at pos 1 and 3
        [(100.0, 5), (90.0, 7)],                # unjudgeable
    ]
    _write_lineitem_pq_rel(tmp_path, orders)
    out = QUERIES["eval_map"](spark, str(tmp_path)).collect()
    assert out[0].n_orders_scored == 2
    # order 1: (1*1e6 + 2*333333) / 2 = 833333; order 0: 1e6
    assert out[0].map_e6 == (1_000_000 + 833_333) // 2
    deciles = {r.decile: r.n_orders for r in out}
    assert deciles[9] == 1 and deciles[8] == 1


def test_split_gain_perfect_separator_and_decoy(spark, tmp_path):
    """Split-gain laws: a feature whose threshold perfectly separates
    the returns label has gain == parent Gini EXACTLY (children are
    pure, weighted impurity 0); an independent decoy feature scores
    ≈ 0; the sf fixture's return flag is independent of every
    candidate (all gains ≈ 0 — honest 'nothing predicts returns')."""
    rows = QUERIES["feat_split_gain"](spark, SF_DIR).collect()
    assert {r.feature for r in rows} == {
        "disc_pct", "quantity", "ship_month", "tax_pct"
    }
    assert all(r.gini_gain < 0.002 for r in rows), rows
    assert all(0.4 < r.parent_gini <= 0.5 for r in rows)

    # returns iff quantity > 25; discount cycles independently
    rows_dq = []
    for i in range(400):
        q = 1 + (i * 13) % 50
        rows_dq.append((i % 11, q))
    _write_lineitem_dq(tmp_path, rows_dq)
    # overwrite returnflag: R iff quantity > 25
    tbl = pq.read_table(str(tmp_path / "lineitem.parquet"))
    flags = ["R" if q > 25 else "N" for q in tbl["l_quantity"].to_pylist()]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("l_returnflag"),
        "l_returnflag",
        pa.array(flags, pa.string()),
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    out = {r.feature: r for r in QUERIES["feat_split_gain"](
        spark, str(tmp_path)).collect()}
    sep = out["quantity"]
    assert sep.best_threshold == 25
    assert sep.gini_gain == sep.parent_gini  # pure children
    assert out["disc_pct"].gini_gain < 0.01  # independent decoy


def _write_orders_strata(tmp_path, strata):
    """strata: list of (year, a, b, c, d) 2x2 cell counts realized as
    orders (exposure = urgent priority, outcome = price > 150k)."""
    rows = []
    okey = 0
    for year, a, b, c, d in strata:
        for cnt, pri, price in (
            (a, "1-URGENT", 200000.0),
            (b, "1-URGENT", 100000.0),
            (c, "5-LOW", 200000.0),
            (d, "5-LOW", 100000.0),
        ):
            for _ in range(cnt):
                rows.append(
                    {
                        "o_orderkey": okey,
                        "o_custkey": okey % 50,
                        "o_orderstatus": "F",
                        "o_totalprice": price,
                        "o_orderdate": _dt.datetime(year, 6, 1),
                        "o_orderpriority": pri,
                    }
                )
                okey += 1
    pq.write_table(
        pa.Table.from_pylist(
            rows, schema=pq.read_schema(f"{SF_DIR}/orders.parquet")
        ),
        str(tmp_path / "orders.parquet"),
    )


def test_odds_ratio_mh_simpsons_paradox(spark, tmp_path):
    """The MH law parity cannot check: in the textbook Simpson
    construction — per-stratum OR exactly 1 in BOTH strata, exposure
    and outcome both tied to the stratum — the marginal OR explodes
    (91²/19² ≈ 22.9) while OR_MH stays exactly 1.0.  The sf fixture
    prices orders independently of priority (all ORs ≈ 1)."""
    rows = QUERIES["agg_odds_ratio_mh"](spark, SF_DIR).collect()
    assert len(rows) == 7
    assert abs(rows[0].or_mh - 1.0) < 0.3
    assert abs(rows[0].or_marginal - 1.0) < 0.3

    strata = [(2020, 90, 10, 9, 1), (2021, 1, 9, 10, 90)]
    _write_orders_strata(tmp_path, strata)
    out = QUERIES["agg_odds_ratio_mh"](spark, str(tmp_path)).collect()
    assert all(r.or_stratum == 1.0 for r in out), out
    assert out[0].or_mh == 1.0
    assert out[0].or_marginal > 20  # 91*91/(19*19) = 22.94
    assert out[0].or_marginal == round(91 * 91 / (19 * 19), 4)


def test_rayleigh_spike_antipodal_and_null(spark, tmp_path):
    """Rayleigh laws: all mass on one hour gives R̄ ≈ 1 (up to the e12
    literal quantization) and z ≈ n; an exactly antipodal hour pair
    cancels to R̄ = 0 EXACTLY (the literal table's opposite entries
    are exact negations); the sf fixture's uniform hours sit at the
    null (z ≈ 1 ≈ E[z])."""
    rows = QUERIES["events_rayleigh_hour"](spark, SF_DIR).collect()
    assert len(rows) == 5
    assert all(r.z_rayleigh < 6.0 for r in rows), rows
    # null R-bar scales as 1/sqrt(n); the z gate implies the bound
    for r in rows:
        assert r.rbar_ppm <= 1e6 * (6.0 / r.n_events) ** 0.5 + 1, r

    base = _dt.datetime(2024, 1, 1)
    rows_ev, eid = [], 0

    def at_hour(et, hour, n):
        nonlocal eid, rows_ev
        for i in range(n):
            rows_ev.append({
                "event_id": eid,
                "ts": base + _dt.timedelta(days=i % 5, hours=hour),
                "user_id": eid % 7, "event_type": et,
                "value": 1.0, "props": "{}"})
            eid += 1

    at_hour("spike", 9, 200)
    at_hour("antipodal", 3, 100)
    at_hour("antipodal", 15, 100)  # 3 + 12: exact negation in the table
    _write_events(tmp_path, rows_ev)
    out = {r.event_type: r for r in QUERIES["events_rayleigh_hour"](
        spark, str(tmp_path)).collect()}
    sp = out["spike"]
    assert sp.rbar_ppm >= 999_999
    assert abs(sp.z_rayleigh - sp.n_events) < 0.01
    ap = out["antipodal"]
    assert ap.rbar_ppm == 0 and ap.z_rayleigh == 0.0
    assert ap.avg_cos_e6 == 0 and ap.avg_sin_e6 == 0


def test_mcnemar_planted_shift_and_mirror(spark, tmp_path):
    """McNemar laws: urgency that exists ONLY in the second era gives
    b = 0 and χ² = c exactly; the mirrored shift gives the same χ²
    (the statistic is symmetric in b, c); an era-less fixture with no
    discordant pairs yields NULL.  The sf fixture's uniform priorities
    sit near the null."""
    row = QUERIES["agg_mcnemar"](spark, SF_DIR).collect()[0]
    assert row.n_customers >= 100
    assert row.chi2_mcnemar is not None and row.chi2_mcnemar < 6.63

    # 30 customers: 10 urgent only after, 20 never urgent
    strata = []
    for ck in range(30):
        strata.append((ck, _dt.datetime(1997, 1, 1), "5-LOW"))
        strata.append((ck, _dt.datetime(2000, 1, 1),
                       "1-URGENT" if ck < 10 else "5-LOW"))
    rows = [{"o_orderkey": i, "o_custkey": ck, "o_orderstatus": "F",
             "o_totalprice": 100.0, "o_orderdate": d,
             "o_orderpriority": p}
            for i, (ck, d, p) in enumerate(strata)]
    pq.write_table(pa.Table.from_pylist(
        rows, schema=pq.read_schema(f"{SF_DIR}/orders.parquet")),
        str(tmp_path / "orders.parquet"))
    out = QUERIES["agg_mcnemar"](spark, str(tmp_path)).collect()[0]
    assert out.only_before == 0 and out.only_after == 10
    assert out.chi2_mcnemar == 10.0  # (0-10)^2/10

    # mirror: urgent only BEFORE
    rows = [{**r, "o_orderpriority":
             ("1-URGENT" if (r["o_custkey"] < 10
              and r["o_orderdate"].year == 1997) else "5-LOW")}
            for r in rows]
    pq.write_table(pa.Table.from_pylist(
        rows, schema=pq.read_schema(f"{SF_DIR}/orders.parquet")),
        str(tmp_path / "orders.parquet"))
    mir = QUERIES["agg_mcnemar"](spark, str(tmp_path)).collect()[0]
    assert mir.only_before == 10 and mir.only_after == 0
    assert mir.chi2_mcnemar == 10.0

    # no discordance at all -> NULL
    rows = [{**r, "o_orderpriority": "5-LOW"} for r in rows]
    pq.write_table(pa.Table.from_pylist(
        rows, schema=pq.read_schema(f"{SF_DIR}/orders.parquet")),
        str(tmp_path / "orders.parquet"))
    nul = QUERIES["agg_mcnemar"](spark, str(tmp_path)).collect()[0]
    assert nul.chi2_mcnemar is None


def test_ljung_box_white_noise_and_planted_autocorr(spark, tmp_path):
    """Ljung–Box laws: iid daily counts sit under the χ²(7) 1%
    critical value (18.48); a planted sawtooth (strong lag-1
    anticorrelation) rejects decisively; the engine Q equals the
    textbook formula recomputed in Python on the same series."""
    rows = QUERIES["agg_ljung_box"](spark, SF_DIR).collect()
    assert len(rows) == 5
    assert all(r.h_lags == 7 for r in rows)
    assert sum(r.q_stat < 18.48 for r in rows) >= 4, rows

    n = 40
    saw = {"saw": [30 + 20 * (t % 2) for t in range(n)],
           "flat": [25 + ((t * 17) % 5) for t in range(n)]}
    _write_events(tmp_path, _mk_rows(saw))
    out = {r.event_type: r for r in QUERIES["agg_ljung_box"](
        spark, str(tmp_path)).collect()}
    assert out["saw"].q_stat > 100, out  # lag-1 rho ~ -1 dominates

    def ljung_box(xs, h=7):
        nn = len(xs)
        s = sum(xs)
        u = [nn * x - s for x in xs]
        c0 = sum(v * v for v in u)
        q = 0.0
        for k in range(1, h + 1):
            ck = sum(u[t] * u[t + k] for t in range(nn - k))
            q += (ck / c0) ** 2 / (nn - k)
        return round(nn * (nn + 2) * q, 4)

    assert out["saw"].q_stat == ljung_box(saw["saw"])
    assert out["flat"].q_stat == ljung_box(saw["flat"])


def test_cochran_q_planted_era_and_permutation(spark, tmp_path):
    """Cochran laws: 10 of 30 customers urgent ONLY in era 3 gives
    Q = 2(3·10² − 10²)/(3·10 − 10) = 20 exactly; the mirrored era-1
    shift the SAME Q (column permutation invariance); an
    all-concordant table (urgent in every era) yields NULL."""
    row = QUERIES["agg_cochran_q"](spark, SF_DIR).collect()[0]
    assert row.q_cochran is not None and row.q_cochran < 9.21

    def write(urgent_eras_by_cust):
        era_dates = {1: _dt.datetime(1996, 1, 1),
                     2: _dt.datetime(1998, 1, 1),
                     3: _dt.datetime(2000, 1, 1)}
        rows = []
        i = 0
        for ck, urgent_eras in urgent_eras_by_cust.items():
            for era, dt in era_dates.items():
                rows.append({
                    "o_orderkey": i, "o_custkey": ck,
                    "o_orderstatus": "F", "o_totalprice": 100.0,
                    "o_orderdate": dt,
                    "o_orderpriority": ("1-URGENT" if era in urgent_eras
                                        else "5-LOW")})
                i += 1
        pq.write_table(pa.Table.from_pylist(
            rows, schema=pq.read_schema(f"{SF_DIR}/orders.parquet")),
            str(tmp_path / "orders.parquet"))

    write({ck: ({3} if ck < 10 else set()) for ck in range(30)})
    era3 = QUERIES["agg_cochran_q"](spark, str(tmp_path)).collect()[0]
    assert (era3.urgent_era1, era3.urgent_era2, era3.urgent_era3) == (
        0, 0, 10)
    assert era3.q_cochran == 20.0

    write({ck: ({1} if ck < 10 else set()) for ck in range(30)})
    era1 = QUERIES["agg_cochran_q"](spark, str(tmp_path)).collect()[0]
    assert era1.q_cochran == 20.0  # permutation invariance

    write({ck: {1, 2, 3} for ck in range(30)})
    conc = QUERIES["agg_cochran_q"](spark, str(tmp_path)).collect()[0]
    assert conc.q_cochran is None


def test_rich_club_clique_and_star_poles(spark, tmp_path):
    """Rich-club exact poles: a clique K8 (every degree 7) has
    φ = 1e6 exactly at every populated class; a star K1,8's
    nontrivial clubs are singletons (NULL — no pairs to close) while
    class 0 recovers the star's exact global density 2·8/(9·8);
    fixture classes are monotone-populated suffix sums."""
    rows = QUERIES["graph_rich_club"](spark, SF_DIR).collect()
    assert rows
    for earlier, later in zip(rows, rows[1:]):
        assert earlier.n_rich >= later.n_rich  # suffix-sum monotone
        assert earlier.e_rich >= later.e_rich

    _write_lineitem_orders(tmp_path, [list(range(8))])  # K8: deg 7
    cl = QUERIES["graph_rich_club"](spark, str(tmp_path)).collect()
    assert all(r.phi_ppm == 1_000_000 for r in cl), cl
    assert cl[0].n_rich == 8 and cl[0].e_rich == 28

    _write_lineitem_orders(
        tmp_path, [[100, leaf] for leaf in range(1, 9)]
    )  # star: hub deg 8 (class 3), leaves deg 1 (class 0)
    st = {r.degree_class: r for r in QUERIES["graph_rich_club"](
        spark, str(tmp_path)).collect()}
    assert st[0].phi_ppm == 2_000_000 * 8 // (9 * 8)  # global density
    assert st[3].n_rich == 1 and st[3].phi_ppm is None  # singleton club


def test_rbo_identical_pole_and_python_spec(spark, tmp_path):
    """RBO laws: identical rankings score 1e6 exactly (the
    normalization pins the pole); the engine equals the executable
    Python replica on arbitrary constructed orders (including one
    longer than the depth-10 cutoff); the sf fixture's independent
    rankings sit strictly between set-overlap floor and the pole."""
    from spark_streaming_kafka_offset_spark.operators.evaluation import (
        _RBO_M,
        _RBO_V,
    )

    rows = QUERIES["eval_rbo"](spark, SF_DIR).collect()
    assert sum(r.n_orders for r in rows) == rows[0].n_orders_total
    assert 100_000 < rows[0].mean_rbo_ppm < 999_999

    def rbo_spec(lines):
        pa_ = sorted(range(len(lines)), key=lambda i: (-lines[i][0], i))
        pb_ = sorted(range(len(lines)), key=lambda i: (-lines[i][1], i))
        pos_a = {item: p + 1 for p, item in enumerate(pa_)}
        pos_b = {item: p + 1 for p, item in enumerate(pb_)}
        score = sum(
            _RBO_V[max(pos_a[i], pos_b[i]) - 1]
            for i in range(len(lines))
            if max(pos_a[i], pos_b[i]) <= 10
        )
        return score * 1_000_000 // _RBO_M[min(len(lines), 10) - 1]

    identical = [(100.0 - i, 50 - i) for i in range(6)]
    reversed6 = [(100.0 - i, 10 + i) for i in range(6)]
    long12 = [(200.0 - i, ((i * 7) % 13) + 1) for i in range(12)]
    _write_lineitem_pq_rel(tmp_path, [identical, reversed6, long12])
    out = QUERIES["eval_rbo"](spark, str(tmp_path)).collect()
    spec = sorted(rbo_spec(o) for o in (identical, reversed6, long12))
    assert spec[2] == 1_000_000  # identical-ranking pole
    assert out[0].n_orders_total == 3
    assert out[0].mean_rbo_ppm == sum(spec) // 3
    deciles = {r.decile: r.n_orders for r in out}
    for s in spec:
        assert deciles.get(min(s // 100_000, 9), 0) > 0


def test_grubbs_planted_spike_and_python_spec(spark, tmp_path):
    """Grubbs laws: a 10x single-day spike is identified (day AND
    count) with G == the Python replica exactly; the sf fixture's iid
    daily volume keeps G in the unremarkable band for n ~ 30."""
    rows = QUERIES["agg_grubbs_test"](spark, SF_DIR).collect()
    assert len(rows) == 5
    assert all(1.0 < r.g_stat < 3.7 for r in rows), rows

    counts = [40 + ((t * 11) % 7) for t in range(25)]
    counts[13] = 400  # the spike
    _write_events(tmp_path, _mk_rows({"spiky": counts}))
    out = QUERIES["agg_grubbs_test"](spark, str(tmp_path)).collect()[0]
    assert out.outlier_day == _dt.date(2024, 1, 14)  # day index 13
    assert out.outlier_count == 400

    n = len(counts)
    s = sum(counts)
    sxx = sum(c * c for c in counts)
    adev = max(abs(n * c - s) for c in counts)
    import math

    g = round(adev / math.sqrt(n * (n * sxx - s * s) / (n - 1)), 4)
    assert out.g_stat == g
    assert out.g_stat > 4.0  # decisively surprising


def test_eoq_sqrt_law_and_python_spec(spark, tmp_path):
    """EOQ laws: quadrupling demand doubles EOQ EXACTLY (IEEE sqrt is
    correctly rounded and sqrt(4x) = 2 sqrt(x) holds exactly in binary
    floats... up to the terminal ROUND(2), asserted against the exact
    2x); the cost-ratio sweep is monotone; engine == Python replica."""
    import math

    rows = QUERIES["orders_eoq"](spark, SF_DIR).collect()
    by_brand = {}
    for r in rows:
        by_brand.setdefault(r.brand, {})[r.cost_ratio_pct] = r
    for b, lv in by_brand.items():
        assert lv[50].eoq_units < lv[200].eoq_units < lv[800].eoq_units
        a = lv[50].annual_x100
        assert lv[200].eoq_units == round(
            math.sqrt(2.0 * a / 100 * 2 / 1), 2
        )

    # one brand, one part: demand 100/day for 10 days vs 400/day:
    # annualized 4x -> EOQ exactly doubles at every cost ratio
    base = [(1, day, 100) for day in range(10)]
    quad = [(1, day, 400) for day in range(10)]
    _write_lineitem_demand(tmp_path, base)
    lo = {r.cost_ratio_pct: r.eoq_units
          for r in QUERIES["orders_eoq"](spark, str(tmp_path)).collect()}
    _write_lineitem_demand(tmp_path, quad)
    hi = {r.cost_ratio_pct: r.eoq_units
          for r in QUERIES["orders_eoq"](spark, str(tmp_path)).collect()}
    for pct in (50, 200, 800):
        assert hi[pct] == round(2 * lo[pct], 2), (pct, lo[pct], hi[pct])


def test_gamma_gk_exact_poles_and_jt_coherence(spark, tmp_path):
    """Gamma laws: a strict dose-response has ZERO discordant pairs —
    γ = 1.0 exactly; its mirror γ = −1.0; identical per-group
    multisets give C == D exactly hence γ = 0.0; and on the shared sf
    fixture γ's SIGN agrees with Jonckheere–Terpstra's z (the
    estimate and the test must point the same way)."""
    row = QUERIES["agg_gamma_gk"](spark, SF_DIR).collect()[0]
    assert abs(row.gamma) < 0.05  # quantity ⊥ discount
    jt = QUERIES["agg_jonckheere_terpstra"](spark, SF_DIR).collect()[0]
    assert (row.gamma >= 0) == (jt.z_jt >= 0)

    dose = [(g, 10 * g + k) for g in (0, 2, 4) for k in range(1, 9)]
    _write_lineitem_dq(tmp_path, dose)
    up = QUERIES["agg_gamma_gk"](spark, str(tmp_path)).collect()[0]
    assert up.gamma == 1.0 and up.discordant == 0

    anti = [(g, 100 - 10 * g + k) for g in (0, 2, 4) for k in range(1, 9)]
    _write_lineitem_dq(tmp_path, anti)
    dn = QUERIES["agg_gamma_gk"](spark, str(tmp_path)).collect()[0]
    assert dn.gamma == -1.0 and dn.concordant == 0

    null_rows = [(g, q) for g in (0, 5, 10) for q in (1, 1, 2, 3, 3, 3, 7)]
    _write_lineitem_dq(tmp_path, null_rows)
    nu = QUERIES["agg_gamma_gk"](spark, str(tmp_path)).collect()[0]
    assert nu.concordant == nu.discordant
    assert nu.gamma == 0.0


def test_brown_forsythe_planted_spread_and_python_spec(spark, tmp_path):
    """Brown–Forsythe laws: one group with a wide spread among narrow
    ones rejects decisively; identical group multisets sit at F ≈ 0
    (within the documented e6 quantization band); engine == the
    e6-floored Python replica EXACTLY on constructed data."""
    rows = QUERIES["agg_brown_forsythe"](spark, SF_DIR).collect()
    assert len(rows) == 11
    f = rows[0].f_stat
    assert f is not None and f < 3.0, rows  # iid spread: F at the null
    assert all(r.f_stat == f for r in rows)
    assert all(r.df1 == 10 for r in rows)

    # groups 0/5 narrow (1..3 repeated), group 10 wide (1..48)
    narrow = [(g, q) for g in (0, 5) for q in (1, 2, 3) * 8]
    wide = [(10, 1 + (k * 47) // 23) for k in range(24)]
    _write_lineitem_dq(tmp_path, narrow + wide)
    out = QUERIES["agg_brown_forsythe"](spark, str(tmp_path)).collect()
    fp = out[0].f_stat
    assert fp > 4.9, out  # F(2, 69) 1% ~ 4.9

    def bf_spec(groups):
        import statistics as st

        grp = []
        for xs in groups:
            med2 = round(2 * st.median(xs))
            z2 = [abs(2 * x - med2) for x in xs]
            n, t, q = len(z2), sum(z2), sum(v * v for v in z2)
            grp.append((n, t, q))
        nn = sum(g[0] for g in grp)
        tt = sum(g[1] for g in grp)
        k = len(grp)
        sb_part = sum(t * t * 10**6 // n for n, t, _ in grp)
        ssw = sum((n * q - t * t) * 10**6 // n for n, t, q in grp)
        ssb = sb_part - tt * tt * 10**6 // nn
        return round((ssb / (k - 1)) / (ssw / (nn - k)), 4)

    groups = [[q for _, q in narrow if _ == 0],
              [q for _, q in narrow if _ == 5],
              [q for _, q in wide]]
    assert fp == bf_spec(groups)

    same = [(g, q) for g in (0, 5, 10) for q in (2, 4, 4, 9, 9, 9, 30)]
    _write_lineitem_dq(tmp_path, same)
    eq = QUERIES["agg_brown_forsythe"](spark, str(tmp_path)).collect()
    assert eq[0].f_stat < 0.001, eq  # identical multisets
