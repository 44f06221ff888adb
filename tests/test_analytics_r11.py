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
