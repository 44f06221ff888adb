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
