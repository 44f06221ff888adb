"""Behavioral pins for the r6 analytics batch — the oracle twins prove
cross-engine agreement; these tests pin the SEMANTICS on frames where
the answer is known by construction (the events_dau_mau_stickiness
lesson: two engines can agree on a subtly wrong definition)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QUERIES = entrymod.queries()


def test_lifecycle_states_on_synthetic_gap_pattern(spark):
    """A hand-built activity pattern must produce exactly the textbook
    states: active weeks {0,1,3} => new@0, retained@1, churned@2,
    resurrected@3, churned@4 (given the observed week range 0..4)."""
    # Build an events frame where user 1 has >=2 purchases in weeks
    # 0, 1 and 3 (days 0, 7, 21 after the epoch-anchored base), and a
    # second user is active every week so weeks 2 and 4 exist in the
    # observed range.
    base = dt.datetime(1970, 1, 5)  # a Monday; week boundary alignment
    rows = []
    eid = 0
    for wk in (0, 1, 3):
        for k in range(2):
            rows.append((eid, base + dt.timedelta(weeks=wk, hours=k), 1, "purchase", 1.0, "{}"))
            eid += 1
    for wk in range(5):
        for k in range(2):
            rows.append((eid, base + dt.timedelta(weeks=wk, days=1, hours=k), 2, "purchase", 1.0, "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )

    import tempfile

    d = tempfile.mkdtemp(prefix="lifecycle_syn_")
    events.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {
        (r["wk"], r["state"]): r["n_users"]
        for r in QUERIES["events_user_lifecycle"](spark, d).collect()
    }
    w0 = min(w for w, _ in out)
    # user 1: new@0, retained@1, churned@2, resurrected@3, churned@4;
    # user 2 (every week): new@0 then retained — the background.
    assert out[(w0 + 0, "new")] == 2  # both users new in week 0
    assert out[(w0 + 1, "retained")] == 2
    assert out[(w0 + 2, "churned")] == 1
    assert out[(w0 + 2, "retained")] == 1
    assert out[(w0 + 3, "resurrected")] == 1
    assert out[(w0 + 4, "churned")] == 1
    assert (w0 + 4, "resurrected") not in out


def test_curriculum_positions_are_unique_and_interleaved(spark):
    """Global curriculum positions must be collision-free and round-robin:
    pos mod |langs| recovers the language index, and within a language
    positions are strictly increasing with rank."""
    df = QUERIES["docs_curriculum_order"](spark, SF_DIR).collect()
    positions = [r["curriculum_pos"] for r in df]
    assert len(positions) == len(set(positions)), "positions collide"
    langs = sorted({r["lang"] for r in df})
    n = len(langs)
    for r in df:
        assert r["curriculum_pos"] % n == langs.index(r["lang"])
        assert r["curriculum_pos"] == (r["rank_in_lang"] - 1) * n + langs.index(
            r["lang"]
        )


def test_holt_coefficients_sum_toward_unit_level_gain(spark):
    """The truncated Holt level coefficients must approach a unit DC
    gain (a constant series forecasts itself): sum(lu)/1e12 ~ 1 with
    only the truncation tail missing, and the trend coefficients must
    sum to ~0 (a constant series has no trend)."""
    from spark_streaming_kafka_offset_spark.operators.statistics import (
        _HOLT_LU,
        _HOLT_LV,
    )

    lu_gain = sum(_HOLT_LU) / 1e12
    lv_gain = sum(_HOLT_LV) / 1e12
    assert 0.95 < lu_gain <= 1.0 + 1e-9
    assert abs(lv_gain) < 0.05


def test_bot_score_rules_all_fire_both_directions(spark):
    """Every rule must discriminate on the fixtures — a threshold
    outside the data is a dead rule the oracle cannot catch."""
    rows = QUERIES["events_bot_score"](spark, SF_DIR).collect()
    assert {r["max_burst"] >= 2 for r in rows} == {True, False}
    assert {r["night_ppm"] > 300000 for r in rows} == {True, False}
    assert {r["type_entropy"] < 1.58 for r in rows} == {True, False}
    assert len({r["verdict"] for r in rows}) >= 2
