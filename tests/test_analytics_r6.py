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


def test_common_neighbors_cap_bounds_dense_slots(spark):
    """The hot-slot cap is the 100 TB valve (sf1 measured 35x wall
    without it): on a synthetic frame with one 200-user slot, at most
    50 users may survive into pairing — and sparse slots must pass
    through untouched."""
    import datetime as dt

    base = dt.datetime(2024, 6, 1)
    rows = [(i, base, i, "click", 1.0, "{}") for i in range(200)]  # dense slot
    rows += [
        (1000 + i, base + dt.timedelta(hours=2), i, "click", 1.0, "{}")
        for i in range(10)  # sparse slot
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="cap_syn_")
    events.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = QUERIES["graph_common_neighbors"](spark, d)
    # Pairs require >= 3 common slots; this frame has 1-slot overlaps
    # only, so the OUTPUT is empty — the cap property is asserted on
    # the op's internal invariant instead: re-derive the capped active
    # frame exactly as the operator does and check the bound.
    from spark_streaming_kafka_offset_spark.common import epoch_seconds
    from pyspark.sql.window import Window as W

    e = spark.read.parquet(f"{d}/events.parquet")
    active0 = (
        e.select("user_id", epoch_seconds("ts").alias("sec"))
        .select("user_id", F.expr("sec div 600").alias("slot"))
        .distinct()
    )
    wslot = W.partitionBy("slot").orderBy(
        (F.col("user_id") * 1103515245 + F.col("slot") * 12345) % 2147483648,
        "user_id",
    )
    capped = (
        active0.withColumn("rn", F.row_number().over(wslot))
        .where(F.col("rn") <= 50)
        .groupBy("slot")
        .count()
        .collect()
    )
    sizes = sorted(r["count"] for r in capped)
    assert sizes == [10, 50], sizes  # dense slot capped, sparse intact
    out.collect()  # and the full operator still runs on the frame


def test_ngram_novelty_trigram_lambda_reuses_split(spark):
    """The r6 sf1 fix: the trigram transform lambda must reference the
    pre-split array column, never re-evaluate split(text) per element
    (the inline form re-split 4x per row and cost 35 s at sf1), and
    gram keys must shuffle as xxhash64 longs, not raw strings.  The
    only split occurrences left are the single array projection and
    the pushed-down size filter — one per scan branch."""
    df = QUERIES["text_ngram_novelty"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.split("\n"):
        if "Generate explode" in line:
            assert "split(" not in line, line
    assert "xxhash64" in plan
