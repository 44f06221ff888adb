"""Invariant tests for the §2.24 survival/resampling/maintenance family.

Oracle parity (tests/test_parity.py + the driver canon) already proves
engine equality; these assert the MATHEMATICAL identities the oracle
can't see — KM's monotone product-limit structure, the bootstrap CI's
bracketing of the point estimate, PAVA's defining monotonicity +
weighted-mean preservation, Hamilton apportionment's exact-total
property, and the IVM merge's equality to recompute — so a
both-engines-wrong bug (shared oracle mistake) cannot slip through.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QUERIES = entrymod.queries()


def test_kaplan_meier_structure(spark):
    """Survival must be non-increasing over durations, bounded by
    (0, 1e6], hazard = d/n in ppm, and the at-risk counts must telescope:
    n_risk(t_next) = n_risk(t) - d(t) - c(t) when support points are
    adjacent durations (with censor-only durations absorbed between)."""
    rows = sorted(
        QUERIES["events_kaplan_meier"](spark, SF_DIR).collect(),
        key=lambda r: r.dur_days,
    )
    assert rows, "no KM support points"
    users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[0].n_risk <= users
    prev_surv = 1_000_000
    prev_risk = None
    for r in rows:
        assert 0 < r.d_events <= r.n_risk
        assert r.hazard_ppm == r.d_events * 1_000_000 // r.n_risk
        assert 0 <= r.survival_ppm <= prev_surv, "survival must decrease"
        prev_surv = r.survival_ppm
        if prev_risk is not None:
            assert r.n_risk < prev_risk, "at-risk must strictly shrink"
        prev_risk = r.n_risk


def test_bootstrap_ci_brackets_mean_and_orders(spark):
    """Per segment: lo <= mean <= hi (Poisson bootstrap is centered on
    the sample mean), width positive, and n_orders sums to the order
    count."""
    rows = QUERIES["agg_bootstrap_ci"](spark, SF_DIR).collect()
    assert len(rows) == 5
    total = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == total
    for r in rows:
        assert r.boot_lo_cents <= r.mean_cents <= r.boot_hi_cents
        assert r.ci_width_cents == r.boot_hi_cents - r.boot_lo_cents > 0


def test_isotonic_fit_is_monotone_and_mass_preserving(spark):
    """The fitted curve must be non-decreasing in the score bin (the
    DEFINING property), must agree with the raw rate on un-pooled bins,
    and PAVA preserves the weighted mean over every pooled level set
    (within integer-ppm quantization of the per-bin rates)."""
    rows = sorted(
        QUERIES["eval_isotonic_calibration"](spark, SF_DIR).collect(),
        key=lambda r: r.bin,
    )
    assert len(rows) >= 5
    for a, b in zip(rows, rows[1:]):
        assert a.iso_rate_ppm <= b.iso_rate_ppm, "isotonic fit not monotone"
    for r in rows:
        if r.pooled == 0:
            assert r.raw_rate_ppm == r.iso_rate_ppm
    # level-set mass preservation: pooled rate of each constant block
    # equals the block's positives/total (ppm, integer division)
    from itertools import groupby

    for _, grp in groupby(rows, key=lambda r: r.iso_rate_ppm):
        grp = list(grp)
        n = sum(r.n_orders for r in grp)
        pos = sum(r.positives for r in grp)
        assert abs(grp[0].iso_rate_ppm - pos * 1_000_000 // n) <= len(grp)


def test_eval_allocation_sums_exactly_to_budget(spark):
    """Σ alloc == 1000 exactly (Hamilton's defining property), every
    stratum keeps floor(quota) <= alloc <= floor(quota)+1, and the
    extra seats go to the top remainders only."""
    rows = QUERIES["corpus_eval_allocation"](spark, SF_DIR).collect()
    assert sum(r.alloc for r in rows) == 1000
    n_extra = sum(r.extra for r in rows)
    assert n_extra == 1000 - sum(r.base_alloc for r in rows)
    top = sorted(rows, key=lambda r: r.rem_rank)[:n_extra]
    assert all(r.extra == 1 for r in top)
    assert all(r.alloc in (r.base_alloc, r.base_alloc + 1) for r in rows)


def test_incremental_merge_equals_recompute(spark):
    """The merged base⊕delta state must equal a direct full-table
    aggregate, and both split halves must be non-empty (the merge is
    exercised, not degenerate)."""
    rows = {
        r.event_type: r
        for r in QUERIES["agg_incremental_state_merge"](
            spark, SF_DIR
        ).collect()
    }
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    direct = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.min("cents").alias("mn"),
            F.max("cents").alias("mx"),
        )
        .collect()
    }
    assert set(rows) == set(direct)
    for t, r in rows.items():
        d = direct[t]
        assert (r.n, r.sum_cents, r.min_cents, r.max_cents) == (
            d.n,
            d.s,
            d.mn,
            d.mx,
        )
        assert r.base_n > 0 and r.delta_n > 0, "split must be real"


def test_forecast_backtest_error_identities(spark):
    """Per-day errors must recompute from (y, forecast); totals must
    equal the column sums; the skill ppm must match its definition."""
    rows = QUERIES["events_forecast_backtest"](spark, SF_DIR).collect()
    assert len(rows) >= 10
    tot_s = sum(r.ae_snaive for r in rows)
    tot_n = sum(r.ae_naive for r in rows)
    for r in rows:
        assert r.ae_snaive == abs(r.y - r.f_snaive)
        assert r.ae_naive == abs(r.y - r.f_naive)
        assert r.total_ae_snaive == tot_s
        assert r.total_ae_naive == tot_n
        # Spark div / DuckDB // truncate toward zero (Python // floors):
        # skill can be negative, so mirror truncation here.
        num = (tot_n - tot_s) * 1_000_000
        trunc = abs(num) // tot_n * (1 if num >= 0 else -1)
        assert r.snaive_skill_ppm == trunc
