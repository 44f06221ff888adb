"""§4 — physical-plan assertions: the optimizations we claim are FREE
from Catalyst must actually appear in the plan, or the 100 TB story is
fiction.  `explain()` output is checked, not assumed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

import __spark_entry__ as entrymod
from spark_streaming_kafka_offset_spark.session import load_table
from tests.conftest import SF_DIR

QUERIES = entrymod.queries()


@pytest.fixture(scope="session")
def audit_frames(spark):
    """ONE query-construction pass shared by every registry-wide sweep
    below (r15, VERDICT r14 #2a): building all 462 queries dominates
    each sweep's wall — iterative ops run their staging jobs at build
    time — and the four sweeps used to pay it four times (~14 min of
    the 50-min suite).  Values are the built DataFrame or the Exception
    its build raised (the audits report those as ERR)."""
    frames: dict[str, object] = {}
    for key, fn in QUERIES.items():
        if key.startswith(("stream_", "source_", "sink_")):
            continue
        try:
            frames[key] = fn(spark, SF_DIR)
        except Exception as e:  # noqa: BLE001 - audits report ERR per key
            frames[key] = e
    return frames


def plan_str(df) -> str:
    return df._jdf.queryExecution().toString()


def executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pruned_pushes_filters_and_prunes_columns(spark):
    df = QUERIES["scan_pruned"](spark, SF_DIR)
    plan = plan_str(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_extendedprice)" in plan or "GreaterThan(l_extendedprice" in plan
    # Column pruning: ReadSchema carries only the referenced columns.
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_orderkey" in read_schema
    assert "l_returnflag" in read_schema
    assert "l_quantity" not in read_schema
    assert "l_shipdate" not in read_schema


def test_broadcast_join_is_broadcast(spark):
    df = QUERIES["join_broadcast"](spark, SF_DIR)
    assert "BroadcastHashJoin" in executed_plan(df)


def test_semi_anti_plan_as_joins(spark):
    semi = QUERIES["join_semi"](spark, SF_DIR)
    anti = QUERIES["join_anti"](spark, SF_DIR)
    assert "LeftSemi" in executed_plan(semi)
    assert "LeftAnti" in executed_plan(anti)


def test_limit_topk_fuses_to_take_ordered(spark):
    df = QUERIES["limit_topk"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in executed_plan(df)


def test_agg_is_partial_final(spark):
    """Partial+final hash aggregation (map-side combine) on the flagship."""
    df = QUERIES["agg_hash"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_whole_stage_codegen_covers_flagship(spark):
    df = QUERIES["agg_hash"](spark, SF_DIR)
    df.collect()  # AQE: codegen spans appear only in the final (executed) plan
    plan = executed_plan(df)
    # codegen stages print as "*(n) Operator" in the simple plan string
    assert "*(1)" in plan and "isFinalPlan=true" in plan


def test_asof_join_has_no_cartesian(spark):
    """The as-of join must be the window formulation — a single shuffle,
    never a nested-loop/cartesian product."""
    df = QUERIES["join_asof"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_sim_topk_exact_is_blocked_not_cartesian(spark):
    """Label blocking must plan as an equi-join, not an n² cross."""
    df = QUERIES["sim_topk_exact"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan


def test_q3_fuses_topk_and_pushes_filters(spark):
    df = QUERIES["q3_shipping_priority"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    full = plan_str(df)
    assert "PushedFilters" in full and "GreaterThan(l_shipdate" in full


def test_q5_broadcasts_all_dims(spark):
    df = QUERIES["q5_local_supplier"](spark, SF_DIR)
    plan = executed_plan(df)
    # supplier, nation, region all broadcast → ≥3 broadcast joins, and the
    # plan never degenerates to a cartesian.
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_events_ts_is_timestamp(spark):
    """events.ts loads as a wall-clock timestamp type.  The driver fixtures
    have carried both flavors across rounds (TIMESTAMP through r2, then
    TIMESTAMP_NTZ after the 2026-08-13 regeneration dropped the UTC
    annotation), so accept either — every operator is written to be
    type-agnostic (interval arithmetic / epoch_seconds, not cast('long'))."""
    e = load_table(spark, SF_DIR, "events")
    assert dict(e.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    assert lo.year == 2024 and hi.year == 2024


def test_sort_multi_has_no_single_task_window(spark):
    """The r1 formulation ranked via an UNPARTITIONED window — every row
    through one task.  The scale-safe form range-partitions on the sort
    keys and window-partitions by partition id; assert the executed plan
    carries a RangePartitioning exchange and that the data-side window
    is partitioned (its Sort is (local) within partitions, not global).
    """
    df = QUERIES["sort_multi"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "rangepartitioning" in plan.lower()
    # The per-partition rank window must partition by _pid: its Window spec
    # appears with a partition clause, never an empty PartitionBy.
    assert "_pid" in plan


def test_bucketed_join_has_no_shuffle_exchange(spark):
    """Both sides bucketed on the join key -> co-located SortMergeJoin.
    A shuffle exchange on either side would mean the bucket layout was
    ignored and the 100 TB claim is false."""
    df = QUERIES["join_bucketed"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_partition_pruning_skips_directories(spark):
    """The day filter must prune at planning time: PartitionFilters on
    the scan carries the day predicate and the row-level PushedFilters
    does NOT re-check it (it's directory metadata, not data)."""
    df = QUERIES["scan_partition_pruned"](spark, SF_DIR)
    plan = plan_str(df)
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "day" in seg


def test_sessionize_single_shuffle(spark):
    """Both windows and the final aggregate share the user_id hash
    partitioning — exactly one exchange in the whole plan."""
    df = QUERIES["sessionize_batch"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("Exchange") == 1, plan


def test_pivot_has_no_discovery_pass_and_one_shuffle(spark):
    """Explicit pivot values → a single conditional aggregate: one
    exchange, partial+final HashAggregate, no extra distinct subplan."""
    df = QUERIES["pivot_wide"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("Exchange") == 1, plan
    assert plan.count("HashAggregate") == 2, plan


def test_unpivot_is_map_side_expand(spark):
    df = QUERIES["unpivot_long"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "Expand" in plan
    # only the pivot aggregate's shuffle — the melt itself adds none
    assert plan.count("Exchange") == 1, plan


def test_split_hash_has_no_shuffle_before_final_agg(spark):
    """Split membership is scan-side; the only exchange is the 3-group
    final aggregate."""
    df = QUERIES["split_hash"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("Exchange") == 1, plan


def test_ngram_jaccard_is_blocked_equi_join(spark):
    """The pair join must key on the length bucket (equi-join), never a
    cartesian/nested-loop over all pairs."""
    df = QUERIES["dedup_ngram_jaccard"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sub_correlated_is_decorrelated(spark):
    """The correlated scalar subqueries must compile to aggregate+join,
    never per-row subquery execution or a cartesian."""
    df = QUERIES["sub_correlated"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert any(j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")), plan


def test_chunk_documents_is_shuffle_free(spark):
    """Chunking is generate-and-explode inside one stage: Scan → Project
    → Generate, zero Exchange nodes — the embarrassingly-parallel shape
    claimed in the docstring."""
    df = QUERIES["chunk_documents"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "Exchange" not in plan
    assert "Generate explode" in plan


def test_sample_weighted_broadcasts_weights_and_filters_scan_side(spark):
    """The weights dim is broadcast and the keep/drop modulo predicate
    runs before the aggregate — filtered scan + partial/final agg."""
    df = QUERIES["sample_weighted"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_pack_sequences_single_window_shuffle(spark):
    """Packing shuffles once on the source key for the running-sum
    window; the final shard aggregate reuses that partitioning (its
    group key is a superset), so exactly one hashpartitioning Exchange
    appears."""
    df = QUERIES["pack_sequences"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("Exchange hashpartitioning") <= 2  # window + (maybe) agg
    assert "RunningWindowFunction" in plan or "Window" in plan


#: The curated BNL allowlist now lives in plans/audit.py (one source of
#: truth shared with tools/audit_plans.py — VERDICT r5 #2); this module
#: keeps the name for its own assertion below.
from spark_streaming_kafka_offset_spark.plans.audit import (  # noqa: E402
    BNL_ALLOWED as _BNL_REASONS,
)

_BNL_ALLOWED = frozenset(_BNL_REASONS)


def test_no_unexpected_cartesian_or_bnl_anywhere(spark, audit_frames):
    """Engine-wide scale invariant: NO batch query plans a
    CartesianProduct, and BroadcastNestedLoopJoin appears only where a
    tiny bounded side is deliberately broadcast (whitelist above).  A
    new operator that accidentally introduces an unbounded cross join
    fails here before it ever reaches a fixture where it would matter."""
    offenders = {}
    for key, df in audit_frames.items():
        if isinstance(df, Exception):
            offenders[key] = f"build error: {df}"
            continue
        plan = executed_plan(df)
        if "CartesianProduct" in plan and key != "join_cross":
            offenders[key] = "cartesian"
        elif "BroadcastNestedLoopJoin" in plan and key not in _BNL_ALLOWED:
            offenders[key] = "bnl"
    assert not offenders, offenders


def test_dynamic_partition_pruning_plans_a_runtime_filter(spark):
    """The day-dim join must prune fact partitions via a
    dynamicpruningexpression subquery — runtime pruning, not a row
    filter after a full scan."""
    df = QUERIES["scan_dynamic_pruning"](spark, SF_DIR)
    df.collect()
    plan = executed_plan(df)
    assert "dynamicpruningexpression" in plan


def test_runtime_bloom_filter_join_lever(spark):
    """The third pruning lever at 100 TB (after static + dynamic
    partition pruning): a runtime BLOOM filter built from the selective
    side of a shuffle join and applied to the big side's scan
    (`might_contain` in the plan).  Demonstrated as a test because the
    trigger is session conf, not query shape — the engine's registered
    queries stay conf-neutral.  Results must be identical with and
    without the filter (it is purely work-avoidance)."""
    from spark_streaming_kafka_offset_spark.session import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )

    def q():
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )

    baseline = sorted(map(tuple, q().collect()))
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = q()
        filtered = sorted(map(tuple, df.collect()))
        assert "might_contain" in executed_plan(df)
        assert filtered == baseline
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def test_q7_broadcasts_dims_no_cartesian(spark):
    """Q7's five-table dim chain: every dim join broadcasts, the cross-leg
    nation-pair disjunction never degenerates to a cartesian."""
    df = QUERIES["q7_volume_flows"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q19_pushes_disjunctive_residuals(spark):
    """Q19's OR-of-ANDs: Catalyst must derive the single-side residual
    (the quantity-range union) and push it into the lineitem scan —
    otherwise the fact scan reads every row at 100 TB."""
    df = QUERIES["q19_disjunctive_pred"](spark, SF_DIR)
    full = plan_str(df)
    pushed = [l for l in full.splitlines() if "PushedFilters" in l and "l_quantity" in l]
    assert pushed, "quantity-range union not pushed to the lineitem scan"
    assert "Or(" in pushed[0]


def test_q22_anti_join_and_bounded_nlj(spark):
    """Q22: the no-recent-orders test plans as a LeftAnti hash join, and
    the only nested-loop is the 1-row (sum, count) broadcast — output-sized
    by construction, never a data×data cross."""
    df = QUERIES["q22_idle_customers"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_q13_left_join_keeps_unmatched(spark):
    """Q13's COUNT(column) over a LEFT join: the join-side priority filter
    must reach the orders scan (not post-join, which would drop unmatched
    customers), and customers with zero qualifying orders must appear in
    the c_count=0 bucket."""
    df = QUERIES["q13_order_distribution"](spark, SF_DIR)
    full = plan_str(df)
    assert "Not(EqualTo(o_orderpriority,5-LOW))" in full
    # Outer-join preservation: every customer lands in exactly one
    # c_count bucket, so the distribution must sum to the customer count
    # (an inner join would silently drop zero-order customers).
    n_cust = load_table(spark, SF_DIR, "customer").count()
    assert sum(r["custdist"] for r in df.collect()) == n_cust


def test_q21_semi_anti_share_order_key_partitioning(spark):
    """Q21's EXISTS/NOT EXISTS must plan as LEFT SEMI + LEFT ANTI hash
    joins on the order key (suppkey inequality as residual), never a
    cartesian, with the top-20 fused to TakeOrderedAndProject."""
    df = QUERIES["q21_waiting_suppliers"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_timezone_independent_results(spark):
    """The driver builds its own SparkSession with an unknown timezone.
    Timestamps in the fixtures are wall-clock (TIMESTAMP_NTZ since the
    r3 regeneration), and every temporal operator uses interval/field
    arithmetic (epoch_seconds, YEAR, date_trunc) rather than
    tz-dependent epoch casts — so the SAME results must come back under
    any session timezone.  Run the temporal-heavy queries under
    America/New_York (a DST timezone) and compare row-for-row with the
    UTC session's answers."""
    keys = ("sessionize_batch", "win_range_frame", "cohort_retention",
            "interarrival_stats", "q7_volume_flows")
    utc_rows = {k: sorted(map(tuple, QUERIES[k](spark, SF_DIR).collect()))
                for k in keys}
    other = spark.newSession()
    other.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for k in keys:
            got = sorted(map(tuple, QUERIES[k](other, SF_DIR).collect()))
            assert got == utc_rows[k], f"{k} differs under America/New_York"
    finally:
        other.conf.set("spark.sql.session.timeZone", "UTC")


def test_q2_broadcasts_min_joinback_and_takes_ordered(spark):
    """q2's equality join-back against the per-part min table must stay a
    broadcast hash join (an SMJ here adds two exchanges on (partkey,
    cost) — the regression this locks out), and the LIMIT must fuse
    into TakeOrderedAndProject."""
    plan = executed_plan(QUERIES["q2_min_cost_supplier"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # dims + min join-back


def test_interval_bucketed_plans_equi_join_only(spark):
    """The bucketed interval join must plan pure equi joins — the whole
    point is avoiding the nested-loop range join."""
    plan = executed_plan(QUERIES["join_interval_bucketed"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_manifest_pruning_actually_skips_files(spark):
    """The manifest must select a strict subset of files for the 6-month
    window, and the pruned aggregate must equal the plain filtered
    aggregate — skipping may lose nothing."""
    from spark_streaming_kafka_offset_spark.operators.scale import (
        LO_SHIP,
        HI_SHIP,
        manifest_pruned_scan,
    )

    pruned, n_read, n_total = manifest_pruned_scan(spark, SF_DIR)
    assert 0 < n_read < n_total
    li = load_table(spark, SF_DIR, "lineitem").where(
        (F.col("l_shipdate") >= LO_SHIP) & (F.col("l_shipdate") < HI_SHIP)
    )
    assert pruned.count() == li.count()


def test_zorder_skips_files_on_both_columns(spark):
    """The Z-ordered layout must skip files for BOTH predicate classes —
    a partkey window AND a date window — and each pruned frame must
    match the plain filtered count (skipping loses nothing).  This is
    the multi-column advantage a single-column range cluster can't
    give."""
    from spark_streaming_kafka_offset_spark.operators.scale import (
        HI_SHIP,
        LO_SHIP,
        PK_HI,
        PK_LO,
        zorder_pruned_scan,
    )

    li = load_table(spark, SF_DIR, "lineitem")
    for pred, cond in [
        ("pk", (F.col("l_partkey") >= PK_LO) & (F.col("l_partkey") <= PK_HI)),
        ("date", (F.col("l_shipdate") >= LO_SHIP) & (F.col("l_shipdate") < HI_SHIP)),
    ]:
        pruned, n_read, n_total = zorder_pruned_scan(spark, SF_DIR, pred)
        assert 0 < n_read < n_total, (pred, n_read, n_total)
        assert pruned.count() == li.where(cond).count(), pred


def test_rfm_scale_variant_has_no_global_sort_or_window(spark):
    """VERDICT r4 #3: the `scale_boundaries=True` path of
    orders_rfm_segments must contain NO Window operator and NO Sort —
    the exact twin funnels the customer frame through three
    single-partition NTILE sorts; the scale path replaces them with a
    percentile_approx boundary broadcast + CASE bucketing.  Both
    variants must agree on total customers and total segment value."""
    from spark_streaming_kafka_offset_spark.operators.analytics_ext import (
        orders_rfm_segments,
    )

    exact = orders_rfm_segments(spark, SF_DIR)
    scale = orders_rfm_segments(spark, SF_DIR, scale_boundaries=True)

    exact_plan = executed_plan(exact)
    scale_plan = executed_plan(scale)
    assert "Window" in exact_plan  # the wall the scale path removes
    assert "Window" not in scale_plan
    assert "Sort" not in scale_plan

    e_rows = exact.collect()
    s_rows = scale.collect()
    assert sum(r["n_customers"] for r in s_rows) == sum(
        r["n_customers"] for r in e_rows
    )
    assert abs(
        sum(r["segment_value"] for r in s_rows)
        - sum(r["segment_value"] for r in e_rows)
    ) < 0.05  # same money, re-binned (per-segment ROUND drift only)
    assert all(
        1 <= r["r_score"] <= 4 and 1 <= r["f_score"] <= 4 and 1 <= r["m_score"] <= 4
        for r in s_rows
    )
    # The continuous monetary axis should still cut near-quarters
    # (ties are the only legal deviation source; monetary has none at
    # fixture scale).
    n = sum(r["n_customers"] for r in s_rows)
    for q in range(1, 5):
        share = sum(r["n_customers"] for r in s_rows if r["m_score"] == q) / n
        assert 0.15 < share < 0.35, (q, share)


def test_asof_nearest_single_shuffle_single_window(spark):
    """Both asof directions must ride ONE union + ONE shuffle + ONE sort:
    Spark fuses the preceding-frame last() and following-frame first()
    into a single Window operator over the same (user_id) exchange —
    the whole point of the single-pass formulation (a two-asof-join
    composition would cost 3 exchanges)."""
    df = QUERIES["join_asof_nearest"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window") == 1, plan
    assert "Join" not in plan  # no self-join of two asof results


def test_containment_prefix_filter_no_array_self_join(spark):
    """dedup_containment must generate candidates through the prefix
    inverted index (shingle equi-joins), never an unblocked corpus
    self-join: every join in the plan is a hash/merge EQUI-join and the
    full shingle arrays appear only on candidate-sized inputs."""
    df = QUERIES["dedup_containment"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_histogram_and_corr_are_single_pass_partial_final(spark):
    """agg_histogram / agg_corr_exact collapse the fact table in one
    partial+final hash aggregate — the rollup-sized tail (share window,
    float corr) must not add a fact-sized exchange."""
    for key in ("agg_histogram", "agg_corr_exact"):
        plan = executed_plan(QUERIES[key](spark, SF_DIR))
        assert plan.count("HashAggregate") >= 2, key
        assert "partial_" in plan, key


def test_rolling_active_no_distinct_over_window(spark):
    """events_rolling_active's whole point: WAU must NOT plan a
    count-distinct-over-window (7-day rescan per output day) — the only
    fact-sized operator is the user-day dedup aggregate; everything
    after runs on session-interval or calendar-sized frames."""
    plan = executed_plan(QUERIES["events_rolling_active"](spark, SF_DIR))
    # a windowed COUNT DISTINCT would appear as a Window with a distinct
    # aggregate; assert no Window carries a count(distinct ...)
    for line in plan.splitlines():
        if "Window" in line:
            assert "distinct" not in line.lower(), line


def test_backlog_sweep_single_fact_agg(spark):
    """orders_backlog_sweep: one partial+final agg pass over the join
    (max shipdate per order); the cumsum window is calendar-sized."""
    plan = executed_plan(QUERIES["orders_backlog_sweep"](spark, SF_DIR))
    assert "HashAggregate" in plan and "partial_" in plan
    assert "CartesianProduct" not in plan


def test_lm_perplexity_broadcasts_model(spark):
    """The scoring join must broadcast the |alphabet|²-bounded model
    onto the token stream — a shuffled scoring join would re-partition
    the corpus by bigram at 100 TB."""
    plan = executed_plan(QUERIES["text_lm_perplexity"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_pattern_match_single_keyed_shuffle(spark):
    """Symbol-string construction is ONE groupBy(user) — no window, no
    extra exchanges: exactly one hashpartitioning on user_id feeds the
    sequence aggregate."""
    plan = executed_plan(QUERIES["events_pattern_match"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_langid_confusion_broadcasts_profiles(spark):
    """Learned profiles (|langs|×10 rows) broadcast to the trigram
    stream; the scoring join must not shuffle the corpus by gram."""
    plan = executed_plan(QUERIES["text_langid_confusion"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_bitmap_distinct_is_pure_partial_final_aggs(spark):
    """Bitmap rollup = three hash aggregates (day words, week words,
    popcount sum) with map-side partials — no window, no join, no sort
    before the output ordering."""
    plan = executed_plan(QUERIES["rollup_bitmap_distinct"](spark, SF_DIR))
    assert "HashAggregate" in plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_cached_reuse_hits_memory_scan(spark):
    """The second consumer of the persisted slice must read
    InMemoryTableScan — a parquet re-read would mean the cache was
    planned around."""
    from spark_streaming_kafka_offset_spark.session import load_table
    from spark_streaming_kafka_offset_spark.common import dec2

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .where(F.col("l_quantity") >= 25)
        .select("l_returnflag", "l_shipdate", dec2("l_extendedprice", 14).alias("p"))
    )
    li.persist()
    try:
        li.groupBy("l_returnflag").count().collect()  # warm the cache
        plan = executed_plan(
            li.groupBy(F.date_format("l_shipdate", "yyyy-MM")).count()
        )
        assert "InMemoryTableScan" in plan
    finally:
        li.unpersist()


def test_audit_sweep_is_clean(spark, audit_frames):
    """Run the SAME plan sweep `tools/audit_plans.py` ships (shared
    policy module) over every batch query: zero unexplained
    CARTESIAN/NLJ/SINGLE/PYUDF flags.  This is the drift-proofing from
    VERDICT r5 #2 — a new operator with an unjustified single-partition
    exchange or nested-loop join fails HERE, and an allowlist edit that
    the tool would reject fails here too, because they are one list."""
    from spark_streaming_kafka_offset_spark.plans.audit import audit_plans

    unexplained = audit_plans(spark, SF_DIR, frames=audit_frames)
    assert not unexplained, unexplained


def test_window_total_order_sweep_is_clean(spark, audit_frames):
    """Run the SAME window total-order sweep `tools/audit_windows.py`
    ships (shared policy module, VERDICT r11 #2 — the eval_rbo tie
    hazard mechanized) over every batch query: every tie-sensitive
    window spec (ROW_NUMBER / NTILE / LAG / LEAD / NTH_VALUE /
    order-dependent or bounded-ROWS aggregates) must either prove a
    TOTAL ordering on the fixture (max tie-group size 1 when grouped
    by partition ∪ order expressions of the window's own child) or
    carry a reviewed tie-immunity proof in TOTAL_ORDER_ALLOWED.  A new
    windowed op whose assumed-unique ordering key is not actually
    unique fails HERE instead of surviving to a ppm-level hash
    divergence at a bigger SF.  The per-round tool runs at sf0.01 and
    sf0.1 (where the r11 hazard actually materialized) are recorded in
    BASELINE.md; this gate keeps the structural invariant every pytest
    run."""
    from spark_streaming_kafka_offset_spark.plans.window_audit import (
        audit_windows,
    )

    unexplained = audit_windows(spark, SF_DIR, frames=audit_frames)
    assert not unexplained, unexplained


def test_aggregate_determinism_sweep_is_clean(spark, audit_frames):
    """Run the SAME aggregate-determinism sweep
    `tools/audit_aggregates.py` ships (shared policy module, r12):
    every SUM/AVG-over-DOUBLE accumulation (IEEE order-dependent —
    the two engines never add in the same order) and every
    collect_list/collect_set site (partition-arrival array order)
    in any batch query's optimized plan must carry a reviewed reason
    (bounded ROUND-absorbed frame, exactly-representable summands,
    sorted-before-read collection).  A new op that accidentally
    accumulates doubles at corpus grain fails HERE instead of
    surfacing as a ulp-level hash flake at a bigger SF — the
    aggregate-grain twin of the window total-order gate above."""
    from spark_streaming_kafka_offset_spark.plans.agg_audit import (
        audit_aggregates,
    )

    unexplained = audit_aggregates(spark, SF_DIR, frames=audit_frames)
    assert not unexplained, unexplained


def test_geo_grid_join_is_hash_equi_join(spark):
    """The spatial join must run as a hash equi-join on the cell id —
    never a cartesian or nested loop over customer x supplier — and the
    distance predicate must remain as a post-join filter."""
    df = QUERIES["join_geo_grid"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cell_lat" in plan  # joined on the grid cell, not the coords


def test_common_neighbors_pairs_via_slot_join(spark):
    """Candidate pairs must come from the slot equi-join (bounded by
    per-slot activity), never an all-pairs user join."""
    df = QUERIES["graph_common_neighbors"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_entity_resolution_joins_on_block_key(spark):
    """Within-block pairing only: the self-join must key on block_key
    (equi) with the name inequality and edit distance as residual
    filters — blocking is the scale design, not an optimization."""
    df = QUERIES["entity_resolution_blocked"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "block_key" in plan


def test_curriculum_order_has_no_global_sort_of_corpus(spark):
    """The curriculum position must be computed from a lang-partitioned
    rank + arithmetic interleave — the ONLY single-partition exchange
    allowed is the |langs|-row index frame, never the documents."""
    df = QUERIES["docs_curriculum_order"](spark, SF_DIR)
    plan = executed_plan(df)
    # The corpus-side rank is partitioned: hashpartitioning on lang.
    assert "hashpartitioning(lang" in plan
    # No global ORDER BY of the documents anywhere in the final plan.
    assert "rangepartitioning" not in plan.lower()


def test_lateral_topk_decorrelates_to_window(spark):
    """The LATERAL ORDER BY+LIMIT subquery must decorrelate into a
    partitioned rank/limit plan — per-outer-row re-execution would be
    O(|nation|) scans and a cartesian would be worse."""
    df = QUERIES["join_lateral_topk"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" in plan or "Limit" in plan


def test_revenue_bridge_single_fact_pass(spark):
    """Both years must come from ONE scan of lineitem (conditional-agg
    pivot), not a self-join of two year-filtered scans."""
    df = QUERIES["revenue_bridge_yoy"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("Scan parquet") <= 3  # lineitem + orders + part, once each


def test_q3_skew_join_posture_splits_hot_partition(spark):
    """Mechanize the BENCH_skew q3 lesson (VERDICT r13 #3) so the tuned
    posture is a gated law, not a documented observation: on a
    Zipf-keyed fixture, `session.skew_join_tuned_confs` must make AQE
    actually SPLIT the hot join partition — the final adaptive plan
    reports `SortMergeJoin(skew=true)` with an `AQEShuffleRead skewed`
    child — while returning row-for-row identical results to the
    stock-AQE run.

    Fixture: tools/gen_sf1.py + tools/gen_skew.py sourced from the
    read-only sf0.1 driver tables (Zipf s=1.2 o_custkey/l_orderkey —
    the exact BENCH_skew fixture), cached under .scratch/{sf1,skew1};
    the first run pays the ~1 min build, later runs reuse it.

    Scaled-down replicas of the production shape, each documented in
    tools/stress_skew.py terms: (a) the skew threshold/advisory shrink
    to 2 MB because the stock 256 MB threshold never fires when the
    whole local shuffle is smaller than one production skewed
    partition; (b) `autoBroadcastJoinThreshold` = -1 on BOTH runs
    because at fixture scale AQE converts the hot join to a runtime
    broadcast (the filtered orders side is megabytes), which a 100 TB
    orders table cannot take — the SMJ is the production plan under
    test; (c) `files.maxPartitionBytes` = 8 MB so the scan has enough
    map splits for AQE to carve the hot partition into map-range
    chunks (a 100 TB scan has thousands of splits anyway)."""
    import os
    import sys

    from spark_streaming_kafka_offset_spark.session import (
        skew_join_tuned_confs,
    )

    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    sf1 = os.path.join(root, ".scratch", "sf1")
    skew1 = os.path.join(root, ".scratch", "skew1")
    argv = sys.argv
    try:
        import tools.gen_sf1 as gen_sf1
        import tools.gen_skew as gen_skew

        sys.argv = ["gen_sf1", sf1]
        gen_sf1.main()
        sys.argv = ["gen_skew", sf1, skew1]
        gen_skew.main()
    finally:
        sys.argv = argv

    shared = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.files.maxPartitionBytes": "8m",
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.enabled": "true",
    }
    restore = {
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "false",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.autoBroadcastJoinThreshold": "10485760",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"
        ),
    }

    def run(extra):
        for k, v in {**shared, **extra}.items():
            spark.conf.set(k, v)
        try:
            df = QUERIES["q3_shipping_priority"](spark, skew1)
            rows = sorted(map(tuple, df.collect()))
            return rows, executed_plan(df)
        finally:
            for k, v in restore.items():
                spark.conf.set(k, v)

    stock_rows, stock_plan = run({})
    tuned = skew_join_tuned_confs(advisory="2m")
    tuned["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"] = "2m"
    tuned_rows, tuned_plan = run(tuned)

    assert "skew=true" in tuned_plan and "skewed" in tuned_plan, (
        "tuned confs did not produce a skew-split join:\n"
        + "\n".join(
            line
            for line in tuned_plan.splitlines()
            if "AQEShuffleRead" in line or "SortMergeJoin" in line
        )
    )
    assert "skew=true" not in stock_plan, (
        "stock AQE now splits this shape on its own; the tuned posture "
        "(session.skew_join_tuned_confs) may be obsolete - re-measure"
    )
    assert tuned_rows == stock_rows, "skew split changed results"
    assert len(tuned_rows) > 0


# --- r14 optimization-round gates: the plan shapes the round's wins ---
# depend on must not drift back (OPTIMIZATION_r14.md #1/#2/#4/#6).


def test_edit_distance_dp_is_spread_not_scan_pipelined(spark):
    """docs_edit_distance's O(len²)-per-pair Levenshtein stage must run
    ABOVE a ref_id hash repartition, never pipelined onto the documents
    scan — the fixtures read as ONE split, so the scan-pipelined form
    runs the whole DP in a single task (measured 4.5 s → 1.1 s at
    sf0.1)."""
    df = QUERIES["docs_edit_distance"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "levenshtein" in plan, plan
    assert "hashpartitioning(ref_id" in plan, plan
    # Tree prints output-first: the DP projection must sit above (before)
    # the rebalance exchange it depends on.
    assert plan.index("levenshtein") < plan.index("hashpartitioning(ref_id"), plan


def test_chrf_single_corpus_pass_pipeline(spark, monkeypatch):
    """docs_chrf's grams→pairs chain is ONE pipeline consuming ONE
    corpus scan (r15): the gram counts have exactly one consumer (the
    inline-role pairing explode), so no checkpoint splits the chain —
    the r14 before-plan carried 24 documents scans for the same logical
    pass.  Exactly: 1 parquet scan (the corpus pass), 2 Generates (the
    3-order gram explode + the role inline), and the staged sizes read
    as checkpointed RDDs.  Stage mode pinned: under
    SSKOS_STAGE_MODE=table the sizes checkpoint is a parquet round-trip
    and the scan-count assertion would fail spuriously (ADVICE r14).
    docs_rouge_n / docs_bleu share the shape via _word_gram_tables /
    _pair_clipped_overlap."""
    monkeypatch.setenv("SSKOS_STAGE_MODE", "local")
    for key in ("docs_chrf", "docs_rouge_n", "docs_bleu"):
        plan = executed_plan(QUERIES[key](spark, SF_DIR))
        assert plan.count("Scan parquet") == 1, (key, plan)
        assert plan.count("Generate") == 2, (key, plan)
        assert "Scan ExistingRDD" in plan, (key, plan)
        assert "SortMergeJoin" not in plan, (key, plan)


def test_dedup_collapse_final_plans_read_staged_groups(spark, monkeypatch):
    """dedup_minhash / multimodal_dedup_phash collapse exact dups with
    min_by(struct) in ONE pass; the group/signature tables are staged,
    so the final pair plans read checkpointed RDDs only — a parquet
    scan here would mean the join-back (a second corpus scan + full
    text/payload shuffle) crept back in."""
    monkeypatch.setenv("SSKOS_STAGE_MODE", "local")
    for key in ("dedup_minhash", "multimodal_dedup_phash"):
        plan = executed_plan(QUERIES[key](spark, SF_DIR))
        assert "Scan parquet" not in plan, (key, plan)
        assert "Scan ExistingRDD" in plan, (key, plan)


def test_pagerank_rollup_is_unsalted_single_level(spark):
    """graph_pagerank's per-iteration rollup is ONE groupBy(dst): SUM is
    algebraic, map-side partials bound hub in-flow, and the r9 salt
    level only bought an extra Exchange per iteration.  The salt
    derivation must not reappear."""
    df = QUERIES["graph_pagerank"](spark, SF_DIR)
    plan = plan_str(df)
    assert "salt" not in plan, plan
    assert "partial_sum" in plan, plan


# --- r15 optimization-round gates (OPTIMIZATION_r15.md) ---


def test_tfidf_grain_is_staged_single_explode(spark, monkeypatch):
    """text_tfidf's (token, doc_id, source) grain is staged, so the
    corpus explode happens exactly once BY CONSTRUCTION: the final
    plan carries ZERO Generate nodes (the explode lives in the staging
    job) and its only parquet scan is the column-pruned n_docs count
    (ReadSchema struct<>).  The r14 unstaged form inlined the grain
    subtree into both rollups — two Generates statically, deduped only
    by runtime AQE exchange reuse."""
    monkeypatch.setenv("SSKOS_STAGE_MODE", "local")
    df = QUERIES["text_tfidf"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "Generate" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan
    assert plan.count("Scan parquet") <= 1, plan  # n_docs count only
    assert "ReadSchema: struct<>" in plan, plan


def test_pagerank_iterations_read_staged_edges_no_smj(spark, monkeypatch):
    """graph_pagerank's r15 edge build stages en via broadcast joins +
    inline, so the iteration plan reads checkpointed edges and no
    SortMergeJoin (the old edges⋈out_w src-keyed join) can re-key the
    edge list into hub-shaped partitions."""
    monkeypatch.setenv("SSKOS_STAGE_MODE", "local")
    df = QUERIES["graph_pagerank"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "Scan parquet" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan
    assert "SortMergeJoin" not in plan, plan
