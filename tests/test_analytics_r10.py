"""Semantic laws for the r10 batch (beyond oracle parity): hard-negative
mining, hashing-trick collision audit, mutual information, l-diversity,
and the integer periodogram.  Oracle hashes prove cross-engine equality;
these prove the operators MEAN what they claim — negatives are the true
cross-label top, collision mass shrinks with width, MI discriminates
dependence from the null fixture, and a planted weekly cycle wins the
spectrum.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from spark_streaming_kafka_offset_spark.plans.registry import QUERIES
from spark_streaming_kafka_offset_spark.session import load_table
from tests.conftest import SF_DIR


def test_hard_negatives_are_true_cross_label_top(spark):
    """Every mined negative carries a different label than its query,
    and the mined set IS the brute-force top-2 different-label
    neighbors under the op's floor+tie rule."""
    rows = QUERIES["sim_hard_negatives"](spark, SF_DIR).collect()
    assert rows and all(r.query_label != r.negative_label for r in rows)
    got = {}
    for r in rows:
        got.setdefault(r.query_id, []).append(r.negative_id)
    assert all(len(v) == 2 for v in got.values())

    e = load_table(spark, SF_DIR, "embeddings").collect()
    ids = np.array([r.vec_id for r in e])
    lab = np.array([r.label for r in e])
    X = np.array([r.embedding for r in e], dtype=np.float64)
    for qid, negs in got.items():
        qi = int(np.where(ids == qid)[0][0])
        cos = np.floor(X[qi] @ X.T * 100000)
        mask = lab != lab[qi]
        order = np.lexsort((ids[mask], -cos[mask]))
        truth = ids[mask][order[:2]].tolist()
        assert negs == truth, (qid, negs, truth)


def test_hashing_collision_laws(spark):
    """Feature count is width-invariant, collision mass is
    non-increasing in width, occupancy is bounded by width, and a
    width below the feature count collides everything (pigeonhole has
    no escape at B=64 for ~900 features)."""
    rows = sorted(
        QUERIES["feat_hashing_collisions"](spark, SF_DIR).collect(),
        key=lambda r: r.n_buckets,
    )
    assert len(rows) == 3
    assert len({r.n_features for r in rows}) == 1
    feats = rows[0].n_features
    for r in rows:
        assert r.n_occupied <= min(r.n_buckets, feats)
        assert r.max_load * r.n_occupied >= feats
        assert 0 <= r.collided_ppm <= 1_000_000
        # features in singleton buckets can never exceed the bucket count
        assert feats - r.n_collided <= r.n_buckets
    assert rows[0].n_collided >= rows[1].n_collided >= rows[2].n_collided
    if feats > rows[0].n_buckets * 1.5:
        assert rows[0].collided_ppm >= 900_000


def _mi_of_cells(cells):
    """Reference MI over (x, y, c) integer cells — the op's formula."""
    n = sum(c for _, _, c in cells)
    cx, cy = {}, {}
    for x, y, c in cells:
        cx[x] = cx.get(x, 0) + c
        cy[y] = cy.get(y, 0) + c
    return sum(
        c / n * math.log(c * n / (cx[x] * cy[y])) for x, y, c in cells
    )


def test_mutual_information_null_fixture_and_discrimination(spark):
    """The fixture is an honest null (value ⊥ event_type): MI must sit
    near zero at $50 bins.  The estimator itself discriminates: an
    exactly-independent constructed table gives MI == 0, a
    deterministic y = f(x) gives MI == H(X) (NMI == 1), and a planted
    type→bucket shift moves MI well off zero."""
    rows = QUERIES["agg_mutual_information"](spark, SF_DIR).collect()
    assert rows
    mi = rows[0].mi_nats
    assert all(r.mi_nats == mi for r in rows), "MI must be a global scalar"
    assert 0 <= mi < 0.02, f"null fixture produced MI={mi}"
    assert {r.n_cell > 0 for r in rows} == {True}

    # exactly independent: c(x,y) = rx * ry  → MI identically 0
    indep = [(x, y, (x + 1) * (y + 2)) for x in range(3) for y in range(4)]
    assert abs(_mi_of_cells(indep)) < 1e-12

    # deterministic: y = x → MI = H(X) = ln(3) at uniform x
    det = [(x, x, 100) for x in range(3)]
    assert abs(_mi_of_cells(det) - math.log(3)) < 1e-12

    # planted shift: one x concentrates in one y
    shifted = indep + [(0, 0, 500)]
    assert _mi_of_cells(shifted) > 0.05


def test_l_diversity_partition_and_exposure_bounds(spark):
    """Class rows partition the customer table, exposure shares are
    ppm-bounded, and both an l=1 band and an l=3+ band genuinely occur
    (the audit is not vacuous on the fixture)."""
    rows = QUERIES["privacy_l_diversity"](spark, SF_DIR).collect()
    n_customers = load_table(spark, SF_DIR, "customer").count()
    assert sum(r.n_rows for r in rows) == n_customers
    bands = {r.l_band for r in rows}
    assert "1" in bands and "3+" in bands
    for r in rows:
        assert 0 <= r.nation_exposed_ppm <= 1_000_000
        assert r.min_class >= 1 and r.n_classes >= 1


def test_periodogram_shares_and_planted_weekly_cycle(spark, tmp_path):
    """Shares are a ppm partition of candidate power on the real
    fixture; on a planted corpus whose daily volume swings with a
    7-day cycle, period 7 must take power rank 1."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    rows = QUERIES["events_periodogram"](spark, SF_DIR).collect()
    assert len(rows) == 9
    assert sorted(r.power_rank for r in rows) == list(range(1, 10))
    total = sum(r.power_share_ppm for r in rows)
    assert 1_000_000 - 9 <= total <= 1_000_000  # floor-div remainders

    # plant: keep every event on day-of-cycle 0, ~28% otherwise
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    day = pc.day_of_year(t["ts"])
    cyc = pc.subtract(day, pc.multiply(pc.divide(day, 7), 7))
    keep = pc.or_(
        pc.equal(cyc, 0),
        pc.equal(
            pc.subtract(
                t["event_id"], pc.multiply(pc.divide(t["event_id"], 7), 7)
            ),
            1,
        ),
    )
    pq.write_table(t.filter(keep), str(tmp_path / "events.parquet"))
    planted = {
        r.period_days: r
        for r in QUERIES["events_periodogram"](spark, str(tmp_path)).collect()
    }
    assert planted[7].power_rank == 1, planted[7]
    assert planted[7].power_share_ppm > 500_000


def test_label_propagation_partitions_the_node_set(spark):
    """Communities partition the graph's node set exactly; the
    customer/supplier mix sums to the size; community ids are node
    ids; the clustering is non-vacuous (more than one community, at
    least one multi-node community)."""
    rows = QUERIES["graph_label_propagation"](spark, SF_DIR).collect()
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    n_nodes = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .select(F.explode(F.array("c", "s")).alias("node"))
        .distinct()
        .count()
    )
    assert sum(r.n_nodes for r in rows) == n_nodes
    assert all(r.n_customers + r.n_suppliers == r.n_nodes for r in rows)
    assert all(r.min_node >= 0 for r in rows)
    assert len(rows) >= 2 and max(r.n_nodes for r in rows) >= 2


def test_bm25_length_normalization_reorders(spark):
    """BM25's length norm must favor the SHORTER document between two
    docs with equal tf of the same term — the property raw tf-idf
    lacks; and the output is the full 5-term × 5-doc grid with
    positive scores."""
    rows = QUERIES["text_bm25_topk"](spark, SF_DIR).collect()
    assert len(rows) == 25
    assert all(r.score_r4 > 0 and r.tf >= 1 and r.dl >= 1 for r in rows)
    terms = {}
    for r in rows:
        terms.setdefault(r.term, []).append(r)
    assert len(terms) == 5
    checked = 0
    for rs in terms.values():
        for a in rs:
            for b in rs:
                if a.tf == b.tf and a.dl < b.dl:
                    assert a.score_r4 >= b.score_r4, (a, b)
                    checked += 1
    assert checked > 0, "fixture lacks equal-tf doc pairs to exercise the law"


def test_conversion_lag_cumulative_laws(spark):
    """Lags are non-negative, the cumulative share is monotone and
    terminates at 1e6 minus floor-division remainders, and converting
    users cannot exceed viewing users."""
    rows = sorted(
        QUERIES["events_conversion_lag"](spark, SF_DIR).collect(),
        key=lambda r: r.lag_hours,
    )
    assert rows and rows[0].lag_hours >= 0
    cums = [r.cum_ppm for r in rows]
    assert cums == sorted(cums)
    assert 1_000_000 - len(rows) <= cums[-1] <= 1_000_000
    n_viewers = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) <= n_viewers


def test_bounce_rate_consistent_with_sessionize(spark):
    """One session definition everywhere: the daily totals must tie out
    against `sessionize_batch`'s session table exactly — same session
    count, same single-event-session count."""
    rows = QUERIES["events_bounce_rate"](spark, SF_DIR).collect()
    sess = QUERIES["sessionize_batch"](spark, SF_DIR).collect()
    assert sum(r.n_sessions for r in rows) == len(sess)
    assert sum(r.n_bounces for r in rows) == sum(
        1 for s in sess if s.n_events == 1
    )
    for r in rows:
        assert 0 <= r.n_bounces <= r.n_sessions <= r.n_events
        assert r.bounce_ppm == r.n_bounces * 1_000_000 // r.n_sessions


def test_raking_converges_to_target_margins(spark):
    """The raking law: after 3 sweeps the achieved column margins match
    the targets exactly (the col sweep ran last) and the row margins
    match within integer-truncation tolerance; cells stay positive and
    the early interaction structure is preserved (no cell zeroes out)."""
    rows = QUERIES["agg_raking_ipf"](spark, SF_DIR).collect()
    assert rows and all(r.raked_e6 > 0 for r in rows)
    from collections import defaultdict

    row_sum, col_sum = defaultdict(int), defaultdict(int)
    row_t, col_t = {}, {}
    for r in rows:
        row_sum[r.priority] += r.raked_e6
        col_sum[r.status] += r.raked_e6
        row_t[r.priority] = r.row_target
        col_t[r.status] = r.col_target
    for y, s in col_sum.items():
        # col sweep ran last: exact up to one truncated e6 unit per cell
        assert abs(s - col_t[y] * 1_000_000) <= len(rows)
    for x, s in row_sum.items():
        # row margins drift by at most the col sweep's rescale spread
        assert abs(s - row_t[x] * 1_000_000) <= row_t[x] * 1_000_000 * 0.05


def test_repeat_purchase_curve_laws(spark):
    """Suffix-sum monotonicity, k=min bucket covers all customers, and
    the orders-share curve dominates the customer-share curve for
    every k > min (repeaters own disproportionately many orders)."""
    rows = sorted(
        QUERIES["orders_repeat_purchase_curve"](spark, SF_DIR).collect(),
        key=lambda r: r.k,
    )
    assert rows[0].customers_ge_k == sum(r.n_customers for r in rows)
    assert 1_000_000 - 1 <= rows[0].cust_ge_k_ppm <= 1_000_000
    ge = [r.customers_ge_k for r in rows]
    assert ge == sorted(ge, reverse=True)
    for r in rows[1:]:
        assert r.orders_ge_k_ppm >= r.cust_ge_k_ppm


def test_sprt_random_walk_and_planted_crossing(spark, tmp_path):
    """On the fixture (true share ≈ 0.20, between the hypotheses) the
    cumulative trial counts are strictly monotone and the LLR follows
    the exact literal arithmetic; on a planted 0.30-share corpus the
    H1 boundary must be crossed and, once crossed at the horizon, stay
    decided at the end."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from spark_streaming_kafka_offset_spark.operators.inference import (
        _SPRT_BOUND,
        _SPRT_LLR_NEG,
        _SPRT_LLR_POS,
    )

    rows = sorted(
        QUERIES["events_sprt_purchase_rate"](spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    ns = [r.n_cum for r in rows]
    assert ns == sorted(ns) and ns[0] > 0
    for r in rows:
        want = round(
            r.s_cum * _SPRT_LLR_POS + (r.n_cum - r.s_cum) * _SPRT_LLR_NEG, 4
        )
        assert abs(r.llr - want) < 1e-9

    # plant: drop ~60% of non-purchases → share rises to ~0.33
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    keep = pc.or_(
        pc.equal(t["event_type"], "purchase"),
        pc.equal(
            pc.subtract(
                t["event_id"],
                pc.multiply(pc.divide(t["event_id"], 5), 5),
            ),
            0,
        ),
    )
    pq.write_table(t.filter(keep), str(tmp_path / "events.parquet"))
    planted = sorted(
        QUERIES["events_sprt_purchase_rate"](
            spark, str(tmp_path)
        ).collect(),
        key=lambda r: r.day,
    )
    assert any(r.decision == "accept_h1" for r in planted), planted[-1]
    assert planted[-1].llr >= _SPRT_BOUND


def test_srm_null_fixture_and_planted_imbalance(spark, tmp_path):
    """Fixture assignment is the design exactly — flag must be 0 and
    shares near 1:1.  A planted corpus whose user population is 60/40
    by parity must fire the flag (the check discriminates)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = QUERIES["events_ab_srm"](spark, SF_DIR).collect()
    assert len(rows) == 2
    assert all(r.srm_flag == 0 for r in rows), rows
    assert sum(r.n_users for r in rows) > 0

    t = pq.read_table(f"{SF_DIR}/events.parquet")
    n = t.num_rows
    uids = [
        2 * (i % 300) if i % 5 < 3 else 2 * (i % 200) + 1 for i in range(n)
    ]
    t = t.set_column(
        t.schema.get_field_index("user_id"),
        "user_id",
        pa.array(uids, t.schema.field("user_id").type),
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    planted = QUERIES["events_ab_srm"](spark, str(tmp_path)).collect()
    # gcd(300,5)=gcd(200,5)=5 pins i%5 to r%5: 180 even / 80 odd users
    assert {r.n_users for r in planted} == {180, 80}
    assert all(r.srm_flag == 1 for r in planted), planted


def test_cochran_armitage_null_and_planted_trend(spark, tmp_path):
    """Fixture purchase share is flat across value buckets (the MI
    null): |z| must sit inside a generous null band.  Planted
    dose-response (low-value purchases removed) must blow |z| past
    1.96 — the trend test discriminates where flatness holds."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    rows = QUERIES["agg_trend_cochran_armitage"](spark, SF_DIR).collect()
    assert rows
    z = rows[0].z_trend
    assert all(r.z_trend == z for r in rows), "z must be a global scalar"
    assert abs(z) < 3.0, f"null fixture rejected the trend test: z={z}"
    assert sum(r.n for r in rows) > 0 and len(rows) >= 5

    # deterministic dose-response: positive iff value >= 100
    import pyarrow as pa

    t = pq.read_table(f"{SF_DIR}/events.parquet")
    vals = t["value"].to_pylist()
    etype = pa.array(
        ["purchase" if v is not None and v >= 100.0 else "view" for v in vals],
        t.schema.field("event_type").type,
    )
    t = t.set_column(
        t.schema.get_field_index("event_type"), "event_type", etype
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    planted = QUERIES["agg_trend_cochran_armitage"](
        spark, str(tmp_path)
    ).collect()
    assert planted[0].z_trend > 10, planted[0]


def test_negbin_dispersion_identity_and_planted_burst(spark, tmp_path):
    """mean_e6 is the exact integer mean, the flag agrees with the
    dispersion sign, the fixture sits in the documented small-sample
    null band, and a planted 3-day burst corpus (97% of volume on 3
    days, a 1-per-day trickle elsewhere) fires every type's flag with
    alpha several times past that band (probed 0.93-1.72)."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = QUERIES["agg_negbin_overdispersion"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.mean_e6 == r.total * 1_000_000 // r.n_days
        assert (r.dispersion > 0) == (r.overdispersed == 1) or r.dispersion == 0
        assert abs(r.dispersion) < 0.15  # the probed small-sample null band

    t = pq.read_table(f"{SF_DIR}/events.parquet")
    n = t.num_rows
    base = _dt.datetime(2024, 1, 1)
    days = [
        (4 + i % 26) if i % 40 == 0 else (1 + i % 3) for i in range(n)
    ]
    ts = pa.array(
        [base + _dt.timedelta(days=d - 1, seconds=i % 86400)
         for i, d in enumerate(days)],
        t.schema.field("ts").type,
    )
    t = t.set_column(t.schema.get_field_index("ts"), "ts", ts)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    planted = QUERIES["agg_negbin_overdispersion"](
        spark, str(tmp_path)
    ).collect()
    assert all(r.overdispersed == 1 and r.dispersion > 0.5 for r in planted)


def test_t_closeness_bounds_and_planted_pure_class(spark, tmp_path):
    """Exposure shares are ppm-bounded and class counts match the QI
    rollup; on a planted release where nation 0 is a single pure-FURN
    class (25% of rows) while nations 1-3 carry the balanced mix, the
    pure class's TVD must equal 1 − p_global(FURN) exactly in ppm and
    be flagged, while balanced nations stay clean."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = QUERIES["privacy_t_closeness"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.exposed_rows_ppm <= 1_000_000
        assert 0 <= r.classes_over_t <= r.n_classes
        assert 0 <= r.max_tvd_ppm <= 1_000_000

    # planted: 4 nations x 30 customers, all in ONE balance band.
    # nation 0: all FURNITURE.  nations 1-3: 6 of each of 5 segments.
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    recs = []
    k = 0
    for nat in range(4):
        for i in range(30):
            seg = "FURNITURE" if nat == 0 else segs[i % 5]
            recs.append((k, f"c{k}", nat, 100.0, seg))
            k += 1
    tbl = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in recs], pa.int64()),
            "c_name": pa.array([r[1] for r in recs], pa.string()),
            "c_nationkey": pa.array([r[2] for r in recs], pa.int32()),
            "c_acctbal": pa.array([r[3] for r in recs], pa.float64()),
            "c_mktsegment": pa.array([r[4] for r in recs], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "customer.parquet"))
    out = {
        r.c_nationkey: r
        for r in QUERIES["privacy_t_closeness"](spark, str(tmp_path)).collect()
    }
    # global FURN share = (30 + 18)/120; the pure class's
    # TVD = ½(|1−p| + Σ_{s≠FURN} p_s) = 1 − p_FURN exactly
    assert out[0].max_tvd_ppm == 1_000_000 - 48 * 1_000_000 // 120 == 600_000
    assert out[0].classes_over_t == 1 and out[0].exposed_rows_ppm == 1_000_000
    for nat in (1, 2, 3):
        assert out[nat].classes_over_t == 0, out[nat]
        assert out[nat].max_tvd_ppm < 350_000


def test_forget_user_purge_conservation_and_zero_residual(spark):
    """Per table, purge + kept must equal the table's row count; the
    verifying residual is 0; and the request set is non-vacuous (the
    events purge count covers every row of every requested user)."""
    rows = {
        r.table_name: r
        for r in QUERIES["privacy_forget_user_purge"](spark, SF_DIR).collect()
    }
    assert set(rows) == {"events", "customer", "orders_cascade"}
    e = load_table(spark, SF_DIR, "events")
    c = load_table(spark, SF_DIR, "customer")
    o = load_table(spark, SF_DIR, "orders")
    assert rows["events"].rows_to_purge + rows["events"].rows_kept == e.count()
    assert rows["customer"].rows_to_purge + rows["customer"].rows_kept == c.count()
    assert (
        rows["orders_cascade"].rows_to_purge
        + rows["orders_cascade"].rows_kept
        == o.count()
    )
    assert all(r.residual_after_purge == 0 for r in rows.values())
    direct = e.where(F.col("user_id") % 97 == 0).count()
    assert rows["events"].rows_to_purge == direct and direct > 0


def test_gumbel_fit_matches_numpy_moments(spark):
    """β and μ must equal the method-of-moments fit recomputed from the
    raw block maxima (population std, √6/π and γ literals), and μ must
    sit inside the observed maxima range for every type."""
    import numpy as np

    from spark_streaming_kafka_offset_spark.operators.statistics import (
        _GUMBEL_EULER,
        _GUMBEL_SQRT6_PI,
    )

    out = {r.event_type: r for r in QUERIES["agg_gumbel_peak_fit"](spark, SF_DIR).collect()}
    e = load_table(spark, SF_DIR, "events")
    bm = (
        e.groupBy("event_type", F.to_date("ts").alias("d"), F.hour("ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("event_type", "d")
        .agg(F.max("c").alias("m"))
        .collect()
    )
    by_type = {}
    for r in bm:
        by_type.setdefault(r.event_type, []).append(r.m)
    for t, ms in by_type.items():
        a = np.array(ms, dtype=np.float64)
        beta = a.std() * _GUMBEL_SQRT6_PI  # population std
        mu = a.mean() - _GUMBEL_EULER * beta
        assert abs(out[t].beta - round(beta, 4)) <= 1e-4, (t, out[t].beta, beta)
        assert abs(out[t].mu - round(mu, 4)) <= 1e-4
        assert a.min() <= out[t].mu <= a.max()
        assert out[t].beta > 0


def test_rouge_identity_and_ordering_laws(spark):
    """ROUGE laws: identical texts must score F1 = 1e6 exactly (run the
    op's arithmetic on a constructed self-pair), bigram means never
    exceed unigram means on the fixture (subsequence containment), and
    all ppms are bounded."""
    rows = {
        r.n_gram: r for r in QUERIES["docs_rouge_n"](spark, SF_DIR).collect()
    }
    assert set(rows) == {1, 2}
    for r in rows.values():
        for v in (r.mean_recall_ppm, r.mean_precision_ppm, r.mean_f1_ppm):
            assert 0 <= v <= 1_000_000
        assert 0 <= r.zero_overlap_pairs <= r.n_pairs
    assert rows[2].mean_f1_ppm <= rows[1].mean_f1_ppm
    assert rows[2].zero_overlap_pairs >= rows[1].zero_overlap_pairs
    # identity: ov == ref_n == cand_n → F1 ppm = 2·n·1e6 // 2n = 1e6
    n = 17
    assert 2 * n * 1_000_000 // (n + n) == 1_000_000


def test_instruction_format_check_recovers_partition(spark):
    """The classifier must recover the staged thirds exactly: per
    source, well_formed == |doc_id%3==0|, malformed == |%3==1|,
    plain == |%3==2|, and shares sum to ~1e6 per source."""
    rows = QUERIES["docs_instruction_format_check"](spark, SF_DIR).collect()
    d = load_table(spark, SF_DIR, "documents")
    want = {
        (r["source"], ("well_formed", "malformed", "plain")[r["res"]]): r["n"]
        for r in d.groupBy(
            "source", (F.col("doc_id") % 3).alias("res")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r.source, r.status): r.n_docs for r in rows}
    assert got == want
    from collections import defaultdict

    share = defaultdict(int)
    for r in rows:
        share[r.source] += r.share_ppm
    for s, tot in share.items():
        assert 1_000_000 - 3 <= tot <= 1_000_000


def test_holt_winters_matches_direct_recursion_and_tracks_cycle(
    spark, tmp_path
):
    """The filter-form forecast must equal the direct (α, β, γ)
    recursion run in numpy on the fixture's daily counts; on a planted
    7-day cycle the forecast must track the phase — the mean forecast
    of high-phase horizons exceeds low-phase ones by a wide margin."""
    import datetime as _dt

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_streaming_kafka_offset_spark.operators.statistics import (
        _HW_ALPHA,
        _HW_BETA,
        _HW_GAMMA,
        _HW_SEASON,
        _HW_T,
    )

    def direct(y):
        l = y[:7].mean()
        b = (y[7:14].mean() - y[:7].mean()) / 7
        s = [y[p] - l for p in range(7)]
        for t in range(7, _HW_T):
            p = t % _HW_SEASON
            ln = _HW_ALPHA * (y[t] - s[p]) + (1 - _HW_ALPHA) * (l + b)
            b = _HW_BETA * (ln - l) + (1 - _HW_BETA) * b
            s[p] = _HW_GAMMA * (y[t] - ln) + (1 - _HW_GAMMA) * s[p]
            l = ln
        return l, b, s

    rows = sorted(
        QUERIES["events_holt_winters_forecast"](spark, SF_DIR).collect(),
        key=lambda r: r.horizon,
    )
    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("d")
        .collect()
    )
    # r11 (ADVICE r10): the filter consumes the LAST 30 daily counts.
    y = np.array([r.c for r in daily], dtype=np.float64)[-_HW_T:]
    l, b, s = direct(y)
    for r in rows:
        want = l + r.horizon * b + s[(_HW_T - 1 + r.horizon) % _HW_SEASON]
        assert abs(r.forecast - round(want, 2)) <= 0.02, (r, want)

    # planted weekly cycle: days with (day_index % 7) == 0 carry ~4x
    # the volume of other days.
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    n = t.num_rows
    base = _dt.datetime(2024, 1, 1)
    days = [
        (1 + (i % 5) * 7) if i % 2 == 0 else (1 + i % 28) for i in range(n)
    ]
    ts = pa.array(
        [base + _dt.timedelta(days=d - 1, seconds=i % 80000)
         for i, d in enumerate(days)],
        t.schema.field("ts").type,
    )
    t = t.set_column(t.schema.get_field_index("ts"), "ts", ts)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    planted = {
        r.season_slot: r.forecast
        for r in QUERIES["events_holt_winters_forecast"](
            spark, str(tmp_path)
        ).collect()
    }
    # End-indexed j (r11): the planted span is days 1..29, so
    # j = 29 - (29 - d) = d and the high-volume days {1,8,15,22,29}
    # land on season slot d % 7 == 1.
    high = planted[1]
    others = [v for k, v in planted.items() if k != 1]
    assert high > 2 * max(others), (high, others)


def test_price_elasticity_null_and_planted_elastic_frame(spark):
    """Fixture qty is independent of price: every slope sits near 0.
    The same quantized normal-equation arithmetic run on a constructed
    qty = c·price^(−1.5) frame must recover −1.5 within quantization
    error — the estimator discriminates."""
    import math

    rows = QUERIES["orders_price_elasticity"](spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs(r.elasticity) < 0.05, r

    # Same arithmetic as the r11 formulation: e6-floored ln on the x
    # side (the literal-lookup quantization), raw double ln on the y
    # side, e-6 rescale on the slope.
    prices = [10.0 + 7.3 * i for i in range(200)]
    pairs = [(1000.0 * p ** -1.5, p) for p in prices]
    lx = [math.floor(math.log(q) * 1e6) for q, _ in pairs]
    ly = [math.log(p) for _, p in pairs]
    n = len(pairs)
    sx, sy = sum(lx), sum(ly)
    sxy = sum(a * b for a, b in zip(lx, ly))
    syy = sum(b * b for b in ly)
    slope = (n * sxy - sx * sy) * 1e-6 / (n * syy - sy * sy)
    assert abs(slope + 1.5) < 1e-3


def test_luhn_recovers_staged_partition(spark):
    """The validator must classify exactly the staged thirds: docs with
    doc_id%2==0 valid, %4==1 invalid, the rest none — and the Luhn
    property holds (the single-digit corruption never verifies)."""
    rows = QUERIES["fn_luhn_checksum"](spark, SF_DIR).collect()
    d = load_table(spark, SF_DIR, "documents")
    res = F.when(F.col("doc_id") % 2 == 0, "valid").when(
        F.col("doc_id") % 4 == 1, "invalid"
    ).otherwise("none")
    want = {
        (r["source"], r["st"]): r["n"]
        for r in d.groupBy("source", res.alias("st"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r.source, r.status): r.n_docs for r in rows}
    assert got == want


def test_hodges_lehmann_bounds_and_robustness(spark):
    """HL must sit inside [min, max] of the daily counts, within the
    data's central range (sanity vs the plain median), and the
    estimator's defining robustness shows on a constructed frame: one
    wild outlier moves the mean far but the HL pseudo-median barely."""
    import numpy as np

    rows = QUERIES["events_hodges_lehmann_daily"](spark, SF_DIR).collect()
    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_type = {}
    for r in daily:
        by_type.setdefault(r.event_type, []).append(r.c)
    assert {r.event_type for r in rows} == set(by_type)
    for r in rows:
        xs = by_type[r.event_type]
        assert min(xs) <= r.hodges_lehmann <= max(xs)
        assert abs(r.hodges_lehmann - r.plain_median) <= (max(xs) - min(xs))
        # independent recompute: lower median of Walsh sums / 2
        ws = sorted(
            xs[i] + xs[j] for i in range(len(xs)) for j in range(i, len(xs))
        )
        hl = ws[(len(ws) + 1) // 2 - 1] / 2
        assert r.hodges_lehmann == round(hl, 1)
    # robustness: an outlier of +1000 moves the mean by ~32x more
    base = [30, 31, 29, 33, 28, 30, 32, 31, 29, 30]
    spiked = base[:-1] + [1030]
    def hl_of(xs):
        ws = sorted(
            xs[i] + xs[j] for i in range(len(xs)) for j in range(i, len(xs))
        )
        return ws[(len(ws) + 1) // 2 - 1] / 2
    assert abs(hl_of(spiked) - hl_of(base)) < 3
    assert abs(np.mean(spiked) - np.mean(base)) > 90


def test_runs_test_null_and_planted_patterns(spark):
    """Fixture day-over-day moves are independent: |z| must sit in a
    generous null band and counts must tie out.  The statistic itself
    discriminates: a strictly alternating series maximizes runs
    (z > 0), a single-trend series minimizes them (z < 0)."""
    (r,) = QUERIES["events_runs_test"](spark, SF_DIR).collect()
    assert r.n_up + r.n_down == r.n_moves
    assert 1 <= r.n_runs <= r.n_moves
    assert abs(r.z) < 3.0, r

    def z_of(signs):
        n_up = sum(signs)
        n_down = len(signs) - n_up
        n = len(signs)
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        er = 2.0 * n_up * n_down / n + 1
        var = (er - 1) * (er - 2) / (n - 1)
        return (runs - er) / var ** 0.5

    assert z_of([1, 0] * 15) > 3
    assert z_of([1] * 15 + [0] * 15) < -3


def test_oov_rate_split_discipline_and_bounds(spark):
    """OOV shares are ppm-bounded, token totals tie out against the
    odd-half corpus, and the audit is non-vacuous in both directions
    (some OOV mass exists because K=20 < the ~31-word vocab, and most
    mass is in-vocab because the top-20 dominates a Zipf-ish corpus)."""
    rows = QUERIES["corpus_tokenizer_oov_rate"](spark, SF_DIR).collect()
    d = load_table(spark, SF_DIR, "documents")
    odd_tokens = (
        d.where(F.col("doc_id") % 2 == 1)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .count()
    )
    assert sum(r.n_tokens for r in rows) == odd_tokens
    assert all(0 <= r.oov_ppm <= 1_000_000 for r in rows)
    assert all(r.n_oov <= r.n_tokens for r in rows)
    assert sum(r.n_oov for r in rows) > 0, "vacuous: no OOV mass"
    total_oov = sum(r.n_oov for r in rows)
    assert total_oov < odd_tokens * 0.8, "vocab covers too little"
    assert all(r.n_oov_types >= (1 if r.n_oov else 0) for r in rows)
