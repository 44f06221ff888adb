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


def test_grouped_ols_matches_numpy_and_residual_identity(spark):
    """Slope/intercept/R² must agree with an independent numpy OLS per
    group (to the reported rounding), and R² must lie in [0, 1e6] ppm."""
    import numpy as np

    rows = QUERIES["agg_grouped_ols"](spark, SF_DIR).collect()
    assert rows, "no OLS groups"
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("long").alias("x"),
            F.round("l_extendedprice").cast("long").alias("y"),
        )
        .collect()
    )
    by_grp: dict = {}
    for r in li:
        by_grp.setdefault((r.l_returnflag, r.l_linestatus), []).append(
            (r.x, r.y)
        )
    for r in rows:
        pts = np.array(by_grp[(r.l_returnflag, r.l_linestatus)], dtype=float)
        x, y = pts[:, 0], pts[:, 1]
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r.slope_usd_per_unit - slope) < 1e-3
        assert abs(r.intercept_usd - intercept) < 0.05
        rr = np.corrcoef(x, y)[0, 1] ** 2
        assert abs(r.r2_ppm - rr * 1e6) <= 1.0
        assert 0 <= r.r2_ppm <= 1_000_000
        assert r.n == len(pts)


def test_cuped_adjustment_preserves_pooled_mean(spark):
    """CUPED is mean-preserving in the pool: Σ n_v·(adj_v − raw_v) ≈ 0
    (the θ(X̄v − X̄) corrections cancel when weighted by n_v), and the
    variance-reduction ppm must be in [0, 1e6]."""
    rows = QUERIES["events_ab_cuped"](spark, SF_DIR).collect()
    assert len(rows) == 2
    shift = sum(
        r.n_users * (r.mean_y_adj_cents - r.mean_y_cents) for r in rows
    )
    total_n = sum(r.n_users for r in rows)
    assert abs(shift) / total_n < 0.05, "CUPED must preserve pooled mean"
    for r in rows:
        assert 0 <= r.var_reduction_ppm <= 1_000_000
        assert rows[0].theta == rows[1].theta


def test_cross_correlation_lag0_is_pearson_and_bounded(spark):
    """r(0) must equal an independently computed Pearson correlation of
    the zero-filled daily series; every r_ppm must lie in [-1e6, 1e6];
    n_days must equal D - |lag|."""
    import numpy as np

    rows = {
        r.lag: r
        for r in QUERIES["events_cross_correlation"](spark, SF_DIR).collect()
    }
    assert set(rows) == set(range(-7, 8))
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("a"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("b"),
        )
        .collect()
    )
    days = sorted(r.day for r in daily)
    lo, hi = days[0], days[-1]
    ndays = (hi - lo).days + 1
    a = [0] * ndays
    b = [0] * ndays
    for r in daily:
        a[(r.day - lo).days] = r.a
        b[(r.day - lo).days] = r.b
    r0 = np.corrcoef(a, b)[0, 1]
    assert abs(rows[0].r_ppm - round(r0 * 1e6)) <= 1
    for lag, r in rows.items():
        assert r.n_days == ndays - abs(lag)
        assert -1_000_000 <= r.r_ppm <= 1_000_000


def test_hdr_histogram_covers_all_gaps_and_percentiles_order(spark):
    """Bucket counts must sum to the number of gaps >= 1 s, bucket
    bounds must be [2^b, 2^(b+1)-1], and the percentile upper bounds
    must be non-decreasing in q and each equal to some bucket's hi."""
    rows = sorted(
        QUERIES["agg_hdr_histogram"](spark, SF_DIR).collect(),
        key=lambda r: r.bucket,
    )
    assert rows
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    n_gaps = (
        e.select(
            (
                F.unix_timestamp(F.col("ts").cast("timestamp"))
                - F.unix_timestamp(F.lag("ts").over(w).cast("timestamp"))
            ).alias("gap_s")
        )
        .where(F.col("gap_s") >= 1)
        .count()
    )
    assert sum(r.cnt for r in rows) == n_gaps
    assert rows[-1].cum == n_gaps
    his = {r.hi_s for r in rows}
    p = rows[0]
    assert p.p50_hi_s <= p.p90_hi_s <= p.p99_hi_s
    for q in ("p50_hi_s", "p90_hi_s", "p99_hi_s"):
        assert getattr(p, q) in his
    for r in rows:
        assert r.lo_s == 2 ** r.bucket
        assert r.hi_s == 2 ** (r.bucket + 1) - 1


def test_countmin_never_underestimates_and_matches_brute_force(spark):
    """CMS structural guarantee: estimate >= exact for EVERY key (not
    just the top-10) — verified by rebuilding the 256-cell table in
    Python from the exact per-user counts and taking the min over each
    user's 4 cells; the operator's top-10 must agree with the brute
    force."""
    import hashlib

    rows = QUERIES["agg_countmin_heavyhitters"](spark, SF_DIR).collect()
    assert len(rows) == 10
    ug = {
        r.user_id: r.cnt
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }

    def coords(uid):
        return [
            int(hashlib.md5(f"{uid}:{i}".encode()).hexdigest()[:15], 16) % 64
            for i in range(4)
        ]

    cells: dict = {}
    for uid, cnt in ug.items():
        for i, cell in enumerate(coords(uid)):
            cells[(i, cell)] = cells.get((i, cell), 0) + cnt
    for r in rows:
        est = min(cells[(i, cell)] for i, cell in enumerate(coords(r.user_id)))
        assert r.exact_cnt == ug[r.user_id]
        assert r.cms_est == est
        assert r.overcount == est - r.exact_cnt >= 0
    # the structural bound holds for every key, not only the reported ones
    for uid, cnt in ug.items():
        est = min(cells[(i, cell)] for i, cell in enumerate(coords(uid)))
        assert est >= cnt


def test_ip_cidr_lpm_partitions_address_space(spark):
    """LPM classification must PARTITION the customers: block counts sum
    to |customer|, every min/max address must actually lie inside its
    block's range, and nesting must be observable (the /3 block count
    excludes the /5 sub-block)."""
    rows = {
        r.block: r for r in QUERIES["fn_ip_cidr"](spark, SF_DIR).collect()
    }
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert sum(r.n_ips for r in rows.values()) == n_cust
    from spark_streaming_kafka_offset_spark.functions.scalar import (
        _CIDR_KEYED,
    )

    for name, _, p, key in _CIDR_KEYED:
        r = rows[name]
        assert r.prefix_len == p
        if p:
            lo = key * (1 << (32 - p))
            hi = lo + (1 << (32 - p)) - 1
            assert lo <= r.min_ip_int <= r.max_ip_int <= hi
        parts = [int(x) for x in r.min_ip_str.split(".")]
        assert len(parts) == 4 and all(0 <= x <= 255 for x in parts)
        assert (
            (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]
        ) == r.min_ip_int
    assert rows["slice-168/5"].n_ips > 0, "nested /5 must have population"


def test_welch_ttest_matches_scipy_free_reference(spark):
    """t and df must match an independent Python computation from raw
    data (Welch's formulas, float64), and the conditional-sum identity
    n_a + n_b = filtered row count must hold."""
    r = QUERIES["agg_welch_ttest"](spark, SF_DIR).collect()[0]
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_mktsegment", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
        .collect()
    )
    a = [x.cents for x in rows if x.c_mktsegment == "BUILDING"]
    b = [x.cents for x in rows if x.c_mktsegment == "MACHINERY"]
    assert (r.n_a, r.n_b) == (len(a), len(b))
    import statistics

    va, vb = statistics.variance(a), statistics.variance(b)
    se2 = va / len(a) + vb / len(b)
    t = (statistics.fmean(a) - statistics.fmean(b)) / se2**0.5
    df = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert abs(r.t_stat - t) < 1e-4
    assert abs(r.df_welch - df) < 0.5


def test_preference_pairs_are_extremes_with_positive_margin(spark):
    """Every pair's chosen must be the group's argmax and rejected the
    argmin under the (score, doc_id) total order, margins positive, and
    every >=2-doc group with score spread must be present."""
    rows = QUERIES["docs_preference_pairs"](spark, SF_DIR).collect()
    assert rows
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.length("text") > 0)
        .select(
            "lang",
            "source",
            "doc_id",
            F.expr(
                "(length(text) - length(replace(text, ' ', '')) + 1)"
                " * 1000000 div length(text)"
            ).alias("s"),
        )
        .collect()
    )
    groups: dict = {}
    for d in docs:
        groups.setdefault((d.lang, d.source), []).append((d.s, d.doc_id))
    expected = 0
    for g, members in groups.items():
        if len(members) < 2:
            continue
        top = max(members, key=lambda t: (t[0], -t[1]))
        bot = min(members, key=lambda t: (t[0], -t[1]))
        if top[0] > bot[0]:
            expected += 1
    assert len(rows) == expected
    for r in rows:
        members = groups[(r.lang, r.source)]
        top = max(members, key=lambda t: (t[0], -t[1]))
        bot = min(members, key=lambda t: (t[0], -t[1]))
        assert (r.chosen_score, r.chosen_doc) == (top[0], top[1])
        assert (r.rejected_score, r.rejected_doc) == (bot[0], bot[1])
        assert r.margin_ppm == r.chosen_score - r.rejected_score > 0
        assert r.grp_n == len(members)


def test_rake_keywords_against_pure_python_rake(spark):
    """The top-20 must equal a from-scratch Python RAKE over the same
    corpus with the same stopword list, cap, and integer arithmetic."""
    import re
    from spark_streaming_kafka_offset_spark.functions.text import (
        _RAKE_MAX_WORDS,
        _RAKE_STOPS,
        _RAKE_TOPK,
    )

    rows = QUERIES["text_rake_keywords"](spark, SF_DIR).collect()
    assert len(rows) == _RAKE_TOPK
    texts = [
        r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    stop_re = re.compile(r"\b(" + _RAKE_STOPS + r")\b")
    phrases = []
    for t in texts:
        seg = re.sub("[^a-z ]", "|", t.lower())
        seg = stop_re.sub("|", seg)
        for p in seg.split("|"):
            p = re.sub(" +", " ", p).strip()
            if p and p.count(" ") + 1 <= _RAKE_MAX_WORDS:
                phrases.append(p)
    freq: dict = {}
    degree: dict = {}
    for p in phrases:
        ws = p.split(" ")
        for w in ws:
            freq[w] = freq.get(w, 0) + 1
            degree[w] = degree.get(w, 0) + len(ws)
    from collections import Counter

    occ = Counter(phrases)
    scored = []
    for p, k in occ.items():
        ws = p.split(" ")
        total = sum(degree[w] * 1_000_000 // freq[w] for w in ws) * k
        scored.append((total // k, k, p, len(ws)))
    scored.sort(key=lambda t: (-t[0], -t[1], t[2]))
    for r, (score, k, p, nw) in zip(rows, scored[:_RAKE_TOPK]):
        assert (r.phrase, r.n_words, r.n_occurrences, r.score_ppm) == (
            p,
            nw,
            k,
            score,
        )


def test_chain_ladder_identities(spark):
    """Fully-observed cohorts (base_age = 8) must have ultimate =
    observed and completion exactly 1e6; censored cohorts must forecast
    ultimate >= observed when all factors >= 1 (check factors first);
    and each cohort's base_age must equal min(cutoff - cohort, 8)."""
    rows = QUERIES["orders_chain_ladder"](spark, SF_DIR).collect()
    assert rows
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym")
    )
    cutoff = o.agg(F.max("ym")).collect()[0][0]
    saw_censored = saw_full = False
    for r in rows:
        assert r.base_age == min(cutoff - r.cohort_month, 8)
        if r.base_age == 8:
            saw_full = True
            assert r.ultimate8_cents == r.observed_cum_cents
            assert r.completion_ppm == 1_000_000
        else:
            saw_censored = True
            # development factors are >= 1 (cumulative spend grows), so
            # the rolled-forward ultimate must dominate the observed.
            assert r.ultimate8_cents >= r.observed_cum_cents
            assert r.completion_ppm <= 1_000_000
    assert saw_full, "triangle must have fully-observed cohorts"
    if not saw_censored:
        # sf0.001's newest cohort predates the cutoff by > 8 months, so
        # the censored regime only appears at sf0.01+ — check it there.
        rows01 = QUERIES["orders_chain_ladder"](
            spark, "/root/testdata/sf0.01"
        ).collect()
        censored = [r for r in rows01 if r.base_age < 8]
        assert censored, "sf0.01 triangle must have censored cohorts"
        assert all(
            r.ultimate8_cents >= r.observed_cum_cents
            and r.completion_ppm < 1_000_000
            for r in censored
        )


# ---- §2.26 ordinal statistics & Shapley attribution ----


def test_spearman_matches_python_rank_pearson(spark):
    """rho must equal an independent pure-Python Spearman (tie-averaged
    ranks + Pearson) on the same binned pairs, and the doubled-rank
    identity sum(c*drx) = n(n+1) must hold per group."""
    rows = {
        r.l_returnflag: r
        for r in QUERIES["agg_spearman_corr"](spark, SF_DIR).collect()
    }
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("long").alias("x"),
            F.expr(
                "(CAST(l_quantity AS BIGINT)"
                " * CAST(ROUND(l_extendedprice * 100) AS BIGINT))"
                " div 1000000"
            ).alias("y"),
        )
        .collect()
    )
    groups: dict = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append((r.x, r.y))

    def doubled_ranks(vals):
        # doubled tie-averaged rank per distinct value
        from collections import Counter

        cnt = Counter(vals)
        dr, cum = {}, 0
        for v in sorted(cnt):
            dr[v] = 2 * cum + cnt[v] + 1
            cum += cnt[v]
        return dr

    for flag, pairs in groups.items():
        n = len(pairs)
        drx = doubled_ranks([p[0] for p in pairs])
        dry = doubled_ranks([p[1] for p in pairs])
        assert sum(drx[p[0]] for p in pairs) == n * (n + 1)
        assert sum(dry[p[1]] for p in pairs) == n * (n + 1)
        sx = sum(drx[p[0]] for p in pairs)
        sy = sum(dry[p[1]] for p in pairs)
        sxx = sum(drx[p[0]] ** 2 for p in pairs)
        syy = sum(dry[p[1]] ** 2 for p in pairs)
        sxy = sum(drx[p[0]] * dry[p[1]] for p in pairs)
        num = n * sxy - sx * sy
        rho = num / ((n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5)
        assert abs(rows[flag].spearman_rho - rho) < 2e-6
        assert rows[flag].n == n


def test_kendall_matches_brute_force(spark):
    """Concordance counts and tau-b must equal an O(m^2) brute force
    over the month rollup, and tau-b must sit in [-1, 1]."""
    r = QUERIES["agg_kendall_tau"](spark, SF_DIR).collect()[0]
    m = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(
            F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("mon")
        )
        .agg(
            F.count(F.lit(1)).alias("no"),
            F.sum(F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT)")).alias(
                "rev"
            ),
        )
        .collect()
    )
    mm = sorted((x.mon, x.no, x.rev) for x in m)
    C = D = tx = ty = pairs = 0
    for i in range(len(mm)):
        for j in range(i + 1, len(mm)):
            pairs += 1
            p = (mm[i][1] - mm[j][1]) * (mm[i][2] - mm[j][2])
            C += p > 0
            D += p < 0
            tx += mm[i][1] == mm[j][1]
            ty += mm[i][2] == mm[j][2]
    assert (r.n_months, r.n_pairs) == (len(mm), pairs)
    assert (r.concordant, r.discordant, r.ties_x, r.ties_y) == (C, D, tx, ty)
    tau = (C - D) / ((pairs - tx) ** 0.5 * (pairs - ty) ** 0.5)
    assert abs(r.tau_b - tau) < 2e-6
    assert -1.0 <= r.tau_b <= 1.0


def test_shapley_matches_permutation_brute_force(spark):
    """phi_c x24 must equal the 4!-permutation brute force over the
    any-touch coalition game built from per-converter masks, and
    efficiency must hold: sum(phi_c) = v(all channels)."""
    from itertools import permutations

    rows = {
        r.channel: r
        for r in QUERIES["events_shapley_attribution"](
            spark, SF_DIR
        ).collect()
    }
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    first_p: dict = {}
    for r in e:
        if r.event_type == "purchase":
            if r.user_id not in first_p or r.ts < first_p[r.user_id]:
                first_p[r.user_id] = r.ts
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    masks: dict = {u: 0 for u in first_p}
    for r in e:
        if (
            r.user_id in first_p
            and r.event_type != "purchase"
            and r.ts < first_p[r.user_id]
        ):
            masks[r.user_id] |= bits[r.event_type]

    def v(T):
        return sum(1 for m in masks.values() if m & T)

    phi24 = {c: 0 for c in bits}
    for perm in permutations(bits.values()):
        T = 0
        for b in perm:
            gain = v(T | b) - v(T)
            for c, cb in bits.items():
                if cb == b:
                    phi24[c] += gain
            T |= b
    for c, r in rows.items():
        assert r.shapley_x24 == phi24[c]
        assert r.converters_any == v(15)
        assert r.unattributed == sum(1 for m in masks.values() if m == 0)
    assert sum(r.shapley_x24 for r in rows.values()) == 24 * v(15)


# ---- §2.27 data-selection & distribution diagnostics ----


def test_zipf_fit_matches_python_ols(spark):
    """The exponent/intercept/R2 must match a pure-Python OLS over the
    independently recomputed (ln rank, ln tf) micro-unit points."""
    import math

    r = QUERIES["text_zipf_fit"](spark, SF_DIR).collect()[0]
    toks = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("tf"))
        .collect()
    )
    top = sorted(((x.tf, x.t) for x in toks), key=lambda p: (-p[0], p[1]))[
        :100
    ]
    pts = [
        (
            round(math.log(i + 1) * 1_000_000),
            round(math.log(tf) * 1_000_000),
        )
        for i, (tf, _) in enumerate(top)
    ]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts)
    syy = sum(p[1] ** 2 for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    icpt = (sxx * sy - sx * sxy) / (n * sxx - sx * sx) / 1_000_000
    r2 = slope * (n * sxy - sx * sy) / (n * syy - sy * sy)
    assert r.n_terms == n
    assert abs(r.zipf_exponent - (-slope)) < 2e-6
    assert abs(r.intercept_ln - icpt) < 2e-6
    assert abs(r.r2_ppm - 1_000_000 * r2) < 2
    assert 0 <= r.r2_ppm <= 1_000_000


def test_cvm_matches_brute_force_and_is_body_sensitive(spark):
    """cvm_stat must equal the brute-force binned CvM from raw rows,
    and sit in (0, 1) for the two genuinely different segments."""
    r = QUERIES["agg_cramer_von_mises"](spark, SF_DIR).collect()[0]
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.expr(
                "CAST(ROUND(o_totalprice * 100) AS BIGINT) div 500000"
            ).alias("b"),
            "c_mktsegment",
        )
        .collect()
    )
    from collections import Counter

    ca = Counter(x.b for x in rows if x.c_mktsegment == "BUILDING")
    cb = Counter(x.b for x in rows if x.c_mktsegment == "MACHINERY")
    na, nb = sum(ca.values()), sum(cb.values())
    cum_a = cum_b = 0
    wsq = 0
    for b in sorted(set(ca) | set(cb)):
        cum_a += ca.get(b, 0)
        cum_b += cb.get(b, 0)
        wsq += (ca.get(b, 0) + cb.get(b, 0)) * (cum_a * nb - cum_b * na) ** 2
    t = wsq / (na * nb) / (na + nb) ** 2
    assert (r.n_a, r.n_b) == (na, nb)
    assert r.wsq_num == float(wsq)
    assert abs(r.cvm_stat - t) < 2e-6
    assert 0.0 < r.cvm_stat < 1.0


def test_dsir_weights_match_python_model(spark):
    """Top-k DSIR scores must equal an independent hashlib/math
    recomputation of the hashed-unigram importance model, and the cut
    must be the true global top-k under (score, doc_id)."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    out = QUERIES["corpus_dsir_weights"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 64

    tc, sc = Counter(), Counter()
    per_doc = defaultdict(Counter)
    for d in docs:
        for t in d.text.split(" "):
            if not t:
                continue
            b = bucket(t)
            if d.lang == "en":
                tc[b] += 1
            else:
                sc[b] += 1
                per_doc[d.doc_id][b] += 1
    T, S = sum(tc.values()), sum(sc.values())
    lr = {
        b: round(
            (
                math.log(tc.get(b, 0) + 1)
                - math.log(T + 64)
                - math.log(sc.get(b, 0) + 1)
                + math.log(S + 64)
            )
            * 1_000_000_000
        )
        for b in set(tc) | set(sc)
    }
    scores = {
        doc: sum(cnt * lr[b] for b, cnt in bs.items())
        for doc, bs in per_doc.items()
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert [(r.doc_id, r.score_nano) for r in out] == want
    assert all(
        r.n_tokens == sum(per_doc[r.doc_id].values()) for r in out
    )


# ---- §2.28 index numbers & information rate ----


def test_price_index_identities(spark):
    """Base month must read exactly 1.0 on all three indices, Fisher
    must be the geometric mean of L and P (and lie between them), and
    every index must be positive."""
    rows = QUERIES["lineitem_price_index"](spark, SF_DIR).collect()
    assert rows, "index table must be non-empty"
    base = rows[0]
    assert (base.laspeyres, base.paasche, base.fisher) == (1.0, 1.0, 1.0)
    for r in rows:
        assert r.laspeyres > 0 and r.paasche > 0 and r.fisher > 0
        g = (r.laspeyres * r.paasche) ** 0.5
        assert abs(r.fisher - g) < 2e-5
        assert (
            min(r.laspeyres, r.paasche) - 1e-9
            <= r.fisher
            <= max(r.laspeyres, r.paasche) + 1e-9
        )
        assert r.n_parts > 0


def test_entropy_rate_matches_python_and_bounds(spark):
    """The chain rate must equal an independent Python recomputation
    from raw transitions, sit in (0, ln|types|], and each row entropy
    must be <= ln(out-degree of that state)."""
    import math
    from collections import Counter, defaultdict

    rows = QUERIES["events_entropy_rate"](spark, SF_DIR).collect()
    e = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in e:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans = Counter()
    for seq in by_user.values():
        seq.sort(key=lambda x: (x[0], x[1]))
        for i in range(len(seq) - 1):
            trans[(seq[i][2], seq[i + 1][2])] += 1
    total = sum(trans.values())
    row_tot = Counter()
    for (a, _), c in trans.items():
        row_tot[a] += c
    h_nano = {
        k: c * round((math.log(row_tot[k[0]]) - math.log(c)) * 1e9)
        for k, c in trans.items()
    }
    rate = sum(h_nano.values()) / total / 1e9
    types = {t for t, _ in trans}
    out_deg = Counter(a for a, _ in trans)
    got = {(r.from_type, r.to_type): r for r in rows}
    assert set(got) == set(trans)
    for k, r in got.items():
        assert r.c_ab == trans[k]
        assert r.h_nano == h_nano[k]
        assert r.row_entropy_nats <= math.log(out_deg[k[0]]) + 1e-9
    any_row = rows[0]
    assert abs(any_row.entropy_rate_nats - rate) < 2e-6
    assert 0.0 < any_row.entropy_rate_nats <= math.log(len(types)) + 1e-9


# ---- §2.29 drift detection & corpus partitioning ----


def test_cusum_closed_form_equals_recursion(spark):
    """The windowed prefix-min closed form must equal the sequential
    Page recursion S_t = max(0, S_{t-1} + x_t - k) day by day, for both
    directions, and the p90 alarm count must be <= 10% + 1 of days."""
    rows = sorted(
        QUERIES["events_cusum_drift"](spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    xs = [r.n_purchases for r in rows]
    k = sum(xs) // len(xs)
    sp = sn = 0
    for r, x in zip(rows, xs):
        sp = max(0, sp + x - k)
        sn = max(0, sn + k - x)
        assert (r.s_pos, r.s_neg) == (sp, sn)
    n = len(rows)
    assert sum(r.alarm_pos for r in rows) <= n // 10 + 1
    assert sum(r.alarm_neg for r in rows) <= n // 10 + 1


def test_ccnet_buckets_partition_each_language(spark):
    """Per language: bucket sizes must be a balanced tercile partition
    of that language's scored docs, bucket boundaries must be ordered
    (head max <= middle min <= ... monotone), and head must be strictly
    more fluent (lower mean surprisal) than tail."""
    rows = QUERIES["docs_ccnet_perplexity_buckets"](spark, SF_DIR).collect()
    langs = {}
    for r in rows:
        langs.setdefault(r.lang, {})[r.bucket] = r
    n_scored = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.length("text") >= 2)
        .groupBy("lang")
        .count()
        .collect()
    )
    per_lang = {r.lang: r["count"] for r in n_scored}
    for lang, bks in langs.items():
        assert set(bks) == {0, 1, 2}
        sizes = [bks[b].n_docs for b in (0, 1, 2)]
        assert sum(sizes) == per_lang[lang]
        assert max(sizes) - min(sizes) <= 1  # balanced terciles
        assert bks[0].max_mbits <= bks[1].min_mbits
        assert bks[1].max_mbits <= bks[2].min_mbits
        assert bks[0].mean_mbits < bks[2].mean_mbits


# ---- §2.30 link-prediction weighting & long-range dependence ----


def test_adamic_adar_matches_python_model(spark):
    """Pair scores must equal an independent Python recomputation over
    the capped slot sets, AA must rank crowded-slot pairs below
    empty-slot pairs with equal support, and every reported pair must
    clear min-support."""
    import math
    from collections import Counter, defaultdict

    rows = QUERIES["graph_adamic_adar"](spark, SF_DIR).collect()
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    slots = {
        (r.user_id, int(r.ts.timestamp() * 1_000_000) // 600_000_000)
        for r in e
    }
    by_slot = defaultdict(list)
    for u, s in slots:
        by_slot[s].append(u)
    capped = defaultdict(list)
    for s, us in by_slot.items():
        us.sort(key=lambda u: ((u * 1103515245 + s * 12345) % 2147483648, u))
        capped[s] = us[:50]
    w = {
        s: round(1e9 / math.log(len(us)))
        for s, us in capped.items()
        if len(us) >= 2
    }
    pair_score = Counter()
    pair_n = Counter()
    for s, us in capped.items():
        if s not in w:
            continue
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                key = (min(us[i], us[j]), max(us[i], us[j]))
                pair_score[key] += w[s]
                pair_n[key] += 1
    want = {
        k: (pair_n[k], pair_score[k])
        for k in pair_score
        if pair_n[k] >= 3
    }
    got = {(r.user_a, r.user_b): (r.common_slots, r.aa_nano) for r in rows}
    assert got == want
    assert all(r.common_slots >= 3 for r in rows)


def test_hurst_matches_python_rs(spark):
    """H must equal an independent Python R/S computation over the
    zero-filled hourly series, and sit in (0, 1)."""
    import math
    from collections import Counter

    rows = {r.k: r for r in QUERIES["agg_hurst_exponent"](spark, SF_DIR).collect()}
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    hours = Counter(
        int(r.ts.timestamp() * 1_000_000) // 3_600_000_000 for r in e
    )
    h0, h1 = min(hours), max(hours)
    xs = [hours.get(h, 0) for h in range(h0, h1 + 1)]
    pts = []
    for k in (8, 16, 32, 64):
        rs_micros = []
        for b in range(len(xs) // k):
            blk = xs[b * k : (b + 1) * k]
            s, ss = sum(blk), sum(v * v for v in blk)
            d = k * ss - s * s
            if d <= 0:
                continue
            cum = 0
            kz = []
            for j, v in enumerate(blk, 1):
                cum += v
                kz.append(k * cum - j * s)
            rs_micros.append(
                round((max(kz) - min(kz)) / math.sqrt(d) * 1e6)
            )
        mean = sum(rs_micros) // len(rs_micros)
        assert rows[k].n_blocks == len(rs_micros)
        assert rows[k].mean_rs_micro == mean
        pts.append((round(math.log(k) * 1e6), round(math.log(mean) * 1e6)))
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    h = rows[8].hurst
    assert abs(h - slope) < 2e-6
    assert 0.0 < h < 1.0


# ---- §2.31 inventory matrix, grouped resampling & activity patterns ----


def test_abc_xyz_partitions_catalog(spark):
    """The 9-cell matrix must partition the part catalog exactly: class
    sizes sum to the catalog, revenue shares sum to ~1e6 ppm, ABC
    respects the 80/95 cumulative cuts, and XYZ terciles are balanced
    with ordered CV boundaries."""
    rows = QUERIES["orders_abc_xyz"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_parts_total = li.select("l_partkey").distinct().count()
    assert sum(r.n_parts for r in rows) == n_parts_total
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) < len(rows) + 1
    xyz_sizes = {}
    for r in rows:
        xyz_sizes[r.xyz] = xyz_sizes.get(r.xyz, 0) + r.n_parts
    assert max(xyz_sizes.values()) - min(xyz_sizes.values()) <= 1
    # CV tercile boundaries are ordered: max(X) <= min(Y) <= ... per axis
    x_max = max(r.max_cvsq_micro for r in rows if r.xyz == "X")
    y_min = min(r.min_cvsq_micro for r in rows if r.xyz == "Y")
    y_max = max(r.max_cvsq_micro for r in rows if r.xyz == "Y")
    z_min = min(r.min_cvsq_micro for r in rows if r.xyz == "Z")
    assert x_max <= y_min and y_max <= z_min
    abc_rev = {}
    for r in rows:
        abc_rev[r.abc] = abc_rev.get(r.abc, 0) + r.share_ppm
    assert abc_rev["A"] >= 700_000  # the 80% head (floor effects allowed)
    assert abc_rev["A"] + abc_rev.get("B", 0) >= 900_000


def test_jackknife_matches_python(spark):
    """theta, every leave-one-out ratio, and the jackknife SE must
    equal an independent Python recomputation from the per-nation
    sums; pseudo-value mean must bracket theta."""
    rows = QUERIES["agg_jackknife_ratio"](spark, SF_DIR).collect()
    ta = sum(r.disc_cents for r in rows)
    tb = sum(r.price_cents for r in rows)
    n = len(rows)
    import math

    theta = math.floor(ta / tb * 1e6)
    loos = []
    for r in rows:
        want_loo = math.floor(
            (ta - r.disc_cents) / (tb - r.price_cents) * 1e6
        )
        assert r.theta_loo_micro == want_loo
        assert r.theta_micro == theta
        loos.append(want_loo)
    s1, s2 = sum(loos), sum(v * v for v in loos)
    se = math.sqrt((n - 1) / n * ((n * s2 - s1 * s1) / (n * n)))
    assert abs(rows[0].jk_se_micro - se) < 0.02
    assert min(loos) <= theta + 1 and theta - 1 <= max(loos)


def test_burstiness_matches_python(spark):
    """Bin counts and means must equal an independent Python
    recomputation of per-user B over (ts, event_id)-ordered gaps,
    and every B must sit in (-1, 1)."""
    import math
    from collections import defaultdict

    rows = {r.b_bin: r for r in QUERIES["events_burstiness_index"](spark, SF_DIR).collect()}
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in e:
        by_user[r.user_id].append((r.ts, r.event_id))
    bins = defaultdict(lambda: [0, 0, 0])
    for u, seq in by_user.items():
        seq.sort()
        gaps = [
            int(b[0].timestamp()) - int(a[0].timestamp())
            for a, b in zip(seq, seq[1:])
        ]
        n = len(gaps)
        if n < 8:
            continue
        s, sq = sum(gaps), sum(g * g for g in gaps)
        d = n * sq - s * s
        if d <= 0:
            continue
        b_micro = math.floor((math.sqrt(d) - s) / (math.sqrt(d) + s) * 1e6)
        assert -1_000_000 < b_micro < 1_000_000
        bb = math.floor(b_micro / 100000)
        bins[bb][0] += 1
        bins[bb][1] += b_micro
        bins[bb][2] += n
    assert set(rows) == set(bins)
    for bb, (nu, sb, ng) in bins.items():
        assert rows[bb].n_users == nu
        assert rows[bb].mean_b_micro == math.floor(sb / nu)
        assert rows[bb].n_gaps == ng


# ---- §2.32 graph-ranked keywords & learned quality gate ----


def test_textrank_matches_python_power_iteration(spark):
    """Ranks must equal an independent Python weighted-PageRank (5
    damped iterations) over the same symmetrized co-occurrence graph,
    and ranks must sum to ~1 over all vertices (probability mass)."""
    from collections import Counter, defaultdict

    rows = QUERIES["text_textrank_keywords"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    edges = Counter()
    for d in docs:
        ws = d.text.split(" ")
        for a, b in zip(ws, ws[1:]):
            if a and b and a != b:
                edges[(min(a, b), max(a, b))] += 1
    adj = defaultdict(dict)
    for (a, b), w in edges.items():
        adj[a][b] = adj[a].get(b, 0) + w
        adj[b][a] = adj[b].get(a, 0) + w
    nodes = sorted(adj)
    n = len(nodes)
    out_w = {v: sum(adj[v].values()) for v in nodes}
    r = {v: 1.0 / n for v in nodes}
    for _ in range(5):
        nxt = {}
        for v in nodes:
            s = sum(adj[u][v] / out_w[u] * r[u] for u in adj[v])
            nxt[v] = 0.15 / n + 0.85 * s
        r = nxt
    want = sorted(
        ((round(rk * 1000, 6), w) for w, rk in r.items()),
        key=lambda p: (-p[0], p[1]),
    )[:20]
    got = [(x.rank_permille, x.word) for x in rows]
    for (wr, ww), (gr, gw) in zip(want, got):
        assert ww == gw
        assert abs(wr - gr) < 1e-4
    assert abs(sum(r.values()) - 1.0) < 0.05  # mass approximately conserved


def test_nb_quality_classifier_learns(spark):
    """Held-out accuracy must clear 70% (the non-vacuity gate: the
    model genuinely generalizes), classes must be near-balanced, and
    scores must separate (every cell's score range sign-consistent
    with its prediction)."""
    rows = QUERIES["docs_nb_quality_classifier"](spark, SF_DIR).collect()
    total = sum(r.n_docs for r in rows)
    correct = sum(r.n_docs for r in rows if r.label_hi == r.pred_hi)
    assert total > 0
    assert correct / total >= 0.70
    for r in rows:
        if r.pred_hi == 1:
            assert r.min_score_nano > 0
        else:
            assert r.max_score_nano <= 0
    pos = sum(r.n_docs for r in rows if r.label_hi == 1)
    assert 0.3 <= pos / total <= 0.7


# ---- §2.33 paired testing & power planning ----


def test_paired_ttest_matches_python(spark):
    """t must match an independent float64 paired-t computation from
    per-user sums, and the pre+post split must cover all value cents."""
    import math
    from collections import defaultdict

    r = QUERIES["agg_ttest_paired"](spark, SF_DIR).collect()[0]
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    days = sorted({x.ts.date() for x in e})
    mid = min(days) + __import__("datetime").timedelta(
        days=(max(days) - min(days)).days // 2
    )
    pre = defaultdict(int)
    post = defaultdict(int)
    for x in e:
        c = round(x.value * 100)
        if x.ts.date() < mid:
            pre[x.user_id] += c
        else:
            post[x.user_id] += c
    users = set(pre) | set(post)
    ds = [post[u] - pre[u] for u in users]
    n, sd = len(ds), sum(ds)
    sdd = sum(d * d for d in ds)
    t = sd * math.sqrt(n - 1) / math.sqrt(n * sdd - sd * sd)
    assert r.n == n
    assert r.sum_diff_cents == sd
    assert r.pre_cents + r.post_cents == sum(
        round(x.value * 100) for x in e
    )
    assert abs(r.t_paired - t) < 2e-6


def test_power_analysis_identities(spark):
    """MDE must equal (za+zb)*SE from raw per-arm moments, and the
    required-n must scale inversely with the squared observed effect
    (detectability identity: with n_req per arm at the current
    variance, the observed effect equals the MDE)."""
    import math

    r = QUERIES["agg_power_analysis"](spark, SF_DIR).collect()[0]
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_mktsegment", F.round(F.col("o_totalprice") * 100).cast("long").alias("x"))
        .collect()
    )
    a = [x.x for x in rows if x.c_mktsegment == "BUILDING"]
    b = [x.x for x in rows if x.c_mktsegment == "MACHINERY"]
    import statistics

    za, zb = 1.959964, 0.841621
    se2 = statistics.variance(a) / len(a) + statistics.variance(b) / len(b)
    mde = (za + zb) * math.sqrt(se2)
    diff = statistics.fmean(a) - statistics.fmean(b)
    assert (r.n_a, r.n_b) == (len(a), len(b))
    assert abs(r.mde_cents - mde) < 0.5
    assert abs(r.observed_diff_cents - diff) < 0.5
    n_req = math.ceil(
        (za + zb) ** 2 * se2 * ((len(a) + len(b)) / 2) / diff**2
    )
    assert r.n_required_per_arm == n_req
    # the observed effect is tiny vs the MDE here, so n_req >> current n
    assert r.n_required_per_arm > max(len(a), len(b))


# ---- §2.34 parametric survival, chain equilibrium & robust windows ----


def test_weibull_fit_matches_python_ols(spark):
    """Shape and scale must match an independent Python median-rank
    regression, shape must be positive, and F_ppm must be monotone."""
    import math

    rows = sorted(
        QUERIES["orders_weibull_fit"](spark, SF_DIR).collect(),
        key=lambda r: r.dur_days,
    )
    n = rows[-1].cum + 0  # cum excludes the final F=1 point's row? no:
    # rows cover cum < n only; recover n from raw data
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    d = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.to_date("l_shipdate") > F.to_date("o_orderdate"))
        .select(
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("dur")
        )
        .groupBy("dur")
        .count()
        .collect()
    )
    counts = sorted((x.dur, x["count"]) for x in d)
    n = sum(c for _, c in counts)
    cum, pts = 0, []
    for dur, c in counts:
        cum += c
        if cum < n:
            f = (cum * 10000 - 3000) / (n * 10000 + 4000)
            pts.append(
                (
                    round(math.log(dur) * 1e6),
                    round(math.log(-math.log(1 - f)) * 1e6),
                )
            )
    np_ = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts)
    k = (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx)
    a = (sxx * sy - sx * sxy) / (np_ * sxx - sx * sx) / 1e6
    assert len(rows) == np_
    assert abs(rows[0].weibull_shape - k) < 2e-6
    assert abs(rows[0].weibull_scale_days - math.exp(-a / k)) < 0.01
    assert rows[0].weibull_shape > 0
    fs = [r.f_ppm for r in rows]
    assert fs == sorted(fs) and 0 < fs[0] and fs[-1] < 1_000_000


def test_markov_stationary_is_fixed_point_like(spark):
    """The 5-iteration vector must be a probability distribution
    (sums to ~1e6 ppm), and applying ONE more transition step in
    Python must move it by less than the uniform start did (power
    iteration contracts toward the fixed point)."""
    from collections import defaultdict

    rows = QUERIES["events_markov_stationary"](spark, SF_DIR).collect()
    pi = {r.state: r.stationary_ppm / 1e6 for r in rows}
    assert abs(sum(pi.values()) - 1.0) < 1e-4
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in e:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans = defaultdict(int)
    row_tot = defaultdict(int)
    for seq in by_user.values():
        seq.sort(key=lambda x: (x[0], x[1]))
        for i in range(len(seq) - 1):
            trans[(seq[i][2], seq[i + 1][2])] += 1
            row_tot[seq[i][2]] += 1
    states = sorted(row_tot)
    nxt = {
        b: sum(
            trans[(a, b)] / row_tot[a] * pi[a]
            for a in states
            if (a, b) in trans
        )
        for b in states
    }
    step_move = sum(abs(nxt[s] - pi[s]) for s in states)
    uniform_move = sum(abs(pi[s] - 1 / len(states)) for s in states)
    assert step_move < max(uniform_move, 1e-3)
    assert {r.state for r in rows} == set(states)
    assert any(r.gap_ppm > 0 for r in rows)


def test_sliding_median_matches_python(spark):
    """Every day's median must equal the Python lower median of its
    centered window, with correct shorter edges."""
    rows = sorted(
        QUERIES["win_median_sliding"](spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    revs = [r.rev for r in rows]
    for i, r in enumerate(rows):
        w = revs[max(0, i - 3) : i + 4]
        assert r.window_n == len(w)
        assert r.median7_cents == sorted(w)[(len(w) + 1) // 2 - 1]


# ---- §2.35 temperature-scaled sampling mixture ----


def test_temperature_mixture_reweights_toward_tail(spark):
    """Shards must sum exactly to the budget, tempered shares must
    match a Python sqrt-weight recomputation, and the temperature must
    boost every below-average corpus and suppress every above-average
    one (the T>1 crossover property)."""
    import math

    rows = QUERIES["corpus_temperature_mixture"](spark, SF_DIR).collect()
    assert sum(r.shards for r in rows) == 1000
    toks = {(r.lang, r.source): r.tokens for r in rows}
    w = {k: math.floor(math.sqrt(t) * 1e6) for k, t in toks.items()}
    wt = sum(w.values())
    tt = sum(toks.values())
    mean_tok = tt / len(toks)
    for r in rows:
        k = (r.lang, r.source)
        assert r.tempered_ppm == w[k] * 1_000_000 // wt
        assert r.raw_ppm == toks[k] * 1_000_000 // tt
        if toks[k] < 0.9 * mean_tok:
            assert r.tempered_ppm > r.raw_ppm, k
        if toks[k] > 1.1 * mean_tok:
            assert r.tempered_ppm < r.raw_ppm, k
    # Hamilton: every allocation within 1 of the exact proportional share
    for r in rows:
        exact = w[(r.lang, r.source)] * 1000 / wt
        assert abs(r.shards - exact) < 1
