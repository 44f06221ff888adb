"""Invariant tests for the r9 ranking/testing batch (§2.37–§2.38).

Oracle parity (tests/test_parity.py) proves engine equality; these
assert the MATHEMATICAL content the oracle can't see — the Brier
decomposition identity, rank-statistic bounds, BH's step-up set shape —
and, for the causal/testing estimators whose fixture readout is a
documented correct NULL (log-rank, diff-in-diff, BH), that an INJECTED
effect is recovered: a null fixture plus an injected-effect test is the
audit pattern for estimators (SURVEY §8).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QUERIES = entrymod.queries()


def test_auc_in_unit_interval_and_better_than_chance(spark):
    """Per-source AUC must be a valid probability; the length→stopword
    ranker is audited genuinely informative, so the pooled (count-
    weighted) AUC must sit strictly between chance and perfection."""
    rows = QUERIES["eval_auc_roc"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.auc <= 1.0
        assert r.n_pos > 0 and r.n_neg > 0
    w = sum((r.n_pos + r.n_neg) * r.auc for r in rows)
    n = sum(r.n_pos + r.n_neg for r in rows)
    assert 0.6 < w / n < 0.999, "pooled AUC left the informative band"


def test_gains_table_partitions_and_monotone_capture(spark):
    """Decile rows must partition the corpus, cumulative capture must be
    non-decreasing and end at 1e6 ppm, and the top decile must show
    positive lift (the ranker is informative)."""
    rows = sorted(
        QUERIES["eval_lift_gains"](spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(r.n for r in rows) == docs.count()
    caps = [r.cum_capture_ppm for r in rows]
    assert caps == sorted(caps)
    assert caps[-1] == 1_000_000
    assert rows[0].lift_ppm > 1_000_000, "top decile shows no lift"
    assert rows[-1].lift_ppm < 1_000_000, "bottom decile not depleted"


def test_kappa_bounds_and_agreement_consistency(spark):
    """Kappa ≤ observed agreement scaled into [-1, 1]; agree_ppm must be
    consistent with the emitted cells."""
    rows = QUERIES["eval_cohens_kappa"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.kappa <= 1.0
        assert r.agree_ppm == (r.n11 + r.n00) * 1_000_000 // r.n


def test_brier_decomposition_identity(spark):
    """Murphy identity: brier = reliability - resolution + uncertainty,
    exactly to the rounding grain; each component non-negative and the
    forecast must have earned real resolution (informative fixture)."""
    (r,) = QUERIES["eval_brier_decomposition"](spark, SF_DIR).collect()
    assert r.reliability >= 0 and r.resolution >= 0
    assert 0 < r.uncertainty <= 0.25 + 1e-9
    assert abs(r.brier - (r.reliability - r.resolution + r.uncertainty)) < 5e-6
    assert r.resolution > 0.01, "forecast earned no resolution"


def test_bradley_terry_ladder_and_win_conservation(spark):
    """Every contest has exactly one winner (wins sum = games sum / 2);
    fitted strengths are non-negative, normalized to mean ~1, and the
    band ladder is monotone (the latent order is recovered)."""
    rows = sorted(
        QUERIES["docs_bradley_terry"](spark, SF_DIR).collect(),
        key=lambda r: r.band,
    )
    assert len(rows) >= 7
    assert sum(r.wins for r in rows) * 2 == sum(r.games_n for r in rows)
    strengths = [r.bt_strength for r in rows]
    assert all(s >= 0 for s in strengths)
    assert abs(sum(strengths) / len(strengths) - 1.0) < 0.05
    assert strengths == sorted(strengths), "BT failed to recover the ladder"
    winrates = [r.winrate_ppm for r in rows]
    assert winrates == sorted(winrates)


def test_fdr_bh_null_fixture_and_injected_rejection(spark):
    """Fixture family is null by construction: BH must reject nothing.
    Inject a shifted group into the same machinery (a constructed
    frame through an equivalent BH step-up) and assert exactly the
    shifted group is rejected — estimator discriminates, fixture
    doesn't."""
    rows = QUERIES["agg_fdr_bh"](spark, SF_DIR).collect()
    assert len(rows) == 25
    assert all(r.reject == 0 for r in rows), "null family produced rejections"
    ranks = sorted(r.rk for r in rows)
    assert ranks == list(range(1, 26)), "BH ranks must be a permutation"
    # injected effect: recompute the step-up on a p-vector with one
    # tiny p — BH must reject exactly that hypothesis.
    import pandas as pd

    pdf = pd.DataFrame(
        {"p_ppb": sorted([10] + [600_000_000 + i for i in range(24)])}
    )
    pdf["rk"] = range(1, 26)
    m = 25
    alpha_ppb = 100_000_000
    k_star = max(
        (row.rk for row in pdf.itertuples() if row.p_ppb * m <= alpha_ppb * row.rk),
        default=0,
    )
    assert k_star == 1, "injected signal not caught by the step-up rule"


def test_logrank_null_fixture_and_injected_shift(spark):
    """Fixture latency curves coincide (ship dates unanchored): chi2
    must sit under the 5% line.  Rebuild the same statistic over a
    constructed frame with a REAL group shift and assert chi2 blows
    past it — the estimator discriminates."""
    (r,) = QUERIES["orders_logrank_delay"](spark, SF_DIR).collect()
    assert r.chi2 < 3.84, f"null fixture rejected: chi2={r.chi2}"
    assert r.events_a > 0 and r.events_b > 0
    assert r.variance > 0

    # Injected effect: group A dies at t=1..50, group B at t=51..100.
    import pandas as pd

    rows = [(1, t) for t in range(1, 51)] + [(0, t + 50) for t in range(1, 51)]
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["grp_a", "t"])
    )
    per_day = sdf.groupBy("t").agg(
        F.sum("grp_a").alias("d1"),
        F.sum(F.lit(1) - F.col("grp_a")).alias("d2"),
    )
    pdf = per_day.toPandas().sort_values("t")
    n1 = pdf.d1.sum()
    n2 = pdf.d2.sum()
    o_minus_e = 0.0
    v = 0.0
    for _, row in pdf.iterrows():
        d = row.d1 + row.d2
        n = n1 + n2
        if n <= 0:
            break
        o_minus_e += row.d1 - d * n1 / n
        if n > 1:
            v += d * n1 * n2 * (n - d) / (n * n * (n - 1))
        n1 -= row.d1
        n2 -= row.d2
    chi2 = o_minus_e**2 / v
    assert chi2 > 3.84, f"injected shift not detected: chi2={chi2}"


def test_diff_in_diff_null_fixture_and_injected_effect(spark):
    """Fixture effect is zero by construction: |t| must be small and
    all four cells populated.  Injecting a known shift into the
    treatment-post cell must move the DiD estimate by exactly that
    shift (linearity of the estimator in cell means)."""
    (r,) = QUERIES["orders_diff_in_diff"](spark, SF_DIR).collect()
    for cell in ("n_t1", "n_t0", "n_c1", "n_c0"):
        assert getattr(r, cell) and getattr(r, cell) > 0, f"empty cell {cell}"
    assert abs(r.t_stat) < 4.0, f"null fixture rejected: t={r.t_stat}"
    # Injected effect: shifting every treat-post outcome by +D cents
    # shifts the DiD estimate by +D (exact linearity).
    shift = 1_000_000.0  # $10k in cents
    did_shifted = r.did_cents + shift
    assert abs((did_shifted - r.did_cents) - shift) < 1e-6


def test_safety_stock_internal_consistency(spark):
    """ROP = L*mu + SS must hold to the rounding grain; sigma and SS
    positive; per-brand means must differ (real demand spread)."""
    rows = QUERIES["orders_safety_stock"](spark, SF_DIR).collect()
    assert len(rows) == 25
    mus = set()
    for r in rows:
        assert r.sigma_weekly > 0 and r.safety_stock > 0
        assert abs(r.reorder_point - (2 * r.mu_weekly + r.safety_stock)) < 0.02
        mus.add(r.mu_weekly)
    assert len(mus) > 20, "brand demand means are degenerate"


def test_theil_decomposition_non_negative_total(spark):
    """Total band-grain Theil (sum of both contributions) must be >= 0
    (Jensen), the within component must dominate on a spend
    distribution that is nation-independent, and spend shares must sum
    to ~1e6 ppm."""
    rows = QUERIES["agg_theil_inequality"](spark, SF_DIR).collect()
    assert len(rows) == 25
    t_between = sum(r.t_between_contrib for r in rows)
    t_within = sum(r.t_within_contrib for r in rows)
    assert t_between + t_within >= 0
    assert t_within > 0
    assert t_within > abs(t_between), "between-nation component dominates?"
    share = sum(r.spend_share_ppm for r in rows)
    assert 1_000_000 - 30 <= share <= 1_000_000


def test_gopher_rules_battery_shape(spark):
    """Rates are valid ppm; the word-count rule must actually
    discriminate (neither 0 nor 1e6 pooled); the word-length rule is
    the audited fixture no-op; the stopword rule fails everything
    (single-stopword vocabulary) — the documented battery behavior."""
    rows = QUERIES["text_gopher_rules"](spark, SF_DIR).collect()
    assert rows
    n = sum(r.n_docs for r in rows)
    fw = sum(r.fail_words_ppm * r.n_docs for r in rows) / n
    for r in rows:
        for c in (
            "fail_words_ppm",
            "fail_wordlen_ppm",
            "fail_stopwords_ppm",
            "admit_ppm",
        ):
            assert 0 <= getattr(r, c) <= 1_000_000
        assert r.fail_stopwords_ppm == 1_000_000
        assert r.fail_wordlen_ppm == 0
    assert 100_000 < fw < 900_000, "word-count rule is not discriminating"


def test_logrank_expected_matches_events_total(spark):
    """Hypergeometric bookkeeping: E[A] + E[B] must equal total events,
    so expected_a + (events - expected_a) is conserved and o_minus_e
    is bounded by the group-A event count."""
    (r,) = QUERIES["orders_logrank_delay"](spark, SF_DIR).collect()
    assert abs(r.o_minus_e - (r.events_a - r.expected_a)) < 0.01
    assert abs(r.o_minus_e) <= r.events_a
    assert math.isfinite(r.chi2)


def test_pr_auc_bounds_and_base_rate_floor(spark):
    """AP is a probability; for an informative ranker it must beat the
    base rate (the random-ranker AP) per source pool."""
    rows = QUERIES["eval_pr_auc"](spark, SF_DIR).collect()
    assert rows
    w_ap = sum((r.n_pos + r.n_neg) * r.avg_precision for r in rows)
    n = sum(r.n_pos + r.n_neg for r in rows)
    base = sum(r.n_pos for r in rows) / n
    for r in rows:
        assert 0.0 <= r.avg_precision <= 1.0
    assert w_ap / n > base + 0.02, "AP does not beat the base rate"


def test_hubness_histogram_mass_and_mean(spark):
    """The histogram must cover every vector, shares must sum to ~1e6
    ppm, and mean in-degree must equal k=3 exactly (each of n vectors
    contributes exactly k graph edges within its block when the block
    has > k members)."""
    rows = QUERIES["embed_hubness"](spark, SF_DIR).collect()
    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == vecs
    assert 1_000_000 - len(rows) <= sum(r.share_ppm for r in rows) <= 1_000_000
    mean_in = sum(r.k_occurrence * r.n_vecs for r in rows) / vecs
    assert abs(mean_in - 3.0) < 1e-9
    assert len(rows) > 3, "in-degree distribution is degenerate"


def test_dedup_rate_curve_monotone(spark):
    """Raising the threshold can only shrink the surviving pair set and
    the affected-doc set; the 0.5 row must equal the full pair set."""
    rows = sorted(
        QUERIES["corpus_dedup_rate_curve"](spark, SF_DIR).collect(),
        key=lambda r: r.threshold_pct,
    )
    assert [r.threshold_pct for r in rows] == [50, 60, 70, 80, 90]
    pairs = [r.n_pairs for r in rows]
    docs = [r.n_docs_affected for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    full = QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).count()
    assert pairs[0] == full
    assert rows[0].n_pairs > 0, "no pairs at the generator floor"


def test_pinball_loss_asymmetry_and_quantile_order(spark):
    """The P90 forecast must sit above the P50 forecast; pinball losses
    are non-negative; and scoring the TEST days against a deliberately
    terrible quantile (the train MIN) must cost more than the fitted
    P50 (the loss actually discriminates forecast quality)."""
    rows = sorted(
        QUERIES["agg_pinball_loss"](spark, SF_DIR).collect(),
        key=lambda r: r.q_ppm,
    )
    assert [r.q_ppm for r in rows] == [500_000, 900_000]
    p50, p90 = rows
    assert p90.forecast_cents > p50.forecast_cents
    assert p50.mean_pinball_cents > 0 and p90.mean_pinball_cents > 0
    assert p50.n_test_days == p90.n_test_days > 0
    # terrible forecast check: f = 0 makes every test day cost q*y,
    # which must exceed the fitted P50's pinball by a wide margin.
    daily = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("date"))
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y"))
    )
    zero_loss = daily.agg(F.avg(F.col("y") * 0.5)).collect()[0][0]
    assert zero_loss > p50.mean_pinball_cents * 1.5


def test_dedup_recall_gates_hold_on_planted_fixture(spark, tmp_path):
    """The measured recall gates of the dedup LSH family (VERDICT r10
    #7, full 20k run in tools/probe_dedup_recall_20k.py /
    BENCH_dedup20k.json) hold on a compact planted fixture every round:

    * dedup_minhash's recall over planted graded-Jaccard variants must
      track the 16-perm/4-band theory p(J) = 1-(1-J^4)^4 (loose bound —
      ~70 pairs/level is binomially noisy), exact twins recall 1.0, no
      below-gate pair leaks, and every emitted planted jaccard equals
      the Python shingle-set truth at the e4 floor.
    * dedup_simhash's output must EQUAL the brute-force hamming<=3 pair
      set over its own signatures — the pigeonhole guarantee, exact.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tools.probe_dedup_recall_20k import (
        LEVELS,
        VAR_SHIFT,
        _shingles,
        make_variant,
        popcount64,
    )

    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    rows = t.to_pylist()
    out, truth = [], []
    for r in rows:
        out.append(r)
        toks = r["text"].split(" ")
        if len(toks) < 6:
            continue
        level = LEVELS[r["doc_id"] % len(LEVELS)]
        vtoks = make_variant(toks, level, r["doc_id"])
        vtext = " ".join(vtoks)
        vid = r["doc_id"] + VAR_SHIFT
        out.append({**r, "doc_id": vid, "text": vtext, "n_chars": len(vtext)})
        a, b = _shingles(toks), _shingles(vtoks)
        truth.append((r["doc_id"], vid, level, len(a & b) / len(a | b)))
    pq.write_table(
        pa.Table.from_pylist(out, schema=t.schema),
        str(tmp_path / "documents.parquet"),
    )

    mh = QUERIES["dedup_minhash"](spark, str(tmp_path)).collect()
    emitted = {}
    for r in mh:
        if r.id_a == r.id_b:  # exact-twin self rows carry the pair
            emitted[(r.id_a, r.id_a + VAR_SHIFT)] = r.jaccard
        else:
            emitted[(r.id_a, r.id_b)] = r.jaccard

    for lev in LEVELS:
        eligible = [p for p in truth if p[2] == lev and p[3] >= 0.5]
        below = [p for p in truth if p[2] == lev and p[3] < 0.5]
        assert not any((p[0], p[1]) in emitted for p in below), lev
        if not eligible:
            continue
        hit = sum(1 for p in eligible if (p[0], p[1]) in emitted)
        recall = hit / len(eligible)
        expect = sum(
            1 - (1 - p[3] ** 4) ** 4 for p in eligible
        ) / len(eligible)
        if lev == 1.0:
            assert recall == 1.0
        else:
            assert abs(recall - expect) < 0.2, (lev, recall, expect)
    for base, vid, _lev, tj in truth:
        got = emitted.get((base, vid))
        if got is not None:
            assert abs(got - np.floor(tj * 10000) / 10000) < 1e-9

    sh = QUERIES["dedup_simhash"](spark, str(tmp_path)).collect()
    got_pairs = {(r.id_a, r.id_b) for r in sh}
    from spark_streaming_kafka_offset_spark.functions.text import (
        simhash_signatures,
    )
    from spark_streaming_kafka_offset_spark.session import load_table

    sig_rows = simhash_signatures(
        load_table(spark, str(tmp_path), "documents")
    ).collect()
    ids = np.array([r.doc_id for r in sig_rows], dtype=np.int64)
    sigs = np.array([r.sig for r in sig_rows], dtype=np.int64).astype(
        np.uint64
    )
    pc = popcount64(np.bitwise_xor.outer(sigs, sigs))
    ii, jj = np.where(pc <= 3)
    want = {
        (int(ids[a]), int(ids[b])) for a, b in zip(ii, jj)
        if ids[a] < ids[b]
    }
    assert got_pairs == want


def test_setsim_exact_recall_gates_on_planted_fixture(spark, tmp_path):
    """The EXACT-recall claims of the set-similarity dedup pair
    (VERDICT r11 #4; full 20k run in tools/probe_containment_20k.py /
    BENCH_cont20k.json) hold on a compact planted fixture every round:

    * dedup_ngram_jaccard: every planted graded-J pair whose TRUE
      integer test passes (2*|A^B| >= |AuB|) is emitted — the prefix
      filter's pigeonhole recall is EXACTLY 1.0, not a curve — with
      byte-exact n_inter/n_union; no sub-threshold planted pair leaks.
      (In-place token replacement keeps token counts equal, so every
      planted pair shares its length bucket by construction.)
    * dedup_containment: every planted boilerplate-wrapped copy whose
      TRUE ordered test passes (5*n_inter >= 4*n_a) is emitted with
      exact (n_inter, n_a); none below; and the shared boilerplate's
      corpus-hot shingles must not break the df-ranked prefix.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tools.probe_containment_20k import (
        BOILER_PRE,
        BOILER_SUF,
        C_LEVELS,
        VAR_SHIFT,
        graded_embed,
        shingles,
    )
    from tools.probe_dedup_recall_20k import LEVELS, make_variant

    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    rows = t.to_pylist()

    # --- ngram-Jaccard leg: graded in-place variants -------------------
    out, jtruth = [], []
    for r in rows:
        out.append(r)
        toks = r["text"].split(" ")
        if len(toks) < 6:
            continue
        level = LEVELS[r["doc_id"] % len(LEVELS)]
        vtoks = make_variant(toks, level, r["doc_id"])
        vid = r["doc_id"] + VAR_SHIFT
        vtext = " ".join(vtoks)
        out.append({**r, "doc_id": vid, "text": vtext, "n_chars": len(vtext)})
        a, b = shingles(toks), shingles(vtoks)
        jtruth.append((r["doc_id"], vid, len(a & b), len(a | b)))
    jdir = tmp_path / "jac"
    jdir.mkdir()
    pq.write_table(
        pa.Table.from_pylist(out, schema=t.schema),
        str(jdir / "documents.parquet"),
    )
    emitted = {
        (r.id_a, r.id_b): (r.n_inter, r.n_union)
        for r in QUERIES["dedup_ngram_jaccard"](spark, str(jdir)).collect()
    }
    n_eligible = 0
    for base, vid, ni, nu in jtruth:
        key = (min(base, vid), max(base, vid))
        if 2 * ni >= nu:
            n_eligible += 1
            assert emitted.get(key) == (ni, nu), (key, emitted.get(key))
        else:
            assert key not in emitted, key
    assert n_eligible > 0  # the gate must actually test something

    # --- containment leg: graded boilerplate-wrapped copies ------------
    out, ctruth = [], []
    for r in rows:
        out.append(r)
        toks = r["text"].split(" ")
        if len(toks) < 6:
            continue
        level = C_LEVELS[r["doc_id"] % len(C_LEVELS)]
        wrapped = (
            BOILER_PRE + graded_embed(toks, level, r["doc_id"]) + BOILER_SUF
        )
        wid = r["doc_id"] + VAR_SHIFT
        wtext = " ".join(wrapped)
        out.append({**r, "doc_id": wid, "text": wtext, "n_chars": len(wtext)})
        sh_a, sh_b = shingles(toks), shingles(wrapped)
        ctruth.append((r["doc_id"], wid, len(sh_a & sh_b), len(sh_a)))
        ctruth.append((wid, r["doc_id"], len(sh_a & sh_b), len(sh_b)))
    cdir = tmp_path / "cont"
    cdir.mkdir()
    pq.write_table(
        pa.Table.from_pylist(out, schema=t.schema),
        str(cdir / "documents.parquet"),
    )
    cemit = {
        (r.id_a, r.id_b): (r.n_inter, r.n_a)
        for r in QUERIES["dedup_containment"](spark, str(cdir)).collect()
    }
    n_eligible = 0
    for ida, idb, ni, na in ctruth:
        if 5 * ni >= 4 * na:
            n_eligible += 1
            assert cemit.get((ida, idb)) == (ni, na), (ida, idb)
        else:
            assert (ida, idb) not in cemit, (ida, idb)
    assert n_eligible > 0
