"""sf1 stress sweep (VERDICT r5 #4): run the shuffle-heaviest operators
once at sf1 (6M-row lineitem, 10x the bench fixture; tools/gen_sf1.py)
and record wall-clock plus the worst per-stage task skew, so "would
survive 10x" claims become executions.

Per query the sweep records:

* ``wall_sec`` — plan build + execute + collect (same method as bench.py)
* ``rows`` — result size
* ``skew`` — over all stages the query ran: the stage with the worst
  max/median task-duration ratio (its ratio, max task ms, task count).
  Read from Spark's own REST status API (the UI server is enabled for
  this session only) — the same numbers the Spark UI's task summary
  shows.  A ratio near 1 means even tasks; a big ratio on a many-task
  stage is real key skew; single-digit-task stages are rollup-sized by
  design and reported but not skew (nothing to balance on 3 tasks).

Output: one JSON line, plus BENCH_sf1.json sidecar; the table in
BASELINE.md is derived from it.  sf0.1 wall for the same op (from the
same session, for the growth ratio) is measured right before each sf1
run so the 10x-growth factor is same-JVM, same-day, same-host.

Usage: python tools/stress_sf1.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")

STRESS_SET = [
    # r12 additions: two bounded value-cell crosses (Cliff/AB), the
    # broadcast-median corpus re-scan (Mood), and two calendar-rollup
    # estimators (DW/Page) — cheap by design, swept once to prove it.
    "agg_cliffs_delta",
    "agg_mood_median",
    "agg_ansari_bradley",
    "agg_durbin_watson",
    "agg_page_trend",
    # r12 additions, second batch: the 10-bin calibration rollup, the
    # zero-filled two-series bullwhip (the batch's one two-join shape),
    # the LAG/LEAD extrema screen, the six-sum scalar d, and the
    # double-mid-rank Quade grid.
    "eval_ece",
    "orders_bullwhip_ratio",
    "events_turning_points",
    "agg_cohens_d",
    "agg_quade_test",
    # r12 additions, third batch: the 10-bin drift rollup, the
    # (source, prefix) boilerplate screen, and the posexplode-collapse
    # anisotropy profile.
    "corpus_psi_drift",
    "text_template_prefixes",
    "embed_dim_variance",
    # r11 additions: the triangle-explode node attribution (the batch's
    # one output-sized shape) and the three calendar-rollup estimators
    # (cheap by design — swept once to prove it).
    "graph_clustering_coefficient",
    "events_nelson_aalen",
    "agg_kruskal_wallis",
    "agg_mann_kendall",
    # r9 additions: the shuffle-heavy new shapes — raw-doc pair
    # generation under 5 thresholds, the Gopher scan battery, the
    # (brand, week) inventory rollup, the consecutive-pair BT contest
    # join, and the k-NN hubness rollup.
    "corpus_dedup_rate_curve",
    "text_gopher_rules",
    "orders_safety_stock",
    "docs_bradley_terry",
    "embed_hubness",
    "graph_pagerank",
    "bpe_train_iterative",
    "dedup_minhash",
    "audience_overlap_exact",
    "kmeans_lloyd_exact",
    "q18_big_orders",
    "q21_waiting_suppliers",
    "sessionize_batch",
    "events_rolling_active",
    "dedup_exact",
    "corpus_admission_pipeline",
    "multimodal_dedup_phash",
    # r6 additions: the two shuffle-heaviest of the new batch — the
    # 10-min-slot pair join (fanout = sum-over-slots of C(active, 2))
    # and the trigram two-shuffle novelty op.
    "graph_common_neighbors",
    "text_ngram_novelty",
    # r7 sweep extension (VERDICT r6 #3): the remaining r6 blocked-join
    # shapes — the class where the r6 sweep found both fanout bugs.
    "entity_resolution_blocked",
    "join_geo_grid",
    "corpus_source_similarity",
    # r7-built heavies: the 6-window winnowing explode, the CC +
    # survivorship pipeline, and the double-explode day sweep.
    "docs_winnowing_fingerprint",
    "corpus_dedup_survivorship",
    "events_peak_concurrency",
    # r7 §2.21 heavies: the blocked all-pairs k-NN graph (candidate
    # fanout = Σ|block|² — quadratic in block size by construction; the
    # fixture's FIXED 10 labels are the worst case, production blocks
    # are ANN buckets with bounded occupancy) and the double-window CDC
    # compaction (one shuffle, two same-partition sorts).
    "embed_knn_graph",
    "cdc_net_changes",
    # r8 sweep extension (VERDICT r7 #4): the unswept r7 shuffle-heavy
    # keys — the KMV distinct-collapse + 4x pair fanout, the two
    # chained user windows, the encode rollup + broadcast re-join, the
    # QI double agg, and the $1-bucket cdf + suffix windows.
    "agg_kmv_jaccard",
    "win_running_distinct",
    "feat_target_encode",
    "privacy_k_anonymity",
    "eval_confusion_thresholds",
    # r8-built ops (§2.24): every new shuffle-bearing op pays the sf1
    # toll — the user-grain survival agg, the 64-replicate map-combined
    # bootstrap agg (the widest single hash agg in the repo), the daily
    # spine backtest, and the pruned-scan ⊕ merge proof.  The isotonic
    # and allocation ops ride rollup-bounded frames (≤10 / ~100 rows)
    # after one corpus agg each and are covered by the same toll.
    "events_kaplan_meier",
    "agg_bootstrap_ci",
    "events_forecast_backtest",
    "eval_isotonic_calibration",
    "corpus_eval_allocation",
    "agg_incremental_state_merge",
    # r8 second batch (§2.25): the int128 normal-equation agg, the
    # user-grain CUPED agg, the user-keyed HDR lag window, the CMS
    # user agg + 4x rollup fanout, the calendar lag self-join, and the
    # customer-grain CIDR explode-join.
    "agg_grouped_ols",
    "events_ab_cuped",
    "agg_hdr_histogram",
    "agg_countmin_heavyhitters",
    "events_cross_correlation",
    "fn_ip_cidr",
    # r8 third batch (§2.25): the 1-row conditional-sum t-test, the
    # (lang,source)-keyed double-window pair builder, and the RAKE
    # phrase/word double explode + word-keyed score join.
    "agg_welch_ttest",
    "docs_preference_pairs",
    "text_rake_keywords",
    # r8 fourth batch: the two keyed aggs + rollup pivot chain ladder.
    "orders_chain_ladder",
    # r8 §2.26 ordinal batch: the cell-rollup rank agg (one corpus
    # groupBy + two rollup joins), the month-rollup pair grid, and the
    # event-grain purchase-horizon join feeding the mask agg.
    "agg_spearman_corr",
    "agg_kendall_tau",
    "events_shapley_attribution",
    # r8 §2.27 batch: the token-explode + doc-grain DSIR score agg, the
    # vocabulary tf agg, and the fact-dim join + bucket rollup CvM.
    "corpus_dsir_weights",
    "text_zipf_fit",
    "agg_cramer_von_mises",
    # r8 §2.28 batch: the (month,part) rollup + part-keyed basket join,
    # and the user-keyed lead window feeding the transition rollup.
    "lineitem_price_index",
    "events_entropy_rate",
    # r8 §2.29 batch: the calendar CUSUM rollup and the LM train+score
    # double pass + lang-partitioned tercile window.
    "events_cusum_drift",
    "docs_ccnet_perplexity_buckets",
    # r8 §2.30 batch: the capped-slot pair join with weight attach, and
    # the hourly-rollup R/S block windows.
    "graph_adamic_adar",
    "agg_hurst_exponent",
    # r8 §2.31 batch: the (part,month)+part double agg with rank
    # windows, the 4-table fact join into the nation rollup, and the
    # user-keyed gap window + user agg.
    "orders_abc_xyz",
    "agg_jackknife_ratio",
    "events_burstiness_index",
    # r8 §2.32 batch: the pair-explode edge agg + 5 iteration joins,
    # and the NB train/score double pass over the token explode.
    "text_textrank_keywords",
    "docs_nb_quality_classifier",
    # r8 §2.33 batch: the user-grain conditional-sum paired agg and
    # the fact-dim-join conditional moment agg.
    "agg_ttest_paired",
    "agg_power_analysis",
    # r8 §2.34 batch: the fact-join duration rollup, the lead-window
    # transition matrix + iteration joins, and the calendar collect
    # window.
    "orders_weibull_fit",
    "events_markov_stationary",
    "win_median_sliding",
    # r8 §2.35: the (lang,source) token agg + mixture-rollup windows.
    "corpus_temperature_mixture",
    # r10 sweep extension (VERDICT r9 #2): the 10 unswept r9 keys —
    # fact-grain first (log-rank, DiD, Theil, BH ride lineitem/orders
    # joins), then the doc/rollup-grain ranking-quality battery.
    "orders_logrank_delay",
    "orders_diff_in_diff",
    "agg_theil_inequality",
    "agg_fdr_bh",
    "eval_auc_roc",
    "eval_lift_gains",
    "eval_cohens_kappa",
    "eval_brier_decomposition",
    "eval_pr_auc",
    "agg_pinball_loss",
    # r10-built: SemDeDup — within-cluster pair join is the quadratic
    # risk (n²/k); the sf1 fixture's replica-identical embeddings make
    # every cluster 10x denser, the worst case for the pair volume.
    # (r13 re-toll: blocking changed to multi-probe — probes² pair
    # volume — so the sf1 row was re-paid in-round.)
    "dedup_semantic",
    # r13-built: the script/charset mix screen — one projection scan
    # (5 regexp counts over text) + one map-combined agg; swept once
    # to prove the scan-bound shape.
    "text_script_profile",
    # r13 second batch: the code-vs-prose screen (same scan-bound
    # shape, 2 regexp passes) and the Syntetos-Boylan quadrant (dim
    # join + two rollup aggs).
    "text_code_detect",
    "orders_adi_cv2",
    # r13 third batch: the OCR screen (scan + split-filter) and the
    # alpha panels (fact agg + unit filter join + cat rollups).
    "text_ocr_artifacts",
    "eval_krippendorff_alpha",
    # r13 fourth batch: the rouge-movement BLEU (token/bigram explode
    # + gram equi-join + 1-row reduce).
    "docs_bleu",
    # r10 second batch: the query-set × corpus negative join, the
    # bigram explode + distinct, and the three rollup-bounded aggs.
    "sim_hard_negatives",
    "feat_hashing_collisions",
    "agg_mutual_information",
    "privacy_l_diversity",
    "events_periodogram",
    # r10 third batch: the 3-round label join, the token-explode BM25
    # aggs, and the two user-window rollups.
    "graph_label_propagation",
    "text_bm25_topk",
    "events_conversion_lag",
    "events_bounce_rate",
    # r10 fourth batch: two corpus aggs each, sweeps on bounded frames.
    "agg_raking_ipf",
    "orders_repeat_purchase_curve",
    # r10 fifth batch: one corpus agg to the daily rollup.
    "events_sprt_purchase_rate",
    # r10 sixth batch: user-grain distinct + bounded rollups.
    "events_ab_srm",
    "agg_trend_cochran_armitage",
    "agg_negbin_overdispersion",
    # r10 seventh batch: QI cell rollup + zero-cell grid.
    "privacy_t_closeness",
    # r10 eighth batch: per-table conditional-count sweeps + the
    # (type, day, hour) block-maxima chain.
    "privacy_forget_user_purge",
    "agg_gumbel_peak_fit",
    # r10 ninth batch: the (n, doc+1, gram) overlap join and the
    # scan-side template classifier.
    "docs_rouge_n",
    "docs_instruction_format_check",
    # r10 tenth batch: one corpus agg + the 210-row literal filter.
    "events_holt_winters_forecast",
    # r10 eleventh batch: one fact agg + scan-side Luhn folds.
    "orders_price_elasticity",
    "fn_luhn_checksum",
    # r10 twelfth batch: calendar-rollup statistics.
    "events_hodges_lehmann_daily",
    "events_runs_test",
    # r10 thirteenth batch: token explode + broadcast vocab join.
    "corpus_tokenizer_oov_rate",
    # r11 prior-session batches: calendar-rollup rank tests, the
    # survival duration rollup, and the co-purchase triangle frames.
    "agg_kruskal_wallis",
    "agg_mann_kendall",
    "events_nelson_aalen",
    "graph_clustering_coefficient",
    # r11 batches three..eight: the densified-grid blocked rank test,
    # the co-purchase degree-moment frames (the triangle_count pair
    # posture), the two order-keyed ranking windows, the contingency
    # cross product, the order-grain moment reduce, the type-pair move
    # grid, the part-keyed Croston windows + weight join, the brand
    # demand spine + cumulative quantile windows, the label-centroid
    # broadcast assignment, the first-hit window, the trade-graph
    # distinct-edge + nation rollups, the running-precision windows,
    # the 4-way bounded feature rollup union, and the year-stratum MH
    # reduce.
    "agg_friedman_test",
    "graph_assortativity",
    "eval_ndcg",
    "agg_jonckheere_terpstra",
    "agg_partial_corr",
    "events_lead_lag_cmh",
    "orders_croston_demand",
    "orders_newsvendor",
    "embed_silhouette",
    "eval_mrr",
    "graph_modularity",
    "eval_map",
    "feat_split_gain",
    "agg_odds_ratio_mh",
    # r11 tenth batch: the 24-cell circular rollup and the
    # customer-grain paired agg.
    "events_rayleigh_hour",
    "agg_mcnemar",
    # r11 eleventh batch: the calendar x 8 lag join and the
    # customer-grain three-era paired agg.
    "agg_ljung_box",
    "agg_cochran_q",
    # r11 twelfth batch: the assortativity-posture pair frames with
    # suffix-summed histograms, and the two order-keyed RBO windows.
    "graph_rich_club",
    "eval_rbo",
    # r11 thirteenth batch: calendar-rollup arg-max and the brand
    # annualized-demand frame.
    "agg_grubbs_test",
    "orders_eoq",
    # r11 fourteenth batch: the contingency cross and the
    # median-join + moment reduce.
    "agg_gamma_gk",
    "agg_brown_forsythe",
]


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


class SkewReader:
    """Worst-stage task-skew via the Spark REST status API."""

    def __init__(self, spark):
        self.base = None
        try:
            ui = spark.sparkContext.uiWebUrl
            app_id = spark.sparkContext.applicationId
            if ui:
                self.base = f"{ui}/api/v1/applications/{app_id}"
        except Exception:
            pass

    def seen_stages(self) -> set[int]:
        if not self.base:
            return set()
        try:
            return {
                s["stageId"] for s in _rest(f"{self.base}/stages?status=complete")
            }
        except Exception:
            return set()

    def worst_skew(self, before: set[int]) -> dict | None:
        """Worst max/median task-duration ratio over the query's stages.

        Two readouts (r9): ``max_over_median`` (all stages — comparable
        with r5-r8 tokens) and ``real`` (stages whose MEDIAN task is
        ≥200 ms).  The split exists because the fixture's large tables
        hold only ~6 parquet row groups: with 8 MB splits most scan
        tasks own an empty byte range (tens of ms) while the 6
        row-group-bearing tasks do all the work, so a scan stage posts
        a 30-40x ratio that is split-accounting, not key skew (the r8
        pagerank investigation: after the hub fix every RANK stage sat
        at <=1.4x while the edge-build scan still tokened 40x).  A
        stage whose median task already does real work cannot hide
        behind that artifact, so ``real`` is the key-skew signal."""
        if self.base is None:
            return None
        worst, worst_real = None, None
        try:
            for s in _rest(f"{self.base}/stages?status=complete"):
                if s["stageId"] in before or s["numCompleteTasks"] < 2:
                    continue
                q = _rest(
                    f"{self.base}/stages/{s['stageId']}/{s['attemptId']}/"
                    "taskSummary?quantiles=0.5,1.0"
                )
                med, mx = q["duration"][0], q["duration"][1]
                ratio = round(mx / med, 2) if med > 0 else float(mx > 0)
                cand = {
                    "stage": s["stageId"],
                    "tasks": s["numCompleteTasks"],
                    "max_task_ms": round(mx),
                    "max_over_median": ratio,
                }
                if worst is None or cand["max_over_median"] > worst["max_over_median"]:
                    worst = dict(cand)
                if med >= 200 and (
                    worst_real is None
                    or cand["max_over_median"] > worst_real["max_over_median"]
                ):
                    worst_real = dict(cand)
        except Exception:
            return None
        if worst is not None:
            worst["real"] = worst_real
        return worst


def main() -> int:
    sf1_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SSKOS_SF1_DIR", "/root/repo/.scratch/sf1")
    )
    if not os.path.exists(f"{sf1_dir}/lineitem.parquet"):
        raise SystemExit(f"run tools/gen_sf1.py first ({sf1_dir} missing)")

    import os as _os

    _os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")
    from pyspark.sql import SparkSession

    from spark_streaming_kafka_offset_spark import session as S
    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sskos-stress-sf1")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")  # REST status API for skew
        .config("spark.ui.port", "4049")
        .config("spark.sql.ansi.enabled", "true")
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ["SPARK_GRAFT_MAX_PARTITION_BYTES"],
        )
        .getOrCreate()
    )
    S.ensure_configs(spark)
    queries = entrymod.queries()
    skew = SkewReader(spark)

    # Optional key filter (argv[2:]): sweep only the named keys and MERGE
    # into the existing BENCH_sf1.json instead of replacing it — a new
    # op's toll run shouldn't re-pay the whole 25-op sweep.
    selected = sys.argv[2:] or STRESS_SET
    unknown = [k for k in selected if k not in STRESS_SET]
    if unknown:
        raise SystemExit(f"not in STRESS_SET: {unknown}")

    queries["agg_hash"](spark, sf1_dir).collect()  # warm-up
    out: dict[str, dict] = {}
    for key in selected:
        t0 = time.monotonic()
        n01 = len(queries[key](spark, "/root/testdata/sf0.1").collect())
        w01 = round(time.monotonic() - t0, 2)
        before = skew.seen_stages()
        t0 = time.monotonic()
        n = len(queries[key](spark, sf1_dir).collect())
        wall = round(time.monotonic() - t0, 2)
        rec = {
            "wall_sec": wall,
            "rows": n,
            "sf01_wall_sec": w01,
            "sf01_rows": n01,
            "growth_10x": round(wall / w01, 2) if w01 > 0 else None,
            "skew": skew.worst_skew(before),
        }
        out[key] = rec
        print(f"# {key}: sf1 {wall}s ({n} rows), sf0.1 {w01}s, "
              f"growth {rec['growth_10x']}x, skew {rec['skew']}",
              file=sys.stderr)

    merged = dict(out)
    if sys.argv[2:] and os.path.exists("BENCH_sf1.json"):
        with open("BENCH_sf1.json") as f:
            prior = json.load(f).get("queries", {})
        merged = {**prior, **out}
    payload = {
        "metric": "sf1_stress_sweep",
        "sf1_dir": sf1_dir,
        "unit": "sec",
        "queries": merged,
        "total_sf1_wall": round(
            sum(r["wall_sec"] for r in merged.values()), 2
        ),
    }
    print(json.dumps({**payload, "queries": out}))  # this run's keys only
    with open("BENCH_sf1.json", "w") as f:
        json.dump(payload, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
