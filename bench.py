#!/usr/bin/env python
"""Benchmark harness: runs the headline declared queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query materializes via the `noop` sink (full execution, no
driver-side collect cost) after a warm-up run of the session.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from etl_script_spark.plans.catalog import CATALOG
from etl_script_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "upsert_keyed",
    "diff_sync_scoped",
    "dedup_composite_first",
    "topk_per_group",
    "range_projection",
]

# breadth sample (timed + reported, NOT counted into `value`, so the
# headline total stays comparable across rounds). Entries are only
# ever APPENDED so earlier rounds' numbers stay attributable.
EXTRA = [
    "st_tumbling_window",
    "st_session_window",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_score",
    "r2_pivot_event_types",
    "anomalies_running_mean_jvm",
    "dedup_cc_alternating",
    "skew_two_phase_agg",
    # --- round 4: curation family ---
    "pipeline_curation_e2e",
    "cluster_kmeans_assign",
    "text_repetition",
    "dedup_repeated_spans",
    # --- round 4: sketches / search / tokenize / maintenance ---
    "sk_bloom_prune_join",
    "sk_approx_distinct",
    "search_bm25_topk",
    "tok_bpe_roundtrip",
    "dq_expectations_metrics",
    "inc_agg_maintenance",
    "layout_range_clustered_read",
    "pipeline_remittance_e2e",
    # --- round 4: classic queries / events / entity ops / graph ---
    "q10_returned_items",
    "q6_forecast_revenue",
    "ev_cohort_retention",
    "ev_value_cube",
    "fuzzy_name_match",
    "scd2_dimension_history",
    "graph_pagerank",
    "sk_theta_set_ops",
    "layout_compact_small_files",
    # --- round 5: TPC-H completion + fixed/verified families ---
    "q7_volume_shipping",
    "q9_product_profit",
    "q13_customer_distribution",
    "q17_small_qty_revenue",
    "q21_waiting_supplier",
    "embedding_quantize_int8",
    "feat_normalize_pipeline",
    "dedup_paragraphs_global",
    "quality_gopher_rules",
    "text_bigram_nll",
    "decontam_embedding_neardup",
    "sample_temperature_mix",
    "layout_zorder_clustered_read",
    # --- round 5: second batch (time-series / CDC / IVM / graph /
    # similarity / governance) ---
    "ts_ewma_fir",
    "ts_mad_outliers",
    "ev_attribution_last_touch",
    "cdc_apply_changes",
    "inc_join_maintenance",
    "graph_triangle_count",
    "sim_tfidf_cosine_pairs",
    "gov_k_anonymity",
    "sample_diverse_buckets",
    "feat_quantile_binning",
    "dedup_semantic_clusters",
    "link_fellegi_sunter",
    "st_stream_cdc_apply",
    "chat_flatten_turns",
    "graph_kcore",
    "s24_xml_roundtrip",
    # round 6
    "s1_encoding_probe_distributed",
    "link_fs_em_weights",
    "inc_agg_join_maintenance",
    "inc_agg_join_retract",
    "export_train_shards",
    # round 6: corpus diagnostics / curation batch
    "corpus_ks_drift",
    "corpus_zipf_slope",
    "curation_token_budget_select",
    "rlhf_preference_pairs",
    "mm_binary_simhash_neardup",
    "sample_weighted_gumbel_topk",
    "decontam_bloom_ngram",
    "st_stream_drift_monitor",
    # round 7
    "text_winnow_fingerprints",
    "dedup_containment_pairs",
    "dedup_sentences_global",
    "text_novelty_vs_reference",
    "gov_source_datacard",
    "split_group_aware",
    "tok_fertility_stats",
    "dedup_jaccard_prefix_filter",
    "ann_maxsim_topk",
    "scd2_point_in_time_join",
    "text_readability_flesch",
    "text_stupid_backoff",
    "hier_flatten_paths",
    "gov_randomized_response",
    "feat_quantile_normalize",
    "basket_part_pairs_lift",
    "mm_video_scene_segments",
    "text_code_detect",
    "ts_ohlc_resample",
    "ev_markov_transitions",
    "stat_ols_slope_groups",
    "cust_gini_by_nation",
    "ts_cusum_changepoints",
    "ts_seasonality_index",
    "dq_benford_first_digit",
    "text_top_keywords",
    "part_abc_by_brand",
    "ev_top_paths",
    "sk_countmin_estimate",
    "dwh_early_fact_retry",
    "st_stream_ohlc",
    "sql_null_semantics",
    "stat_chi2_independence",
    "diag_key_skew",
    "pipeline_r7_analytics_report",
    "cust_rfm_segments",
    "li_ship_latency_hist",
    # round 7: second batch (7f/7n) — the two with real steady-state
    # costs (pairwise statistic, x64 hashed bootstrap) plus the new
    # layout/sketch/streaming families
    "stat_theil_sen",
    "stat_bootstrap_ci",
    "link_sorted_neighborhood",
    "sk_kmv_jaccard",
    "layout_hilbert_clustered_read",
    "sim_kcenter_coreset",
    "st_stream_fingerprint",
    # round 8: rank statistics / curation planning batch
    "stat_kruskal_wallis",
    "stat_kendall_tau",
    "stat_cuped_adjust",
    "stat_brown_forsythe",
    "ts_period_detect",
    "text_char_entropy",
    "corpus_js_divergence",
    "dedup_pair_sim_histogram",
    "augment_token_dropout",
    "curation_batch_budget",
    "curation_curriculum_interleave",
    "search_snippet_window",
    "search_symspell_suggest",
    "curation_pack_efficiency",
    # round 9: effect-size/paired-binary stats, link prediction,
    # smoothing, corpus diagnostics, layout audit
    "stat_levene_mean",
    "stat_mcnemar",
    "stat_cochran_q",
    "stat_friedman",
    "stat_cohens_d",
    "graph_adamic_adar",
    "ts_holt_linear",
    "corpus_burstiness",
    "text_oov_rate",
    "layout_file_skipping",
    "dq_referential_integrity",
    "s26_avro_roundtrip",
    "lake_time_travel_read",
    # round 10: classic-test completions, FDR gate, survival curves,
    # transactional lakehouse upsert, avro logical types
    "stat_anova_oneway",
    "stat_two_proportion_z",
    "stat_runs_test",
    "stat_bh_fdr",
    "surv_kaplan_meier",
    "lake_upsert_txn",
    "s26_avro_decimal_date",
    "surv_log_rank",
    "stat_calibration_bins",
    "ts_mann_kendall",
    "ts_seasonal_decompose",
    "corpus_chao1",
]

# Entries whose plans are dominated by codegen'd lambda aggregates
# (sort_array+collect_list+transform) or per-invocation fixed costs
# (micro-batch setup, iterative peeling): C2 compiles these over ~6
# executions, so min-of-2-after-one-warm lands mid-compilation and
# scatters up to 2x round-over-round (r6 flagged chat_flatten_turns
# 2.21x; isolated 6-pass re-measure converged 1.12 -> 0.63 s, i.e. no
# regression). These get three extra passes so the reported number is
# the steady state a long-lived cluster runs at.
DEEP_WARM = {"chat_flatten_turns", "st_stream_cdc_apply", "graph_kcore"}

# The top manifest walls get a THIRD tier: a dedicated fresh session
# at the end, warm-up + min-of-2 per entry. Round 7 proved the cold
# manifest numbers for these are session-pressure artifacts, not plan
# costs (embedding_near_dups 57.4 s in-manifest vs 1.0 s isolated;
# text_winnow_fingerprints 31.4 vs 8.6; dedup_near_canonical 29.7 vs
# 5.1) — without this tier every round re-litigates the same phantom
# regressions. Entries only ever APPEND.
DEEP_ISOLATED = [
    "stat_randomization_test",
    "embedding_near_dups",
    "st_stateful_anomalies",
    "st_stream_stream_join",
    "dedup_cc_clusters",
    "pipeline_r7_curation_e2e",
    "text_winnow_fingerprints",
    "dedup_near_canonical",
    "pipeline_llm_prep_e2e",
    "ann_ivfpq_topk",
    "st_stream_quota_gate",
    "sim_tfidf_cosine_pairs",
    # round 9: never-isolated 13.8 s manifest wall (VERDICT r8 ask)
    "stat_partial_corr",
    # round 11 (VERDICT r10 asks #5/#6): the four e2e pipelines whose
    # 9-25 s cold-manifest walls re-litigated every round, plus the
    # two most expensive never-isolated entries — steady-state numbers
    # land in the artifact itself (additions-only)
    "pipeline_sale_report_e2e",
    "pipeline_invoice_clean_e2e",
    "pipeline_r6_curation_e2e",
    "pipeline_dbd_financial_e2e",
    "curation_dsir_select",
    "dedup_pair_sim_histogram",
]


# --- per-pass host-load instrumentation (round 9) --------------------
# The r8 isolated tier contradicted STRESS.md quiet-host numbers by
# 2.5-24x with no load evidence attached. Every timed pass now records
# the JVM's actual CPU seconds (from /proc/<jvm>/stat) next to wall:
# a contended host shows wall >> jvm_cpu/32 with jvm_cpu stable across
# rounds; a real regression shows jvm_cpu itself growing. Host steal
# time (hypervisor neighbors on a shared VM) and loadavg complete the
# picture.

_CLK = os.sysconf("SC_CLK_TCK")


def _jvm_pid() -> int | None:
    """The py4j-launched JVM: the direct java child of this process."""
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                content = f.read()
            comm = content[content.index("(") + 1 : content.rindex(")")]
            rest = content[content.rindex(")") + 2 :].split()
            if comm == "java" and int(rest[1]) == me:
                return int(pid)
        except (OSError, ValueError):
            continue
    return None


def _pid_cpu_sec(pid: int | None) -> float | None:
    """utime+stime of one process (its threads included) in seconds."""
    if pid is None:
        return None
    try:
        with open(f"/proc/{pid}/stat") as f:
            content = f.read()
        rest = content[content.rindex(")") + 2 :].split()
        return (int(rest[11]) + int(rest[12])) / _CLK
    except (OSError, ValueError):
        return None


def _host_cpu_sec() -> tuple[float, float]:
    """(busy, steal) seconds summed over all cpus since boot."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    # user nice system idle iowait irq softirq steal
    busy = vals[0] + vals[1] + vals[2] + (vals[5] if len(vals) > 5 else 0) \
        + (vals[6] if len(vals) > 6 else 0)
    steal = vals[7] if len(vals) > 7 else 0
    return busy / _CLK, steal / _CLK


def _loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _timed_pass(run, jvm_pid: int | None) -> dict:
    """One timed execution with load evidence attached."""
    c0 = _pid_cpu_sec(jvm_pid)
    b0, s0 = _host_cpu_sec()
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    b1, s1 = _host_cpu_sec()
    c1 = _pid_cpu_sec(jvm_pid)
    return {
        "wall": round(wall, 4),
        "jvm_cpu": round(c1 - c0, 2) if c0 is not None else None,
        "host_busy_cpu": round(b1 - b0, 2),
        "host_steal_cpu": round(s1 - s0, 2),
        "loadavg1": _loadavg1(),
    }


def _release(spark) -> None:
    """Free cross-query session state between manifest entries: cached
    Datasets (CacheManager), persisted/localCheckpointed RDDs (NOT in
    the CacheManager — they otherwise linger until GC and tilt later
    entries' timings via memory pressure), and Python-side refs."""
    import gc

    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd_id in list(jsc.getPersistentRDDs().keySet().toArray()):
        try:
            jsc.sc().unpersistRDD(rdd_id, False)
        except Exception:
            pass
    gc.collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    # --- session 1: HEADLINE ONLY, fresh JVM state -------------------
    # The headline metric runs in its OWN SparkSession so that catalog
    # growth (190+ manifest queries polluting codegen caches, GC
    # pressure, broadcast cleanup backlog) can never tilt it — the r4
    # +6% "regression" was exactly this session pressure: the same
    # plans re-measured in an isolated session beat the r3 numbers.
    spark = get_spark(app_name="etl-script-spark-bench-headline")

    # Warm-up pass (untimed): populates whole-stage-codegen class cache
    # and JIT-compiles the hot paths, so the timed pass measures
    # steady-state execution — the regime a long-lived cluster runs in
    # — rather than one-time class compilation.
    for name in HEADLINE:
        if name in CATALOG:
            CATALOG[name].spark(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()

    # min of THREE timed passes (raised from two in r8): this host is
    # a shared VM whose single-pass numbers scatter up to 2x with
    # neighbor load (r7/r8 both recorded uniform ~1.3x inflation on
    # untouched code; isolated quiet-window re-measures landed back
    # at the r6 numbers). The min over three warmed passes is the
    # steady-state number a warmed cluster actually delivers.
    #
    # STEAL RETRY (round 10): the r9 artifact recorded a 15.7 s
    # headline whose own pass evidence showed 164.8 CPU-s of
    # hypervisor steal vs 61.1 of jvm_cpu — a contended-window
    # number, with the quiet 6.27 s re-run living only in STRESS.md
    # prose. Now the tier itself retries (bounded) when any pass's
    # steal exceeds HEADLINE_STEAL_LIMIT, KEEPS every attempt's
    # passes as evidence, and banks the min over steal-clean passes
    # (falling back to the global min if no window was quiet).
    HEADLINE_STEAL_LIMIT = 5.0  # CPU-s of steal in one timed pass
    HEADLINE_MAX_ATTEMPTS = 3
    HEADLINE_RETRY_SLEEP = 45.0
    timings: dict[str, float] = {}
    headline_passes: dict[str, list[dict]] = {
        n: [] for n in HEADLINE if n in CATALOG
    }
    jvm = _jvm_pid()
    attempt_max_steal: list[float] = []
    for attempt in range(HEADLINE_MAX_ATTEMPTS):
        worst = 0.0
        for name in HEADLINE:
            if name not in CATALOG:
                continue
            q = CATALOG[name]
            for _ in range(3):
                p = _timed_pass(
                    lambda q=q: q.spark(spark, sf_dir)
                    .write.mode("overwrite")
                    .format("noop")
                    .save(),
                    jvm,
                )
                p["attempt"] = attempt
                headline_passes[name].append(p)
                worst = max(worst, p["host_steal_cpu"])
        attempt_max_steal.append(round(worst, 2))
        if worst <= HEADLINE_STEAL_LIMIT:
            break
        if attempt < HEADLINE_MAX_ATTEMPTS - 1:
            print(
                f"headline attempt {attempt}: max pass steal "
                f"{worst:.1f} CPU-s > {HEADLINE_STEAL_LIMIT}; "
                f"retrying in {HEADLINE_RETRY_SLEEP:.0f}s",
                file=sys.stderr,
            )
            time.sleep(HEADLINE_RETRY_SLEEP)
    # bank the min over steal-clean passes; if every window was
    # contended the global min still records, and attempt_max_steal
    # carries the indictment in the artifact itself
    used_passes: list[dict] = []
    for name, ps in headline_passes.items():
        quiet = [p for p in ps if p["host_steal_cpu"] <= HEADLINE_STEAL_LIMIT]
        pool = quiet if quiet else ps
        used_passes.extend(pool)
        timings[name] = round(min(p["wall"] for p in pool), 4)
    spark.stop()

    # --- session 2: breadth sample + full manifest -------------------
    spark = get_spark(app_name="etl-script-spark-bench-manifest")
    extra: dict[str, float] = {}
    for name in EXTRA:
        if name not in CATALOG:
            continue
        q = CATALOG[name]
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        # Steady-state = min of two timed passes: the JVM's C2 compiler
        # finishes asynchronously, so the pass right after warm-up can
        # still run partially interpreted — measured 2x inflation on
        # the heavier entries when they sit early in the session. The
        # min is the standard steady-state estimator; _release before
        # each pass clears caches/persisted RDDs so every pass is a
        # full recompute, never a cache scan.
        best = float("inf")
        for _ in range(5 if name in DEEP_WARM else 2):
            _release(spark)
            start = time.perf_counter()
            q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - start)
        extra[name] = round(best, 4)

    # Full per-query manifest: EVERY catalog query timed once (single
    # pass, no warm-up — attribution data for round-over-round
    # regressions, not the headline metric). Headline/extra queries
    # reuse their steady-state numbers. The session RESTARTS every
    # MANIFEST_CHUNK entries: with 300+ catalog queries, accumulated
    # session pressure (codegen caches, GC backlog, broadcast cleanup)
    # inflated once-timed entries up to 10-30x near the tail (r7:
    # dedup_cc_clusters 72-149 s in-manifest vs 6.2 s isolated) —
    # chunked sessions bound the pressure so deltas attribute to
    # operators, at ~10 s of restart cost per chunk.
    MANIFEST_CHUNK = 60
    manifest: dict[str, float] = {**timings, **extra}
    errors: dict[str, str] = {}
    chunk_n = 0
    for name, q in CATALOG.items():
        if name in manifest:
            continue
        if chunk_n and chunk_n % MANIFEST_CHUNK == 0:
            spark.stop()
            spark = get_spark(app_name=f"etl-script-spark-bench-m{chunk_n}")
        chunk_n += 1
        try:
            _release(spark)
            start = time.perf_counter()
            q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            manifest[name] = round(time.perf_counter() - start, 4)
        except Exception as e:  # one bad query must not kill the bench
            errors[name] = f"{type(e).__name__}: {e}"[:200]

    spark.stop()

    # --- session 3: isolated steady-state tier for the top walls ----
    spark = get_spark(app_name="etl-script-spark-bench-isolated")
    jvm = _jvm_pid()
    isolated: dict[str, float] = {}
    isolated_passes: dict[str, list[dict]] = {}
    for name in DEEP_ISOLATED:
        if name not in CATALOG:
            continue
        q = CATALOG[name]

        def _run(q=q):
            q.spark(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()

        try:
            _release(spark)
            warm = _timed_pass(_run, jvm)
            warm["warmup"] = True
            passes = [warm]
            for _ in range(2):
                _release(spark)
                passes.append(_timed_pass(_run, jvm))
            isolated_passes[name] = passes
            isolated[name] = round(
                min(p["wall"] for p in passes if not p.get("warmup")), 4
            )
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:200]

    total = round(sum(timings.values()), 4)
    # Full manifest goes to a FILE (the driver's stdout capture keeps
    # only the tail, so a giant single line would swallow the headline);
    # stdout gets one compact JSON line, printed LAST.
    full = {
        "manifest": manifest,
        "isolated_steady_state": isolated,
        "isolated_passes": isolated_passes,
        "headline_passes": headline_passes,
        "headline_attempts": len(attempt_max_steal),
        "headline_attempt_max_steal": attempt_max_steal,
        "headline_steal_limit": HEADLINE_STEAL_LIMIT,
        "load_semantics": (
            "Every headline/isolated pass records wall seconds next to "
            "the JVM's actual CPU seconds (/proc/<jvm>/stat utime+stime "
            "across all executor threads), whole-host busy and STEAL "
            "CPU seconds (/proc/stat; steal = hypervisor neighbors on "
            "this shared VM), and loadavg at pass end. Read it as: "
            "jvm_cpu stable across rounds but wall inflated (or steal "
            "high) = host contention, not a regression; jvm_cpu itself "
            "grown = a real plan/code regression. host_busy_cpu minus "
            "jvm_cpu approximates co-tenant load inside the VM."
        ),
        "isolated_semantics": (
            "DEEP_ISOLATED entries re-measured in a dedicated fresh "
            "session at the end: warm-up pass + min-of-2, caches "
            "released between passes. These are the authoritative "
            "steady-state numbers for the heavy operators; the "
            "manifest's cold single-pass numbers for the same names "
            "include JIT + accumulated session pressure and are for "
            "regression attribution only."
        ),
        "manifest_semantics": (
            "headline runs in its OWN fresh SparkSession (isolated from "
            "suite growth); extra entries are steady-state (after "
            "warm-up) in a second session; all other manifest entries "
            "are a SINGLE COLD pass each (JIT/codegen compile included) "
            "in sessions RESTARTED every 60 entries (r7 protocol "
            "change: unchunked sessions inflated tail entries 10-30x "
            "via accumulated codegen/GC pressure) "
            "- regression attribution, not throughput. DEEP_WARM "
            "entries (chat_flatten_turns, st_stream_cdc_apply, "
            "graph_kcore) are min-of-5: their lambda-aggregate / "
            "fixed-overhead plans need ~6 executions for C2 to finish, "
            "so min-of-2 numbers for them scattered up to 2x across "
            "rounds (r6 outliers re-measured isolated in r7: chat "
            "1.12->0.63 s over 6 passes with unchanged code; cdc/kcore "
            "code untouched since r5, scatter band 1.3-2.1 s / "
            "1.3-1.6 s). Deltas on DEEP_WARM entries from r5/r6 "
            "reflect this protocol change, not operator changes."
        ),
    }
    if errors:
        full["manifest_errors"] = errors
    manifest_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_MANIFEST.json")
    with open(manifest_path, "w") as f:
        json.dump(full, f, indent=1)
    print(f"manifest ({len(manifest)} queries, {len(errors)} errors) -> "
          f"{manifest_path}", file=sys.stderr)
    spark.stop()
    # The driver captures only the TAIL of stdout (~2000 chars): keep the
    # final line compact — headline queries only. extra_queries live in
    # BENCH_MANIFEST.json (round 5's line with them inline was >3 KB and
    # the head, including "value", fell outside the capture window).
    out = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "protocol": "headline_isolated_session_min_of_3_steal_retry",
        "attempts": len(attempt_max_steal),
        # contention-vs-regression evidence for the headline, summed
        # over the passes the min was TAKEN FROM (steal-clean pool;
        # every attempt's per-pass detail is in BENCH_MANIFEST)
        "host": {
            "jvm_cpu_sec": round(
                sum(p["jvm_cpu"] or 0 for p in used_passes), 1
            ),
            "wall_sec": round(sum(p["wall"] for p in used_passes), 1),
            "steal_sec": round(
                sum(p["host_steal_cpu"] for p in used_passes), 1
            ),
            "loadavg_max": max(
                (p["loadavg1"] for p in used_passes), default=0.0
            ),
        },
    }
    line = json.dumps(out)
    assert len(line) < 1500, f"bench stdout line too long ({len(line)} chars)"
    print(line)


if __name__ == "__main__":
    sys.exit(main())
