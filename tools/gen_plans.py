#!/usr/bin/env python
"""Regenerate PLANS.md: physical-plan evidence for representative
catalog queries — pushdown, pruning, codegen, join strategy. Run from
the repo root: ``python tools/gen_plans.py [sf_dir]``."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from etl_script_spark.plans.catalog import CATALOG  # noqa: E402
from etl_script_spark.session import get_spark  # noqa: E402

SHOW = {
    "range_projection": (
        "P12/P13 scan: the shipdate range predicate and the 5-column "
        "projection reach the parquet scan (PushedFilters + pruned "
        "ReadSchema) — at 100 TB this is the difference between reading "
        "a month and reading everything."
    ),
    "q5_local_supplier_volume": (
        "Star join: region/nation/supplier dims broadcast; at bench "
        "scale even the facts fit under the 64 MB broadcast threshold, "
        "on a cluster AQE falls back to sort-merge for the fact-fact "
        "edge. Zero shuffles before the final groupBy."
    ),
    "q1_pricing_summary": (
        "Pricing rollup: scaled-int64 money math inside one "
        "whole-stage-codegen span; partial aggregation map-side, one "
        "exchange on the two grouping keys."
    ),
    "dedup_composite_first": (
        "Keep-first dedup as min(struct(ord, payload)) hash aggregate: "
        "partial combine before the exchange, no per-key sort window."
    ),
    "p7_trailing_trim": (
        "Order-dependent trailing trim: explicit per-file ordinal, "
        "max-over-window of the last non-junk position, single window "
        "pass — the engine's general answer to the reference's implicit "
        "file order."
    ),
    "anomalies_running_mean_jvm": (
        "Running-mean anomaly flags, JVM default path: one exchange on "
        "user_id, one sort, one Window operator, zero Python nodes — "
        "the shape the Python-state streaming twin pays workers for."
    ),
    "bucketed_join_zero_shuffle": (
        "Both sides bucketed at rest on the join key: sort-merge join "
        "with NO Exchange on either side — repeated nightly merges "
        "never re-shuffle the gold table."
    ),
    "s9_scrape_card_parse": (
        "Archived-page parse: generate + parse entirely in one "
        "whole-stage-codegen projection — zero shuffles, zero UDFs; "
        "the scan is the only cost at 100 TB."
    ),
    "pii_redact_scrub": (
        "PII scrub: five chained regexp families fold into ONE "
        "codegen projection over the scan — zero exchanges, so "
        "redaction costs exactly one pass at 100 TB."
    ),
    "decontam_ngram_overlap": (
        "Benchmark decontamination: the bench 8-gram set broadcasts "
        "(BroadcastHashJoin on the 64-bit gram hash, string equality "
        "re-checked); the corpus side only explodes and re-aggregates "
        "per doc — the 100 TB side never shuffles its text."
    ),
    "cluster_kmeans_assign": (
        "Distributed Lloyd assignment: centroids are literal arrays "
        "inside a codegen projection (argmax of 8 dot products per "
        "row) — no join, no shuffle for assignment; only the k x dim "
        "update aggregation exchanges, and it moves integers."
    ),
    "sk_bloom_prune_join": (
        "Bloom-pruned join: the 2 KB bitmap membership test is a "
        "plain Filter ON THE SCAN side (literal array + bit ops in "
        "codegen, before the exchange), then the exact join removes "
        "false positives — at 100 TB only the ~match fraction of the "
        "fact table reaches the join."
    ),
    "stat_spearman_rho": (
        "Spearman via two-phase bucketed midranks: the only "
        "unpartitioned windows run over the <=1025-row bucket tables "
        "(offsets broadcast back); rank tables join the pair "
        "histogram as plain keyed shuffles that AQE broadcasts when "
        "an axis is low-cardinality — no global sort at any "
        "cardinality, no per-row rank materialization."
    ),
    "tok_wordpiece_roundtrip": (
        "WordPiece greedy scan: the unrolled aggregate() expression "
        "evaluates AFTER the distinct-word HashAggregate (per "
        "vocabulary word, not per occurrence) and joins back to the "
        "occurrence stream — the same amortization the BPE/unigram "
        "tokenizers use, all codegen, zero Python."
    ),
    "search_bm25_topk": (
        "BM25 top-k: term stats only for the query's terms (the "
        "explode is filtered before aggregation), df and corpus "
        "aggregates broadcast, and the final k rows come from "
        "TakeOrderedAndProject — no global sort, no corpus shuffle "
        "beyond the per-doc length aggregation."
    ),
    "layout_range_clustered_read": (
        "Range-clustered layout: the user_id range filter is in "
        "PushedFilters on the parquet scan, and because the writer "
        "range-clustered the files, footer min/max stats prune all "
        "but the 1-2 files whose interval intersects."
    ),
    "pipeline_remittance_e2e": (
        "Remittance e2e: pages fan out (hash on page_number) before "
        "the regex cascade — one exchange REUSED by both the "
        "transaction-parse and grand-total branches; the cascade is "
        "2 regex executions per pattern (sentinel replace + split), "
        "all inside whole-stage codegen."
    ),
    "fuzzy_name_match": (
        "PassJoin fuzzy join: candidates meet on a (length, seg_idx, "
        "substring) HASH equi-join — no theta join anywhere in the "
        "plan; the levenshtein verify is a plain post-join Filter."
    ),
    "q6_forecast_revenue": (
        "TPC-H Q6 shape: all three predicates in PushedFilters, "
        "ReadSchema pruned to 4 columns, one partial/final hash "
        "aggregate pair — the canonical scan-bound plan."
    ),
    "q21_waiting_supplier": (
        "TPC-H Q21 shape: the EXISTS/NOT-EXISTS pair decorrelates to a "
        "left-semi then left-anti join on the orderkey shuffle with the "
        "supplier-inequality residual; the nation-filtered supplier dim "
        "broadcasts. The canonical double-correlated-subquery plan."
    ),
    "dedup_ngram_jaccard": (
        "AllPairs prefix-filtered exact Jaccard: only each doc's "
        "|X|-ceil(t|X|)+1 globally rarest shingles enter the candidate "
        "self-join (~20% of rows at t=0.8), candidates verify with one "
        "array_intersect over per-doc sorted hash arrays. Lossless for "
        "the threshold; the join output shrinks quadratically in the "
        "prefix fraction."
    ),
    "decontam_embedding_neardup": (
        "Cross-corpus contamination with bench-broadcast asymmetry: "
        "banded bench keys, candidate pairs, and verify vectors all "
        "broadcast; the corpus side is ONE scan with zero shuffles — "
        "the shape that matters when the corpus is 100 TB and the "
        "benchmark suite is a few thousand rows."
    ),
    "graph_pagerank": (
        "PageRank round: one join + one aggregation per iteration "
        "over localCheckpointed inputs — plan depth stays constant "
        "per round instead of growing with iteration count."
    ),
    "ev_attribution_last_touch": (
        "Last-touch attribution: ONE window exchange on user_id "
        "carries both ignore-nulls last_value columns, then a 3-key "
        "rollup — no self-join of the event stream, so the shape is "
        "flat in history length."
    ),
    "sim_tfidf_cosine_pairs": (
        "All-pairs tf-idf cosine: the term self-join is the only "
        "data-sized shuffle; weights/norms/dots stay integer-exact "
        "(DECIMAL(38,0) aggregates) until the final double division."
    ),
    "link_fellegi_sunter": (
        "Blocked Fellegi-Sunter linkage: a single hash equi-join on "
        "the composed blocking key generates candidates; scoring is a "
        "pure codegen projection (levenshtein + CASE weights), no UDF."
    ),
    "graph_triangle_count": (
        "Compact-forward triangle count: degree join orients edges, "
        "two self-joins close wedges — the hub-safe plan whose wedge "
        "fan-out is the oriented out-degree, O(sqrt m) under skew."
    ),
    "ts_ewma_fir": (
        "FIR EWMA: eight lag() taps share ONE window spec — one "
        "exchange + one sort + one Window operator, the weighted sum "
        "fully inside whole-stage codegen."
    ),
    "corpus_ks_drift": (
        "Two-sample KS: the map-side-combined groupBy reduces the "
        "corpus to |distinct values| rows BEFORE the single-partition "
        "cumulative window — the unavoidable serial CDF pass runs over "
        "the reduced frame, never raw rows; the ppb division is exact "
        "integer DIV over DECIMAL(38,0)."
    ),
    "curation_token_budget_select": (
        "Budgeted selection without a global sort: per-grade token "
        "mass aggregates map-side, the cumulative pass runs over the "
        "tiny grade table, and the grade limits BROADCAST back onto "
        "the corpus — only the one boundary grade orders its rows."
    ),
    "augment_mlm_mask": (
        "MLM masking: scan + ONE codegen Project — zip_with/filter "
        "higher-order functions, zero explode, zero exchange, zero "
        "Python; denoising-corpus prep at parquet-scan speed."
    ),
    "rlhf_preference_pairs": (
        "Preference pairs: max/min of (score,id) structs in a single "
        "map-side-combinable aggregation — one exchange total, no "
        "window, deterministic tie policy by struct ordering."
    ),
    "link_sorted_neighborhood": (
        "Sorted-neighborhood blocking: the global position comes from "
        "prefix-bucket offsets (broadcast) + a window PARTITIONED BY "
        "prefix — no single-partition rank — and pairing is an "
        "equi-join on the position."
    ),
    "stat_bootstrap_ci": (
        "Hashed multiplier bootstrap: the x64 replicate explode feeds "
        "straight into a map-side-combined aggregation keyed on the "
        "replicate id (partial_sum before the exchange), so the "
        "shuffle carries 64·tasks rows, not 64·n; fan_out spreads the "
        "one-file scan before the amplification."
    ),
    "layout_hilbert_clustered_read": (
        "Hilbert-clustered layout: the curve index is a pure integer "
        "projection chain (codegen), range-partitioned write, and the "
        "read-back box filter prunes files by footer stats in BOTH "
        "dimensions."
    ),
    "sk_kmv_jaccard": (
        "KMV sketch: each side is a TakeOrderedAndProject (per-"
        "partition top-k, k rows to the driver) over the distinct "
        "token hashes — the set-similarity estimate never joins the "
        "corpora."
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="gen-plans", master="local[4]", shuffle_partitions=8)
    out = [
        "# PLANS — physical-plan evidence",
        "",
        f"Generated by `tools/gen_plans.py` at `{sf_dir}`. Each section:",
        "what to look for, then the executed plan (AQE final).",
        "",
    ]
    for name, why in SHOW.items():
        if name not in CATALOG:
            continue
        df = CATALOG[name].spark(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = re.sub(r"#\d+L?", "", plan)  # strip expr ids for readability
        # keep it readable: first 60 lines
        lines = plan.splitlines()
        body = "\n".join(lines[:60])
        out += [f"## {name}", "", why, "", "```", body, "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOW)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
