"""Empirical scale validation: time representative operators at 1× (sf0.1)
and K× (tools/make_scale.py output) and report the wall-clock ratio.

An operator whose plan holds at scale should grow ≲ K (plus fixed
overhead amortizing AWAY, so ratios well under K are normal on tiny 1×
inputs); a ratio ≫ K flags a superlinear stage — an unbucketed pair join,
a collapsed single-partition window, a driver-side materialization.

Usage: python tools/scale_check.py [K] [ops...]   (default K=10, core set)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_OPS = [
    "pricing_summary",
    "agg_groupby_hash",
    "join_inner_hash",
    "join_broadcast",
    "window_running",
    "topk_per_group",
    "events_sessionize",
    "events_funnel",
    "dedup_exact",
    "dedup_fuzzy_minhash",
    "sim_topk_cosine",
    "sim_ann_ivf",
    "text_tfidf",
    "text_repetition",
    "text_idf_filter",
    "text_line_dedup",
    "text_decontaminate",
    "sim_pq_quantize",
    "dedup_corpus_apply",
    "query_market_share",
    "stream_tumbling",
    # Round-5 additions (VERDICT r4 item 5): the remaining heavy/pair-wise
    # ops, plus the new r5 family.
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_simhash",
    "merge_scd2",
    "stream_stream_join",
    "join_asof",
    "text_pii_scrub",
    "embedding_normalize",
    "window_distribution",
    "agg_mode",
    "text_quality_score",
    "sample_temperature",
    "sim_ivfpq_search",
    "query_promo_revenue",
    "query_small_qty_revenue",
    "query_disjunctive_revenue",
    "query_dormant_customers",
    "sample_domain_mix",
    "dedup_keep_best",
    "embedding_outlier",
    "agg_sketch_union",
    "fn_variant",
    "join_runtime_bloom",
    # Round-5 third batch: remaining TPC-H shapes + vocab/chunk/LM-score/
    # pair-geometry ops.
    "query_local_supplier_volume",
    "query_waiting_suppliers",
    "query_order_count_distribution",
    "query_min_cost_supplier",
    "text_vocab_build",
    "text_doc_chunk",
    "text_unigram_logprob",
    "sim_pair_distance_stats",
    "join_any_left",
    "agg_incremental_merge",
    "window_interpolate_linear",
    "maintenance_compact_files",
    "multimodal_audio_window",
    "migrate_verify_diff",
    "window_ewma",
    "join_interval_overlap",
    "events_cohort_matrix",
    "sim_index_query",
    # Round-5 fourth batch: graph / sequence / sketch ops. Triangle census
    # and pagerank are output-bound on the densified scale fixture (K
    # id-offset copies share the same nation node set, so the trade graph's
    # edge WEIGHTS grow K× while the vertex set is fixed — wall should stay
    # ~flat); the CMS sketch is fixed-size by construction.
    "graph_pagerank",
    "graph_triangle_count",
    "events_markov_transitions",
    "events_attribution",
    "agg_heavy_hitters_cms",
    "agg_sum_map",
    "maintenance_analyze_stats",
    "fn_geo",
    # Round-5 fifth batch: Q6 scan-agg, power-sum regression stats, and
    # substring-span dedup (O(tokens) window hashing; the join-back's
    # output is input-linear since span doc-frequencies are capped by the
    # fixture's vocabulary, so wall should track K).
    "query_forecast_revenue",
    "agg_corr_regr",
    "dedup_substring_spans",
    "events_rfm",
    "sample_mix_epochs",
    "multimodal_phash_dedup",
    "agg_delta_sum",
    "join_asof_tolerance",
    "query_yearly_growth",
    "events_gap_stats",
    "sample_hard_negatives",
    "sample_perplexity_buckets",
    # Round-5 sixth batch: co-occurrence (pairs are built in-array, so
    # wall tracks O(tokens) and the pair-count shuffle is vocab-bounded),
    # the Zipf regression (corpus scan + vocab-sized window), weighted
    # avg (plain mergeable agg), the text-format sink round trips
    # (write+read both linear), and the PCA projection (driver fit is
    # capped; the projection pass is one narrow Arrow matmul).
    "text_cooccurrence",
    "text_zipf_fit",
    "agg_weighted_avg",
    "sink_csv_roundtrip",
    "sink_json_roundtrip",
    "embedding_pca_project",
    "text_char_entropy",
    "text_compression_ratio",
    "agg_grouping_id",
    "fn_dict_lookup",
    "stream_windowed_topk",
    # Trigram novelty shuffles distinct doc-gram pairs (O(corpus
    # tokens) wire) and windows over the gram key; bag intersection is
    # a grouped count-compare (O(distinct rows) wire). Both should
    # track input size linearly.
    "text_ngram_novelty",
    "set_intersect_all",
    # Bucketed co-located join: cost is the one-time layout write (two
    # table-sized bucket shuffles) + an exchange-free join/agg — linear.
    "join_bucketed_colocated",
    # Dynamic partition overwrite: full layout write + one-partition
    # rewrite + table read-back — all table-linear.
    "sink_partition_overwrite_dynamic",
    # Round-7 additions. dedup_simhash_nn: the identical-fp collapse is
    # what keeps the densified fixture (K id-offset near-copies) from
    # going quadratic — the K copies of each doc share a fingerprint, so
    # banding sees the same ~distinct-fp count at every K and wall should
    # track the fingerprint pass (linear). hashing_vectorizer /
    # label_centroids: explode + combiner-bounded groupBy, linear.
    # fn_morton: pure projection.
    "dedup_simhash_nn",
    "text_hashing_vectorizer",
    "embedding_label_centroids",
    "fn_morton",
    # Single-scan profile with a 6x Expand for the exact distincts —
    # wall should track the scan.
    "pipeline_data_quality",
    # Contribution-trick DAU/WAU/MAU: shuffle is 30x distinct day-user
    # pairs (activity-bounded), never 30x events — should track input.
    "events_active_users",
    # Geohash: pure projection. Exact-quota sample: one group-key
    # shuffle + rank scan; output is quota-capped (rows ~flat at K).
    "fn_geohash",
    "sample_exact_quota",
    # Weighted quantile: shuffle carries DISTINCT (key, value) pairs —
    # value-domain-bounded, wall should track the merge scan.
    "agg_quantile_exact_weighted",
    # Round-8: incremental dedup. index_build is the one-shot banding
    # pass + partitioned write (linear in corpus tokens); incremental is
    # banding of the ~10% batch + a slim (bk, doc_id) bucket join against
    # the index partitions + candidate-bounded verify — linear in input
    # with pair-output allowance like the other LSH ops.
    "dedup_index_build",
    "dedup_incremental",
    # Compaction is a partitioned rewrite of the band/token relations —
    # linear in index rows. The streaming loop is dedup_incremental split
    # into 2 micro-batches + its own index build — linear like its parts.
    "dedup_index_compact",
    "stream_incremental_dedup",
    # Duplication histogram: doc-linear scan + combiner-bounded groupBys.
    "dedup_cluster_stats",
    # Threshold histogram: the LSH plan at floor 0.80 (pair-output
    # allowance applies) + a bin groupBy.
    "dedup_threshold_sweep",
    # Recall gate: prefix-filtered exact side (hot tokens never enter
    # prefixes) + the collapsed LSH side; two count aggregates.
    "dedup_lsh_recall",
    # Round-9: tombstoned lookup = dedup_incremental + one anti-join of
    # the member store against a ~3%-of-corpus tombstone relation and a
    # per-cluster re-election aggregate — both index-row-linear.  The
    # delete-compaction is the index_compact rewrite with the same
    # anti-join/remap joins folded in — linear in index rows.
    "dedup_incremental_deletes",
    "dedup_index_delete_compact",
    # Incremental ANN: append encodes only the ~10% batch (one Arrow
    # pass, frozen quantizer — no refit, no corpus re-read) + a
    # bucket-partitioned append; the serve query is sim_index_query's
    # pruned-bucket plan on the grown index — both input-linear.
    "sim_index_append",
    "sim_index_incremental",
    # ANN tombstones: lookup = sim_index_query + one anti-join of the
    # routed candidates against the small tombstone relation (linear);
    # delete-compaction = a bucket-clustered rewrite of codes minus
    # tombstones + a verbatim quantizer copy (index-row-linear).
    "sim_index_delete",
    "sim_index_delete_compact",
    # Delete-during-ingest stream: stream_incremental_dedup's linear
    # parts + one tombstone write + the tombstone-bounded lookup joins.
    "stream_incremental_dedup_deletes",
    # Entity resolution: every quadratic-risk stage (blocking self-join,
    # levenshtein verify, label propagation) runs on DISTINCT names with
    # df-capped blocking keys — wall should stay ~flat as rows grow
    # (the scale fixture replicates rows, not the name vocabulary);
    # golden-record is one broadcast map-join + a linear aggregate.
    "er_blocked_pairs",
    "er_clusters",
    "er_golden_record",
    # Per-user sequence regex: one user_id shuffle, sequence capped at
    # _SEQ_CAP codes — input-linear.
    "events_sequence_match",
    # Source-pair vocabulary overlap: posting-list self-join bounded by
    # C(n_sources,2) × vocab, independent of document count.
    "text_source_overlap",
    # Mixture planner: one groupBy(source) pass, then S-row arithmetic —
    # input-linear with a constant plan relation.
    "sample_mixture_weights",
    # URL canonicalization: per-row codegen string expressions + one hash
    # aggregate on the canonical key — input-linear.
    "dedup_url_canonical",
    # Bigram LM: one bigram explode (token-linear), counts are windows
    # over the stream (partition size IS the count), V a broadcast scalar.
    "text_bigram_logprob",
    # Partition TTL: the drop is O(months) filesystem metadata; the
    # write+readback bounds the wall at one partitioned pass each way.
    "maintenance_ttl_partition_drop",
    # Drift monitor: incremental windowed counts (state = windows×types),
    # then window-sums over that tiny relation — input-linear stream pass.
    "stream_type_drift",
    # Time travel: two parquet writes + two manifest-resolved scans —
    # input-linear, manifests are O(files) metadata.
    "sink_time_travel",
    # SemDeDup apply: the audited bucketed-pair subtree + label
    # propagation on the (small) pair set + one broadcast left join.
    "dedup_embedding_apply",
    # Snapshot vacuum: compaction is the only data pass; expiry + orphan
    # sweep are O(files) set-difference over manifests.
    "maintenance_snapshot_vacuum",
    # ER serving path: batch names × catalog posting lists under the df
    # cap — batch-bounded, the catalog is never re-paired.
    "er_incremental_match",
    # Golden-record refresh: associative partial-aggregate merge on the
    # (entity, name, brand) grain — input-linear, no re-clustering.
    "er_golden_record_incremental",
    # Partition-scoped compaction: cold-subset rewrite + O(files)
    # manifest bookkeeping + one manifest-resolved scan — input-linear.
    "maintenance_partition_compact",
    # MRL recall: |dims| passes of the broadcast-probe streaming top-k —
    # O(n·probes) each, never n².
    "embedding_matryoshka_recall",
    # Set-similarity match: distinct names, posting-list blocking,
    # array-expression Jaccard — constant in corpus rows.
    "er_reordered_match",
    # Closed-form ancestor chains: one codegen'd transform per row, no
    # joins or iterations — embarrassingly parallel.
    "fn_dict_hierarchy",
    # Strict-order funnel: one user_id shuffle + capped sequence regex.
    "events_funnel_strict_order",
    # Token-quota fill: one window cumsum per source + broadcast quota.
    "sample_token_quota",
    # Contribution analysis: star join (broadcast dims) + one wide
    # lineitem⋈orders shuffle + nation-grain pivot arithmetic.
    "query_growth_decomposition",
    # Shallow clone: two writes + manifest metadata + two scans — linear.
    "sink_shallow_clone",
    # Permissive CSV: bounded dim staging + one distributed scan.
    "scan_csv_permissive",
    # Round-10: persisted ER index lifecycle — every relation is
    # distinct-name-sized (the scale fixture replicates rows, not the
    # name vocabulary), so build/serve/append/delete walls should stay
    # ~flat as rows grow; the one row-linear stage is the distinct()
    # collapse feeding them.  Drift monitor: one bounded driver baseline
    # + two map-side batch scoring passes — batch-linear.
    "er_index_build",
    "er_incremental",
    "er_index_append",
    "er_index_delete",
    "er_index_delete_compact",
    "sim_index_retrain_check",
]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    ops = sys.argv[2:] or DEFAULT_OPS
    base = "/root/testdata/sf0.1"
    scaled = os.path.join(REPO, ".scale", f"x{k}")
    if not os.path.isdir(scaled):
        sys.exit(f"run tools/make_scale.py {k} first ({scaled} missing)")

    from sqlite_to_clickhouse_spark.registry import all_queries
    from sqlite_to_clickhouse_spark.session import get_spark

    # A 20-op × 2-dir sweep accumulates persisted band tables, broadcast
    # refs, and Arrow buffers in one JVM; 8g died with GCLocker thrash in
    # the back half of the default list at 10×.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("scale-check")
    reg = all_queries()

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = reg[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        # Drop persisted/cached state between ops so each measurement is
        # the operator, not the session's accumulated residue.
        spark.catalog.clearCache()
        return best, rows

    # Warm the JVM on both dirs before measuring anything.
    reg[ops[0]].fn(spark, base).count()
    reg[ops[0]].fn(spark, scaled).count()

    print(f"{'op':28s} {'1x sec':>8s} {'%dx sec' % k:>9s} {'ratio':>7s} {'rows 1x':>9s} {'rows %dx' % k:>10s}")
    flagged = []
    tk_by: dict = {}
    for name in ops:
        t1, r1 = run(name, base)
        tk, rk = run(name, scaled)
        tk_by[name] = tk
        ratio = tk / t1 if t1 > 0 else float("inf")
        # An op whose OUTPUT grows faster than K (pair-producing joins over
        # densified fixtures: K× rows in the same key/time range ⇒ ~K²×
        # pairs) is allowed wall clock linear in its output, not its input —
        # flagging it against K would punish the result size, not the plan.
        out_ratio = rk / r1 if r1 > 0 else 1.0
        allowed = max(k, out_ratio) * 1.5
        mark = ""
        if ratio > allowed:
            mark = "  <-- SUPERLINEAR"
            flagged.append(name)
        elif ratio > k * 1.5:
            mark = "  (output-bound: rows grew %.0fx)" % out_ratio
        print(f"{name:28s} {t1:8.2f} {tk:9.2f} {ratio:6.1f}x {r1:9d} {rk:10d}{mark}")
    # Incremental-vs-full amortization AT K× (VERDICT r10 item 7): the
    # < 1 claim is a scale claim — the serving path is batch-bounded
    # while the full recompute grows with the corpus, so the ratio must
    # hold (and widen) at K×, not just at fixture scale.  Emitted to a
    # committed artifact so tests/test_bench_meta.py can pin it.
    import json

    derived = {}
    for num, den, key in (
        ("er_incremental", "er_clusters", "er_incremental_vs_full"),
        ("dedup_incremental", "dedup_fuzzy_minhash", "dedup_incremental_vs_full"),
    ):
        if tk_by.get(den) and tk_by.get(num) is not None:
            derived[key] = round(tk_by[num] / tk_by[den], 4)
    if len(derived) == 2:
        doc = {"k": k, **derived}
        with open(os.path.join(REPO, "SCALE_RATIOS.json"), "w") as fh:
            json.dump(doc, fh, indent=1)
        print(f"\nderived at {k}x: {doc} -> SCALE_RATIOS.json")
    print(f"\nflagged: {flagged or 'none'}")
    spark.stop()
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
