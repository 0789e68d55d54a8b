"""Benchmark harness — prints ONE JSON line.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. Also runs the synthetic-corpus pipeline
(pages → extract → detect → S2/tile encode → tile rollup) to measure
docs/sec throughput for the north-rule metric.

    python bench.py            # full bench
    BENCH_PAGES=20000 python bench.py   # smaller corpus for iteration
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


# The contract queries timed every round — r01's list plus every query that
# went green since, same names each round so per-query regressions stay
# visible (VERDICT r1 item 9). Module-level so scripts/skew_bench.py runs the
# identical list under skewed inputs.
CONTRACT_BENCH_QUERIES = (
    "p4_latitude_valid", "p5_latlong_pair", "p6_unix_time",
    "p7_year_range", "p8_date_format", "p9_iso3_membership",
    "p10_latlon_dedup", "j4_continent_fuzzy", "j6_pip_boxes",
    "j8_tile_grid", "j8_tile_assign", "j9_salted_rollup",
    "w1_temporal_deltas", "a5_threshold_cascade", "a7_uniformity",
    "temporal_resolution", "spatial_grid_resolution",
    "cartwright_categorize", "fuzzy_country_join",
    "dedup_exact", "dedup_groups",
    "simhash_pairs", "embedding_cosine_pairs", "embedding_cosine_blocked",
    "embedding_near_dup_lsh", "lsh_ann_topk",
    "s2_histogram", "h3_histogram",
    "text_token_count", "text_quality_counts",
    "lang_stopword_hits", "lang_detect",
    "knn_grid", "knn_cells", "knn_hex", "o2_topk",
    "multimodal_features", "multimodal_frame_plan",
    "stream_sessionize", "ivf_ann_topk", "corpus_curation",
    "j6_pip_bulk", "ngram_jaccard", "extract_text",
    # r2 VERDICT item 6: every contract query appears in the timed list
    # (incremental_microbatch cleans and rebuilds its own snapshot dirs per
    # call, so it times the full two-batch incremental run)
    "incremental_microbatch", "multimodal_png_decode",
    "multimodal_jpeg_decode", "minhash_dedup_assign",
    "gopher_repetition", "asof_events", "range_join_orders",
    "stratified_sample", "stratum_cap", "sequence_packing",
    "interval_overlap", "pii_redact", "contamination",
    "connected_components", "grid_cluster", "bm25_scores", "kmv_distinct",
    "centroid_outlier", "linear_score", "pagerank", "url_normalize",
    "link_graph", "host_pagerank", "weighted_sample", "cms_freq",
    "prior_weighted_sample", "radius_join", "hll_distinct",
    "polygon_measures", "triangle_lcc", "exact_quantiles",
    "geohash_encode", "grouped_quantile", "multimodal_gif_frames",
    "warc_records", "robots_filter", "bloom_semijoin",
    "morans_i", "segment_intersections", "bigram_lm_score",
    "gistar_hotspots", "kde_heatmap", "trajectory_sessions",
    "trend_hotspots", "tile_pyramid", "sen_slope", "od_matrix",
    "colocation_lift", "knox_spacetime", "idw_surface",
    "ripley_k", "snap_segments", "burst_detect", "dbscan_labels",
    "heading_octants", "std_ellipse", "inverted_index", "grid_bfs_hops",
    "pareto_front", "term_cooccurrence", "adaptive_tiles",
    "cost_distance",
    "deletion_join", "prefix_jaccard", "boilerplate_lines",
    "funnel_steps", "convex_hull", "isotonic_fit",
    "gini_concentration", "rasterize_polygons", "suffix_array",
    "contour_segments", "douglas_peucker", "cusum_changepoint",
    "dissolve_boundary", "cdc_dedup", "compact_cells", "psi_drift",
    "multimodal_video_frames",
    "html_table_cells", "html_table_profile", "anchor_text",
    "crawl_frontier", "hilbert_order", "rake_keywords",
    "kmv_intersection", "heavy_hitters", "label_propagation",
    "containment_join", "bpe_merges", "image_near_dup", "hausdorff_pairs", "coverage_select", "neighborhood_function", "kcore_membership", "passage_chunks", "entity_resolution", "sitemap_urls", "raster_overlay",
    "interval_coverage", "zipf_slope", "hits_scores", "sssp_weighted",
    "template_groups", "kmeans_centroids", "rrf_fusion", "crawl_budget",
    "redirect_resolve", "multimodal_wav_stats", "stay_points", "winnow_fingerprint", "gearys_c", "proximity_pairs", "link_prediction", "best_snippet", "ndcg_eval", "markov_transitions", "rendezvous_shards", "acf_lags", "scc", "readability", "textrank", "span_corruption", "cohort_retention", "harmonic_centrality", "assortativity", "url_templates", "zonal_stats", "ols_trend", "diameter_sweep", "dominant_direction",
    "c4_filter", "rolling_anomaly", "canonical_pick", "scd2_merge",
    "neighbor_jaccard", "modularity", "naive_bayes",
    "seasonal_profile", "score_calibration", "hbos_outlier",
    "tfidf_topterms", "meta_tags", "personalized_pagerank",
    "dtw_pairs", "ab_ztest", "k_anonymity", "hillshade_grid",
    "geofence_transitions", "route_waypoints", "ktruss_edges",
    "viterbi_path", "cidr_lookup",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    n_pages = int(os.environ.get("BENCH_PAGES", "100000"))

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from cartwright_spark.session import get_spark

    spark = get_spark("cartwright_bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, 2 * int(cpus)))
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}

    def timed(name, fn, repeats: int = 2):
        """min-of-N: this box shares its host and external load only ever
        slows a run down, so the min is the clean per-query signal."""
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)

    # warm the JVM, parquet footer cache, and the Python-worker pool once,
    # so the first timed query isn't billed the session cold start
    F.broadcast  # (import check)
    spark.range(1000).select(F.sum("id")).collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def __warm(x):
        return x

    spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select(__warm(F.col("l_quantity")).alias("q")) \
        .agg(F.sum("q")).collect()

    # --- contract queries over the testdata tables -------------------------
    # doc_fingerprint is benched separately below (its contract query now
    # runs a fixed golden fixture).
    qmap = entry_mod.queries()
    for name in CONTRACT_BENCH_QUERIES:
        timed(name, lambda n=name: qmap[n](spark, sf_dir)
              .write.format("noop").mode("overwrite").save())

    # doc_fingerprint's contract query runs a fixed fixture (golden oracle);
    # bench it over the real documents table at this SF instead
    def doc_fp():
        from cartwright_spark.operators.textstats import fingerprint
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        fingerprint(docs).write.format("noop").mode("overwrite").save()
    timed("doc_fingerprint", doc_fp)

    # --- s2 + mercator-tile rollup (flagship shape at bench scale) ---------
    def s2_rollup():
        from cartwright_spark.functions.geodesy import tile_id_col
        from cartwright_spark.spatial.udfs import with_s2_cell
        pts = entry_mod._coords(spark, sf_dir)
        (with_s2_cell(pts, "lat", "lon", 10, "s2_cell")
         .withColumn("tile_id", tile_id_col(F.col("lat"), F.col("lon"), 8))
         .groupBy("tile_id").agg(F.count("*").alias("n"),
                                 F.approx_count_distinct("s2_cell").alias("c"))
         .write.format("noop").mode("overwrite").save())
    timed("s2_tile_rollup", s2_rollup)

    # --- minhash LSH near-dup over documents -------------------------------
    def minhash():
        from cartwright_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sigs = minhash_signatures(docs, "text", "doc_id", num_perm=64)
        minhash_lsh_pairs(sigs, bands=16, jaccard_threshold=0.7) \
            .write.format("noop").mode("overwrite").save()
    timed("minhash_lsh", minhash)

    # --- brute-force cosine top-k over embeddings ---------------------------
    def simsearch():
        from cartwright_spark.operators.simsearch import brute_force_topk
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        brute_force_topk(emb, q, k=10).write.format("noop") \
            .mode("overwrite").save()
    timed("simsearch_topk", simsearch)

    # --- synthetic-corpus pipeline throughput -------------------------------
    # The source `pages` table is committed BEFORE the clock starts (in
    # production it already exists); docs/sec measures the engine stages:
    # extract → detect → encode → salted tile rollup, incl. snapshot writes.
    workdir = "/tmp/cartwright_bench_pipeline"
    shutil.rmtree(workdir, ignore_errors=True)
    from cartwright_spark.plans.pipeline import TIME_PARTITION, run_pipeline
    from cartwright_spark.sources.corpus import generate_pages
    from cartwright_spark.sources.iceberg_lite import Catalog
    Catalog(workdir).write_table(
        generate_pages(spark, n_pages).withColumn(
            "warc_part", TIME_PARTITION["year"]()),
        "pages", stage="pages",
        stage_key=f"pages:n={n_pages}:tp=year:v2",
        partition_by=["warc_part"], files_per_partition=4)
    # tiny throwaway pipeline first: stage-level codegen compiles once so
    # the timed run measures throughput, not JIT warm-up
    warm_wd = workdir + "_warm"
    shutil.rmtree(warm_wd, ignore_errors=True)
    run_pipeline(spark, warm_wd, n_pages=2000, s2_level=10, zoom=8)
    # min-of-2 like every other bench row (a second run on the SAME
    # workdir would just resume from committed snapshots, so each rep
    # gets a fresh copy of the pages-only catalog — the copy is outside
    # the clock, matching the "pages pre-committed" semantics above)
    pipe_sec = None
    for rep in range(2):
        wd = f"{workdir}_rep{rep}"
        shutil.rmtree(wd, ignore_errors=True)
        shutil.copytree(workdir, wd)
        t0 = time.perf_counter()
        run_pipeline(spark, wd, n_pages=n_pages, s2_level=10, zoom=8)
        dt = time.perf_counter() - t0
        pipe_sec = dt if pipe_sec is None else min(pipe_sec, dt)
    queries["pages_pipeline"] = round(pipe_sec, 3)
    docs_per_sec = n_pages / pipe_sec

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "spatial-join+tile throughput and headline query latency",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "docs_per_sec": round(docs_per_sec, 1),
        "pipeline_pages": n_pages,
        "cpus": int(cpus),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
