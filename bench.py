"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly ONE JSON line:
  {"metric": "suite_wall_clock", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is executed to completion (count() — forces the full plan without
driver-side collection of wide results). Timings are per-query wall clock on a
warm session; the suite value is the sum (matches how the driver compares
against BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the representative slice: flagship rollup, parity aggregations, the join/
# window/topk extension surface, and the LLM-pipeline operators
HEADLINE = [
    "flagship_hourly_rollup",
    "a1_a5_rollup_core",
    "a8_filtered_aggs",
    "t2_query_granularity",
    "p6_window_filter",
    "d1_hash_partition",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q12_priority_shipping",
    "q14_promo_revenue",
    "q8_market_share",
    "q15_top_supplier",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q21_waiting_suppliers",
    "agg1_grouping_rollup",
    "j4_asof_last_event",
    "w1_rank_in_partition",
    "w3_running_total",
    "w4_ntile_cume_dist",
    "w5_time_range_window",
    "s1_topk",
    "set1_set_ops",
    "a11b_distinct_set_ops",
    "a11c_theta_setops_approx",
    "dq2_segment_metadata",
    "dq5_timeseries",
    "dq5b_zero_filled_timeseries",
    "dq6_topn",
    "dq7_groupby_having",
    "dq10_lookup_dimension",
    "dq11_topn_extraction",
    "dd1_exact_dedup",
    "dd2_minhash_lsh_pairs",
    "sim1_cosine_topk",
    "sim3_ivf_topk",
    "txt2_quality_score",
    "txt4_fingerprint",
    "txt9_unigram_logprob",
    "samp3_weighted_sample",
    "samp4_mixture_resample",
    "mm2_frame_sample",
    "mm4_audio_frame_energy",
    "chunk1_doc_chunking",
    "pipe2_chunk_dedup",
    "emb1_normalize_quantize",
    "emb2_label_centroids",
    "hh1_heavy_hitters_merge",
    "txt11_boilerplate_ngrams",
    "shuf1_epoch_shuffle",
    "emb3_centroid_similarity",
    "pipe3_training_prep",
    "txt12_bigram_logprob",
    "samp5_temperature_resample",
    "emb4_matryoshka_truncate",
    "dd8_incremental_neardup",
    "a10c_quantile_sketch_merge",
    "rank1_pair_rerank",
    "samp6_source_cap",
    "txt13_lexical_diversity",
    "a10d_fixed_histogram",
    "f6_winsorize_clip",
    "txt14_oov_rate",
    "dd9_bloom_membership",
    "dd10_bloom_gated_antijoin",
    "dd11_bloom_gated_neardup",
    "emb5_binary_hamming_topk",
    "emb6_random_projection",
    "sim4_bq_rerank",
    "dq8_retention_cohorts",
    "dq9_funnel",
    "txt15_token_entropy",
    "pipe4_quality_prep",
    "txt16_script_profile",
    "hh2_cms_frequency",
    "dq12_nested_groupby",
    "emb7_dim_covariance",
    "a6c_hyperunique_mergeable",
    "a11e_theta_native",
    "sim5_pq_rerank",
    "t4_tz_day_rollup",
    "dd12_blocked_bloom",
    "dq13_moving_average",
    "dd13_semantic_dedup",
    "samp7_curriculum_schedule",
    "mm5_interleaved_packing",
    "dq14_scan_keyset",
    "dq15_rolling_active_users",
    "dd14_duplicate_passages",
    "dd15_duplication_density",
    "samp8_token_budget_select",
    "emb8_spike_outliers",
    "txt17_domain_reputation",
    "f7_ewma_fold",
    "pipe6_dataset_manifest",
    "w7_rolling_zscore",
    "a14_first_last",
    "hh2b_cms_join_estimate",
    "dq16_timeseries_grand_total",
    "chunk2_token_chunks",
    "txt18_zipf_audit",
    "a10e_kll_deterministic",
    "emb9_principal_component",
    "dq17_time_extraction",
    "samp9_cluster_downweight",
    "dd13b_kmeans_semantic_dedup",
    "a10f_gk_quantiles",
    "txt19_bm25_topk",
    "rank2_rrf_fusion",
    "dq18_subtotals_spec",
    "emb10_pca_project",
    "pipe7_chunk_retrieval",
    "mm6_image_dhash",
    "dd16_dhash_neardup",
    "txt20_bm25_served_stats",
    "sim3b_ivf_persisted_serving",
    "sim5b_ivfpq_persisted_serving",
    "dq19_spatial_filter",
    "dd17_simhash_neardup",
    "dd18_simhash_incremental",
    "dd19_simhash_served_pairs",
    "dd20_minhash_served_pairs",
    "dq20_spatial_served_filter",
    "dd21_simhash_incremental_served",
    "dd22_minhash_incremental_served",
    "dq21_range_clustered_scan",
    "dd23_dhash_served_pairs",
    "dd24_dhash_incremental_served",
    "mm7_audio_fingerprint",
    "dd25_audio_fp_pairs",
    "dd26_audio_fp_served_pairs",
    "dd27_audio_fp_incremental_served",
    "mm8_video_frame_hashes",
    "dd28_video_neardup_pairs",
    "dd29_video_served_pairs",
    "dd30_video_incremental_served",
    "dd31_audio_fp_survivors",
    "dd32_video_survivors",
    "pipe8_cross_family_dedup",
    "pipe9_cross_family_admission",
    "pipe10_cross_family_admission_keepone",
    "pipe11_registry_update_cycles",
    "pipe12_registry_compaction",
    "dd33_video_incremental_capped",
    "pipe13_capped_update_cycles",
    "adm1_admission_served_video_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from tranquility_spark.catalog import CATALOG
    from tranquility_spark.session import get_spark

    spark = get_spark("tranquility-spark-bench")
    # warm the JVM + parquet footers with a trivial action, and the Python
    # UDF workers with a tiny pandas UDF (worker fork-and-handshake is a
    # fixed ~2s cost that would otherwise land on the first UDF query —
    # steady-state throughput is what the suite measures)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql import functions as F
    from tranquility_spark.operators.pandas_fns import simhash64

    spark.range(100).select(simhash64(F.col("id").cast("string"))).count()

    # Calibration probes (VERDICT r05 #2): two fixed queries whose cost is
    # independent of catalog code, timed with the same min-of-3, so ambient
    # machine load is MEASURABLE in every bench record instead of anecdotal.
    # "scan" is IO-shaped (full lineitem scan + one agg); "cpu" is pure JVM
    # task throughput (no IO). Neither counts toward the suite total; a round
    # whose calibration is >1.5x another round's was run on a loaded box and
    # their per-query numbers are not comparable.
    calibration: dict[str, float] = {}
    for cal_name, cal_fn in (
        (
            "scan_lineitem_agg",
            lambda: spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .agg(F.sum("l_extendedprice"), F.count(F.lit(1)))
            .count(),
        ),
        (
            "cpu_hash_50m",
            lambda: spark.range(50_000_000)
            .agg(F.sum(F.xxhash64("id")))
            .count(),
        ),
    ):
        cal_best = float("inf")
        for _ in range(3):
            t0 = time.time()
            cal_fn()
            cal_best = min(cal_best, time.time() - t0)
        calibration[cal_name] = round(cal_best, 3)

    # min of three runs per query: the machine is multi-tenant and transient
    # contention inflates single runs ±35% (measured); the min is the
    # steady-state number the plan actually costs. Three (was two in r01/r02)
    # because sub-second entries' 2× gate margin depended on a single clean
    # sample — methodology change re-anchored in BASELINE.md §3 per the
    # frozen-methodology rule.
    # Fault isolation (round-4 lesson: one crashing entry produced an rc=1
    # round with NO timings): a failing query is recorded under "errors" and
    # excluded from the suite total, never allowed to kill the run.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Between-query cleanup (r18 optimization round — a measurement fix,
    # guide §1, documented in OPTIMIZATION_r18.md): each entry leaves
    # dead localCheckpoint RDD blocks behind; over 151 queries the
    # executor accumulates hundreds of them and late-suite entries pay
    # the GC/memory pressure of every earlier one (measured: the same
    # entry timed 2-6x its isolated min-of-3 late in the suite). A
    # python gc.collect() releases the py4j refs so Spark's
    # ContextCleaner can drop the blocks, and a periodic JVM System.gc()
    # actually reclaims them; both run OUTSIDE the timed region — the
    # per-query timing methodology (min of 3 x fn().count()) is
    # unchanged. This measures each query against a clean executor, the
    # state a production job actually runs in, instead of against the
    # accumulated garbage of 150 unrelated queries.
    import gc

    for qi, name in enumerate(HEADLINE):
        best = float("inf")
        try:
            fn = CATALOG[name].fn  # inside the try: a stale HEADLINE name
            # (KeyError) must be recorded, not kill the suite
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        gc.collect()
        if qi % 10 == 9:
            try:
                spark._jvm.System.gc()
            except Exception:  # noqa: BLE001 — cleanup must never kill the run
                pass

    total = round(sum(timings.values()), 3)
    # Quiet-box calibration anchor (r19, VERDICT r18 #5: the probes were
    # printed since r05 but nothing consumed them). Anchored to the
    # agreeing quiet-box readings: driver r18 ran scan=0.33/cpu=0.243 and
    # the r18 builder's three clean same-code runs 0.34-0.45/0.20-0.43
    # (loaded runs on the same box read 1.35/1.18). A run whose probe
    # exceeds 1.5x the anchor was measured under ambient load and its
    # per-query numbers should be discounted (the r18 driver bench carried
    # a 20-position load window that produced 12 false >2x baseline
    # breaches — this flag lets the driver/judge reject such windows
    # mechanically). Documented in BASELINE.md §3.
    _CAL_ANCHOR = {"scan_lineitem_agg": 0.33, "cpu_hash_50m": 0.243}
    calibration_ok = all(
        calibration[k] <= 1.5 * _CAL_ANCHOR[k] for k in _CAL_ANCHOR
    )
    # n_timed/n_errors always present (ADVICE r05): with fault isolation the
    # suite total sums only the queries that succeeded, so a consumer must be
    # able to see the query-set size without inspecting the optional errors
    # map — a shrunken total is otherwise silently compared across rounds.
    out = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_timed": len(timings),
        "n_errors": len(errors),
        "calibration": calibration,
        "calibration_anchor": _CAL_ANCHOR,
        "calibration_ok": calibration_ok,
    }
    if errors:
        out["errors"] = errors
    line = json.dumps(out)
    print(line)
    # Loss-proof record (r19, VERDICT r18 #1): BENCH_r17's single stdout
    # line was head-truncated in the driver's captured tail, which cost
    # the round its whole per-query comparison (PERF n_common: 0). The
    # same JSON is therefore ALSO written next to the repo root —
    # additions-only; the stdout contract above is unchanged.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_out.json"),
            "w",
        ) as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # a read-only checkout must not kill the run
    spark.stop()


if __name__ == "__main__":
    main()
