package graft

import graft.core.GraftSession

/** Plan-quality audit: prints the formatted physical plans of the
  * scan-heavy and join-heavy queries so pushdown/broadcast/codegen can
  * be inspected (and regressions spotted) without the Spark UI. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = GraftSession.builder(appName = "audit", master = "local[4]",
      shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("AUDIT-BEGIN")
    for (name <- Seq("q02_filter_project", "q04_snowflake_join", "q13_top_k",
      "d07_lsh_near_dup", "q18_salted_join", "s01_windowed_counts",
      "d12_embed_near_dup", "e05_knn_multiprobe", "d13_rolling_fp",
      "d10_simhash_near_dup", "d17_curation_pipeline", "e08_range_search",
      "d20_contamination", "d23_quality_filter", "e09_kmeans_step",
      "d24_unigram_loss", "e10_scalar_quantize", "q19_window_frames",
      "q20_rollup", "q21_pivot", "q22_unpivot",
      "q24_cube", "q26_scalar_subquery", "d29_seq_pack", "d32_boilerplate",
      "e14_knn_ivf_pq", "s05_interval_join", "q29_asof_join",
      "q30_range_join", "d35_training_manifest",
      "d40_semantic_dedup", "d41_chunk_overlap", "e15_mips_norm_prune",
      "q31_gap_fill", "q32_group_mode", "m06_frame_manifest",
      "q33_funnel", "q34_cohort_retention", "d44_bigram_loss",
      "e16_matryoshka_rerank", "c18_sorted_rewrite",
      "q35_stat_aggs", "q36_approx_quantile", "e18_hybrid_rrf",
      "d46_dup_ngram_spans", "d47_incr_near_dup", "s08_stream_funnel",
      "s09_windowed_topk", "c22_zorder_scan", "q37_string_battery",
      "q38_date_battery", "s11_session_window", "s12_threshold_alerts",
      "s10_static_enrich", "e20_metric_battery", "e19_knn_ivf_append",
      "c23_rollback", "c24_changelog", "q39_listagg",
      "c25_lake_mor_merge_delete", "s13_stream_dedup", "c26_migration",
      "d52_hash_split", "d53_split_leakage", "m10_perceptual_dedup",
      "m11_audio_fingerprint", "d54_substring_dedup")) {
      println(s"=== $name ===")
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // keep the structural lines only
      plan.linesIterator
        .filter(l => l.contains("Scan parquet") || l.contains("PushedFilters") ||
          l.contains("Join") || l.contains("WholeStageCodegen") ||
          l.contains("TakeOrderedAndProject") || l.contains("Exchange") ||
          l.contains("ReadSchema"))
        .take(25).foreach(println)
    }
    println("AUDIT-END")
    spark.stop()
  }
}
