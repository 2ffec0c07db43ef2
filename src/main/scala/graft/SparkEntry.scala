package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Analytics2, Census, Curation, Events, Ingest, Temporal}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator from SURVEY §2 (or a
  * beyond-reference LLM-pipeline operator); `oracleSql` holds the DuckDB
  * equivalent where the semantics are SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1_agg(spark, "/root/testdata/sf0.001")

  type Q = (SparkSession, String) => DataFrame

  /** name -> (query, Some(oracle sql) | None for rows-only checks) */
  def registry: Seq[(String, Q, Option[String])] = Seq(
    ("q1_agg", Analytics.q1_agg _, Some(Analytics.q1_sql)),
    ("q3_topk", Analytics.q3_topk _, Some(Analytics.q3_sql)),
    ("q5_join", Analytics.q5_join _, Some(Analytics.q5_sql)),
    ("q_window", Analytics.q_window _, Some(Analytics.q_window_sql)),
    ("q_antijoin", Analytics.q_antijoin _, Some(Analytics.q_antijoin_sql)),
    ("q_semijoin", Analytics.q_semijoin _, Some(Analytics.q_semijoin_sql)),
    ("q_setops", Analytics.q_setops _, Some(Analytics.q_setops_sql)),
    ("q_rollup", Analytics.q_rollup _, Some(Analytics.q_rollup_sql)),
    ("q_events_agg", Analytics.q_events_agg _, Some(Analytics.q_events_agg_sql)),
    ("q_scalar_subq", Analytics2.q_scalar_subq _, Some(Analytics2.q_scalar_subq_sql)),
    ("q_correlated", Analytics2.q_correlated _, Some(Analytics2.q_correlated_sql)),
    ("q_outer_dist", Analytics2.q_outer_dist _, Some(Analytics2.q_outer_dist_sql)),
    ("q_pivot", Analytics2.q_pivot _, Some(Analytics2.q_pivot_sql)),
    ("q_lag_lead", Analytics2.q_lag_lead _, Some(Analytics2.q_lag_lead_sql)),
    ("q_notin", Analytics2.q_notin _, Some(Analytics2.q_notin_sql)),
    ("q_distinct_stats", Analytics2.q_distinct_stats _, Some(Analytics2.q_distinct_stats_sql)),
    ("q_skew_join", Analytics2.q_skew_join _, Some(Analytics2.q_skew_join_sql)),
    ("q_cube", Analytics2.q_cube _, Some(Analytics2.q_cube_sql)),
    ("q_quantiles", Analytics2.q_quantiles _, Some(Analytics2.q_quantiles_sql)),
    ("q_asof_join", Temporal.q_asof_join _, Some(Temporal.q_asof_join_sql)),
    ("q_range_join", Temporal.q_range_join _, Some(Temporal.q_range_join_sql)),
    ("q_sample_stratified", Temporal.q_sample_stratified _, Some(Temporal.q_sample_stratified_sql)),
    ("q_mix_rebalance", Temporal.q_mix_rebalance _, Some(Temporal.q_mix_rebalance_sql)),
    ("q_order_shuffle", Temporal.q_order_shuffle _, Some(Temporal.q_order_shuffle_sql)),
    ("q_temperature_mix", Temporal.q_temperature_mix _, Some(Temporal.q_temperature_mix_sql)),
    ("q_best_per_class", Temporal.q_best_per_class _, Some(Temporal.q_best_per_class_sql)),
    // ingest operators (SURVEY §2.1-2.3) — roundtrip through real dump files
    ("sqldump_roundtrip", Ingest.sqldump_roundtrip _, Some(Ingest.sqldump_roundtrip_sql)),
    ("q_stream_ingest", Ingest.q_stream_ingest _, Some(Ingest.q_stream_ingest_sql)),
    ("csv_roundtrip", Ingest.csv_roundtrip _, Some(Ingest.csv_roundtrip_sql)),
    ("binary_roundtrip", Ingest.binary_roundtrip _, Some(Ingest.binary_roundtrip_sql)),
    ("charset_roundtrip", Ingest.charset_roundtrip _, Some(Ingest.charset_roundtrip_sql)),
    ("schema_align_defaults", Ingest.schema_align_defaults _, Some(Ingest.schema_align_defaults_sql)),
    ("sqlmode_lenient", Ingest.sqlmode_lenient _, Some(Ingest.sqlmode_lenient_sql)),
    ("sqlmode_strict", Ingest.sqlmode_strict _, Some(Ingest.sqlmode_strict_sql)),
    ("sqlmode_enumset", Ingest.sqlmode_enumset _, Some(Ingest.sqlmode_enumset_sql)),
    ("jdbc_stmts", Ingest.jdbc_stmts _, Some(Ingest.jdbc_stmts_sql)),
    ("mydump_discover", Ingest.mydump_discover _, Some(Ingest.mydump_discover_sql)),
    ("import_e2e", Ingest.import_e2e _, Some(Ingest.import_e2e_sql)),
    ("kv_checksum", Ingest.kv_checksum _, Some(Ingest.kv_checksum_sql)),
    // LLM-data-pipeline operators (BASELINE.json north star)
    ("dedup_exact", Curation.dedup_exact _, Some(Curation.dedup_exact_sql)),
    ("dedup_minhash", Curation.dedup_minhash _, None),
    ("dedup_cross", Curation.dedup_cross _, None),
    ("dedup_cross_verify", Curation.dedup_cross_verify _, Some(Curation.dedup_cross_verify_sql)),
    ("dedup_cross_exact", Curation.dedup_cross_exact _, Some(Curation.dedup_cross_exact_sql)),
    ("dedup_cross_md5", Curation.dedup_cross_md5 _, Some(Curation.dedup_cross_md5_sql)),
    ("dedup_minhash_md5", Curation.dedup_minhash_md5 _, Some(Curation.dedup_minhash_md5_sql)),
    ("dedup_minhash_verify", Curation.dedup_minhash_verify _, Some(Curation.dedup_minhash_verify_sql)),
    ("dedup_skew_guard", Curation.dedup_skew_guard _, Some(Curation.dedup_skew_guard_sql)),
    ("dedup_cluster", Curation.dedup_cluster _, Some(Curation.dedup_cluster_sql)),
    ("dedup_cluster_keep", Curation.dedup_cluster_keep _, Some(Curation.dedup_cluster_keep_sql)),
    ("dedup_simhash", Curation.dedup_simhash _, None),
    ("dedup_simhash_md5", Curation.dedup_simhash_md5 _, Some(Curation.dedup_simhash_md5_sql)),
    ("dedup_simhash_verify", Curation.dedup_simhash_verify _, Some(Curation.dedup_simhash_verify_sql)),
    ("dedup_ngram", Curation.dedup_ngram _, None),
    ("dedup_ngram_verify", Curation.dedup_ngram_verify _, Some(Curation.dedup_ngram_verify_sql)),
    ("dedup_ngram_md5", Curation.dedup_ngram_md5 _, Some(Curation.dedup_ngram_md5_sql)),
    ("dedup_allpairs", Curation.dedup_allpairs _, Some(Curation.dedup_allpairs_sql)),
    ("dedup_semantic", Curation.dedup_semantic _, None),
    ("dedup_semantic_verify", Curation.dedup_semantic_verify _, Some(Curation.dedup_semantic_verify_sql)),
    ("dedup_semantic_md5", Curation.dedup_semantic_md5 _, Some(Curation.dedup_semantic_md5_sql)),
    ("dedup_embed", Curation.dedup_embed _, None),
    ("dedup_embed_md5", Curation.dedup_embed_md5 _, Some(Curation.dedup_embed_md5_sql)),
    ("dedup_embed_verify", Curation.dedup_embed_verify _, Some(Curation.dedup_embed_verify_sql)),
    ("ann_topk", Curation.ann_topk _, Some(Curation.ann_topk_sql)),
    ("ann_rrf", Curation.ann_rrf _, Some(Curation.ann_rrf_sql)),
    ("ann_lsh", Curation.ann_lsh _, None),
    ("ann_lsh_md5", Curation.ann_lsh_md5 _, Some(Curation.ann_lsh_md5_sql)),
    ("ann_ivf", Curation.ann_ivf _, None),
    ("ann_ivf_verify", Curation.ann_ivf_verify _, Some(Curation.ann_ivf_verify_sql)),
    ("ann_ivf_md5", Curation.ann_ivf_md5 _, Some(Curation.ann_ivf_md5_sql)),
    ("q_export_ivf", Curation.q_export_ivf _, Some(Curation.q_export_ivf_sql)),
    ("emb_cluster", Curation.emb_cluster _, Some(Curation.emb_cluster_sql)),
    ("ann_pq", Curation.ann_pq _, None),
    ("ann_pq_md5", Curation.ann_pq_md5 _, Some(Curation.ann_pq_md5_sql)),
    ("ann_pq_verify", Curation.ann_pq_verify _, Some(Curation.ann_pq_verify_sql)),
    ("ann_ivfpq", Curation.ann_ivfpq _, None),
    ("ann_ivfpq_md5", Curation.ann_ivfpq_md5 _, Some(Curation.ann_ivfpq_md5_sql)),
    ("ann_ivfpq_verify", Curation.ann_ivfpq_verify _, Some(Curation.ann_ivfpq_verify_sql)),
    ("ann_lsh_verify", Curation.ann_lsh_verify _, Some(Curation.ann_lsh_verify_sql)),
    ("txt_tokens", Curation.txt_tokens _, Some(Curation.txt_tokens_sql)),
    ("txt_langid", Curation.txt_langid _, Some(Curation.txt_langid_sql)),
    ("txt_quality", Curation.txt_quality _, Some(Curation.txt_quality_sql)),
    ("txt_fingerprint", Curation.txt_fingerprint _, Some(Curation.txt_fingerprint_sql)),
    ("txt_collapse", Curation.txt_collapse _, Some(Curation.txt_collapse_sql)),
    ("txt_rarity", Curation.txt_rarity _, Some(Curation.txt_rarity_sql)),
    ("txt_paradedup", Curation.txt_paradedup _, Some(Curation.txt_paradedup_sql)),
    ("txt_boilerplate", Curation.txt_boilerplate _, Some(Curation.txt_boilerplate_sql)),
    ("txt_redact", Curation.txt_redact _, Some(Curation.txt_redact_sql)),
    ("txt_repetition", Curation.txt_repetition _, Some(Curation.txt_repetition_sql)),
    ("txt_normalize", Curation.txt_normalize _, Some(Curation.txt_normalize_sql)),
    ("q_split", Curation.q_split _, Some(Curation.q_split_sql)),
    ("corpus_profile", Curation.corpus_profile _, Some(Curation.corpus_profile_sql)),
    ("txt_bm25", Curation.txt_bm25 _, Some(Curation.txt_bm25_sql)),
    ("txt_vocab", Curation.txt_vocab _, Some(Curation.txt_vocab_sql)),
    ("txt_quantile_filter", Curation.txt_quantile_filter _, Some(Curation.txt_quantile_filter_sql)),
    ("txt_bigram", Curation.txt_bigram _, Some(Curation.txt_bigram_sql)),
    ("txt_bpe", Curation.txt_bpe _, Some(Curation.txt_bpe_sql)),
    ("txt_unigram", Curation.txt_unigram _, Some(Curation.txt_unigram_sql)),
    ("txt_unigram_apply", Curation.txt_unigram_apply _, Some(Curation.txt_unigram_apply_sql)),
    ("txt_bpe_apply", Curation.txt_bpe_apply _, Some(Curation.txt_bpe_apply_sql)),
    ("txt_spandedup", Curation.txt_spandedup _, Some(Curation.txt_spandedup_sql)),
    ("txt_chunk", Curation.txt_chunk _, Some(Curation.txt_chunk_sql)),
    ("txt_lmscore", Curation.txt_lmscore _, Some(Curation.txt_lmscore_sql)),
    ("multimodal_pipe", Curation.multimodal_pipe _, Some(Curation.multimodal_pipe_sql)),
    ("multimodal_decode", Curation.multimodal_decode _, Some(Curation.multimodal_decode_sql)),
    ("multimodal_audio", Curation.multimodal_audio _, Some(Curation.multimodal_audio_sql)),
    ("multimodal_frames", Curation.multimodal_frames _, Some(Curation.multimodal_frames_sql)),
    ("multimodal_video", Curation.multimodal_video _, Some(Curation.multimodal_video_sql)),
    ("decontam_overlap", Curation.decontam_overlap _, Some(Curation.decontam_overlap_sql)),
    ("decontam_semantic", Curation.decontam_semantic _, Some(Curation.decontam_semantic_sql)),
    ("pack_sequences", Curation.pack_sequences _, Some(Curation.pack_sequences_sql)),
    ("curation_pipeline", Curation.curation_pipeline _, Some(Curation.curation_pipeline_sql)),
    ("q_export_shards", Curation.q_export_shards _, Some(Curation.q_export_shards_sql)),
    ("q_export_zonemap", Curation.q_export_zonemap _, Some(Curation.q_export_zonemap_sql)),
    ("q_export_zorder", Census.q_export_zorder _, Some(Census.q_export_zorder_sql)),
    ("q_hll_census", Census.q_hll_census _, Some(Census.q_hll_census_sql)),
    ("q_stream_hll", Census.q_stream_hll _, Some(Census.q_stream_hll_sql)),
    ("q_stream_cms", Census.q_stream_cms _, Some(Census.q_stream_cms_sql)),
    ("q_stream_hist", Census.q_stream_hist _, Some(Census.q_stream_hist_sql)),
    ("txt_cms_topk", Census.txt_cms_topk _, Some(Census.txt_cms_topk_sql)),
    ("q_hist_quantile", Census.q_hist_quantile _, Some(Census.q_hist_quantile_sql)),
    ("txt_lrfit", Census.txt_lrfit _, Some(Census.txt_lrfit_sql)),
    ("q_export_bucketed", Curation.q_export_bucketed _, Some(Curation.q_export_bucketed_sql)),
    // streaming surface (SURVEY §2.7)
    ("q_stream_window", Events.q_stream_window _, Some(Events.q_stream_window_sql)),
    ("q_stream_decontam", Curation.q_stream_decontam _, Some(Curation.q_stream_decontam_sql)),
    ("q_stream_neardup", Curation.q_stream_neardup _, Some(Curation.q_stream_neardup_sql)),
    ("q_stream_dedup", Events.q_stream_dedup _, Some(Events.q_stream_dedup_sql)),
    ("q_sessionize", Events.q_sessionize _, Some(Events.q_sessionize_sql)),
    ("q_funnel", Events.q_funnel _, Some(Events.q_funnel_sql)),
    ("q_retention", Events.q_retention _, Some(Events.q_retention_sql)),
    ("q_transitions", Events.q_transitions _, Some(Events.q_transitions_sql)),
    ("q_json", Events.q_json _, Some(Events.q_json_sql)),
  )

  def queries: Map[String, Q] =
    registry.map { case (n, f, _) => n -> f }.toMap

  def oracleSql: Map[String, String] =
    registry.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
