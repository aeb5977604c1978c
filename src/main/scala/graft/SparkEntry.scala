package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> Relational.q1PricingSummary _,
    "q2_filter_project"    -> Relational.q2FilterProject _,
    "q3_top_revenue"       -> Relational.q3TopRevenue _,
    "q4_order_priority"    -> Relational.q4OrderPriority _,
    "q5_nation_revenue"    -> Relational.q5NationRevenue _,
    "q6_forecast_revenue"  -> Relational.q6ForecastRevenue _,
    "q7_distinct_parts"    -> Relational.q7DistinctParts _,
    "q8_topk_orders"       -> Relational.q8TopkOrders _,
    "q9_global_sort"       -> Relational.q9GlobalSort _,
    "q10_secondary_sort"   -> Relational.q10SecondarySort _,
    "q11_window_rank"      -> Relational.q11WindowRank _,
    "q12_rollup_revenue"   -> Relational.q12RollupRevenue _,
    "q13_cust_order_counts" -> Relational.q13CustOrderCounts _,
    "q14_having"           -> Relational.q14Having _,
    "q15_union_counts"     -> Relational.q15UnionCounts _,
    "q16_anti_join"        -> Relational.q16AntiJoin _,
    "q17_small_qty_parts"  -> Relational.q17SmallQtyParts _,
    "q18_large_orders"     -> Relational.q18LargeOrders _,
    "q19_event_windows"    -> Relational.q19EventWindows _,
    "q20_pivot_events"     -> Relational.q20PivotEvents _,
    "q21_sessionize"       -> Relational.q21Sessionize _,
    "q22_cube_orders"      -> Relational.q22CubeOrders _,
    "q23_json_props"       -> Relational.q23JsonProps _,
    "q24_running_total"    -> Relational.q24RunningTotal _,
    "q25_median"           -> Relational.q25Median _,
    "q26_min_per_group"    -> Relational.q26MinPerGroup _,
    "q27_set_ops"          -> Relational.q27SetOps _,
    "mr_wordcount"         -> MapReduceClassics.wordCount _,
    "mr_grep"              -> MapReduceClassics.grep _,
    "mr_inverted_index"    -> MapReduceClassics.invertedIndex _,
    "mr_word_stats"        -> MapReduceClassics.wordStats _,
    "mr_tfidf"             -> MapReduceClassics.tfIdf _,
    "mr_pagerank"          -> MapReduceClassics.pageRank _,
    "txt_heavy_hitters"    -> TextAnalysis.heavyHitters _,
    "txt_tokens"           -> TextAnalysis.tokens _,
    "txt_quality"          -> TextAnalysis.quality _,
    "txt_langid"           -> TextAnalysis.langId _,
    "txt_fingerprint"      -> TextAnalysis.fingerprint _,
    "txt_ngrams"           -> TextAnalysis.ngrams _,
    "txt_rolling_fp"       -> TextAnalysis.rollingFingerprint _,
    "txt_sample_stratified" -> TextAnalysis.sampleStratified _,
    "txt_repetition"       -> TextAnalysis.repetition _,
    "txt_contamination"    -> TextAnalysis.contamination _,
    "txt_pipeline_e2e"     -> TextAnalysis.endToEnd _,
    "dedup_exact"          -> Dedup.exact _,
    "dedup_survivor"       -> Dedup.survivor _,
    "dedup_ngram_jaccard"  -> Dedup.ngramJaccard _,
    "dedup_minhash_lsh"    -> Dedup.minhashLsh _,
    "dedup_simhash"        -> Dedup.simhash _,
    "dedup_substring"      -> Dedup.substring _,
    "dedup_components"     -> Dedup.components _,
    "dedup_embedding"      -> Dedup.embedding _,
    "sim_knn_brute"        -> Similarity.knnBrute _,
    "sim_knn_lsh"          -> Similarity.knnLsh _,
    "sim_knn_ivf"          -> Similarity.knnIvf _,
    "mm_meta"              -> Multimodal.meta _,
    "mm_resize"            -> Multimodal.resize _,
    "mm_frames"            -> Multimodal.frameSample _,
    "mm_embed_knn"         -> Multimodal.embedKnn _,
    "emb_quantize"         -> Similarity.quantize _,
    "src_csv_roundtrip"    -> SourceOps.csvRoundtrip _,
    "src_json_roundtrip"   -> SourceOps.jsonRoundtrip _,
    "src_orc_roundtrip"    -> SourceOps.orcRoundtrip _,
    "src_sequence_roundtrip" -> SourceOps.sequenceRoundtrip _,
    "src_partitioned_prune" -> SourceOps.partitionedPrune _,
    "src_text_roundtrip"   -> SourceOps.textRoundtrip _,
    "src_text_escaped"     -> SourceOps.textEscapedRoundtrip _,
    "src_text_bzip2"       -> SourceOps.textBzip2Roundtrip _,
    "src_csv_lz4"          -> SourceOps.csvLz4Roundtrip _,
    "src_bucketed_lookup"  -> SourceOps.bucketedLookup _,
    "src_bucketed_join"    -> SourceOps.bucketedJoin _,
    "src_range_lookup"     -> SourceOps.rangeLookup _,
    "src_bloom_lookup"     -> SourceOps.bloomLookup _,
    "src_compaction"       -> SourceOps.compactionRoundtrip _,
    "src_parquet_zstd"     -> SourceOps.parquetZstdRoundtrip _,
    "adv_asof_join"        -> Advanced.asofJoin _,
    "adv_asof_custom"      -> Advanced.asofCustom _,
    "adv_interval_join"    -> Advanced.intervalJoin _,
    "adv_salted_join"      -> Advanced.skewSaltedJoin _,
    "adv_distinct_users"   -> Advanced.distinctUsers _,
    "adv_hll_distinct"     -> Advanced.hllDistinct _,
    "adv_upsert"           -> Advanced.upsert _,
    "adv_funnel"           -> Advanced.funnel _,
    "src_zorder_lookup"    -> SourceOps.zorderLookup _,
    "mr_teragen"           -> HadoopTools.teragen _,
    "mr_teravalidate"      -> HadoopTools.teraValidate _,
    "mr_pi"                -> HadoopTools.piEstimate _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOracles.sql ++ TextOracles.sql ++ PipelineOracles.sql ++
      SourceOracles.sql ++ AdvancedOracles.sql
}
