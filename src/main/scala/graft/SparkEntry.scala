package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to plans over a
  * scale-factor directory; `oracleSql` holds the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"          -> (Relational.q1Agg _),
    "q2_join_revenue" -> (Relational.q2JoinRevenue _),
    "q3_topk_orders"  -> (Relational.q3TopkOrders _),
    "q4_window_topk"  -> (Relational.q4WindowTopk _),
    "q5_semi_join"    -> (Relational.q5SemiJoin _),
    "q6_anti_join"    -> (Relational.q6AntiJoin _),
    "q7_set_ops"      -> (Relational.q7SetOps _),
    "q8_rollup"       -> (Relational.q8Rollup _),
    "q9_distinct"     -> (Relational.q9Distinct _),
    "q10_scalar"      -> (Relational.q10Scalar _),
    "q11_json"        -> (Relational.q11Json _),
    "q12_window"      -> (Relational.q12Window _),
    "q13_case_agg"    -> (Relational.q13CaseAgg _),
    "q14_merge_upsert" -> (MergeQueries.q14MergeUpsert _),
    "q15_dedup_exact"  -> (TextQueries.q15DedupExact _),
    "q16_text_stats"   -> (TextQueries.q16TextStats _),
    "q17_langid"       -> (TextQueries.q17LangId _),
    "q18_fingerprint"  -> (TextQueries.q18Fingerprint _),
    "q19_ngram_jaccard" -> (TextQueries.q19NgramJaccard _),
    "q20_minhash_lsh"  -> (TextQueries.q20MinhashLsh _),
    "q20b_minhash_xxh" -> (TextQueries.q20bMinhashXxh _),
    "q21_simhash"      -> (TextQueries.q21Simhash _),
    "q22_knn_exact"    -> (SimilarityQueries.q22KnnExact _),
    "q23_ann_srp"      -> (SimilarityQueries.q23AnnSrp _),
    "q24_window_time"  -> (StreamingQueries.q24WindowTime _),
    "q25_sessionize"   -> (StreamingQueries.q25Sessionize _),
    "q26_sketches"     -> (Relational.q26Sketches _),
    "q27_json_typed"   -> (Relational.q27JsonTyped _),
    "q28_ivf_ann"      -> (Ivf.q28IvfAnn _),
    "q29_winnow"       -> (TextQueries.q29Winnow _),
    "q30_cube"         -> (Relational.q30Cube _),
    "q31_asof"         -> (AsofJoin.q31Asof _),
    "q32_range_join"   -> (AsofJoin.q32RangeJoin _),
    "q33_pivot"        -> (Relational.q33Pivot _),
    "q34_sql_subquery" -> (Relational.q34SqlSubquery _),
    "q35_sliding"      -> (StreamingQueries.q35Sliding _),
    "q36_user_totals"  -> (StreamingQueries.q36UserTotals _),
    "q37_media_ann"    -> (MediaQueries.q37MediaAnn _),
    "q38_boilerplate"  -> (TextQueries.q38Boilerplate _),
    "q39_grouping_sets" -> (Relational.q39GroupingSets _),
    "q40_window_fns"   -> (Relational.q40WindowFns _),
    "q41_stream_parity" -> (StreamingQueries.q41StreamParity _),
    "q42_winnow_rk"    -> (TextQueries.q42WinnowRk _),
    "q43_media_frames" -> (MediaQueries.q43MediaFrames _),
    "q44_mixture_sample" -> (TrainingData.q44MixtureSample _),
    "q45_seq_pack"     -> (TrainingData.q45SeqPack _),
    "q46_stream_merge" -> (StreamingQueries.q46StreamMerge _),
    "q47_skew_join"    -> (Skew.q47SkewJoin _),
    "q48_bulk_sink"    -> (SinkQueries.q48BulkSink _),
    "q49_pack_segments" -> (TrainingData.q49PackSegments _),
    "q50_mixture_xxh"  -> (TrainingData.q50MixtureXxh _),
    "q51_stream_join"  -> (StreamingQueries.q51StreamJoin _),
    "q52_dedup_clusters" -> (TextQueries.q52DedupClusters _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"          -> Relational.q1AggSql,
    "q2_join_revenue" -> Relational.q2JoinRevenueSql,
    "q3_topk_orders"  -> Relational.q3TopkOrdersSql,
    "q4_window_topk"  -> Relational.q4WindowTopkSql,
    "q5_semi_join"    -> Relational.q5SemiJoinSql,
    "q6_anti_join"    -> Relational.q6AntiJoinSql,
    "q7_set_ops"      -> Relational.q7SetOpsSql,
    "q8_rollup"       -> Relational.q8RollupSql,
    "q9_distinct"     -> Relational.q9DistinctSql,
    "q10_scalar"      -> Relational.q10ScalarSql,
    "q11_json"        -> Relational.q11JsonSql,
    "q12_window"      -> Relational.q12WindowSql,
    "q13_case_agg"    -> Relational.q13CaseAggSql,
    "q14_merge_upsert" -> MergeQueries.q14MergeUpsertSql,
    "q15_dedup_exact"  -> TextQueries.q15DedupExactSql,
    "q16_text_stats"   -> TextQueries.q16TextStatsSql,
    "q17_langid"       -> TextQueries.q17LangIdSql,
    "q18_fingerprint"  -> TextQueries.q18FingerprintSql,
    "q19_ngram_jaccard" -> TextQueries.q19NgramJaccardSql,
    "q20_minhash_lsh"  -> TextQueries.q20MinhashLshSql,
    "q20b_minhash_xxh" -> TextQueries.q20bMinhashXxhSql,
    "q21_simhash"      -> TextQueries.q21SimhashSql,
    "q22_knn_exact"    -> SimilarityQueries.q22KnnExactSql,
    "q23_ann_srp"      -> SimilarityQueries.q23AnnSrpSql,
    "q24_window_time"  -> StreamingQueries.q24WindowTimeSql,
    "q25_sessionize"   -> StreamingQueries.q25SessionizeSql,
    "q26_sketches"     -> Relational.q26SketchesSql,
    "q27_json_typed"   -> Relational.q27JsonTypedSql,
    "q28_ivf_ann"      -> Ivf.q28IvfAnnSql,
    "q29_winnow"       -> TextQueries.q29WinnowSql,
    "q30_cube"         -> Relational.q30CubeSql,
    "q31_asof"         -> AsofJoin.q31AsofSql,
    "q32_range_join"   -> AsofJoin.q32RangeJoinSql,
    "q33_pivot"        -> Relational.q33PivotSql,
    "q34_sql_subquery" -> Relational.q34SqlSubquerySql,
    "q35_sliding"      -> StreamingQueries.q35SlidingSql,
    "q36_user_totals"  -> StreamingQueries.q36UserTotalsSql,
    "q37_media_ann"    -> MediaQueries.q37MediaAnnSql,
    "q38_boilerplate"  -> TextQueries.q38BoilerplateSql,
    "q39_grouping_sets" -> Relational.q39GroupingSetsSql,
    "q40_window_fns"   -> Relational.q40WindowFnsSql,
    "q41_stream_parity" -> StreamingQueries.q41StreamParitySql,
    "q42_winnow_rk"    -> TextQueries.q42WinnowRkSql,
    "q43_media_frames" -> MediaQueries.q43MediaFramesSql,
    "q44_mixture_sample" -> TrainingData.q44MixtureSampleSql,
    "q45_seq_pack"     -> TrainingData.q45SeqPackSql,
    "q46_stream_merge" -> StreamingQueries.q46StreamMergeSql,
    "q47_skew_join"    -> Skew.q47SkewJoinSql,
    "q48_bulk_sink"    -> SinkQueries.q48BulkSinkSql,
    "q49_pack_segments" -> TrainingData.q49PackSegmentsSql,
    "q50_mixture_xxh"  -> TrainingData.q50MixtureXxhSql,
    "q51_stream_join"  -> StreamingQueries.q51StreamJoinSql,
    "q52_dedup_clusters" -> TextQueries.q52DedupClustersSql,
  )
}
