package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** One-off plan dumper for the r18 optimization evidence: writes
  * `.explain("formatted")` of each touched query BEFORE (legacy
  * kernels, still in-tree as the oracle-replayed reference) and AFTER
  * (the shipped implementation) under plans/r18/. */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Path.of("plans", "r18")
    java.nio.file.Files.createDirectories(out)
    def dump(name: String, df: DataFrame): Unit = {
      java.nio.file.Files.writeString(out.resolve(s"$name.txt"),
        df.queryExecution.explainString(FormattedMode))
      println(s"wrote plans/r18/$name.txt")
    }
    import graft.operators.TextAnalysis
    import graft.util.Tables
    // txt_quality
    dump("txt_quality_before", Tables.load(spark, dir, "documents").select(
      col("doc_id"), TextAnalysis.legacyQualityScore(col("text")).as("quality")))
    dump("txt_quality_after", graft.queries.Curation.txt_quality(spark, dir))
    // txt_langid
    dump("txt_langid_before", Tables.load(spark, dir, "documents").select(
      col("doc_id"), col("lang"),
      TextAnalysis.legacyLangId(col("text")).as("lang_pred")))
    dump("txt_langid_after", graft.queries.Curation.txt_langid(spark, dir))
    // corpus_profile
    dump("corpus_profile_before", Tables.load(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"),
        sum(TextAnalysis.legacyQualityScore(col("text"))).as("quality_sum"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang")))
    dump("corpus_profile_after", graft.queries.Curation.corpus_profile(spark, dir))
    // q_stream_curate: the scored micro-batch projection (the part the
    // kernel swap changes; the streaming wrapper plans this per batch)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    dump("q_stream_curate_scored_projection_before", docs
      .select(col("doc_id"), col("lang"),
        TextAnalysis.legacyQualityScore(col("text")).as("quality"),
        TextAnalysis.legacyLangId(col("text")).as("lang_pred"))
      .filter(col("quality") >= 60 && col("lang_pred") =!= "und"))
    dump("q_stream_curate_scored_projection_after", docs
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
      .filter(col("quality") >= 60 && col("lang_pred") =!= "und"))
    spark.stop()
  }
}
