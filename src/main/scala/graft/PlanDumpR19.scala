package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** One-off plan dumper for the r19 optimization evidence: writes
  * `.explain("formatted")` of each touched query shape BEFORE (the
  * legacy Column trees, still in-tree as the oracle-replayed spec
  * reference) and AFTER (the shipped kernels) under plans/r19/. The
  * codebook/centroid literals are synthetic at the gates' REAL shapes
  * (m=16, k=16, sub=4; nlist=16 × dim; 2 LSH tables × 3 planes) — the
  * plan geometry, which is what the evidence pins, is identical to the
  * gates'. */
object PlanDumpR19 {
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
    val out = java.nio.file.Path.of("plans", "r19")
    java.nio.file.Files.createDirectories(out)
    def dump(name: String, df: DataFrame): Unit = {
      java.nio.file.Files.writeString(out.resolve(s"$name.txt"),
        df.queryExecution.explainString(FormattedMode))
      println(s"wrote plans/r19/$name.txt " +
        s"(${java.nio.file.Files.size(out.resolve(s"$name.txt"))} B)")
    }
    import graft.functions.ZExpressions
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val withQ = emb.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => floor(x * 1000).cast("long")).as("_q"))
    // the gates' real shapes, synthetic values
    def cbzOf(m: Int, k: Int, sub: Int): Seq[Seq[Seq[Long]]] =
      (0 until m).map(m0 => (0 until k).map(j => (0 until sub).map(i =>
        (((i * 13 + j * 29 + m0 * 41 + 3) % 2000) - 1000).toLong)))
    val dim = 64
    val cbz = cbzOf(16, 16, dim / 16)
    val cz = cbzOf(1, 16, dim).head

    // ann_pq_md5 / ann_ivfpq_md5: the m-per-subspace code projection
    dump("ann_pq_md5_codes_before", withQ.select(col("vec_id") +:
      ZExpressions.legacyPqCodeCols(col("_q"), cbz)
        .zipWithIndex.map { case (c, i) => c.as(s"_c$i") }: _*))
    dump("ann_pq_md5_codes_after", withQ
      .select(col("vec_id"), ZExpressions.pqCodesZ(col("_q"), cbz).as("_codes"))
      .select(col("vec_id") +:
        (0 until 16).map(i => col("_codes").getItem(i).as(s"_c$i")): _*))

    // quantizedCells (ann_ivf_md5 / ann_ivfpq_md5 / dedup_semantic_md5 /
    // q_export_ivf): the nlist-candidate cell argmin
    dump("quantized_cells_before", withQ.withColumn("_cell",
      ZExpressions.legacyCellCol(col("_q"), cz)))
    dump("quantized_cells_after", withQ.withColumn("_cell",
      ZExpressions.cellZ(col("_q"), cz)))

    // dedup_embed_md5: both LSH tables' buckets
    dump("dedup_embed_md5_buckets_before", withQ.select(col("vec_id") +:
      ZExpressions.legacyLshBucketCols(col("_q"), 2, 3)
        .zipWithIndex.map { case (c, t) => c.as(s"_b$t") }: _*))
    dump("dedup_embed_md5_buckets_after", withQ
      .select(col("vec_id"),
        ZExpressions.lshBucketsZ(col("_q"), 2, 3).as("_bks"))
      .select(col("vec_id"), col("_bks").getItem(0).as("_b0"),
        col("_bks").getItem(1).as("_b1")))

    // spreadIfNarrow gating: the sketch kernel's pre-kernel shape at
    // fixture scale. BEFORE reconstructs r18's unconditional spread
    // (repartition to defaultParallelism before the kernel); AFTER is
    // the shipped simhashSketches, whose byte-gated spread is a no-op
    // on the sub-MiB fixture scan.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    dump("simhash_sketches_before_spread_r18", {
      import graft.functions.SketchExpressions.simhash64
      docs.select(col("doc_id").as("_id"), col("text").as("_t"))
        .repartition(spark.sparkContext.defaultParallelism, col("_id"))
        .select(col("_id"), graft.operators.Dedup.normalized(col("_t")).as("_norm"))
        .filter(col("_norm") =!= "")
        .select(col("_id"), simhash64(col("_norm")).as("_h"))
        .repartition(col("_id"))
    })
    dump("simhash_sketches_after_spread_gated", graft.operators.Dedup
      .simhashSketches(docs, "text", "doc_id"))
    spark.stop()
  }
}
