package graft.streaming

import java.io.File
import graft.SparkSpec
import org.apache.spark.sql.functions._

class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }

  test("stream flags docs against eval grams; restart picks up only new files") {
    val root = new File("target/test_docstream")
    deleteRec(root)
    val docsDir = new File(root, "docs"); docsDir.mkdirs()
    val cp = new File(root, "cp")
    val outDir = new File(root, "out")
    // eval universe = grams of "alpha beta gamma delta"
    val evalGrams = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
      .select(explode(graft.functions.SketchExpressions.gramHashes(
        graft.operators.Dedup.normalized(col("text")), 3)).as("g"))
      .collect().map(_.getLong(0))

    Seq((1L, "alpha beta gamma something"), (2L, "totally clean text here"),
        (3L, null: String))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(docsDir.getAbsolutePath)
    val first = DocStream.decontamFlags(spark, docsDir.getAbsolutePath,
      outDir.getAbsolutePath, cp.getAbsolutePath, evalGrams, n = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(first === Map(1L -> 1, 2L -> 0)) // null text never emitted

    // new file lands; the checkpointed source must process ONLY it (the
    // file sink accumulates, so doc 4 appears once and 1/2 stay single)
    Seq((4L, "beta gamma delta follows")).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(docsDir.getAbsolutePath)
    val second = DocStream.decontamFlags(spark, docsDir.getAbsolutePath,
      outDir.getAbsolutePath, cp.getAbsolutePath, evalGrams, n = 3).collect()
    assert(second.length === 3)
    assert(second.map(r => r.getLong(0) -> r.getInt(1)).toMap ===
      Map(1L -> 1, 2L -> 0, 4L -> 1))
    deleteRec(root)
  }

  test("streaming near-dup flags only base collisions, across micro-batches") {
    import graft.operators.Dedup
    val root = new File("target/test_docstream_nd")
    deleteRec(root)
    val docsDir = new File(root, "docs"); docsDir.mkdirs()
    val baseText = "the quick brown fox jumps over the lazy dog tonight"
    val base = Dedup.md5Signatures(
      Seq((100L, baseText)).toDF("doc_id", "text"), "text", "doc_id")
    // one file per doc → with maxFilesPerTrigger=1 each doc is its own
    // micro-batch, so batch boundaries must not change the flags
    val streamDocs = Seq(
      (1L, baseText),                                       // exact dup of base
      (2L, "the quick brown fox jumps over the lazy dog today"), // near dup
      (3L, "completely different content about spark plans"),    // clean
      (4L, "the quick brown fox jumps over the lazy dog tonight")) // dup again
    for ((id, t) <- streamDocs)
      Seq((id, t)).toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(docsDir.getAbsolutePath)
    val out = DocStream.nearDupVsBase(spark, docsDir.getAbsolutePath, base,
        lit(true), new File(root, "out").getAbsolutePath,
        new File(root, "cp").getAbsolutePath, maxFilesPerTrigger = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 1, 2L -> 1, 3L -> 0, 4L -> 1))
    deleteRec(root)
  }
}
