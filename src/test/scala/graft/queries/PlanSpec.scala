package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Plan-shape assertions: lock in the scale properties the operators are
  * designed around — filter pushdown reaching the parquet scan, broadcast
  * joins for small sides, map-side partial aggregation, top-k without a
  * global sort, and LSH pipelines never degenerating into cross joins.
  * A regression here is a silent 100×-at-scale bug even when results stay
  * correct. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1_agg: shipdate filter pushed to the scan; partial aggregation") {
    val p = plan(Analytics.q1_agg(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$p")
    // two HashAggregate levels = map-side partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q1_agg: scan reads only referenced columns") {
    val p = plan(Analytics.q1_agg(spark, sf))
    val readSchema = "ReadSchema: ([^\n]+)".r.findFirstMatchIn(p).map(_.group(1))
    assert(readSchema.exists(s => !s.contains("l_comment") && s.contains("l_quantity")),
      s"column pruning failed: $readSchema")
  }

  test("q5_join: small dimensions broadcast, no shuffle for them") {
    val p = plan(Analytics.q5_join(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, s"missing broadcasts:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q3_topk: top-k via TakeOrderedAndProject, not a global sort") {
    val p = plan(Analytics.q3_topk(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$p")
  }

  test("LSH miners: band joins stay equi-joins — never cross joins") {
    import graft.util.Tables
    val docs = Tables.load(spark, sf, "documents")
    for (df <- Seq(
        graft.operators.Dedup.minhashPairs(docs, "text", "doc_id",
          threshold = 0.35),
        graft.operators.Dedup.simhashPairs(docs, "text", "doc_id"))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"LSH degenerated into a cross join:\n${p.take(2000)}")
    }
  }

  test("import pipeline scan: dump parse fuses into one codegen stage") {
    // the aligned projection (permute+cast+row-id) must be a narrow chain:
    // no Exchange between the parse RDD scan and the final projection
    val d = java.nio.file.Files.createTempDirectory("planspec").toFile
    java.nio.file.Files.writeString(
      new java.io.File(d, "p.t.sql").toPath,
      "INSERT INTO `t` VALUES (1,'a'),(2,'b');\n")
    val table = graft.sources.MysqlDdl.parseCreateTable(
      "CREATE TABLE `t` (`id` int(11) NOT NULL, `v` varchar(8))")
    val raw = spark.read.format("sqldump")
      .load(new java.io.File(d, "p.t.sql").getAbsolutePath)
    val aligned = graft.operators.SchemaAlign.fromArrayPerStatement(
      raw, org.apache.spark.sql.functions.col("vals"),
      org.apache.spark.sql.functions.col("stmt_cols"), table,
      graft.operators.SqlMode.Lenient)
    val p = plan(aligned)
    assert(!p.contains("Exchange"), s"unexpected shuffle in align chain:\n$p")
  }
}
