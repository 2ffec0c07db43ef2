package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.VecExpressions.{packVec, packedDot}

class VecExpressionsSpec extends SparkSpec {

  test("VecOps pack/dot equals plain double math, left-to-right order") {
    val a = Array(1.5, -2.0, 0.25, 1e-3)
    val b = Array(0.5, 4.0, -8.0, 1e3)
    val pa = VecOps.pack(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a))
    val pb = VecOps.pack(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b))
    assert(pa.length === 32)
    val expected = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    assert(VecOps.dot(pa, pb) === expected) // bit-exact: same fold order
  }

  test("packed cosine equals the unrolled flat-column cosine bit-for-bit") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(-1.0f, 0.5f, 3.25f, 0.0f)),
      (3L, Seq(0.1f, 0.2f, 0.3f, 0.4f))).toDF("id", "v")
    val packed = vecs.select(col("id"),
      packVec(col("v").cast("array<double>")).as("p"))
    val l = packed.select(col("id").as("ia"), col("p").as("pa"))
    val r = packed.select(col("id").as("ib"), col("p").as("pb"))
    val got = l.join(r, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        (packedDot(col("pa"), col("pb")) /
          (sqrt(packedDot(col("pa"), col("pa"))) *
           sqrt(packedDot(col("pb"), col("pb"))))).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap

    val lf = vecs.select(col("id").as("ia"), col("v").as("va"))
    val rf = vecs.select(col("id").as("ib"), col("v").as("vb"))
    val want = lf.join(rf, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        graft.operators.Similarity.cosineUnrolled(col("va"), col("vb"), 4).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(got.keySet === want.keySet && got.nonEmpty)
    got.foreach { case (k, v) => assert(v === want(k), s"pair $k differs") }
  }

  test("packed hyperplane sketch equals the interpreted Column form bit-for-bit") {
    import spark.implicits._
    import graft.functions.VecExpressions.packedSketch
    // float vectors, like the embeddings corpus — the cast-to-double must
    // happen before packing for the sketch sums to match exactly
    val vecs = Seq(
      (1L, Seq(1.0f, -2.0f, 3.5f, 0.25f, -0.125f, 7.0f, -1e-3f, 2.5f)),
      (2L, Seq(-1.0f, 0.5f, 3.25f, 0.0f, 1.0f, -4.0f, 0.75f, -0.5f)),
      (3L, (1 to 8).map(i => (i * 0.37f - 1.3f)))).toDF("id", "v")
    for (seed <- 0 to 2; planes <- Seq(3, 4, 6)) {
      val got = vecs.select(col("id"),
        packedSketch(packVec(col("v").cast("array<double>")), planes, seed).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = vecs.select(col("id"),
        graft.operators.Similarity.hyperplaneSketch(col("v"), planes, seed).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"sketch mismatch at planes=$planes seed=$seed")
      // driver-side static call agrees too (lshTopK's query-bucket path)
      val local = vecs.collect().map(r => r.getLong(0) ->
        VecOps.hyperplaneSketch(
          VecOps.packDoubles(r.getSeq[Float](1).map(_.toDouble).toArray),
          planes, seed)).toMap
      assert(local === want, s"driver-side sketch mismatch at planes=$planes seed=$seed")
    }
  }

  test("null inputs propagate, empty vectors dot to 0") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq(1.0, 2.0))), (2L, None)).toDF("id", "v")
    val out = df.select(packVec(col("v")).as("p"))
      .select(packedDot(col("p"), col("p")).as("d"))
      .collect()
    assert(out.exists(r => !r.isNullAt(0) && r.getDouble(0) === 5.0))
    assert(out.exists(_.isNullAt(0)))
    assert(VecOps.dot(Array.empty[Byte], Array.empty[Byte]) === 0.0)
  }
}
