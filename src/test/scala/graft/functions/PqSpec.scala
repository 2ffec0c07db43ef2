package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.Similarity

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("encode picks the nearest centroid per subspace; decode reconstructs it") {
    // dim 4, m 2 subspaces of 2, k 2 centroids each — hand-computable
    val codebook = VecOps.packDoubles(Array(
      0.0, 0.0, /* sub0 c0 */ 1.0, 1.0, /* sub0 c1 */
      2.0, 2.0, /* sub1 c0 */ 5.0, 5.0  /* sub1 c1 */))
    val vec = VecOps.packDoubles(Array(0.9, 1.1, 2.4, 1.9))
    val codes = PqOps.encode(vec, codebook, 2, 2)
    assert(codes.toSeq === Seq(1.toByte, 0.toByte))
    val dec = PqOps.decode(codes, codebook, 2)
    assert(VecOps.dot(dec, VecOps.packDoubles(Array(1.0, 1.0, 1.0, 1.0)))
      === 1.0 + 1.0 + 2.0 + 2.0)
  }

  test("adc equals dot(query, decode(codes)) for the table built from the query") {
    val codebook = VecOps.packDoubles(
      Array(0.5, -0.5, 1.5, 0.25, -1.0, 2.0, 0.0, 3.0))
    val q = Array(0.3, -0.7, 1.1, 0.2)
    val table = PqOps.adcTable(q, codebook, 2, 2)
    for (c0 <- 0 to 1; c1 <- 0 to 1) {
      val codes = Array(c0.toByte, c1.toByte)
      val viaTable = PqOps.adc(codes, table, 2)
      val viaDecode = VecOps.dot(VecOps.packDoubles(q),
        PqOps.decode(codes, codebook, 2))
      assert(math.abs(viaTable - viaDecode) < 1e-12)
    }
  }

  test("pq index + two-stage probe retrieves an identical vector at rank 1") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 200L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)
    }
    // make row 199 an exact copy of row 0's vector
    val df = (rows.dropRight(1) :+ (199L, rows.head._2))
      .toDF("vec_id", "embedding")
    val idx = Similarity.pqIndex(df, "embedding", "vec_id", m = 8, k = 8)
    val q = rows.head._2.map(_.toDouble)
    val top = Similarity.pqTopK(idx, df, "embedding", "vec_id", q, k = 2,
      shortlist = 50).collect()
    assert(top.map(_.getLong(0)).toSet === Set(0L, 199L),
      s"expected the exact duplicates at the top, got ${top.toSeq}")
    assert(top.forall(_.getDouble(1) >= 1.0 - 1e-9))
  }

  test("zero-norm vectors are dropped from the encoded corpus") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat))) :+
      (99L, Seq.fill(8)(0f)) // direction-less: must not be encoded
    val idx = Similarity.pqIndex(rows.toDF("vec_id", "embedding"),
      "embedding", "vec_id", m = 4, k = 4)
    val ids = idx.encoded.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(99L) && ids.size === 40)
  }

  test("Inf-element vectors are dropped too (Inf norm → NaN components)") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 30L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat))) :+
      (98L, Seq.fill(7)(1f) :+ Float.PositiveInfinity)
    val idx = Similarity.pqIndex(rows.toDF("vec_id", "embedding"),
      "embedding", "vec_id", m = 4, k = 4)
    assert(!idx.encoded.select("vec_id").collect().map(_.getLong(0))
      .contains(98L))
    // and the codebook itself stays finite
    assert((0 until idx.codebook.length / 8).forall { i =>
      val d = java.lang.Double.longBitsToDouble(
        org.apache.spark.unsafe.Platform.getLong(idx.codebook,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + 8L * i))
      !d.isNaN && !d.isInfinite
    })
  }

  test("ivf-pq: exact duplicate lands in the probed cell and ranks first") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 300L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)
    }
    val df = (rows.dropRight(1) :+ (299L, rows.head._2))
      .toDF("vec_id", "embedding")
    val idx = Similarity.ivfPqIndex(df, "embedding", "vec_id",
      nlist = 8, m = 8, k = 8)
    // every row got a cell in [0, nlist) and m-byte codes
    val cells = idx.coded.select("_cell").distinct()
      .collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 8))
    assert(idx.coded.select(length(col("_codes"))).distinct()
      .collect().map(_.getInt(0)).toSeq === Seq(8))
    // probing with row 0's vector finds both exact copies at the top:
    // identical vectors share a cell (same nearest centroid), so cell
    // pruning cannot separate them from the query
    val q = rows.head._2.map(_.toDouble)
    val top = Similarity.ivfPqTopK(idx, df, "embedding", "vec_id", q,
      k = 2, nprobe = 2, shortlist = 50).collect()
    assert(top.map(_.getLong(0)).toSet === Set(0L, 299L),
      s"expected the exact duplicates at the top, got ${top.toSeq}")
    assert(top.forall(_.getDouble(1) >= 1.0 - 1e-9))
  }

  test("codes are m bytes regardless of dimension") {
    val df = (0L until 50L)
      .map(i => (i, Seq.fill(16)((i % 7).toFloat + 1f)))
      .toDF("vec_id", "embedding")
    val idx = Similarity.pqIndex(df, "embedding", "vec_id", m = 4, k = 4)
    val lens = idx.encoded.select(length(col("_codes"))).distinct().collect()
    assert(lens.map(_.getInt(0)).toSeq === Seq(4))
  }
}
