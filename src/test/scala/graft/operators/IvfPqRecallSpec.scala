package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the benefit of residual encoding in the composed IVF-PQ index:
  * with residual codes (v − centroid quantized, per-cell dot(q,c) added
  * back at probe time) the ADC shortlist + exact re-rank should recover
  * essentially EVERYTHING the probed cells contain — i.e. recall reaches
  * the cell-coverage ceiling, so the only recall loss is cell probing
  * (tunable via nprobe), not code fidelity. Direct (non-residual)
  * encoding measured well below this ceiling at the same settings
  * (the motivation for the residual change).
  */
class IvfPqRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("residual IVF-PQ: recall reaches the probed-cell ceiling") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .collect()(0).getSeq[Float](0).map(_.toDouble)
    val idx = Similarity.ivfPqIndex(emb, "embedding", "vec_id",
      nlist = 16, m = 16, k = 16,
      trainOn = Some(emb.filter(pmod(col("vec_id"), lit(2)) === 0)))
    idx.coded.persist().count()
    try {
      val hits = Similarity.ivfPqTopK(idx, emb, "embedding", "vec_id", q,
        k = 11, nprobe = 6, shortlist = 302).collect()
      // self-retrieval: the query vector itself is always hit #1
      assert(hits.head.getAs[Number](0).longValue === 0L)
      val ivfpq10 = hits.drop(1).map(_.getAs[Number](0).longValue).toSet
      val brute10 = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", q, 10)
        .collect().map(_.getAs[Number](0).longValue).toSet
      val recall = brute10.intersect(ivfpq10).size / 10.0
      // ceiling: fraction of the true top-10 whose cell is probed at all —
      // no ANN scan of 6/16 cells can beat this
      val probed = Similarity.probedCells(idx, q, 6)
      val inCells = idx.coded.filter(col("_cell").isin(probed: _*))
        .select("vec_id").collect().map(_.getAs[Number](0).longValue).toSet
      val ceiling = brute10.intersect(inCells).size / 10.0
      assert(ceiling >= 0.5, f"probed-cell ceiling degenerate: $ceiling%.2f")
      // the pinned property: residual codes lose (almost) nothing on top
      // of cell selection. One-neighbor slack absorbs testdata regeneration
      // (observed: recall == ceiling exactly at sf0.001/0.01/0.1).
      assert(recall >= ceiling - 0.1,
        f"PQ shortlist lost probed true neighbors: recall $recall%.2f < ceiling $ceiling%.2f")
      assert(recall >= 0.6, f"absolute recall floor: $recall%.2f")
    } finally idx.coded.unpersist()
  }
}
