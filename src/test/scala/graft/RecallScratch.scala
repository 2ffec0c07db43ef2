package graft

// scratch: measure IVF-PQ recall after residual encoding (deleted before commit)
object RecallScratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val s = SparkSpec.session
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble)
      val idx = Similarity.ivfPqIndex(emb, "embedding", "vec_id",
        nlist = 16, m = 16, k = 16,
        trainOn = Some(emb.filter(pmod(col("vec_id"), lit(2)) === 0)))
      idx.coded.persist().count()
      val hits = Similarity.ivfPqTopK(idx, emb, "embedding", "vec_id", q,
        k = 11, nprobe = 6, shortlist = 302).collect()
      val self = hits.head.getAs[Number](0).longValue
      val ivfpq10 = hits.drop(1).map(_.getAs[Number](0).longValue).toSet
      val brute10 = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", q, 10)
        .collect().map(_.getAs[Number](0).longValue).toSet
      val recall = brute10.intersect(ivfpq10).size / 10.0
      // cell-coverage ceiling: how many true top-10 live in probed cells
      val probed = Similarity.probedCells(idx, q, 6)
      val inCells = idx.coded.filter(col("_cell").isin(probed: _*))
        .select("vec_id").collect().map(_.getAs[Number](0).longValue).toSet
      val ceiling = brute10.intersect(inCells).size / 10.0
      println(f"SCRATCH $sf self=$self recall=$recall%.2f cellCeiling=$ceiling%.2f")
      idx.coded.unpersist()
    }
    s.stop()
  }
}
