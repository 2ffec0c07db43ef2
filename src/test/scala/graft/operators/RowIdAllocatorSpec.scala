package graft.operators

import graft.SparkSpec

class RowIdAllocatorSpec extends SparkSpec {

  test("contiguous ids across files in lexicographic order") {
    import spark.implicits._
    val df = Seq(
      ("f2", 0L, "x"), ("f2", 1L, "y"),
      ("f1", 0L, "a"), ("f1", 1L, "b"), ("f1", 2L, "c")
    ).toDF("src_file", "row_idx", "v")
    val out = RowIdAllocator.fromFileIndex(df, "src_file", "row_idx")
    val got = out.collect().map(r =>
      (r.getAs[String]("src_file"), r.getAs[Long]("row_idx"), r.getAs[Long]("_row_id")))
      .sortBy(_._3)
    assert(got.map(_._3).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // f1 rows (3) come first, then f2
    assert(got.take(3).forall(_._1 == "f1"))
    assert(got.drop(3).forall(_._1 == "f2"))
  }

  test("nextAutoIncrement = max + 1") {
    import spark.implicits._
    val df = Seq(3L, 9L, 4L).toDF("id")
    assert(RowIdAllocator.nextAutoIncrement(df, "id") === 10L)
  }
}
