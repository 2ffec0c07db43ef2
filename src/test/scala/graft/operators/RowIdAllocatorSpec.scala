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

  test("fromFileSizes: disjoint increasing per-file ranges") {
    import spark.implicits._
    val df = Seq(
      ("/d/b.sql", 0L), ("/d/b.sql", 1L),
      ("/d/a.sql", 0L), ("/d/a.sql", 1L), ("/d/a.sql", 2L)
    ).toDF("src_file", "row_idx")
    val sizes = Seq(("/d/a.sql", 10L), ("/d/b.sql", 20L))
    val out = RowIdAllocator.fromFileSizes(df, "src_file", "row_idx", sizes,
      capacityFor = sz => sz)
    val got = out.collect()
      .map(r => (r.getAs[String]("src_file"), r.getAs[Long]("_row_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got("/d/a.sql") === Seq(1L, 2L, 3L))   // base 0
    assert(got("/d/b.sql") === Seq(11L, 12L))     // base 10 (a's capacity)
  }

  test("fromFileSizes: percent-encoded rendering resolves via normalization") {
    import spark.implicits._
    // the listing gives the decoded path; the source renders it
    // percent-encoded as a file: URI (the exact case the normalized-probe
    // fallback exists for — under ANSI element_at this crashed instead)
    val df = Seq(("file:/d/sp%20ace.sql", 0L), ("file:/d/sp%20ace.sql", 1L))
      .toDF("src_file", "row_idx")
    val sizes = Seq(("/d/sp ace.sql", 10L))
    val out = RowIdAllocator.fromFileSizes(df, "src_file", "row_idx", sizes,
      capacityFor = sz => sz)
    assert(out.collect().map(_.getAs[Long]("_row_id")).sorted.toSeq
      === Seq(1L, 2L))
  }

  test("fromFileSizes: unknown source file raises") {
    import spark.implicits._
    val df = Seq(("/d/mystery.sql", 0L)).toDF("src_file", "row_idx")
    val sizes = Seq(("/d/a.sql", 10L))
    val e = intercept[Exception] {
      RowIdAllocator.fromFileSizes(df, "src_file", "row_idx", sizes).collect()
    }
    assert(e.getMessage.contains("unknown source file") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown source file")))
  }

  test("fromFileSizes: broadcast fallback above maxMapFiles matches map path") {
    import spark.implicits._
    val files = (0 until 20).map(i => f"/d/f$i%02d.sql")
    val rows = files.flatMap(f => Seq((f, 0L), (f, 1L)))
    val df = rows.toDF("src_file", "row_idx")
    val sizes = files.map(f => (f, 8L))
    val viaMap = RowIdAllocator.fromFileSizes(df, "src_file", "row_idx",
      sizes, capacityFor = sz => sz)
    val viaJoin = RowIdAllocator.fromFileSizes(df, "src_file", "row_idx",
      sizes, capacityFor = sz => sz, maxMapFiles = 0)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("src_file"), r.getAs[Long]("row_idx"), r.getAs[Long]("_row_id"))
    assert(viaJoin.collect().map(key).sortBy(_._3).toSeq
      === viaMap.collect().map(key).sortBy(_._3).toSeq)
  }

  test("fromFileSizes: broadcast fallback raises on unknown file too") {
    import spark.implicits._
    val df = Seq(("/d/mystery.sql", 0L)).toDF("src_file", "row_idx")
    val sizes = Seq(("/d/a.sql", 10L))
    val e = intercept[Exception] {
      RowIdAllocator.fromFileSizes(df, "src_file", "row_idx", sizes,
        maxMapFiles = 0).collect()
    }
    assert(e.getMessage.contains("unknown source file") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown source file")))
  }

  test("fromFileSizes: restrictTo keeps global bases but bounds the lookup") {
    import spark.implicits._
    // chunk group = just b.sql; bases must still account for a.sql before it
    val df = Seq(("/d/b.sql", 0L), ("/d/b.sql", 1L)).toDF("src_file", "row_idx")
    val sizes = Seq(("/d/a.sql", 10L), ("/d/b.sql", 20L), ("/d/c.sql", 30L))
    val out = RowIdAllocator.fromFileSizes(df, "src_file", "row_idx", sizes,
      capacityFor = sz => sz, restrictTo = Some(Seq("/d/b.sql")))
    assert(out.collect().map(_.getAs[Long]("_row_id")).sorted.toSeq
      === Seq(11L, 12L))
    // and a row from OUTSIDE the restriction raises (its entry is absent)
    val stray = Seq(("/d/a.sql", 0L)).toDF("src_file", "row_idx")
    val e = intercept[Exception] {
      RowIdAllocator.fromFileSizes(stray, "src_file", "row_idx", sizes,
        capacityFor = sz => sz, restrictTo = Some(Seq("/d/b.sql"))).collect()
    }
    assert(e.getMessage.contains("unknown source file") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown source file")))
  }

  test("fromFileSizes: literal % in a real filename is not mangled") {
    import spark.implicits._
    // URLDecoder would throw on "%do" — normPath must keep the raw name
    val df = Seq(("/d/100%done.sql", 0L)).toDF("src_file", "row_idx")
    val sizes = Seq(("/d/100%done.sql", 10L))
    val out = RowIdAllocator.fromFileSizes(df, "src_file", "row_idx", sizes,
      capacityFor = sz => sz)
    assert(out.collect().map(_.getAs[Long]("_row_id")).toSeq === Seq(1L))
  }
}
