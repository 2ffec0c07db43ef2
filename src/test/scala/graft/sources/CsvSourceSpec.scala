package graft.sources

import graft.SparkSpec

class CsvSourceSpec extends SparkSpec {

  test("lightning-quirk CSV: quotes, escapes, \\N nulls, multiline fields") {
    val df = CsvSource.read(spark, Seq(fixture("mydump/mdb.people.csv")),
      CsvConfig(), ncols = 8)
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows.length === 3)
    val r1 = rows(0)
    assert(r1.getString(1) === "Alice")
    assert(r1.getString(7) === "hello, \"world\"") // backslash-escaped quotes
    val r2 = rows(1)
    assert(r2.getString(1) === "Bob \"the builder\"") // backslash escape
    assert(r2.isNullAt(2)) // unquoted \N
    assert(r2.getString(7) === "line1\nline2") // multiline quoted field
    val r3 = rows(2)
    assert(r3.getString(1) === "") // quoted empty ≠ NULL
    assert(r3.isNullAt(6) && r3.isNullAt(7))
  }

  test("charset decoding: GB18030 data files (S7)") {
    val tmp = java.nio.file.Files.createTempDirectory("csvcs").toFile
    val f = new java.io.File(tmp, "d.cn.csv")
    val content = "1,中文测试\n2,编码\n"
    java.nio.file.Files.write(f.toPath, content.getBytes("GB18030"))
    val df = CsvSource.read(spark, Seq(f.getAbsolutePath),
      CsvConfig(charset = "GB18030"), ncols = 2)
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows(0).getString(1) === "中文测试")
    assert(rows(1).getString(1) === "编码")
  }

  test("trim-last-separator drops phantom trailing column") {
    val tmp = java.nio.file.Files.createTempDirectory("csvsrc").toFile
    val f = new java.io.File(tmp, "d.t.csv")
    java.nio.file.Files.writeString(f.toPath, "1,a,\n2,b,\n")
    val df = CsvSource.read(spark, Seq(f.getAbsolutePath),
      CsvConfig(trimLastSep = true), ncols = 2)
    assert(df.columns.toSeq === Seq("c0", "c1"))
    assert(df.collect().map(_.getString(1)).sorted.toSeq === Seq("a", "b"))
  }
}
