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

  test("readIndexed: quirks parse per line; row_off is the line's byte offset") {
    val tmp = java.nio.file.Files.createTempDirectory("csvix").toFile
    val f = new java.io.File(tmp, "d.ix.csv")
    java.nio.file.Files.writeString(f.toPath,
      "1,\"a \\\"q\\\" b\",x\n2,\\N,y\n3,\"\",z\n")
    val df = CsvSource.readIndexed(spark, Seq(f.getAbsolutePath),
      CsvConfig(), ncols = 3)
    val rows = df.collect().sortBy(_.getLong(4))
    assert(rows.length === 3)
    assert(rows(0).getString(1) === "a \"q\" b")
    assert(rows(1).isNullAt(1)) // unquoted \N
    assert(rows(2).getString(1) === "") // quoted empty ≠ NULL
    assert(rows(0).getLong(4) === 0L)
    assert(rows(1).getLong(4) === "1,\"a \\\"q\\\" b\",x\n".getBytes.length.toLong)
  }

  test("readIndexed: (src_file,row_off) stable across split configurations") {
    val tmp = java.nio.file.Files.createTempDirectory("csvsplit").toFile
    val f = new java.io.File(tmp, "d.big.csv")
    val sb = new StringBuilder
    (0 until 500).foreach(i => sb ++= s"$i,name_$i,seg${i % 7}\n")
    java.nio.file.Files.writeString(f.toPath, sb.toString)
    def readAll() = CsvSource.readIndexed(spark, Seq(f.getAbsolutePath),
      CsvConfig(), ncols = 3)
      .collect().map(r => (r.getLong(4), r.getString(0))).sorted.toSeq
    val whole = readAll()
    val hc = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    try {
      hc.set(key, "512") // force many splits over the ~7 KiB file
      val split = readAll()
      assert(split === whole)
      assert(whole.length === 500)
      assert(whole.map(_._1).distinct.length === 500)
    } finally hc.unset(key)
  }

  test("readWholeFileIndexed: multiline quirks + dense deterministic index") {
    val df = CsvSource.readWholeFileIndexed(spark,
      Seq(fixture("mydump/mdb.people.csv")), CsvConfig(multiLine = true), ncols = 8)
    val rows = df.collect().sortBy(_.getLong(9))
    assert(rows.length === 3)
    assert(rows.map(_.getLong(9)).toSeq === Seq(0L, 1L, 2L)) // dense per file
    val r1 = rows(0)
    assert(r1.getString(1) === "Alice")
    assert(r1.getString(7) === "hello, \"world\"")
    val r2 = rows(1)
    assert(r2.getString(1) === "Bob \"the builder\"")
    assert(r2.isNullAt(2)) // \N
    assert(r2.getString(7) === "line1\nline2") // quoted newline
    val r3 = rows(2)
    assert(r3.getString(1) === "") // quoted empty ≠ NULL
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

  test("empty fields are '' not NULL; the null token alone is NULL") {
    // reference semantics (appendEmptyValues, csv_parser.go:50-61; fixture
    // tests/csv/data/csv.empty_strings.csv): with null=\N, both unquoted
    // and quoted empty fields load as the empty STRING; an empty field is
    // NULL only when the configured null token is itself ''
    val d = java.nio.file.Files.createTempDirectory("csv-empty").toFile
    val f = new java.io.File(d, "e.csv")
    java.nio.file.Files.writeString(f.toPath,
      "1,,\"\"\n2,\\N,x\n3,\"\\N\",y\n")
    val rows = CsvSource.readIndexed(spark, Seq(f.getAbsolutePath),
      CsvConfig(), ncols = 3)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(_._1).toSeq
    assert(rows(0) === (("1", "", "")))     // unquoted + quoted empty -> ''
    assert(rows(1) === (("2", null, "x")))  // \N token -> NULL
    // quoted "\N": pinned deviation — also NULL (parser can't see quoting)
    assert(rows(2) === (("3", null, "y")))
    // notNull=true: nothing is NULL, the token stays literal
    val nn = CsvSource.readIndexed(spark, Seq(f.getAbsolutePath),
      CsvConfig(notNull = true), ncols = 3)
      .collect().map(r => r.getString(1)).sorted.toSeq
    assert(nn === Seq("", "\\N", "\\N"))
  }
}
