package graft.sources

import java.io.File
import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

class CsvDataSourceSpec extends SparkSpec {

  private def writeFile(dir: File, name: String, body: String): File = {
    val f = new File(dir, name)
    java.nio.file.Files.writeString(f.toPath, body)
    f
  }

  test("graftcsv batch: agrees with CsvSource.readIndexed row-for-row") {
    val dir = java.nio.file.Files.createTempDirectory("gcsv").toFile
    val body =
      "1,\"al\\\"pha\",10.5\n" +
      "2,\\N,\\N\n" +
      "3,\"quoted,comma\",-7\n" +
      "4,,0\n"
    val f = writeFile(dir, "t.csv", body)
    val viaFormat = spark.read.format("graftcsv").option("ncols", 3)
      .load(f.getAbsolutePath)
      .collect().map(_.toSeq).toSet
    val viaFn = CsvSource.readIndexed(spark, Seq(f.getAbsolutePath),
      CsvConfig(), ncols = 3)
      .collect().map(_.toSeq).toSet
    assert(viaFormat === viaFn)
    assert(viaFormat.size === 4)
    // null + empty semantics
    val r2 = viaFormat.find(_.head == "2").get
    assert(r2(1) == null && r2(2) == null)
    val r4 = viaFormat.find(_.head == "4").get
    assert(r4(1) == "")
  }

  test("graftcsv: byte-range splits preserve rows and offsets exactly") {
    val dir = java.nio.file.Files.createTempDirectory("gcsv2").toFile
    val body = (1 to 500).map(i => s"$i,name_$i,${i * 1.5}").mkString("", "\n", "\n")
    val f = writeFile(dir, "big.csv", body)
    def rows(maxPart: String) = spark.read.format("graftcsv")
      .option("ncols", 3).option("maxPartitionBytes", maxPart)
      .load(f.getAbsolutePath)
      .collect().map(r => (r.getString(0).toInt, r.getLong(4))).sortBy(_._1).toSeq
    val whole = rows((1 << 20).toString)
    val split = rows("256") // ~25 splits over the same file
    assert(split === whole)
    assert(whole.map(_._1) === (1 to 500))
    assert(whole.map(_._2).distinct.length === 500) // distinct byte offsets
  }

  test("graftcsv: header skip and GB18030 charset=auto") {
    val dir = java.nio.file.Files.createTempDirectory("gcsv3").toFile
    val f = new File(dir, "cn.csv")
    val out = new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(f), "GB18030")
    try out.write("id,label\n1,客户甲\n2,客户乙\n") finally out.close()
    val got = spark.read.format("graftcsv")
      .option("ncols", 2).option("header", "true").option("charset", "auto")
      .load(f.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === Seq(("1", "客户甲"), ("2", "客户乙")))
  }

  test("graftcsv streaming: new files become micro-batches; resume by offset") {
    val src = java.nio.file.Files.createTempDirectory("gcsv-s").toFile
    val out = java.nio.file.Files.createTempDirectory("gcsv-so").toString
    val ckpt = java.nio.file.Files.createTempDirectory("gcsv-sc").toString
    writeFile(src, "a.csv", (1 to 30).map(i => s"$i,v$i").mkString("", "\n", "\n"))
    def runOnce(): Unit = {
      val q = spark.readStream.format("graftcsv").option("ncols", 2)
        .load(src.getAbsolutePath)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }
    runOnce()
    assert(spark.read.parquet(out).count() === 30)
    writeFile(src, "b.csv", (31 to 45).map(i => s"$i,v$i").mkString("", "\n", "\n"))
    runOnce()
    val all = spark.read.parquet(out)
    assert(all.count() === 45) // no re-ingest of a.csv
    assert(all.select("c0").collect().map(_.getString(0).toInt).sorted.toSeq
      === (1 to 45))
  }
}
