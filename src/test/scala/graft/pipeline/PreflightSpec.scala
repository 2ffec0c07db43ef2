package graft.pipeline

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

/** Pre-flight checks (reference checkRequirements analog) — driver-side
  * only, no Spark session needed. */
class PreflightSpec extends AnyFunSuite {

  private val hconf = new org.apache.hadoop.conf.Configuration()

  private def dump(n: Int): File = {
    val src = java.nio.file.Files.createTempDirectory("graft-pf").toFile
    for (i <- 0 until n) {
      java.nio.file.Files.writeString(
        new File(src, s"pf.t$i-schema.sql").toPath,
        s"CREATE TABLE `t$i` (`id` int(11) NOT NULL)")
      java.nio.file.Files.writeString(
        new File(src, s"pf.t$i.sql").toPath,
        s"INSERT INTO `t$i` VALUES (1);\n")
    }
    src
  }

  private def errsOf(fs: Seq[Preflight.Finding]) =
    fs.filter(_.level == "ERROR").map(f => s"${f.check}: ${f.detail}")

  test("healthy dump: no errors, source/schema/out/disk info present") {
    val out = java.nio.file.Files.createTempDirectory("graft-pf-out").toString
    val fs = Preflight.run(ImportConfig(
      sourceDir = dump(3).getAbsolutePath, outDir = out), hconf)
    assert(errsOf(fs).isEmpty, fs.mkString("\n"))
    val checks = fs.map(_.check).toSet
    assert(Set("config", "source", "schema", "out", "disk")
      .subsetOf(checks), fs.mkString("\n"))
    assert(fs.exists(f => f.check == "source" && f.detail.contains("3 tables")))
  }

  test("missing source dir and invalid config both surface as findings") {
    val out = java.nio.file.Files.createTempDirectory("graft-pf-out").toString
    val fs = Preflight.run(ImportConfig(
      sourceDir = "/nonexistent/graft-preflight", outDir = out,
      csv = graft.sources.CsvConfig(separator = "xx")), hconf)
    val es = errsOf(fs)
    assert(es.exists(_.startsWith("config:")), fs.mkString("\n"))
    assert(es.exists(_.startsWith("source:")), fs.mkString("\n"))
  }

  test("broken DDL is reported per table, good tables still count") {
    val src = dump(2)
    java.nio.file.Files.writeString(
      new File(src, "pf.bad-schema.sql").toPath, "CREATE GIBBERISH (")
    java.nio.file.Files.writeString(
      new File(src, "pf.bad.sql").toPath, "INSERT INTO `bad` VALUES (1);\n")
    val out = java.nio.file.Files.createTempDirectory("graft-pf-out").toString
    val fs = Preflight.run(ImportConfig(
      sourceDir = src.getAbsolutePath, outDir = out), hconf)
    val es = errsOf(fs)
    assert(es.exists(e => e.startsWith("schema:") && e.contains("pf.bad")),
      fs.mkString("\n"))
    assert(es.size === 1, fs.mkString("\n"))
  }

  test("unwritable out dir (a file in the way) is an error") {
    val blocker = java.nio.file.Files.createTempFile("graft-pf", ".f")
    val fs = Preflight.run(ImportConfig(
      sourceDir = dump(1).getAbsolutePath,
      outDir = blocker.toString + "/sub"), hconf)
    assert(errsOf(fs).exists(_.startsWith("out:")), fs.mkString("\n"))
  }

  test("JDBC probe failure is an error; success is info") {
    val src = dump(1).getAbsolutePath
    val out = java.nio.file.Files.createTempDirectory("graft-pf-out").toString
    val bad = Preflight.run(ImportConfig(sourceDir = src, outDir = out,
        checkpointUrl = Some("jdbc:fake://x")), hconf,
      jdbcProbe = _ => Left("connection refused"))
    assert(errsOf(bad).exists(_.startsWith("jdbc:")), bad.mkString("\n"))
    val ok = Preflight.run(ImportConfig(sourceDir = src, outDir = out,
        checkpointUrl = Some("jdbc:fake://x")), hconf,
      jdbcProbe = _ => Right(()))
    assert(errsOf(ok).isEmpty, ok.mkString("\n"))
    assert(ok.exists(f => f.check == "jdbc" && f.level == "INFO"))
  }

  test("no-schema mode: tables must resolve from the schema catalog") {
    val src = java.nio.file.Files.createTempDirectory("graft-pf").toFile
    java.nio.file.Files.writeString(new File(src, "pf.t.csv").toPath,
      "1,2\n")
    val out = java.nio.file.Files.createTempDirectory("graft-pf-out").toString
    val fs = Preflight.run(ImportConfig(
      sourceDir = src.getAbsolutePath, outDir = out, noSchema = true), hconf)
    assert(errsOf(fs).exists(e => e.startsWith("schema:") &&
      e.contains("schemaCatalog")), fs.mkString("\n"))
  }
}
