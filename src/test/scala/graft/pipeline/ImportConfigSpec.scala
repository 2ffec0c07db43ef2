package graft.pipeline

import graft.sources.{CsvConfig, RouteRule}
import org.scalatest.funsuite.AnyFunSuite

/** config.Adjust reject-rule parity (reference config.go:347-509). */
class ImportConfigSpec extends AnyFunSuite {

  private val base = ImportConfig(sourceDir = "/src", outDir = "/out")

  private def rejects(cfg: ImportConfig, needle: String): Unit = {
    val e = intercept[IllegalArgumentException](cfg.validated())
    assert(e.getMessage.startsWith("invalid config:"), e.getMessage)
    assert(e.getMessage.contains(needle), e.getMessage)
  }

  test("default config validates") {
    assert(base.validated() eq base)
  }

  test("CSV separator/delimiter rules (config.go:348-369)") {
    rejects(base.copy(csv = CsvConfig(separator = "")), "separator")
    rejects(base.copy(csv = CsvConfig(separator = "||")), "separator")
    rejects(base.copy(csv = CsvConfig(delimiter = "\"\"")), "delimiter")
    rejects(base.copy(csv = CsvConfig(separator = ",", delimiter = ",")),
      "same character")
    rejects(base.copy(csv = CsvConfig(separator = "\\")), "separator")
    rejects(
      base.copy(csv = CsvConfig(delimiter = "\\", backslashEscape = true)),
      "delimiter")
    // the same shapes are fine with escaping off
    base.copy(csv = CsvConfig(delimiter = "\\", backslashEscape = false))
      .validated()
    // empty delimiter = no quoting: allowed
    base.copy(csv = CsvConfig(delimiter = "")).validated()
  }

  test("charset allow-list (S7)") {
    base.copy(charset = "gb18030").validated()
    base.copy(charset = "AUTO").validated()
    rejects(base.copy(charset = "latin-1"), "charset")
    rejects(base.copy(csv = CsvConfig(charset = "nope")), "csv.charset")
  }

  test("numeric and URL sanity") {
    rejects(base.copy(minChunkBytes = 0), "minChunkBytes")
    rejects(base.copy(chunkCommitBytes = -1), "chunkCommitBytes")
    rejects(base.copy(tableConcurrency = 0), "tableConcurrency")
    rejects(base.copy(checkpointUrl = Some("mysql://host/db")),
      "checkpointUrl")
    base.copy(checkpointUrl = Some("jdbc:derby:memory:x;create=true"))
      .validated()
  }

  test("route rules need every field") {
    rejects(base.copy(routes = Seq(RouteRule("s", "", "d", "t"))), "route")
    base.copy(routes = Seq(RouteRule("s", "*", "d", "t"))).validated()
  }
}
