package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Equivalence lock for the r18 one-pass scoring kernels: the new
  * [[TextScore]] expressions must be BIT-IDENTICAL to the legacy
  * pure-`functions._` trees (which are still what the DuckDB oracle
  * replays via `qualityScoreSql`/`langIdSql`) on the real fixture
  * corpus AND on adversarial strings exercising every semantic corner
  * the kernel re-implements: code-point counting vs bytes (emoji,
  * surrogate pairs), the ASCII \s token classes, trim-only-spaces,
  * marker overlap consumed by replace ("a a a"), padding boundaries,
  * lowercase folding, and the NULL fold (quality 0 / 'und'). */
class TextScoreSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    null.asInstanceOf[String],
    "",
    " ",
    "    ",
    "\t\t",
    "\t a \t",
    "a",
    "the",
    " the ",
    "the the the",
    "a a a",                       // overlap: replace consumes shared spaces
    "a a a a a a",
    "the\tthe\nthe\u000Bthe\fthe\rthe", // every Java \s class as separator
    "THE QUICK BROWN FOX",         // lowercase folding
    "Der die das und ist",
    "le la les et est",
    "el los de y es",
    "的是了在和 的的的",
    "of and is the a",
    "!!!???...,,,;;;:::",
    "a!b?c.d,e;f:g",
    "😀😀😀 the 😀😀😀",            // surrogate pairs: numChars vs UTF-16
    "\u00e9 e\u0301 \u00c9 the", // precomposed vs combining accent
    "İstanbul the IS",             // dotted capital I lowercase special
    "ẞ the ß",
    "x" * 19, "x" * 20, "x" * 99, "x" * 100, "x" * 2000, "x" * 2001,
    ("word " * 25).trim,           // len/toks band boundaries
    "und the und",
    "is es is es",                 // cross-language tie on shared markers
    "de de de",                    // 'de' is an es-marker word
    "  leading and trailing  ",
    "non breaking space the", // U+00A0 is NOT Java \s
    "mixed 中文 and english the of")

  private def frame = {
    val fixtureDocs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("text"))
    adversarial.toDF("text").unionByName(fixtureDocs)
  }

  test("quality_score kernel is bit-identical to the legacy tree") {
    val rows = frame.select(
        TextAnalysis.qualityScore(col("text")).as("neo"),
        TextAnalysis.legacyQualityScore(col("text")).as("legacy"),
        col("text"))
      .collect()
    val bad = rows.filter(r => r.getLong(0) != r.getLong(1))
    assert(bad.isEmpty, bad.take(5).map(r =>
      s"neo=${r.getLong(0)} legacy=${r.getLong(1)} " +
        s"text=${Option(r.getString(2)).map(_.take(60))}").mkString("; "))
  }

  test("lang_id kernel is bit-identical to the legacy tree") {
    val rows = frame.select(
        TextAnalysis.langId(col("text")).as("neo"),
        TextAnalysis.legacyLangId(col("text")).as("legacy"),
        col("text"))
      .collect()
    val bad = rows.filter(r => r.getString(0) != r.getString(1))
    assert(bad.isEmpty, bad.take(5).map(r =>
      s"neo=${r.getString(0)} legacy=${r.getString(1)} " +
        s"text=${Option(r.getString(2)).map(_.take(60))}").mkString("; "))
  }

  test("kernels survive interpreted eval (no-codegen path)") {
    // force the interpreted Expression.eval path the same values
    val texts = adversarial
    for (t <- texts) {
      val u = if (t == null) null
        else org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val q = TextScore.qualityScore(u)
      val l = TextScore.langId(u).toString
      assert(q >= 0 && q <= 100)
      assert(Seq("en", "de", "fr", "es", "zh", "und").contains(l))
    }
    assert(TextScore.qualityScore(null) == 0L)
    assert(TextScore.langId(null).toString == "und")
  }

  test("NULL text folds exactly like the legacy tree (0 / 'und')") {
    val r = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.langId(col("text")).as("l"),
        TextAnalysis.legacyQualityScore(col("text")).as("ql"),
        TextAnalysis.legacyLangId(col("text")).as("ll"))
      .collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(2) == 0L)
    assert(r.getString(1) == "und" && r.getString(3) == "und")
  }
}
