package graft.operators

import graft.SparkSpec
import graft.functions.NfcNormalize
import org.apache.spark.sql.functions._

/** Gopher-style repetition signals + NFC normalization: hand-computed
  * expectations on tiny documents (the sf gates pin the same kernels
  * against DuckDB corpus-wide). */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(text: String): (Double, Double, Double) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val cols = TextAnalysis.lineRepetitionStats(col("text"))
      .map { case (n, c) => c.as(n) }
    val r = df.select(cols :+
      TextAnalysis.topBigramCharFrac(Dedup.normalized(col("text")))
        .as("tb"): _*).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2))
  }

  test("duplicate-line fractions: half the lines, weighted by chars") {
    // 4 non-empty lines; "dup" appears twice (2 dup lines of 3 chars each);
    // "unique-one" (10) and "longer unique line" (18) are singletons
    val (fl, fc, _) = statsOf("dup\nunique-one\ndup\n\nlonger unique line")
    assert(fl === 0.25) // 4 lines, 1 is a repeat of an earlier one
    assert(fc === math.rint(6.0 / 34.0 * 1e6) / 1e6) // 6 dup chars / 34
  }

  test("no duplicates -> zero line fractions; empty doc -> zeros not NaN") {
    // top-bigram: "a b c" -> singleton bigram "a b" (or "b c") covers 3/5
    assert(statsOf("a\nb\nc") === ((0.0, 0.0, 0.6)))
    assert(statsOf("") === ((0.0, 0.0, 0.0)))
  }

  test("top-bigram coverage: repeated bigram dominates") {
    // norm = "spam ham spam ham spam" (22 chars); bigrams sorted:
    // "ham spam"×2, "spam ham"×2 -> best = 2*8 = 16
    val (_, _, tb) = statsOf("spam ham spam ham spam")
    assert(tb === math.rint(16.0 / 22.0 * 1e6) / 1e6)
  }

  test("single-word and empty docs have zero bigram coverage") {
    assert(statsOf("word")._3 === 0.0)
  }

  test("nfc_normalize composes decomposed sequences, fast-path intact") {
    val df = Seq(
      ("café", 4), // e + combining acute composes to é (5 cps -> 4)
      ("plain ascii", 11),
      ("café", 4)       // already NFC: untouched
    ).toDF("s", "want")
    val got = df.select(
      length(NfcNormalize.nfcNormalize(col("s"))).as("n"), col("want"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // SQL registration path (GraftExtensions)
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT length(nfc_normalize('café'))")
      .head().getInt(0)
    assert(viaSql === 4)
  }

  test("null text: null nfc, zero fractions (matches the oracle CASE)") {
    val df = Seq((1L, null: String)).toDF("doc_id", "text")
    val r = df.select(
      NfcNormalize.nfcNormalize(col("text")).as("n"),
      TextAnalysis.topBigramCharFrac(Dedup.normalized(col("text"))).as("tb"))
      .head()
    assert(r.isNullAt(0) && r.getDouble(1) === 0.0)
  }
}
