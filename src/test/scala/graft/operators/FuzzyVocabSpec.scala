package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the endpoint-char blocking of the fuzzy vocabulary join: the
  * blocked miner must find EXACTLY the brute-force edit-distance-1 pair
  * set, including the adversarial edit positions the completeness
  * argument enumerates (first-char substitution, last-char substitution,
  * front insert/delete, end insert/delete, 1-char↔1-char pairs). */
class FuzzyVocabSpec extends SparkSpec {
  import spark.implicits._

  test("blocked miner equals brute force, all edit positions covered") {
    // one doc per word keeps counts at 1 and the vocab explicit
    val words = Seq(
      "cat", "bat",        // first-char substitution (c1 differs, cL block)
      "cap",               // last-char substitution vs cat (c1 block)
      "scat",              // front insert vs cat (cL block)
      "cats",              // end insert vs cat (c1 block)
      "at",                // front delete vs cat / bat
      "ca",                // end delete vs cat
      "x", "y",            // 1-char pair (neither endpoint shared)
      "dog", "unrelatedlongtoken")
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val mined = CorpusStats.fuzzyVocabPairs(docs, "text")
      .select("tok_a", "tok_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val brute = (for {
      a <- words; b <- words if a < b
      if levenshteinDist(a, b) <= 1
    } yield (a, b)).toSet
    assert(mined === brute)
    // sanity on the enumeration: every documented edit position is present
    for (p <- Seq(("bat", "cat"), ("cap", "cat"), ("cat", "scat"),
        ("cat", "cats"), ("at", "cat"), ("ca", "cat"), ("x", "y")))
      assert(brute.contains(p), s"fixture lost case $p")
  }

  test("string connected components label by lexicographic minimum") {
    val edges = Seq(("b", "a"), ("c", "b"), ("y", "x"))
      .toDF("tok_a", "tok_b")
    val labels = Dedup.connectedComponentsString(edges, "tok_a", "tok_b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(labels === Set(("a", "a"), ("b", "a"), ("c", "a"),
      ("x", "x"), ("y", "x")))
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
