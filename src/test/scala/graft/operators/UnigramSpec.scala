package graft.operators

import graft.SparkSpec
import graft.functions.UnigramOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the unigram-LM tokenizer trainer: the Viterbi kernel's DP
  * contract (max score, smallest-length tie-break, UNK fallback), the
  * substring seeder's occurrence counting, single-char retention through
  * pruning, a token-conservation invariant, and end-to-end determinism.
  * The cross-engine proof of the E-step lives in the `txt_unigram` gate
  * (DuckDB replays the full DP from exported literal weights). */
class UnigramSpec extends SparkSpec {

  private def seg(word: String, wts: Map[String, Long],
      unk: Long = CorpusStats.UnigramUnk): Seq[String] = {
    val arr = UnigramOps.viterbi(UTF8String.fromString(word),
      UnigramOps.buildTable(wts, unk))
    (0 until arr.numElements()).map(i =>
      arr.getUTF8String(i).toString)
  }

  test("viterbi picks the max-likelihood segmentation") {
    val wts = Map("a" -> -50L, "b" -> -60L, "c" -> -55L,
      "ab" -> -10L, "abc" -> -15L)
    assert(seg("abc", wts) === Seq("abc"))     // whole word beats ab+c
    assert(seg("abab", wts) === Seq("ab", "ab"))
    assert(seg("cab", wts) === Seq("c", "ab"))
  }

  test("ties break to the smallest piece length") {
    // a+b scores -10, ab scores -10: dp equal, smallest L wins
    val wts = Map("a" -> -5L, "b" -> -5L, "ab" -> -10L)
    assert(seg("ab", wts) === Seq("a", "b"))
  }

  test("unknown single chars segment at the UNK weight") {
    val wts = Map("a" -> -5L, "b" -> -5L)
    assert(seg("axb", wts) === Seq("a", "x", "b"))
    // ...and a known multi-char piece spanning the unknown char wins when
    // its weight beats the UNK path
    val wts2 = Map("a" -> -5L, "b" -> -5L, "axb" -> -20L)
    assert(seg("axb", wts2) === Seq("axb"))
    assert(seg("", wts) === Seq.empty)
  }

  test("seed counts substring occurrences weighted by word count") {
    import spark.implicits._
    val words = Seq(("aaa", 2L), ("ba", 1L)).toDF("w", "cnt")
    val seed = CorpusStats.unigramSeed(words, "w", "cnt",
      maxPieceLen = 3, seedSize = 10).toMap
    // "aaa"×2: a×3→6, aa×2→4, aaa×1→2 ; "ba"×1: b→1, a→1, ba→1
    assert(seed("a") === 7L)
    assert(seed("aa") === 4L)
    assert(seed("aaa") === 2L)
    assert(seed("b") === 1L)
    assert(seed("ba") === 1L)
  }

  test("prune keeps every single char regardless of target size") {
    val pruned = CorpusStats.unigramPrune(
      Seq(("a", 1L), ("b", 2L), ("xy", 100L), ("yz", 50L), ("zw", 10L)),
      targetSize = 1)
    assert(pruned.toMap.keySet === Set("a", "b", "xy"))
  }

  test("viterbi ≡ exhaustive search over random words and vocabularies") {
    // brute force: enumerate EVERY segmentation of the word into known
    // pieces (unknown single chars at UNK), score, pick max with the
    // lexicographically-smallest piece-length vector as the tie-break —
    // which is exactly what ascending-L strict-> DP backtrace yields
    val unk = CorpusStats.UnigramUnk
    def brute(word: String, wts: Map[String, Long]): (Long, Seq[String]) = {
      if (word.isEmpty) return (0L, Seq.empty)
      (1 to math.min(4, word.length)).flatMap { l =>
        val piece = word.substring(0, l)
        val w = wts.get(piece) match {
          case Some(x) => Some(x)
          case None if l == 1 => Some(unk)
          case None => None
        }
        w.map { x =>
          val (rs, rp) = brute(word.substring(l), wts)
          (x + rs, piece +: rp)
        }
      }.maxBy { case (score, pieces) =>
        // max score; among ties prefer the segmentation the DP picks:
        // smallest piece length at every backtrace step (last piece
        // first). Encode reversed lengths so smaller length sorts HIGHER
        // ('9'-len); equal-sum length vectors can't be prefix-ties.
        (score, pieces.reverse.map(p => ('9' - p.length).toChar).mkString)
      }
    }
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val alpha = "abc"
      val word = (0 until 1 + rnd.nextInt(8))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      // random vocab: all single chars sometimes missing one, random
      // multi-char substrings with random negative weights
      val singles = alpha.filter(_ => rnd.nextDouble() > 0.2)
        .map(c => c.toString -> -(1L + rnd.nextInt(50))).toMap
      val multis = (0 until 6).map { _ =>
        val s = (0 until 2 + rnd.nextInt(3))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        s -> -(1L + rnd.nextInt(80)).toLong
      }.toMap
      val wts = singles ++ multis
      val got = seg(word, wts)
      val (bs, bp) = brute(word, wts)
      val gotScore = got.map(p => wts.getOrElse(p,
        if (p.length == 1) unk else fail(s"unknown multi piece $p"))).sum
      assert(got.mkString("|") === bp.mkString("|") && gotScore === bs,
        s"word=$word wts=$wts dp=$got brute=$bp")
    }
  }

  test("segmentCorpus: per-doc word and piece counts") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd"), (2L, "ab"), (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    // 'ab' is a piece; 'c'/'d' segment as singles
    val wts = Map("a" -> -5L, "b" -> -5L, "c" -> -5L, "d" -> -5L,
      "ab" -> -6L)
    val out = CorpusStats.unigramSegmentCorpus(docs, "text", "doc_id", wts)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: words [ab, ab, cd] → pieces [ab][ab][c,d] = 4
    assert(out.toSeq === Seq((1L, 3L, 4L), (2L, 1L, 1L), (4L, 0L, 0L)))
  }

  test("trainer: conservation, piece emergence, determinism") {
    import spark.implicits._
    // 'data' dominates — EM should surface it (or its ≤4-char substrings)
    val words = Seq(("data", 80L), ("date", 10L), ("ate", 5L), ("up", 3L))
      .toDF("w", "cnt")
    def run() = {
      val (wts, out) = CorpusStats.unigramTrain(words, "w", "cnt",
        maxPieceLen = 4, seedSize = 12, targetSize = 4, emRounds = 2)
      (wts, out.orderBy(col("uses").desc, col("piece")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    }
    val (wts, rows) = run()
    // conservation: every char of every word lands in exactly one piece
    val charIn = rows.map { case (p, uses, _) => p.length.toLong * uses }.sum
    val charOut = Seq(("data", 80L), ("date", 10L), ("ate", 5L), ("up", 3L))
      .map { case (w, c) => w.length * c }.sum
    assert(charIn === charOut)
    // the dominant whole word is a surviving piece used by its own word
    assert(rows.exists { case (p, uses, _) => p == "data" && uses >= 80L })
    // exported weights cover every emitted piece (the oracle's lookup
    // table must be total over the final segmentation)
    assert(rows.forall { case (p, _, _) => wts.contains(p) })
    // determinism: training twice yields identical artifacts
    val (wts2, rows2) = run()
    assert(wts === wts2)
    assert(rows === rows2)
  }
}
