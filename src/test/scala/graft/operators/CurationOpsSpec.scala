package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "The quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "The quick brown fox jumps over a lazy dog!"),  // near dup of 1
    (4L, "Completely different content about spark engines and shuffles"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per fingerprint") {
    val out = Dedup.exact(
      docs.withColumn("fp", Dedup.fingerprint(col("text"))),
      col("fp"), col("doc_id"))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L, 5L)) // 2 deduped into 1
  }

  test("payload-light exact dedup matches the window form (incl. schema)") {
    val fp = docs.withColumn("fp", Dedup.fingerprint(col("text")))
    val win = Dedup.exact(fp, col("fp"), col("doc_id"))
    val light = Dedup.exactPayloadLight(fp, col("fp"), col("doc_id"))
    assert(light.schema.fieldNames.toSeq === win.schema.fieldNames.toSeq)
    val k = (df: org.apache.spark.sql.DataFrame) =>
      df.select("doc_id", "text", "fp").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    assert(k(light) === k(win))
  }

  test("minhash LSH finds the near-dup pair, not the distinct one") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id",
      k = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("null-text docs emit no signature row and never pair with each other") {
    val withNulls = docs.union(
      Seq((10L, null: String), (11L, null: String)).toDF("doc_id", "text"))
    val sigs = Dedup.minhashSignatures(withNulls, "text", "doc_id",
      k = 3, numHashes = 8)
    assert(!sigs.select("_id").collect().map(_.getLong(0)).toSet
      .exists(id => id == 10L || id == 11L))
    // before the filter, both NULL docs banded identically (xxhash64 skips
    // null inputs) and mined a spurious est=1.0 pair
    val pairs = Dedup.minhashPairs(withNulls, "text", "doc_id",
      k = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs.exists(p => p._1 >= 10L || p._2 >= 10L))
  }

  test("minhash kernel signatures equal the explode/min-aggregate formulation") {
    // multibyte text exercises the UTF-8 byte-offset walk; "" the empty
    // shingle; short docs the whole-string shingle
    val corpus = docs.union(Seq(
      (6L, "中文 文本 去重 測試 中文 文本"),
      (7L, "ab"),
      (8L, "héllo wörld héllo"),
      (9L, null)).toDF("doc_id", "text")) // NULL text: excluded by policy
    for (k <- Seq(3, 5)) {
      val kernel = Dedup.minhashSignatures(corpus, "text", "doc_id",
        k = k, numHashes = 8)
        .collect().map(r => r.getLong(0) ->
          (1 to 8).map(j => r.getLong(j)).toSeq).toMap
      // the former formulation (explode char shingles, min-agg) over the
      // same null-filtered corpus: un-filtered it emitted a [null]-shingle
      // row for null text whose min-agg was the per-seed constant hash —
      // every null doc identical, the exact spurious-pair shape the
      // isNotNull policy in minhashSignatures exists to prevent
      val normed = corpus.filter(col("text").isNotNull)
        .select(col("doc_id").as("_id"),
          split(Dedup.normalized(col("text")), "").as("_chars"))
        .repartition(col("_id"))
      val exploded = normed
        .select(col("_id"), explode(
          transform(sequence(lit(0), greatest(size(col("_chars")) - k, lit(0))),
            i => array_join(slice(col("_chars"), i + lit(1), lit(k)), ""))).as("_s"))
      val minCols = (0 until 8).map(j =>
        min(xxhash64(col("_s"), lit(j))).as(s"_h$j"))
      val reference = exploded.groupBy(col("_id")).agg(minCols.head, minCols.tail: _*)
        .collect().map(r => r.getLong(0) ->
          (1 to 8).map(j => r.getLong(j)).toSeq).toMap
      assert(kernel === reference, s"signature mismatch at k=$k")
    }
  }

  test("packed minhash pipeline equals the flat formulation end-to-end") {
    val corpus = docs.union(Seq(
      (6L, "中文 文本 去重 測試 中文 文本"),
      (7L, "ab"),
      (8L, "héllo wörld héllo"),
      (9L, null)).toDF("doc_id", "text"))
    // lanes of the packed signature == the flat _h columns
    val flat = Dedup.minhashSignatures(corpus, "text", "doc_id",
        k = 3, numHashes = 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    val packed = Dedup.minhashSignaturesPacked(corpus, "text", "doc_id",
        k = 3, numHashes = 8).collect()
      .map { r =>
        val b = r.getAs[Array[Byte]](1)
        r.getLong(0) -> (0 until 8).map(j =>
          org.apache.spark.unsafe.Platform.getLong(b,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + 8L * j)).toSeq
      }.toMap
    assert(packed === flat)
    // mined pairs + estimates equal too (band keys are the same xxhash
    // fold; agreement the same lane count)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val flatPairs = pairSet(Dedup.minhashPairsFromSignatures(
      Dedup.minhashSignatures(corpus, "text", "doc_id", 3, 32),
      numHashes = 32, bands = 8, threshold = 0.3))
    val packedPairs = pairSet(Dedup.minhashPairsFromPackedSignatures(
      Dedup.minhashSignaturesPacked(corpus, "text", "doc_id", 3, 32),
      numHashes = 32, bands = 8, threshold = 0.3))
    assert(packedPairs === flatPairs && flatPairs.nonEmpty)
  }

  test("simhash kernel sketches equal the explode/bit-sum formulation") {
    val corpus = docs.union(Seq(
      (6L, "中文 文本 去重 測試 中文 文本"),
      (7L, "single"),
      (8L, "héllo wörld héllo")).toDF("doc_id", "text"))
    val kernel = Dedup.simhashSketches(corpus, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the former formulation, verbatim
    val exploded = corpus
      .select(col("doc_id").as("_id"), Dedup.normalized(col("text")).as("_norm"))
      .repartition(col("_id"))
      .select(col("_id"), explode(Dedup.tokensOf(col("_norm"))).as("_t"))
      .select(col("_id"), xxhash64(col("_t")).as("_th"))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftrightunsigned(col("_th"), i).bitwiseAND(lit(1L)) === 1L,
        lit(1L)).otherwise(lit(-1L))).as(s"_b$i"))
    val reference = exploded.groupBy(col("_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("_id"),
        (0 until 64).map(i =>
          when(col(s"_b$i") > 0, lit(1L << (63 - i)))
            .otherwise(lit(0L))).reduce((a, b) => a.bitwiseOR(b)).as("_h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel === reference) // same sketches AND same row set (doc 5 dropped)
    assert(!kernel.contains(5L))
  }

  test("simhash: identical docs distance 0, related docs close") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.isDefined && exact.get._3 === 0)
  }

  test("gramHashes kernel equals hashes of the gramsOf string bigrams") {
    val corpus = docs.union(Seq(
      (6L, "中文 文本 去重 測試 中文 文本"),
      (7L, "single"),
      (8L, "a b a b a")).toDF("doc_id", "text"))
    for (n <- Seq(2, 3)) {
      val kernel = corpus.select(col("doc_id"),
          graft.functions.SketchExpressions.gramHashes(
            Dedup.normalized(col("text")), n).as("_g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val reference = corpus
        .select(col("doc_id"),
          Dedup.tokensOf(Dedup.normalized(col("text"))).as("_toks"))
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          transform(Dedup.gramsOf(col("_toks"), n), g => xxhash64(g)).as("_g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      assert(kernel === reference, s"gram hash mismatch at n=$n")
    }
  }

  test("ngram jaccard of identical token arrays is 1") {
    val g = docs.withColumn("_norm", Dedup.normalized(col("text")))
      .withColumn("_toks", Dedup.tokensOf(col("_norm")))
      .withColumn("_g", Dedup.gramsOf(col("_toks"), 2))
    val row = g.filter(col("doc_id") === 1).select(col("_g")).collect()(0)
    val sim = g.filter(col("doc_id") === 2)
      .select(Dedup.jaccard(col("_g"),
        lit(row.getSeq[String](0).toArray)).as("j"))
      .collect()(0).getDouble(0)
    assert(sim === 1.0)
  }

  test("cosine similarity: orthogonal=0, identical=1") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(2.0f, 0.0f))
    ).toDF("id", "v")
    val got = df.select(col("id"),
      round(Similarity.cosine(col("v"), array(lit(1.0f), lit(0.0f))), 6).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 1.0 && got(2L) === 0.0 && got(3L) === 1.0)
  }

  test("brute-force topk returns k best by cosine with id tiebreak") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(df, "embedding", "vec_id",
      Seq(1.0, 0.0), 2).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("token count, langid, quality are deterministic and sane") {
    val r = docs.filter(col("doc_id") === 1).select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("q"))
      .collect()(0)
    assert(r.getInt(0) === 9)
    assert(r.getString(1) === "en") // two "the"
    assert(r.getLong(2) >= 40 && r.getLong(2) <= 100)
    val empty = docs.filter(col("doc_id") === 5).select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.langId(col("text"))).collect()(0)
    assert(empty.getInt(0) === 0 && empty.getString(1) === "und")
  }

  test("multimodal plumbing: payload → decode → resize → frames → features") {
    val media = Multimodal.syntheticPayload(docs.filter(length(col("text")) > 0),
      "doc_id", "text")
    def pipeline() = Multimodal.extractFeatures(Multimodal.frameSample(
      Multimodal.resizeStub(Multimodal.decodeStub(media), maxW = 100, maxH = 100)))
    val out = pipeline()
    val r = out.collect()
    assert(r.length === 4)
    assert(out.columns.contains("features") && out.columns.contains("frames"))
    val feats = r.head.getAs[scala.collection.Seq[Double]]("features").toSeq
    assert(feats.size === 8 && feats.forall(v => v >= 0.0 && v <= 1.0))
    // resize: fits the box, preserves aspect ratio, decimates the payload
    r.foreach { row =>
      val (w, h) = (row.getAs[Int]("width"), row.getAs[Int]("height"))
      val (ow, oh) = (row.getAs[Int]("out_width"), row.getAs[Int]("out_height"))
      assert(ow <= 100 && oh <= 100 && ow >= 1 && oh >= 1)
      assert(ow <= w && oh <= h)
      if (w > 100 || h > 100) { // scaled: ratio preserved within floor error
        val scale = math.min(100.0 / w, 100.0 / h)
        assert(ow === math.max(1, math.floor(w * scale).toInt))
        assert(oh === math.max(1, math.floor(h * scale).toInt))
        assert(row.getAs[Array[Byte]]("resized").length <=
          row.getAs[Array[Byte]]("payload").length)
      } else { // fits already: untouched
        assert(ow === w && oh === h)
        assert(row.getAs[Array[Byte]]("resized").toSeq ===
          row.getAs[Array[Byte]]("payload").toSeq)
      }
    }
    // deterministic across runs
    val again = pipeline()
      .collect().head.getAs[scala.collection.Seq[Double]]("features").toSeq
    assert(again === feats)
  }

  test("real PNG loop: generate → decode header → resize → re-decode") {
    val ids = Seq(0L, 7L, 31L, 40L, 299L).toDF("doc_id")
    val png = Multimodal.pngPayload(ids, "doc_id")
    val dec = Multimodal.decodeImage(png)
    val rows = dec.collect().map(r => r.getLong(0) ->
      (r.getAs[Int]("img_width"), r.getAs[Int]("img_height"),
        r.getAs[String]("img_format"), r.getAs[Boolean]("img_ok"))).toMap
    for ((id, (w, h, fmt, ok)) <- rows) {
      assert(ok && fmt == "png", s"id $id")
      assert(w == 16 + (id % 32) && h == 8 + (id % 16), s"id $id: ${w}x$h")
    }
    // resize into 10×10 and re-decode: dimensions must read back scaled
    val rs = Multimodal.resizeImage(dec, maxW = 10, maxH = 10)
    val rdec = Multimodal.decodeImage(rs, payloadCol = "resized", prefix = "r_")
    for (r <- rdec.collect()) {
      val (w, h) = (r.getAs[Int]("img_width"), r.getAs[Int]("img_height"))
      val sc = math.min(1.0, math.min(10.0 / w, 10.0 / h))
      assert(r.getAs[Boolean]("r_ok"))
      assert(r.getAs[Int]("r_width") ==
        math.max(1, math.floor(w * sc).toInt))
      assert(r.getAs[Int]("r_height") ==
        math.max(1, math.floor(h * sc).toInt))
    }
    // garbage bytes don't kill the task — they report ok=false
    val junk = Seq((1L, Array[Byte](1, 2, 3), "image"))
      .toDF("media_id", "payload", "media_type")
    val jr = Multimodal.decodeImage(junk).collect()(0)
    assert(!jr.getAs[Boolean]("img_ok") && jr.get(jr.fieldIndex("img_width")) == null)
  }

  test("exactJaccardPairs (join-aggregate shape) agrees with array path") {
    val grams = docs.filter(length(col("text")) > 0)
      .withColumn("_norm", Dedup.normalized(col("text")))
      .withColumn("_toks", Dedup.tokensOf(col("_norm")))
      .withColumn("_grams", Dedup.gramsOf(col("_toks"), 2))
      .select(col("doc_id"), col("_grams"))
    val ids = grams.select("doc_id").collect().map(_.getLong(0)).sorted
    val pairs = ids.combinations(2).map(x => (x(0), x(1))).toSeq
      .toDF("id_a", "id_b")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) -> math.rint(r.getDouble(2) * 1e9)
    val viaJoin = Dedup.exactJaccardPairs(pairs, grams).collect().map(key).toMap
    val a = grams.select(col("doc_id").as("id_a"), col("_grams").as("g_a"))
    val b = grams.select(col("doc_id").as("id_b"), col("_grams").as("g_b"))
    val viaArr = pairs.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("g_a"), col("g_b")).as("j"))
      .collect().map(key).toMap
    assert(viaJoin === viaArr)
  }

  test("rolling fingerprint: equal content ⇒ equal fp; stable under punct") {
    val fps = docs.withColumn("_norm", Dedup.normalized(col("text")))
      .select(col("doc_id"), TextAnalysis.rollingFingerprintOf(col("_norm")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(4L))
  }

  test("collapseRepeatTokens drops immediate repeats, keeps distant ones") {
    val rows = Seq(
      (1L, "the the quick quick quick fox"),
      (2L, "a b a b"),            // alternation is NOT a repeat run
      (3L, "  spaced   out  out "),
      (4L, "solo"),
      (5L, "")
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.collapseRepeatTokens(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) === "the quick fox")
    assert(rows(2L) === "a b a b")
    assert(rows(3L) === "spaced out")
    assert(rows(4L) === "solo")
    assert(rows(5L) === "")
  }

  test("cross-corpus minhash: new-vs-base hits only, both directions excluded") {
    val corpus = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),   // base
      (2L, "The quick brown fox jumps over the lazy dog"),   // new: dup of 1
      (3L, "Completely different content about spark"),      // base
      (4L, "Entirely unrelated words in this one here"),     // new: clean
      (5L, "Entirely unrelated words in this one here")      // new: dup of 4 (same slice!)
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignaturesPacked(corpus, "text", "doc_id",
      k = 3, numHashes = 32)
    val hits = Dedup.crossMinhashPairsFromPackedSignatures(
        newSigs = sigs.filter(col("_id").isin(2L, 4L, 5L)),
        baseSigs = sigs.filter(col("_id").isin(1L, 3L)),
        numHashes = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSeq === Seq((2L, 1L))) // 4↔5 are both NEW: not reported
  }

  test("gramRarity counts hapax and corpus frequencies per doc") {
    val corpus = Seq(
      (1L, "a b c"),        // gram "a b c" appears in docs 1 and 2
      (2L, "a b c"),
      (3L, "x y z"),        // hapax gram
      (4L, null: String)    // excluded
    ).toDF("doc_id", "text")
    val out = CorpusStats.gramRarity(corpus, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ((1L, 0L, 2L, 2L))) // 1 gram, 0 hapax, freq 2
    assert(out(2L) === ((1L, 0L, 2L, 2L)))
    assert(out(3L) === ((1L, 1L, 1L, 1L))) // its gram is corpus-unique
    assert(!out.contains(4L))
  }

  test("dedupeUnits keeps the first occurrence of each paragraph, in order") {
    val doc = "intro text\n\nbody A\n\nintro text\n\nbody B\n\n\n\nbody A"
    val out = Seq((1L, doc)).toDF("doc_id", "text")
      .select(TextAnalysis.dedupeUnits(col("text")).as("c"))
      .collect()(0).getString(0)
    assert(out === "intro text\n\nbody A\n\nbody B")
  }

  test("connectedComponents labels chains, stars, and ignores self-loops") {
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (5L, 4L), // chain 1-2-3-4-5
      (11L, 10L), (10L, 11L),                 // pair, both orientations
      (7L, 7L)                                // self-loop: ignored
    ).toDF("a", "b")
    val labels = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents converges in O(log n) rounds on a 64-chain") {
    // Worst case for naive min-propagation (O(n) rounds); the star rounds
    // must collapse it logarithmically.
    val edges = scala.util.Random.shuffle(
        (0L until 63L).map(i => (i, i + 1L)))
      .toDF("a", "b")
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(edges, "a", "b", maxRounds = 50)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L to 63L).map(_ -> 0L).toMap)
    assert(rounds <= 12, s"expected O(log n) convergence, took $rounds rounds")
  }

  test("connectedComponents on an empty edge set returns no labels") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(edges, "a", "b").count() === 0L)
  }

  test("redactPii replaces emails, IPs, and phones with typed tokens") {
    val cases = Seq(
      (1L, "mail bob.smith+tag@sub.example.org now",
        "mail <EMAIL> now"),
      (2L, "server at 192.168.0.1 responded", "server at <IP> responded"),
      (3L, "call +44 20 7946 0958 today", "call <PHONE> today"),
      (4L, "or 555-867-5309 works", "or <PHONE> works"),
      (5L, "no pii here at all", "no pii here at all"),
      // version strings: 1.2.3 is NOT an IP (needs 4 octets)
      (6L, "spark 3.5.1 released", "spark 3.5.1 released"),
      (7L, "a@b.co and 10.0.0.7 and +1 555 0100",
        "<EMAIL> and <IP> and <PHONE>")
    ).toDF("id", "text", "expect")
    val out = cases.select(col("id"), col("expect"),
        TextAnalysis.redactPii(col("text")).as("got"))
      .collect()
    out.foreach(r => assert(r.getString(2) === r.getString(1),
      s"case ${r.getLong(0)}"))
  }

  test("piiCounts counts what redaction removes — nested matches once") {
    val df = Seq(Tuple1("x@y.io mail z@w.dev at 1.2.3.4 call 555-123-4567 done"))
      .toDF("text")
    val counts = TextAnalysis.piiCounts(col("text"))
    val row = df.select(counts.map { case (n, c) => c.as(n) }: _*).collect()(0)
    assert(row.getLong(0) === 2L) // emails
    assert(row.getLong(1) === 1L) // ips
    assert(row.getLong(2) === 1L) // phones
    // a phone-shaped substring INSIDE an email counts as the email only:
    // the counts must agree with what redactPii actually replaces
    val nested = Seq(Tuple1("reach 123-456-7890@example.com now")).toDF("text")
    val r2 = nested.select(
      TextAnalysis.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) === ((1L, 0L, 0L)))
  }

  test("bm25 matches a hand-computed score and ranks term-bearing docs first") {
    val corpus = Seq(
      (1L, "spark spark engine"),   // tf(spark)=2, dl=3
      (2L, "spark only here"),      // tf=1, dl=3
      (3L, "nothing relevant at all"), // tf=0, dl=4
      (4L, null: String)
    ).toDF("doc_id", "text")
    val out = CorpusStats.bm25(corpus, "text", "doc_id", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, df=2, avgdl=10/3; idf=ln(1+(3-2+0.5)/(2+0.5))=ln(1.6)
    val idf = math.log(1.6)
    def s(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (10.0 / 3.0)))
    assert(math.abs(out(1L) - s(2, 3)) < 1e-6)
    assert(math.abs(out(2L) - s(1, 3)) < 1e-6)
    assert(out(3L) === 0.0)
    assert(!out.contains(4L))
    assert(out(1L) > out(2L) && out(2L) > out(3L))
  }

  test("quantileBandFilter trims both tails; approx and exact agree here") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val exact = TextAnalysis.quantileBandFilter(df, "score", 0.1, 0.9,
      exact = true).select("id").collect().map(_.getLong(0)).sorted
    // p10 of 1..100 (linear interp) = 10.9, p90 = 90.1 → keep 11..90
    assert(exact.head === 11L && exact.last === 90L && exact.length === 80)
    val approx = TextAnalysis.quantileBandFilter(df, "score", 0.1, 0.9)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(approx.nonEmpty && approx.length <= 82 && approx.length >= 78)
  }

  test("stripBoilerplate removes corpus-wide lines, keeps order and empties") {
    val corpus = Seq(
      (1L, "HEADER\nalpha\nFOOTER"),
      (2L, "HEADER\nbeta\n\ngamma\nFOOTER"),
      (3L, "HEADER\ndelta\nFOOTER"),
      (4L, "HEADER\nHEADER\nepsilon"), // repeated boilerplate inside one doc
      (5L, "HEADER\nFOOTER")           // nothing survives
    ).toDF("doc_id", "text")
    val out = CorpusStats.stripBoilerplate(corpus, "text", "doc_id", minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) === (("alpha", 2L)))
    assert(out(2L) === (("beta\n\ngamma", 2L))) // empty line kept
    assert(out(4L) === (("epsilon", 2L)))       // both HEADER copies removed
    assert(out(5L) === (("", 2L)))              // fully-boilerplate doc remains, empty
  }

  test("writeShards: manifest certifies the written files, assignment deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = (1L to 200L).toDF("doc_id")
    val m1 = Export.writeShards(spark, df, "doc_id", nShards = 4, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m1.keys.forall(s => s >= 0 && s < 4))
    assert(m1.values.map(_._1).sum === 200L)
    assert(m1.values.map(_._2).sum === (1L to 200L).sum)
    // deterministic: a rewrite lands every row in the same shard
    val m2 = Export.writeShards(spark, df, "doc_id", nShards = 4, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m1 === m2)
  }

  test("semanticOverlap flags the near-identical vector, not the orthogonal one") {
    val train = Seq(
      (1L, Seq(1.0f, 0.02f, 0.0f)), // ~parallel to eval → contaminated
      (2L, Seq(0.0f, 1.0f, 0.0f)),  // orthogonal → clean
      (3L, Seq(0.0f, 0.0f, 0.0f))   // zero norm → dropped
    ).toDF("vec_id", "embedding")
    val out = Decontam.semanticOverlap(train,
        Seq(10L -> Array(1.0, 0.0, 0.0)), "embedding", "vec_id",
        threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(out(1L)._2 === 1 && out(1L)._1 > 0.99)
    assert(out(2L) === ((0.0, 0)))
    assert(!out.contains(3L))
  }

  test("wavPayload/decodeAudio: real WAV roundtrip; poison rows land ok=false") {
    val ids = Seq(5L, 6L, 97L * 2).toDF("doc_id") // 194 % 97 == 0 → poison
    val dec = Multimodal.decodeAudio(Multimodal.wavPayload(ids, "doc_id"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)),
          Option(r.get(6)), r.getBoolean(7))).toMap
    // id 5: 2 channels... 1 + 5%2 = 2; frames 100+5%400=105
    assert(dec(5L) === ((Some(8000), Some(2), Some(105L),
      Some(105L * 125), true)))
    assert(dec(6L) === ((Some(8000), Some(1), Some(106L),
      Some(106L * 125), true)))
    assert(dec(194L) === ((None, None, None, None, false)))
  }

  test("vocabTopK ranks by frequency with deterministic ties") {
    val corpus = Seq(
      (1L, "b b b a a c"), (2L, "a c d")).toDF("doc_id", "text")
    val v = CorpusStats.vocabTopK(corpus, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // a:3, b:3 (tie → a first), c:2
    assert(v.toSeq === Seq(("a", 3L, 1), ("b", 3L, 2), ("c", 2L, 3)))
  }

  test("bigramLift scores adjacent pairs; single-token docs contribute none") {
    val corpus = Seq(
      (1L, "new york"), (2L, "new york"), (3L, "new jersey"),
      (4L, "solo")).toDF("doc_id", "text")
    val out = CorpusStats.bigramLift(corpus, "text", k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // n_tokens=7; c(new york)=2, c(new)=3, c(york)=2 → 7*2/(3*2)
    assert(out("new york")._1 === 2L)
    assert(out("new york")._2 === 2.333333) // 7*2/(3*2), rounded to 6dp
    assert(out("new jersey")._1 === 1L)
    assert(out.size === 2) // "solo" yields no bigram
  }

  test("spanDedup removes repeated chunks except the global first occurrence") {
    val corpus = Seq(
      (1L, "AAAABBBBCCCC"),  // unique chunks except AAAA (global first here)
      (2L, "AAAAXXXXAAAA"),  // loses both AAAA copies (cross- and within-doc)
      (3L, "ZZ"),            // short tail chunk, unique
      (4L, ""),              // empty text → zero chunks
      (5L, null: String))    // null text → no output row
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(corpus, "text", "doc_id", window = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) === (("AAAABBBBCCCC", 3L, 0L)))
    assert(out(2L) === (("XXXX", 3L, 2L)))
    assert(out(3L) === (("ZZ", 1L, 0L)))
    assert(out(4L) === (("", 0L, 0L)))
    assert(out.size === 4)
  }

  test("lmScore: all three stupid-backoff branches, fixed-point exact") {
    val corpus = Seq(
      (1L, "a b"), (2L, "a b a"),   // train: c1(a)=3 c1(b)=2 tot=5;
                                    // c2(a b)=2, c2(b a)=1
      (3L, "a b c a"),              // held out: seen pair + OOV-y + unseen-x
      (4L, "solo"))                 // single token → no pairs
      .toDF("doc_id", "text")
    val out = CorpusStats.lmScore(corpus, "text", "doc_id",
        train = col("doc_id") <= 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def fp(p: Double) = math.floor(p * 1e9).toLong
    val pab = fp(2.0 / 3.0)             // branch 1: c2/c1(x)
    assert(out(1L) === ((1L, pab, 0L)))
    assert(out(2L) === ((2L, pab + fp(1.0 / 2.0), 0L)))
    val pbc = fp(0.4 * (1.0 / 5.0))     // branch 3: y=c OOV
    val pca = fp(0.4 * (3.0 / 5.0))     // branch 2: unseen bigram, seen y=a
    assert(out(3L) === ((3L, pab + pbc + pca, 1L)))
    assert(out(4L) === ((0L, 0L, 0L)))
  }

  test("clusterKeepOne keeps singletons and one representative per cluster") {
    val ids = (1L to 8L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.clusterKeepOne(ids, "doc_id", pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(kept === Seq((1L, 1L, 3L), (4L, 4L, 1L), (5L, 5L, 2L),
      (7L, 7L, 1L), (8L, 8L, 1L)))
  }

  test("orderShuffle: dense per-shard positions, seed-reproducible, " +
      "seed-sensitive") {
    val ids = (1L to 200L).toDF("id")
    def run(seed: Long) = Sampling.orderShuffle(ids, col("id"), seed,
        shardHexDigits = 1)
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val a = run(7)
    assert(a.length === 200)
    for ((_, rows) <- a.groupBy(_._2)) {
      val ps = rows.map(_._3).sorted.toSeq
      assert(ps === (1L to ps.length).toSeq, "positions not dense per shard")
    }
    assert(run(7).toSet === a.toSet, "same seed must reproduce")
    val b = run(8)
    assert(a.map(r => (r._1, r._2)).toSeq !== b.map(r => (r._1, r._2)).toSeq,
      "different seed must permute differently")
  }

  test("temperatureMixture: rare class kept whole above rate 1, head " +
      "downsampled near its target") {
    // z = 900^0.5 + 100^0.5 = 40; r_a = 500·(30/40)/900 ≈ 0.4167,
    // r_b = 500·(10/40)/100 = 1.25 → capped at 1 (keep all of b)
    val df = ((1 to 900).map(i => (i.toLong, "a")) ++
      (1001 to 1100).map(i => (i.toLong, "b"))).toDF("id", "cls")
    val n = Sampling.temperatureMixture(df, col("id"), col("cls"),
        alpha = 0.5, budget = 500L)
      .groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("b") === 100L)
    assert(n("a") > 300L && n("a") < 450L, s"got ${n("a")}, expected ≈375")
    // α = 1 is plain proportional sampling: every class at budget/total
    val u = Sampling.temperatureMixture(df, col("id"), col("cls"),
        alpha = 1.0, budget = 500L)
      .groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(u("b") < 100L, "α=1 must NOT keep the rare class whole")
  }

  test("bpeSegment applies merges greedily; unmerged words count chars") {
    // merges (a,a) then (aa,a): "aaa"→1 symbol, "aab"→2 (aa,b), "ba"→2
    val docs = Seq((1L, "aaa aab"), (2L, "ba"), (3L, null: String))
      .toDF("doc_id", "text")
    val out = CorpusStats.bpeSegment(docs, "text", "doc_id",
        Seq(("a", "a"), ("aa", "a")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) === ((2L, 3L))) // aaa=1 sym + aab=2 syms
    assert(out(2L) === ((1L, 2L)))
    assert(out.size === 2) // null text drops entirely
  }

  test("topKPerClass keeps the k best per class with deterministic ties") {
    val df = Seq((1L, "x", 10), (2L, "x", 30), (3L, "x", 30), (4L, "x", 5),
      (5L, "y", 1)).toDF("id", "cls", "score")
    val kept = Sampling.topKPerClass(df, col("cls"), col("score"),
        col("id"), k = 2)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(2L, 3L, 5L)) // ties broken by id; y has only one
  }

  test("MJPEG-in-AVI: container round-trip, every=1 sampling, poison and " +
      "truncation yield ok=false") {
    val ids = (1L to 12L).toDF("doc_id") // 12 < 89: no natural poison
    val avi = Multimodal.aviPayload(ids, "doc_id")
    val dec = Multimodal.decodeVideo(avi, every = 1)
    for (r <- dec.collect()) {
      val id = r.getLong(r.fieldIndex("media_id"))
      assert(r.getBoolean(r.fieldIndex("vid_ok")), s"id=$id")
      val frames = 1 + (id % 4).toInt
      val (w, h) = (16 + (id % 16).toInt, 8 + (id % 8).toInt)
      assert(r.getInt(r.fieldIndex("vid_frames")) === frames, s"id=$id")
      assert(r.getInt(r.fieldIndex("vid_width")) === w)
      assert(r.getInt(r.fieldIndex("vid_height")) === h)
      assert(r.getInt(r.fieldIndex("vid_fps")) === 12)
      assert(r.getInt(r.fieldIndex("vid_sampled")) === frames) // every=1
      assert(r.getLong(r.fieldIndex("vid_dim_sum")) === frames.toLong * (w + h))
    }
    // poison id (89 % 89 == 0) and a TRUNCATED valid container both land
    // ok=false without failing the task
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val poison = Multimodal.decodeVideo(
      Multimodal.aviPayload(Seq(89L).toDF("doc_id"), "doc_id")).collect()(0)
    assert(!poison.getBoolean(poison.fieldIndex("vid_ok")))
    val whole = Multimodal.aviPayload(Seq(7L).toDF("doc_id"), "doc_id")
      .collect()(0).getAs[Array[Byte]]("payload")
    val truncated = spark.createDataFrame(
      java.util.List.of(Row(1L, whole.take(whole.length / 2), "video")),
      Multimodal.mediaSchema)
    val t = Multimodal.decodeVideo(truncated).collect()(0)
    assert(!t.getBoolean(t.fieldIndex("vid_ok")))
  }

  test("bpeMerges: dominant pair first, greedy overlap, deterministic " +
      "tie-break") {
    // "aaa"×10: greedy left-to-right gives TWO (a,a) pairs per word but
    // merging produces (aa)(a); "ab"×5 contributes (a,b)
    val words = Seq(("aaa", 10L), ("ab", 5L)).toDF("w", "cnt")
    val m = CorpusStats.bpeMerges(words, "w", "cnt", rounds = 4)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m === Seq(
      (1, "a", "a", 20L),   // 2 per "aaa" × 10
      (2, "aa", "a", 10L),  // the merged symbol pairs with the tail a
      (3, "a", "b", 5L)))   // rounds stop early when no pairs remain
  }

  test("stripHtml: tags/script/style gone, entities decode ONCE") {
    import org.apache.spark.sql.functions.col
    def strip(s: String): String = Seq(("x", s)).toDF("k", "h")
      .select(TextAnalysis.stripHtml(col("h"))).head().getString(0)
    assert(strip("<p class=\"x\">hello <b>world</b></p>") === "hello world")
    assert(strip("a<script>if(x<2){}</script>b") === "a b")
    assert(strip("a<style>p{color:red}</style>b") === "a b")
    // single decode of each entity
    assert(strip("x &amp; y &lt;z&gt; &quot;q&quot; &#39;s&#39;&nbsp;!") ===
      "x & y <z> \"q\" 's' !")
    // the double-decode trap: literal &amp;lt; is the TEXT "&lt;", never
    // a strippable tag bracket
    assert(strip("&amp;lt;b&amp;gt;bold&amp;lt;/b&amp;gt;") ===
      "&lt;b&gt;bold&lt;/b&gt;")
    // whitespace collapses across removed blocks
    assert(strip("  a   <div>\n\n</div>   b ") === "a b")
  }
}
