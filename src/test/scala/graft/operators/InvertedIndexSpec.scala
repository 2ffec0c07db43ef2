package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inverted-index search laws. The gate (`q_search_index`) hash-matches
  * the ranked result against DuckDB's full-scan replay; these specs pin
  * what the gate cannot see — that the query plans ONLY the query
  * terms' shard directories (the serving property), and that the
  * index-served scores are IDENTICAL to the full-scan
  * [[CorpusStats.bm25]] restricted to the conjunctive doc set (the
  * index is an access path, not an approximation). */
class InvertedIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.util.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text"))
  private def idx: String =
    new java.io.File(new java.io.File("target", "qtmp"),
      "invidx").getAbsolutePath

  private lazy val built: String = {
    val d = idx
    InvertedIndex.writeIndex(spark, docs, "text", "doc_id", d, nShards = 8)
    d
  }

  test("index-served BM25 is bit-identical to the full-scan scorer on the conjunctive doc set") {
    val terms = Seq("spark", "customer")
    val served = InvertedIndex.searchAnd(spark, built, terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // full-scan replay with FULL-corpus statistics (the index bakes in
    // corpus-level N/Σdl/df), truncated to docs containing every term
    val toks = Dedup.tokensOf(Dedup.normalized(col("text")))
    val hasAll = terms.map(t =>
      size(filter(toks, x => x === lit(t))) > 0).reduce(_ && _)
    val conjunctiveIds = docs.filter(hasAll).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(conjunctiveIds.size > 25, "fixture too small to exercise top-k")
    val full = CorpusStats.bm25(docs, "text", "doc_id", terms,
        lnIdf = false)
      .filter(col("doc_id").isInCollection(conjunctiveIds))
      .orderBy(col("bm25").desc, col("doc_id")).limit(25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served === full,
      "index-served ranking diverged from the full-scan scorer")
  }

  test("query plans only the query terms' shard directories") {
    val terms = Seq("spark", "customer")
    val expectDirs = terms
      .map(t => InvertedIndex.shardOfToken(t, 8)).distinct
      .map(s => s"shard=$s")
    val planned = InvertedIndex.searchAnd(spark, built, terms, k = 10)
      .inputFiles
    assert(planned.nonEmpty)
    assert(planned.forall(f => expectDirs.exists(f.contains)),
      s"planned a file outside the probed shards: " +
        planned.filterNot(f => expectDirs.exists(f.contains)).mkString(", "))
    // and the probe read strictly fewer shards than the index holds
    val allShards = new java.io.File(built).listFiles()
      .count(_.getName.startsWith("shard="))
    assert(expectDirs.size < allShards)
  }

  test("phrase search: candidacy = exact token adjacency on the full-scan oracle, scores = the AND scorer's, probe plans only the terms' shards, positions survive append + compaction") {
    val terms = Seq("table", "scan")
    val d = idx + "_phrase"
    graft.util.Dirs.deleteRec(new java.io.File(d))
    InvertedIndex.writeIndex(spark, docs, "text", "doc_id", d,
      nShards = 8, withPositions = true)
    val served = InvertedIndex.searchPhrase(spark, d, terms, k = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // oracle: docs whose normalized token STREAM contains the phrase
    val joined = concat(lit(" "),
      concat_ws(" ", Dedup.tokensOf(Dedup.normalized(col("text")))),
      lit(" "))
    val phraseIds = docs
      .filter(joined.contains(s" ${terms.mkString(" ")} "))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(phraseIds.nonEmpty, "fixture has no phrase hits")
    assert(served.map(_._1).toSet === phraseIds
      .intersect(served.map(_._1).toSet) &&
      served.map(_._1).toSet.subsetOf(phraseIds),
      "phrase candidacy diverged from the token-stream oracle")
    // scores are the AND scorer's, restricted to the phrase docs
    val and = InvertedIndex.searchAnd(spark, d, terms, k = 10000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    served.foreach { case (id, s) =>
      assert(and(id) === s, s"phrase score for doc $id diverged") }
    // exact candidate set (not just subset): every phrase doc with a
    // score in the top-k window appears
    val expect = phraseIds.toSeq.map(id => (id, and(id)))
      .sortBy { case (id, s) => (-s, id) }.take(50)
    assert(served === expect, "phrase ranking diverged from the oracle")
    // serving shape: only the two terms' shard dirs planned
    val expectDirs = terms.map(t => InvertedIndex.shardOfToken(t, 8))
      .distinct.map(s => s"shard=$s")
    val planned = InvertedIndex.searchPhrase(spark, d, terms, k = 5)
      .inputFiles.filter(_.contains("shard="))
    assert(planned.nonEmpty &&
      planned.forall(f => expectDirs.exists(f.contains)))
    // positions survive incremental append + tombstone compaction
    val d2 = idx + "_phrase2"
    graft.util.Dirs.deleteRec(new java.io.File(d2))
    InvertedIndex.writeIndex(spark, docs.filter(col("doc_id") % 2 === 0),
      "text", "doc_id", d2, nShards = 8, withPositions = true)
    InvertedIndex.appendToIndex(spark,
      docs.filter(col("doc_id") % 2 === 1), "text", d2)
    InvertedIndex.deleteFromIndex(spark, d2, Seq(-1L)) // no-op id
    val someId = served.head._1
    InvertedIndex.deleteFromIndex(spark, d2, Seq(someId))
    InvertedIndex.compactIndex(spark, d2)
    val after = InvertedIndex.searchPhrase(spark, d2, terms, k = 50)
      .collect().map(_.getLong(0)).toSeq
    assert(!after.contains(someId) &&
      after.toSet.subsetOf(phraseIds - someId))
    // a positions-less index refuses phrase queries loudly
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.searchPhrase(spark, built, terms, k = 5).collect()
    }
    assert(e.getMessage.contains("withPositions"))
  }

  test("NEAR/w proximity: candidacy equals the ordered-chain token oracle, minimum window degenerates to the exact phrase, scores are the AND scorer's") {
    val terms = Seq("table", "scan")
    val d = idx + "_near"
    graft.util.Dirs.deleteRec(new java.io.File(d))
    InvertedIndex.writeIndex(spark, docs, "text", "doc_id", d,
      nShards = 8, withPositions = true)
    // driver-side oracle: ordered chain q0 < q1 with q1 - q0 <= w over
    // the normalized token positions
    val tokRows = docs.select(col("doc_id"),
        Dedup.tokensOf(Dedup.normalized(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    def nearDocs(w: Int): Set[Long] = tokRows.collect { case (id, toks)
        if toks.zipWithIndex.exists { case (t0, p0) =>
          t0 == terms.head && toks.zipWithIndex.exists { case (t1, p1) =>
            t1 == terms(1) && p1 > p0 && p1 - p0 <= w }
        } => id }.toSet
    val and = InvertedIndex.searchAnd(spark, d, terms, k = 10000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    for (w <- Seq(1, 3, 8)) {
      val served = InvertedIndex.searchNear(spark, d, terms, window = w,
        k = 10000).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = nearDocs(w).toSeq.map(id => (id, and(id)))
        .sortBy { case (id, s) => (-s, id) }
      assert(served === want, s"NEAR/$w diverged from the token oracle")
    }
    // window = |terms|-1 ≡ the exact phrase
    val ph = InvertedIndex.searchPhrase(spark, d, terms, k = 10000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val near1 = InvertedIndex.searchNear(spark, d, terms, window = 1,
      k = 10000).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(near1 === ph)
    // widening the window only ADDS candidates
    assert(nearDocs(1).subsetOf(nearDocs(8)))
    // a window too small for the chain is refused
    intercept[IllegalArgumentException] {
      InvertedIndex.searchNear(spark, d, terms, window = 0, k = 5)
    }
  }

  test("incremental append serves the identical ranking to a from-scratch rebuild") {
    val d = idx + "_incr"
    graft.util.Dirs.deleteRec(new java.io.File(d))
    InvertedIndex.writeIndex(spark,
      docs.filter(col("doc_id") % 2 === 0), "text", "doc_id", d,
      nShards = 8)
    InvertedIndex.appendToIndex(spark,
      docs.filter(col("doc_id") % 2 === 1), "text", d)
    val terms = Seq("spark", "customer")
    val incr = InvertedIndex.searchAnd(spark, d, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = InvertedIndex.searchAnd(spark, built, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(incr === full,
      "incrementally-maintained index diverged from the rebuild")
    // the corpus constants converged too, not just this query's slice
    val gi = spark.read.parquet(s"$d/_global").collect()(0)
    val gf = spark.read.parquet(s"$built/_global").collect()(0)
    assert(gi.getAs[Long]("n_docs") === gf.getAs[Long]("n_docs"))
    assert(gi.getAs[Long]("sum_dl") === gf.getAs[Long]("sum_dl"))
  }

  test("tombstone delete adjusts df/N/Σdl exactly; re-delete cannot double-subtract") {
    val d = idx + "_del"
    graft.util.Dirs.deleteRec(new java.io.File(d))
    InvertedIndex.writeIndex(spark, docs, "text", "doc_id", d, nShards = 8)
    val ids = docs.filter(col("doc_id") % 5 === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    InvertedIndex.deleteFromIndex(spark, d, ids)
    val terms = Seq("spark", "customer")
    val served = InvertedIndex.searchAnd(spark, d, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served.nonEmpty)
    assert(served.map(_._1).toSet.intersect(ids.toSet).isEmpty,
      "a tombstoned doc was served")
    // ≡ an index built WITHOUT the deleted docs (stats fully adjusted)
    val ref = idx + "_delref"
    graft.util.Dirs.deleteRec(new java.io.File(ref))
    InvertedIndex.writeIndex(spark,
      docs.filter(col("doc_id") % 5 =!= 1), "text", "doc_id", ref,
      nShards = 8)
    val rebuilt = InvertedIndex.searchAnd(spark, ref, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served === rebuilt,
      "merge-on-read delete diverged from the physical rebuild")
    // idempotence: deleting the same ids again must not re-subtract
    val g1 = spark.read.parquet(s"$d/_global").collect()(0)
    InvertedIndex.deleteFromIndex(spark, d, ids)
    val g2 = spark.read.parquet(s"$d/_global").collect()(0)
    assert(g1.getAs[Long]("n_docs") === g2.getAs[Long]("n_docs"))
    assert(g1.getAs[Long]("sum_dl") === g2.getAs[Long]("sum_dl"))
  }

  test("wide sharding (256 shards) serves the BIT-IDENTICAL ranking and shrinks probe I/O: fewer files and bytes than the whole index") {
    val d = idx + "_wide"
    graft.util.Dirs.deleteRec(new java.io.File(d))
    InvertedIndex.writeIndex(spark, docs, "text", "doc_id", d,
      nShards = 256)
    val terms = Seq("spark", "customer")
    val wide = InvertedIndex.searchAnd(spark, d, terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val narrow = InvertedIndex.searchAnd(spark, built, terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(wide === narrow,
      "wide-sharded index diverged from the nibble-sharded ranking")
    // serving-layout law: the probe plans only its terms' shard dirs,
    // and at 256 shards that is a strictly smaller byte slice of the
    // postings than the 8-shard layout can offer
    def probeBytes(dir: String, shards: Int, hash: String): (Int, Long) = {
      val dirs = terms.map(t =>
        InvertedIndex.shardOfToken(t, shards, hash)).distinct
        .map(s => new java.io.File(dir, s"shard=$s"))
      val files = dirs.flatMap(_.listFiles().toSeq)
        .filter(_.getName.endsWith(".parquet"))
      (files.size, files.map(_.length()).sum)
    }
    def totalBytes(dir: String): Long =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
    val (_, wideBytes) = probeBytes(d, 256, "wide")
    val (_, narrowBytes) = probeBytes(built, 8, "nibble")
    assert(wideBytes < narrowBytes,
      s"256-shard probe ($wideBytes B) should read less than the " +
        s"8-shard probe ($narrowBytes B)")
    assert(wideBytes.toDouble / totalBytes(d) < 0.1,
      "a 2-term probe over 256 shards should touch <10% of the postings")
  }

  test("tombstone compaction folds _deletes into rewritten postings: identical ranking, tombstone dir gone, idempotent") {
    val d = idx + "_compact"
    graft.util.Dirs.deleteRec(new java.io.File(d))
    InvertedIndex.writeIndex(spark, docs, "text", "doc_id", d, nShards = 8)
    val ids = docs.filter(col("doc_id") % 5 === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    InvertedIndex.deleteFromIndex(spark, d, ids)
    val terms = Seq("spark", "customer")
    val before = InvertedIndex.searchAnd(spark, d, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    InvertedIndex.compactIndex(spark, d)
    assert(!new java.io.File(d, "_deletes").exists(),
      "compaction must clear the tombstone sidecar")
    val after = InvertedIndex.searchAnd(spark, d, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after === before, "compaction changed the served ranking")
    // tombstoned docs are physically gone from the postings now
    val left = spark.read.parquet(d).filter(
      col("doc_id").isInCollection(ids)).count()
    assert(left === 0, s"$left tombstoned postings survived compaction")
    // idempotent: a second compaction is a plain layout rewrite
    InvertedIndex.compactIndex(spark, d)
    val again = InvertedIndex.searchAnd(spark, d, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(again === before)
    // and incremental append keeps working on the compacted index
    InvertedIndex.appendToIndex(spark,
      docs.filter(col("doc_id") % 5 === 1), "text", d)
    val g = spark.read.parquet(s"$d/_global").collect()(0)
    val want = docs.count()
    assert(g.getAs[Long]("n_docs") === want)
  }

  test("disjunctive OR search: candidates are the union, AND results rank identically within it, unindexed terms degrade gracefully") {
    val terms = Seq("spark", "customer")
    val or = InvertedIndex.searchOr(spark, built, terms, k = 100000)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val and = InvertedIndex.searchAnd(spark, built, terms, k = 100000)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // every conjunctive hit appears in the OR result with the SAME score
    val orMap = or.toMap
    and.foreach { case (id, s) =>
      assert(orMap.get(id).contains(s),
        s"doc $id: AND score $s vs OR score ${orMap.get(id)}")
    }
    assert(or.length > and.length,
      "OR should admit single-term docs the conjunction drops")
    // an unindexed term doesn't empty the disjunction (unlike AND)
    val degraded = InvertedIndex.searchOr(spark, built,
      Seq("spark", "zzzznotaword"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val single = InvertedIndex.searchOr(spark, built,
      Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(degraded.toSeq === single.toSeq)
  }

  test("single-term search ranks by BM25 with deterministic ties; absent term is empty") {
    val one = InvertedIndex.searchAnd(spark, built, Seq("window"), k = 10)
      .collect()
    assert(one.length === 10)
    val scores = one.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)), "not rank-ordered")
    assert(InvertedIndex.searchAnd(spark, built,
      Seq("spark", "zzzznotaword"), k = 10).count() === 0,
      "conjunction with an unindexed term must be empty")
  }
}
