package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SketchExpressions

/** Corpus-level frequency statistics — the quality signals that need the
  * WHOLE corpus, not one row: a document whose n-grams are mostly unique
  * in a 100 TB crawl is extraction garbage; one whose grams are all
  * ubiquitous is boilerplate (the CCNet-style frequency-profile filter).
  *
  * Distribution shape, and why it is the honest one: the gram-frequency
  * table has the same cardinality as the corpus' distinct grams —
  * billions of rows at scale — so unlike decontamination there is NO
  * broadcast shortcut. The canonical plan is exactly what Spark does
  * here: explode grams (narrow kernel projection), count per gram (one
  * hash shuffle with map-side partial aggregation), join the counts back
  * to the exploded grams (shuffle-on-gram co-partitioned with the count —
  * Catalyst reuses the partitioning), re-aggregate per document (shuffle
  * on id). Every shuffled row is (8 B gram hash, 8 B count) — documents
  * themselves never move.
  */
object CorpusStats {

  /** Per-document rarity profile over distinct word n-grams:
    * n_grams (distinct grams in the doc), n_hapax (grams occurring in
    * exactly one document corpus-wide), freq_sum (sum of the corpus
    * document-frequencies of the doc's grams), min_freq (its rarest
    * gram's frequency). Integer-only outputs → engine-exact. */
  def gramRarity(df: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    val grams = df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(SketchExpressions.gramHashes(
        Dedup.normalized(col(textCol)), n)).as("_g"))
    val freq = grams.groupBy("_g").agg(count(lit(1)).as("_freq"))
    grams.join(freq, "_g")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("_freq") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("_freq")).as("freq_sum"),
        min(col("_freq")).as("min_freq"))
  }

  /** CCNet-style CROSS-CORPUS boilerplate removal: a line occurring in
    * ≥ `minDocs` distinct documents is boilerplate (cookie banners,
    * nav menus, license footers) and is stripped from every document,
    * preserving the order of what remains. The intra-document
    * twin is [[TextAnalysis.dedupeUnits]]; this one needs the corpus.
    *
    * Scale shape: posexplode lines (narrow) → distinct (doc, line) →
    * line-count shuffle → anti-join kept lines → per-doc reassembly
    * (sort by original position). Line strings must cross the exchanges
    * (reassembly needs the text), but each line travels once and the
    * boilerplate side of the anti-join is tiny — AQE broadcasts it.
    * Returns (`idCol`, `cleaned`, `n_removed`) for every non-null doc,
    * including docs whose every line was boilerplate. */
  def stripBoilerplate(df: DataFrame, textCol: String, idCol: String,
      minDocs: Long): DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol).as("_t"))
    val lines = base.select(col(idCol),
      posexplode(split(col("_t"), "\n", -1)).as(Seq("_pos", "_line")))
    val bp = lines.filter(col("_line") =!= "")
      .select(col(idCol), col("_line")).distinct()
      .groupBy("_line").agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("_line").as("_bpl"))
    val kept = lines
      .join(bp, col("_line") === col("_bpl"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("_pos"), col("_line")))),
          x => x.getField("_line")), "\n").as("cleaned"),
        count(lit(1)).as("_kept"))
    base.select(col(idCol),
        size(split(col("_t"), "\n", -1)).cast("long").as("_total"))
      .join(kept, Seq(idCol.stripPrefix("`").stripSuffix("`")), "left")
      .select(col(idCol),
        coalesce(col("cleaned"), lit("")).as("cleaned"),
        (col("_total") - coalesce(col("_kept"), lit(0L))).as("n_removed"))
  }

  /** Vocabulary builder (tokenizer-training step 0): the corpus' top-`k`
    * whitespace tokens by frequency, deterministic ties (freq desc, then
    * token). Scale shape: explode → ONE map-side-combined count shuffle →
    * TakeOrdered top-k (no global sort); the rank window runs over the k
    * surviving rows only. */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.filter(col(textCol).isNotNull)
      .withColumn("_norm", Dedup.normalized(col(textCol)))
      .select(explode(Dedup.tokensOf(col("_norm"))).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(k)
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("token"))))
  }

  /** Bigram association strength (the BPE merge-candidate signal): for
    * the top-`k` adjacent-token bigrams by count, the LIFT
    * n_tokens · c(xy) / (c(x) · c(y)) — PMI without the log (same
    * ranking, and integer-derived ÷/× only, so a SQL oracle reproduces
    * it bit-exactly; ln would be 1-ulp engine-dependent). Scale: one
    * bigram count shuffle + two token-keyed joins back to the unigram
    * counts (AQE broadcasts the small side; both stay equi-joins). */
  def bigramLift(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
      .withColumn("_norm", Dedup.normalized(col(textCol)))
      .withColumn("_toks", Dedup.tokensOf(col("_norm")))
    val uni = base.select(explode(col("_toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c1"))
    val totals = base.select(
      sum(size(col("_toks"))).cast("double").as("n_tokens"))
    // adjacent pairs without a descending-sequence trap: zip the array
    // against itself shifted by one (slice handles len<2 as empty)
    val bigrams = base.select(explode(
        zip_with(
          slice(col("_toks"), lit(1), greatest(size(col("_toks")) - 1, lit(0))),
          slice(col("_toks"), lit(2), greatest(size(col("_toks")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c2"))
      .orderBy(col("c2").desc, col("bigram")).limit(k)
    val x = split(col("bigram"), " ").getItem(0)
    val y = split(col("bigram"), " ").getItem(1)
    bigrams
      .join(uni.select(col("token").as("_x"), col("c1").as("cx")), x === col("_x"))
      .join(uni.select(col("token").as("_y"), col("c1").as("cy")), y === col("_y"))
      .crossJoin(broadcast(totals))
      .select(col("bigram"), col("c2"),
        round(col("n_tokens") * col("c2").cast("double") /
          (col("cx").cast("double") * col("cy").cast("double")), 6).as("lift"))
      .orderBy(col("c2").desc, col("bigram"))
  }

  /** Bigram language-model naturalness score — the CCNet device (rank
    * documents by fluency under a cheap LM trained on a reference slice;
    * CCNet uses KenLM perplexity, arXiv:1911.00359) in an engine-exact
    * integer form. Training (`train` rows only) is just counting:
    * unigram occurrences c1, adjacent-pair occurrences c2, total token
    * count — stupid backoff (Brants et al. 2007, "Large Language Models
    * in Machine Translation") deliberately skips normalization, which is
    * what keeps the "training" a pair of map-side-combined count
    * shuffles. Every document (train or not) is then scored over its
    * adjacent token pairs (x, y):
    *
    *   p = c2(x,y)/c1(x)          bigram seen in training
    *     | α · c1(y)/total        unseen bigram, seen unigram
    *     | α · 1/total            out-of-vocabulary y
    *
    * accumulated per document in FIXED POINT: floor(p·1e9) summed as
    * BIGINT. Each float step is one correctly-rounded IEEE divide or
    * multiply of integer-derived doubles, so any engine reproduces
    * score_fp bit-exactly — ln-based perplexity would be 1-ulp
    * engine-dependent (same device as bm25's lnIdf=false / bigramLift).
    * Higher score = more fluent; rank or threshold downstream.
    *
    * Scale shape: two count shuffles over the train slice + three
    * equi-joins of the exploded scoring pairs against the count tables.
    * The count tables are vocab²-bounded (≪ corpus; AQE broadcasts them
    * when they fit, falls back to co-partitioned shuffle joins when a
    * 100 TB corpus's bigram table outgrows memory). Only (token, count)
    * pairs cross any exchange — documents never move.
    *
    * Returns (idCol, n_pairs, score_fp, n_oov) for every non-null text;
    * docs with <2 tokens score (0, 0, 0). */
  def lmScore(df: DataFrame, textCol: String, idCol: String,
      train: Column, alpha: Double = 0.4): DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
      .withColumn("_norm", Dedup.normalized(col(textCol)))
      .withColumn("_toks", Dedup.tokensOf(col("_norm")))
    val trainBase = base.filter(train)
    val uni = trainBase.select(explode(col("_toks")).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_c1"))
    val totals = trainBase.select(explode(col("_toks")).as("_w"))
      .agg(count(lit(1)).as("_tot"))
    // adjacent pairs as "x y" strings (tokens are whitespace-free, so the
    // join/split is lossless — same device as bigramLift)
    def pairsOf(d: DataFrame): DataFrame = d.select(col(idCol), explode(
        zip_with(
          slice(col("_toks"), lit(1), greatest(size(col("_toks")) - 1, lit(0))),
          slice(col("_toks"), lit(2), greatest(size(col("_toks")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("_bg"))
      .withColumn("_x", split(col("_bg"), " ").getItem(0))
      .withColumn("_y", split(col("_bg"), " ").getItem(1))
    val bi = pairsOf(trainBase)
      .groupBy("_x", "_y").agg(count(lit(1)).as("_c2"))
    val scored = pairsOf(base)
      .join(bi, Seq("_x", "_y"), "left")
      .join(uni.select(col("_w").as("_x"), col("_c1").as("_cx")), Seq("_x"), "left")
      .join(uni.select(col("_w").as("_y"), col("_c1").as("_cy")), Seq("_y"), "left")
      .crossJoin(broadcast(totals))
      // _c2 non-null implies _cx non-null (training saw the pair ⇒ saw x)
      .withColumn("_p",
        when(col("_c2").isNotNull,
          col("_c2").cast("double") / col("_cx").cast("double"))
        .when(col("_cy").isNotNull,
          lit(alpha) * (col("_cy").cast("double") / col("_tot").cast("double")))
        .otherwise(lit(alpha) * (lit(1.0) / col("_tot").cast("double"))))
      .withColumn("_fp", floor(col("_p") * lit(1e9)).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_fp")).as("score_fp"),
        sum(when(col("_cy").isNull, 1L).otherwise(0L)).as("n_oov"))
    base.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("score_fp"), lit(0L)).as("score_fp"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
  }

  /** BPE merge learning (Sennrich et al. 2016, arXiv:1508.07909 §3.2) —
    * tokenizer training's core loop, over the corpus WORD-COUNT DICT (the
    * paper's device: after one word-count pass, every further iteration
    * touches only distinct words — dict cardinality, not corpus
    * cardinality). Input: (word, cnt) rows. Each round counts adjacent
    * symbol pairs weighted by word count (one small shuffle over the
    * dict), picks the global argmax (count desc, then pair lexicographic
    * — a deterministic tie-break both engines share), and applies the
    * merge to every word.
    *
    * The merge application is the part that usually needs imperative
    * code; here it is ONE literal string replace via a double-separator
    * encoding: a word's symbols are joined as ``␁␁s1␁␁s2␁␁`` (␁ =
    * U+0001, which normalized tokens cannot contain), and merging (a,b)
    * replaces ``␁a␁␁b␁`` with ``␁ab␁``. Each occurrence's boundary
    * separators split evenly between neighbors, so plain replace-all —
    * left-to-right, non-overlapping, identical semantics in Spark and
    * DuckDB — IS greedy BPE merging ("aaa" under merge (a,a) →
    * "(aa)a"), with zero regex and zero UDFs.
    *
    * Scale shape: per round, one map-side-combined pair-count shuffle
    * over the dict + a 1-row argmax collect; the dict is persisted and
    * rotated each round so round k never re-applies merges 1..k-1
    * (lineage stays O(1), the Lloyd-iteration pattern). Returns the merge
    * table (round, left, right, pair_count) — integer counts and strings
    * only, engine-exact. */
  def bpeMerges(words: DataFrame, wordCol: String, cntCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val spark = words.sparkSession
    import spark.implicits._
    val S = ""
    var dict = words.select(
      concat(lit(S + S),
        array_join(split(col(wordCol), ""), S + S), lit(S + S)).as("_sym"),
      col(cntCol).cast("long").as("_cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // lazy cache rotation: each round's argmax action is the FIRST action
    // over the freshly-persisted dict, so it materializes the cache — the
    // previous round's parent can then drop without a dedicated count()
    // job (6 fewer jobs than materialize-then-unpersist)
    var prev: Option[DataFrame] = None
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val syms = filter(split(col("_sym"), S + S), x => x =!= "")
      val top = dict
        .select(col("_cnt"), explode(zip_with(
          slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
          slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
          (a, b) => struct(a.as("x"), b.as("y")))).as("_p"))
        .groupBy(col("_p.x").as("_x"), col("_p.y").as("_y"))
        .agg(sum(col("_cnt")).as("_c"))
        .orderBy(col("_c").desc, col("_x"), col("_y"))
        .limit(1).collect()
      prev.foreach(_.unpersist(blocking = false)) // dict is cached now
      prev = None
      if (top.isEmpty) exhausted = true
      else {
        val (x, y, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((r, x, y, c))
        val next = dict.withColumn("_sym",
          replace(col("_sym"), lit(S + x + S + S + y + S), lit(S + x + y + S)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        prev = Some(dict)
        dict = next
        r += 1
      }
    }
    prev.foreach(_.unpersist(blocking = false))
    dict.unpersist(blocking = false)
    merges.result().toDF("round", "left", "right", "pair_count")
  }

  /** Apply a learned BPE merge table to the corpus — the tokenizer's
    * APPLICATION half ([[bpeMerges]] is the training half). The merges
    * are applied to the DISTINCT-WORD dict (same double-separator
    * replace, chained in merge order inside one projection), and the
    * corpus joins back to the dict by word — so the per-word merge work
    * is dict-cardinality, the corpus-side cost is one explode + one
    * equi-join + one per-doc aggregate, and AQE broadcasts the dict when
    * it fits. Returns (idCol, n_words, n_syms): total words and total
    * post-merge symbols per document (null/empty docs → 0,0). */
  def bpeSegment(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val S = ""
    val base = df.filter(col(textCol).isNotNull)
      .withColumn("_toks", Dedup.tokensOf(Dedup.normalized(col(textCol))))
    val words = base.select(col(idCol), explode(col("_toks")).as("_w"))
    val sym0 = concat(lit(S + S),
      array_join(split(col("_w"), ""), S + S), lit(S + S))
    val symN = merges.foldLeft(sym0) { case (acc, (x, y)) =>
      replace(acc, lit(S + x + S + S + y + S), lit(S + x + y + S))
    }
    val dict = words.select(col("_w")).distinct()
      .withColumn("_nsym",
        size(filter(split(symN, S + S), z => z =!= "")).cast("long"))
    val perDoc = words.join(dict, "_w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("_nsym")).as("n_syms"))
    base.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_syms"), lit(0L)).as("n_syms"))
  }

  /** Fixed-point scale for unigram-LM log-likelihood weights:
    * w(piece) = floor(1e6 · ln(count/total)) as a Long. The ln runs ONCE
    * per piece, driver-side, via StrictMath (fdlibm — bit-identical on
    * every JVM); everything downstream — the Viterbi DP, the oracle's
    * replay — is pure integer arithmetic over these literals. */
  val UnigramScale: Long = 1000000L

  /** Weight of a single character absent from the vocabulary (can only
    * arise on corpora disjoint from the training corpus): ln-scale −100,
    * far below any real piece, but a defined constant both engines share. */
  val UnigramUnk: Long = -100L * UnigramScale

  /** Unigram-LM tokenizer training, SentencePiece-style (Kudo 2018,
    * arXiv:1804.10959 §3.2) over the corpus WORD-COUNT DICT — the same
    * dict-not-corpus device as [[bpeMerges]]: after one word-count pass,
    * every iteration touches only distinct words.
    *
    * The public algorithm, re-expressed Spark-first:
    *  1. SEED: count every ≤`maxPieceLen`-char substring occurrence of
    *     every dict word (weighted by word count) — one explode + one
    *     map-side-combined count shuffle, dict-cardinality. Vocabulary =
    *     ALL single characters (never pruned — segmentation must stay
    *     total, Kudo §3.2's character coverage) + the top `seedSize`
    *     multi-char pieces by (count desc, piece asc).
    *  2. EM rounds: weights = fixed-point log-likelihoods of the current
    *     counts (driver, vocab-sized); E-step = Viterbi-segment every dict
    *     word under those weights ([[graft.functions.UnigramSegment]], a
    *     narrow codegen projection) and re-count piece uses weighted by
    *     word count — one shuffle, dict-cardinality rows. Between rounds
    *     the vocab is PRUNED to `targetSize` multi-char pieces by the new
    *     counts (Viterbi-EM's hard prune: pieces the best segmentations
    *     stopped using simply drop out, the paper's likelihood-loss prune
    *     collapsed to its count form under hard-EM).
    *  3. Returns (weights of the FINAL round, final per-piece counts
    *     DataFrame (piece, uses, n_refs)). The weights are the trained
    *     artifact a caller exports — and what a cross-engine oracle needs
    *     to replay the final E-step bit-for-bit ([[UnigramScale]]).
    *
    * 100 TB shape: the corpus is touched ONCE (the word-count pass the
    * caller does to build `words`); training is dict-sized shuffles plus
    * vocab-sized driver collects (the IVF-Lloyd pattern — the collect is
    * bounded by `seedSize`, never by data). The vocab rides into executors
    * as a plan reference object, exactly how production tokenizers ship
    * their piece tables. */
  def unigramTrain(words: DataFrame, wordCol: String, cntCol: String,
      maxPieceLen: Int = 4, seedSize: Int = 400, targetSize: Int = 150,
      emRounds: Int = 2): (Map[String, Long], DataFrame) = {
    require(emRounds >= 1, s"emRounds must be >= 1: $emRounds")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2: $maxPieceLen")
    var vocab = unigramSeed(words, wordCol, cntCol, maxPieceLen, seedSize)
    var r = 1
    while (r < emRounds) {
      val wts = unigramWeights(vocab)
      val counts = unigramEStep(words, wordCol, cntCol, wts)
        .collect().map(row => (row.getString(0), row.getLong(1)))
      vocab = unigramPrune(counts.toSeq, targetSize)
      r += 1
    }
    val finalWts = unigramWeights(vocab)
    (finalWts, unigramEStep(words, wordCol, cntCol, finalWts))
  }

  /** Seed vocabulary: all single chars + top multi-char substrings.
    * Occurrence-counted (a word `aaa` contributes `a` three times and
    * `aa` twice), weighted by the word count. */
  def unigramSeed(words: DataFrame, wordCol: String, cntCol: String,
      maxPieceLen: Int, seedSize: Int): Seq[(String, Long)] = {
    val w = col(wordCol)
    val subs = words.select(col(cntCol).cast("long").as("_cnt"),
      explode(flatten(transform(sequence(lit(1), length(w)),
        i => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(w) - i + lit(1))),
          l => w.substr(i, l))))).as("_p"))
    val counts = subs.groupBy("_p").agg(sum(col("_cnt")).as("_c"))
    val singles = counts.filter(length(col("_p")) === 1).collect()
    val multis = counts.filter(length(col("_p")) > 1)
      .orderBy(col("_c").desc, col("_p")).limit(seedSize).collect()
    (singles ++ multis).map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Counts → fixed-point log-likelihood weights (driver-side, exact). */
  def unigramWeights(vocab: Seq[(String, Long)]): Map[String, Long] = {
    val total = vocab.iterator.map(_._2).sum.toDouble
    vocab.iterator.map { case (p, c) =>
      p -> math.floor(UnigramScale * StrictMath.log(c / total)).toLong
    }.toMap
  }

  /** E-step: Viterbi-segment every dict word, count piece uses.
    * `uses` = Σ word_cnt × times-used, `n_refs` = unweighted use rows. */
  def unigramEStep(words: DataFrame, wordCol: String, cntCol: String,
      weights: Map[String, Long]): DataFrame =
    words.select(col(cntCol).cast("long").as("_cnt"),
        explode(graft.functions.UnigramOps.unigramSegment(
          col(wordCol), weights, UnigramUnk)).as("piece"))
      .groupBy("piece")
      .agg(sum(col("_cnt")).as("uses"), count(lit(1)).as("n_refs"))

  /** Hard-EM prune: keep every single char, and the top `targetSize`
    * multi-char pieces by (new count desc, piece asc). Pieces with zero
    * uses are already absent from the counts and fall away. */
  def unigramPrune(counts: Seq[(String, Long)], targetSize: Int)
      : Seq[(String, Long)] = {
    val (singles, multis) = counts.partition { case (p, _) =>
      p.codePointCount(0, p.length) == 1 }
    singles ++ multis.sortBy { case (p, c) => (-c, p) }.take(targetSize)
  }

  /** The unigram tokenizer's APPLICATION half ([[unigramTrain]] is the
    * training half — the [[bpeSegment]]/[[bpeMerges]] split): Viterbi-
    * segment the corpus under trained weights. The DP runs once per
    * DISTINCT word (dict-cardinality), the corpus joins back by word —
    * corpus-side cost is one explode + one equi-join (AQE broadcasts the
    * dict when it fits) + one per-doc aggregate. Returns
    * (idCol, n_words, n_pieces): words and total Viterbi pieces per
    * document (null/empty docs → 0,0). */
  def unigramSegmentCorpus(df: DataFrame, textCol: String, idCol: String,
      weights: Map[String, Long]): DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
      .withColumn("_toks", Dedup.tokensOf(Dedup.normalized(col(textCol))))
    val words = base.select(col(idCol), explode(col("_toks")).as("_w"))
    val dict = words.select(col("_w")).distinct()
      .withColumn("_np", size(graft.functions.UnigramOps.unigramSegment(
        col("_w"), weights, UnigramUnk)).cast("long"))
    val perDoc = words.join(dict, "_w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("_np")).as("n_pieces"))
    base.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }

  /** BM25 relevance of every document against a small query term set —
    * keyword retrieval over the corpus (Robertson/Spärck Jones; k1/b are
    * the classic defaults 1.2/0.75).
    *
    * Scale shape: the corpus statistics BM25 needs (N, avgdl, per-term
    * document frequencies) reduce to ONE map-side-combined aggregation
    * row — integer counts, so the reduction is order-exact — which then
    * rides a broadcast cross-join onto the scoring scan. No per-term
    * shuffle, no inverted index materialization: at 100 TB this is one
    * stats pass + one narrow codegen'd scoring pass. The term set is
    * bounded (a query, not a corpus), which is what makes the
    * broadcast-stats shape honest.
    *
    * `lnIdf = true` (default) is textbook BM25:
    *   idf = ln(1 + (N − df + 0.5)/(df + 0.5)).
    * `lnIdf = false` swaps the ln for the raw odds ratio
    *   (N − df + 0.5)/(df + 0.5) — the same per-term monotonicity (ln is
    * monotone), chosen for cross-engine gates: every operation is then
    * +,×,÷ over integer-derived doubles in a fixed evaluation order, so
    * Spark and a SQL oracle agree BIT-EXACTLY where two libm `log`s are
    * only 1-ulp-close. Rankings per term agree; only the inter-term
    * weighting differs (documented deviation, not an accident). */
  def bm25(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      lnIdf: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val base = df.filter(col(textCol).isNotNull)
      .withColumn("_norm", Dedup.normalized(col(textCol)))
      .withColumn("_toks", Dedup.tokensOf(col("_norm")))
      .withColumn("_dl", size(col("_toks")).cast("double"))
    val withTf = terms.indices.foldLeft(base) { (d, i) =>
      d.withColumn(s"_tf_$i",
        size(filter(col("_toks"), t => t === lit(terms(i)))).cast("double"))
    }
    val statsAggs =
      count(lit(1)).cast("double").as("_n") +:
      sum(col("_dl")).as("_sumdl") +:
      terms.indices.map(i =>
        sum(when(col(s"_tf_$i") > 0, 1.0).otherwise(0.0)).as(s"_df_$i"))
    val stats = withTf.agg(statsAggs.head, statsAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
      .withColumn("_avgdl", col("_sumdl") / col("_n"))
    val score = terms.indices.map { i =>
      val odds = (col("_n") - col(s"_df_$i") + lit(0.5)) /
        (col(s"_df_$i") + lit(0.5))
      val idf = if (lnIdf) log(lit(1.0) + odds) else odds
      idf * (col(s"_tf_$i") * lit(k1 + 1.0)) /
        (col(s"_tf_$i") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl")))
    }.reduce(_ + _)
    scored.select(col(idCol), round(score, 6).as("bm25"))
  }

  // ------------------------------------------------------------ fuzzy vocab

  /** Edit-distance-1 vocabulary pairs (typo/OCR-variant mining, the
    * entity-resolution fuzzy join in miniature) WITHOUT an all-pairs scan:
    * candidates come from two equi-join blocks — (first char, length) and
    * (last char, length), with the right side exploded to lengths
    * {l−1, l, l+1} so the ±1-length band stays an equi-join key — plus
    * one tiny all-pairs bucket for single-char tokens.
    *
    * Completeness (why the blocks suffice for distance ≤ 1): a
    * substitution not at position 0 preserves the first char; one at the
    * last position still preserves the first char; a substitution at
    * position 0 of a token with ≥2 chars preserves the LAST char; inserts
    * and deletes preserve the first char unless at position 0, in which
    * case they preserve the last char. The only pairs sharing neither
    * endpoint are the 1-char↔1-char substitutions — the dedicated bucket.
    * Block sizes are vocab-per-(char, length) — hundreds, never the
    * vocabulary — so candidate work stays linear-ish in vocab size at any
    * corpus scale (the vocabulary itself grows sub-linearly in corpus
    * bytes). Exact `levenshtein ≤ maxDist` then verifies candidates. */
  def fuzzyVocabPairs(docs: DataFrame, textCol: String,
      minCount: Long = 1L): DataFrame = {
    val vocab = docs
      .select(explode(Dedup.tokensOf(Dedup.normalized(col(textCol))))
        .as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .withColumn("len", length(col("tok")))
      .withColumn("c1", substring(col("tok"), 1, 1))
      .withColumn("cL", expr("substring(tok, length(tok), 1)"))
    def block(keyCol: String): DataFrame = {
      val a = vocab.select(col("tok").as("tok_a"), col("n").as("n_a"),
        col("len").as("len_a"), col(keyCol).as("k"))
      val b = vocab.select(col("tok").as("tok_b"), col("n").as("n_b"),
        explode(array(col("len") - 1, col("len"), col("len") + 1))
          .as("len_a"),
        col(keyCol).as("k"))
      a.join(b, Seq("k", "len_a")).filter(col("tok_a") < col("tok_b"))
        .select("tok_a", "tok_b", "n_a", "n_b")
    }
    val ones = {
      val o = vocab.filter(col("len") === 1)
      o.select(col("tok").as("tok_a"), col("n").as("n_a"))
        .crossJoin(o.select(col("tok").as("tok_b"), col("n").as("n_b")))
        .filter(col("tok_a") < col("tok_b"))
    }
    block("c1").unionByName(block("cL")).unionByName(ones)
      .distinct()
      .withColumn("dist", levenshtein(col("tok_a"), col("tok_b")))
      .filter(col("dist") <= 1)
      .select(col("tok_a"), col("tok_b"), col("dist"),
        col("n_a"), col("n_b"))
  }

  // ------------------------------------------------------- learned scoring

  /** One-pass EXACT least-squares fit of integer features → integer label
    * (the quality-classifier-distillation shape: fit a cheap linear model
    * on the slice an expensive scorer labeled, then score the whole
    * corpus with codegen'd arithmetic). The distributed work is ONE
    * map-side-combined aggregate producing the normal-equation sums
    * Σxᵢxⱼ / Σxᵢy (p(p+3)/2 Longs — bytes to the driver regardless of
    * corpus size); the solve is driver-side BigInt Cramer, so the
    * coefficients are exact rationals quantized once to
    * floor(βⱼ·2^shiftBits) — deterministic across engines, partitionings
    * and retries. Features must be integer-valued (cast to Long) and
    * count ≤ 4; a singular normal matrix (collinear features) is
    * rejected rather than pseudo-inverted. */
  def linearFitFP(df: DataFrame, features: Seq[Column], label: Column,
      shiftBits: Int = 20): Seq[Long] = {
    val p = features.size
    require(p >= 1 && p <= 4, s"1..4 features, got $p")
    require(shiftBits >= 0 && shiftBits <= 30, s"bad shiftBits $shiftBits")
    // moment sums accumulate as decimal(38,0), NOT Long: in non-ANSI mode
    // Spark wraps Long sums silently, so Σxᵢxⱼ over a wide-feature corpus
    // (char counts × billions of rows) would return wrong coefficients
    // with no error despite the "exact" contract. decimal(38,0) holds
    // ~10^38 — a single max Long product is ~8.5e37, so ~10 such extreme
    // rows (or any realistic corpus of bounded features) fit; past that
    // the sum overflows to SQL NULL, which is rejected loudly below
    // instead of NPE-ing.
    val xs = features.map(_.cast("long").cast("decimal(38,0)"))
    val y = label.cast("long").cast("decimal(38,0)")
    val aggs =
      (for (i <- 0 until p; j <- i until p)
        yield sum(xs(i) * xs(j)).as(s"_xx_${i}_$j")) ++
      (0 until p).map(i => sum(xs(i) * y).as(s"_xy_$i"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def g(n: String): BigInt = {
      val v = row.getAs[java.math.BigDecimal](n)
      if (v == null) throw new ArithmeticException(
        s"linearFitFP: moment sum $n overflowed decimal(38,0) — " +
          "rescale the features")
      BigInt(v.toBigIntegerExact)
    }
    val a = Array.tabulate(p, p)((i, j) =>
      if (i <= j) g(s"_xx_${i}_$j") else g(s"_xx_${j}_$i"))
    val b = Array.tabulate(p)(i => g(s"_xy_$i"))
    def det(m: Array[Array[BigInt]]): BigInt = m.length match {
      case 1 => m(0)(0)
      case n =>
        (0 until n).map { c =>
          val minor = m.tail.map(r =>
            r.zipWithIndex.collect { case (v, i) if i != c => v })
          val s = if (c % 2 == 0) BigInt(1) else BigInt(-1)
          s * m(0)(c) * det(minor)
        }.sum
    }
    val d = det(a)
    require(d != 0, "singular normal matrix: features are collinear")
    def floorDiv(n: BigInt, den: BigInt): BigInt = {
      val q = n / den
      if (n % den != 0 && (n.signum != den.signum)) q - 1 else q
    }
    (0 until p).map { j =>
      val aj = Array.tabulate(p, p)((r, c) => if (c == j) b(r) else a(r)(c))
      val v = floorDiv(det(aj) * BigInt(2).pow(shiftBits), d)
      require(v.isValidLong, s"coefficient $j overflows Long at 2^$shiftBits")
      v.toLong
    }
  }

  /** Apply fixed-point coefficients: score = Σ βⱼ_fp · xⱼ — pure Long
    * codegen arithmetic, the scoring pass any engine replays bit-for-bit
    * from the coefficient literals. (The score carries the 2^shiftBits
    * scale; comparisons and thresholds work unchanged.) */
  def linearScoreFP(features: Seq[Column], coeffs: Seq[Long]): Column = {
    require(features.size == coeffs.size, "feature/coefficient arity mismatch")
    features.zip(coeffs).map { case (f, c) => f.cast("long") * lit(c) }
      .reduce(_ + _)
  }
}
