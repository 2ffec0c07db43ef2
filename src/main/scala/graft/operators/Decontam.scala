package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.SketchExpressions

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation corpus — the standard pre-training hygiene
  * pass (n-gram collision against held-out benchmarks, as published for
  * GPT-3/PaLM-class training runs; the reference engine has no analog, this
  * is part of the beyond-reference LLM-pipeline surface).
  *
  * Scale shape (the whole point): the EVAL side is benchmarks — megabytes,
  * not terabytes — so its distinct gram universe is built once and
  * broadcast; the TRAIN side (the 100 TB corpus) is a single narrow
  * projection through the `gram_hashes` kernel (one UTF-8 byte-walk per
  * document, no gram strings materialized) followed by a broadcast-hash
  * semi-match. Nothing about the train corpus is ever shuffled except the
  * matched (id, gram) rows — contamination hits, which are rare by
  * construction — on their way into the per-document count.
  */
object Decontam {

  /** Per-train-document overlap against the eval corpus' gram universe:
    * one row per CONTAMINATED document — (id, n_shared distinct grams also
    * present anywhere in eval, n_grams distinct grams in the document).
    * Clean documents produce no row (at 100 TB the clean set is the
    * corpus; materializing it would dwarf the finding). Callers decide the
    * removal policy: any-hit (n_shared ≥ 1) or a rate threshold
    * (n_shared / n_grams).
    *
    * Gram semantics are `SketchOps.gramHashes` over normalized text:
    * distinct word n-grams, documents shorter than n contribute their
    * whole remainder as one gram. Hash-space intersection counts equal
    * string-space counts (64-bit xxhash collisions are noise; the
    * cross-engine gate recomputes the counts from gram STRINGS in DuckDB
    * and would fail loudly on one).
    */
  def overlap(train: DataFrame, evalCorpus: DataFrame, textCol: String,
      idCol: String, n: Int): DataFrame = {
    val evalGrams = evalCorpus
      .filter(col(textCol).isNotNull)
      .select(explode(SketchExpressions.gramHashes(
        Dedup.normalized(col(textCol)), n)).as("_g"))
      .distinct()
    val trainGrams = train
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        SketchExpressions.gramHashes(Dedup.normalized(col(textCol)), n).as("_gs"))
      .select(col(idCol), size(col("_gs")).cast("long").as("n_grams"),
        explode(col("_gs")).as("_g"))
    trainGrams.join(broadcast(evalGrams), "_g")
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col(idCol), col("n_shared"), col("n_grams"))
  }

  /** SEMANTIC decontamination: flag training docs whose embedding is
    * near-identical to any eval-set embedding — catches paraphrased or
    * reformatted benchmark leakage that n-gram overlap misses entirely.
    *
    * Scale shape: eval sets are small by nature, so their (normalized,
    * packed) vectors ship as LITERALS and the whole operator is ONE
    * codegen'd scan — a fold of packed-kernel dot products per train row,
    * no join, no shuffle (the emb_cluster assignment pattern). An eval set
    * too big for literals becomes a broadcast join of the same kernel;
    * the corpus side never moves either way. Returns
    * (`idCol`, max_cosine, contaminated) for every train row with a
    * finite-norm vector; `threshold` flags ≥. */
  def semanticOverlap(train: DataFrame, evalVecs: Seq[(Long, Array[Double])],
      vecCol: String, idCol: String, threshold: Double): DataFrame = {
    import graft.functions.VecExpressions.{packVec, packedDot}
    import graft.functions.VecOps
    import org.apache.spark.sql.catalyst.util.ArrayData
    require(evalVecs.nonEmpty, "semanticOverlap needs eval vectors")
    // raw vectors + a norm literal each: cos = dot/(|p|·|e|), the same
    // accumulation shape the ann gates already proved agrees with SQL
    // cosine to well below the rounding cut
    val evalLits = evalVecs.map { case (_, v) =>
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      require(n > 0 && java.lang.Double.isFinite(n),
        "eval vector must have a finite positive norm")
      (lit(VecOps.pack(ArrayData.toArrayData(v))), n)
    }
    val withP = train
      .select(col(idCol),
        packVec(col(vecCol).cast("array<double>")).as("_p"))
      .withColumn("_n", sqrt(packedDot(col("_p"), col("_p"))))
      .filter(col("_n") > 0 && !isnan(col("_n")) &&
        col("_n") < Double.PositiveInfinity)
    val maxCos = evalLits.map { case (e, en) =>
      packedDot(col("_p"), e) / (col("_n") * lit(en))
    }.reduce(greatest(_, _))
    withP.select(col(idCol),
      round(maxCos, 6).as("max_cosine"),
      (round(maxCos, 6) >= threshold).cast("int").as("contaminated"))
  }
}
