package graft.operators

import org.apache.spark.sql.DataFrame
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
}
