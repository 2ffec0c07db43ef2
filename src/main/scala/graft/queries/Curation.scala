package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.util.Tables

/** LLM-data-pipeline queries over `documents` / `embeddings`: dedup family,
  * similarity search, text analysis, multimodal plumbing. Hash-matched
  * against DuckDB wherever the formula is SQL-expressible; candidate-pair
  * miners (LSH) are rows-only (deterministic but not one SQL expression).
  */
object Curation {

  private val NormSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', '', 'g'), '\\s+', ' ', 'g'))"

  /** Exact dedup on normalized-content fingerprint. */
  def dedup_exact(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .withColumn("fp", Dedup.fingerprint(col("text")))
    Dedup.exact(docs, col("fp"), col("doc_id"))
      .select("doc_id", "fp")
  }

  val dedup_exact_sql: String =
    s"""SELECT doc_id, fp FROM (
       |  SELECT doc_id, md5($NormSql) AS fp,
       |    ROW_NUMBER() OVER (PARTITION BY md5($NormSql) ORDER BY doc_id) AS rn
       |  FROM documents) WHERE rn = 1""".stripMargin

  /** Token + subword-unit counts. */
  def txt_tokens(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.subwordCount(col("text")).as("n_subwords"))

  val txt_tokens_sql: String =
    """SELECT doc_id,
      | CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |   t -> t != '')) AS BIGINT) AS n_tokens,
      | CAST(list_sum(list_transform(
      |   list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t != ''),
      |   t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords
      |FROM documents""".stripMargin

  /** Language-ID heuristic vs the labeled lang. */
  def txt_langid(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      TextAnalysis.langId(col("text")).as("lang_pred"))

  val txt_langid_sql: String =
    s"""SELECT doc_id, lang, ${TextAnalysis.langIdSql("text")} AS lang_pred
       |FROM documents""".stripMargin

  /** Quality scoring. */
  def txt_quality(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))

  val txt_quality_sql: String =
    s"""SELECT doc_id, ${TextAnalysis.qualityScoreSql("text")} AS quality
       |FROM documents""".stripMargin

  /** Rolling-hash fingerprint (rows-only: custom hash, not in DuckDB). */
  def txt_fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("_norm", Dedup.normalized(col("text")))
      .select(
        col("doc_id"),
        TextAnalysis.rollingFingerprintOf(col("_norm")).as("rolling_fp"),
        md5(col("_norm")).as("md5_fp"))

  /** MinHash+LSH near-dup pairs (rows-only). */
  def dedup_minhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(Tables.load(s, dir, "documents"), "text", "doc_id",
      k = 5, numHashes = 32, bands = 8, threshold = 0.35)
      .orderBy(col("id_a"), col("id_b"))

  /** SimHash near-dup pairs (rows-only). */
  def dedup_simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.load(s, dir, "documents"), "text", "doc_id",
      maxHamming = 12)
      .orderBy(col("id_a"), col("id_b"))

  /** n-gram Jaccard on LSH candidates (rows-only), through the
    * join-aggregate `exactJaccardPairs` — the shape that survives when the
    * corpus outgrows driver memory (gram tables are never broadcast or
    * materialized per pair; grams travel as hashed longs). The per-pair
    * `Dedup.jaccard(array_intersect)` variant remains available for
    * corpora small enough to broadcast, but the gate exercises the scale
    * path. */
  def dedup_ngram(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 10)
      .select("id_a", "id_b")
    val grams = docs
      .withColumn("_norm", Dedup.normalized(col("text")))
      .withColumn("_toks", Dedup.tokensOf(col("_norm")))
      .withColumn("_grams", Dedup.gramsOf(col("_toks"), 2))
      .select(col("doc_id"), col("_grams"))
    Dedup.exactJaccardPairs(pairs, grams)
      .withColumn("bigram_jaccard", round(col("jaccard"), 6))
      .filter(col("bigram_jaccard") >= 0.2)
      .select("id_a", "id_b", "bigram_jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Embedding cosine near-dup pairs via hyperplane LSH (rows-only).
    * Threshold sized for random synthetic vectors (cos ~ N(0, 1/8)): 0.25
    * ≈ 2σ keeps the result non-empty at every sf while still selective. */
  def dedup_embed(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDup(Tables.load(s, dir, "embeddings"),
      "embedding", "vec_id", planes = 3, threshold = 0.25)
      .orderBy("id_a", "id_b")

  /** Brute-force cosine top-k vs vec_id=0's embedding — hash-matched via
    * DuckDB's double-precision list_cosine_similarity (scores rounded to
    * 9 dp on both sides; ties broken by vec_id). */
  def ann_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0)
      .getSeq[Float](0).map(_.toDouble)
    Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0),
      "embedding", "vec_id", q, k = 20)
  }

  val ann_topk_sql: String =
    """SELECT vec_id, round(list_cosine_similarity(
      |    CAST(embedding AS DOUBLE[]),
      |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
      |  ), 9) AS score
      |FROM embeddings WHERE vec_id != 0
      |ORDER BY score DESC, vec_id LIMIT 20""".stripMargin

  /** LSH-bucketed ANN (rows-only: recall-trading prune). */
  def ann_lsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0)
      .getSeq[Float](0).map(_.toDouble)
    Similarity.lshTopK(emb.filter(col("vec_id") =!= 0),
      "embedding", "vec_id", q, k = 10, planes = 4)
  }

  /** Multimodal plumbing e2e (rows-only): payloads → decode stub →
    * frame sample → partition-batched features → per-type stats. */
  def multimodal_pipe(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticPayload(
      Tables.load(s, dir, "documents"), "doc_id", "text")
    val decoded = Multimodal.decodeStub(media)
    val framed = Multimodal.frameSample(decoded)
    val feats = Multimodal.extractFeatures(framed)
    feats.groupBy(col("media_type"), col("format"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        min(col("width")).as("min_w"), max(col("height")).as("max_h"),
        sum(size(col("frames"))).as("total_frames"),
        round(sum(aggregate(col("features"), lit(0.0), (a, v) => a + v)), 6)
          .as("feature_mass"))
      .orderBy("media_type")
  }
}
