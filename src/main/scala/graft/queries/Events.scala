package graft.queries

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.util.Tables

/** Event-stream queries: real Structured Streaming (AvailableNow) windowed
  * aggregation, and stateful sessionization — both hash-matched against
  * batch-SQL oracles (tumbling windows are floor-division; sessions are
  * gaps-and-islands).
  */
object Events {

  /** Watermarked tumbling-window agg via readStream → writeStream(memory).
    * The checkpoint dir is wiped per run so replays are deterministic. */
  def q_stream_window(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    EventStream.windowedCounts(s, s"$dir/events.parquet",
      cp.getAbsolutePath, windowMinutes = 60)
  }

  val q_stream_window_sql: String =
    """SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT)
      |   AS window_start_us,
      | event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Streaming dedup: planted duplicate events collapse via watermarked
    * dropDuplicates; the aggregate of the deduped stream equals the batch
    * aggregate of the raw table. */
  def q_stream_dedup(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream", s"cp_dedup_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    EventStream.dedupedCounts(s, s"$dir/events.parquet", cp.getAbsolutePath)
      .orderBy("event_type")
  }

  val q_stream_dedup_sql: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1""".stripMargin

  /** Gap-based sessionization via the sorted-iterator fold (O(1) state per
    * partition — no per-user history materialization). */
  def q_sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = Tables.events(s, dir)
      .select(col("user_id"), col("ts").as("ts_us"), col("event_type"),
        col("value"))
      .as[EventStream.Ev]
    EventStream.sessionizeSorted(evs, gapMinutes = 30)
      .toDF()
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
        col("n_events"),
        round(col("total_value"), 4).as("total_value"))
  }

  val q_sessionize_sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, value,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
      |         OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
      |           IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |s AS (
      |  SELECT *, SUM(new_session)
      |    OVER (PARTITION BY user_id ORDER BY ts_us
      |          ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM e)
      |SELECT user_id,
      |  MIN(ts_us) AS session_start_us,
      |  MAX(ts_us) AS session_end_us,
      |  CAST(COUNT(*) AS INT) AS n_events,
      |  round(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE), 4)
      |    AS total_value
      |FROM s GROUP BY user_id, session_id""".stripMargin

  /** JSON column surface (reference type table §1.2: JSON → StringType +
    * from_json/get_json_object): extract, validate, aggregate. */
  def q_json(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_valid"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
  }

  val q_json_sql: String =
    """SELECT event_type,
      | COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_valid,
      | CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      | MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
      | MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
      |FROM events GROUP BY event_type""".stripMargin

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }
}
