package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (dev loop: dump just
    // the queries under iteration; the driver always runs the full set)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS); Spark has no ns timestamp —
      // read as epoch-nanos long (queries expose epoch-µs, DuckDB's native
      // parquet read precision, for oracle parity).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reference supports GB18030 data files (S7) - allow JVM charsets
      .config("spark.sql.legacy.javaCharsets", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // staleness watermark for scripts/check.py: any result dir OLDER than
    // this stamp predates the current run (leftover from an earlier dump);
    // written FIRST so same-run dirs can never be flagged
    Files.writeString(Paths.get(s"$outDir/_fresh_stamp"),
      java.time.Instant.now().toString)
    // A failed query must stay VISIBLE in the driver's gate: r7 had 9
    // queries throw at analysis time, Verify logged them to stderr and
    // wrote nothing, and CORRECTNESS silently shrank 105→96 "all pass".
    // Now every registered query produces a result dir — on error a
    // one-row parquet with a single `err` column (schema/hash-mismatches
    // loudly against any oracle instead of disappearing) — plus an
    // _errors.json sidecar naming each failure.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        errors(name) = msg
        System.err.println(s"[verify] $name failed: $msg")
        import spark.implicits._
        try Seq(s"QUERY FAILED: ${msg.take(500)}").toDF("err")
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        catch { case e2: Throwable =>
          System.err.println(s"[verify] $name error-marker write failed: $e2")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // NOTE: dumped AFTER the queries run — the data-dependent oracle defs
    // (ann_ivf_md5 / dedup_semantic_md5 centroid literals) resolve from
    // state the exporting gates set. scripts/check.py's staleness probe
    // compares against _fresh_stamp (written below), not this file.
    // On a FILTERED run (3rd arg), merge with the on-disk oracle file:
    // un-run queries keep their last-full-dump SQL, so the data-dependent
    // defs that fall back to a WHERE 1=0 placeholder when their exporting
    // gate didn't run can't clobber the valid literals paired with the
    // surviving full-run result dirs.
    val fresh = SparkEntry.oracleSql
    val merged: Map[String, String] = only match {
      case Some(names) =>
        val path = Paths.get(s"$outDir/oracle_sql.json")
        val onDisk: Map[String, String] =
          if (Files.exists(path)) {
            import scala.jdk.CollectionConverters._
            try new com.fasterxml.jackson.databind.ObjectMapper()
              .readValue(Files.readString(path),
                classOf[java.util.Map[String, String]]).asScala.toMap
            catch { case e: Throwable =>
              System.err.println(s"[verify] oracle_sql.json unreadable, " +
                s"rewriting from scratch: $e")
              Map.empty
            }
          } else Map.empty
        onDisk ++ fresh.filter { case (k, _) => names.contains(k) }
      case None => fresh
    }
    val json = merged
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v.take(500))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (errors.nonEmpty) System.err.println(
      s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
