package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness (optimization rounds): time one or more
  * registered queries in isolation, N repetitions each, with the same
  * session configuration as [[Bench]], and optionally dump
  * `.explain("formatted")` for each. Usage:
  *
  *   runMain graft.Profile <name[,name...]> [reps] [explain]
  *
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench. Prints one
  * JSON line per (query, rep) plus a min/median summary — min-of-N
  * isolates code cost from JIT/page-cache noise, exactly the guide §1
  * discipline. Not part of the driver contract; changes nothing the
  * bench measures.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q1_agg"))
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val doExplain = args.contains("explain")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.javaCharsets", "true")
      .getOrCreate()
    // per-job timing: GRAFT_PROFILE_INFO=1 keeps DAGScheduler INFO lines
    // ("Job N finished ... took X s") so a gate's time splits into its
    // actual jobs — the §1 stage-level view without a UI
    spark.sparkContext.setLogLevel(
      if (sys.env.contains("GRAFT_PROFILE_INFO")) "INFO" else "WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    for (name <- names) {
      val q = SparkEntry.queries(name)
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val df = q(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        df.count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"""{"query":"$name","rep":$i,"sec":$s%.3f,"build_sec":$tBuild%.3f}""")
        s
      }
      if (doExplain) {
        val plan = q(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val out = java.nio.file.Path.of("target", s"plan_$name.txt")
        java.nio.file.Files.writeString(out, plan)
        println(s"""{"query":"$name","plan":"$out"}""")
      }
      println(f"""{"query":"$name","min":${times.min}%.3f,"median":${
        times.sorted.apply(times.size / 2)}%.3f}""")
    }
    spark.stop()
  }
}
