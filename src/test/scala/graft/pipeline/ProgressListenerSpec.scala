package graft.pipeline

import graft.SparkSpec
import graft.sources.TableFilter

class ProgressListenerSpec extends SparkSpec {

  test("A4: counters fold task metrics from a real import") {
    val listener = new ProgressListener
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = java.nio.file.Files.createTempDirectory("graft-prog").toString
      val cfg = ImportConfig(sourceDir = fixture("mydump"), outDir = out,
        filter = TableFilter(doTables = Seq(("mdb", "items"))))
      val report = new ImportPipeline(spark, cfg).run().head
      assert(report.rows === 5)
      // listener events are posted asynchronously — poll until they land
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (listener.recordsWritten.get() < 5 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(listener.tasksCompleted.get() > 0)
      assert(listener.tasksFailed.get() === 0)
      assert(listener.stagesCompleted.get() > 0)
      assert(listener.recordsWritten.get() >= 5) // the 5 imported rows
      assert(listener.bytesWritten.get() > 0)
      val s = listener.summary()
      assert(s.contains("MiB/s") && s.contains("tasks="))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
