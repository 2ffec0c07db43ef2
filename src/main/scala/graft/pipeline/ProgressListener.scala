package graft.pipeline

import java.util.concurrent.atomic.{AtomicLong, AtomicInteger}
import org.apache.spark.scheduler._

/** A4: progress counters — the role of the reference's Prometheus metrics +
  * web progress API (lightning/metric/metric.go:48-243,
  * lightning/web/progress.go), rebuilt on SparkListener events: Spark
  * already tracks per-task IO, so the listener just folds it into the
  * counters the reference exposes (read bytes, rows, finished/total units).
  */
final class ProgressListener extends SparkListener {
  val bytesRead = new AtomicLong(0)
  val recordsRead = new AtomicLong(0)
  val bytesWritten = new AtomicLong(0)
  val recordsWritten = new AtomicLong(0)
  val tasksCompleted = new AtomicInteger(0)
  val tasksFailed = new AtomicInteger(0)
  val stagesCompleted = new AtomicInteger(0)
  @volatile var startedAtMs: Long = System.currentTimeMillis()

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    Option(taskEnd.taskMetrics).foreach { m =>
      bytesRead.addAndGet(m.inputMetrics.bytesRead)
      recordsRead.addAndGet(m.inputMetrics.recordsRead)
      bytesWritten.addAndGet(m.outputMetrics.bytesWritten)
      recordsWritten.addAndGet(m.outputMetrics.recordsWritten)
    }
    if (taskEnd.reason == org.apache.spark.Success) tasksCompleted.incrementAndGet()
    else tasksFailed.incrementAndGet()
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
    stagesCompleted.incrementAndGet()

  /** Reference-style progress line: speed in MiB/s like the 28 MiB/s ETA
    * anchor (restore.go:491). */
  def summary(): String = {
    val secs = math.max(1e-3, (System.currentTimeMillis() - startedAtMs) / 1e3)
    val mibs = bytesRead.get() / 1048576.0
    f"read=${mibs}%.1f MiB (${mibs / secs}%.1f MiB/s), rows=${recordsRead.get()}, " +
      f"written=${bytesWritten.get() / 1048576.0}%.1f MiB/${recordsWritten.get()} rows, " +
      f"tasks=${tasksCompleted.get()} ok/${tasksFailed.get()} failed, " +
      f"stages=${stagesCompleted.get()}, elapsed=${secs}%.1f s"
  }
}
