package graft.pipeline

/** Cooperative pause gate for the import dataflow (reference:
  * lightning/common/pause.go — DeliverPauser gates the delivery loops;
  * here the unit of pause is one chunk/table job, checked between job
  * submissions). `waitIfPaused` blocks while paused; `resume` releases
  * every waiter. */
final class Pauser {
  private val lock = new Object
  @volatile private var paused = false

  def pause(): Unit = lock.synchronized { paused = true }

  def resume(): Unit = lock.synchronized {
    paused = false
    lock.notifyAll()
  }

  def isPaused: Boolean = paused

  /** Block until resumed (no-op when running). */
  def waitIfPaused(): Unit = lock.synchronized {
    while (paused) lock.wait()
  }
}
