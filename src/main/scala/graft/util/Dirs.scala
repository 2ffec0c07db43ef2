package graft.util

/** Local scratch-directory helpers for gates, fixtures and the bench —
  * ONE recursive delete instead of a per-object copy (a fix to deletion
  * behavior must not need applying in a dozen places). Driver-local
  * `java.io.File` on purpose: these are `target/` scratch dirs; durable
  * table I/O goes through the Hadoop FS in `operators.Export`. */
object Dirs {
  def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }
}
