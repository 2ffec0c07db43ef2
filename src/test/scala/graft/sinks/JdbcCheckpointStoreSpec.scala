package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** JDBC checkpoint driver against embedded Derby (on the Spark classpath)
  * — the same contract CommitLogSpec pins for the file driver. */
class JdbcCheckpointStoreSpec extends AnyFunSuite {

  private def freshStore(tag: String): JdbcCheckpointStore = {
    val out = java.nio.file.Files.createTempDirectory(s"jckpt-$tag").toString
    new JdbcCheckpointStore(s"jdbc:derby:memory:ckpt_$tag;create=true",
      new java.util.Properties(), out, new Configuration())
  }

  test("table state: write/read/overwrite/list/remove") {
    val store = freshStore("t1")
    assert(store.read("db", "t") === None)
    val st = TableState("db", "t", "loaded", 10, 0x1234L, 100, 20, "fp1", 7L)
    store.write(st)
    assert(store.read("db", "t") === Some(st))
    // upsert: a rewrite replaces, never duplicates
    val st2 = st.copy(status = "imported", rows = 11)
    store.write(st2)
    assert(store.read("db", "t") === Some(st2))
    store.write(TableState("adb", "a", "failed", 0, 0, 0, 0, "fp2", 7L))
    assert(store.listTables().map(s => (s.db, s.table))
      === Seq(("adb", "a"), ("db", "t")))
    store.remove("db", "t")
    assert(store.read("db", "t") === None)
    assert(store.listTables().size === 1)
  }

  test("chunk state: write/read/clear, files roundtrip with escapes") {
    val store = freshStore("t2")
    val cs1 = ChunkState("db", "t", "/d/a.sql+2", "tfp", 5, 0xabcL, 50, 10,
      Seq("part-0001.parquet", "we\"ird\\name.parquet"))
    val cs2 = ChunkState("db", "t", "/d/b.sql+1", "tfp", 3, 0xdefL, 30, 6)
    store.writeChunk(cs1); store.writeChunk(cs2)
    // other tables don't leak in
    store.writeChunk(ChunkState("db", "other", "/d/a.sql+2", "x", 1, 1, 1, 1))
    val got = store.readChunks("db", "t")
    assert(got === Map(cs1.chunkId -> cs1, cs2.chunkId -> cs2))
    // chunk rewrite replaces
    store.writeChunk(cs1.copy(rows = 6))
    assert(store.readChunks("db", "t")(cs1.chunkId).rows === 6)
    store.clearChunks("db", "t")
    assert(store.readChunks("db", "t") === Map.empty)
    assert(store.readChunks("db", "other").size === 1)
  }

  test("second store on the same database sees the state (shared driver)") {
    val out = java.nio.file.Files.createTempDirectory("jckpt-sh").toString
    val url = "jdbc:derby:memory:ckpt_shared;create=true"
    val a = new JdbcCheckpointStore(url, new java.util.Properties(), out,
      new Configuration())
    a.write(TableState("db", "t", "imported", 5, 1, 2, 3, "fp", 0L))
    // a second importer connecting to the same checkpoint DB resumes off
    // the first one's state — the reason this driver exists
    val b = new JdbcCheckpointStore(url, new java.util.Properties(), out,
      new Configuration())
    assert(b.read("db", "t").map(_.rows) === Some(5L))
  }

  test("writeIfAbsent: the primary key arbitrates, the loser adopts the winner") {
    val store = freshStore("cas")
    val a = TableState("d", "t", "loaded", 0, 0, 0, 0, "fp", 111L)
    val b = TableState("d", "t", "loaded", 0, 0, 0, 0, "fp", 222L)
    assert(store.writeIfAbsent(a).jobTsMicros === 111L)
    // second writer (another importer instance) must NOT overwrite: the
    // pinned job ts stays the first writer's
    assert(store.writeIfAbsent(b).jobTsMicros === 111L)
    assert(store.read("d", "t").map(_.jobTsMicros) === Some(111L))
  }
}
