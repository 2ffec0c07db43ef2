package graft.pipeline

import java.net.URI
import java.nio.charset.StandardCharsets
import graft.SparkSpec

class TaskServerSpec extends SparkSpec {

  // java.net.http.HttpClient: HttpURLConnection cannot send PATCH
  private lazy val client = java.net.http.HttpClient.newHttpClient()

  private def http(method: String, url: String,
      body: Option[String] = None): (Int, String) = {
    val pub = body match {
      case Some(b) => java.net.http.HttpRequest.BodyPublishers
        .ofString(b, StandardCharsets.UTF_8)
      case None => java.net.http.HttpRequest.BodyPublishers.noBody()
    }
    val req = java.net.http.HttpRequest.newBuilder(URI.create(url))
      .method(method, pub).build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("serve: POST /tasks queues an import; worker completes it") {
    val srv = new TaskServer(spark, port = 0) // ephemeral port
    val port = srv.start()
    try {
      val out = java.nio.file.Files.createTempDirectory("graft-serve").toString
      val (code, resp) = http("POST", s"http://127.0.0.1:$port/tasks",
        Some(s"""{"source":"${fixture("mydump")}","out":"$out"}"""))
      assert(code === 200 && resp.contains("\"id\":1"))
      // poll until the worker finishes
      var status = ""
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (status != "imported" && status != "failed" &&
          System.nanoTime() < deadline) {
        Thread.sleep(300)
        val (_, t) = http("GET", s"http://127.0.0.1:$port/tasks/1")
        status = """"status":"([a-z]+)"""".r.findFirstMatchIn(t)
          .map(_.group(1)).getOrElse("")
      }
      assert(status === "imported")
      val (_, list) = http("GET", s"http://127.0.0.1:$port/tasks")
      assert(list.contains("mdb.items:5"))
      // the import really landed
      assert(spark.read.parquet(s"$out/mdb/items").count() === 5)
      // /progress/task: the finished task reports every table done (s:2)
      // with written == total, task-level s:2, and live IO metrics
      val (pc, prog) = http("GET", s"http://127.0.0.1:$port/progress/task")
      assert(pc === 200, prog)
      assert(prog.contains("\"mdb.items\":"), prog)
      val (w, z) = (""""mdb.items":\{"w":(\d+),"z":(\d+),"s":2""".r
        .findFirstMatchIn(prog).map(m => (m.group(1).toLong, m.group(2).toLong)))
        .getOrElse(fail(s"no finished mdb.items entry in $prog"))
      assert(w === z && z > 0, prog)
      assert(prog.matches(""".*"s":2,"metrics":\{.*"""), prog)
      assert("""\"bytes_read\":(\d+)""".r.findFirstMatchIn(prog)
        .exists(_.group(1).toLong > 0), prog)
      // /progress/table: per-chunk detail; unknown table → 404
      val (tc, tbl) = http("GET",
        s"http://127.0.0.1:$port/progress/table?t=mdb.items")
      assert(tc === 200 && tbl.contains("\"chunks\":["), tbl)
      assert(""""rows":(\d+),"s":2""".r.findFirstMatchIn(tbl)
        .exists(_.group(1).toLong == 5), tbl)
      assert(http("GET",
        s"http://127.0.0.1:$port/progress/table?t=no.such")._1 === 404)
      // 404 for unknown task, 400 for bad body
      assert(http("GET", s"http://127.0.0.1:$port/tasks/99")._1 === 404)
      assert(http("POST", s"http://127.0.0.1:$port/tasks",
        Some("""{"nope":1}"""))._1 === 400)
    } finally srv.stop()
  }

  test("POST /tasks accepts a tidb-lightning.toml body (reference lightning.go:336-374)") {
    val srv = new TaskServer(spark, port = 0)
    val port = srv.start()
    try {
      val out = java.nio.file.Files.createTempDirectory("graft-toml").toString
      val toml =
        s"""[lightning]
           |table-concurrency = 2
           |
           |[tidb]
           |sql-mode = 'ALLOW_INVALID_DATES'
           |
           |[checkpoint]
           |enable = false
           |
           |[mydumper]
           |data-source-dir = "${fixture("mydump")}"
           |
           |[graft]
           |out-dir = "$out"
           |""".stripMargin
      val (code, resp) = http("POST", s"http://127.0.0.1:$port/tasks", Some(toml))
      assert(code === 200, resp)
      val id = """"id":(\d+)""".r.findFirstMatchIn(resp).get.group(1).toLong
      assert(awaitStatus(port, id, Set("imported", "failed")) === "imported")
      assert(spark.read.parquet(s"$out/mdb/items").count() === 5)
      // unknown keys → the reference's rejection, as a 400
      val (bad, msg) = http("POST", s"http://127.0.0.1:$port/tasks",
        Some("[mydumper]\ndata-source-dir = '/x'\ntypo-key = 1\n"))
      assert(bad === 400 && msg.contains("unknown configuration options"), msg)
      // missing out-dir → 400
      assert(http("POST", s"http://127.0.0.1:$port/tasks",
        Some("[mydumper]\ndata-source-dir = '/x'\n"))._1 === 400)
      // the /web frontend serves over the same data surface
      val (wc, page) = http("GET", s"http://127.0.0.1:$port/web")
      assert(wc === 200 && page.contains("graft import progress") &&
        page.contains("/progress/task"), page.take(200))
    } finally srv.stop()
  }

  private def status(port: Int, id: Long): String = {
    val (_, t) = http("GET", s"http://127.0.0.1:$port/tasks/$id")
    """"status":"([a-z]+)"""".r.findFirstMatchIn(t).map(_.group(1)).getOrElse("")
  }

  private def awaitStatus(port: Int, id: Long, want: Set[String],
      timeoutSec: Int = 120): String = {
    val deadline = System.nanoTime() + timeoutSec * 1000L * 1000 * 1000
    var s = status(port, id)
    while (!want.contains(s) && System.nanoTime() < deadline) {
      Thread.sleep(50)
      s = status(port, id)
    }
    s
  }

  /** A scratch source dir with `n` small single-file tables — a multi-job
    * import with a wide window for mid-import cancellation. */
  private def multiTableSource(n: Int): String = {
    val src = java.nio.file.Files.createTempDirectory("graft-cancel").toFile
    (1 to n).foreach { i =>
      java.nio.file.Files.writeString(
        new java.io.File(src, f"cdb.t$i%02d.csv").toPath,
        (1 to 500).map(r => s"$r,name_$r").mkString("", "\n", "\n"))
      java.nio.file.Files.writeString(
        new java.io.File(src, f"cdb.t$i%02d-schema.sql").toPath,
        // per-table varchar width: schemas must DIFFER so small-table
        // batching doesn't collapse the run into one job — this suite
        // exercises the sequential path's between-tables cancel gate
        s"CREATE TABLE `t$i` (`id` int(11) NOT NULL, `v` varchar(${16 + i}))")
    }
    src.getAbsolutePath
  }

  test("pause gates the worker; cancel dequeues a queued task; reorder works") {
    val srv = new TaskServer(spark, port = 0)
    val port = srv.start()
    try {
      assert(http("PUT", s"http://127.0.0.1:$port/pause")._1 === 200)
      assert(http("GET", s"http://127.0.0.1:$port/pause")._2
        .contains("\"paused\":true"))
      val out = java.nio.file.Files.createTempDirectory("graft-p").toString
      def post(tag: String): Long = {
        val (_, resp) = http("POST", s"http://127.0.0.1:$port/tasks",
          Some(s"""{"source":"${fixture("mydump")}","out":"$out/$tag"}"""))
        """"id":(\d+)""".r.findFirstMatchIn(resp).get.group(1).toLong
      }
      val a = post("a"); val b = post("b"); val c = post("c")
      Thread.sleep(400) // worker must NOT pick anything up while paused
      assert(Seq(a, b, c).forall(status(port, _) == "queued"))
      // cancel the queued middle task
      assert(http("DELETE", s"http://127.0.0.1:$port/tasks/$b")._1 === 200)
      assert(status(port, b) === "canceled")
      // move c in front of a, then release the gate
      assert(http("PATCH", s"http://127.0.0.1:$port/tasks/$c/front")._1 === 200)
      assert(http("PUT", s"http://127.0.0.1:$port/resume")._1 === 200)
      // c must leave the queue before a does (it was moved to the front)
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      var cLeft = false
      var ok = false
      while (!ok && System.nanoTime() < deadline) {
        val (sa, sc) = (status(port, a), status(port, c))
        if (sc != "queued") cLeft = true
        if (sa != "queued") { ok = true; assert(cLeft, "a started before c") }
        Thread.sleep(20)
      }
      assert(awaitStatus(port, a, Set("imported", "failed")) === "imported")
      assert(awaitStatus(port, c, Set("imported", "failed")) === "imported")
      assert(status(port, b) === "canceled") // stayed canceled
      // PATCH on a finished task → 404
      assert(http("PATCH", s"http://127.0.0.1:$port/tasks/$a/back")._1 === 404)
    } finally srv.stop()
  }

  test("DELETE cancels a RUNNING import mid-flight") {
    val srv = new TaskServer(spark, port = 0)
    val port = srv.start()
    try {
      val out = java.nio.file.Files.createTempDirectory("graft-c").toString
      val (_, resp) = http("POST", s"http://127.0.0.1:$port/tasks",
        Some(s"""{"source":"${multiTableSource(25)}","out":"$out"}"""))
      val id = """"id":(\d+)""".r.findFirstMatchIn(resp).get.group(1).toLong
      assert(awaitStatus(port, id, Set("running")) === "running")
      assert(http("DELETE", s"http://127.0.0.1:$port/tasks/$id")._1 === 200)
      val fin = awaitStatus(port, id, Set("canceled", "imported", "failed"))
      // 25 sequential table restores give a wide window — the cancel gate
      // between jobs makes this deterministic unless the whole import beat
      // the DELETE round-trip
      assert(fin === "canceled", s"expected canceled, got $fin")
      // the session must stay usable for the next task
      val (_, r2) = http("POST", s"http://127.0.0.1:$port/tasks",
        Some(s"""{"source":"${fixture("mydump")}","out":"$out-next"}"""))
      val id2 = """"id":(\d+)""".r.findFirstMatchIn(r2).get.group(1).toLong
      assert(awaitStatus(port, id2, Set("imported", "failed")) === "imported")
    } finally srv.stop()
  }
}
