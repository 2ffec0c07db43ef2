package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.LinkedBlockingQueue
import java.util.concurrent.atomic.AtomicLong
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import graft.operators.SqlMode
import graft.sources.TableFilter

/** Server mode / task queue (reference: lightning.go:149-167 server setup,
  * 288-517 task queue + HTTP API): imports are POSTed to a long-running
  * process and drained sequentially by one worker — the reference
  * serializes tasks the same way, since each import saturates the
  * cluster's ingest bandwidth.
  *
  *   POST /tasks   {"source":"/dump","out":"/warehouse"[,"strict":true]}
  *                 → {"id":N}
  *   GET  /tasks   → [{"id":N,"status":"queued|running|imported|failed",…}]
  *   GET  /tasks/N → one task document
  *
  * Built on the JDK's HttpServer — zero new dependencies; Spark jobs run
  * on the session the server owns, so queue order = job order.
  */
final class TaskServer(spark: SparkSession, port: Int = 8289) {

  final class Task(val id: Long, val source: String, val out: String,
      val strict: Boolean) {
    @volatile var status: String = "queued"
    @volatile var detail: String = ""
  }

  private val ids = new AtomicLong(0)
  private val queue = new LinkedBlockingQueue[Task]()
  private val tasks = new java.util.concurrent.ConcurrentHashMap[Long, Task]()
  private var server: HttpServer = _
  @volatile private var running = true

  private val worker = new Thread(() => {
    while (running) {
      val t = queue.poll(200, java.util.concurrent.TimeUnit.MILLISECONDS)
      if (t != null) {
        t.status = "running"
        try {
          val cfg = ImportConfig(sourceDir = t.source, outDir = t.out,
            sqlMode = if (t.strict) SqlMode.Strict else SqlMode.Lenient,
            filter = TableFilter())
          val reports = new ImportPipeline(spark, cfg).run()
          t.detail = reports.map(r =>
            s"${r.db}.${r.table}:${r.rows}").mkString(",")
          t.status = "imported"
        } catch {
          case e: Throwable =>
            t.status = "failed"
            t.detail = String.valueOf(e.getMessage).take(500)
        }
      }
    }
  }, "graft-task-worker")

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def taskJson(t: Task): String =
    s"""{"id":${t.id},"source":${q(t.source)},"out":${q(t.out)},""" +
      s""""status":${q(t.status)},"detail":${q(t.detail)}}"""

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  private def strField(json: String, key: String): Option[String] =
    (s""""$key"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(json)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))

  /** Start; returns the bound port (pass port 0 for an ephemeral one). */
  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/tasks", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        val path = ex.getRequestURI.getPath.stripSuffix("/")
        (ex.getRequestMethod, path) match {
          case ("POST", "/tasks") =>
            val body = new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8)
            (strField(body, "source"), strField(body, "out")) match {
              case (Some(src), Some(out)) =>
                val t = new Task(ids.incrementAndGet(), src, out,
                  body.contains("\"strict\":true"))
                tasks.put(t.id, t)
                queue.put(t)
                respond(ex, 200, s"""{"id":${t.id}}""")
              case _ =>
                respond(ex, 400, """{"error":"source and out required"}""")
            }
          case ("GET", "/tasks") =>
            import scala.jdk.CollectionConverters._
            val all = tasks.values().asScala.toSeq.sortBy(_.id)
              .map(taskJson).mkString("[", ",", "]")
            respond(ex, 200, all)
          case ("GET", p) if p.startsWith("/tasks/") =>
            p.drop("/tasks/".length).toLongOption
              .flatMap(id => Option(tasks.get(id))) match {
              case Some(t) => respond(ex, 200, taskJson(t))
              case None => respond(ex, 404, """{"error":"no such task"}""")
            }
          case _ => respond(ex, 405, """{"error":"method not allowed"}""")
        }
      } catch {
        case e: Throwable =>
          respond(ex, 500, s"""{"error":${q(String.valueOf(e.getMessage))}}""")
      }
    })
    server.start()
    worker.setDaemon(true)
    worker.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    running = false
    if (server != null) server.stop(0)
  }
}
