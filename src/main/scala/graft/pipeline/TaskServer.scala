package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.LinkedBlockingDeque
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
  *   POST   /tasks          {"source":"/dump","out":"/wh"[,"strict":true]}
  *                          → {"id":N}
  *   GET    /tasks          → [{"id":N,"status":"queued|running|imported|
  *                              failed|canceled",…}]
  *   GET    /tasks/N        → one task document
  *   DELETE /tasks/N        → cancel: dequeues a queued task; aborts a
  *                            running one by cancelling its Spark job group
  *                            (reference handleDeleteOneTask,
  *                            lightning.go:376-410)
  *   PATCH  /tasks/N/front  → move a queued task to the queue head
  *   PATCH  /tasks/N/back   → move it to the tail (lightning.go:412-441)
  *   GET    /progress/task  → current task's per-table progress
  *                            {"t":{"db.tbl":{"w":done,"z":total,"s":0|1|2}},
  *                             "s":…,"metrics":{…}} (lightning.go:456-464)
  *   GET    /progress/table?t=db.tbl → per-chunk detail for one table
  *                            (lightning.go:467-481)
  *   GET    /pause          → {"paused":bool}
  *   PUT    /pause          → pause the dataflow: the running import stops
  *                            before its next chunk/table job and the
  *                            worker takes no new task (reference
  *                            DeliverPauser, lightning.go:483-517 +
  *                            common/pause.go)
  *   PUT    /resume         → release the gate
  *   GET    /web            → browsable progress page over the JSON above
  *                            (reference web/ frontend, lightning.go:120-132)
  *
  * Binds 127.0.0.1 by default — POST /tasks can overwrite the caller-given
  * output directory as the service user, so exposure must be an explicit
  * choice (`bindAddress`), mirroring the reference's configurable status
  * address. Built on the JDK's HttpServer — zero new dependencies; Spark
  * jobs run on the session the server owns, so queue order = job order.
  */
final class TaskServer(spark: SparkSession, port: Int = 8289,
    bindAddress: String = "127.0.0.1") {

  final class Task(val id: Long, val source: String, val out: String,
      val strict: Boolean,
      // full config for TOML-submitted tasks; (source, out, strict) above
      // remain the display/JSON surface
      val cfg: Option[ImportConfig] = None,
      // backend-declared sink (TOML `backend = "tidb"` → JdbcSink)
      val sink: Option[graft.sinks.Sink] = None) {
    @volatile var status: String = "queued"
    @volatile var detail: String = ""
    @volatile var cancelRequested: Boolean = false
  }

  private val ids = new AtomicLong(0)
  private val queue = new LinkedBlockingDeque[Task]()
  private val tasks = new java.util.concurrent.ConcurrentHashMap[Long, Task]()
  private val pauser = new Pauser
  // /progress surface (reference lightning.go:102-103 + web/progress.go):
  // the registry tracks the CURRENT task's per-table/per-chunk state (the
  // reference likewise broadcasts one current-task progress map); the
  // listener folds Spark's own task IO counters for a live speed readout
  private val registry = new ProgressRegistry
  private val listener = new ProgressListener
  private var server: HttpServer = _
  @volatile private var running = true
  @volatile private var current: Task = _

  private def jobGroup(t: Task): String = s"graft-task-${t.id}"

  private val worker = new Thread(() => {
    while (running) {
      pauser.waitIfPaused()
      val t = queue.poll(200, java.util.concurrent.TimeUnit.MILLISECONDS)
      if (t != null && pauser.isPaused) {
        // pause landed while we were blocked in poll(): hand the task back
        // (front — its turn is preserved) and re-enter the gate
        queue.addFirst(t)
      } else if (t != null && t.status == "queued") {
        t.status = "running"
        current = t
        // the task's jobs run under a cancellable group: DELETE /tasks/N
        // cancels the group and every Spark job it owns aborts
        spark.sparkContext.setJobGroup(jobGroup(t),
          s"graft import ${t.source} -> ${t.out}", interruptOnCancel = true)
        registry.startTask()
        try {
          val cfg = t.cfg.getOrElse(ImportConfig(
            sourceDir = t.source, outDir = t.out,
            sqlMode = if (t.strict) SqlMode.Strict else SqlMode.Lenient,
            filter = TableFilter()))
          val reports = new ImportPipeline(spark, cfg,
            sink = t.sink,
            pauser = Some(pauser),
            cancelled = () => t.cancelRequested,
            progress = Some(registry)).run()
          t.detail = reports.map(r =>
            s"${r.db}.${r.table}:${r.rows}").mkString(",")
          t.status = "imported"
          registry.endTask()
        } catch {
          case e: Throwable if t.cancelRequested =>
            t.status = "canceled"
            t.detail = String.valueOf(e.getMessage).take(200)
            registry.endTask(Some("canceled"))
          case e: Throwable =>
            t.status = "failed"
            t.detail = String.valueOf(e.getMessage).take(500)
            registry.endTask(Some(String.valueOf(e.getMessage).take(500)))
        } finally {
          spark.sparkContext.clearJobGroup()
          current = null
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

  /** Cancel semantics (reference handleDeleteOneTask): a running task's
    * job group is cancelled (its current Spark job aborts, the worker marks
    * it `canceled`); a queued task is dequeued in place. */
  private def cancel(id: Long): Boolean = Option(tasks.get(id)).exists { t =>
    val c = current
    if ((c ne null) && c.id == id) {
      t.cancelRequested = true
      spark.sparkContext.cancelJobGroup(jobGroup(t))
      true
    } else if (t.status == "queued") {
      // also raise the flag: if the worker polled this task but hasn't set
      // status="running"/current yet, the status write below loses the race
      // and the import would run anyway — the pipeline's gate() checks the
      // flag between chunk jobs and aborts promptly either way
      t.cancelRequested = true
      t.status = "canceled"
      queue.remove(t)
      true
    } else false
  }

  /** Queue surgery for queued tasks (reference MoveToFront/MoveToBack). */
  private def move(id: Long, front: Boolean): Boolean =
    Option(tasks.get(id)).exists { t =>
      if (t.status == "queued" && queue.remove(t)) {
        if (front) queue.addFirst(t) else queue.addLast(t)
        true
      } else false
    }

  /** Start; returns the bound port (pass port 0 for an ephemeral one). */
  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(bindAddress, port), 0)
    server.createContext("/tasks", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        val path = ex.getRequestURI.getPath.stripSuffix("/")
        (ex.getRequestMethod, path) match {
          case ("POST", "/tasks") =>
            val body = new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8)
            // content negotiation mirrors the reference's handlePostTask
            // (lightning.go:336-374): the body is a task CONFIG — there a
            // TOML document, here TOML or the legacy JSON shape. A body
            // that doesn't open with '{' is parsed as tidb-lightning.toml
            // (unknown keys rejected with the reference's message).
            if (!body.trim.startsWith("{")) {
              try {
                val loaded = graft.config.TomlImportConfig.load(body)
                val cfg = loaded.config
                if (cfg.sourceDir.isEmpty || cfg.outDir.isEmpty)
                  respond(ex, 400, """{"error":"mydumper.data-source-dir and [graft] out-dir required"}""")
                else {
                  cfg.validated()
                  val t = new Task(ids.incrementAndGet(), cfg.sourceDir,
                    cfg.outDir, cfg.sqlMode == SqlMode.Strict, Some(cfg),
                    sink = graft.config.TomlImportConfig.sinkFor(loaded))
                  tasks.put(t.id, t)
                  queue.put(t)
                  respond(ex, 200, s"""{"id":${t.id}}""")
                }
              } catch {
                case e: IllegalArgumentException =>
                  respond(ex, 400, s"""{"error":"cannot parse task (must be TOML): ${
                    String.valueOf(e.getMessage).replaceAll("[\"\\\\\n\r\t]", " ").take(300)}"}""")
              }
            } else (strField(body, "source"), strField(body, "out")) match {
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
          case ("DELETE", p) if p.startsWith("/tasks/") =>
            p.drop("/tasks/".length).toLongOption match {
              case Some(id) if cancel(id) => respond(ex, 200, "{}")
              case _ => respond(ex, 404, """{"error":"task ID not found"}""")
            }
          case ("PATCH", p) if p.startsWith("/tasks/") &&
              (p.endsWith("/front") || p.endsWith("/back")) =>
            val front = p.endsWith("/front")
            val idPart = p.drop("/tasks/".length).takeWhile(_ != '/')
            idPart.toLongOption match {
              case Some(id) if move(id, front) => respond(ex, 200, "{}")
              case _ => respond(ex, 404, """{"error":"task ID not found"}""")
            }
          case _ => respond(ex, 405, """{"error":"method not allowed"}""")
        }
      } catch {
        case e: Throwable =>
          respond(ex, 500, s"""{"error":${q(String.valueOf(e.getMessage))}}""")
      }
    })
    server.createContext("/pause", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = ex.getRequestMethod match {
        case "GET" => respond(ex, 200, s"""{"paused":${pauser.isPaused}}""")
        case "PUT" => pauser.pause(); respond(ex, 200, "{}")
        case _ => respond(ex, 405, """{"error":"only GET and PUT allowed"}""")
      }
    })
    server.createContext("/resume", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = ex.getRequestMethod match {
        case "PUT" => pauser.resume(); respond(ex, 200, "{}")
        case _ => respond(ex, 405, """{"error":"only PUT allowed"}""")
      }
    })
    // GET /progress/task  → current task's per-table {w,z,s,m} map
    // GET /progress/table?t=db.tbl → that table's per-chunk detail
    // (reference handleProgressTask/-Table, lightning.go:456-481); the
    // extra "metrics" object is the listener's live IO counters — the ETA
    // numerator (bytes/s) the reference gets from Prometheus
    server.createContext("/progress/task", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = ex.getRequestMethod match {
        case "GET" =>
          val body = registry.taskJson
          val m = s""","metrics":{"bytes_read":${listener.bytesRead.get()},""" +
            s""""rows_read":${listener.recordsRead.get()},""" +
            s""""bytes_written":${listener.bytesWritten.get()},""" +
            s""""rows_written":${listener.recordsWritten.get()}}"""
          respond(ex, 200, body.patch(body.length - 1, m + "}", 1))
        case _ => respond(ex, 405, """{"error":"only GET allowed"}""")
      }
    })
    server.createContext("/progress/table", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = ex.getRequestMethod match {
        case "GET" =>
          val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
          val name = query.split("&").collectFirst {
            case kv if kv.startsWith("t=") => java.net.URLDecoder.decode(
              kv.drop(2), "UTF-8")
          }.getOrElse("")
          registry.tableJson(name) match {
            case Some(json) => respond(ex, 200, json)
            case None => respond(ex, 404,
              s"""{"error":${q(s"no such table: $name")}}""")
          }
        case _ => respond(ex, 405, """{"error":"only GET allowed"}""")
      }
    })
    // browsable progress frontend (reference web/ served at /web —
    // lightning.go:120-132): one static page polling the JSON surface
    // above; zero dependencies, so it ships inside the jar as a string
    server.createContext("/web", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = ex.getRequestMethod match {
        case "GET" =>
          val bytes = WebPage.getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        case _ => respond(ex, 405, """{"error":"only GET allowed"}""")
      }
    })
    spark.sparkContext.addSparkListener(listener)
    server.start()
    worker.setDaemon(true)
    worker.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    running = false
    pauser.resume() // release a paused worker so it can observe shutdown
    spark.sparkContext.removeSparkListener(listener)
    if (server != null) server.stop(0)
  }

  /** The /web frontend: task queue + live per-table progress bars +
    * pause/resume, polling the same /tasks and /progress JSON the API
    * serves. Plain HTML/JS — the role of the reference's `web/` React
    * bundle without shipping a build toolchain. */
  private val WebPage: String =
    """<!doctype html><html><head><meta charset="utf-8">
      |<title>graft import progress</title>
      |<style>
      | body{font-family:system-ui,sans-serif;margin:2rem;max-width:60rem}
      | h1{font-size:1.2rem} h2{font-size:1rem;margin-top:1.5rem}
      | table{border-collapse:collapse;width:100%}
      | td,th{border:1px solid #ccc;padding:.3rem .5rem;font-size:.85rem;text-align:left}
      | .bar{background:#eee;height:.8rem;width:12rem;display:inline-block}
      | .bar>div{background:#4a8;height:100%}
      | .failed .bar>div{background:#c55}
      | button{margin-right:.5rem}
      | #err{color:#c55}
      |</style></head><body>
      |<h1>graft import progress</h1>
      |<div>
      | <button onclick="fetch('/pause',{method:'PUT'}).then(poll)">pause</button>
      | <button onclick="fetch('/resume',{method:'PUT'}).then(poll)">resume</button>
      | <span id="paused"></span> <span id="err"></span>
      |</div>
      |<h2>task queue</h2><table id="tasks"><tr><th>id</th><th>source</th>
      |<th>out</th><th>status</th><th>detail</th></tr></table>
      |<h2>current task tables</h2><table id="tables"><tr><th>table</th>
      |<th>progress</th><th>bytes</th><th>state</th></tr></table>
      |<div id="metrics"></div>
      |<script>
      |const S = {0:'pending',1:'running',2:'done'};
      |function esc(s){const d=document.createElement('span');
      |  d.textContent=String(s);return d.innerHTML}
      |async function poll(){
      |  try{
      |    const [ts, pg, pa] = await Promise.all([
      |      fetch('/tasks').then(r=>r.json()),
      |      fetch('/progress/task').then(r=>r.json()),
      |      fetch('/pause').then(r=>r.json())]);
      |    document.getElementById('paused').textContent =
      |      pa.paused ? 'PAUSED' : 'running';
      |    let h='<tr><th>id</th><th>source</th><th>out</th><th>status</th><th>detail</th></tr>';
      |    for(const t of ts) h+=`<tr><td>${t.id}</td><td>${esc(t.source)}</td>
      |      <td>${esc(t.out)}</td><td>${esc(t.status)}</td><td>${esc(t.detail||'')}</td></tr>`;
      |    document.getElementById('tasks').innerHTML=h;
      |    let g='<tr><th>table</th><th>progress</th><th>bytes</th><th>state</th></tr>';
      |    for(const [name,v] of Object.entries(pg.t||{})){
      |      const pct = v.z>0 ? Math.min(100, 100*v.w/v.z) : 0;
      |      g+=`<tr class="${v.m?'failed':''}"><td>${esc(name)}</td>
      |        <td><span class="bar"><div style="width:${pct}%"></div></span>
      |        ${pct.toFixed(0)}%</td><td>${v.w}/${v.z}</td>
      |        <td>${v.m?('failed: '+esc(v.m)):(S[v.s]||v.s)}</td></tr>`;
      |    }
      |    document.getElementById('tables').innerHTML=g;
      |    const m=pg.metrics||{};
      |    document.getElementById('metrics').textContent =
      |      `read ${m.bytes_read||0} B / ${m.rows_read||0} rows; ` +
      |      `written ${m.bytes_written||0} B / ${m.rows_written||0} rows`;
      |    document.getElementById('err').textContent='';
      |  }catch(e){document.getElementById('err').textContent=' '+e}
      |}
      |poll(); setInterval(poll, 1000);
      |</script></body></html>
      |""".stripMargin
}
