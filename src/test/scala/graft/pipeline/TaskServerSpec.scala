package graft.pipeline

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import graft.SparkSpec

class TaskServerSpec extends SparkSpec {

  private def http(method: String, url: String,
      body: Option[String] = None): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes(StandardCharsets.UTF_8))
    }
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = new String(in.readAllBytes(), StandardCharsets.UTF_8)
    (code, text)
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
      // 404 for unknown task, 400 for bad body
      assert(http("GET", s"http://127.0.0.1:$port/tasks/99")._1 === 404)
      assert(http("POST", s"http://127.0.0.1:$port/tasks",
        Some("""{"nope":1}"""))._1 === 400)
    } finally srv.stop()
  }
}
