package graft.tasks

import graft.SparkSpec
import graft.runner.{TaskLog, TaskRunner}
import java.io.BufferedReader
import java.io.InputStreamReader
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Runtime exercise of the network-facing and reflective task types the
  * sandbox cannot hit for real (VERDICT r01 "What's missing" #3):
  * download against a local com.sun.net.httpserver, ftp-upload against an
  * in-process RFC 959 stub speaking the client's USER/PASS/MDTM/TYPE/
  * PASV/STOR subset, and exec through a reflective object main.
  */
class NetworkTaskSpec extends SparkSpec {

  private def setup(): String = {
    val wd = tmpDir("graft_net_")
    Seq("input", "output", "log").foreach(d => Files.createDirectories(Paths.get(s"$wd/$d")))
    wd
  }

  private def run(wd: String, json: String): Unit = {
    val f = s"$wd/task.json"
    Files.writeString(Paths.get(f), json)
    TaskRunner.runFile(f, spark, wd, TaskLog.Silent)
  }

  // ---- download ------------------------------------------------------------

  test("download task fetches over HTTP with params and headers") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var seenQuery: String = null
    @volatile var seenHeader: String = null
    server.createContext("/data.csv", (ex: com.sun.net.httpserver.HttpExchange) => {
      seenQuery = ex.getRequestURI.getQuery
      seenHeader = ex.getRequestHeaders.getFirst("X-Token")
      val body = "a;b\n1;2\n".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val wd = setup()
      run(wd,
        s"""{"tasks": [{
           |  "type": "download", "name": "dl",
           |  "source": {"url": "http://127.0.0.1:${server.getAddress.getPort}/data.csv",
           |             "params": {"since": "2024-01-01"},
           |             "headers": {"X-Token": "t0k"}},
           |  "target": {"path": "input", "file": "fetched.csv"}
           |}]}""".stripMargin)
      assert(Files.readString(Paths.get(s"$wd/input/fetched.csv")) == "a;b\n1;2\n")
      assert(seenQuery == "since=2024-01-01")
      assert(seenHeader == "t0k")
    } finally server.stop(0)
  }

  test("download task surfaces HTTP errors") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/gone", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    server.start()
    try {
      val wd = setup()
      val e = intercept[java.io.IOException] {
        run(wd,
          s"""{"tasks": [{
             |  "type": "download", "name": "dl",
             |  "source": {"url": "http://127.0.0.1:${server.getAddress.getPort}/gone"},
             |  "target": {"path": "input", "file": "x"}
             |}]}""".stripMargin)
      }
      assert(e.getMessage.contains("404"))
    } finally server.stop(0)
  }

  // ---- ftp-upload ----------------------------------------------------------

  /** Single-session FTP stub: the control grammar FtpClient speaks, with a
    * scriptable MDTM response and captured STOR payloads.
    */
  private final class FtpStub extends Thread {
    private val server = new ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    def port: Int = server.getLocalPort
    @volatile var mdtmOf: String => Option[String] = _ => None // path -> yyyyMMddHHmmss
    val stored = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    setDaemon(true)

    override def run(): Unit =
      try while (!server.isClosed) handle(server.accept())
      catch { case _: Exception => () }

    private def handle(s: Socket): Unit = {
      val in = new BufferedReader(
        new InputStreamReader(s.getInputStream, StandardCharsets.ISO_8859_1))
      val out = s.getOutputStream
      def reply(r: String): Unit = {
        out.write((r + "\r\n").getBytes(StandardCharsets.ISO_8859_1)); out.flush()
      }
      reply("220 stub ready")
      var dataServer: ServerSocket = null
      var line = in.readLine()
      while (line != null) {
        log.add(line)
        val cmd = line.takeWhile(_ != ' ')
        val arg = line.drop(cmd.length).trim
        cmd match {
          case "USER" => reply("331 need password")
          case "PASS" => reply("230 logged in")
          case "TYPE" => reply("200 binary")
          case "MDTM" => mdtmOf(arg) match {
            case Some(ts) => reply(s"213 $ts")
            case None     => reply("550 not found")
          }
          case "PASV" =>
            dataServer = new ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
            val p = dataServer.getLocalPort
            reply(s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256})")
          case "STOR" =>
            reply("150 opening data connection")
            val d = dataServer.accept()
            val bytes = d.getInputStream.readAllBytes()
            d.close(); dataServer.close()
            stored.put(arg, bytes)
            reply("226 transfer complete")
          case "QUIT" => reply("221 bye"); s.close(); return
          case _ => reply("502 not implemented")
        }
        line = in.readLine()
      }
    }

    def shutdown(): Unit = server.close()
  }

  private def ftpTask(wd: String, port: Int): String =
    s"""{"connections": [
       |  {"name": "ftp", "host": "127.0.0.1", "port": $port,
       |   "user": "u", "pass": "p"}],
       | "tasks": [{
       |  "type": "ftp-upload", "name": "up",
       |  "source": {"path": "output", "file": "report.csv"},
       |  "target": {"connection": "ftp", "path": "/remote"}
       |}]}""".stripMargin

  test("ftp-upload stores when the remote file is absent (upload_if_newer)") {
    val stub = new FtpStub
    stub.start()
    try {
      val wd = setup()
      Files.writeString(Paths.get(s"$wd/output/report.csv"), "x;y\n1;2\n")
      run(wd, ftpTask(wd, stub.port))
      assert(new String(stub.stored.get("/remote/report.csv"),
        StandardCharsets.ISO_8859_1) == "x;y\n1;2\n")
      assert(stub.log.contains("MDTM /remote/report.csv"), "must probe mtime first")
    } finally stub.shutdown()
  }

  test("ftp-upload skips when the remote file is newer (upload_if_newer)") {
    val stub = new FtpStub
    stub.mdtmOf = _ => Some("20990101000000") // remote far in the future
    stub.start()
    try {
      val wd = setup()
      Files.writeString(Paths.get(s"$wd/output/report.csv"), "x;y\n1;2\n")
      run(wd, ftpTask(wd, stub.port))
      assert(stub.stored.isEmpty, "remote newer -> no STOR")
      assert(!stub.log.stream().anyMatch(_.startsWith("STOR")))
    } finally stub.shutdown()
  }

  // ---- exec ----------------------------------------------------------------

  test("exec task reflectively invokes an object main with argv") {
    val wd = setup()
    val marker = s"$wd/output/exec_marker.txt"
    run(wd,
      s"""{"tasks": [{
         |  "type": "exec", "name": "e",
         |  "source": {"module": "graft.tasks.ExecProbe", "args": ["$marker", "hello"]}
         |}]}""".stripMargin)
    assert(Files.readString(Paths.get(marker)) == "hello")
  }

  test("py-exec alias routes to the same exec task") {
    val wd = setup()
    val marker = s"$wd/output/pyexec_marker.txt"
    run(wd,
      s"""{"tasks": [{
         |  "type": "py-exec", "name": "e",
         |  "source": {"module": "graft.tasks.ExecProbe", "args": ["$marker", "aliased"]}
         |}]}""".stripMargin)
    assert(Files.readString(Paths.get(marker)) == "aliased")
  }
}

/** Fixture main for the exec task's reflective dispatch. */
object ExecProbe {
  def main(args: Array[String]): Unit = {
    Files.writeString(Paths.get(args(0)), args(1))
    ()
  }
}
