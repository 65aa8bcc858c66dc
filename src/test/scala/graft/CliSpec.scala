package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CLI run (reference base.main, base.py:19-77): `graft.Main
  * -task FILE` in a SUBPROCESS (Main builds and stops its own
  * SparkSession; in-process it would tear down the shared test session).
  * Pins the EP1 path: folder bootstrap, capture copy, task run, task-file
  * deletion from capture, and `watcher_DD_TT.log` naming.
  */
class CliSpec extends AnyFunSuite {

  test("Main -task: bootstrap, capture-route, run, delete task file, log naming") {
    val wd = Files.createTempDirectory("graft_cli_").toString
    Files.createDirectories(Paths.get(s"$wd/input"))
    Files.writeString(Paths.get(s"$wd/input/people.csv"), "name;bal\nalice;10\nbob;20\n")
    val taskFile = s"$wd/job.json"
    Files.writeString(Paths.get(taskFile),
      """{"tasks": [{
        |  "type": "csv-csv", "name": "t1",
        |  "source": {"file": "people.csv"},
        |  "target": {"file": "out.csv", "truncate": true, "delimiter": ","}
        |}]}""".stripMargin)

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Xmx2g",
      "-cp", System.getProperty("java.class.path"),
      "graft.Main", "-task", taskFile, "-work-dir", wd)
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_CPUS", "2")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val outLog = new String(proc.getInputStream.readAllBytes())
    val exited = proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
    assert(exited, s"CLI run timed out:\n${outLog.takeRight(2000)}")
    assert(proc.exitValue() == 0, s"CLI exited ${proc.exitValue()}:\n${outLog.takeRight(2000)}")

    // standard folders bootstrapped (base.py init)
    Seq("capture", "input", "output", "log", "module").foreach(d =>
      assert(Files.isDirectory(Paths.get(s"$wd/$d")), s"missing $d/"))
    // the ETL ran: single-file CSV with header + rows
    assert(Files.readString(Paths.get(s"$wd/output/out.csv")) ==
      "name,bal\nalice,10\nbob,20\n")
    // task file was routed through capture and deleted after the run
    assert(!Files.exists(Paths.get(s"$wd/capture/job.json")),
      "task file must be deleted from capture (processor.py:186)")
    // run log named watcher_DD_HHMMSS.log
    val logs = Files.list(Paths.get(s"$wd/log")).toArray.map(_.toString)
    assert(logs.exists(_.matches(""".*/watcher_\d{2}_\d{6}\.log""")),
      s"missing watcher_DD_TT.log in: ${logs.mkString(", ")}")
    // per-task log file exists alongside
    assert(logs.exists(_.contains("csv-csv_t1_")), "missing per-task log")
  }
}
