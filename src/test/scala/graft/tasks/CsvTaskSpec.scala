package graft.tasks

import graft.SparkSpec
import graft.config.TaskConfig
import graft.runner.{TaskLog, TaskRunner}
import java.nio.file.{Files, Paths}

/** End-to-end csv-csv task runs (EP1 shape): JSON task file → runner →
  * single-file CSV output with the reference's truncate/append/skip
  * semantics.
  */
class CsvTaskSpec extends SparkSpec {

  private def writeFile(path: String, content: String): Unit = {
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(path), content)
  }

  private def read(path: String): String = Files.readString(Paths.get(path))

  private def setup(): String = {
    val wd = tmpDir("graft_csvtask_")
    Seq("input", "output", "log").foreach(d => Files.createDirectories(Paths.get(s"$wd/$d")))
    writeFile(s"$wd/input/people.csv",
      "name;bal;seg\nalice;10;m1\nbob;2000;m2\ncarol;1500;m3\n")
    wd
  }

  private def runTasks(wd: String, tasksJson: String): Unit = {
    val taskFile = s"$wd/task.json"
    writeFile(taskFile, tasksJson)
    TaskRunner.runFile(taskFile, spark, wd, TaskLog.Silent)
  }

  test("csv-csv with transforms, truncate mode: header + transformed rows") {
    val wd = setup()
    runTasks(wd,
      """{"tasks": [{
        |  "type": "csv-csv", "name": "t1",
        |  "source": {"file": "people.csv"},
        |  "transform": {
        |    "convert": [["name", "upper"]],
        |    "filter": "{bal} not in ('10')",
        |    "remove": ["seg"]
        |  },
        |  "target": {"file": "out.csv", "truncate": true}
        |}]}""".stripMargin)
    val out = read(s"$wd/output/out.csv")
    assert(out == "name;bal\nBOB;2000\nCAROL;1500\n")
  }

  test("append mode adds data rows only, no header") {
    val wd = setup()
    val task =
      """{"tasks": [{
        |  "type": "csv-csv", "name": "t1",
        |  "source": {"file": "people.csv"},
        |  "target": {"file": "out.csv", "delimiter": ","}
        |}]}""".stripMargin
    runTasks(wd, task)
    runTasks(wd, task)
    val out = read(s"$wd/output/out.csv")
    // two appends, no header line at all (petl appendcsv semantics)
    assert(!out.startsWith("name"))
    assert(out.linesIterator.size == 6)
  }

  test("empty source skips the task entirely — no output file") {
    val wd = setup()
    writeFile(s"$wd/input/empty.csv", "a;b\n")
    runTasks(wd,
      """{"tasks": [{
        |  "type": "csv-csv", "name": "t1",
        |  "source": {"file": "empty.csv"},
        |  "target": {"file": "nope.csv", "truncate": true}
        |}]}""".stripMargin)
    assert(!Files.exists(Paths.get(s"$wd/output/nope.csv")))
  }

  test("disabled task runs nop") {
    val wd = setup()
    runTasks(wd,
      """{"tasks": [{
        |  "type": "csv-csv", "name": "t1", "disabled": true,
        |  "source": {"file": "people.csv"},
        |  "target": {"file": "out.csv", "truncate": true}
        |}]}""".stripMargin)
    assert(!Files.exists(Paths.get(s"$wd/output/out.csv")))
  }

  test("all-string parity: numeric-looking cells stay strings") {
    val wd = setup()
    val df = graft.sources.Sources.csv(spark, s"$wd/input/people.csv",
      TaskConfig.Node(org.json4s.JObject()))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("progress meter ticks every 10k rows into the per-task log (K5)") {
    val wd = setup()
    val rows = (1 to 25000).map(i => s"n$i;$i;m").mkString("\n")
    writeFile(s"$wd/input/big.csv", s"name;bal;seg\n$rows\n")
    runTasks(wd,
      """{"tasks": [{
        |  "type": "csv-csv", "name": "big",
        |  "source": {"file": "big.csv"},
        |  "target": {"file": "big_out.csv", "truncate": true}
        |}]}""".stripMargin)
    val logFile = Files.list(Paths.get(s"$wd/log")).toArray.map(_.toString)
      .find(_.contains("csv-csv_big_")).getOrElse(fail("no per-task log file"))
    val log = read(logFile)
    // 25k rows -> ticks at 10k and 20k, then the final total
    assert(log.contains("10000 rows in"), s"missing 10k tick:\n$log")
    assert(log.contains("20000 rows in"), s"missing 20k tick:\n$log")
    assert(log.contains("25000 rows written in"), s"missing final total:\n$log")
  }

  test("distributed sink mode writes a directory") {
    val wd = setup()
    runTasks(wd,
      """{"tasks": [{
        |  "type": "csv-csv", "name": "t1",
        |  "source": {"file": "people.csv"},
        |  "target": {"file": "outdir", "truncate": true, "single_file": false}
        |}]}""".stripMargin)
    assert(Files.isDirectory(Paths.get(s"$wd/output/outdir")))
  }
}
