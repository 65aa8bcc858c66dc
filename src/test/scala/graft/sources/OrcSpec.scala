package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ORC round-trip fidelity ([[Sources.orc]] + the task-DSL `orc`
  * format): the value classes q96's fixture cannot exercise — unicode,
  * metacharacters, embedded newlines, long-range ids, nulls — must
  * survive write → read bit-for-bit, and the columnar contract must
  * hold: a projection prunes to the selected columns and a predicate
  * reaches the scan as a pushed filter.
  */
class OrcSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (Long.MaxValue, "plain ascii", "en"),
    (-1L, "unicode: héllo wörld — ±∞ 文字", "multi"),
    (2L, "quotes \" backslash \\ tab \t", "meta"),
    (3L, "embedded\nnewline and \r carriage", "nl"),
    (4L, null.asInstanceOf[String], null.asInstanceOf[String]),
    (5L, "", "empty"))

  test("write -> read round-trips every value class bit-for-bit") {
    val dir = tmpDir("graft_orc_") + "/docs"
    val df = rows.toDF("doc_id", "text", "lang")
    df.write.orc(dir)
    val back = Sources.orc(spark, dir, df.schema)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect().toSet
    assert(back == rows.toSet, s"lossy round-trip: ${rows.toSet.diff(back)}")
  }

  test("projection prunes columns and predicates push to the ORC scan") {
    val dir = tmpDir("graft_orc_plan_") + "/docs"
    val df = rows.toDF("doc_id", "text", "lang")
    df.write.orc(dir)
    val q = Sources.orc(spark, dir, df.schema)
      .where(col("doc_id") > 2L).select(col("doc_id"), col("lang"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,2)]"),
      s"predicate not pushed to the ORC scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"column pruning did not reach the ORC scan:\n$plan")
    assert(q.as[(Long, String)].collect().toSet ==
      Set((Long.MaxValue, "en"), (3L, "nl"), (4L, null), (5L, "empty")))
  }

  test("orc task source/target round-trip through the task DSL") {
    val wd = tmpDir("graft_orc_task_")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wd/input"))
    rows.toDF("doc_id", "text", "lang").write.orc(s"$wd/input/docs.orc")
    val json =
      s"""{"tasks": [{"type": "shuffle", "name": "o",
         |  "source": {"folder": "input", "file": "docs.orc",
         |             "format": "orc",
         |             "schema": "doc_id LONG, text STRING, lang STRING"},
         |  "shuffle": {"shards": 2},
         |  "target": {"file": "out.orc", "format": "orc",
         |             "truncate": true}}]}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$wd/task.json"), json)
    graft.runner.TaskRunner.runFile(s"$wd/task.json", spark, wd,
      graft.runner.TaskLog.Silent)
    val out = spark.read.orc(s"$wd/output/out.orc")
    assert(out.count() == rows.size)
    assert(out.select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().toSet == rows.toSet)
  }
}
