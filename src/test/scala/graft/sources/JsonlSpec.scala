package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JSONL round-trip fidelity ([[Sources.jsonl]] + the task-DSL
  * `jsonl` format): the values the q94 fixture cannot exercise —
  * unicode, JSON metacharacters, embedded newlines (escaped in-field,
  * never record separators), long-range ids, nulls — must survive
  * write → read bit-for-bit under the source's own schema.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (Long.MaxValue, "plain ascii", "en"),
    (-1L, "unicode: héllo wörld — ±∞ 文字", "multi"),
    (2L, "quotes \" backslash \\ tab \t", "meta"),
    (3L, "embedded\nnewline and \r carriage", "nl"),
    (4L, null.asInstanceOf[String], null.asInstanceOf[String]),
    (5L, "", "empty"))

  test("write -> read round-trips every value class bit-for-bit") {
    val dir = tmpDir("graft_jsonl_") + "/docs"
    val df = rows.toDF("doc_id", "text", "lang")
    df.write.json(dir)
    val back = Sources.jsonl(spark, dir, df.schema)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect().toSet
    assert(back == rows.toSet, s"lossy round-trip: ${rows.toSet.diff(back)}")
  }

  test("jsonl task source/target round-trip through the task DSL") {
    val wd = tmpDir("graft_jsonl_task_")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wd/input"))
    rows.toDF("doc_id", "text", "lang").write.json(s"$wd/input/docs.jsonl")
    val json =
      s"""{"tasks": [{"type": "shuffle", "name": "j",
         |  "source": {"folder": "input", "file": "docs.jsonl",
         |             "format": "jsonl",
         |             "schema": "doc_id LONG, text STRING, lang STRING"},
         |  "shuffle": {"shards": 2},
         |  "target": {"file": "out.jsonl", "format": "jsonl",
         |             "truncate": true}}]}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$wd/task.json"), json)
    graft.runner.TaskRunner.runFile(s"$wd/task.json", spark, wd,
      graft.runner.TaskLog.Silent)
    val out = spark.read
      .schema("doc_id LONG, text STRING, lang STRING, shard INT, pos INT")
      .json(s"$wd/output/out.jsonl")
    assert(out.count() == rows.size)
    assert(out.select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().toSet == rows.toSet)
  }
}
