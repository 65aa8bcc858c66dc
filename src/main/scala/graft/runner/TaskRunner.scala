package graft.runner

import graft.config.TaskConfig
import graft.config.TaskConfig.TaskFile
import graft.connections.Connections
import graft.tasks.{TaskContext, Tasks}
import org.apache.spark.sql.SparkSession

/** Sequential task-list execution with per-task wall-clock timing and the
  * `disabled` → nop rule (reference TaskRunner.run,
  * /root/reference/dasladen/taskrun.py:64-76).
  */
final class TaskRunner(file: TaskFile, spark: SparkSession, workDir: String) {

  def run(log: TaskLog): Boolean = {
    val ctx = TaskContext(spark, new Connections(file, spark), workDir)
    file.tasks.foreach { item =>
      val start = System.nanoTime()
      val name = item.str("name", "unnamed")
      log.write(s"Executing task item: $name")
      val task =
        if (item.bool("disabled")) Tasks.get("nop")
        else Tasks.get(item.str("type"))
      task.run(ctx, item, log)
      log.write(f"Task item finished: $name, time: ${(System.nanoTime() - start) / 1e9}%.2fs")
    }
    true
  }
}

object TaskRunner {
  def runFile(path: String, spark: SparkSession, workDir: String, log: TaskLog): Boolean = {
    val file = TaskConfig.parseFile(path)
    new TaskRunner(file, spark, workDir).run(log)
  }
}
