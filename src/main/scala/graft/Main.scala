package graft

import graft.runner.TaskLog
import graft.watch.{Scheduler, Watcher}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** CLI entry (reference base.main, /root/reference/dasladen/base.py:19-77):
  *
  *   graft.Main [-task FILE] [-watch-time SECONDS] [-work-dir DIR] [-verbose]
  *
  * With `-task`: one-shot — the file is routed through the capture pipeline
  * exactly like a watched drop (EP1). Without: daemon mode — poll the
  * capture folder every watch-time seconds (default 10) and process added
  * files (EP2). A `start.zip` in the work dir is auto-dropped into capture
  * on startup (base.py:65-66). Standard folders are bootstrapped like the
  * reference's init() (base.py:19-25).
  */
object Main {

  def buildSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.VectorFunctions.registerSql(spark)
    spark
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val workDir = opts.getOrElse("work-dir", ".")
    val watchTime = opts.get("watch-time").flatMap(_.toIntOption).getOrElse(10)
    val verbose = opts.contains("verbose")

    Seq("capture", "input", "output", "log", "module")
      .foreach(d => Files.createDirectories(Paths.get(s"$workDir/$d")))

    val spark = buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "*"))
    spark.sparkContext.setLogLevel("WARN")
    val log = TaskLog.forRun(s"$workDir/log", verbose)
    val scheduler = new Scheduler(spark, workDir, log)
    val watcher = new Watcher(spark, workDir, log, scheduler)

    opts.get("task") match {
      case Some(taskFile) =>
        watcher.processFile(taskFile)
      case None =>
        log.write(s"graft watching $workDir/capture every ${watchTime}s")
        val startZip = s"$workDir/start.zip"
        if (Files.exists(Paths.get(startZip))) watcher.processFile(startZip)
        while (true) {
          watcher.check()
          Thread.sleep(watchTime * 1000L)
        }
    }
    log.close()
    spark.stop()
  }

  private[graft] def parseArgs(args: Array[String]): Map[String, String] = {
    val m = scala.collection.mutable.Map[String, String]()
    def value(i: Int, flag: String): String =
      if (i + 1 < args.length) args(i + 1)
      else {
        System.err.println(
          s"missing value for $flag\nusage: graft.Main [-task FILE] " +
            "[-watch-time SECONDS] [-work-dir DIR] [-verbose]")
        throw new IllegalArgumentException(s"missing value for $flag")
      }
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-task"       => m("task") = value(i, "-task"); i += 2
        case "-watch-time" => m("watch-time") = value(i, "-watch-time"); i += 2
        case "-work-dir"   => m("work-dir") = value(i, "-work-dir"); i += 2
        case "-verbose"    => m("verbose") = "true"; i += 1
        case other =>
          System.err.println(s"unknown argument: $other"); i += 1
      }
    }
    m.toMap
  }
}
