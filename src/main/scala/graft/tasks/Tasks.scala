package graft.tasks

import graft.config.TaskConfig.Node
import graft.connections.Connections
import graft.runner.TaskLog
import graft.sinks.CsvSink
import graft.sources.Sources
import graft.transform.Transforms
import java.io.File
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Execution context shared by all tasks: the session, the connection
  * registry, and the working directory holding the reference's standard
  * folders (input/, output/, log/, module/ — base.py:19-25).
  */
final case class TaskContext(spark: SparkSession, connections: Connections, workDir: String) {
  def dir(sub: String): String =
    if (Paths.get(sub).isAbsolute) sub else s"$workDir/$sub"
  def logDir: String = dir("log")
}

/** Task contract (reference BaseTask.run, task.py:83-92). */
trait Task {
  def run(ctx: TaskContext, task: Node, log: TaskLog): Unit
}

/** SPI for user-defined tasks (reference `custom`, task.py:545-555). */
trait CustomTask {
  def run(ctx: TaskContext, task: Node, log: TaskLog): Unit
}

/** The 7 ETL pipeline shapes + non-pipeline tasks
  * (TaskFactory._tasks, task.py:577-594), Spark-first.
  *
  * Shared ETL semantics (SURVEY.md §2.2/§2.4):
  *  - empty source → "Task skipped. No rows on source", sink untouched.
  *    We probe with isEmpty (one lightweight job) instead of the
  *    reference's double materialization (task.py:181 re-runs the source).
  *  - transform block order fixed: modules → convert → filter → remove →
  *    rename.
  *  - truncate vs append per sink type.
  *  - per-task log file `log/<type>_<name>_<ts>.log`.
  */
object Tasks {

  private[tasks] def etl(ctx: TaskContext, task: Node, log: TaskLog, taskType: String)
                 (source: => DataFrame)
                 (sink: (DataFrame, TaskLog, graft.runner.ProgressMeter) => Unit): Unit = {
    val df = source
    if (df.isEmpty) log.write("Task skipped. No rows on source")
    else {
      val out = Transforms(df, task, log, Some(ctx.workDir))
      val taskLog = TaskLog.forTask(ctx.logDir, taskType, task.str("name", "task"))
      // K5 progress metering (task.py:200): 10k-row ticks into the
      // per-task log while the sink job runs, plus a final total line.
      val meter = new graft.runner.ProgressMeter(taskLog)
      try meter.metered(ctx.spark) { sink(out, taskLog, meter) }
      finally taskLog.close()
    }
  }

  private def csvSource(ctx: TaskContext, task: Node, defaultFolder: String): DataFrame = {
    val src = task("source")
    val folder = src.str("folder", defaultFolder)
    Sources.csv(ctx.spark, s"${ctx.dir(folder)}/${src.str("file")}", src)
  }

  private[tasks] def csvTarget(ctx: TaskContext, task: Node)
                       (df: DataFrame, lg: TaskLog, meter: graft.runner.ProgressMeter): Unit = {
    val tgt = task("target")
    val folder = tgt.str("folder", "output")
    val out = s"${ctx.dir(folder)}/${tgt.str("file")}"
    val truncate = tgt.bool("truncate")
    CsvSink.write(df, out, tgt, truncate) // file sink: rows metered via native output metrics
    lg.write(s"wrote $out (truncate=$truncate)")
  }

  private def dbTarget(ctx: TaskContext, task: Node)
                      (df: DataFrame, lg: TaskLog, meter: graft.runner.ProgressMeter): Unit = {
    val tgt = task("target")
    val conn = ctx.connections.get(tgt.str("connection"))
    // JDBC writes report no output metrics — meter.wrap counts rows in-task.
    val counted = if (ctx.connections.isInternal(conn)) df else meter.wrap(df)
    ctx.connections.writeTable(conn, counted, tgt.str("table"),
      tgt.strOpt("schema"), tgt.bool("truncate"))
    lg.write(s"wrote table ${tgt.str("table")}")
  }

  private def sqlSource(ctx: TaskContext, task: Node): DataFrame = {
    val src = task("source")
    val conn = ctx.connections.get(src.str("connection"))
    val sql = Sources.parseSql(src.copy(j = patchPath(ctx, src)))
    ctx.connections.readSql(conn, sql)
  }

  // query-file path resolution must go through the work dir
  private def patchPath(ctx: TaskContext, src: Node): org.json4s.JValue = {
    import org.json4s.JsonDSL._
    import org.json4s._
    val p = src.str("path", "input")
    src.j.merge(("path" -> ctx.dir(p)): JObject)
  }

  private def xmlSource(ctx: TaskContext, task: Node): DataFrame = {
    val src = task("source")
    val path = s"${ctx.dir(src.str("folder", "input"))}/${src.str("file")}"
    val row = src.strOpt("row")
    val value = src.strOpt("value")
    val mapping = src.objMap("mapping")
    (row, value) match {
      case (Some(r), Some(v)) =>
        Sources.xmlValueForm(ctx.spark, path, r, v, src.strOpt("attr"))
      case (Some(r), None) if mapping.nonEmpty =>
        Sources.xmlMappingForm(ctx.spark, path, r, mapping)
      case _ =>
        // reference raises ValueError (task.py:369,411)
        throw new IllegalArgumentException("Incorrect parameter for source")
    }
  }

  object DbCsv extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit =
      etl(ctx, task, log, "db-csv")(sqlSource(ctx, task))(csvTarget(ctx, task))
  }

  object CsvDb extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit =
      etl(ctx, task, log, "csv-db")(csvSource(ctx, task, "input"))(dbTarget(ctx, task))
  }

  object DbDb extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit =
      etl(ctx, task, log, "db-db")(sqlSource(ctx, task))(dbTarget(ctx, task))
  }

  object CsvCsv extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit =
      etl(ctx, task, log, "csv-csv")(csvSource(ctx, task, "input"))(csvTarget(ctx, task))
  }

  object XmlCsv extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit =
      etl(ctx, task, log, "xml-csv")(xmlSource(ctx, task))(csvTarget(ctx, task))
  }

  object XmlDb extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit =
      etl(ctx, task, log, "xml-db")(xmlSource(ctx, task))(dbTarget(ctx, task))
  }

  object XlsCsv extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit =
      etl(ctx, task, log, "xls-csv") {
        val src = task("source")
        val path = s"${ctx.dir(src.str("folder", "input"))}/${src.str("file")}"
        // use_view default true, the reference's (task.py:325-326)
        graft.sources.XlsReader.read(ctx.spark, path, src.strOpt("sheet"),
          src.bool("use_view", default = true))
      }(csvTarget(ctx, task))
  }

  object SqlExec extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit = {
      val conn = ctx.connections.get(task("target").str("connection"))
      val sql = Sources.parseSql(task("source").copy(j = patchPath(ctx, task("source"))))
      ctx.connections.execSql(conn, sql)
      log.write("sql-exec completed")
    }
  }

  object Download extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit = {
      val src = task("source")
      val tgt = task("target")
      val target = s"${ctx.dir(tgt.str("path", "output"))}/${tgt.str("file")}"
      val params = src.objMap("params").collect { case (k, org.json4s.JString(v)) => k -> v }
      val headers = src.objMap("headers").collect { case (k, org.json4s.JString(v)) => k -> v }
      val n = Sources.download(src.str("url"), params, headers, target)
      log.write(s"Download complete. $n bytes saved")
    }
  }

  /** Zip listed files (deflate). Reference intent: members come from
    * `source.path` (the snapshot reads them from target_path — a defect
    * when the two differ, task.py:484 vs 467-468; SURVEY.md §2.8 defect 4).
    * Member names keep the reference's cp437-with-?→_ mangling
    * (task.py:461-463).
    */
  object Zip extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit = {
      val src = task("source")
      val files = src.strArr("files")
      if (files.isEmpty)
        throw new IllegalArgumentException(
          "zip task requires a non-empty source.files array")
      val sourcePath = ctx.dir(src.str("path", "output"))
      val (targetName, targetPath) =
        if (task.has("target")) {
          val t = task("target")
          (t.str("file", s"${files.head}.zip"), ctx.dir(t.str("path", src.str("path", "output"))))
        } else (s"${files.head}.zip", sourcePath)
      val target = if (targetName.endsWith(".zip")) targetName else s"$targetName.zip"
      val zipPath = s"$targetPath/$target"
      val zos = new ZipOutputStream(Files.newOutputStream(Paths.get(zipPath)))
      try files.foreach { f =>
        val name = new String(
          f.getBytes("cp437"), "cp437").replace('?', '_')
        zos.putNextEntry(new ZipEntry(name))
        Files.copy(Paths.get(s"$sourcePath/$f"), zos)
        zos.closeEntry()
      } finally zos.close()
      src.strArr("remove_after").foreach(f => Files.deleteIfExists(Paths.get(s"$sourcePath/$f")))
      log.write(s"zipped ${files.size} files to $zipPath")
    }
  }

  /** Unzip; `remove_after` deletes the archive at its real source path
    * (the reference deletes bare `source` relative to CWD — defect,
    * task.py:507; SURVEY.md §2.8 defect 4).
    */
  object Unzip extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit = {
      val src = task("source")
      val sourcePath = ctx.dir(src.str("path", "input"))
      val archive = s"$sourcePath/${src.str("file")}"
      val targetPath =
        if (task.has("target")) ctx.dir(task("target").str("path", src.str("path", "input")))
        else sourcePath
      unzipInto(archive, targetPath)
      if (src.bool("remove_after")) Files.deleteIfExists(Paths.get(archive))
      log.write(s"unzipped $archive to $targetPath")
    }
  }

  def unzipInto(archive: String, targetPath: String): Unit = {
    val zf = new ZipFile(archive)
    try {
      val targetRoot = Paths.get(targetPath).toAbsolutePath.normalize
      zf.entries().asIterator().forEachRemaining { e =>
        val out = targetRoot.resolve(e.getName).normalize
        if (!out.startsWith(targetRoot))
          throw new java.io.IOException(s"zip entry escapes target dir: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(out)
        else {
          Option(out.getParent).foreach(Files.createDirectories(_))
          val in = zf.getInputStream(e)
          try Files.copy(in, out, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        }
      }
    } finally zf.close()
  }

  /** FTP upload (reference task.py:441-456, ftputil upload_if_newer).
    * Minimal RFC 959 client over java.net (no FTP lib ships offline):
    * uploads when the remote file is missing or older than the local one.
    */
  object FtpUpload extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit = {
      val src = task("source")
      val localPath = s"${ctx.dir(src.str("path", "output"))}/${src.str("file")}"
      val tgt = task("target")
      val remotePath = s"${tgt.str("path")}/${tgt.str("file", src.str("file"))}"
      val conn = ctx.connections.get(tgt.str("connection"))
      val client = new graft.sinks.FtpClient(
        conn.str("host"), conn.int("port", 21),
        conn.str("user", "anonymous"), conn.str("pass", ""))
      try {
        val localMtime = Files.getLastModifiedTime(Paths.get(localPath)).toMillis
        val shouldUpload = client.mdtm(remotePath) match {
          case Some(remote) => localMtime > remote
          case None         => true
        }
        if (shouldUpload) {
          client.store(remotePath, Files.readAllBytes(Paths.get(localPath)))
          log.write(s"uploaded $localPath -> $remotePath")
        } else log.write(s"skipped upload (remote newer): $remotePath")
      } finally client.close()
    }
  }

  /** The py-exec escape hatch (task.py:510-524): reflectively invoke a
    * Scala/Java `main(Array[String])` with argv from config.
    */
  object Exec extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit = {
      val src = task("source")
      val moduleName = src.str("module")
      val args = src.strArr("args").toArray
      // module/ jars are consulted after the launch classpath — the
      // drop-in surface (ModuleClasspath); try the Scala-object form
      // first, then a plain Java class with a static main
      val loaded =
        try Left(graft.transform.ModuleClasspath
          .classFor(moduleName + "$", Some(ctx.workDir)))
        catch { case _: ClassNotFoundException =>
          Right(graft.transform.ModuleClasspath
            .classFor(moduleName, Some(ctx.workDir)))
        }
      loaded match {
        case Left(cls) => // Scala object
          val instance = cls.getField("MODULE$").get(null)
          cls.getMethod("main", classOf[Array[String]]).invoke(instance, args)
        case Right(cls) => // Java-style static main
          cls.getMethod("main", classOf[Array[String]])
            .invoke(null, args)
      }
      log.write(s"executed $moduleName")
    }
  }

  object Custom extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit = {
      log.write("Loading custom task.")
      val cls = graft.transform.ModuleClasspath
        .classFor(task.str("module"), Some(ctx.workDir))
      val instance = cls.getDeclaredConstructor().newInstance().asInstanceOf[CustomTask]
      instance.run(ctx, task, log)
    }
  }

  object Nop extends Task {
    def run(ctx: TaskContext, task: Node, log: TaskLog): Unit =
      log.write("Nothing to do. Disabled task? Check it John Snow!")
  }

  /** Task-type dispatch (reference TaskFactory, task.py:577-599). */
  val factory: Map[String, Task] = Map(
    "db-csv"     -> DbCsv,
    "csv-db"     -> CsvDb,
    "db-db"      -> DbDb,
    "csv-csv"    -> CsvCsv,
    "xls-csv"    -> XlsCsv,
    "xml-csv"    -> XmlCsv,
    "xml-db"     -> XmlDb,
    "ftp-upload" -> FtpUpload,
    "zip"        -> Zip,
    "unzip"      -> Unzip,
    "exec"       -> Exec,
    "py-exec"    -> Exec, // reference name kept as an alias
    "sql-exec"   -> SqlExec,
    "nop"        -> Nop,
    "custom"     -> Custom,
    "download"   -> Download,
    // LLM-curation families as first-class task types (PipelineTasks)
    "dedup"      -> PipelineTasks.DedupTask,
    "excise"     -> PipelineTasks.ExciseTask,
    "sample"     -> PipelineTasks.SampleTask,
    "split"      -> PipelineTasks.SplitTask,
    "cap"        -> PipelineTasks.CapTask,
    "pack"       -> PipelineTasks.PackTask,
    "pack_ids"   -> PipelineTasks.PackIdsTask,
    "chunk"      -> PipelineTasks.ChunkTask,
    "shuffle"    -> PipelineTasks.ShuffleTask,
    "curate"     -> PipelineTasks.CurateTask,
    "compact"    -> PipelineTasks.CompactTask,
    "rebuild"    -> PipelineTasks.RebuildTask,
    "fit"        -> PipelineTasks.FitTask,
    "score"      -> PipelineTasks.ScoreTask,
    "drift"      -> PipelineTasks.DriftTask,
    "gopher"     -> PipelineTasks.GopherTask,
    "intake"     -> PipelineTasks.IntakeTask,
    "warc"       -> PipelineTasks.WarcTask,
    "block"      -> PipelineTasks.BlockTask)

  def get(taskType: String): Task =
    factory.getOrElse(taskType,
      throw new IllegalArgumentException(s"unknown task type: $taskType"))
}
