package graft.watch

import graft.SparkSpec
import graft.runner.TaskLog
import java.io.{File, FileOutputStream}
import java.nio.file.{Files, Paths}

/** T4 end-to-end: a compiled module JAR dropped through the CAPTURE
  * pipeline is routed to `workDir/module` and its classes are loadable
  * by the very next task run — the reference's hot-import surface
  * (task.py:129-130 importlib+reload; processor.py:219-226 routing)
  * for the JVM. The jars are compiled at TEST time with the in-JVM
  * javac, so the classes are genuinely absent from the launch
  * classpath — `Class.forName` alone cannot find them.
  */
class ModuleJarSpec extends SparkSpec {

  private def write(path: String, content: String): Unit = {
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(path), content)
  }

  /** Compile one Java source and jar the resulting classes. */
  private def compileToJar(className: String, source: String,
                           jarPath: String): Unit = {
    val srcDir = Files.createTempDirectory("graft_modsrc_")
    val srcFile = srcDir.resolve(s"$className.java")
    Files.writeString(srcFile, source)
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    assert(javac != null, "JDK javac unavailable")
    val rc = javac.run(null, null, null,
      "-classpath", System.getProperty("java.class.path"),
      "-d", srcDir.toString, srcFile.toString)
    assert(rc == 0, s"javac failed for $className")
    val jos = new java.util.jar.JarOutputStream(new FileOutputStream(jarPath))
    try Option(srcDir.toFile.listFiles()).getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".class")).sortBy(_.getName)
      .foreach { cls =>
        jos.putNextEntry(new java.util.zip.ZipEntry(cls.getName))
        jos.write(Files.readAllBytes(cls.toPath))
        jos.closeEntry()
      }
    finally jos.close()
  }

  private def transformModuleSource(className: String, fn: String,
                                    marker: String): String =
    s"""public class $className implements graft.transform.TransformModule {
       |  // $marker
       |  @Override
       |  public org.apache.spark.sql.Dataset<org.apache.spark.sql.Row> transform(
       |      org.apache.spark.sql.Dataset<org.apache.spark.sql.Row> df,
       |      scala.collection.immutable.Seq<String> fields,
       |      scala.collection.immutable.Map<String, String> args) {
       |    return df.withColumn("name",
       |        org.apache.spark.sql.functions.$fn(
       |          org.apache.spark.sql.functions.col("name")));
       |  }
       |}""".stripMargin

  private def setup(): (String, Watcher) = {
    val wd = tmpDir("graft_modjar_")
    Seq("capture", "input", "output", "log", "module")
      .foreach(d => Files.createDirectories(Paths.get(s"$wd/$d")))
    write(s"$wd/input/people.csv", "name;bal\nalice;10\nbob;2000\n")
    val scheduler = new Scheduler(spark, wd, TaskLog.Silent)
    (wd, new Watcher(spark, wd, TaskLog.Silent, scheduler))
  }

  private val taskJson =
    """{"tasks": [{
      |  "type": "csv-csv", "name": "mod",
      |  "source": {"file": "people.csv"},
      |  "transform": {"module": "DropInCase"},
      |  "target": {"file": "out.csv", "truncate": true}
      |}]}""".stripMargin

  test("jar + task file through the capture pipeline: transform applied") {
    val (wd, watcher) = setup()
    compileToJar("DropInCase",
      transformModuleSource("DropInCase", "upper", "v1"),
      s"$wd/capture/dropin.jar")
    watcher.check() // routes the jar to module/
    assert(Files.exists(Paths.get(s"$wd/module/dropin.jar")),
      "watcher should route the jar to module/")
    write(s"$wd/capture/task.json", taskJson)
    watcher.check() // runs the task — the module must load from the jar
    val out = Files.readString(Paths.get(s"$wd/output/out.csv"))
    assert(out == "name;bal\nALICE;10\nBOB;2000\n", s"got:\n$out")
  }

  test("replacing the jar hot-swaps the module for the next run") {
    val (wd, watcher) = setup()
    compileToJar("DropInCase",
      transformModuleSource("DropInCase", "upper", "v1"),
      s"$wd/capture/dropin.jar")
    watcher.check()
    write(s"$wd/capture/task.json", taskJson)
    watcher.check()
    assert(Files.readString(Paths.get(s"$wd/output/out.csv"))
      .contains("ALICE"))
    // v2: same class name, different behavior (and a marker comment so
    // the jar differs even if mtime granularity coalesces)
    Thread.sleep(10)
    compileToJar("DropInCase",
      transformModuleSource("DropInCase", "lower", "v2-marker-xxxxxxxx"),
      s"$wd/capture/dropin.jar")
    watcher.check() // re-routes: REPLACE_EXISTING move into module/
    write(s"$wd/capture/task.json", taskJson)
    watcher.check()
    val out = Files.readString(Paths.get(s"$wd/output/out.csv"))
    assert(out == "name;bal\nalice;10\nbob;2000\n",
      s"v2 jar should take effect without restart, got:\n$out")
  }

  test("custom task class loads from a dropped jar") {
    val (wd, watcher) = setup()
    val customSrc =
      s"""public class DropInCustom implements graft.tasks.CustomTask {
         |  @Override
         |  public void run(graft.tasks.TaskContext ctx,
         |      graft.config.TaskConfig.Node task, graft.runner.TaskLog log) {
         |    try {
         |      java.nio.file.Files.writeString(
         |        java.nio.file.Paths.get(ctx.workDir() + "/output/custom_ran.txt"),
         |        "ran");
         |    } catch (java.io.IOException e) { throw new RuntimeException(e); }
         |  }
         |}""".stripMargin
    compileToJar("DropInCustom", customSrc, s"$wd/capture/custom.jar")
    watcher.check()
    write(s"$wd/capture/task.json",
      """{"tasks": [{"type": "custom", "name": "c1",
        |  "module": "DropInCustom"}]}""".stripMargin)
    watcher.check()
    assert(Files.readString(Paths.get(s"$wd/output/custom_ran.txt")) == "ran")
  }
}
