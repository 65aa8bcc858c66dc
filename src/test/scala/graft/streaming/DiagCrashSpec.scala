package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, FaultyFs, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** THROWAWAY diagnostic loop for the window-(d) flake: repeats the
  * CurationCrashSpec window-(d) flow N times in one suite launch and,
  * on the first divergence from the expected dup set, dumps the full
  * on-disk state (out/ rows, index listings, which renames the
  * injection killed) so the failing interleaving is attributable.
  * Delete once the flake is root-caused.
  */
class DiagCrashSpec extends SparkSpec {
  import spark.implicits._

  private val passage =
    "alpha beta gamma delta epsilon zeta eta theta"
  private val chrome = "subscribe to our newsletter today"
  private val fresh21 = "fresh line about twenty one"

  private def lineBatch: Seq[(Long, String, Array[Float])] = Seq(
    (21L, s"$chrome\n$fresh21", Array(0f, 0f, 1f, 0f)),
    (23L, chrome, Array.empty[Float]),
    (16L, null.asInstanceOf[String], Array(0f, 0f, 0f, 1f)))

  private def setupStandingLines(wd: String): Unit = {
    val standingDocs = Seq((1L, s"$passage tail words here"))
      .toDF("doc_id", "text")
    Dedup.buildExactKeyIndex(standingDocs, "text", s"$wd/keys")
    Dedup.buildGramIndex(standingDocs, "text", s"$wd/grams", w = 8)
    val standingVecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    Similarity.buildIvfIndex(standingVecs, "vec_id", "embedding",
      s"$wd/ivf", nCells = 2)
    Dedup.buildLineIndex(Seq(
        (1L, s"$chrome\nstanding filler one"),
        (2L, s"$chrome\nstanding filler two")).toDF("doc_id", "text"),
      "doc_id", "text", s"$wd/lines", minDocFreq = 2)
  }

  private def listDir(wd: String, sub: String): Seq[String] = {
    val d = new java.io.File(new java.net.URI(wd).getPath, sub)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    if (!d.exists()) Seq(s"<missing $sub>")
    else walk(d).map(f => s"${f.getPath.stripPrefix(d.getPath)} " +
      s"${f.length()}b mtime=${f.lastModified()}")
  }

  test("window (d) looped with state capture") {
    val n = sys.env.getOrElse("DIAG_ITERS", "15").toInt
    for (i <- 1 to n) {
      FaultyFs.failedRenames.clear()
      FaultyFs.install(spark.sparkContext.hadoopConfiguration)
      val wd = "faulty://" + tmpDir(s"graft_diag_d_${i}_")
      setupStandingLines(wd)
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String, Array[Float])]
      def start() = Streams.curationIngestSink(spark,
        mem.toDF().toDF("doc_id", "text", "embedding"),
        "doc_id", "text", "embedding",
        s"$wd/keys", s"$wd/grams", s"$wd/ivf", s"$wd/out", s"$wd/ckpt",
        lineIndexPath = Some(s"$wd/lines"))
      mem.addData(lineBatch: _*)
      val root = new java.net.URI(wd).getPath
      FaultyFs.failWhen = Some(p =>
        p.startsWith(root) && p.contains("/delta=b0/") &&
          p.endsWith(".parquet") && !p.contains("_temporary"))
      val q1 = start()
      var cause = "none"
      val crashed =
        try { q1.processAllAvailable(); false }
        catch { case e: Exception =>
          cause = Option(e.getCause).getOrElse(e).toString.take(200); true }
      finally { q1.stop(); FaultyFs.failWhen = None }
      // snapshot AFTER the crash, BEFORE the replay: what did q1 commit?
      val postCrashOut = listDir(wd, "out")
      val postCrashIvf = listDir(wd, "ivf/data")
      val postCrashGrams = listDir(wd, "grams/grams")
      val postCrashLines = listDir(wd, "lines/lines")
      val killed = FaultyFs.failedRenames.toArray.toSeq
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val rows = spark.read.parquet(s"$wd/out")
        .select("doc_id", "clean_text", "n_words", "n_excised")
        .as[(Long, String, Long, Long)].collect().toSeq
      val dups = rows.groupBy(_._1).filter(_._2.size > 1).keySet
      val fired = FaultyFs.failedRenames.toArray.toSeq
        .asInstanceOf[Seq[String]].exists(p => p.startsWith(root))
      val ok = crashed && dups == Set(16L)
      info(s"iter $i: crashed=$crashed fired=$fired dups=$dups " +
        s"rows=${rows.size} cause=$cause")
      if (!ok) {
        info(s"== DIVERGENCE at iter $i ==")
        info(s"q1 crashed: $crashed")
        info(s"injection killed renames:\n  ${killed.mkString("\n  ")}")
        info(s"post-crash out/:\n  ${postCrashOut.mkString("\n  ")}")
        info(s"post-crash ivf/data/:\n  ${postCrashIvf.mkString("\n  ")}")
        info(s"post-crash grams/:\n  ${postCrashGrams.mkString("\n  ")}")
        info(s"post-crash lines/:\n  ${postCrashLines.mkString("\n  ")}")
        info(s"final rows: ${rows.sortBy(_._1).mkString("; ")}")
        info(s"final out/:\n  ${listDir(wd, "out").mkString("\n  ")}")
        fail(s"iter $i diverged: crashed=$crashed dups=$dups")
      }
    }
  }
}
