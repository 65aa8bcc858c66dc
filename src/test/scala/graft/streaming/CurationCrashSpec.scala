package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, FaultyFs, IndexMaintenance, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** FAULT-INJECTED proofs of [[Streams.curationIngestSink]]'s per-window
  * replay convergence (the rung-4 append order: output → vectors →
  * grams → exact keys LAST) plus the downstream
  * [[graft.ops.IndexMaintenance.compactOutput]] the replay contracts
  * defer to. One targeted committer rename dies per test ([[FaultyFs]]),
  * the stream restarts from its checkpoint, and the replayed output —
  * after compaction — must be CONTENT-IDENTICAL to a crash-free run,
  * with all three indexes converged and no duplicate vector admissions.
  *
  * Window formation is VERIFIED, not assumed: each injected window
  * checks that the targeted rename actually fired ([[FaultyFs
  * .failedRenames]]) and retries in a fresh dir when the first attempt
  * died environmentally before reaching it ([[retryingWindow]] — the
  * round-11 flake, pinned by window (d0)).
  */
class CurationCrashSpec extends SparkSpec {
  import spark.implicits._

  private val passage =
    "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 words

  private val text11 = s"fresh opening words then $passage and beyond it more"
  private val emitted11 = "fresh opening words then and beyond it more"
  private val text13 = "unrelated novel document about something else entirely"
  private val text15 = "a vectorless row passes the semantic rung untouched"
  private val text17 = "zero vector rows behave exactly like vectorless ones"
  private val text19 = "tiny short doc" // < w words: carries NO gram

  private def batch1: Seq[(Long, String, Array[Float])] = Seq(
    // 10: exact duplicate of the standing doc     -> rung 1 drops
    (10L, s"$passage tail words here", Array(0f, 1f, 0f, 0f)),
    // 11: carries the standing passage            -> rung 2 excises
    (11L, text11, Array(0f, 0f, 1f, 0f)),
    // 13: novel text, well-separated vector       -> admitted intact
    (13L, text13, Array(0f, 1f, 0f, 0.2f)),
    // 15: no vector                               -> rung 3 bypassed
    (15L, text15, Array.empty[Float]),
    // 17: zero vector = vectorless (the q81 rule) -> rung 3 bypassed
    (17L, text17, Array(0f, 0f, 0f, 0f)),
    // 16: null text                               -> (16, null, 0, 0) stub
    (16L, null.asInstanceOf[String], Array(0f, 0f, 0f, 1f)),
    // 19: vectorless AND shorter than w           -> admitted; its
    //     window-(c) coverage comes from the gram set's FULL-TEXT hash
    //     of sub-w docs (no w-gram, no vector — the excision screen is
    //     all it has)
    (19L, text19, Array.empty[Float]))

  /** The crash-free output content, post-compaction. */
  private val expected = Set(
    (11L, emitted11, 16L, 8L),
    (13L, text13, 7L, 0L),
    (15L, text15, 8L, 0L),
    (17L, text17, 8L, 0L),
    (16L, null, 0L, 0L),
    (19L, text19, 3L, 0L))

  private def setupStanding(wd: String): Unit = {
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
  }

  private def faultyDir(prefix: String): String = {
    FaultyFs.install(spark.sparkContext.hadoopConfiguration)
    "faulty://" + tmpDir(prefix)
  }

  private def noInjection(): Unit = FaultyFs.failWhen = None

  /** Fail final committer renames into `wd/.../sub/` (commit dsts hold
    * `_temporary`; only final files land directly under `sub/`).
    */
  private def failAppendsInto(wd: String, sub: String): Unit = {
    val root = new java.net.URI(wd).getPath
    FaultyFs.failWhen = Some(p =>
      p.startsWith(root) && p.contains(s"/$sub/") &&
        p.endsWith(".parquet") && !p.contains("_temporary"))
  }

  /** A fault-injected first attempt that died WITHOUT the injected
    * rename ever firing — the batch perished environmentally (task OOM
    * / GC death on a loaded near-heap-limit JVM) at some EARLIER append
    * boundary. The resulting state is a legal, convergent crash window
    * (window (d0) pins the one the round-11 flake hit), but not the
    * window this test meant to form, so its exact dup-set assert would
    * misfire. Signalled so [[retryingWindow]] can re-attempt fresh.
    */
  private case class VacuousWindow(msg: String) extends Exception(msg)

  /** Run a fault-injected window, retrying in a fresh dir when the
    * window fails to form (see [[VacuousWindow]]). The round-11 flake:
    * 1-in-2 FULL-SUITE runs, window (d)'s first attempt OOM'd between
    * the output and vector appends instead of dying at the injected
    * line-count rename, and the window-(d) assert read the legal
    * window-(a) re-emit {21, 16} as a convergence hole. A window only
    * counts when [[FaultyFs.failedRenames]] proves the injection fired.
    */
  private def retryingWindow(mkDir: => String)(body: String => Unit): Unit = {
    var attempt = 0
    while (true) {
      attempt += 1
      try { body(mkDir); return }
      catch {
        case VacuousWindow(msg) =>
          if (attempt >= 3)
            fail(s"crash window failed to form after $attempt attempts: $msg")
          info(s"crash window did not form (attempt $attempt): $msg — " +
            "retrying in a fresh dir")
      }
    }
  }

  /** First attempt under injection + verified window formation + replay.
    * Throws [[VacuousWindow]] unless the first attempt (a) crashed and
    * (b) the injected rename into `wd/.../sub/` actually fired — i.e.
    * every append BEFORE the injected one committed and the crash
    * happened exactly at the intended boundary.
    */
  private def crashThenReplay(wd: String, sub: String,
                              start: () => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    FaultyFs.failedRenames.clear()
    failAppendsInto(wd, sub)
    val q1 = start()
    val died =
      try { q1.processAllAvailable(); false }
      catch { case _: Exception => true }
      finally { q1.stop(); noInjection() }
    val root = new java.net.URI(wd).getPath
    val fired = FaultyFs.failedRenames.toArray(Array.empty[String])
      .exists(p => p.startsWith(root) && p.contains(s"/$sub/"))
    if (!died) throw VacuousWindow(s"first attempt completed ($sub)")
    if (!fired) throw VacuousWindow(
      s"first attempt died before the injected $sub append")
    val q2 = start() // same checkpoint + source: replays the batch
    try q2.processAllAvailable() finally q2.stop()
  }

  /** Run batch1 through the sink; with `failSub`, the first attempt's
    * append into that index dir dies and a restarted query replays.
    */
  private def runBatch(wd: String, failSub: Option[String]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Array[Float])]
    def start() = Streams.curationIngestSink(spark,
      mem.toDF().toDF("doc_id", "text", "embedding"),
      "doc_id", "text", "embedding",
      s"$wd/keys", s"$wd/grams", s"$wd/ivf", s"$wd/out", s"$wd/ckpt")
    mem.addData(batch1: _*)
    failSub match {
      case None =>
        val q = start()
        try q.processAllAvailable() finally q.stop()
      case Some(sub) => crashThenReplay(wd, sub, () => start())
    }
  }

  private def outRows(wd: String): Seq[(Long, String, Long, Long)] =
    spark.read.parquet(s"$wd/out")
      .select("doc_id", "clean_text", "n_words", "n_excised")
      .as[(Long, String, Long, Long)].collect().toSeq

  /** Post-replay invariants shared by every window: indexes converged
    * (keys screen, grams excise, vectors admitted exactly once) and the
    * compacted output is content-identical to a crash-free run.
    */
  private def assertConverged(wd: String): Unit = {
    // keys: a re-sent copy of an admitted text screens out at rung 1
    assert(Dedup.exactDedupAgainstIndex(spark,
      Seq((99L, text13)).toDF("doc_id", "text"), "text", s"$wd/keys")
      .count() == 0, "admitted keys must screen")
    // grams: the emitted (seam) text of 11 excises to emptiness
    assert(Dedup.exciseAgainstIndex(spark,
      Seq((99L, emitted11)).toDF("doc_id", "text"), "doc_id", "text",
      s"$wd/grams").select("clean_text").as[String].head() == "",
      "emitted grams must be indexed")
    // vectors: admitted exactly ONCE each, replay or not
    val vecCounts = spark.read.parquet(s"$wd/ivf/data")
      .groupBy("vec_id").count().as[(Long, Long)].collect().toMap
    assert(vecCounts(11L) == 1 && vecCounts(13L) == 1,
      s"vector admissions must be idempotent under replay: $vecCounts")
    assert(!vecCounts.contains(17L),
      "a zero vector must never admit to the cell layout")
    // compaction closes the at-least-once window: content-identical
    IndexMaintenance.compactOutput(spark, s"$wd/out")
    assert(outRows(wd).toSet == expected && outRows(wd).size == expected.size,
      s"compacted output must equal the crash-free run: ${outRows(wd)}")
  }

  private def dupIds(wd: String): Set[Long] =
    outRows(wd).groupBy(_._1).filter(_._2.size > 1).keySet

  test("compactOutput keeps the most-excised row per id, deterministically") {
    val dir = tmpDir("graft_compact_out_") + "/out"
    Seq((1L, "a b c", 5L, 2L), (1L, "a", 1L, 4L), (1L, "a b c", 5L, 2L),
      (2L, null.asInstanceOf[String], 0L, 0L),
      (2L, null.asInstanceOf[String], 0L, 0L),
      (3L, "untouched", 1L, 0L))
      .toDF("doc_id", "clean_text", "n_words", "n_excised")
      .repartition(3).write.mode("append").parquet(dir)
    IndexMaintenance.compactOutput(spark, dir)
    val rows = spark.read.parquet(dir)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(rows == Set((1L, "a", 1L, 4L), (2L, null, 0L, 0L),
      (3L, "untouched", 1L, 0L)))
  }

  test("compactOutput handles the lineRemovalSink schema (n_removed/n_lines)") {
    val dir = tmpDir("graft_compact_line_") + "/out"
    // (doc_id, clean_text, n_lines, n_removed): the line sink's shape —
    // replays append byte-identical rows, and a later pass with a grown
    // index can only have removed MORE lines
    Seq((1L, "keep\nkeep", 2L, 1L), (1L, "keep\nkeep", 2L, 1L),
      (1L, "keep", 1L, 2L),
      (2L, null.asInstanceOf[String], 0L, 0L),
      (2L, null.asInstanceOf[String], 0L, 0L),
      (3L, "untouched", 1L, 0L))
      .toDF("doc_id", "clean_text", "n_lines", "n_removed")
      .repartition(3).write.mode("append").parquet(dir)
    IndexMaintenance.compactOutput(spark, dir)
    val rows = spark.read.parquet(dir)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(rows == Set((1L, "keep", 1L, 2L), (2L, null, 0L, 0L),
      (3L, "untouched", 1L, 0L)))
  }

  test("crash-free run emits the expected content (the reference shape)") {
    val wd = faultyDir("graft_curcrash_ref_")
    setupStanding(wd)
    runBatch(wd, None)
    assert(outRows(wd).toSet == expected && outRows(wd).size == expected.size)
    assertConverged(wd)
  }

  test("window (a) crash before the vector append: full replay, dup output only") {
    try retryingWindow(faultyDir("graft_curcrash_a_")) { wd =>
      setupStanding(wd)
      runBatch(wd, Some("data")) // ivf/data/... commits die
      // the replay recomputed identically: EVERY emitted row doubled
      assert(dupIds(wd) == Set(11L, 13L, 15L, 16L, 17L, 19L),
        s"window (a) re-emits all survivors: ${dupIds(wd)}")
      assertConverged(wd)
    } finally noInjection()
  }

  test("window (b) crash after vectors, before grams: self-match replay, no dup vectors") {
    try retryingWindow(faultyDir("graft_curcrash_b_")) { wd =>
      setupStanding(wd)
      runBatch(wd, Some("grams")) // grams/... commits die
      // vector-carrying survivors met their own admitted vectors at
      // cosine 1 and dropped; only vectorless/zero/null rows re-emit
      assert(dupIds(wd) == Set(15L, 16L, 17L, 19L),
        s"window (b) re-emits only vectorless rows: ${dupIds(wd)}")
      assertConverged(wd)
    } finally noInjection()
  }

  test("window (c) crash after grams, before keys: replay excises to emptiness") {
    try retryingWindow(faultyDir("graft_curcrash_c_")) { wd =>
      setupStanding(wd)
      runBatch(wd, Some("keys")) // keys/... commits die
      // every re-admitted row excised to emptiness — INCLUDING the
      // short vectorless doc 19: the gram set indexes the full-text
      // hash of sub-w docs as their exact-identity screen, so even a
      // row with no w-gram and no self-matching vector excises away.
      // Only the null stub (which bypasses all rungs) re-emits.
      assert(dupIds(wd) == Set(16L),
        s"window (c) re-emits only the null stub: ${dupIds(wd)}")
      assertConverged(wd)
    } finally noInjection()
  }

  // ── the line rung (`lineIndexPath`): its own fixture + kill window ──

  private val chrome = "subscribe to our newsletter today"
  private val fresh21 = "fresh line about twenty one"

  private def lineBatch: Seq[(Long, String, Array[Float])] = Seq(
    // 21: chrome + a novel line -> rung 1b strips the chrome
    (21L, s"$chrome\n$fresh21", Array(0f, 0f, 1f, 0f)),
    // 23: all chrome -> rung 1b empties it, drops; its key and line
    //     counts still admit (the seen contract)
    (23L, chrome, Array.empty[Float]),
    // 16: null text -> stub
    (16L, null.asInstanceOf[String], Array(0f, 0f, 0f, 1f)))

  private val expectedLine = Set(
    (21L, fresh21, 5L, 0L),
    (16L, null, 0L, 0L))

  private def setupStandingLines(wd: String): Unit = {
    setupStanding(wd)
    Dedup.buildLineIndex(Seq(
        (1L, s"$chrome\nstanding filler one"),
        (2L, s"$chrome\nstanding filler two")).toDF("doc_id", "text"),
      "doc_id", "text", s"$wd/lines", minDocFreq = 2)
  }

  private def runLineBatch(wd: String, failSub: Option[String]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Array[Float])]
    def start() = Streams.curationIngestSink(spark,
      mem.toDF().toDF("doc_id", "text", "embedding"),
      "doc_id", "text", "embedding",
      s"$wd/keys", s"$wd/grams", s"$wd/ivf", s"$wd/out", s"$wd/ckpt",
      lineIndexPath = Some(s"$wd/lines"))
    mem.addData(lineBatch: _*)
    failSub match {
      case None =>
        val q = start()
        try q.processAllAvailable() finally q.stop()
      case Some(sub) => crashThenReplay(wd, sub, () => start())
    }
  }

  /** Line-rung invariants: chrome df landed under b0 (both carriers,
    * including the dropped all-chrome doc — the seen contract), the
    * all-chrome doc's key screens, and a fresh carrier probes clean.
    */
  private def assertLineConverged(wd: String): Unit = {
    val chromeLh = Seq(chrome).toDF("l").select(md5(col("l")))
      .head().getString(0)
    val b0 = spark.read.parquet(s"$wd/lines/lines")
      .where(col("delta") === "b0" && col("lh") === chromeLh)
      .select(col("df")).as[Long].collect().toSeq
    assert(b0 == Seq(2L), s"b0 must count both chrome carriers: $b0")
    assert(Dedup.exactDedupAgainstIndex(spark,
      Seq((99L, chrome)).toDF("doc_id", "text"), "text", s"$wd/keys")
      .count() == 0, "the all-chrome doc's key must screen")
    val probe = Dedup.removeLinesAgainstIndex(spark,
      Seq((99L, s"$chrome\nnovel probe line")).toDF("doc_id", "text"),
      "doc_id", "text", s"$wd/lines")
      .select(col("clean_text")).as[String].head()
    assert(probe == "novel probe line", s"standing probe must ban chrome: '$probe'")
  }

  test("line rung crash-free: chrome stripped, all-chrome dropped but seen") {
    val wd = faultyDir("graft_curcrash_line_ref_")
    setupStandingLines(wd)
    runLineBatch(wd, None)
    assert(outRows(wd).toSet == expectedLine &&
      outRows(wd).size == expectedLine.size, s"got ${outRows(wd)}")
    assertLineConverged(wd)
  }

  test("window (d) crash at the line-count append: token overwrite replays clean") {
    try retryingWindow(faultyDir("graft_curcrash_line_d_")) { wd =>
      setupStandingLines(wd)
      runLineBatch(wd, Some("delta=b0")) // lines/delta=b0 commits die
      // output/vectors/grams all committed before the crash: the
      // replay's rung 2 excises the re-admitted survivor against its
      // own grams (short text -> exact-identity screen), so only the
      // null stub re-emits; the count append REPLACES delta=b0
      assert(dupIds(wd) == Set(16L),
        s"window (d) re-emits only the null stub: ${dupIds(wd)}")
      IndexMaintenance.compactOutput(spark, s"$wd/out")
      assert(outRows(wd).toSet == expectedLine &&
        outRows(wd).size == expectedLine.size, s"got ${outRows(wd)}")
      assertLineConverged(wd)
      // vector admitted exactly once despite the replay
      val vecCounts = spark.read.parquet(s"$wd/ivf/data")
        .groupBy("vec_id").count().as[(Long, Long)].collect().toMap
      assert(vecCounts(21L) == 1,
        s"doc 21's vector must admit exactly once: $vecCounts")
    } finally noInjection()
  }

  test("window (d0) environmental death before the vector append: window-(a) re-emit, full convergence") {
    // THE ROUND-11 FLAKE, pinned deterministically. In 1-in-2 full-suite
    // runs on a loaded near-heap-limit JVM, window (d)'s first attempt
    // died (task OOM) between the output append and the vector append —
    // BEFORE the injected line-count rename — so the replay legally
    // re-admitted every survivor and re-emitted {21, 16}: the
    // window-(a) dup set for this fixture, which window (d)'s assert
    // misread as a convergence hole. Here that interleaving is forced
    // (the death lands at the ivf/data append) and the contract that
    // DOES govern it is asserted: full re-emit, then compaction
    // restores the crash-free content and every index converges with
    // idempotent vector admission. The convergence ladder has no hole;
    // the flake was the test asserting window (d)'s dup set against an
    // earlier window's state.
    try retryingWindow(faultyDir("graft_curcrash_line_d0_")) { wd =>
      setupStandingLines(wd)
      runLineBatch(wd, Some("data")) // ivf/data commits die: q1 dies at
      // the vector append, output already committed — the flake's state
      assert(dupIds(wd) == Set(21L, 16L),
        s"death before the vector append re-emits all survivors: ${dupIds(wd)}")
      IndexMaintenance.compactOutput(spark, s"$wd/out")
      assert(outRows(wd).toSet == expectedLine &&
        outRows(wd).size == expectedLine.size, s"got ${outRows(wd)}")
      assertLineConverged(wd)
      // the replay admitted doc 21's vector exactly once
      val vecCounts = spark.read.parquet(s"$wd/ivf/data")
        .groupBy("vec_id").count().as[(Long, Long)].collect().toMap
      assert(vecCounts(21L) == 1,
        s"doc 21's vector must admit exactly once: $vecCounts")
    } finally noInjection()
  }
}
