package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The COMPOSED streaming ingest ([[Streams.curationIngestSink]]): one
  * stream through all three dedup rungs — exact keys, lexical spans,
  * semantic cells — with every standing index advanced per batch, so
  * cross-batch duplicates die at the rung that can see them.
  */
class CurationIngestSpec extends SparkSpec {
  import spark.implicits._

  private val passage =
    "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 words

  test("three-rung composed gate: exact, span, and semantic screens all advance") {
    val wd = tmpDir("graft_curingest_")
    val (keyIdx, gramIdx, ivfIdx) = (s"$wd/keys", s"$wd/grams", s"$wd/ivf")
    // standing corpus: one doc (text carries the 8-word passage), two
    // vectors seeding two IVF cells
    val standingDocs = Seq((1L, s"$passage tail words here"))
      .toDF("doc_id", "text")
    graft.ops.Dedup.buildExactKeyIndex(standingDocs, "text", keyIdx)
    graft.ops.Dedup.buildGramIndex(standingDocs, "text", gramIdx, w = 8)
    val standingVecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    graft.ops.Similarity.buildIvfIndex(standingVecs, "vec_id", "embedding",
      ivfIdx, nCells = 2)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Array[Float])]
    val outPath = s"$wd/out"
    val metrics = new RungMetrics()
    val q = Streams.curationIngestSink(spark,
      mem.toDF().toDF("doc_id", "text", "embedding"),
      "doc_id", "text", "embedding",
      keyIdx, gramIdx, ivfIdx, outPath, s"$wd/ckpt",
      metrics = Some(metrics))
    try {
      // A 10: exact duplicate of the standing doc  -> rung 1 drops
      // B 11: novel text carrying the standing 8-word passage -> excised
      // C 12: novel text, vector ~ standing [1,0,0,0] -> rung 3 drops
      // D 13: novel text, well-separated vector -> admitted intact
      // E 14: null text -> passes through as (14, null, 0, 0)
      mem.addData(
        (10L, s"$passage tail words here", Array(0f, 1f, 0f, 0f)),
        (11L, s"fresh opening words then $passage and beyond it more",
          Array(0f, 0f, 1f, 0f)),
        (12L, "completely different wording but the same meaning rephrased",
          Array(0.9f, 0.1f, 0f, 0f)),
        (13L, "unrelated novel document about something else entirely",
          Array(0f, 1f, 0f, 0.2f)),
        (14L, null.asInstanceOf[String], Array(0f, 0f, 0f, 0f)))
      q.processAllAvailable()
      // batch 2 — every rung must see batch 1's admissions:
      // F 20: exact duplicate of D's text          -> rung 1 (keys advanced)
      // G 21: vector ~ D's vector, novel text      -> rung 3 (cells advanced)
      // H 22: exactly B's EMITTED clean text       -> rung 2 (grams advanced
      //        with the emitted text, not just the original)
      // I 23: genuinely novel                      -> admitted
      mem.addData(
        (20L, "unrelated novel document about something else entirely",
          Array(0f, 0f, 1f, 1f)),
        (21L, "another novel paraphrase of the unrelated document",
          Array(0f, 0.95f, 0f, 0.2f)),
        (22L, "fresh opening words then and beyond it more",
          Array(1f, 1f, 0f, 0f)),
        (23L, "closing batch with entirely new content appearing once",
          Array(-0.2f, 0f, -1f, 0f)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(outPath)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(out.keySet == Set(11L, 13L, 14L, 23L),
      s"10 exact, 12 semantic, 20 cross-batch exact, 21 cross-batch " +
        s"semantic, 22 emitted-gram dup must all drop: ${out.keySet}")
    assert(out(11L) == "fresh opening words then and beyond it more",
      s"standing passage excised from 11: ${out(11L)}")
    assert(out(13L) == "unrelated novel document about something else entirely")
    assert(out(14L) == null, "null-text rows pass through")

    // the indexes advanced: keys grew, D's vector is in the cell layout
    assert(spark.read.parquet(s"$keyIdx/keys").count() > 1)
    assert(spark.read.parquet(s"$ivfIdx/data")
      .where(col("vec_id") === 13L).count() == 1,
      "admitted vectors must land in the IVF layout")

    // the per-rung admission ladder, pinned per batch: each metric is
    // the row count SURVIVING that rung (rung 1b absent — no line index)
    val ladders = metrics.batches
    assert(ladders.map(_._1) == Seq(0L, 1L), s"one line per completed batch")
    assert(ladders(0)._2 == Map(
      "rows_in" -> 5L,   // A..E
      "keys" -> 3L,      // A(10) dropped by the standing key screen
      "grams" -> 3L,     // B(11) excised but kept, C, D pass
      "semantic" -> 2L,  // C(12) dropped at the cell screen
      "out_rows" -> 3L,  // survivors + the null-text pass-through E
      "vec_rows" -> 2L), s"batch-0 ladder: ${ladders(0)._2}")
    assert(ladders(1)._2 == Map(
      "rows_in" -> 4L,
      "keys" -> 3L,      // F(20) dropped by batch-0's ADVANCED keys
      "grams" -> 2L,     // H(22) excised to emptiness by advanced grams
      "semantic" -> 1L,  // G(21) dropped by batch-0's admitted vector
      "out_rows" -> 1L,
      "vec_rows" -> 1L), s"batch-1 ladder: ${ladders(1)._2}")
    assert(metrics.totals("rows_in") == 9L &&
      metrics.totals("out_rows") == 4L)
  }
}
