package graft

import org.apache.spark.sql.functions._

/** Throughput bench for the COMPOSED streaming ingest
  * ([[graft.streaming.Streams.curationIngestSink]]): standing indexes
  * built from the %4==0 slice (exact keys, 8-grams, IVF cells), then
  * the remaining (doc, vector) rows stream through the three-rung gate
  * in fixed-size micro-batches. Reports per-batch seconds and rows/s —
  * the number a capacity plan needs, since each batch pays the same
  * screen structure regardless of corpus size (the standing side is
  * Bloom/cell-pruned, never rescanned wholesale).
  *
  * Three protocol extensions beyond the steady state:
  *
  *  - **`SPARK_GRAFT_REPL` > 1**: the [[PipelineBench]] SALTED-replica
  *    protocol as a stream — replicas are distinct at the exact rung
  *    but every interior 8-gram is cross-replica duplicated, so
  *    replica-0 batches are the novel-heavy regime and every later
  *    batch is the excise-everything worst case. Each replica carries
  *    its base doc's embedding (`doc_id % stride`), so the few rows
  *    that survive rung 2 meet their base at cosine 1 in rung 3.
  *  - **Kill-and-resume**: the query is STOPPED at the halfway batch
  *    and a fresh sink resumes from the checkpoint — the recorded
  *    `resume_s` is recovery + that batch (centroid reload, offset
  *    log replay, the batch itself).
  *  - **Convergence**: the final batch is RE-SENT verbatim (nulls and
  *    whitespace-only rows excluded — those pass the gate by
  *    contract); the output row count must not move. Asserted
  *    in-bench, recorded as `replay_s` / `replay_added`.
  *
  * One JSON line (the [[Bench]] discipline); recorded in BASELINE.md's
  * streaming-ingest section.
  */
object StreamIngestBench {
  def main(args: Array[String]): Unit = {
    import BenchHarness.{fmt, sfDir, time}
    val batchRows = BenchHarness.env("SPARK_GRAFT_BATCH_ROWS", "1250").toInt
    val repl = BenchHarness.env("SPARK_GRAFT_REPL", "1").toInt
    val cpus = BenchHarness.cpus()
    val spark = BenchHarness.session(cpus)
    import spark.implicits._

    val wd = BenchHarness.tmp("graft_streambench_")
    val (keyIdx, gramIdx, ivfIdx) = (s"$wd/keys", s"$wd/grams", s"$wd/ivf")

    val docs =
      if (repl <= 1)
        Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
      else BenchHarness.replicatedDocs(spark, sfDir, repl, cpus, salt = true)
    val embs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val standing = docs.filter(col("doc_id") % 4 === 0)
    graft.ops.Dedup.buildExactKeyIndex(standing, "text", keyIdx)
    graft.ops.Dedup.buildGramIndex(standing, "text", gramIdx, w = 8)
    graft.ops.Similarity.buildIvfIndex(
      embs.join(standing.select((col("doc_id") % BenchHarness.ReplicaStride)
        .as("vec_id")), Seq("vec_id"), "left_semi"),
      "vec_id", "embedding", ivfIdx, nCells = 16)

    // the incoming rows: batch slice, each doc carrying its BASE doc's
    // vector (replicas share the base embedding — the rung-3 dup case)
    val incoming = docs.filter(col("doc_id") % 4 =!= 0)
      .withColumn("_base", col("doc_id") % BenchHarness.ReplicaStride)
      .join(embs.withColumnRenamed("vec_id", "_base"), Seq("_base"), "left")
      .select(col("doc_id"), col("text"), col("embedding"))
      .as[(Long, String, Array[Float])]
      .collect().sortBy(_._1)

    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Array[Float])]
    def start() = graft.streaming.Streams.curationIngestSink(spark,
      mem.toDF().toDF("doc_id", "text", "embedding"),
      "doc_id", "text", "embedding",
      keyIdx, gramIdx, ivfIdx, s"$wd/out", s"$wd/ckpt")

    val batches = incoming.grouped(batchRows).toVector
    val resumeAt = batches.size / 2
    var q = start()
    var resumeS = -1.0
    val batchTimes = try {
      batches.zipWithIndex.map { case (rows, i) =>
        if (i == resumeAt && i > 0) {
          // kill-and-resume: stop, enqueue, restart from the checkpoint
          q.stop()
          mem.addData(rows.toIndexedSeq)
          val (q2, t) = time {
            val qq = start(); qq.processAllAvailable(); qq
          }
          q = q2
          resumeS = t
          (rows.size, t)
        } else {
          mem.addData(rows.toIndexedSeq)
          val (_, t) = time(q.processAllAvailable())
          (rows.size, t)
        }
      }
    } catch { case e: Throwable => q.stop(); throw e }

    // convergence: the last batch re-sent verbatim must admit NOTHING
    // (null/whitespace rows excluded — they pass through by contract)
    val replayRows = batches.last
      .filter(r => r._2 != null && r._2.trim.nonEmpty)
    val before = spark.read.parquet(s"$wd/out").count()
    mem.addData(replayRows.toIndexedSeq)
    val (_, replayS) = time(q.processAllAvailable())
    q.stop()
    val after = spark.read.parquet(s"$wd/out").count()
    assert(after == before,
      s"re-sent batch must add nothing: $before -> $after")

    val totalRows = batchTimes.map(_._1).sum
    val totalSec = batchTimes.map(_._2).sum
    val admitted = spark.read.parquet(s"$wd/out").count()
    println(
      s"""{"bench":"stream_ingest","sf":"$sfDir","repl":$repl,""" +
      s""""batch_rows":$batchRows,""" +
      s""""n_batches":${batchTimes.size},"rows_in":$totalRows,""" +
      s""""rows_admitted":$admitted,"total_s":${fmt(totalSec)},""" +
      s""""rows_per_s":${fmt(totalRows / totalSec)},""" +
      s""""resume_s":${fmt(resumeS)},"replay_s":${fmt(replayS)},""" +
      s""""replay_added":${after - before},""" +
      s""""batch_s":[${batchTimes.map(t => fmt(t._2)).mkString(",")}]}""")
    spark.stop()
  }
}
