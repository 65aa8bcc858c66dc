package graft.streaming

/** Per-rung admission metrics for the composed streaming sinks — the
  * ladder's observability surface (K5's per-task-log cadence applied to
  * the admission pipeline: one line per micro-batch instead of one per
  * 10k rows, because the BATCH is the unit an ingest operator reasons
  * about — "batch 17: 10k in, 9.2k past keys, 8.9k past grams, 8.7k
  * emitted" is the signal that a rung started over- or under-dropping).
  *
  * Counts are taken on the sink's ALREADY-PERSISTED per-batch frames, so
  * each is a cache scan of micro-batch-sized data — no second probe of
  * any standing index, no extra shuffle, and zero cost when no metrics
  * object is attached (the sinks skip counting entirely). Recording
  * happens AFTER the batch's index appends complete, so the log carries
  * only batches that finished — a crashed batch leaves no line, and a
  * replay logs its own (the at-least-once twin of the output contract).
  *
  * Driver-side state only; `batches`/`totals` are the spec surface
  * (StreamsSpec pins the ladder on a known sequence).
  */
final class RungMetrics(log: graft.runner.TaskLog = graft.runner.TaskLog.Silent) {

  private val recs =
    scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(String, Long)])]

  private[streaming] def record(batchId: Long,
                                counts: Seq[(String, Long)]): Unit =
    synchronized {
      recs += ((batchId, counts))
      log.write(s"rungs batch=$batchId " +
        counts.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }

  /** (batchId, rung → rows) per completed batch, in completion order
    * (a replayed batch id appears once per completion).
    */
  def batches: Seq[(Long, Map[String, Long])] =
    synchronized(recs.map { case (b, c) => (b, c.toMap) }.toList)

  /** Rung → rows summed over all completed batches. */
  def totals: Map[String, Long] =
    batches.flatMap(_._2).groupMapReduce(_._1)(_._2)(_ + _)
}
