package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: the concat-and-chunk step
  * that lays documents end-to-end into a token stream and cuts it into
  * fixed-length training sequences. Each document gets its stream offset
  * and the range of sequence ids it lands in, from which a writer can
  * emit attention-boundary masks or split shards without ever
  * materializing the concatenated stream.
  *
  * Deterministic by construction — offsets follow the (shard, id) order,
  * so re-runs, engine ports and corpus growth within other shards never
  * move a document's sequence assignment.
  *
  * Scale shape: ONE window shuffle, partitioned by `shardCol`. The
  * running sum is per shard, which is what a real corpus wants anyway
  * (shards = sources/splits written independently); a single global
  * stream would serialize the cumulative sum into one partition, which
  * is exactly the degenerate case this signature makes hard to write.
  */
object Packing {

  /** @param nTokensCol per-doc token count (precomputed — e.g.
    *                   [[graft.functions.VectorFunctions.tokenCountsStruct]])
    * @return input columns + `start_off` (token offset of the doc inside
    *         its shard's stream), `seq_first`/`seq_last` (ids of the
    *         seqLen-sized chunks the doc spans, docs straddle boundaries
    *         as in standard concat-then-chunk packing)
    */
  def pack(df: DataFrame, idCol: String, nTokensCol: String,
           shardCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    df.withColumn("_end", sum(col(nTokensCol)).over(w))
      .withColumn("start_off", col("_end") - col(nTokensCol))
      // integer-exact chunk math (doubles are exact below 2^53 — offsets
      // beyond that are past any real corpus, but stay in longs anyway)
      .withColumn("seq_first",
        floor(col("start_off") / lit(seqLen.toLong)).cast("long"))
      .withColumn("seq_last",
        floor((col("_end") - 1) / lit(seqLen.toLong)).cast("long"))
      .drop("_end")
  }
}
