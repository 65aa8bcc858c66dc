package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of `array<double>` vectors as a typed
  * `Aggregator[IN, BUF, OUT]` (SURVEY §2.7's UDAF path, registered for
  * SQL as `graft_vector_mean` via [[VectorFunctions.registerSql]]).
  *
  * Why an Aggregator and not posexplode→(group,pos) mean: the buffer is
  * one dim-width running sum per (group × partition), reduced and merged
  * MAP-SIDE — computing per-group centroids shuffles nGroups × dim
  * doubles, where the explode formulation shuffles a (partially
  * aggregated) row per (group, position) and materializes n × dim
  * exploded rows first. This is the aggregation [[graft.ops.Similarity
  * .buildIvfIndex]]'s k-means refinement runs per round.
  *
  * Null and empty vectors are ignored; an empty group yields an empty
  * vector. Dimension is taken from the first vector seen (fixed-dim
  * corpus contract, as everywhere else in the engine).
  */
case class VectorMeanBuf(sum: Array[Double], n: Long)

object VectorMean extends Aggregator[Seq[Double], VectorMeanBuf, Seq[Double]] {

  override def zero: VectorMeanBuf = VectorMeanBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VectorMeanBuf, v: Seq[Double]): VectorMeanBuf = {
    if (v == null || v.isEmpty) b
    else if (b.n == 0L) VectorMeanBuf(v.toArray, 1L)
    else {
      val s = b.sum
      var i = 0
      val d = math.min(s.length, v.length)
      while (i < d) { s(i) += v(i); i += 1 }
      VectorMeanBuf(s, b.n + 1)
    }
  }

  override def merge(a: VectorMeanBuf, b: VectorMeanBuf): VectorMeanBuf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      val s = a.sum
      var i = 0
      val d = math.min(s.length, b.sum.length)
      while (i < d) { s(i) += b.sum(i); i += 1 }
      VectorMeanBuf(s, a.n + b.n)
    }

  override def finish(b: VectorMeanBuf): Seq[Double] =
    if (b.n == 0L) Seq.empty
    else b.sum.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VectorMeanBuf] = Encoders.product[VectorMeanBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
