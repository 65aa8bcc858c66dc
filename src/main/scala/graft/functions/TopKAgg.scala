package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by (score desc, id asc) as a typed Aggregator — the
  * aggregation the k-NN joins rank with.
  *
  * Why an Aggregator and not `row_number() over (partition by q_id)`:
  * the window form SHUFFLES AND SORTS EVERY candidate row (per query,
  * nProbe/nCells of the corpus) just to discard all but k of them. The
  * aggregator's buffer is a k-bounded sorted list reduced and merged
  * MAP-SIDE, so the exchange carries at most k rows per (query ×
  * partition) and there is no sort — the difference between shuffling
  * the probed fraction of 100 TB and shuffling k × |queries| rows.
  *
  * The result is a pure function of the candidate multiset (total order
  * on (score desc, id asc)), so partitioning cannot change it — the
  * k-NN joins stay hash-checkable against their DuckDB ROW_NUMBER
  * twins.
  */
case class TopKBuf(entries: Seq[(Double, Long)])

class TopKAgg(k: Int) extends Aggregator[(Long, Double), TopKBuf, Seq[(Long, Double)]] {
  require(k >= 1, s"k must be positive: $k")

  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (s, id) => (-s, id) }

  override def zero: TopKBuf = TopKBuf(Seq.empty)

  override def reduce(b: TopKBuf, row: (Long, Double)): TopKBuf = {
    val e = (row._2, row._1)
    // fast reject: full buffer and the candidate sorts after the current tail
    if (b.entries.size >= k && ord.gteq(e, b.entries.last)) b
    else TopKBuf((b.entries :+ e).sorted(ord).take(k))
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    if (a.entries.isEmpty) b
    else if (b.entries.isEmpty) a
    else TopKBuf((a.entries ++ b.entries).sorted(ord).take(k))

  override def finish(b: TopKBuf): Seq[(Long, Double)] =
    b.entries.map { case (s, id) => (id, s) }

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}

/** The n lexicographically-smallest string keys per group — the bounded
  * rank behind [[graft.ops.Sampling.exactSizeSample]]: ranking md5-hex
  * keys keeps it generic over the underlying id type (any id hashes to
  * the same 32-char string space).
  */
case class MinNBuf(entries: Seq[String])

class MinNAgg(n: Int) extends Aggregator[String, MinNBuf, Seq[String]] {
  require(n >= 1, s"n must be positive: $n")

  override def zero: MinNBuf = MinNBuf(Seq.empty)

  override def reduce(b: MinNBuf, key: String): MinNBuf =
    if (key == null) b
    else if (b.entries.size >= n && key >= b.entries.last) b
    else MinNBuf((b.entries :+ key).sorted.take(n))

  override def merge(a: MinNBuf, b: MinNBuf): MinNBuf =
    if (a.entries.isEmpty) b
    else if (b.entries.isEmpty) a
    else MinNBuf((a.entries ++ b.entries).sorted.take(n))

  override def finish(b: MinNBuf): Seq[String] = b.entries

  override def bufferEncoder: Encoder[MinNBuf] = Encoders.product[MinNBuf]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object TopKAgg {
  /** top-k of (id, score) rows as array<struct<_1: id, _2: score>>,
    * sorted by (score desc, id asc).
    */
  def topK(k: Int)(id: Column, score: Column): Column =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k)).apply(id, score)

  /** n smallest string keys per group, ascending. */
  def minN(n: Int)(key: Column): Column =
    org.apache.spark.sql.functions.udaf(new MinNAgg(n)).apply(key)
}
