package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB design points the query layer
  * relies on: bucketing for shuffle-free co-located joins, and explicit
  * key salting for skew the optimizer cannot see.
  */
object Layout {

  /** Write `df` as a bucketed, bucket-sorted managed parquet table. Two
    * tables bucketed by the same key into the same bucket count join with
    * NO exchange on either side (SortMergeJoin reads bucket i against
    * bucket i) — the standard way to pre-pay the shuffle for a fact table
    * joined repeatedly on the same key. The write itself shuffles once;
    * every subsequent join is exchange-free.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Salted inner equi-join for stable, known key skew: every left row
    * gets a per-row salt in [0, salts) — seeded `rand`, NOT a hash of the
    * row: hot keys usually repeat identical rows, which a content hash
    * would send to one reducer again — the right side is replicated
    * `salts` times, and the join key becomes (key, salt).
    *
    * Prefer AQE's runtime skew splitting
    * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it handles
    * skew it can measure with zero replication cost. Reach for explicit
    * salting when the skewed side feeds a join shape AQE does not split
    * (e.g. a broadcast-ineligible dimension replicated cheaply) or the
    * skew is known ahead of time and the right side is small enough that
    * `salts`× replication is cheaper than a lopsided reducer.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame,
                      key: String, salts: Int, seed: Long = 42L): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val l = left.withColumn("_salt", floor(rand(seed) * salts).cast("int"))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(lit).toIndexedSeq: _*)))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
