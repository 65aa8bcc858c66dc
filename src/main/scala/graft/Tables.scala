package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Loaders for the driver-generated parquet fixture tables (TESTDATA.md).
  *
  * All queries read through here so that source-level concerns (pushdown,
  * pruning) stay in one place: we hand Spark the bare parquet path and let
  * the vectorized reader + Catalyst handle filter pushdown and column
  * pruning — at 100 TB the same call reads a partitioned table and prunes
  * partitions for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.parquet fixture schema, `ts` typed long: TIMESTAMP(NANOS) is
    * rejected by schema INFERENCE, but an explicit user schema reads the
    * physical INT64 directly — no session conf involved (the legacy
    * `nanosAsLong` conf this replaced was global state that bled into
    * concurrent readers of other nanos parquet in the same session).
    */
  private[graft] def eventsRawSchema: StructType = eventsSchema

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // `ts div 1000` (integral — a double division would lose precision
      // at 1.7e18) truncates nanos to the micros Spark can represent,
      // exactly like DuckDB's NS→TIMESTAMP cast, so oracle twins cast the
      // same column the same way.
      spark.read.schema(eventsSchema).parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view (for the SQL surface —
    * the reference pushes arbitrary SQL to its backing engine, ours is
    * Spark SQL; see SURVEY.md §2.5 / reference task.py:180,256).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
