package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins the unit-robust events loader: the driver regenerates the fixture
  * and has already shipped `ts` as both raw INT64 nanos and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false); a scale-grade source reads
  * the footer's logical type instead of assuming one physical encoding.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2025-01-01T00:00:00Z and +1.5s, in nanos since epoch
  private val nanos = Seq(1735689600000000000L, 1735689601500000000L)

  private def base: DataFrame =
    Seq((1L, nanos(0), 10L, "click", 1.5, "{}"),
        (2L, nanos(1), 11L, "view", 2.0, "{}"))
      .toDF("event_id", "ts_n", "user_id", "event_type", "value", "props")

  private def check(dir: String): Unit = {
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    val tss = got.orderBy("event_id")
      .select(unix_micros(col("ts"))).as[Long].collect().toSeq
    assert(tss == nanos.map(_ / 1000L), s"wrong ts values from $dir")
  }

  test("loadEvents reads raw INT64-nanos ts (legacy fixture encoding)") {
    val dir = tmpDir("graft_ev_raw_")
    base.withColumn("ts", col("ts_n"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir)
  }

  test("loadEvents reads TIMESTAMP(MICROS, ntz) ts (current fixture encoding)") {
    val dir = tmpDir("graft_ev_ntz_")
    base.withColumn("ts",
        expr("timestamp_micros(ts_n div 1000)").cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir)
  }

  test("loadEvents reads UTC-adjusted timestamp ts unchanged") {
    val dir = tmpDir("graft_ev_tz_")
    base.withColumn("ts", expr("timestamp_micros(ts_n div 1000)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir)
  }

  test("live fixture events land in the fixture's epoch, not 1970") {
    val fx = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$fx/events.parquet").exists())
    val yr = Tables.load(spark, fx, "events")
      .agg(max(year(col("ts")))).head.getInt(0)
    assert(yr > 2000, s"events ts collapsed to epoch (max year $yr)")
  }
}
