package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): a new session starts when the
  * gap to the previous event of the same key exceeds `gapSeconds`.
  *
  * Exactly the batch twin of Structured Streaming's `session_window`
  * (graft.streaming); kept window-function-based so it is oracle-checkable
  * in plain SQL. One shuffle (window partition by key), then a partial-agg
  * groupBy that reuses the same partitioning.
  *
  * Gap arithmetic is in integer microseconds (`unix_micros`) — no float
  * time math, so engines agree exactly.
  */
object Sessionize {
  def apply(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      gapSeconds: Long = 1800): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val gapUs = gapSeconds * 1000000L
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew = when(prev.isNull || unix_micros(col(tsCol)) - prev > gapUs, 1).otherwise(0)
    events
      .withColumn("_new", isNew)
      .withColumn("sess",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("sess"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sval"))
  }
}
