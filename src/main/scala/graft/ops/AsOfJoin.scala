package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each query row, the most recent point row with the same
  * key and point-time <= query-time.
  *
  * Spark has no native as-of operator; the scalable formulation is the
  * union + `last(_, ignoreNulls) over (partition by key order by time)`
  * trick: ONE shuffle (window partitioning by key), no row explosion, no
  * correlated subquery. A naive `left join + groupBy(max)` shuffles twice
  * and explodes each query row by every matching point row — at 100 TB
  * with hot keys that join is the bottleneck; this form is linear in
  * |points| + |queries| per key.
  *
  * Semantics follow the reference's effective SQL surface (dasladen pushes
  * arbitrary SQL to its backing engine, /root/reference/dasladen/task.py:180);
  * an as-of is declared in SURVEY.md §2.5 / §2.9 Q10.
  *
  * @param points    rows carrying the value being looked up
  * @param queries   rows wanting the latest value as of their time
  * @param keyCols   equi-key column name present in both sides
  * @param pointTime time column in `points`
  * @param queryTime time column in `queries`
  * @param valueCol  column of `points` to surface
  * Ties (point time == query time) include the point (<= semantics).
  */
object AsOfJoin {
  def apply(
      points: DataFrame,
      queries: DataFrame,
      keyCol: String,
      pointTime: String,
      queryTime: String,
      valueCol: String,
      asOfName: String = "asof_value"): DataFrame = {
    val qCols = queries.columns
    // Queries carry their full row as a struct so no second join is needed
    // to recover query columns after the window.
    val qStruct = struct(qCols.map(queries(_)): _*)
    val qStructType = org.apache.spark.sql.types.StructType(
      qCols.map(c => queries.schema(c)))
    // Tag: points sort before queries at equal time (0 < 1) so a point at
    // exactly the query time is visible to the query row (<= semantics).
    val pSide = points.select(
      col(keyCol).as("_k"),
      col(pointTime).as("_t"),
      lit(0).as("_side"),
      col(valueCol).as("_v"),
      lit(null).cast(qStructType).as("_q"))
    val qSide = queries.select(
      col(keyCol).as("_k"),
      col(queryTime).as("_t"),
      lit(1).as("_side"),
      lit(null).cast(points.schema(valueCol).dataType).as("_v"),
      qStruct.as("_q"))

    val w = Window
      .partitionBy("_k")
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    pSide.unionByName(qSide)
      .withColumn("_asof", last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(qCols.map(c => col(s"_q.$c").as(c)) :+ col("_asof").as(asOfName): _*)
  }
}
