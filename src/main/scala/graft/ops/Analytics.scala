package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence and distribution diagnostics — the analytics the
  * reference reaches through pushed SQL (dasladen task.py:180,256 hands
  * arbitrary SQL to its backing engine) expressed as first-class
  * operators with oracle twins.
  */
object Analytics {

  /** Strict-order funnel: for steps A → B → C…, a user completes step k
    * when an event of step k's type occurs STRICTLY AFTER the user's
    * earliest completion time of step k−1 (the sequential-min
    * definition: t₁ = min ts(A), tₖ = min ts(step k) > tₖ₋₁). Output is
    * one row per step: (step, event_type, n_users), n_users
    * monotonically non-increasing.
    *
    * Shape at 100 TB: step 1 is a filtered map-side-combined
    * aggregation on the user key; each later step is ONE equi-join of
    * the filtered event stream against the previous stage's (user,
    * time) — both sides shuffle on the fixed-width user key and AQE
    * broadcasts the stage side once the funnel narrows (stages only
    * shrink). No window over a user's full history, no per-user event
    * collection: state per user per stage is one timestamp.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             within: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // `within` is a per-transition conversion window ("30 days", "1
    // hour"): step k only counts within that interval of completing
    // step k−1 — the form product funnels are actually defined in
    val windowOk: Column => Column = within match {
      case Some(iv) => pt => col(tsCol) <= pt + expr(s"INTERVAL $iv")
      case None => _ => lit(true)
    }
    val stages = steps.zipWithIndex
      .scanLeft(Option.empty[DataFrame]) { case (prev, (step, _)) =>
        val hits = events.where(col(typeCol) === step)
        Some(prev match {
          case None =>
            hits.groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
          case Some(p) =>
            hits.join(p.select(col(userCol), col("_t").as("_pt")), userCol)
              .where(col(tsCol) > col("_pt") && windowOk(col("_pt")))
              .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
        })
      }.flatten
    stages.zip(steps).zipWithIndex.map { case ((stage, name), i) =>
      stage.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(name).as("event_type"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Retention cohorts: users grouped by the week of their FIRST event,
    * counted distinct per whole-week offset of later activity — the
    * (cohort × age) activity matrix. Week offsets are exact integer
    * micros division (engine-portable floor); cohort labels are
    * Monday-start `date_trunc('week')` in both engines.
    *
    * Shape at 100 TB: one map-side-combined min per user, one equi-join
    * of events against the (user, first-ts) side on the fixed-width user
    * key, and a distinct-count whose grouping key (cohort, offset, user)
    * partial-aggregates before the exchange.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("_f"))
    events.select(col(userCol), col(tsCol)).join(first, userCol)
      .select(col(userCol),
        // yyyy-MM-dd string, not a DATE: date physical types canonicalize
        // differently across engines in the oracle compare
        date_format(date_trunc("week", col("_f")), "yyyy-MM-dd")
          .as("cohort_week"),
        expr(s"(unix_micros($tsCol) - unix_micros(_f)) div 604800000000")
          .as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Key-skew report: the `topK` hottest values of `keyCol` with their
    * counts and corpus share — the measurement behind every salting /
    * skew-join decision (AQE handles runtime skew, but a standing hot
    * key in a LAYOUT — partition column, join key, LSH bucket — needs
    * redesign, and this is the query that finds it). One
    * map-side-combined count on the key, a 1-row total broadcast, and a
    * TakeOrderedAndProject cut; only topK rows reach the driver side of
    * anything. Share is one correctly-rounded division of exact
    * integer-valued doubles — hash-safe.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10,
                 scale: Int = 6): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("_n"))
    counts.crossJoin(broadcast(total))
      .select(col(keyCol), col("cnt"),
        round(col("cnt").cast("double") / col("_n"), scale).as("share"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(topK)
  }

  /** Per-source corpus data card — the dataset-documentation audit
    * (Datasheets-for-Datasets shape): one row per `srcCol` value with
    *
    *   n_docs      — documents from the source
    *   n_null_text — rows with no text payload
    *   n_duped     — docs whose exact content hash (md5 of text) appears
    *                 more than once CORPUS-WIDE (cross-source: two dumps
    *                 crawling the same pages both show elevated n_duped)
    *   ws_tokens   — total whitespace tokens contributed
    *   avg_chars   — mean declared n_chars (2 decimals)
    *   n_langs     — distinct declared language tags
    *
    * The mixture-weighting / source-triage summary: sources with high
    * n_duped or degenerate avg_chars get down-weighted or dropped before
    * training.
    *
    * Shape at 100 TB: duplicate keys are ONE map-side-combined exchange
    * on the fixed-width md5 (the [[Dedup.exact]] shuffle) semi-joined
    * back as a key join; everything else is a single per-source
    * aggregation — token counts come from a codegen'd size(split())
    * projection, not an explode, so no row multiplication anywhere.
    */
  def dataCard(docs: DataFrame, idCol: String, textCol: String,
               srcCol: String, langCol: String,
               charsCol: String): DataFrame = {
    val keyed = docs.withColumn("_k",
      when(col(textCol).isNotNull, md5(col(textCol))))
    val duped = keyed.where(col("_k").isNotNull)
      .groupBy(col("_k")).agg(count(lit(1)).as("_c"))
      .where(col("_c") > 1)
      .select(col("_k"))
    keyed.join(duped.withColumn("_dup", lit(1)), Seq("_k"), "left")
      .groupBy(col(srcCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col(textCol).isNull, 1L).otherwise(0L)).as("n_null_text"),
        sum(when(col("_dup").isNotNull, 1L).otherwise(0L)).as("n_duped"),
        sum(coalesce(
          size(expr(s"filter(split($textCol, ' '), x -> x <> '')")), lit(0))
          .cast("long")).as("ws_tokens"),
        round(avg(col(charsCol).cast("double")), 2).as("avg_chars"),
        countDistinct(col(langCol)).as("n_langs"))
      .orderBy(col("source"))
  }
}
