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

  /** Distribution drift between two corpus snapshots — the population-
    * stability audit (PSI, the production data-drift metric) over a
    * caller-chosen bucket column (a language tag, a source, a fixed
    * score band — the [[graft.ops.Sampling.scoreCurriculum]] band
    * convention composes directly): per bucket, both sides' counts and
    * shares and the PSI term
    *
    *   psi = (cur' − ref') × ln(cur' / ref'),  x' = max(share, eps)
    *
    * (the eps floor makes one-sided buckets finite; each term is ≥ 0 —
    * difference and log ratio share sign — so Σ psi over the output IS
    * the total index, with the usual reading: < 0.1 stable, 0.1–0.25
    * drifting, > 0.25 shifted). "Did the new crawl / the length filter
    * change my language mix" becomes one oracle-checkable table instead
    * of a judgment call.
    *
    * Shape at 100 TB: each side collapses to |buckets| rows via one
    * map-side-combined count aggregate (the corpus never shuffles);
    * totals re-aggregate those bounded rows ([[skewReport]]'s 1-row
    * scalar-total attach, twice); the FULL-OUTER join of the two bucket
    * tables is the one join Spark cannot broadcast, so it sort-merges —
    * over |buckets| (tens of) rows, never the corpus. Deterministic →
    * DuckDB hash-checked (q135; LN parity with the engine is
    * established by the DSIR oracles).
    */
  def distributionDrift(ref: DataFrame, cur: DataFrame, bucketCol: String,
                        eps: Double = 1e-6, scale: Int = 6): DataFrame =
    driftFromCounts(
      ref.groupBy(col(bucketCol)).agg(count(lit(1)).as("ref_n")),
      cur.groupBy(col(bucketCol)).agg(count(lit(1)).as("cur_n")),
      bucketCol, eps, scale)

  /** [[distributionDrift]]'s core over pre-aggregated (bucket, n)
    * tables — the form the streaming card sink feeds, where the
    * reference side is a FROZEN bounded count snapshot collected once
    * at sink start rather than a corpus re-scanned every micro-batch.
    * Expects columns `ref_n` / `cur_n` alongside `bucketCol`.
    */
  private[graft] def driftFromCounts(refCounts: DataFrame,
                                     curCounts: DataFrame, bucketCol: String,
                                     eps: Double, scale: Int): DataFrame = {
    require(eps > 0, s"eps must be positive: $eps")
    // The key is renamed per side (_rb/_cb) so the null-safe join
    // condition stays unambiguous when both snapshots derive from the
    // SAME DataFrame (the q135 shape: corpus vs its filtered self).
    def share(counts: DataFrame, n: String, b: String): DataFrame =
      counts.crossJoin(broadcast(counts.agg(sum(col(n)).as("_t"))))
        .select(col(bucketCol).as(b), col(n),
          (col(n).cast("double") / col("_t").cast("double"))
            .as(s"${n}_share_raw"))
    val rf = coalesce(col("ref_n_share_raw"), lit(0.0))
    val cf = coalesce(col("cur_n_share_raw"), lit(0.0))
    val rfF = greatest(rf, lit(eps))
    val cfF = greatest(cf, lit(eps))
    // Null-safe join key: a NULL bucket present in BOTH snapshots must
    // match itself (an unchanged null rate is zero drift, not two
    // eps-floored one-sided terms) — the same convention fixedBand
    // hard-codes for the numeric path via band -1.
    share(refCounts, "ref_n", "_rb")
      .join(share(curCounts, "cur_n", "_cb"),
        col("_rb") <=> col("_cb"), "full_outer")
      .select(coalesce(col("_rb"), col("_cb")).as(bucketCol),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"),
        round(rf, scale).as("ref_share"),
        round(cf, scale).as("cur_share"),
        round((cfF - rfF) * log(cfF / rfF), scale).as("psi"))
  }

  /** Fixed equal-width band label for numeric drift bucketing — the
    * [[graft.ops.Sampling.scoreCurriculum]] philosophy (fixed cuts,
    * never per-run quantiles: NTILE needs a total-order sort and its
    * cut points move whenever the corpus grows) applied to
    * [[distributionDrift]]'s bucket column: band i = ⌊(x − lo) /
    * ((hi − lo) / nBands)⌋ clamped into the edge bands, nulls land in
    * band −1 (their own bucket — a null-rate shift IS drift). A pure
    * codegen projection; the DuckDB oracle mirrors the arithmetic
    * literally (q138).
    */
  def fixedBand(c: Column, lo: Double, hi: Double, nBands: Int): Column = {
    require(nBands >= 1 && hi > lo, s"bad band spec: [$lo, $hi) x $nBands")
    val raw = floor((c.cast("double") - lit(lo)) / lit((hi - lo) / nBands))
    when(c.isNull, lit(-1L))
      .otherwise(greatest(lit(0L), least(lit(nBands - 1L), raw.cast("long"))))
  }

  /** Corpus diff between two snapshots — the EXTENSIONAL companion to
    * [[distributionDrift]]'s distributional view: per document id,
    * whether it was `added` (only in `cur`), `removed` (only in `ref`),
    * `changed` (both sides, content hash differs), or `unchanged`. The
    * crawl-refresh triage table: "how much of yesterday's corpus
    * survived, and what churned" — and its `status` column feeds
    * [[skewReport]]/groupBy for the one-line summary. Content identity
    * is md5(text) with null-safe compare (a doc whose text went null
    * reads as changed, two nulls as unchanged — the [[graft.ops.Dedup
    * .exact]] key convention).
    *
    * Shape at 100 TB: each side projects to fixed-width (id, md5) rows
    * BEFORE the exchange — document text never shuffles; then ONE
    * id-keyed full-outer hash join (id-partitioned both sides, the
    * equi-join AQE plans). Deterministic → DuckDB hash-checked (q136).
    */
  def corpusDiff(ref: DataFrame, cur: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    def keyed(df: DataFrame, h: String, seen: String): DataFrame =
      df.select(col(idCol), md5(col(textCol)).as(h), lit(1).as(seen))
    keyed(ref, "_rh", "_rseen")
      .join(keyed(cur, "_ch", "_cseen"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_rseen").isNull, "added")
          .when(col("_cseen").isNull, "removed")
          .when(col("_rh") <=> col("_ch"), "unchanged")
          .otherwise("changed").as("status"))
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
    * Shape at 100 TB: the rows are projected down to fixed-width columns
    * (md5 key, null flag, token count) BEFORE any exchange — no document
    * text ever shuffles; the duplicate count is a COUNT WINDOW over the
    * content key (ONE exchange, the [[Dedup.exact]] key) with null-text
    * rows given a per-row unique sentinel key so they spread across
    * reducers instead of piling onto the null partition; the per-source
    * rollup is one more map-side-combined aggregation.
    */
  def dataCard(docs: DataFrame, idCol: String, textCol: String,
               srcCol: String, langCol: String,
               charsCol: String): DataFrame = {
    val slim = docs.select(
      col(srcCol).as("source"), col(langCol).as("_lang"),
      col(charsCol).cast("double").as("_chars"),
      when(col(textCol).isNull, 1L).otherwise(0L).as("_isnull"),
      coalesce(
        size(expr(s"filter(split($textCol, ' '), x -> x <> '')")), lit(0))
        .cast("long").as("_toks"),
      // null text cannot collide: a unique non-hex sentinel per row keeps
      // the window exchange skew-free and its count at 1
      coalesce(md5(col(textCol)),
        concat(lit("|"), col(idCol).cast("string"))).as("_k"))
    slim
      .withColumn("_c", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_k"))))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_isnull")).as("n_null_text"),
        sum(when(col("_isnull") === 0 && col("_c") > 1, 1L).otherwise(0L))
          .as("n_duped"),
        sum(col("_toks")).as("ws_tokens"),
        round(avg(col("_chars")), 2).as("avg_chars"),
        countDistinct(col("_lang")).as("n_langs"))
      .orderBy(col("source"))
  }

  /** Threshold confusion audit — the acceptance gauge for the learned
    * filters (what [[Similarity.annRecall]] is to the ANN family): given
    * a scored corpus and a 0/1 truth column, the confusion counts and
    * quality ratios at each candidate admission threshold, in ONE
    * aggregation pass. The operating-point picker: a filter is deployed
    * as "admit score > t", and this table is how t gets chosen with
    * numbers instead of vibes.
    *
    * Per threshold: tp/fp/fn/tn (exact integers over rows where both
    * score and truth are non-null), precision = tp/(tp+fp), recall =
    * tp/(tp+fn), and f1 IN ITS INTEGER-RATIO FORM 2·tp/(2·tp+fp+fn) —
    * each a SINGLE correctly-rounded division of exact integers, rounded
    * at 6, so the gauge hash-checks cross-engine with no composed-float
    * chain. Zero denominators yield null, not a crash.
    *
    * Shape at 100 TB: thresholds are a bounded literal list exploded
    * onto the row stream (|t|× row multiplier, |t| small by contract),
    * then one map-side-combined aggregation on the threshold key — no
    * join, no window, no global sort.
    */
  def scoreAudit(df: DataFrame, scoreCol: String, labelCol: String,
                 thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold to audit")
    val tp = count(when(col("_s") > col("threshold") && col("_y") === 1, lit(1)))
    val fp = count(when(col("_s") > col("threshold") && col("_y") === 0, lit(1)))
    val fn = count(when(col("_s") <= col("threshold") && col("_y") === 1, lit(1)))
    val tn = count(when(col("_s") <= col("threshold") && col("_y") === 0, lit(1)))
    def ratio(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den, 6))
    df.select(col(scoreCol).as("_s"), col(labelCol).cast("int").as("_y"))
      .where(col("_s").isNotNull && col("_y").isNotNull)
      .select(col("_s"), col("_y"),
        explode(typedLit(thresholds)).as("threshold"))
      .groupBy(col("threshold"))
      .agg(tp.as("tp"), fp.as("fp"), fn.as("fn"), tn.as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        ratio(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio(col("tp"), col("tp") + col("fn")).as("recall"),
        ratio(lit(2) * col("tp"), lit(2) * col("tp") + col("fp") + col("fn"))
          .as("f1"))
      .orderBy(col("threshold"))
  }
}
