package graft.queries

import graft.Tables
import graft.ops.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The declared relational query set (SURVEY.md §2.9, Q01–Q26) expressed
  * DataFrame-first. Each query has a DuckDB oracle twin in
  * [[graft.SparkEntry.oracleSql]]; output column names/types are aligned
  * with the oracle (counts/lengths as bigint, ranks as bigint) because the
  * driver hash-compares values under sorted column names.
  *
  * Broadcast hints are placed only where the dimension is bounded by the
  * schema itself (nation=25, region=5, single-row scalar subqueries) —
  * sizes that stay broadcastable at any scale factor. Everything else is
  * left to Catalyst/AQE, which sees actual sizes.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // Q01 scan + projection: column pruning should reach the parquet scan.
  val q01_scan_project: Q = (s, d) =>
    t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // Q02 filter: both predicates push down to the parquet reader.
  val q02_filter: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_discount") > 0.05 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // Q03 petl-transform parity (convert → filter → remove → rename;
  // reference order fixed at /root/reference/dasladen/task.py:142-166).
  val q03_petl_transforms: Q = (s, d) =>
    t(s, d, "customer")
      .withColumn("c_name", upper(col("c_name")))          // convert
      .filter(col("c_acctbal") > 1000)                     // filter
      .drop("c_mktsegment")                                // remove
      .withColumnRenamed("c_name", "name")                 // rename
      .select(col("c_custkey"), col("name"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("c_acctbal"))
      .orderBy(col("c_custkey"))

  // Q04 inner equi join (orders ⋈ customer on custkey).
  val q04_join_inner: Q = (s, d) => {
    val o = t(s, d, "orders")
    val c = t(s, d, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(o("o_orderkey"), c("c_name"))
      .orderBy(col("o_orderkey"))
  }

  // Q05 3-way dim join; nation (25) and region (5) are schema-bounded →
  // explicit broadcast keeps the whole join shuffle-free on the fact side.
  val q05_join_broadcast: Q = (s, d) => {
    val c = t(s, d, "customer")
    val n = t(s, d, "nation")
    val r = t(s, d, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(n("n_name"), r("r_name"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("n_name"), col("r_name"))
  }

  // Q06 left outer join.
  val q06_join_left: Q = (s, d) => {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders")
    c.join(o, o("o_custkey") === c("c_custkey"), "left")
      .select(c("c_custkey"), coalesce(o("o_orderkey"), lit(-1L)).as("ok"))
      .orderBy(col("c_custkey"), col("ok"))
  }

  // Q07 semi join (IN subquery form in the oracle).
  val q07_join_semi: Q = (s, d) => {
    val p = t(s, d, "part")
    val l = t(s, d, "lineitem").filter(col("l_quantity") > 45)
    p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  // Q08 anti join (NOT EXISTS form in the oracle).
  val q08_join_anti: Q = (s, d) => {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders")
    c.join(o, o("o_custkey") === c("c_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  // Q09 equi + range join: hash join on suppkey carries the BETWEEN as a
  // residual predicate — never a nested-loop.
  val q09_join_range: Q = (s, d) => {
    val sup = t(s, d, "supplier")
    val l = t(s, d, "lineitem")
    sup.join(l,
        l("l_suppkey") === sup("s_suppkey") &&
          l("l_extendedprice").between(sup("s_acctbal"), sup("s_acctbal") + 20000))
      .groupBy(sup("s_suppkey"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("s_suppkey"))
  }

  // Q10 as-of join: latest 'signup' event per user at or before each
  // 'click' event. Single-shuffle union+window form (see graft.ops.AsOfJoin)
  // instead of the oracle's correlated subquery.
  val q10_asof: Q = (s, d) => {
    val ev = t(s, d, "events")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin(signups, clicks, "user_id", "ts", "ts", "ts", "last_signup")
      .select(col("event_id"), col("last_signup"))
      .orderBy(col("event_id"))
  }

  // Q11 TPC-H Q1 shape: hash agg with partial+final, decimal-ish math.
  val q11_agg_hash: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= expr("TIMESTAMP '1998-09-02 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sq"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("srev"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // Q12 distinct aggregate.
  val q12_agg_distinct: Q = (s, d) =>
    t(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("cd"))
      .orderBy(col("o_orderstatus"))

  // Q12b approx distinct (HLL++) — no oracle (bound-checked, not hashed).
  // rsd 0.015 (vs the 0.05 default): the verify artifact asserts a 5%
  // error bound, which the default sketch only meets at ~1 sigma — a
  // coin flip per run. rsd 0.02 left only ~2.5 sigma (≈1% per-run flake);
  // 0.015 gives ~3.3 sigma at a quarter the register count of rsd 0.01,
  // which round 6 measured at 5× the EXACT q12's cost — an approx-distinct
  // slower than exact is backwards. Headroom vs sketch width, re-balanced.
  val q12b_approx_distinct: Q = (s, d) =>
    t(s, d, "orders")
      .agg(approx_count_distinct(col("o_custkey"), 0.015).as("acd"))

  // Q13 rollup.
  val q13_rollup: Q = (s, d) =>
    t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("f"),
        coalesce(col("l_linestatus"), lit("ALL")).as("s"),
        col("cnt"))
      .orderBy(col("f"), col("s"))

  // Q14 ranking window / per-group top-k (rank cast to bigint for oracle
  // type parity: DuckDB ROW_NUMBER is BIGINT, Spark's is INT).
  val q14_window_rank: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("bigint").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  // Q15 analytic window with a ROWS frame.
  val q15_window_frame: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    t(s, d, "orders")
      .select(col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("runsum"))
      .orderBy(col("o_orderkey"))
  }

  // Q16 global top-k: plans as TakeOrderedAndProject (no full sort shuffle).
  // Final re-sort on the 20-row result pins output order for the oracle.
  val q16_topk: Q = (s, d) =>
    t(s, d, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
      .select(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // Q17 set ops (INTERSECT = distinct set semantics, as in SQL).
  val q17_intersect: Q = (s, d) =>
    t(s, d, "customer").select(col("c_nationkey").as("k"))
      .intersect(t(s, d, "supplier").select(col("s_nationkey").as("k")))
      .orderBy(col("k"))

  val q17b_except: Q = (s, d) =>
    t(s, d, "customer").select(col("c_nationkey").as("k"))
      .except(t(s, d, "supplier").select(col("s_nationkey").as("k")))
      .orderBy(col("k"))

  // Q18 scalar subquery: 1-row aggregate broadcast-joined — the
  // DataFrame-native decorrelation of `> (SELECT AVG(...))`.
  val q18_scalar_subquery: Q = (s, d) => {
    val o = t(s, d, "orders")
    val avgTp = o.agg(avg(col("o_totalprice")).as("_avg"))
    o.crossJoin(broadcast(avgTp))
      .filter(col("o_totalprice") > col("_avg"))
      .select(col("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  // Q19 string functions (length as bigint for oracle type parity).
  val q19_string_fns: Q = (s, d) =>
    t(s, d, "part").select(
      col("p_partkey"),
      upper(substring(col("p_name"), 1, 5)).as("u"),
      length(col("p_name")).cast("bigint").as("l"),
      regexp_replace(col("p_brand"), "#", "-").as("b"),
      regexp_extract(col("p_type"), "[a-z]+", 0).as("tp"))
      .orderBy(col("p_partkey"))

  // Q20 date functions — batch twin of a streaming 1-hour tumbling window
  // (window($"ts","1 hour").start == date_trunc("hour", ts)).
  val q20_date_fns: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sv"))
      .orderBy(col("h"), col("event_type"))

  // Q21 math functions (ceil already yields bigint in Spark; oracle casts).
  val q21_math_fns: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_quantity")), 4).as("sq"),
        ceil(col("l_extendedprice") / 1000).as("b"),
        round(abs(col("l_discount") - 0.05), 4).as("dd"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // Q22 array functions (size as bigint: DuckDB len() is BIGINT).
  val q22_array_fns: Q = (s, d) =>
    t(s, d, "embeddings")
      .select(col("vec_id"), size(col("embedding")).cast("bigint").as("n"))
      .orderBy(col("vec_id"))

  // Q23 JSON extraction; oracle uses the portable regex form, which must
  // agree with get_json_object (props = {"k": <int>}).
  val q23_json_extract: Q = (s, d) =>
    t(s, d, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy(col("event_id"))

  // Q24 exact dedup by distinct.
  val q24_dedup_distinct: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("lang"), col("source"))
      .distinct()
      .orderBy(col("lang"), col("source"))

  // Q25 similarity top-k — flagship higher-order-function query; see
  // graft.ops.Similarity for the codegen'd cosine.
  val q25_similarity_topk: Q = (s, d) =>
    graft.ops.Similarity
      .bruteForceTopK(t(s, d, "embeddings"), "vec_id", "embedding", 0L, 10)
      .orderBy(col("vec_id"))

  // Q26 token frequency top-25.
  val q26_text_tokens: Q = (s, d) =>
    t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(25)

  // Q60 exact grouped percentiles (median/quantile reporting — the
  // distribution-summary aggregate the suite lacked). Spark's exact
  // `percentile` buffers each group's values, so like topPairs this is
  // the small-group/oracle EXACTNESS ANCHOR; at 100 TB-scale group sizes
  // the same query swaps in `approx_percentile` (t-digest, mergeable
  // map-side sketches) — the q12/q12b relationship, percentile edition.
  // Both engines define the exact quantile identically (linear
  // interpolation at rank p·(n−1)), so the result hash-checks.
  val q60_percentiles: Q = (s, d) =>
    t(s, d, "documents")
      .groupBy(col("source"))
      .agg(
        round(expr("percentile(n_chars, 0.25)"), 4).as("p25"),
        round(expr("percentile(n_chars, 0.5)"), 4).as("p50"),
        round(expr("percentile(n_chars, 0.9)"), 4).as("p90"))
      .orderBy(col("source"))

  // q60b: the 100 TB path q60's scaladoc promises — approx_percentile's
  // fixed-size per-group sketches mergeable map-side, instead of exact
  // percentile's full per-group value collection. No SQL oracle (the
  // sketch is engine-specific, the q12/q12b relationship); Verify
  // measures it against q60's exact values and records the bound in
  // q60b_bound.json.
  val q60b_percentiles_approx: Q = (s, d) =>
    t(s, d, "documents")
      .groupBy(col("source"))
      .agg(expr("approx_percentile(n_chars, array(0.25D, 0.5D, 0.9D), 10000)")
        .as("ps"))
      .select(col("source"),
        col("ps")(0).cast("double").as("p25"),
        col("ps")(1).cast("double").as("p50"),
        col("ps")(2).cast("double").as("p90"))
      .orderBy(col("source"))

  // q72 PIVOT: per-user event-type counts widened to columns — Spark's
  // `.pivot(col, values)` with the value list pinned (an unpinned pivot
  // runs a distinct-scan job first and its column order is data-
  // dependent); absent combinations are 0 like the oracle's COUNT FILTER.
  val q72_pivot: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy(col("user_id"))

  val all: Map[String, Q] = Map(
    "q01_scan_project" -> q01_scan_project,
    "q02_filter" -> q02_filter,
    "q03_petl_transforms" -> q03_petl_transforms,
    "q04_join_inner" -> q04_join_inner,
    "q05_join_broadcast" -> q05_join_broadcast,
    "q06_join_left" -> q06_join_left,
    "q07_join_semi" -> q07_join_semi,
    "q08_join_anti" -> q08_join_anti,
    "q09_join_range" -> q09_join_range,
    "q10_asof" -> q10_asof,
    "q11_agg_hash" -> q11_agg_hash,
    "q12_agg_distinct" -> q12_agg_distinct,
    "q12b_approx_distinct" -> q12b_approx_distinct,
    "q13_rollup" -> q13_rollup,
    "q14_window_rank" -> q14_window_rank,
    "q15_window_frame" -> q15_window_frame,
    "q16_topk" -> q16_topk,
    "q17_intersect" -> q17_intersect,
    "q17b_except" -> q17b_except,
    "q18_scalar_subquery" -> q18_scalar_subquery,
    "q19_string_fns" -> q19_string_fns,
    "q20_date_fns" -> q20_date_fns,
    "q21_math_fns" -> q21_math_fns,
    "q22_array_fns" -> q22_array_fns,
    "q23_json_extract" -> q23_json_extract,
    "q24_dedup_distinct" -> q24_dedup_distinct,
    "q25_similarity_topk" -> q25_similarity_topk,
    "q26_text_tokens" -> q26_text_tokens,
    "q60_percentiles" -> q60_percentiles,
    "q60b_percentiles_approx" -> q60b_percentiles_approx,
    "q72_pivot" -> q72_pivot)
}
