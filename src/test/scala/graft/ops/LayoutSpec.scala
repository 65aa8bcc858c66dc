package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the physical-layout helpers: bucketed joins really skip the
  * exchange, and salted joins are result-identical to plain joins while
  * spreading the hot key.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join with no exchange on either side") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i")).toDF("k", "payload")
    val dims = (0 until 50).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    Layout.writeBucketed(facts, "bk_facts", "k", 8)
    Layout.writeBucketed(dims, "bk_dims", "k", 8)
    val joined = spark.table("bk_facts").join(spark.table("bk_dims"), "k")
    // force SMJ (fixture sizes would broadcast, which hides bucketing)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val qe = spark.table("bk_facts").join(spark.table("bk_dims"), "k")
        .queryExecution
      qe.executedPlan.executeCollect()
      val plan = qe.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(joined.count() == 1000)
  }

  test("salted join equals the plain join and spreads the hot key") {
    // key 7 is hot: 900 of 1000 rows
    val left = ((1 to 900).map(_ => (7L, "hot")) ++ (1 to 100).map(i => (i.toLong % 5, "cold")))
      .toDF("k", "tag")
    val right = (0 until 10).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    val salted = Layout.saltedInnerJoin(left, right, "k", salts = 8)
    val plain = left.join(right, "k")
    assert(salted.count() == plain.count())
    val s = salted.groupBy("k", "tag", "v").count().orderBy("k", "tag", "v")
      .as[(Long, String, String, Long)].collect().toSeq
    val p = plain.groupBy("k", "tag", "v").count().orderBy("k", "tag", "v")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(s == p, "salting must not change join results")
    // the hot key's left rows actually spread across several salts
    val saltSpread = left.withColumn("_salt", floor(rand(42L) * 8).cast("int"))
      .filter($"k" === 7L).select("_salt").distinct().count()
    assert(saltSpread > 1, "hot key must land in more than one salt bucket")
  }
}
