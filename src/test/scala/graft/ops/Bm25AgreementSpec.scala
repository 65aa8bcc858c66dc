package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the [[TextAnalysis.bm25Join]] `maxDfFrac` EXACTNESS contract the
  * Zipfian bench measured (BASELINE.md: 1.00 top-10 overlap on
  * discriminative queries): the cap drops only postings of terms whose
  * df crosses the cut, and surviving weights are bit-identical — so
  *
  *  1. a query carrying NO above-cut term returns the exact uncapped
  *     result, rows and scores;
  *  2. a query carrying an above-cut term returns exactly what the
  *     uncapped join returns for the query WITH THAT TERM DELETED —
  *     the cap is term deletion, never score perturbation.
  *
  * Keeps `maxDfFrac` honest under future edits to the posting pipeline
  * (df two-level, exchange reuse, weight expression).
  */
class Bm25AgreementSpec extends SparkSpec {
  import spark.implicits._

  // 120 docs, 4 words each: "the" is corpus-wide (df 120 = 100% > the
  // 0.5 cut); b-tokens df 12 (10%), c-tokens df 40 (33%) — both BELOW
  // the cut. Equal doc lengths make heavy score ties, which the
  // deterministic (score desc, doc_id) tie-break must resolve
  // identically on both sides — ties are part of the pin, not a hazard.
  private def corpus = spark.range(120)
    .select(col("id").as("doc_id"),
      concat(lit("the a"), col("id"),
        lit(" b"), col("id") % 10,
        lit(" c"), col("id") % 3).as("text"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("q_id"), col("doc_id"), col("score"))
      .as[(Long, Long, Double)].collect().toSet

  test("no query term over the cut: capped == uncapped, rows AND scores") {
    val queries = Seq((1L, "b3 c1"), (2L, "a5 b7"), (3L, "c2"))
      .toDF("q_id", "q_text")
    val exact = rows(TextAnalysis.bm25Join(corpus, "doc_id", "text",
      queries, "q_id", "q_text"))
    val capped = rows(TextAnalysis.bm25Join(corpus, "doc_id", "text",
      queries, "q_id", "q_text", maxDfFrac = 0.5))
    assert(exact.nonEmpty, "fixture must rank something")
    assert(capped == exact,
      s"discriminative queries must agree exactly: ${exact.diff(capped)} / ${capped.diff(exact)}")
  }

  test("above-cut term: the cap IS term deletion, bit-for-bit") {
    val withStop = Seq((1L, "the b3"), (2L, "the c1 b7"))
      .toDF("q_id", "q_text")
    val deleted = Seq((1L, "b3"), (2L, "c1 b7"))
      .toDF("q_id", "q_text")
    val capped = rows(TextAnalysis.bm25Join(corpus, "doc_id", "text",
      withStop, "q_id", "q_text", maxDfFrac = 0.5))
    val exactDeleted = rows(TextAnalysis.bm25Join(corpus, "doc_id", "text",
      deleted, "q_id", "q_text"))
    assert(capped == exactDeleted,
      "capping must equal deleting the above-cut term from the query")
  }
}
