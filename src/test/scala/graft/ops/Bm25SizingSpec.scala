package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The [[TextAnalysis.bm25Join]] sizing guardrail: an uncapped run
  * whose query bag contains a stopword-grade term (df over half the
  * corpus AND over the absolute floor) warns; the measured fixture
  * inversion — corpus-dominating fraction but trivial absolute df —
  * stays silent, as does any capped run.
  */
class Bm25SizingSpec extends SparkSpec {

  // stopword-shaped corpus: 60% of 220k docs share the token "the",
  // comfortably past both the fraction and absolute-df thresholds
  private def zipfCorpus = spark.range(220000)
    .select(col("id").as("doc_id"),
      concat(lit("w"), col("id").cast("string"),
        when(col("id") % 10 < 6, lit(" the")).otherwise(lit(" xx")))
        .as("text"))

  private def oneQuery(text: String) = {
    import spark.implicits._
    Seq((0L, text)).toDF("q_id", "text")
  }

  private def awaitWarning(): Option[String] = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (System.nanoTime() < deadline) {
      val w = TextAnalysis.lastSizingWarning(spark).get()
      if (w.nonEmpty) return w
      Thread.sleep(50)
    }
    None
  }

  // the listener bus is async: for MUST-NOT-fire cases, settle briefly
  private def settle(): Unit = Thread.sleep(1500)

  test("uncapped join over a stopword-grade query term warns with the cap hint") {
    TextAnalysis.lastSizingWarning(spark).set(None)
    TextAnalysis.bm25Join(zipfCorpus, "doc_id", "text",
      oneQuery("the zebra"), "q_id", "text").count()
    val w = awaitWarning()
    assert(w.nonEmpty, "guardrail must fire on the Zipfian shape")
    assert(w.get.contains("maxDfFrac"), s"warning should suggest the cap: $w")
  }

  test("capped run on the same corpus is silent (the cap IS the remedy)") {
    TextAnalysis.lastSizingWarning(spark).set(None)
    TextAnalysis.bm25Join(zipfCorpus, "doc_id", "text",
      oneQuery("the zebra"), "q_id", "text", maxDfFrac = 0.5).count()
    settle()
    assert(TextAnalysis.lastSizingWarning(spark).get().isEmpty)
  }

  test("small absolute fan-out stays silent even at a dominating fraction") {
    // the measured fixture inversion: a term in >50% of docs whose df is
    // a few hundred rows — the cap's filter would cost more than the
    // fan-out it trims, so the guardrail must NOT cry wolf
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    TextAnalysis.lastSizingWarning(spark).set(None)
    TextAnalysis.bm25Join(docs, "doc_id", "text",
      docs.where(col("doc_id") % 100 === 0), "doc_id", "text").count()
    settle()
    assert(TextAnalysis.lastSizingWarning(spark).get().isEmpty,
      "fixture-scale df must not trigger the warning")
  }

  test("retrievalDecontaminate inherits the guardrail") {
    TextAnalysis.lastSizingWarning(spark).set(None)
    // consume `keep`: a bare count() lets the optimizer eliminate the
    // whole left join (distinct right side, no columns referenced) and
    // with it the bm25 subtree the guardrail rides on
    TextAnalysis.retrievalDecontaminate(zipfCorpus, "doc_id", "text",
      oneQuery("the zebra"), "q_id", "text")
      .agg(sum(col("keep"))).collect()
    assert(awaitWarning().nonEmpty)
  }
}
