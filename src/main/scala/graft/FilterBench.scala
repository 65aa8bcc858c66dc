package graft

import org.apache.spark.sql.functions._

/** Spot-bench for the LEARNED-filter family at sf1-equivalent volume —
  * the [[PipelineBench]] recipe: the sf0.1 documents table replicated
  * `SPARK_GRAFT_REPL`× (default 15, ~750k docs) with salted doc-id
  * offsets, then each filter's full train+score path timed end-to-end
  * (noop sink; the fit is INSIDE the measured job — model counting is
  * part of the filter's cost story, and it is the part that grows with
  * the reference slice):
  *
  *  - `xent_s` — [[graft.ops.TextAnalysis.bigramLmScoreAgainst]]: fit
  *    on the `lang='en'` slice, score every replica;
  *  - `nb_s` — [[graft.ops.TextAnalysis.naiveBayesScore]]: provenance
  *    weak labels, fit + score in one plan;
  *  - `dsir_s` — [[graft.ops.Sampling.dsirLogWeights]] over the same
  *    target slice; `dsir_topk_s` adds the Gumbel top-(n_docs/100)
  *    selection;
  *  - `audit_s` — [[graft.ops.Analytics.scoreAudit]] over the NB
  *    scores at 3 thresholds (re-runs the NB plan: the gauge's real
  *    deployment cost on an unmaterialized score stream);
  *  - `fertility_s` / `card_s` — the two tokenizer audits under the
  *    built-in BPE.
  *
  * Also recorded: per-replica-decade growth for the cross-ppl scorer
  * (repl/5 vs repl volume) — the linearity check that the model-side
  * aggregates stay bounded while the scored stream scales.
  * One JSON line (the [[Bench]] discipline); recorded in BASELINE.md.
  */
object FilterBench {
  def main(args: Array[String]): Unit = {
    import BenchHarness.{fmt, runNoop, sfDir, time}
    val repl = BenchHarness.env("SPARK_GRAFT_REPL", "15").toInt
    val cpus = BenchHarness.cpus()
    val spark = BenchHarness.session(cpus)
    val ta = graft.ops.TextAnalysis

    val docs = BenchHarness.replicatedDocs(spark, sfDir, repl, cpus,
      salt = true, extraCols = Seq("source", "lang"))
    val nDocs = docs.count()
    val lv0 = BenchHarness.loadavg

    def med(f: => org.apache.spark.sql.DataFrame): Double =
      (1 to 2).map(_ => runNoop(f)).min

    val tXent = med(ta.bigramLmScoreAgainst(
      docs.where(col("lang") === "en"), docs, "doc_id", "text"))
    val labeled = docs.withColumn("label",
      col("source").isin("src0", "src1", "src2").cast("int"))
    val tNb = med(ta.naiveBayesScore(labeled, "doc_id", "text", "label"))
    val tgt = col("source").isin("src0", "src1", "src2")
    val tDsir = med(graft.ops.Sampling.dsirLogWeights(
      docs, "doc_id", "text", tgt))
    val tDsirTop = med(graft.ops.Sampling.dsirResample(
      docs, "doc_id", "text", tgt, n = (nDocs / 100).toInt.max(1)))
    val tAudit = med(graft.ops.Analytics.scoreAudit(
      ta.naiveBayesScore(labeled, "doc_id", "text", "label")
        .join(labeled.select(col("doc_id"), col("label")), Seq("doc_id")),
      "log_odds", "label", Seq(-4.0, -2.7, -1.5)))
    val tFert = med(graft.ops.Packing.tokenizerFertility(
      docs, "text", "lang", graft.functions.TokenCounters.tinyBpe))
    val tCard = med(graft.ops.Packing.tokenizedCard(
      docs, "doc_id", "text", "source", 512,
      graft.functions.TokenCounters.tinyBpe))

    // linearity: the same cross-ppl job at 1/3 the replicas — the model
    // side is slice-bounded, so time should scale ~linearly in the
    // SCORED stream, not super-linearly in the corpus
    val docsSmall = BenchHarness.replicatedDocs(spark, sfDir,
      (repl / 3).max(1), cpus, salt = true, extraCols = Seq("source", "lang"))
    val tXentSmall = med(ta.bigramLmScoreAgainst(
      docsSmall.where(col("lang") === "en"), docsSmall, "doc_id", "text"))

    // selection QUALITY, not just time: what fraction of the Gumbel
    // top-n is actually target-provenance, vs the corpus base rate —
    // the lift a DSIR deployment buys on THIS corpus (the synthetic
    // fixture's sources share a generator, so the honest expectation is
    // mild lift, reported as measured)
    val nSel = 1000
    val sel = graft.ops.Sampling.dsirResample(
      docs, "doc_id", "text", tgt, n = nSel)
    val selTgt = sel.join(docs.select(col("doc_id"), tgt.as("_t")), Seq("doc_id"))
      .where(col("_t")).count()
    val baseRate = docs.where(tgt).count().toDouble / nDocs

    println(
      s"""{"bench":"filter_sf1","sf":"$sfDir","repl":$repl,""" +
      s""""n_docs":$nDocs,"xent_s":${fmt(tXent)},"nb_s":${fmt(tNb)},""" +
      s""""dsir_s":${fmt(tDsir)},"dsir_topk_s":${fmt(tDsirTop)},""" +
      s""""audit_s":${fmt(tAudit)},"fertility_s":${fmt(tFert)},""" +
      s""""card_s":${fmt(tCard)},""" +
      s""""xent_third_volume_s":${fmt(tXentSmall)},""" +
      s""""dsir_top${nSel}_target_frac":${fmt(selTgt.toDouble / nSel, 4)},""" +
      s""""target_base_rate":${fmt(baseRate, 4)},""" +
      s""""loadavg_before":"$lv0"}""")
    spark.stop()
  }
}
