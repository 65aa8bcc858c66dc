package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The END-TO-END curation pipeline — the chained job every training-data
  * recipe actually runs, composed from the individually-oracle-checked
  * operators (the `tasks`-array semantics of the reference's runner —
  * taskrun.py:64-76 — applied to the LLM-pipeline families):
  *
  *   1. CLEAN     — [[Dedup.exact]] representative + [[Dedup.dupSpanFrac]]
  *                  span-pressure + [[TextAnalysis.qualityScore]] floor,
  *                  conjoined (the q74 screens);
  *   2. DEDUP     — [[Dedup.exactDedupAgainstIndex]] against the standing
  *                  corpus's persisted key index (the q62 admission gate);
  *   3. EXCISE    — [[Dedup.exciseDupSpans]]: cross-doc duplicated word
  *                  spans removed, lowest-id keeper (q88); rows excised to
  *                  emptiness drop;
  *   4. DECONTAM  — [[Dedup.decontaminateBloom]] 3-shingle overlap vs the
  *                  benchmark (q50); benchmark members themselves drop;
  *   5. SAMPLE    — [[Sampling.tokenBudgetFracs]] + [[Sampling
  *                  .stratifiedSample]]: per-source token budgets (q58);
  *   6. PACK      — [[Packing.pack]]: concat-and-chunk into `seqLen`-token
  *                  training sequences per source shard (q52);
  *   7. ORDER     — [[Sampling.trainingOrder]]: deterministic shuffled
  *                  (shard, pos) read order (q92).
  *
  * Every stage is deterministic, so the WHOLE chain hash-checks against a
  * DuckDB oracle that composes the stages' own oracle fragments (q93).
  *
  * Scale shape: the stages keep their individual contracts (banded/
  * bucketed equi-joins, Bloom prefilters, bounded driver actions — the
  * only collects are the per-source token totals and the benchmark Bloom,
  * both bounded by strata/benchmark size, not corpus size). Three stage
  * boundaries are MATERIALIZED (`localCheckpoint`): the stage-0 input
  * projection (`docs`) because the stage-1 screens consume it from three
  * subtrees — each of which would otherwise re-execute the whole
  * upstream chain (PII redaction, language profiling, an HTML-intake or
  * WARC composition); `fresh` (post-dedup) because excision consumes it
  * twice (gram pass + source join-back); and the token-counted survivors
  * because the budget fracs are data-dependent — computing them requires
  * one pass, and without a checkpoint the sampler would re-run the
  * entire upstream chain a second time. At a real 100 TB run each boundary is a parquet write (stage
  * outputs are restart points, exactly the reference runner's per-task
  * CSV/DB handoff); `localCheckpoint` is the single-job, in-memory stand-
  * in with the same run-once semantics. Narrow schemas are cut BEFORE
  * each checkpoint ((doc_id, source, text) / (doc_id, source, n_tokens)),
  * so the materialized footprint is the text actually still alive, never
  * carried-along wide rows.
  */
object Curation {

  /** A stage/composition boundary under the `materialize` strategy
    * vocabulary — public so query compositions that need an execution
    * boundary OUTSIDE the pipeline (q165's WARC-read/intake join-backs)
    * honor the same knob (`-Dgraft.curate.materialize=none` keeps the
    * whole chain one explainable tree for plan-level consumers, and a
    * 100 TB profile can choose parquet-write boundaries instead).
    * Callers choosing `disk`/`memdisk` own the unpersist.
    */
  def boundary(df: DataFrame,
               strategy: String =
                 sys.props.getOrElse("graft.curate.materialize", "local"))
      : DataFrame =
    strategy match {
      case "local"   => df.localCheckpoint(true)
      case "disk"    =>
        df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      case "memdisk" =>
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case "none"    => df
      case other => throw new IllegalArgumentException(
        s"Curation.Config.materialize: unknown strategy '$other' " +
          "(local | disk | memdisk | none)")
    }

  /** Stage-boundary materialization under `cfg.materialize`; lazy
    * persists are recorded in `persisted` so a write-terminal caller
    * ([[curateTo]]) can unpersist them once its action completes.
    */
  private def materialize(df: DataFrame, cfg: Config,
                          persisted: scala.collection.mutable.Buffer[DataFrame])
      : DataFrame = {
    val out = boundary(df, cfg.materialize)
    cfg.materialize match {
      case "disk" | "memdisk" => persisted += out
      case _ => ()
    }
    out
  }

  /** Stage parameters; every default is the matching qNN query's value.
    *
    * @param budgets       per-source token budgets (stage 5); sources
    *                      absent from the map drop — the
    *                      not-in-the-recipe rule
    * @param minQuality    quality floor (stage 1)
    * @param spanThreshold drop a doc when its shared-span fraction
    *                      ([[Dedup.dupSpanFrac]]) reaches this value.
    *                      0.5 is the q49/q74 screen; 1.0 means "drop only
    *                      pure boilerplate — docs consisting ENTIRELY of
    *                      cross-doc duplicated spans" (the right setting
    *                      when the excision stage below rewrites partial
    *                      duplication anyway, and the q93 value)
    * @param exciseW       duplicated-span width in words (stage 3)
    * @param shingleW      decontamination overlap width in words
    *                      (stage 4). q50's standalone screen uses 3;
    *                      the pipeline default is 8 — a verbatim 8-word
    *                      run shared with an eval item is contamination,
    *                      a 3-word collision on a templated corpus is
    *                      noise (and corpus-internal 8-spans are already
    *                      excised, so what stage 4 catches is precisely
    *                      benchmark-only overlap)
    * @param seqLen        packed training-sequence length in tokens
    *                      (stage 6)
    * @param nShards       training-order shard count (stage 7)
    * @param lineMinDocFreq when set, run [[Dedup.removeFrequentLines]]
    *                      (the q97 CCNet boilerplate rule) between the
    *                      dedup and excision stages — template lines in
    *                      ≥ this many docs are removed EVERYWHERE before
    *                      span excision looks for verbatim runs (the
    *                      real-pipeline order: chrome first, then
    *                      spans). None (default) skips the stage, so the
    *                      q93 contract is byte-identical with it unset
    * @param materialize   stage-boundary materialization strategy
    *                      (A/B'd in PipelineBench — BASELINE.md "q93
    *                      checkpoint A/B"): `local` (default) = eager
    *                      `localCheckpoint`, one job now, plan
    *                      truncated; `disk` / `memdisk` = lazy
    *                      `persist` — measured 5–15% faster end-to-end
    *                      but the persists outlive a lazy-returning
    *                      [[curate]] (the caller owns
    *                      `spark.catalog.clearCache()`); use
    *                      [[curateTo]] to realize the lazy win WITHOUT
    *                      the leak; `none` = recompute (control arm,
    *                      1.5–2× slower). The default is per-Config
    *                      (the `-Dgraft.curate.materialize=` system
    *                      property is read ONCE, at Config
    *                      construction, as a bench-time default —
    *                      concurrent pipelines in one JVM each carry
    *                      their own value)
    */
  case class Config(budgets: Map[String, Long],
                    minQuality: Double = 0.5,
                    spanThreshold: Double = 1.0,
                    exciseW: Int = 8,
                    shingleW: Int = 8,
                    seqLen: Int = 512,
                    nShards: Int = 8,
                    lineMinDocFreq: Option[Int] = None,
                    // optional LEARNED screens in stage 1, each a frozen
                    // model layout path: docs whose cross-entropy under
                    // the reference LM exceeds pplMaxBits (or that the LM
                    // cannot score — <2 tokens) drop; docs whose NB
                    // log-odds don't clear nbMinLogOdds drop
                    pplModel: Option[String] = None,
                    pplMaxBits: Double = 0.0,
                    nbModel: Option[String] = None,
                    nbMinLogOdds: Double = 0.0,
                    // optional per-source frequency cap between the
                    // decontamination and sampling stages: keep the
                    // capPerSource highest-quality (q34 formula over the
                    // excised text, doc_id tiebreak) docs per source —
                    // the "no domain dominates" throttle BEFORE budgets
                    // divide what is left
                    capPerSource: Option[Int] = None,
                    // PII-redaction rung ([[TextAnalysis.redactPiiCol]],
                    // the q45 chain): scrub emails / IPv4s / phone
                    // numbers to typed placeholders at the HEAD of the
                    // pipeline — between the caller's normalization and
                    // the screens — so every downstream stage (screens,
                    // dedup keys, excision grams, decontamination
                    // shingles, token counts, packed ids) sees only the
                    // redacted text, and docs differing only in PII
                    // collapse at the exact screen. A pure map-side
                    // projection folded into the stage-1 scan.
                    redactPii: Boolean = false,
                    materialize: String =
                      sys.props.getOrElse("graft.curate.materialize", "local"),
                    // stage-0 override: "" = follow `materialize`. The
                    // stage-0 boundary materializes the WIDEST frame in
                    // the pipeline (full pre-clean text); callers whose
                    // upstream is a cheap parquet scan (q93/q115 read
                    // the table directly) can set "none" here to trade
                    // three cheap scans for no write, while an
                    // expensive-upstream composition (HTML intake, WARC
                    // read, PII regex rung) keeps the run-once boundary
                    stage0Materialize: String =
                      sys.props.getOrElse("graft.curate.materialize.stage0",
                        ""))

  /** Run the full pipeline over `batch` (docs with a null `textCol` are
    * dropped up front — nothing to train on).
    *
    * @param keyIndexPath standing-corpus [[Dedup.buildExactKeyIndex]]
    *                     layout for stage 2; None skips the stage (first
    *                     ingest, no standing corpus yet)
    * @param benchmark    (id, text) benchmark/eval docs for stage 4; None
    *                     skips the stage. Batch rows sharing an id with a
    *                     benchmark row are dropped outright (they ARE the
    *                     eval set — eval data must never reach training);
    *                     the id anti-join broadcasts the benchmark side.
    * @return one row per surviving doc: (doc_id, source, n_tokens,
    *         start_off, seq_first, seq_last, shard, pos)
    */
  def curate(spark: SparkSession, batch: DataFrame, idCol: String,
             textCol: String, sourceCol: String,
             keyIndexPath: Option[String], benchmark: Option[DataFrame],
             cfg: Config): DataFrame =
    curateImpl(spark, batch, idCol, textCol, sourceCol, keyIndexPath,
      benchmark, cfg, scala.collection.mutable.ArrayBuffer.empty[DataFrame])

  /** [[curate]] with a WRITE terminal: runs the pipeline, writes the
    * result as parquet at `outPath` (mode overwrite), and — the point —
    * unpersists any lazy stage-boundary persists once its own action
    * completes. This is how the measured `memdisk` win (5–15% over the
    * default eager checkpoint, BASELINE.md "q93 checkpoint A/B") is
    * realized WITHOUT the lazy arms' leak: [[curate]] returns a lazy
    * plan so it can never know when its persists are consumed, but a
    * write terminal owns its action and can clean up behind itself.
    * At a real deployment the terminal parquet write is what the runner
    * does anyway (stage outputs are restart points).
    */
  def curateTo(spark: SparkSession, batch: DataFrame, idCol: String,
               textCol: String, sourceCol: String,
               keyIndexPath: Option[String], benchmark: Option[DataFrame],
               cfg: Config, outPath: String): Unit = {
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      curateImpl(spark, batch, idCol, textCol, sourceCol, keyIndexPath,
          benchmark, cfg, persisted)
        .write.mode("overwrite").parquet(outPath)
    } finally persisted.foreach(_.unpersist(blocking = false))
  }

  /** [[curate]] ending at MATERIALIZED token ids — the pipeline
    * terminal a pretraining run actually writes: stages 1–4 (clean /
    * dedup / excise / decontaminate) verbatim, then token-budget
    * sampling COUNTED UNDER `encoder` (budgets and packing must spend
    * the same token currency the ids are emitted in — a whitespace
    * budget over BPE ids would mis-size every shard), then
    * [[Packing.packTokens]]: one row per `cfg.seqLen`-token training
    * sequence, (source, seq_id, token_ids `array<int>`, n_tokens).
    * [[Sampling.trainingOrder]] applies per sequence via its (shard =
    * source, pos = seq_id) structure downstream if needed — sequences
    * are already deterministic and densely numbered per source.
    * Lazy-returning like [[curate]] (same materialization note).
    */
  def curateTokens(spark: SparkSession, batch: DataFrame, idCol: String,
                   textCol: String, sourceCol: String,
                   keyIndexPath: Option[String], benchmark: Option[DataFrame],
                   cfg: Config,
                   encoder: graft.functions.TokenEncoder): DataFrame =
    curateTokensImpl(spark, batch, idCol, textCol, sourceCol, keyIndexPath,
      benchmark, cfg, encoder,
      scala.collection.mutable.ArrayBuffer.empty[DataFrame])

  /** [[curateTokens]] with a WRITE terminal — the [[curateTo]]
    * discipline applied to the token-id pipeline: write the packed
    * sequences as parquet at `outPath`, then unpersist any lazy
    * stage-boundary persists once the action completes.
    */
  def curateTokensTo(spark: SparkSession, batch: DataFrame, idCol: String,
                     textCol: String, sourceCol: String,
                     keyIndexPath: Option[String],
                     benchmark: Option[DataFrame], cfg: Config,
                     encoder: graft.functions.TokenEncoder,
                     outPath: String): Unit = {
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      curateTokensImpl(spark, batch, idCol, textCol, sourceCol, keyIndexPath,
          benchmark, cfg, encoder, persisted)
        .write.mode("overwrite").parquet(outPath)
    } finally persisted.foreach(_.unpersist(blocking = false))
  }

  /** [[curate]] keyed on the document's PREDICTED LANGUAGE (the q33
    * [[TextAnalysis.languageId]] decision) instead of a provenance
    * column — per-LANGUAGE budgets drive the recipe (`cfg.budgets`
    * keyed by language code; languages absent from the map drop, the
    * not-in-the-recipe rule — 'und' included only if budgeted). The
    * language is one extra map-side tokenProfile projection on the
    * stage-1 scan; everything downstream is [[curate]] verbatim with
    * `source` = the language.
    */
  def curateByLanguage(spark: SparkSession, batch: DataFrame, idCol: String,
                       textCol: String, keyIndexPath: Option[String],
                       benchmark: Option[DataFrame],
                       cfg: Config): DataFrame =
    curate(spark, TextAnalysis.withLanguage(batch, textCol), idCol,
      textCol, "_lang", keyIndexPath, benchmark, cfg)

  /** [[curateTokens]] keyed on predicted language — the
    * [[curateByLanguage]] routing applied to the token-id terminal.
    */
  def curateTokensByLanguage(spark: SparkSession, batch: DataFrame,
                             idCol: String, textCol: String,
                             keyIndexPath: Option[String],
                             benchmark: Option[DataFrame], cfg: Config,
                             encoder: graft.functions.TokenEncoder)
      : DataFrame =
    curateTokens(spark, TextAnalysis.withLanguage(batch, textCol), idCol,
      textCol, "_lang", keyIndexPath, benchmark, cfg, encoder)

  private def curateTokensImpl(spark: SparkSession, batch: DataFrame,
                               idCol: String, textCol: String,
                               sourceCol: String,
                               keyIndexPath: Option[String],
                               benchmark: Option[DataFrame], cfg: Config,
                               encoder: graft.functions.TokenEncoder,
                               persisted: scala.collection.mutable.Buffer[DataFrame])
      : DataFrame = {
    val decon = curateDecon(spark, batch, idCol, textCol, sourceCol,
      keyIndexPath, benchmark, cfg, persisted)
    // one checkpoint serves the budget totals AND the pack job; text
    // rides along because packTokens re-reads it to emit ids
    val withTok = materialize(cfg = cfg, persisted = persisted, df =
      decon.select(col("doc_id"), col("source"), col("clean_text"),
        graft.functions.TokenCounters.count(encoder, col("clean_text"))
          .as("n_tokens")))
    val fracs = Sampling.tokenBudgetFracs(withTok, "source", "n_tokens",
      cfg.budgets)
    val sampled = Sampling.stratifiedSample(withTok, "doc_id", "source", fracs)
    Packing.packTokens(sampled, "doc_id", "clean_text", "source",
      seqLen = cfg.seqLen, encoder, nTokensCol = Some("n_tokens"))
  }

  private def curateImpl(spark: SparkSession, batch: DataFrame, idCol: String,
                         textCol: String, sourceCol: String,
                         keyIndexPath: Option[String],
                         benchmark: Option[DataFrame], cfg: Config,
                         persisted: scala.collection.mutable.Buffer[DataFrame])
      : DataFrame = {
    val decon = curateDecon(spark, batch, idCol, textCol, sourceCol,
      keyIndexPath, benchmark, cfg, persisted)

    // 5. SAMPLE to per-source token budgets. The fracs collect is one
    // bounded driver action (per-source totals); the checkpoint makes
    // the chain above run ONCE for both the totals and the main job.
    val withTok = materialize(cfg = cfg, persisted = persisted, df =
      decon.select(col("doc_id"), col("source"),
        graft.functions.VectorFunctions.tokenCountsStruct(col("clean_text"))
          .getField("ws_tokens").as("n_tokens")))
    val fracs = Sampling.tokenBudgetFracs(withTok, "source", "n_tokens",
      cfg.budgets)
    val sampled = Sampling.stratifiedSample(withTok, "doc_id", "source", fracs)

    // 6. PACK into seqLen-token sequences per source shard
    val packed = Packing.pack(sampled, "doc_id", "n_tokens", "source",
      seqLen = cfg.seqLen)

    // 7. deterministic TRAINING ORDER over the packed docs
    Sampling.trainingOrder(packed, "doc_id", nShards = cfg.nShards)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("start_off"),
        col("seq_first"), col("seq_last"), col("shard"), col("pos"))
  }

  /** Stages 1–4 (clean / dedup / excise / decontaminate), shared by the
    * offset terminal ([[curate]]) and the token-id terminal
    * ([[curateTokens]]); returns the decontaminated survivors with
    * (doc_id, source, clean_text) among the columns (plus the excision
    * counters — the terminals project what they need).
    */
  private def curateDecon(spark: SparkSession, batch: DataFrame, idCol: String,
                          textCol: String, sourceCol: String,
                          keyIndexPath: Option[String],
                          benchmark: Option[DataFrame], cfg: Config,
                          persisted: scala.collection.mutable.Buffer[DataFrame])
      : DataFrame = {
    // 0. optional PII rung — redact BEFORE anything reads the text, so
    // screens/keys/grams/shingles/counts all operate on what will
    // actually train (and PII-only differences dedup away)
    val textExpr =
      if (cfg.redactPii) TextAnalysis.redactPiiCol(col(textCol))
      else col(textCol)
    val docs0 = batch.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        textExpr.as("text"))
    // Stage-0 materialization: stage 1 consumes `docs` from THREE
    // subtrees (the exact-rep aggregate, the span-pressure window, the
    // main branch — plus any learned screens); without a boundary here
    // every consumer re-executes the whole upstream chain — the PII
    // regex rung, the language tokenProfile, or an entire HTML-intake /
    // WARC-read composition — once per subtree. Same run-once discipline
    // as the other stage boundaries (see the object doc).
    // `stage0Materialize` can override just this boundary (see Config).
    val docs = materialize(docs0,
      if (cfg.stage0Materialize.nonEmpty)
        cfg.copy(materialize = cfg.stage0Materialize)
      else cfg,
      persisted)

    // 1. CLEAN — the q74 screens as survivor filters. Absence semantics
    // mirror q74's COALESCEs: no quality row => drop (coalesce 0), no
    // span row => keep (a doc with no shareable spans has nothing
    // duplicated, coalesce 1) — hence semi vs anti below. The quality
    // floor is a PURE per-row projection ([[TextAnalysis.qualityCol]]),
    // so it rides the main branch as an inline filter instead of the
    // former build-a-keep-table-and-semi-join (one less pass over the
    // corpus and one less join; identical keep set — `idCol` identifies
    // a row, the contract every stage here already assumes).
    val reps = Dedup.exact(docs, "doc_id", "text").select(col("doc_id"))
    val spanDrop = Dedup.dupSpanFrac(docs, "doc_id", "text",
        dupThreshold = cfg.spanThreshold)
      .where(col("keep") === 0).select(col("doc_id"))
    // 1b. optional LEARNED screens — frozen-model semi-joins alongside
    // the heuristic floor: the scorers emit only scorable doc_ids, so a
    // semi-join also drops what a model cannot rate (the admission-gate
    // convention the streaming twins share)
    val learnedKeeps = Seq(
      cfg.pplModel.map(p =>
        TextAnalysis.bigramScoreWithModel(spark, docs, "doc_id", "text", p)
          .where(col("xent_bits") <= cfg.pplMaxBits).select(col("doc_id"))),
      cfg.nbModel.map(p =>
        TextAnalysis.nbScoreWithModel(spark, docs, "doc_id", "text", p)
          .where(col("log_odds") > cfg.nbMinLogOdds).select(col("doc_id"))))
      .flatten
    val clean = learnedKeeps.foldLeft(docs
        .where(TextAnalysis.qualityCol(col("text")) >= cfg.minQuality)
        .join(reps, Seq("doc_id"), "left_semi")
        .join(spanDrop, Seq("doc_id"), "left_anti"))(
      (d, keep) => d.join(keep, Seq("doc_id"), "left_semi"))

    // 2. DEDUP vs the standing corpus (Bloom-in-scan + exact verify;
    // the corpus keys are never shuffled)
    val fresh0 = keyIndexPath match {
      case Some(p) => Dedup.exactDedupAgainstIndex(spark, clean, "text", p)
      case None    => clean
    }
    // materialized: the excision stage reads it twice (gram pass +
    // source join-back) — see the object doc on stage boundaries
    val fresh = materialize(fresh0, cfg, persisted)

    // 2b. optional corpus-frequency LINE removal (q97's op) ahead of
    // span excision — boilerplate chrome goes first, verbatim spans
    // second; kept newlines re-normalize to the single-space convention
    // the word-level stages split on. Rows emptied (all-boilerplate
    // docs) drop here. Checkpointed like `fresh`: stage 3 reads it
    // twice (gram pass + source join-back).
    val screened = cfg.lineMinDocFreq match {
      case Some(n) =>
        Dedup.removeFrequentLines(fresh, "doc_id", "text", n)
          .where(col("clean_text") =!= "")
          .join(fresh.select(col("doc_id"), col("source")), Seq("doc_id"))
          .select(col("doc_id"), col("source"),
            regexp_replace(col("clean_text"), "\n", " ").as("text"))
          .transform(materialize(_, cfg, persisted))
      case None => fresh
    }

    // 3. EXCISE cross-doc duplicated spans within the admitted batch;
    // docs excised to emptiness carry nothing to train on
    val exc = Dedup.exciseDupSpans(screened, "doc_id", "text", w = cfg.exciseW)
      .where(col("clean_text") =!= "")
      .join(screened.select(col("doc_id"), col("source")), Seq("doc_id"))

    // 4. DECONTAMINATE the cleaned text vs the benchmark; benchmark
    // members drop outright (they ARE the eval set)
    val decon = benchmark match {
      case Some(benchRaw) =>
        val benchAll = benchRaw
          .select(col(idCol).as("doc_id"), col(textCol).as("clean_text"))
        val candidates = exc.join(
          broadcast(benchAll.select(col("doc_id"))), Seq("doc_id"), "left_anti")
        val contaminated = Dedup.decontaminateBloom(
          candidates, benchAll.where(col("clean_text").isNotNull),
          "doc_id", "clean_text", w = cfg.shingleW)
        candidates.join(contaminated.select(col("doc_id")),
          Seq("doc_id"), "left_anti")
      case None => exc
    }

    // 4b. optional per-source CAP — the domain throttle: keep the
    // capPerSource highest-quality survivors per source (q34 quality
    // over the EXCISED text — what would actually train; doc_id
    // tiebreak) via the bounded capPerKey rank, so one crawler-friendly
    // source cannot dominate before the budgets divide what is left
    cfg.capPerSource match {
      case Some(n) =>
        Sampling.capPerKey(
            decon.withColumn("_capq",
              graft.ops.TextAnalysis.qualityCol(col("clean_text"))),
            "doc_id", "source", "_capq", n)
          .drop("_capq")
      case None => decon
    }
  }
}
