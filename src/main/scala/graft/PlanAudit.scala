package graft

/** Ad-hoc plan auditor (diagnostic main, not part of the library surface):
  * executes headline queries with auto-broadcast disabled — the join
  * shape a 100 TB input would plan, since fixture-sized inputs broadcast
  * everywhere — and reports the FINAL adaptive plan: under AQE, exchange/
  * stage reuse is a runtime decision invisible in the pre-execution plan.
  *
  * Reading the bnlj column: the brute-force top-k family (q25/q59/q70)
  * and the scalar-total attaches (q64/q68/q73's vocab size, q116/q117/
  * q119's vocab/totals/priors/model constants) intentionally plan a
  * BroadcastNestedLoopJoin whose BUILD SIDE IS ONE ROW — the query
  * vector / 1-row aggregate attached to every row (a scalar broadcast;
  * there is no join key by construction). That is the
  * documented scan shape (Similarity.bruteForceTopK), not a scale risk;
  * the invariant the audit guards is that no MULTI-ROW join is ever a
  * nested loop — every relation-to-relation join stays equi-keyed. One
  * carve-out: q102's ground-truth side (Similarity.bruteKnnJoin) cross-
  * joins the BOUNDED recall-audit query sample (its documented contract
  * — an eval suite, never a corpus-scaled set), so its bnlj build side
  * is that bounded broadcast, not a relation. The flat-PQ family
  * (q104/q105/q107/q108) shares the same carve-out by design: flat PQ
  * has no cells to prune, so the code-only corpus scan is scored
  * against the BROADCAST bounded query set (m array probes per pair) —
  * the scan is the point; the cell-pruned IVF-PQ twins (q106/q110) are
  * the equi-keyed forms and audit bnlj=0.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val interesting = Seq(
      "q01_scan_project", "q02_filter", "q05_join_broadcast", "q07_join_semi",
      "q10_asof", "q16_topk", "q25_similarity_topk", "q28_dedup_minhash_lsh",
      "q30_dedup_ngram_jaccard", "q31_neardup_embedding", "q32_ann_lsh",
      "q42_dedup_clusters_star", "q43_sql_surface", "q44_decontaminate",
      "q45_pii_redact", "q46_quality_signals",
      "q48_mixture_sample", "q49_dup_span_frac", "q50_bloom_decontaminate",
      "q51_repetition_signals", "q52_pack", "q52b_pack_bpe", "q53_dedup_keep",
      "q54_ivf_knn_join", "q55_exact_size_sample", "q56_lsh_knn_join",
      "q57_ivf_index_knn_join", "q58_token_budget_sample",
      "q58b_token_budget_bpe", "q59_quantized_topk",
      "q61_ivf_quantized_knn_join", "q62_incremental_dedup", "q63_vocab",
      "q64_collocations", "q65_contamination_matrix", "q66_upsample_epochs",
      "q67_funnel", "q68_skew_report", "q69_hash_embed", "q70_text_knn",
      "q71_retention", "q72_pivot", "q73_lm_score", "q74_clean_corpus",
      "q75_tfidf", "q76_bm25", "q77_containment", "q78_data_card",
      "q79_stop_prune", "q80_semdedup", "q81_clean_corpus_multimodal",
      "q82_ivf_cell_profile", "q83_embedding_card",
      "q84_semantic_contamination", "q85_bm25_join",
      "q86_retrieval_decontaminate", "q87_curriculum_sample",
      "q88_excise_spans", "q89_bm25_join_capped", "q90_collapse_repeats",
      "q91_excise_against_index", "q92_training_order",
      "q93_curation_pipeline",
      "q95_balanced_mixture", "q97_boilerplate_lines", "q98_chunk_docs",
      "q99_lines_against_index", "q100_pq_topk", "q101_pq_index_topk",
      "q102_ann_recall", "q103_ivfpq_topk", "q104_pq_knn_join",
      "q105_pq_index_knn_join", "q106_ivfpq_index_knn_join",
      "q107_pq_rerank_topk", "q108_pq_rerank_knn_join",
      "q109_ivfpq_residual_topk", "q110_ivfpq_residual_knn_join",
      "q111_ivf_rebuild_drift", "q112_ivfpq_rerank_knn_join",
      "q113_pack_token_ids", "q114_code_rebuild_drift",
      "q115_curate_token_ids", "q116_cross_ppl", "q117_nb_quality",
      "q118_token_card", "q119_dsir_resample", "q120_ppl_partition",
      "q121_score_audit", "q122_tokenizer_fertility",
      "q123_cell_balanced_sample", "q124_hard_negatives",
      "q125_knn_classify", "q126_cap_per_source", "q127_group_split",
      "q128_hard_negatives_ivf", "q129_knn_autolabel", "q130_label_noise",
      "q131_random_project", "q132_proj_knn_rerank", "q133_mixture_plan",
      "q134_mixture_sample", "q135_distribution_drift", "q136_corpus_diff",
      "q137_label_noise_ivf", "q138_numeric_drift", "q139_dedup_recall",
      "q140_dedup_screen", "q141_token_budget_prefix",
      "q142_containment_recall", "q143_url_canonicalize",
      "q144_normalize_text", "q145_html_to_text", "q146_gopher_filter",
      "q147_leak_free_split", "q148_web_intake", "q149_gopher_report",
      "q150_domain_blocklist", "q151_segment_paragraphs",
      "q152_remove_paragraphs", "q153_warc_responses",
      "q154_paras_against_index", "q155_intake_curation",
      "q156_warc_charset_profile", "q157_crawl_token_ids",
      "q158_crawl_digest_dedup", "q159_crawl_latest_fetch",
      "q160_key_index_card", "q161_redacted_curation", "q162_robots_gate",
      "q163_robots_profile", "q164_language_curation", "q165_crawl_recipe",
      "q166_verified_digest_dedup")
    // optional args = audit only these queries (iterating on one
    // operator); a trailing `--json <path>` additionally writes the
    // table as the per-round PLANAUDIT artifact, so plan-shape
    // regressions between rounds are diffable instead of invisible
    val (jsonPath, qargs) = args.indexOf("--json") match {
      case -1 => (None, args.toSeq)
      case i  => (Some(args(i + 1)), args.take(i).toSeq ++ args.drop(i + 2))
    }
    val selected =
      if (qargs.isEmpty) interesting else interesting.filter(qargs.toSet)
    def audit(q: String, df: org.apache.spark.sql.DataFrame) = {
      val qe = df.queryExecution
      qe.executedPlan.executeCollect()
      val plan = qe.executedPlan.toString
      def n(s: String) = s.r.findAllIn(plan).length
      val r = (q, n("ShuffleQueryStage"), n("ReusedQueryStage|ReusedExchange"),
        n("BroadcastHashJoin"), n("SortMergeJoin"), n("BroadcastNestedLoop"),
        plan.contains("PushedFilters: [I"))
      println(f"$q%-26s shuffleStages=${r._2}%2d reused=${r._3}%2d " +
        f"bcast=${r._4}%2d smj=${r._5}%2d bnlj=${r._6}%2d pushed=${r._7}")
      r
    }
    val queryRows = for (q <- selected) yield
      audit(q, SparkEntry.queries(q)(spark, sfDir))
    // the REBAND path (q139's tuning action): not a declared query, so
    // audit its staging derivation directly — one sets scan through the
    // signature fold into band keys; the asserted shape is NO joins and
    // the single band-partitioned exchange of the staged write
    val rows = queryRows ++ (if (qargs.nonEmpty) Seq.empty else {
      val tmp = java.nio.file.Files
        .createTempDirectory("planaudit_reband_").toString
      graft.ops.Dedup.buildTextIndex(
        Tables.load(spark, sfDir, "documents"), "doc_id", "text", tmp)
      val sets = spark.read.parquet(s"$tmp/sets")
      Seq(audit("reband_bands_derivation", graft.ops.Dedup.bandKeys(
        graft.ops.Dedup.minHashSignatures(sets, 16), 16, 8)))
    })
    jsonPath.foreach { p =>
      val body = rows.map { case (q, sh, re, bc, smj, bnlj, pushed) =>
        s"""  "$q": {"shuffle_stages": $sh, "reused": $re, "bcast": $bc,""" +
          s""" "smj": $smj, "bnlj": $bnlj, "pushed": $pushed}"""
      }.mkString(",\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        s"{\n$body\n}\n")
      println(s"[planaudit] wrote $p")
    }
    spark.stop()
  }
}
