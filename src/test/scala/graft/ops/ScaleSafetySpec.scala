package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-safety pins for the near-dup / similarity family (VERDICT r01
  * items 1 and 4): plan shape (no BroadcastNestedLoopJoin in q31), the
  * skew caps on the LSH band join and the shingle inverted index, the
  * banded-LSH recall anchors against the exact formulations, and O(1)
  * plan size for the RandomHyperplanes expression.
  */
class ScaleSafetySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  /** Unit-ish random vector with a seeded RNG (deterministic fixture). */
  private def randVec(dim: Int): Array[Float] =
    Array.fill(dim)((rng.nextDouble() - 0.5).toFloat)

  private def perturb(v: Array[Float], eps: Float): Array[Float] =
    v.map(x => x + (rng.nextDouble() - 0.5).toFloat * eps)

  test("q31 plan is equi-join only: no BroadcastNestedLoopJoin, no CartesianProduct") {
    val df = graft.queries.Extensions.q31_neardup_embedding(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "banded LSH must not plan a BNLJ")
    assert(!plan.contains("CartesianProduct"), "banded LSH must not plan a cartesian")
  }

  test("ngramJaccard df-cap drops boilerplate shingles: degenerate corpus completes empty") {
    // 300 docs sharing every shingle of a boilerplate prefix (df = 300 for
    // each) with unique tails: uncapped this is a C(300,2) pair blowup;
    // with the cap the suspect shingles leave the index and nothing pairs.
    val docs = (0 until 300)
      .map(i => (i.toLong, s"click here to unsubscribe from this list now tail$i"))
      .toDF("doc_id", "text")
    val out = Dedup.ngramJaccard(docs, "doc_id", "text", w = 3, threshold = 0.1, maxDf = 10)
    assert(out.count() == 0, "all shingles above the df cap must be dropped")
  }

  test("minHashLsh bucket-cap drops degenerate buckets: identical-corpus completes empty") {
    // 300 identical docs land in ONE (band, bucket) of size 300 in every
    // band — the O(b²) blowup shape. Cap 10 drops the bucket entirely.
    val docs = (0 until 300)
      .map(i => (i.toLong, "the exact same boilerplate text in every single document"))
      .toDF("doc_id", "text")
    val out = Dedup.minHashLsh(docs, "doc_id", "text", maxBucket = 10)
    assert(out.count() == 0, "buckets above the cap must be dropped")
  }

  test("caps are inert below threshold: tiny-cap result equals default-cap result") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different text with no overlap at all"))
      .toDF("doc_id", "text")
    val tight = Dedup.minHashLsh(docs, "doc_id", "text", maxBucket = 5)
      .as[(Long, Long, Double)].collect().toSet
    val loose = Dedup.minHashLsh(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(tight == loose && tight == Set((1L, 2L, 1.0)))
    val jTight = Dedup.ngramJaccard(docs, "doc_id", "text", maxDf = 5)
      .as[(Long, Long, Double)].collect().toSet
    val jLoose = Dedup.ngramJaccard(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(jTight == jLoose && jTight.map(p => (p._1, p._2)) == Set((1L, 2L)))
  }

  test("nearDupPairs recovers the exact top pairs on a planted near-dup corpus") {
    val dim = 16
    val base = (0 until 40).map(i => (i.toLong, randVec(dim)))
    // ids 100+i are near-identical twins of ids 0..9: cosine ≈ 1 ≫ the
    // background pair similarity, so exact top-10 = the 10 planted pairs.
    val twins = (0 until 10).map(i => (100L + i, perturb(base(i)._2, 0.001f)))
    val emb = (base ++ twins).toDF("vec_id", "embedding")
    val exact = Similarity.topPairs(emb, "vec_id", "embedding", k = 10)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val banded = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        dim = dim, k = 10, bands = 8, bitsPerBand = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact == (0 until 10).map(i => (i.toLong, 100L + i)).toSet)
    assert(banded == exact, "near-identical pairs must collide in some band")
  }

  test("annTopK multi-probe recall >= 0.8 vs exact top-10 at nBits=8") {
    val dim = 16
    val q = randVec(dim)
    val neighbors = (1 to 10).map(i => (i.toLong, perturb(q, 0.001f)))
    val noise = (11 until 200).map(i => (i.toLong, randVec(dim)))
    val emb = ((0L, q) +: (neighbors ++ noise)).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, k = 11)
      .select("vec_id").as[Long].collect().toSet - 0L
    val ann = Similarity.annTopK(emb, "vec_id", "embedding",
        dim = dim, queryId = 0L, k = 11, nBits = 8, multiProbe = true)
      .select("vec_id").as[Long].collect().toSet - 0L
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"multi-probe recall $recall below 0.8 (ann=$ann exact=$exact)")
  }

  test("text ops tokenize once and never shuffle (q29/q33/q34 plan pins)") {
    val d = "/root/testdata/sf0.001"
    // projection-only: no Exchange in langid / quality; simhash's only
    // exchange is the n_dupes window on the fingerprint
    // round 5: tokenization lives INSIDE the one-pass TokenProfile
    // expression — no split() in the plan at all, one profile call
    val langPlan = graft.queries.Extensions.q33_langid(spark, d)
      .queryExecution.optimizedPlan.toString
    assert("graft_token_profile".r.findAllIn(langPlan).length == 1,
      s"langid must profile tokens exactly once:\n$langPlan")
    assert(!langPlan.contains("split("),
      s"langid must not re-tokenize outside the profile pass:\n$langPlan")
    val qualPlan = graft.queries.Extensions.q34_quality(spark, d)
      .queryExecution.optimizedPlan.toString
    assert("graft_token_profile".r.findAllIn(qualPlan).length == 1,
      s"quality must profile tokens exactly once:\n$qualPlan")
    assert(!qualPlan.contains("split("),
      s"quality must not re-tokenize outside the profile pass:\n$qualPlan")
    Seq("q33" -> langPlan, "q34" -> qualPlan).foreach { case (q, p) =>
      assert(!p.contains("Aggregate"), s"$q must not aggregate (projection-only)")
    }
    val simPlan = graft.queries.Extensions.q29_dedup_simhash(spark, d)
      .queryExecution.executedPlan.toString
    assert(!simPlan.contains("HashAggregate"),
      s"simhash must not shuffle token occurrences:\n$simPlan")
  }

  test("URL canonicalization is projection-only: no Exchange, no UDF, no aggregate") {
    // a file-backed source: local literal rows constant-fold into a
    // LocalTableScan and the projection disappears from the plan
    val urls = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        concat(lit("HTTPS://User@Sub"), col("doc_id"),
          lit(".Example.co.uk:8443/P?q=1#f")).as("url"))
    val plan = Web.withUrlKeys(urls, "url")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"withUrlKeys must be a pure map-side projection:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"no UDFs in the canonicalization path:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"no aggregation in a projection:\n$plan")
    // and it stays inside whole-stage codegen (the chained-when domain
    // cut must not fall out of codegen at this suffix-list size) — the
    // `*(n)` prefix is the codegen marker in the plan string
    assert(plan.contains("*(1) Project"),
      s"canonicalization must ride codegen:\n${plan.take(400)}")
  }

  test("self-join family reuses shuffle stages at runtime (q28/q30/q31, SMJ shape)") {
    // Fixture-sized inputs broadcast everywhere, hiding the 100 TB shape;
    // disabling auto-broadcast forces the SMJ plan a large input gets.
    // Under AQE, exchange reuse is a RUNTIME decision — assert on the
    // final adaptive plan after execution.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Seq(
        graft.queries.Extensions.q28_dedup_minhash_lsh,
        graft.queries.Extensions.q30_dedup_ngram_jaccard,
        graft.queries.Extensions.q31_neardup_embedding
      ).zip(Seq("q28", "q30", "q31")).foreach { case (q, name) =>
        val qe = q(spark, "/root/testdata/sf0.001").queryExecution
        qe.executedPlan.executeCollect()
        val plan = qe.executedPlan.toString
        assert(plan.contains("isFinalPlan=true"))
        val reused = "ReusedQueryStage|ReusedExchange".r.findAllIn(plan).length
        assert(reused >= 1,
          s"$name self-join branches must share the repartition exchange:\n$plan")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("round-6 retrieval family keeps scale shapes: no SMJ in q76/q78/q79, df reuse in q75, reuse in q77/q80") {
    // The shuffle-minimal claims behind the q75-q84 plan audit, pinned as
    // regressions: doc length is carried not joined (q76), the data card
    // and stop-prune never SMJ, the shingle/semantic self-joins reuse
    // their repartition exchange — and q75's df is the round-7 two-level
    // aggregate + join-back (the SMJ on the token key is DELIBERATE:
    // unlike the count window it replaced, a join is AQE-skew-splittable;
    // what's pinned is that both df branches share ONE tf exchange and
    // no nested-loop appears).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = "/root/testdata/sf0.001"
      Seq(
        "q76" -> graft.queries.Extensions.q76_bm25,
        "q78" -> graft.queries.Extensions.q78_data_card,
        "q79" -> graft.queries.Extensions.q79_stop_prune
      ).foreach { case (name, q) =>
        val qe = q(spark, d).queryExecution
        qe.executedPlan.executeCollect()
        val plan = qe.executedPlan.toString
        assert(!plan.contains("SortMergeJoin"),
          s"$name must not plan a relation-to-relation shuffle join:\n$plan")
      }
      locally {
        val qe = graft.queries.Extensions.q75_tfidf(spark, d).queryExecution
        qe.executedPlan.executeCollect()
        val plan = qe.executedPlan.toString
        // the only nested-loop allowed is the documented 1-row corpus-N
        // broadcast attach (crossJoin(broadcast(n)) — one aggregate row);
        // count in the FINAL plan only (AQE's toString repeats nodes in
        // the trailing "== Initial Plan ==" section)
        val finalPlan = plan.split("== Initial Plan ==")(0)
        assert("BroadcastNestedLoopJoin".r.findAllIn(finalPlan).size <= 1,
          s"q75 must not plan a multi-row nested loop:\n$plan")
        assert(!finalPlan.contains("CartesianProduct"),
          s"q75 must not plan a cartesian product:\n$plan")
        assert("ReusedQueryStage|ReusedExchange".r.findAllIn(plan).nonEmpty,
          s"q75's df branches must share the tf exchange:\n$plan")
      }
      Seq(
        "q77" -> graft.queries.Extensions.q77_containment,
        "q80" -> graft.queries.Extensions.q80_semdedup
      ).foreach { case (name, q) =>
        val qe = q(spark, d).queryExecution
        qe.executedPlan.executeCollect()
        val plan = qe.executedPlan.toString
        assert("ReusedQueryStage|ReusedExchange".r.findAllIn(plan).nonEmpty,
          s"$name self-join branches must share the repartition exchange:\n$plan")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("round-4 queries keep scale shapes: q44 equi-join only, q45/q46 projection-only") {
    val d = "/root/testdata/sf0.001"
    // decontamination joins must all be equi-joins (shingle key), never a
    // nested-loop — same invariant as the q31 pin
    val p44 = graft.queries.Extensions.q44_decontaminate(spark, d)
      .queryExecution.executedPlan.toString
    assert(!p44.contains("BroadcastNestedLoopJoin") && !p44.contains("CartesianProduct"),
      s"q44 must stay equi-join only:\n$p44")
    // redaction and shape signals are per-row math: no join, no aggregate
    // (the only exchange is the final presentation sort)
    val p45 = graft.queries.Extensions.q45_pii_redact(spark, d)
      .queryExecution.optimizedPlan.toString
    assert(!p45.contains("Aggregate") && !p45.contains("Join"),
      s"q45 must be projection-only:\n$p45")
    val p46 = graft.queries.Extensions.q46_quality_signals(spark, d)
      .queryExecution.optimizedPlan.toString
    assert(!p46.contains("Aggregate") && !p46.contains("Join"),
      s"q46 must be projection-only:\n$p46")
    assert("graft_token_stats".r.findAllIn(p46).length == 1 && !p46.contains("split("),
      s"q46 must be one TokenStats pass, no split() array materialization:\n$p46")
  }

  test("round-9 queries keep scale shapes: q95 filter-only after bounded fracs, q97 broadcast anti-join") {
    val d = "/root/testdata/sf0.001"
    // q95: the mixture is a zero-shuffle threshold filter — after the
    // bounded per-stratum count collect, the plan is scan → filter →
    // (presentation sort); no Aggregate, no Join survives optimization
    val p95 = graft.queries.Extensions.q95_balanced_mixture(spark, d)
      .queryExecution.optimizedPlan.toString
    assert(!p95.contains("Aggregate") && !p95.contains("Join"),
      s"q95 must be a threshold filter, not a shuffle:\n$p95")
    // q97: the ban side is the distinct-boilerplate population — small by
    // definition — so the anti-join must broadcast under defaults (probe
    // side never shuffles, occurrence skew of a hot line is irrelevant);
    // and nothing in the plan may be a nested loop or cartesian
    val p97 = graft.queries.Extensions.q97_boilerplate_lines(spark, d)
      .queryExecution.executedPlan.toString
    assert(p97.contains("BroadcastHashJoin") && p97.contains("LeftAnti"),
      s"q97's ban anti-join must broadcast the banned-lines side:\n$p97")
    assert(!p97.contains("BroadcastNestedLoopJoin") && !p97.contains("CartesianProduct"),
      s"q97 must stay equi-join only:\n$p97")
    // q98: chunking is row-local boundary math + one explode — a pure
    // projection (no join, no aggregate; the only exchange is the
    // presentation sort)
    val p98 = graft.queries.Extensions.q98_chunk_docs(spark, d)
      .queryExecution.optimizedPlan.toString
    assert(!p98.contains("Aggregate") && !p98.contains("Join"),
      s"q98 must be projection-only:\n$p98")
  }

  test("IVF top-k: probes the right cells and recovers planted neighbors") {
    val dim = 16
    val q = randVec(dim)
    val neighbors = (1 to 10).map(i => (i.toLong, perturb(q, 0.001f)))
    val noise = (11 until 200).map(i => (i.toLong, randVec(dim)))
    val emb = ((0L, q) +: (neighbors ++ noise)).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, k = 11)
      .select("vec_id").as[Long].collect().toSet - 0L
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
        queryId = 0L, k = 11, nCells = 16, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet - 0L
    val recall = (ivf & exact).size.toDouble / exact.size
    // near-identical twins share the query's cell by construction, so IVF
    // recall on planted dups should be essentially total
    assert(recall >= 0.8, s"IVF recall $recall below 0.8 (ivf=$ivf exact=$exact)")
    // scan side is filter-only: no exchange other than the 1-row broadcast
    val plan = Similarity.ivfTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 11, nCells = 16, nProbe = 4).queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"IVF scan must not shuffle:\n$plan")
  }

  test("k-NN joins with broadcastQueries=false: shuffle-join plan, results identical to broadcast path") {
    // The default (broadcastQueries=true) pins the probe side as the
    // broadcast build — right when queries ≪ corpus. Flip it false when
    // the query set is itself too large to broadcast (e.g. corpus-vs-
    // corpus dedup): the correct plan is then a two-sided shuffle on the
    // bucket/cell key — and must never degrade to a BNLJ or broadcast
    // the CORPUS side.
    val dim = 16
    val corpus = (0 until 120).map(i => (i.toLong, randVec(dim))).toDF("vec_id", "embedding")
    val queries = (0 until 15).map(i => (1000L + i, randVec(dim))).toDF("q_id", "q_vec")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Double)].collect().toSet
      val cases = Seq(
        "lsh" -> ((bq: Boolean) => Similarity.lshKnnJoin(corpus, queries,
          "vec_id", "embedding", "q_id", "q_vec", k = 3, dim = dim, nBits = 4,
          broadcastQueries = bq)),
        "ivf" -> ((bq: Boolean) => Similarity.ivfKnnJoin(corpus, queries,
          "vec_id", "embedding", "q_id", "q_vec", k = 3, nCells = 8, nProbe = 3,
          broadcastQueries = bq)))
      cases.foreach { case (name, join) =>
        val bcRows = rows(join(true))
        val qe = join(false).queryExecution
        qe.executedPlan.executeCollect()
        val plan = qe.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
          s"$name broadcastQueries=false must stay an equi-join:\n$plan")
        assert(!plan.contains("BroadcastExchange"),
          s"$name broadcastQueries=false must not broadcast either side " +
            s"(the corpus side would be the 100 TB one):\n$plan")
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"$name broadcastQueries=false must plan a two-sided shuffle join:\n$plan")
        assert(rows(join(false)) == bcRows,
          s"$name: both paths must produce identical neighbour sets")
        // and the default path keeps its explicit probe-side broadcast
        // even with auto-broadcast off (the hint, not the sizer, drives it)
        val bcPlan = join(true).queryExecution.executedPlan.toString
        assert(bcPlan.contains("BroadcastExchange"),
          s"$name broadcastQueries=true must pin the probe-side broadcast:\n$bcPlan")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("quantizeInt8: exact scale, bounded roundtrip error, top-k agrees with full precision") {
    import graft.functions.VectorFunctions
    val vecs = (0L until 60L).map(i => (i, Seq.fill(16)(rng.nextDouble() * 4 - 2)))
    val df = vecs.toDF("vec_id", "v")
    val rows = df.select(col("vec_id"),
      VectorFunctions.quantizeInt8(col("v")).as("z"), col("v")).collect()
    rows.foreach { r =>
      val z = r.getStruct(1)
      val scale = z.getDouble(0)
      val q = z.getSeq[Byte](1)
      val v = r.getSeq[Double](2)
      assert(scale == v.map(math.abs).max, "scale must be the max abs component")
      // |q_i·s/127 − x_i| ≤ s/254: the half-step bound of floor(+0.5)
      q.zip(v).foreach { case (qi, x) =>
        assert(math.abs(qi * scale / 127 - x) <= scale / 254 + 1e-12,
          s"roundtrip error above the half-step bound at $x") }
    }
    // retrieval agreement: planted near-identical neighbors survive the
    // precision loss — quantized top-k recovers the exact top-k
    val dim = 16
    val q0 = randVec(dim)
    val neighbors = (1 to 10).map(i => (i.toLong, perturb(q0, 0.001f)))
    val noise = (11 until 200).map(i => (i.toLong, randVec(dim)))
    val emb = ((0L, q0) +: (neighbors ++ noise)).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, k = 11)
      .select("vec_id").as[Long].collect().toSet - 0L
    val quant = Similarity.quantizedTopK(emb, "vec_id", "embedding", 0L, k = 11)
      .select("vec_id").as[Long].collect().toSet - 0L
    val recall = (quant & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall $recall below 0.9 (quant=$quant exact=$exact)")
  }

  test("NearestCentroid assigns the argmax-cosine cell, ties to lowest index") {
    val centroids = Array(
      Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0)) // index 2 duplicates 0
    val df = Seq(
      (1L, Array(0.9, 0.1)),   // nearest: centroid 0 (tie with 2 -> 0)
      (2L, Array(0.1, 0.9)),   // nearest: centroid 1
      (3L, Array(-1.0, -0.1))) // most-negative cosine to 0/2; 1 is less bad? no: argmax
      .toDF("vec_id", "v")
    val out = df.select(col("vec_id"),
      graft.functions.VectorFunctions.nearestCentroid(
        transform(col("v"), _.cast("double")), centroids).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(out(1L) == 0, "tie must resolve to the lowest centroid index")
    assert(out(2L) == 1)
    // v3: cos to c0/c2 ≈ -0.995, cos to c1 ≈ -0.0995 -> argmax is c1
    assert(out(3L) == 1)
  }

  test("RandomHyperplanes plan size is O(1) in dim and nBits") {
    val emb = Seq((0L, Array.fill(1536)(0.1))).toDF("vec_id", "v")
    val df = emb.select(
      graft.functions.VectorFunctions.lshBucket(col("v"), dim = 1536, nBits = 16).as("b"))
    val planLen = df.queryExecution.optimizedPlan.toString.length
    // The round-1 literal construction put dim × nBits = 24,576 constants
    // in the plan; the expression form stays a few hundred chars.
    assert(planLen < 5000, s"plan unexpectedly large: $planLen chars")
  }

  test("round-13 queries keep scale shapes: packTokens narrow window, no BNLJ in q113-q115") {
    // the per-shard offset window must sort NARROW rows: neither the
    // text nor the token arrays may ride the serialized per-shard sort
    // (the whole point of the count-then-join shape)
    val docs = (0 until 50)
      .map(i => (i.toLong, s"table data row line word$i", if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val packed = Packing.packTokens(docs, "doc_id", "text", "source", 16,
      graft.functions.TokenCounters.tinyBpe)
    val windows = packed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "packTokens must compute offsets via a window")
    windows.foreach { w =>
      val names = w.child.output.map(_.name).toSet
      assert(!names.contains("text") && !names.exists(_.contains("_ids")),
        s"window input must be narrow (shard, id, count), got $names")
    }
    // no nested-loop/cartesian anywhere in the new queries' plans
    for (q <- Seq("q113_pack_token_ids", "q114_code_rebuild_drift",
                  "q115_curate_token_ids")) {
      val plan = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ")
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian")
    }
  }

  test("round-14 queries keep scale shapes: dedup audit equi-joins, narrow prefix window") {
    val sf = "/root/testdata/sf0.001"
    def planOf(q: String) =
      graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
    // the dedup audit's joins are all equi-keyed (shingle key, band
    // bucket, (d1,d2) pair) — never a nested loop over pair sets;
    // q140's scalar-total attaches are the documented 1-row carve-out,
    // which Spark plans as bounded BNLJ/cartesian of single-row sides,
    // so only q139 gets the strict pin
    assert(!planOf("q139_dedup_recall").contains("BroadcastNestedLoopJoin") &&
      !planOf("q139_dedup_recall").contains("CartesianProduct"),
      "q139 must stay equi-join only")
    // the budget-prefix window must sort NARROW rows: the token count
    // rides the sort, never the text
    val docs = (0 until 30)
      .map(i => (i.toLong, s"w$i " * 5, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val pref = Sampling.tokenBudgetPrefix(
      docs.select(col("doc_id"), col("source"),
        expr("size(split(text, ' '))").cast("long").as("n_tok")),
      "doc_id", "source", "n_tok", Map("a" -> 100L, "b" -> 100L))
    val windows = pref.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(!w.child.output.map(_.name).contains("text"),
        "the running-sum window input must be narrow (id, stratum, tokens)")
    }
  }

  test("learned-filter family keeps scale shapes: scalar-only BNLJ, equi ratio join, free bands") {
    val sf = "/root/testdata/sf0.001"
    def planOf(q: String) =
      graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
    // no cartesian anywhere; the card and fertility audits join/aggregate
    // on bounded keys only — zero nested loops of any kind
    for (q <- Seq("q116_cross_ppl", "q117_nb_quality", "q118_token_card",
                  "q119_dsir_resample", "q120_ppl_partition",
                  "q121_score_audit", "q122_tokenizer_fertility")) {
      assert(!planOf(q).contains("CartesianProduct"), s"$q plans a cartesian")
    }
    for (q <- Seq("q118_token_card", "q122_tokenizer_fertility"))
      assert(!planOf(q).contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ")
    // the DSIR bucket-ratio attach must be an EQUI broadcast join (the
    // dim-bounded table), never a nested loop over the corpus stream
    assert(planOf("q119_dsir_resample").contains("BroadcastHashJoin"),
      "q119's ratio join must be a broadcast hash join")
    // q120's band labels are a per-row CASE over q116 — structurally the
    // SAME plan, no extra exchange for the partition step
    def shuffles(q: String) =
      "ShuffleQueryStage|Exchange hashpartitioning".r
        .findAllIn(planOf(q)).length
    assert(shuffles("q120_ppl_partition") == shuffles("q116_cross_ppl"),
      "the head/middle/tail labels must not add a shuffle")
  }

  test("capPerKey and splitByGroup keep scale shapes: bounded agg not a window, projection-only split") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    // the cap must rank via the partial-aggregating TopKAgg — a per-key
    // Window would serialize a skewed key into one task at scale
    val cap = Sampling.capPerKey(docs, "doc_id", "source", "n_chars", n = 50)
    val capPlan = cap.queryExecution.executedPlan.toString
    assert(!capPlan.contains("Window"), "cap must never plan a window")
    assert(capPlan.contains("partial_topkagg") || capPlan.contains("ObjectHashAggregate"),
      s"cap must rank via the map-side-combined aggregate:\n$capPlan")
    assert(capPlan.contains("BroadcastHashJoin") && capPlan.contains("LeftSemi"),
      "default survivor fetch is a broadcast semi-join (corpus never shuffles)")
    // the grouped split is a pure projection: no exchange anywhere
    val split = Sampling.splitByGroup(docs, "source")
    val splitPlan = split.queryExecution.executedPlan.toString
    assert(!splitPlan.contains("Exchange"), s"grouped split must not shuffle:\n$splitPlan")
  }

  test("q132-q135 keep scale shapes: rerank fetch is a broadcast equi-join, plan/drift aggregates are map-side-combined") {
    val sf = "/root/testdata/sf0.001"
    // q132: the coarse stage is the documented bounded-query-side brute
    // carve-out; the RERANK stages must stay broadcast equi-joins — a
    // shuffle there would move the corpus for kCand rows
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val rr = Similarity.projKnnJoinRerank(emb,
      emb.filter(col("vec_id") % 100 === 0),
      "vec_id", "embedding", "vec_id", "embedding",
      k = 5, dim = 64, outDim = 8, kCand = 20)
    val rrPlan = rr.queryExecution.executedPlan.toString
    assert(rrPlan.contains("BroadcastHashJoin"),
      s"candidate float fetch must be a broadcast equi-join:\n$rrPlan")
    assert(!rrPlan.contains("SortMergeJoin"),
      "no corpus-side shuffle join anywhere in the rerank")
    // q133: the corpus collapses via partial aggregation BEFORE any
    // exchange — the recipe join moves |strata| rows, never documents
    val docs = graft.Tables.load(spark, sf, "documents")
    val plan = Sampling.mixturePlan(docs.select(col("source"), col("n_chars")),
      "source", "n_chars", Map("src0" -> 0.5, "src1" -> 0.5), 1000L)
    val planStr = plan.queryExecution.executedPlan.toString
    assert(planStr.contains("partial_sum") || planStr.contains("HashAggregate"),
      s"mixture totals must pre-aggregate map-side:\n$planStr")
    assert(!planStr.contains("Window"), "the plan layer never sorts rows")
    // q135: same contract on both drift sides; the bucket-table outer
    // join is bounded, the corpus itself never joins anything
    val drift = Analytics.distributionDrift(docs,
      docs.where(col("n_chars") >= 300), "lang")
    val driftPlan = drift.queryExecution.executedPlan.toString
    assert(driftPlan.contains("partial_count") || driftPlan.contains("HashAggregate"),
      s"drift counts must pre-aggregate map-side:\n$driftPlan")
    assert(!driftPlan.contains("Window") && !driftPlan.contains("CartesianProduct"),
      "drift is aggregates + a bounded outer join (the scalar attach is broadcast)")
  }

  test("RandomProjection: O(1) plan size, LSH-disjoint matrix, cluster ranks survive 64->16") {
    import graft.functions.VectorFunctions
    // plan size must not grow with dim x outDim (the reference-object story)
    val wide = Seq((0L, Array.fill(1536)(0.1))).toDF("vec_id", "v")
      .select(VectorFunctions.randomProject(col("v"), 1536, 64).as("p"))
    val planLen = wide.queryExecution.optimizedPlan.toString.length
    assert(planLen < 5000, s"plan unexpectedly large: $planLen chars")
    // the projection matrix lives in a DISJOINT plane-index space
    val m = org.apache.spark.sql.graft.RandomProjection.matrix(4, 2)
    val lsh = org.apache.spark.sql.graft.RandomHyperplanes.planeMatrix(4, 2, 0)
    assert(m.flatten.toSeq != lsh.flatten.toSeq,
      "projection planes must not alias the LSH band-0 planes")
    // rank preservation: two tight 64-d clusters stay separated after
    // 64->16 — every projected row's nearest projected neighbour is from
    // its own cluster (the property that makes projected IVF work)
    val rng = new scala.util.Random(7)
    def clusterVec(center: Array[Double]): Seq[Double] =
      center.map(c => c + rng.nextGaussian() * 0.02)
    val c1 = Array.fill(64)(rng.nextGaussian())
    val c2 = Array.fill(64)(rng.nextGaussian())
    val emb = ((0L until 20L).map(i => (i, clusterVec(c1))) ++
      (100L until 120L).map(i => (i, clusterVec(c2))))
      .toDF("vec_id", "embedding")
    val proj = emb.select(col("vec_id"),
      VectorFunctions.randomProject(col("embedding"), 64, 16).as("p"))
    val rows = proj.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val crossed = rows.count { case (id, v) =>
      val nn = rows.filter(_._1 != id).maxBy { case (_, o) => cos(v, o) }
      (id < 100L) != (nn._1 < 100L)
    }
    assert(crossed == 0,
      s"$crossed of ${rows.length} projected rows crossed clusters")
  }

  test("RandomHyperplanes matches the plane matrix it advertises") {
    import org.apache.spark.sql.graft.RandomHyperplanes
    val dim = 8
    val v = Array.tabulate(dim)(j => 0.25 * (j - 3))
    val bucket = Seq(Tuple1(v)).toDF("v")
      .select(graft.functions.VectorFunctions.lshBucket(col("v"), dim, 4, band = 2).as("b"))
      .as[String].collect().head
    val expected = RandomHyperplanes.planeMatrix(dim, 4, 2).map { plane =>
      val s = plane.zip(v).map { case (p, x) => p * x }.sum
      if (s >= 0) '1' else '0'
    }.mkString
    assert(bucket == expected)
  }
}
