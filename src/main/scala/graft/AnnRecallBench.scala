package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ANN recall-vs-cost surface (round-11 verdict item 2): every rung
  * of the approximate-retrieval ladder — IVF float, IVF int8, LSH float,
  * LSH int8, flat PQ, IVF-PQ — scored by [[graft.ops.Similarity
  * .annRecall]] against the exact [[graft.ops.Similarity.bruteKnnJoin]]
  * top-10 on ONE fixture, across the parameters a deployment actually
  * tunes (nProbe, nBits/multiProbe, m, nCodes, kmeansIters). q102 gave a
  * single recall point; this records the curve that point sits on.
  *
  * **Fixture: planted structure, not the sf random vectors.** The
  * driver's `embeddings.parquet` is uniform random (measured: intra- and
  * inter-label cosine both ≈ 0.000) — the WORST case for every
  * clustering-based ANN structure, because true neighbours are only
  * infinitesimally closer than the bulk and cells/buckets cannot
  * concentrate them. Real embedding corpora are the opposite: locally
  * clustered. So the sweep runs on a deterministic planted corpus built
  * from the [[BenchHarness.md5VecSql]] recipe — the BASE vector is keyed
  * on the row's CLUSTER id (id % nClusters: the cluster's shared
  * center) and the eps term on the raw id (per-row noise), giving
  * nClusters clean clusters with intra-cluster cosine ≈ 1/(1+eps²) and
  * inter ≈ 0 — and records the random-fixture numbers alongside as the
  * labelled worst-case contrast rows.
  *
  * Cost columns are analytic from the layouts (the quantity a 100 TB
  * deployment budgets): probed fraction of the corpus (IVF nProbe/nCells,
  * LSH probed-buckets/2^nBits, flat = 1) × per-row payload bytes (float
  * dim·8, int8 dim+8, PQ m·4). Latency is a warm median of the full
  * k-NN-join collect at this (tiny) scale — plan-shape overhead, not
  * bandwidth; the bytes column is the number that scales.
  *
  * One JSON line on stdout (the [[Bench]] discipline) + the same content
  * at `ANN_RECALL.json`; summarized in BASELINE.md with the recommended
  * defaults, which this main ASSERTS so a regression fails the bench
  * rather than silently shifting the table.
  */
object AnnRecallBench {

  final case class Row(family: String, storage: String, fixture: String,
                       params: String, buildS: Double, queryS: Double,
                       recallMean: Double, recallMin: Double,
                       probedFrac: Double, probedKbPerQuery: Double)

  def main(args: Array[String]): Unit = {
    import BenchHarness.{medianOf, time}
    val spark = BenchHarness.session(BenchHarness.cpus(), logLevel = "ERROR")
    import spark.implicits._

    val nVecs = BenchHarness.env("SPARK_GRAFT_VECS", "2000").toInt // sf0.1 scale
    val dim = 64
    val nClusters = 50
    val eps = "0.15d"
    val k = 10
    val nCells = 16

    val loadBefore = BenchHarness.loadavg
    val base = BenchHarness.tmp("graft_annrecall_")

    // planted corpus: center keyed on the cluster id, noise on the row id
    spark.range(nVecs.toLong)
      .select(col("id").as("vec_id"),
        expr(BenchHarness.md5VecSql(s"(id % $nClusters)", dim, eps)).as("embedding"))
      .write.mode("overwrite").parquet(s"$base/planted")
    // worst-case corpus: the same recipe keyed on the raw id = uniform
    // random, no structure to exploit (what the sf fixture is)
    spark.range(nVecs.toLong)
      .select(col("id").as("vec_id"),
        expr(BenchHarness.md5VecSql("id", dim, "0.0d")).as("embedding"))
      .write.mode("overwrite").parquet(s"$base/random")

    val results = scala.collection.mutable.ArrayBuffer.empty[Row]

    def sweep(fixture: String): Unit = {
      val corpus = spark.read.parquet(s"$base/$fixture")
      val queries = corpus.filter(col("vec_id") % (nVecs / 100).max(1) === 0)
      val nQ = queries.count()
      val truth = graft.ops.Similarity.bruteKnnJoin(corpus, queries,
        "vec_id", "embedding", "vec_id", "embedding", k)
        .localCheckpoint(true) // ONE exact pass reused by every config

      def record(family: String, storage: String, params: String,
                 buildS: Double, frac: Double, rowBytes: Int,
                 join: () => DataFrame, extraKbPerQuery: Double = 0.0): Row = {
        val (recalls, tQ) = {
          val t = medianOf(3)(join().collect())
          val r = graft.ops.Similarity.annRecall(join(), truth, "vec_id")
            .select(col("recall")).as[Double].collect()
          (r, t)
        }
        require(recalls.length == nQ, s"$family $params: missing queries")
        val row = Row(family, storage, fixture, params, buildS, tQ,
          recalls.sum / recalls.length, recalls.min,
          frac, nVecs * frac * rowBytes / 1024.0 + extraKbPerQuery)
        results += row
        println(f"${row.family}%-7s ${row.storage}%-6s ${row.fixture}%-7s " +
          f"${row.params}%-28s build ${row.buildS}%6.2fs  q ${row.queryS}%6.3fs  " +
          f"recall ${row.recallMean}%5.3f (min ${row.recallMin}%5.3f)  " +
          f"probed ${row.probedFrac}%5.3f  ${row.probedKbPerQuery}%8.1f KB/q")
        row
      }

      // ----- IVF: float + int8, kmeansIters ∈ {0, 3}, nProbe swept -----
      for (ki <- Seq(0, 3)) {
        val fp = s"$base/${fixture}_idx/ivf_ki$ki"
        val (_, bF) = time(graft.ops.Similarity.buildIvfIndex(
          corpus, "vec_id", "embedding", fp, nCells, kmeansIters = ki))
        val qp = s"$base/${fixture}_idx/ivfq_ki$ki"
        val (_, bQ) = time(graft.ops.Similarity.buildIvfIndexQuantized(
          corpus, "vec_id", "embedding", qp, nCells, kmeansIters = ki))
        for (nProbe <- Seq(1, 2, 3, 4, 6, 8)) {
          record("ivf", "float", s"nCells=$nCells nProbe=$nProbe ki=$ki",
            bF, nProbe.toDouble / nCells, dim * 8,
            () => graft.ops.Similarity.ivfIndexKnnJoin(spark, fp,
              "vec_id", "embedding", queries, "vec_id", "embedding", k, nProbe))
          record("ivf", "int8", s"nCells=$nCells nProbe=$nProbe ki=$ki",
            bQ, nProbe.toDouble / nCells, dim + 8,
            () => graft.ops.Similarity.ivfIndexQuantizedKnnJoin(spark, qp,
              "vec_id", queries, "vec_id", "embedding", k, nProbe))
        }
      }

      // ----- LSH: float (nBits × multiProbe), int8 at the default -----
      for (nBits <- Seq(6, 8)) {
        val lp = s"$base/${fixture}_idx/lsh_b$nBits"
        val (_, bL) = time(graft.ops.Similarity.buildLshIndex(
          corpus, "vec_id", "embedding", lp, dim, nBits))
        for (multi <- Seq(true, false)) {
          val frac = (if (multi) nBits + 1 else 1).toDouble / (1 << nBits)
          record("lsh", "float", s"nBits=$nBits multiProbe=$multi",
            bL, frac, dim * 8,
            () => graft.ops.Similarity.lshIndexKnnJoin(spark, lp,
              "vec_id", "embedding", queries, "vec_id", "embedding",
              k, dim, nBits, multi))
        }
      }
      val lqp = s"$base/${fixture}_idx/lshq_b8"
      val (_, bLq) = time(graft.ops.Similarity.buildLshIndexQuantized(
        corpus, "vec_id", "embedding", lqp, dim, nBits = 8))
      record("lsh", "int8", "nBits=8 multiProbe=true",
        bLq, 9.0 / 256, dim + 8,
        () => graft.ops.Similarity.lshIndexQuantizedKnnJoin(spark, lqp,
          "vec_id", queries, "vec_id", "embedding", k, dim, nBits = 8))

      // ----- flat PQ: m × nCodes × kmeansIters -----
      for (m <- Seq(2, 4, 8); nCodes <- Seq(16, 256); ki <- Seq(0, 3)) {
        val pp = s"$base/${fixture}_idx/pq_m${m}_c${nCodes}_ki$ki"
        val (_, bP) = time(graft.ops.Similarity.buildPqIndex(
          corpus, "vec_id", "embedding", pp, m, nCodes, kmeansIters = ki))
        record("pq", "codes", s"m=$m nCodes=$nCodes ki=$ki",
          bP, 1.0, m * 4,
          () => graft.ops.Similarity.pqIndexKnnJoin(spark, pp,
            "vec_id", queries, "vec_id", "embedding", k))
      }

      // ----- PQ + exact rerank: the two-stage retrieval the flat-PQ
      // rows above prescribe — codes propose kCand, floats re-rank.
      // Cost = the full code scan + kCand float rows per query.
      for (kCand <- Seq(50, 100)) {
        val pp = s"$base/${fixture}_idx/pq_m4_c16_ki0" // built in the loop above
        record("pq", "rerank", s"m=4 nCodes=16 kCand=$kCand",
          0.0, 1.0, 4 * 4,
          () => graft.ops.Similarity.pqIndexKnnJoinRerank(spark, pp,
            corpus, "vec_id", "embedding", queries, "vec_id", "embedding",
            k, kCand),
          extraKbPerQuery = kCand * dim * 8 / 1024.0)
      }

      // ----- IVF-PQ: nCodes × kmeansIters × {raw, residual} encoding,
      // nProbe swept, m = 4. Residual is the classic recall fix at
      // IDENTICAL bytes — same cells, same code width, the codes just
      // describe v − centroid[cell] instead of v.
      for (nCodes <- Seq(16, 256); ki <- Seq(0, 3);
           res <- Seq(false, true)) {
        val tag = if (res) "res" else "raw"
        val ip = s"$base/${fixture}_idx/ivfpq_c${nCodes}_ki${ki}_$tag"
        val (_, bI) = time(graft.ops.Similarity.buildIvfPqIndex(
          corpus, "vec_id", "embedding", ip, nCells, m = 4, nCodes,
          kmeansIters = ki, residual = res))
        for (nProbe <- Seq(1, 3, 8)) {
          record("ivfpq", if (res) "res" else "codes",
            s"nCells=$nCells m=4 nCodes=$nCodes nProbe=$nProbe ki=$ki",
            bI, nProbe.toDouble / nCells, 4 * 4,
            () => graft.ops.Similarity.ivfPqIndexKnnJoin(spark, ip,
              "vec_id", queries, "vec_id", "embedding", k, nProbe))
        }
      }

      // ----- IVF-PQ + exact rerank: the composed best case per probed
      // byte — cells cut the scan, codes cut the row width, the float
      // read is kCand rows per query.
      for (nProbe <- Seq(1, 3)) {
        val ip = s"$base/${fixture}_idx/ivfpq_c16_ki0_raw"
        record("ivfpq", "rerank", s"nCells=$nCells m=4 nCodes=16 nProbe=$nProbe kCand=100",
          0.0, nProbe.toDouble / nCells, 4 * 4,
          () => graft.ops.Similarity.ivfPqIndexKnnJoinRerank(spark, ip,
            corpus, "vec_id", "embedding", queries, "vec_id", "embedding",
            k, kCand = 100, nProbe),
          extraKbPerQuery = 100 * dim * 8 / 1024.0)
      }
    }

    sweep("planted")
    // worst-case contrast: the full ladder at one representative config
    // each would repeat q102's lesson 50×; the IVF rows alone show it
    locally {
      val corpus = spark.read.parquet(s"$base/random")
      val queries = corpus.filter(col("vec_id") % (nVecs / 100).max(1) === 0)
      val truth = graft.ops.Similarity.bruteKnnJoin(corpus, queries,
        "vec_id", "embedding", "vec_id", "embedding", k).localCheckpoint(true)
      for (ki <- Seq(0, 3)) {
        val fp = s"$base/random_idx/ivf_ki$ki"
        val (_, bF) = time(graft.ops.Similarity.buildIvfIndex(
          corpus, "vec_id", "embedding", fp, nCells, kmeansIters = ki))
        for (nProbe <- Seq(3, 8)) {
          val join = () => graft.ops.Similarity.ivfIndexKnnJoin(spark, fp,
            "vec_id", "embedding", queries, "vec_id", "embedding", k, nProbe)
          val tQ = medianOf(3)(join().collect())
          val recalls = graft.ops.Similarity.annRecall(join(), truth, "vec_id")
            .select(col("recall")).as[Double].collect()
          val row = Row("ivf", "float", "random",
            s"nCells=$nCells nProbe=$nProbe ki=$ki", bF, tQ,
            recalls.sum / recalls.length, recalls.min,
            nProbe.toDouble / nCells, nVecs * (nProbe.toDouble / nCells) * dim * 8 / 1024.0)
          results += row
          println(f"${row.family}%-7s ${row.storage}%-6s ${row.fixture}%-7s " +
            f"${row.params}%-28s build ${row.buildS}%6.2fs  q ${row.queryS}%6.3fs  " +
            f"recall ${row.recallMean}%5.3f (min ${row.recallMin}%5.3f)  " +
            f"probed ${row.probedFrac}%5.3f  ${row.probedKbPerQuery}%8.1f KB/q")
        }
      }
    }

    // ---- recommended-default assertions: a regression here must FAIL the
    // bench, not silently shift the recorded table ----
    def recallOf(family: String, storage: String, params: String): Double =
      results.find(r => r.fixture == "planted" && r.family == family &&
        r.storage == storage && r.params == params)
        .getOrElse(sys.error(s"missing config $family/$storage/$params")).recallMean
    val ivfDefault = recallOf("ivf", "float", s"nCells=$nCells nProbe=3 ki=0")
    require(ivfDefault >= 0.90,
      f"IVF float default (nProbe=3, ki=0) recall $ivfDefault%.3f < 0.90 on planted structure")
    val int8Default = recallOf("ivf", "int8", s"nCells=$nCells nProbe=3 ki=0")
    require(math.abs(int8Default - ivfDefault) <= 0.05,
      f"int8 must track float at the default config: $int8Default%.3f vs $ivfDefault%.3f")
    // kmeansIters default adjudication: the measured gap between ki=0 and
    // ki=3 across the IVF nProbe sweep decides whether 0 stays the default
    val rerank = recallOf("pq", "rerank", "m=4 nCodes=16 kCand=100")
    require(rerank >= 0.95,
      f"PQ+rerank (kCand=100) recall $rerank%.3f < 0.95 on planted structure " +
        "- the two-stage contract")
    val kiGap = Seq(1, 2, 3, 4, 6, 8).map { p =>
      recallOf("ivf", "float", s"nCells=$nCells nProbe=$p ki=3") -
        recallOf("ivf", "float", s"nCells=$nCells nProbe=$p ki=0")
    }
    println(f"kmeansIters adjudication: mean recall gain of ki=3 over ki=0 " +
      f"across the IVF sweep = ${kiGap.sum / kiGap.size}%+.3f " +
      f"(max ${kiGap.max}%+.3f)")

    val loadAfter = BenchHarness.loadavg
    def j(r: Row): String =
      s"""{"family":"${r.family}","storage":"${r.storage}","fixture":"${r.fixture}",""" +
        s""""params":"${r.params}","build_s":${BenchHarness.fmt(r.buildS, 3)},""" +
        s""""query_s":${BenchHarness.fmt(r.queryS, 3)},""" +
        s""""recall_mean":${BenchHarness.fmt(r.recallMean, 4)},""" +
        s""""recall_min":${BenchHarness.fmt(r.recallMin, 4)},""" +
        s""""probed_frac":${BenchHarness.fmt(r.probedFrac, 4)},""" +
        s""""probed_kb_per_query":${BenchHarness.fmt(r.probedKbPerQuery, 1)}}"""
    val json =
      s"""{"metric":"ann_recall_surface","n_vecs":$nVecs,"dim":$dim,""" +
        s""""n_clusters":$nClusters,"eps":"$eps","k":$k,""" +
        s""""loadavg_before":"$loadBefore","loadavg_after":"$loadAfter",""" +
        s""""contended":${BenchHarness.contended(loadBefore)},""" +
        s""""configs":[${results.map(j).mkString(",")}]}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("ANN_RECALL.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
