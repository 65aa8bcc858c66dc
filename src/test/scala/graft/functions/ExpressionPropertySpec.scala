package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized equivalence tests: every custom Catalyst expression must
  * agree with the composable Spark formulation it replaced, over seeded
  * random inputs — the expressions exist for plan shape and speed, never
  * for different semantics. (Seeded `scala.util.Random` rather than
  * scalacheck: deterministic fixtures, and the scalatest-scalacheck
  * bridge artifact is not in the offline cache.)
  */
class ExpressionPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(7)

  private def word(): String = {
    val n = rng.nextInt(7)
    List.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
  }
  private def text(): String = List.fill(rng.nextInt(13))(word()).mkString(" ")
  private def vec(dim: Int = 8): Array[Double] =
    Array.fill(dim)(rng.nextDouble() * 10 - 5)

  test("DotProduct == aggregate(zip_with(...)) composition") {
    val pairs = List.fill(40)((vec(), vec()))
    val out = pairs.toDF("a", "b").select(
      VectorFunctions.dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _).as("ref"))
      .as[(Double, Double)].collect()
    out.foreach { case (fast, ref) => assert(math.abs(fast - ref) < 1e-9) }
  }

  test("WordShingles == HOF distinct-shingle composition") {
    val texts = List.fill(40)(text()) :+ "" :+ "a" :+ "a b" :+ "  double  spaces "
    val w = 3
    // NB the when-guard: Spark's sequence(1, 0) counts DOWN — the exact
    // pitfall WordShingles' scaladoc documents about the composable form
    val nToks = size(split(col("t"), " "))
    val out = texts.toDF("t").select(
      VectorFunctions.wordShingles(col("t"), w).as("fast"),
      when(nToks >= w,
        array_distinct(transform(
          sequence(lit(1), nToks - (w - 1)),
          i => concat_ws(" ",
            element_at(split(col("t"), " "), i),
            element_at(split(col("t"), " "), i + 1),
            element_at(split(col("t"), " "), i + 2)))))
        .otherwise(array().cast("array<string>")).as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    out.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("WordGramHashes == HOF md5-concat_ws-slice composition") {
    val texts = List.fill(40)(text()) :+ "" :+ "a" :+ "a b c" :+
      "exactly three words" :+ "  leading  and  doubled  spaces "
    for (w <- Seq(1, 3, 8)) {
      val out = texts.toDF("t")
        .select(expr("filter(split(t, ' '), x -> x <> '')").as("_words"))
        .select(
          VectorFunctions.wordGramHashes(col("_words"), w).as("fast"),
          // the composable form this expression replaced (Dedup's old
          // gramArrayExpr), when-guarded because sequence(1, 0) counts DOWN
          when(size(col("_words")) >= w,
            expr(s"transform(sequence(1, size(_words) - ${w - 1}), " +
              s"i -> md5(concat_ws(' ', slice(_words, i, $w))))"))
            .otherwise(array().cast("array<string>")).as("ref"))
        .as[(Seq[String], Seq[String])].collect()
      out.foreach { case (fast, ref) => assert(fast == ref, s"w=$w") }
    }
  }

  test("PqEncode == independent driver argmin; PqAdcScore == reconstruction cosine") {
    // independent reference arithmetic: squared L2 as sum((x-w)^2) — a
    // DIFFERENT formula from the expression's x·x − 2·x·w + w·w, so
    // agreement pins the semantics, not the implementation
    val m = 2; val sub = 4; val nCodes = 5
    val cb: Array[Array[Array[Double]]] =
      Array.fill(m)(Array.fill(nCodes)(vec(sub)))
    val vecs = List.fill(40)(vec(m * sub))
    def refEncode(v: Array[Double]): Seq[Int] =
      (0 until m).map { s =>
        val x = v.slice(s * sub, (s + 1) * sub)
        (0 until nCodes).minBy(c =>
          (x.zip(cb(s)(c)).map { case (a, b) => (a - b) * (a - b) }.sum, c))
      }
    val out = vecs.map(Tuple1(_)).toDF("v")
      .select(VectorFunctions.pqEncode(col("v"), cb).as("codes"))
      .as[Seq[Int]].collect()
    vecs.zip(out).foreach { case (v, codes) =>
      assert(codes == refEncode(v), s"encode mismatch for ${v.toSeq}")
    }
    // ADC score == cosine(q, reconstruction-from-codes)
    val qv = vec(m * sub)
    val dots = Array.tabulate(m)(s => cb(s).map(w =>
      w.indices.map(j => qv(s * sub + j) * w(j)).sum))
    val n2 = cb.map(_.map(w => w.map(x => x * x).sum))
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val scored = vecs.map(Tuple1(_)).toDF("v")
      .select(VectorFunctions.pqAdcScore(
        VectorFunctions.pqEncode(col("v"), cb), dots, n2, qn).as("s"))
      .as[Double].collect()
    vecs.zip(scored).foreach { case (v, s) =>
      val rec = refEncode(v).zipWithIndex.flatMap { case (c, sp) => cb(sp)(c) }
      val ref = rec.zip(qv).map { case (a, b) => a * b }.sum /
        (qn * math.sqrt(rec.map(x => x * x).sum))
      assert(math.abs(s - ref) < 1e-9, s"adc $s vs ref $ref")
    }
  }

  test("PqQueryLut/PqAdcScoreBatch == the point form's driver LUT and score, per query") {
    // batch-vs-point identity: the batch scorer over a LUT COLUMN must
    // produce bit-identical scores to PqAdcScore over the driver LUT for
    // the same query — the q104-vs-q100 agreement at expression level
    val m = 2; val sub = 4; val nCodes = 5
    val cb: Array[Array[Array[Double]]] =
      Array.fill(m)(Array.fill(nCodes)(vec(sub)))
    val n2 = cb.map(_.map(w => w.map(x => x * x).sum))
    val vecs = List.fill(30)(vec(m * sub))
    val queries = List.fill(4)(vec(m * sub))
    // the LUT column equals the driver-computed LUT, flattened
    val lutRows = queries.map(Tuple1(_)).toDF("q")
      .select(VectorFunctions.pqQueryLut(col("q"), cb).as("lut"))
      .as[Seq[Double]].collect()
    queries.zip(lutRows).foreach { case (q, lut) =>
      val ref = (0 until m).flatMap(s => cb(s).map(w =>
        w.indices.map(j => q(s * sub + j) * w(j)).sum))
      assert(lut == ref, "LUT column must equal the driver LUT")
    }
    // batch score == point score for every (vector, query) pair
    queries.foreach { q =>
      val dots = Array.tabulate(m)(s => cb(s).map(w =>
        w.indices.map(j => q(s * sub + j) * w(j)).sum))
      val qn = math.sqrt(q.map(x => x * x).sum)
      val point = vecs.map(Tuple1(_)).toDF("v")
        .select(VectorFunctions.pqAdcScore(
          VectorFunctions.pqEncode(col("v"), cb), dots, n2, qn).as("s"))
        .as[Double].collect()
      val batch = vecs.map(v => (v, q)).toDF("v", "q")
        .select(VectorFunctions.pqAdcScoreBatch(
          VectorFunctions.pqEncode(col("v"), cb),
          VectorFunctions.pqQueryLut(col("q"), cb),
          sqrt(org.apache.spark.sql.graft.VectorBridge.dot(
            transform(col("q"), _.cast("double")),
            transform(col("q"), _.cast("double")))), n2).as("s"))
        .as[Double].collect()
      point.zip(batch).foreach { case (p, b) =>
        assert(p == b, s"batch ADC $b must equal point ADC $p bit for bit")
      }
    }
  }

  test("residual PQ expressions == direct arithmetic: residual, packed LUT, reconstruction cosine") {
    val m = 2; val sub = 4; val nCells = 3; val nCodes = 5
    val dim = m * sub
    val cents: Array[Array[Double]] = Array.fill(nCells)(vec(dim))
    val cb: Array[Array[Array[Double]]] =
      Array.fill(m)(Array.fill(nCodes)(vec(sub)))
    val vecs = List.fill(30)(vec(dim))
    val cells = List.fill(30)(rng.nextInt(nCells))
    // CentroidResidual == elementwise v - centroids(cell)
    val res = vecs.zip(cells).toDF("v", "cell")
      .select(VectorFunctions.centroidResidual(col("v"), col("cell"), cents).as("r"))
      .as[Seq[Double]].collect()
    vecs.zip(cells).zip(res).foreach { case ((v, c), r) =>
      assert(r == v.zip(cents(c)).map { case (a, b) => a - b }.toSeq)
    }
    // PqResidualQueryLut packs [LUT | centroid dots | |q|] in order, and
    // the column form equals the driver form
    val q = vec(dim)
    val lutP = Seq(Tuple1(q)).toDF("q")
      .select(VectorFunctions.pqResidualQueryLut(col("q"), cb, cents).as("l"))
      .as[Seq[Double]].head()
    val driver = org.apache.spark.sql.graft.PqResidualQueryLut
      .computeArray(cb, cents, q)
    assert(lutP == driver.toSeq, "column and driver packed LUTs must agree")
    assert(lutP.length == m * nCodes + nCells + 1)
    // PqAdcResidualScore == cosine(q, centroid + reconstruction), the
    // independent full-dim arithmetic (no LUTs, no identities)
    val (n2, cd, cn2) = {
      val n2 = cb.map(_.map(w => w.map(x => x * x).sum))
      val cd = cents.map(ct => Array.tabulate(m)(s => cb(s).map(w =>
        w.indices.map(j => ct(s * sub + j) * w(j)).sum)))
      val cn2 = cents.map(_.map(x => x * x).sum)
      (n2, cd, cn2)
    }
    val scored = vecs.zip(cells).toDF("v", "cell")
      .select(VectorFunctions.pqAdcResidualScore(
        VectorFunctions.pqEncode(
          VectorFunctions.centroidResidual(col("v"), col("cell"), cents), cb),
        col("cell"), typedLit(driver.toSeq), n2, cd, cn2).as("s"))
      .as[Double].collect()
    def refEncode(r: Array[Double]): Seq[Int] =
      (0 until m).map { s =>
        val x = r.slice(s * sub, (s + 1) * sub)
        (0 until nCodes).minBy(c =>
          (x.zip(cb(s)(c)).map { case (a, b) => (a - b) * (a - b) }.sum, c))
      }
    vecs.zip(cells).zip(scored).foreach { case ((v, c), s) =>
      val r = v.zip(cents(c)).map { case (a, b) => a - b }
      val rec = refEncode(r).zipWithIndex.flatMap { case (code, sp) => cb(sp)(code) }
      val full = cents(c).zip(rec).map { case (a, b) => a + b }
      val ref = full.zip(q).map { case (a, b) => a * b }.sum /
        (math.sqrt(q.map(x => x * x).sum) * math.sqrt(full.map(x => x * x).sum))
      assert(math.abs(s - ref) < 1e-9,
        s"residual ADC $s vs direct reconstruction cosine $ref")
    }
  }

  test("SimHashBits == explode+groupBy majority-vote composition") {
    val bits = 16
    val df = (List.fill(40)(text()) :+ "" :+ "x")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val fast = df.select(col("doc_id"),
      VectorFunctions.simHashBits(col("text"), bits).as("s"))
      .as[(Long, String)].collect().toMap
    val tok = df.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", md5(col("w")))
    val bitSums = (0 until bits).map(i =>
      sum(when(substring(col("h"), i + 1, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(0)).as(s"b$i"))
    val agg = tok.groupBy(col("doc_id"))
      .agg(bitSums.head, (bitSums.tail :+ count(lit(1)).as("n")): _*)
    val fp = concat((0 until bits).map(i =>
      when(col(s"b$i") * 2 > col("n"), "1").otherwise("0").cast("string")): _*)
    val ref = agg.select(col("doc_id"), fp.as("s")).as[(Long, String)].collect().toMap
    ref.foreach { case (id, s) => assert(fast(id) == s, s"doc $id") }
    assert(fast.size == ref.size, "explode form and expression agree on row coverage")
  }

  test("RandomHyperplanes == literal-plane dot-sign composition") {
    val dim = 8; val nBits = 4; val band = 1
    val df = List.fill(40)(vec(dim)).map(Tuple1(_)).toDF("v")
    val planes = org.apache.spark.sql.graft.RandomHyperplanes.planeMatrix(dim, nBits, band)
    val refCols = (0 until nBits).map { p =>
      val plane = array(planes(p).toIndexedSeq.map(lit): _*)
      when(VectorFunctions.dot(plane, col("v")) >= 0, "1").otherwise("0")
    }
    val out = df.select(
      VectorFunctions.lshBucket(col("v"), dim, nBits, band).as("fast"),
      concat(refCols: _*).as("ref"))
      .as[(String, String)].collect()
    out.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("WinnowFingerprints == slice/array_min HOF composition") {
    val k = 4; val t = 8; val win = t - k + 1
    // char-heavy random texts plus edges: empty, shorter than k, between
    // k and t (fewer grams than one window)
    val texts = List.fill(40)(text()) ++ List("", "ab", "abcde", "abcdefg")
    val hs = when(length(col("t")) >= k,
      transform(
        sequence(lit(1), length(col("t")) - (k - 1)),
        i => md5(col("t").substr(i, lit(k)))))
      .otherwise(array(md5(col("t"))))
    val mins = when(size(col("_hs")) >= win,
      array_distinct(transform(
        sequence(lit(0), size(col("_hs")) - win),
        j => array_min(slice(col("_hs"), j + lit(1), lit(win))))))
      .otherwise(array(array_min(col("_hs"))))
    val out = texts.toDF("t")
      .select(col("t"), VectorFunctions.winnow(col("t"), k, t).as("fast"), hs.as("_hs"))
      .select(col("t"), col("fast"), mins.as("ref"))
      .as[(String, Seq[String], Seq[String])].collect()
    out.foreach { case (txt, fast, ref) =>
      assert(fast.toSet == ref.toSet, s"text: '$txt'")
    }
  }

  test("NfcNormalize: composes combining sequences, identity fast path, null passthrough") {
    val decomposed = "e\u0301 A\u0300 plain"
    val precomposed = "\u00e9 \u00c0 plain"
    val rows = Seq(
      (1L, decomposed),
      (2L, precomposed),                 // already NFC: identity out
      (3L, ""),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = rows.select(col("id"),
        VectorFunctions.nfcNormalize(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == precomposed, s"NFC must compose: ${out(1L)}")
    assert(out(1L) == out(2L), "decomposed and precomposed must converge")
    assert(out(3L) == "" && out(4L) == null)
    // normalizeText: the full cleanup chain (NFC -> lower -> control
    // strip -> ws collapse -> trim), the q144 statement
    val norm = rows.select(col("id"),
        graft.ops.TextAnalysis.normalizeText(
          concat(col("text"), lit("\t\t x\u0001 y  z ")),
          lowercase = true).as("n"))
      .as[(Long, String)].collect().toMap
    assert(norm(1L) == "\u00e9 \u00e0 plain x y z", s"${norm(1L)}")
    assert(norm(1L) == norm(2L),
      "the two presentations of the same text must normalize identically")
    assert(norm(3L) == "x y z")
    assert(norm(4L) == null)
  }

  test("GopherStats: hand-computed counts over a mixed-shape document") {
    import spark.implicits._
    val doc = "The quick fox  jumped\twith 12 42 # tags\n" + // 9 words, 2 stops (the, with)
      "  - bullet a\n" + // bullet line (leading ws trimmed)
      "* second...\n" + // bullet AND '...' line
      "   \n" + // blank after trim: not a line
      "ends with mark …\n" + // '…' line, 'with' stop hit
      "#tag and more...." // '....': ONE non-overlapping '...' run; 'and' stop
    val out = Seq((1L, doc)).toDF("id", "text")
      .select(VectorFunctions.gopherStats(col("text")).as("g"))
      .select("g.*")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    val (nWords, lenSum, nAlpha, nStop, nLines, nBullet, nEllipsis,
      nHash, nMarks) = out
    assert(nWords == 21L, s"n_words: $nWords")
    // 12, 42, #, -, *, … carry no [A-Za-z]; '#tag'/'more....' do
    assert(nAlpha == 15L, s"n_alpha_words: $nAlpha")
    assert(nStop == 4L, s"stops (The, with, with, and): $nStop")
    assert(nLines == 5L, s"blank line must not count: $nLines")
    // 'more....' still ENDS with three dots -> ellipsis line
    assert(nBullet == 2L && nEllipsis == 3L, s"$nBullet/$nEllipsis")
    assert(nHash == 2L, s"hash chars: $nHash")
    assert(nMarks == 3L, s"ellipsis marks ('...', …, '....'): $nMarks")
    assert(lenSum == doc.replaceAll("[ \t\n\r]+", "").length,
      "word length sum == non-whitespace codepoints")
    // null passthrough
    val nul = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(VectorFunctions.gopherStats(col("text")).as("g"))
      .collect().head
    assert(nul.isNullAt(0))
  }

  test("HtmlToText expression == regexp_replace fold, row for row") {
    import graft.ops.Web
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val page = concat(
      lit("<html><head><script>if(x<2){s=\"</p>\"}</script><style>p{}" +
        "</style></head><body><!-- c <p>x</p> --><h1 id=\"t\">T</h1>\n<p>"),
      col("text"),
      lit(" &amp;amp; caf&#39;e &lt;b&gt;&nbsp;x caf&eacute; r&#8217;s" +
        " h&#x2019; A&mdash;B &bogus; &#1114112; &#xD800; &#x; &&amp;" +
        "</p><ul><li> a</li>" +
        "<li>b </li></ul><table><tr><td>c</td><td>d</td></tr></table>" +
        "<p>t <b>b</b>, <I>i</I> &amp; e</p></body></html>"))
    val diff = docs
      .select(Web.htmlToText(page).as("e"), Web.htmlToTextComposed(page).as("c"))
      .where(not(col("e") <=> col("c")))
    assert(diff.count() == 0, s"expression != fold: ${diff.take(1).toSeq}")
    // null passthrough matches the built-ins
    val nul = Seq(Tuple1(null.asInstanceOf[String])).toDF("h")
      .select(Web.htmlToText(col("h"))).collect().head
    assert(nul.isNullAt(0))
  }

  test("RegisteredDomain expression == chained-when fold, branch for branch") {
    import graft.ops.Web
    // every branch class: multi-label shared-hosting beats parent TLD,
    // ccTLD registrations, bare suffix passthrough, empty-label
    // no-match, fallback last-two-labels (incl. empty-label ""),
    // dotless passthrough, empty string, suffix-of-suffix hosts
    val hosts = Seq(
      "a.github.io", "x.y.github.io", "github.io", ".github.io",
      "www.example.co.uk", "co.uk", "example.co.uk", "b.co.uk",
      "example.com", "www.example.com", "a.b.internal", "localhost",
      "", "a..b", ".com", "x.co", "a.uk.co", "uk.co", "pages.dev",
      "sub.pages.dev", "weird-.chars_.com", "single.", ".leading",
      null.asInstanceOf[String])
    val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "host")
    val diff = df.select(col("id"), col("host"),
        Web.registeredDomain(col("host")).as("e"),
        Web.registeredDomainComposed(col("host")).as("c"))
      .where(not(col("e") <=> col("c")))
      .collect()
    assert(diff.isEmpty, s"expression != fold: ${diff.mkString(", ")}")
    // and over the q143 synthesis at fixture scale
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val host = Web.urlHost(graft.queries.Extensions.syntheticUrl(col("doc_id")))
    val diff2 = docs.select(Web.registeredDomain(host).as("e"),
        Web.registeredDomainComposed(host).as("c"))
      .where(not(col("e") <=> col("c"))).count()
    assert(diff2 == 0)
  }

  test("Paragraphs expression == split/transform/filter HOF, row for row") {
    import graft.ops.TextAnalysis
    // fixture docs with planted seams + hand edges
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(concat(col("text"),
        lit("\n\n  a b \nc\n\n\n \t\n\nd\n"), col("text")).as("t"))
    val diff = docs.select(
        TextAnalysis.paragraphsCol(col("t")).as("e"),
        TextAnalysis.paragraphsColComposed(col("t")).as("c"))
      .where(not(col("e") <=> col("c"))).count()
    assert(diff == 0)
    val edges = Seq("", "\n\n", "  \n\n \t ", "single", "a\nb", "\n\na\n\n",
      null.asInstanceOf[String]).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val diffE = edges.select(
        TextAnalysis.paragraphsCol(col("t")).as("e"),
        TextAnalysis.paragraphsColComposed(col("t")).as("c"))
      .where(not(col("e") <=> col("c"))).count()
    assert(diffE == 0)
  }

  test("custom expressions stay inside whole-stage codegen (no fallback)") {
    // Every Project line in the executed plan must carry the `*(n)` codegen
    // marker: a bare `Project` means some expression fell back to
    // interpreted eval (the round-2 state for WordShingles / SimHashBits /
    // WinnowFingerprints, fixed in round 4 via static-helper doGenCode).
    // spark.range, not toDF: a local Seq plans as LocalTableScan and the
    // projection is evaluated on the driver with no codegen stage at all
    val df = spark.range(8)
      .select(
        concat_ws(" ", lit("tok"), col("id").cast("string"), lit("b c d e f")).as("text"),
        array((1 to 8).map(i => col("id").cast("double") + i): _*).as("v"))
      .select(
        VectorFunctions.wordShingles(col("text"), 3).as("sh"),
        VectorFunctions.simHashBits(col("text"), 16).as("sim"),
        VectorFunctions.winnow(col("text"), 4, 8).as("win"),
        VectorFunctions.lshBucket(col("v"), 8, 4, 0).as("bk"),
        VectorFunctions.nearestCentroid(col("v"), Array.fill(3)(vec())).as("cell"),
        VectorFunctions.tokenStats(col("text")).as("ts"),
        VectorFunctions.gopherStats(col("text")).as("gs"),
        VectorFunctions.htmlToText(concat(lit("<p>"), col("text"),
          lit("</p>"))).as("ht"),
        VectorFunctions.registeredDomain(concat(substring(col("text"), 1, 3),
          lit(".example.co.uk"))).as("rd"),
        VectorFunctions.decodeCharset(col("text").cast("binary"),
          lit("text/html; charset=utf-8")).as("dc"),
        VectorFunctions.sniffCharset(col("text").cast("binary"),
          lit("text/html")).as("sc"),
        VectorFunctions.paragraphs(concat(col("text"), lit("\n\np2"))).as("pg"),
        VectorFunctions.tokenProfile(col("text"),
          Seq(Seq("tok", "b"), Seq("c"))).as("tp"),
        VectorFunctions.dot(col("v"), col("v")).as("d"),
        VectorFunctions.hashEmbed(col("text"), 16).as("he"),
        VectorFunctions.wordGramHashes(split(col("text"), " "), 3).as("gh"),
        VectorFunctions.pqAdcScore(
          VectorFunctions.pqEncode(col("v"), Array.fill(2)(Array.fill(3)(vec(4)))),
          Array.fill(2)(Array.fill(3)(0.5)), Array.fill(2)(Array.fill(3)(1.0)),
          1.0).as("pq"),
        VectorFunctions.pqAdcScoreBatch(
          VectorFunctions.pqEncode(col("v"), Array.fill(2)(Array.fill(3)(vec(4)))),
          VectorFunctions.pqQueryLut(col("v"), Array.fill(2)(Array.fill(3)(vec(4)))),
          lit(1.0), Array.fill(2)(Array.fill(3)(1.0))).as("pqb"),
        VectorFunctions.pqAdcResidualScore(
          VectorFunctions.pqEncode(
            VectorFunctions.centroidResidual(col("v"),
              (size(col("v")) % 2).cast("int"), Array.fill(2)(vec())),
            Array.fill(2)(Array.fill(3)(vec(4)))),
          (size(col("v")) % 2).cast("int"),
          VectorFunctions.pqResidualQueryLut(col("v"),
            Array.fill(2)(Array.fill(3)(vec(4))), Array.fill(2)(vec())),
          Array.fill(2)(Array.fill(3)(1.0)),
          Array.fill(2)(Array.fill(2)(Array.fill(3)(0.5))),
          Array.fill(2)(1.0)).as("pqr"))
    df.collect() // force execution so the plan is final
    val planStr = df.queryExecution.executedPlan.toString
    val projectLines = planStr.linesIterator.filter(_.contains("Project [")).toList
    assert(projectLines.nonEmpty, s"expected a Project in:\n$planStr")
    projectLines.foreach { line =>
      assert(line.contains("*("), s"Project fell out of whole-stage codegen:\n$line")
    }
  }

  test("HashEmbed == explode+groupBy bucket-count composition") {
    val docs = Seq(
      (1L, "a b a  c"),          // double space: empty token skipped
      (2L, "solo"),
      (3L, ""),                  // no tokens -> all-zero vector
      (4L, "x y z x y x")).toDF("doc_id", "text")
    val dim = 8
    val viaExpr = docs
      .select(col("doc_id"),
        posexplode(VectorFunctions.hashEmbed(col("text"), dim)).as(Seq("b", "c")))
      .where(col("c") > 0)
      .as[(Long, Int, Int)].collect().toSet
    val viaShuffle = docs
      .select(col("doc_id"), explode(expr(
        "filter(split(text, ' '), x -> x <> '')")).as("tk"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tk")), 1, 8), 16, 10).cast("long") % dim)
          .cast("int").as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).cast("int").as("c"))
      .as[(Long, Int, Int)].collect().toSet
    assert(viaExpr == viaShuffle)
    // dimension is the vector width even for empty docs
    val widths = docs.select(size(VectorFunctions.hashEmbed(col("text"), dim)))
      .as[Int].collect().toSet
    assert(widths == Set(dim))
  }

  test("TokenProfile == size/array_distinct/filter-HOF composition") {
    val lists = Seq(Seq("the", "and", "of"), Seq("le", "la"), Seq.empty[String])
    val texts = List.fill(60)(text()) ++
      List("", "the the the", "le of and la", "solo")
    val fast = texts.map(Tuple1(_)).toDF("t")
      .select(VectorFunctions.tokenProfile(col("t"), lists).as("p"))
      .select(col("p.n_tokens"), col("p.n_distinct"), col("p.hits"))
      .as[(Long, Long, Seq[Long])].collect()
    val ref = texts.map { txt =>
      val toks = txt.split(" ", -1)
      (toks.length.toLong, toks.distinct.length.toLong,
        lists.map(l => toks.count(l.contains).toLong))
    }
    fast.toSeq.zip(ref).zipWithIndex.foreach { case (((fn, fd, fh), (rn, rd, rh)), i) =>
      assert((fn, fd, fh.toSeq) == ((rn, rd, rh)), s"text='${texts(i)}'")
    }
  }

  test("TokenCountsExpr == size(split)/regexp_count composition (incl. unicode)") {
    val texts = List.fill(50)(text()) ++ List(
      "", " ", "  ", "abc123!?x", "中文 字符 mixed ascii42",
      "tabs\tand\nnewlines stay", "πρό σ2 ω!", "a+b=c (1,2) [x]",
      new String(Character.toChars(0x1F600)) + " emoji 42")
    val df = texts.map(Tuple1(_)).toDF("t")
    val fast = df.select(VectorFunctions.tokenCountsStruct(col("t")).as("c"))
      .select(col("c.ws_tokens"), col("c.bpe_tokens"))
      .as[(Long, Long)].collect()
    val ref = df.select(
        size(split(col("t"), " ")).cast("long"),
        regexp_count(col("t"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long"))
      .as[(Long, Long)].collect()
    fast.toSeq.zip(ref).zipWithIndex.foreach { case ((f, r), i) =>
      assert(f == r, s"text='${texts(i)}'")
    }
  }

  test("TokenEncodeExpr: column ids == driver encode; size == TokenCountExpr everywhere") {
    val bpe = TokenCounters.tinyBpe
    val texts = List.fill(50)(text()) ++ List(
      "", " ", "  ", "table data str line", "tabletable struggle",
      "中文 table 字符", "πρό tabl ω!",
      new String(Character.toChars(0x1F600)) + " table 42")
    val df = texts.map(Tuple1(_)).toDF("t")
    val got = df.select(TokenCounters.encode(bpe, col("t")).as("ids"),
        TokenCounters.count(bpe, col("t")).as("n"))
      .collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[Int](0) == bpe.encodeTokens(texts(i)).toSeq,
        s"text='${texts(i)}'")
      assert(r.getSeq[Int](0).length.toLong == r.getLong(1),
        s"count/encode contract broken on '${texts(i)}'")
      // id-space partition: every id is a valid code point OR a merged id
      r.getSeq[Int](0).foreach(id => assert(
        (id >= 0 && id <= Character.MAX_CODE_POINT) ||
          (id >= BpeTokenCounter.MergedIdBase &&
            id < BpeTokenCounter.MergedIdBase + TokenCounters.tinyMerges.size),
        s"id $id outside the documented id space"))
    }
  }

  test("NgramRepetition == per-row multiplicity profile (incl. short docs)") {
    val texts = List.fill(60)(text()) ++ List("", "solo", "a a a a a", "x y x y x y")
    Seq(1, 2, 3).foreach { n =>
      val fast = texts.map(Tuple1(_)).toDF("t")
        .select(VectorFunctions.ngramRep(col("t"), n).as("r"))
        .select(col("r.total"), col("r.n_distinct"), col("r.max_count"))
        .as[(Long, Long, Long)].collect()
      val ref = texts.map { txt =>
        val toks = txt.split(" ", -1)
        val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        if (toks.length < n) (0L, 0L, 0L)
        else {
          val counts = grams.groupBy(identity).map(_._2.length)
          (grams.length.toLong, counts.size.toLong, counts.max.toLong)
        }
      }
      fast.toSeq.zip(ref).zipWithIndex.foreach { case ((f, r), i) =>
        assert(f == r, s"n=$n text='${texts(i)}'")
      }
    }
  }

  test("BloomMightContain: no false negatives, codegen'd filter, low fpp") {
    val members = (0 until 2000).map(i => s"member_$i")
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(2000, 0.01)
    members.foreach(bloom.putString)
    // every inserted element must pass (Bloom contract: zero false negatives)
    val kept = members.map(Tuple1(_)).toDF("s")
      .where(VectorFunctions.bloomMightContain(col("s"), bloom))
      .count()
    assert(kept == 2000, "a Bloom filter may never drop a true member")
    // non-members are mostly rejected (fpp 1% — allow generous slack)
    val strangers = (0 until 2000).map(i => s"stranger_$i")
    val leaked = strangers.map(Tuple1(_)).toDF("s")
      .where(VectorFunctions.bloomMightContain(col("s"), bloom))
      .count()
    assert(leaked < 200, s"false-positive rate far above fpp: $leaked/2000")
    // the probe stays inside whole-stage codegen (reference-object probe,
    // same pattern as NearestCentroid)
    val df = spark.range(64)
      .select(concat_ws("_", lit("member"), col("id")).as("s"))
      .select(VectorFunctions.bloomMightContain(col("s"), bloom).as("m"),
        VectorFunctions.ngramRep(col("s"), 2).as("nr"))
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    val projectLines = planStr.linesIterator.filter(_.contains("Project [")).toList
    assert(projectLines.nonEmpty)
    projectLines.foreach { line =>
      assert(line.contains("*("), s"Project fell out of whole-stage codegen:\n$line")
    }
  }

  test("NearestCentroids == per-row top-k argsort; head agrees with NearestCentroid") {
    val centroids = Array.fill(6)(vec())
    val vecs = List.fill(40)(vec())
    val fast = vecs.map(Tuple1(_)).toDF("v").select(
        VectorFunctions.nearestCentroids(col("v"), centroids, 3).as("p"),
        VectorFunctions.nearestCentroid(col("v"), centroids).as("c"))
      .as[(Seq[Int], Int)].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (d == 0) 0.0 else dot / d
    }
    vecs.zip(fast).foreach { case (v, (probes, top1)) =>
      val ref = centroids.zipWithIndex
        .map { case (c, i) => (i, cos(v, c)) }
        .sortBy { case (i, s) => (-s, i) }.take(3).map(_._1).toSeq
      assert(probes == ref, s"probe order mismatch for $v")
      assert(probes.head == top1, "first probe must be the argmax cell")
    }
  }

  test("NearestCentroid == per-row argmax over the centroid table") {
    val centroids = Array.fill(4)(vec())
    val vecs = List.fill(40)(vec())
    val fast = vecs.map(Tuple1(_)).toDF("v").select(
      VectorFunctions.nearestCentroid(col("v"), centroids).as("c"))
      .as[Int].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (d == 0) 0.0 else dot / d
    }
    val ref = vecs.map { v =>
      centroids.zipWithIndex.map { case (c, i) => (i, cos(v, c)) }
        .maxBy { case (i, s) => (s, -i) }._1
    }
    assert(fast.toSeq == ref)
  }
}
