package graft.functions

import graft.SparkSpec
import graft.runner.{TaskLog, TaskRunner}
import java.nio.file.{Files, Paths}

/** The extension expressions must be first-class on the SQL surface — the
  * reference's primary interface is SQL pushed to the backing engine, so a
  * task's source SQL has to be able to call graft_* like any built-in.
  */
class SqlRegistrySpec extends SparkSpec {

  VectorFunctions.registerSql(spark)

  test("graft_* functions callable from SQL, agreeing with the typed API") {
    val row = spark.sql(
      """SELECT
        |  graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
        |  graft_word_shingles('a b c d', 3) AS sh,
        |  graft_simhash('hello world hello', 16) AS sim,
        |  graft_lsh_bucket(array(1.0d, -2.0d, 0.5d, 3.0d), 4, 4) AS bk,
        |  graft_winnow('abcdefghij', 4, 8) AS win
        |""".stripMargin).head()
    assert(row.getDouble(0) == 32.0)
    assert(row.getSeq[String](1) == Seq("a b c", "b c d"))

    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val typed = Seq(("hello world hello", "abcdefghij"))
      .toDF("t", "g")
      .select(
        VectorFunctions.simHashBits(col("t"), 16).as("sim"),
        VectorFunctions.lshBucket(
          org.apache.spark.sql.functions.array(lit(1.0), lit(-2.0), lit(0.5), lit(3.0)),
          4, 4).as("bk"),
        VectorFunctions.winnow(col("g"), 4, 8).as("win"))
      .head()
    assert(row.getString(2) == typed.getString(0))
    assert(row.getString(3) == typed.getString(1))
    assert(row.getSeq[String](4) == typed.getSeq[String](2))
  }

  test("graft_tokens: tokenizer SPI on the SQL surface, literal-name contract") {
    val row = spark.sql(
      """SELECT graft_tokens('table row zzz', 'bpe') AS b,
        |       graft_tokens('table row zzz', 'whitespace') AS w
        |""".stripMargin).head()
    assert(row.getLong(0) == 5L) // 1 + 1 + 3
    assert(row.getLong(1) == 3L)
    val e = intercept[Exception](
      spark.sql("SELECT graft_tokens('x', 'nope')").head())
    assert(e.getMessage.contains("unknown tokenizer"))
  }

  test("graft_token_ids: id materialization on the SQL surface; count-only tokenizers rejected") {
    val row = spark.sql(
      "SELECT graft_token_ids('table data', 'bpe') AS ids").head()
    assert(row.getSeq[Int](0) ==
      TokenCounters.tinyBpe.encodeTokens("table data").toSeq)
    // ids agree with the count on the same surface
    val both = spark.sql(
      """SELECT size(graft_token_ids(text, 'bpe')) AS n1,
        |       graft_tokens(text, 'bpe') AS n2
        |FROM VALUES ('table row'), (''), ('q u e r y') AS t(text)""".stripMargin)
      .collect()
    both.foreach(r => assert(r.getInt(0).toLong == r.getLong(1)))
    val e = intercept[Exception](
      spark.sql("SELECT graft_token_ids('x', 'whitespace')").head())
    assert(e.getMessage.contains("cannot emit ids"))
  }

  test("implicit casts admit float embeddings and non-double literals") {
    // embeddings tables carry array<float>; SQL callers must not need a
    // hand-written cast for every argument
    val d = spark.sql(
      "SELECT graft_dot(cast(array(1, 2) AS array<float>), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(d == 11.0)
  }

  test("shape arguments must be integer literals, with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_simhash('x', 'not-an-int')").head()
    }
    assert(e.getMessage.contains("integer literal"),
      s"unexpected error: ${e.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0d))").head()
    }
    assert(e2.getMessage.contains("2 arguments"), s"unexpected error: ${e2.getMessage}")
  }

  test("shape arguments are range-validated at analysis time, not per-row") {
    // each of these would otherwise fail (or silently return nothing) deep
    // inside the executor loop — e.g. simhash bits=200 indexes past the md5
    // digest per row
    val bad = Seq(
      "SELECT graft_simhash('x', 200)",
      "SELECT graft_simhash('x', 0)",
      "SELECT graft_word_shingles('a b', 0)",
      "SELECT graft_lsh_bucket(array(1.0d), 0, 4)",
      "SELECT graft_lsh_bucket(array(1.0d), 1, 31)",
      "SELECT graft_lsh_bucket(array(1.0d), 1, 4, -1)",
      "SELECT graft_winnow('abc', 0, 4)",
      "SELECT graft_winnow('abc', 5, 4)")
    bad.foreach { sql =>
      val e = intercept[Exception] { spark.sql(sql).head() }
      assert(e.getMessage.contains("must be in ["),
        s"$sql: expected an analysis-time range error, got ${e.getMessage}")
    }
    // boundary values stay legal
    assert(spark.sql("SELECT graft_simhash('x', 32)").head().getString(0).length == 32)
    assert(spark.sql("SELECT graft_winnow('abcdef', 4, 4)").head().getSeq[String](0).nonEmpty)
  }

  test("graft_vector_mean UDAF: matches explode-mean, callable from SQL group-by") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = List.fill(60)((rng.nextInt(4), Seq.fill(6)(rng.nextDouble() * 10 - 5)))
    val df = rows.toDF("g", "v")
    val fast = df.groupBy(col("g"))
      .agg(VectorFunctions.vectorMean(col("v")).as("m"))
      .as[(Int, Seq[Double])].collect().toMap
    val ref = rows.groupBy(_._1).map { case (g, vs) =>
      val n = vs.size
      g -> (0 until 6).map(i => vs.map(_._2(i)).sum / n)
    }
    ref.foreach { case (g, m) =>
      fast(g).zip(m).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"group $g") }
    }
    // SQL path through the registry
    df.createOrReplaceTempView("vm_in")
    val viaSql = spark.sql(
      "SELECT g, graft_vector_mean(v) AS m FROM vm_in GROUP BY g")
      .as[(Int, Seq[Double])].collect().toMap
    assert(viaSql.keySet == fast.keySet)
    viaSql.foreach { case (g, m) =>
      fast(g).zip(m).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("graft_token_profile from SQL: built-in lists + custom array, agreeing with typed API") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq((1, "the cat and the dog"), (2, "der hund und die katze"), (3, "xyzzy"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("tp_docs")
    // built-in list names — the q33 multi-language one-pass shape
    val viaSql = spark.sql(
      """SELECT doc_id, graft_token_profile(text, 'de', 'en') AS p
        |FROM tp_docs ORDER BY doc_id""".stripMargin).collect()
    val typed = docs
      .select(col("doc_id"), VectorFunctions.tokenProfile(col("text"),
        Seq(graft.ops.TextAnalysis.stopwords("de"),
          graft.ops.TextAnalysis.stopwords("en"))).as("p"))
      .orderBy("doc_id").collect()
    assert(viaSql.map(_.toString).toSeq == typed.map(_.toString).toSeq)
    // custom array('w1','w2',...) list
    val custom = spark.sql(
      "SELECT graft_token_profile('aa bb aa cc', array('aa', 'cc')).hits AS h").head()
    assert(custom.getSeq[Long](0) == Seq(3L))
  }

  test("graft_quantize_int8 from SQL: scale and byte values, arity validated") {
    val r = spark.sql(
      "SELECT graft_quantize_int8(array(2.0d, -1.0d, 0.5d)) AS z").head().getStruct(0)
    assert(r.getDouble(0) == 2.0, "scale must be max |x|")
    assert(r.getSeq[Byte](1) == Seq[Byte](127, -63, 32),
      s"floor(x*127/scale + 0.5): got ${r.getSeq[Byte](1)}")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_quantize_int8(array(1.0d), 2)").head()
    }
    assert(e.getMessage.contains("1 arguments"), s"unexpected error: ${e.getMessage}")
  }

  test("graft_hash_embed from SQL: typed-API agreement, dim validated") {
    val viaSql = spark.sql(
      "SELECT graft_hash_embed('a b a', 8) AS v").head().getSeq[Int](0)
    val viaApi = {
      import spark.implicits._
      Seq("a b a").toDF("t")
        .select(VectorFunctions.hashEmbed(
          org.apache.spark.sql.functions.col("t"), 8))
        .head().getSeq[Int](0)
    }
    assert(viaSql == viaApi)
    assert(viaSql.sum == 3, "multiplicity counts: 3 tokens")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hash_embed('x', 0)").head()
    }
    assert(e.getMessage.contains("dim"), s"unexpected error: ${e.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_hash_embed('x', y) FROM (SELECT 5 AS y)")
    }
    assert(e2.getMessage.toLowerCase.contains("literal")
      || e2.getMessage.contains("integer"),
      s"unexpected error: ${e2.getMessage}")
  }

  test("graft_token_profile list arguments validated at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_token_profile('x', 'klingon')").head()
    }
    assert(e.getMessage.contains("unknown stopword list"),
      s"unexpected error: ${e.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_token_profile('x')").head()
    }
    assert(e2.getMessage.contains("at least 2"), s"unexpected error: ${e2.getMessage}")
    val e3 = intercept[Exception] {
      spark.sql("SELECT graft_token_profile('x', 42)").head()
    }
    assert(e3.getMessage.contains("string literal"), s"unexpected error: ${e3.getMessage}")
  }

  test("db-csv task: pushed SQL reproduces q34's one-pass quality form via graft_token_profile") {
    val wd = tmpDir("graft_sqlreg_tp_")
    Seq("input", "output", "log").foreach(d => Files.createDirectories(Paths.get(s"$wd/$d")))
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW tp_task_docs AS
        |SELECT * FROM VALUES
        |  (1, 'the quick brown fox jumps over the lazy dog and runs'),
        |  (2, 'aa aa aa aa'),
        |  (3, 'one of the best ways to learn is to teach it')
        |AS t(doc_id, text)
        |""".stripMargin)
    val taskFile = s"$wd/task.json"
    // the q34 projection, expressed entirely in pushed SQL over the
    // one-pass profile struct (reference surface: task source = engine SQL)
    Files.writeString(Paths.get(taskFile),
      """{"connections": [{"name": "cat", "driver": "Spark"}],
        | "tasks": [{
        |  "type": "db-csv", "name": "quality",
        |  "source": {"connection": "cat",
        |             "command": "SELECT doc_id, p.n_tokens AS n_tokens, round(0.4 * least(1.0, p.n_tokens / 25.0) + 0.4 * (cast(p.n_distinct AS double) / p.n_tokens) + 0.2 * (cast(p.hits[0] AS double) / p.n_tokens), 4) AS quality FROM (SELECT doc_id, graft_token_profile(text, 'en') AS p FROM tp_task_docs) ORDER BY doc_id"},
        |  "target": {"file": "quality.csv", "truncate": true, "delimiter": ","}
        |}]}""".stripMargin)
    TaskRunner.runFile(taskFile, spark, wd, TaskLog.Silent)
    val lines = Files.readString(Paths.get(s"$wd/output/quality.csv"))
      .trim.linesIterator.toList
    assert(lines.head == "doc_id,n_tokens,quality")
    // oracle: the typed q34 operator on the same rows
    val expected = graft.ops.TextAnalysis
      .qualityScore(spark.table("tp_task_docs"), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => s"${r.get(0)},${r.get(1)},${r.get(2)}")
    assert(lines.tail == expected.toList)
  }

  test("db-csv task: the FULL q74 cleaning pass composed in pushed SQL (query file + params)") {
    val wd = tmpDir("graft_sqlreg_clean_")
    Seq("input", "output", "log").foreach(d => Files.createDirectories(Paths.get(s"$wd/$d")))
    // planted corpus: 1≡2 exact dups (min-id rep keeps 1), 3 junk quality,
    // 4 clean — so every screen decides at least one row
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW clean_docs AS
        |SELECT * FROM VALUES
        |  (1, 'the quick brown fox jumps over the lazy dog and runs far away from home today'),
        |  (2, 'the quick brown fox jumps over the lazy dog and runs far away from home today'),
        |  (3, 'aa aa aa aa'),
        |  (4, 'one of the best ways to learn something new is to teach it to a friend')
        |AS t(doc_id, text)
        |""".stripMargin)
    // the whole q74 keep-table — exact-dedup representative, span
    // pressure, quality floor, conjunction — as ONE SQL statement pushed
    // through the internal connection (reference surface: task source =
    // engine SQL), with the quality floor as a {param}
    Files.writeString(Paths.get(s"$wd/input/clean.sql"),
      """WITH d AS (SELECT doc_id, text FROM clean_docs WHERE text IS NOT NULL),
        |reps AS (SELECT min(doc_id) AS doc_id FROM d GROUP BY md5(text)),
        |wc AS (SELECT doc_id, count(*) OVER (PARTITION BY fp) AS dfc
        |       FROM (SELECT doc_id, explode(graft_winnow(text, 8, 16)) AS fp FROM d)),
        |spanf AS (SELECT doc_id,
        |            CASE WHEN sum(CASE WHEN dfc >= 2 THEN 1 ELSE 0 END) / count(*) < 0.5
        |                 THEN 1 ELSE 0 END AS keep_span
        |          FROM wc GROUP BY doc_id),
        |qual AS (SELECT doc_id,
        |           CASE WHEN round(0.4 * least(1.0, p.n_tokens / 25.0)
        |                        + 0.4 * (cast(p.n_distinct AS double) / p.n_tokens)
        |                        + 0.2 * (cast(p.hits[0] AS double) / p.n_tokens), 4)
        |                     >= {min_quality}
        |                THEN 1 ELSE 0 END AS keep_quality
        |         FROM (SELECT doc_id, graft_token_profile(text, 'en') AS p FROM d))
        |SELECT d.doc_id,
        |  CAST(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS keep_exact,
        |  CAST(COALESCE(f.keep_span, 1) AS BIGINT) AS keep_span,
        |  CAST(COALESCE(q.keep_quality, 0) AS BIGINT) AS keep_quality,
        |  CAST(CASE WHEN r.doc_id IS NOT NULL AND COALESCE(f.keep_span, 1) = 1
        |            AND COALESCE(q.keep_quality, 0) = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM d
        |LEFT JOIN reps r ON r.doc_id = d.doc_id
        |LEFT JOIN spanf f ON f.doc_id = d.doc_id
        |LEFT JOIN qual q ON q.doc_id = d.doc_id
        |ORDER BY d.doc_id;
        |""".stripMargin)
    val taskFile = s"$wd/task.json"
    Files.writeString(Paths.get(taskFile),
      s"""{"connections": [{"name": "cat", "driver": "Spark"}],
         | "tasks": [{
         |  "type": "db-csv", "name": "clean",
         |  "source": {"connection": "cat", "query": "clean.sql",
         |             "path": "$wd/input",
         |             "params": {"min_quality": "0.5"}},
         |  "target": {"file": "clean.csv", "truncate": true, "delimiter": ","}
         |}]}""".stripMargin)
    TaskRunner.runFile(taskFile, spark, wd, TaskLog.Silent)
    val lines = Files.readString(Paths.get(s"$wd/output/clean.csv"))
      .trim.linesIterator.toList
    assert(lines.head == "doc_id,keep_exact,keep_span,keep_quality,keep")
    // oracle: the typed q74 composition (the exact operators the
    // standalone queries check) over the same view
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    val docs = spark.table("clean_docs").where(col("text").isNotNull)
    val reps = graft.ops.Dedup.exact(docs, "doc_id", "text")
      .select(col("doc_id"), lit(1L).as("keep_exact"))
    val span = graft.ops.Dedup.dupSpanFrac(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep").as("keep_span"))
    val qual = graft.ops.TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"),
        when(col("quality") >= 0.5, 1L).otherwise(0L).as("keep_quality"))
    val expected = docs.select(col("doc_id"))
      .join(reps, Seq("doc_id"), "left")
      .join(span, Seq("doc_id"), "left")
      .join(qual, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("keep_exact"), lit(0L)).as("keep_exact"),
        coalesce(col("keep_span"), lit(1L)).as("keep_span"),
        coalesce(col("keep_quality"), lit(0L)).as("keep_quality"))
      .withColumn("keep",
        (col("keep_exact") === 1 && col("keep_span") === 1 &&
          col("keep_quality") === 1).cast("long"))
      .orderBy(col("doc_id")).collect()
      .map(r => (0 until 5).map(r.get).mkString(","))
    assert(lines.tail == expected.toList,
      s"pushed-SQL cleaning pass must match the typed q74 composition:\n${lines.tail}\nvs\n${expected.toList}")
    // every screen actually fired: doc 1 is the exact-rep (keep_exact 1)
    // but, being a FULL copy, fails the span screen like its twin (both
    // span-drop — q74 semantics); doc 2 additionally loses rep status;
    // doc 3 drops on quality; doc 4 passes all three
    val rows = lines.tail.map(_.split(",").map(_.toLong))
      .map(a => a(0) -> (a(1), a(2), a(3), a(4))).toMap
    assert(rows(1L) == ((1L, 0L, 1L, 0L)), s"doc 1: ${rows(1L)}")
    assert(rows(2L) == ((0L, 0L, 1L, 0L)), s"doc 2: ${rows(2L)}")
    assert(rows(3L)._3 == 0L && rows(3L)._4 == 0L, s"doc 3: ${rows(3L)}")
    assert(rows(4L) == ((1L, 1L, 1L, 1L)), s"doc 4: ${rows(4L)}")
  }

  test("db-csv task: internal-catalog source SQL calls extension functions") {
    val wd = tmpDir("graft_sqlreg_")
    Seq("input", "output", "log").foreach(d => Files.createDirectories(Paths.get(s"$wd/$d")))
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW sqlreg_docs AS
        |SELECT * FROM VALUES (1, 'aa bb aa'), (2, 'cc dd') AS t(doc_id, text)
        |""".stripMargin)
    val taskFile = s"$wd/task.json"
    Files.writeString(Paths.get(taskFile),
      """{"connections": [{"name": "cat", "driver": "Spark"}],
        | "tasks": [{
        |  "type": "db-csv", "name": "fp",
        |  "source": {"connection": "cat",
        |             "command": "SELECT doc_id, graft_simhash(text, 8) AS sh FROM sqlreg_docs ORDER BY doc_id"},
        |  "target": {"file": "fp.csv", "truncate": true, "delimiter": ","}
        |}]}""".stripMargin)
    TaskRunner.runFile(taskFile, spark, wd, TaskLog.Silent)
    val out = Files.readString(Paths.get(s"$wd/output/fp.csv"))
    val lines = out.trim.linesIterator.toList
    assert(lines.head == "doc_id,sh")
    assert(lines.size == 3)
    // fingerprints match the typed API exactly
    import org.apache.spark.sql.functions.col
    val expected = spark.table("sqlreg_docs")
      .select(col("doc_id"), VectorFunctions.simHashBits(col("text"), 8).as("sh"))
      .orderBy("doc_id")
      .collect()
      .map(r => s"${r.get(0)},${r.getString(1)}")
    assert(lines.tail == expected.toList)
  }
}
