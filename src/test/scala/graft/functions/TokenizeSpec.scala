package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The tokenizer SPI (q52b/q58b): the whitespace default's field
  * contract, the greedy-BPE counter's pinned merge semantics (leftmost
  * lowest-rank, deep chains, rank priority), SPI resolution, and the
  * column path's null handling + codegen residency.
  */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val bpe = TokenCounters.tinyBpe

  test("whitespace counter matches the split(' ') field contract") {
    assert(WhitespaceTokenCounter.countTokens("a b c") == 3L)
    assert(WhitespaceTokenCounter.countTokens("") == 1L)       // one empty field
    assert(WhitespaceTokenCounter.countTokens("  a  ") == 5L)  // empties count
    assert(WhitespaceTokenCounter.countTokens("a\tb") == 1L)   // only ' ' splits
  }

  test("greedy BPE: four-deep chain collapses 'table' to one token") {
    assert(bpe.countTokens("table") == 1L)
    assert(bpe.countTokens("row") == 1L) // o+w then r+ow
  }

  test("greedy BPE: rank priority — 't a' (rank 0) beats 'a t' inside 'data'") {
    // d-a-t-a: (t,a) merges first → d,a,ta → no more rules → 3
    assert(bpe.countTokens("data") == 3L)
    // b-a-t-c-h: only (a,t) applies → b,at,c,h → 4
    assert(bpe.countTokens("batch") == 4L)
  }

  test("greedy BPE: multi-char symbols on both sides ('st r', 'e a')") {
    // s-t-r-e-a-m → st,r,e,a,m → str,e,a,m → str,ea,m
    assert(bpe.countTokens("stream") == 3L)
  }

  test("greedy BPE: repeated-character pair and unknown characters") {
    assert(bpe.countTokens("agg") == 2L)   // a + gg
    assert(bpe.countTokens("zzz") == 3L)   // no rules apply
    assert(bpe.countTokens("x") == 1L)
  }

  test("greedy BPE: document count sums pre-token occurrences; empties drop") {
    assert(bpe.countTokens("table table") == 2L)
    assert(bpe.countTokens("  table   row ") == 2L)
    assert(bpe.countTokens("") == 0L)
    assert(bpe.countTokens("   ") == 0L)
  }

  test("SPI resolution: built-ins by name, unknown names fail loudly") {
    assert(TokenCounters.forName("whitespace") eq TokenCounters.whitespace)
    assert(TokenCounters.forName("bpe") == TokenCounters.tinyBpe)
    val e = intercept[IllegalArgumentException](TokenCounters.forName("nope"))
    assert(e.getMessage.contains("unknown tokenizer"))
  }

  test("bpe:<path> loads a standard merges.txt; counts match the same table in code") {
    val dir = tmpDir("graft_merges_")
    val path = s"$dir/merges.txt"
    // the interchange format a subword toolkit ships: optional #version
    // header, one 'left right' pair per line, file order = priority
    val body = "#version: 0.2\n" +
      TokenCounters.tinyMerges.map { case (l, r) => s"$l $r" }.mkString("\n") +
      "\n\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      body.getBytes("UTF-8"))
    val fromFile = TokenCounters.forName(s"bpe:$path")
    assert(fromFile == TokenCounters.tinyBpe,
      "a file round-trip of the pinned table must resolve to an equal counter")
    Seq("table stream data egg", "", "  spaced  out  ").foreach { t =>
      assert(fromFile.countTokens(t) == bpe.countTokens(t), s"text '$t'")
    }
    // the loaded table drives the COLUMN path too (q52b/q58b's shape)
    val got = Seq((1L, "table data"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select($"id", TokenCounters.count(fromFile, $"text").as("n"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(bpe.countTokens("table data")) && got(2L).isEmpty)
    // malformed lines fail fast — a silently dropped merge would
    // desynchronize the count from the vocabulary that produced the file
    val bad = s"$dir/bad.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      "t a\nbroken-line-without-space\n".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](TokenCounters.forName(s"bpe:$bad"))
    assert(e2.getMessage.contains("malformed merges line 2"))
    val empty = s"$dir/empty.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(empty),
      "#version: 0.2\n\n".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException](
      TokenCounters.forName(s"bpe:$empty")).getMessage.contains("no merges"))
  }

  test("column path: null text → null count, non-null counts match eval") {
    val df = Seq((1L, "table row"), (2L, null), (3L, ""))
      .toDF("id", "text")
      .select(col("id"),
        TokenCounters.count(bpe, col("text")).as("n"),
        TokenCounters.count(TokenCounters.whitespace, col("text")).as("ws"))
      .orderBy("id")
    val rows = df.collect()
    assert(rows(0).getLong(1) == 2L && rows(0).getLong(2) == 2L)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(2).getLong(1) == 0L && rows(2).getLong(2) == 1L)
  }

  test("column path stays inside whole-stage codegen (no UDF boundary)") {
    // a parquet scan, so ConvertToLocalRelation can't fold the projection
    val dir = tmpDir("graft_tok_")
    Seq("table").toDF("text").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(TokenCounters.count(bpe, col("text")).as("n"))
    val hasWsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWsc, df.queryExecution.executedPlan.toString)
    // and the generated code actually compiles/runs
    assert(df.head().getLong(0) == 1L)
  }

  test("whitespace column path equals the tokenCountsStruct ws leg") {
    val texts = Seq("a b", "", "  x ", "one two three four").toDF("text")
    val both = texts.select(
      TokenCounters.count(TokenCounters.whitespace, col("text")).as("spi"),
      VectorFunctions.tokenCountsStruct(col("text")).getField("ws_tokens").as("ws"))
    assert(both.where(col("spi") =!= col("ws")).count() == 0L)
  }

  // ─── TokenEncoder: id materialization ──────────────────────────────

  test("encodeTokens: ids follow the code-point / merged-rank rule") {
    // "table" → one merged token from the rank-3 chain end ('tabl e')
    assert(bpe.encodeTokens("table").toSeq ==
      Seq(BpeTokenCounter.MergedIdBase + 3))
    // "data" → d, a, ta: code points for singles, rank 0 for 'ta'
    assert(bpe.encodeTokens("data").toSeq ==
      Seq('d'.toInt, 'a'.toInt, BpeTokenCounter.MergedIdBase + 0))
    // unknown characters stay code points; empty text → empty array
    assert(bpe.encodeTokens("x").toSeq == Seq('x'.toInt))
    assert(bpe.encodeTokens("").isEmpty)
    assert(bpe.encodeTokens("   ").isEmpty)
  }

  test("encodeTokens length equals countTokens for every input (the SPI contract)") {
    val texts = Seq("table row", "data str line", "", "  a  ", "q u e r y",
      "struggle strength mismatch", "tabletable", "été café")
    texts.foreach { t =>
      assert(bpe.encodeTokens(t).length.toLong == bpe.countTokens(t),
        s"count/encode disagree on '$t'")
    }
  }

  test("merged ids can never collide with code-point ids") {
    assert(BpeTokenCounter.MergedIdBase > Character.MAX_CODE_POINT)
    // duplicate merge products take the FIRST producing rank: 't ab'
    // (rank 1) and 'ta b' (rank 2) both concatenate to 'tab', so 'tab'
    // gets rank 1's id no matter which rule created it
    val dup = BpeTokenCounter(Seq("a" -> "b", "t" -> "ab", "ta" -> "b"))
    assert(dup.encodeTokens("tab").toSeq ==
      Seq(BpeTokenCounter.MergedIdBase + 1))
  }

  test("heap walk matches the rescan-reference walk on random tables and texts") {
    // reference: the original O(n²) string algorithm — rescan for the
    // leftmost lowest-rank adjacent pair, merge, repeat; emit the
    // first-producing-rank id for merged symbols, the code point for
    // singles. The production walk (id-tracked, heap-ordered) must be
    // indistinguishable on every input.
    def reference(merges: Seq[(String, String)], text: String): Seq[Int] = {
      val ranks = merges.zipWithIndex
        .foldLeft(Map.empty[String, Int]) { case (m, ((l, r), i)) =>
          m.updated(l + " " + r, i) // put-overwrite: later duplicate wins
        }
      val symIds = merges.zipWithIndex
        .foldLeft(Map.empty[String, Int]) { case (m, ((l, r), i)) =>
          if (m.contains(l + r)) m
          else m.updated(l + r, BpeTokenCounter.MergedIdBase + i)
        }
      text.split(" ").filter(_.nonEmpty).toSeq.flatMap { word =>
        var syms = word.codePoints().toArray.toSeq
          .map(cp => new String(Character.toChars(cp)))
        var done = false
        while (!done && syms.size > 1) {
          val best = syms.zip(syms.tail).zipWithIndex
            .flatMap { case ((a, b), i) => ranks.get(a + " " + b).map(r => (r, i)) }
            .sorted.headOption
          best match {
            case None => done = true
            case Some((_, i)) =>
              syms = syms.patch(i, Seq(syms(i) + syms(i + 1)), 2)
          }
        }
        syms.map(s => symIds.getOrElse(s, s.codePointAt(0)))
      }
    }
    val rng = new scala.util.Random(4242)
    val alphabet = "abcdet éφ𝄞"  // includes a space, accents, a surrogate pair
    def randWord(): String =
      (1 to (1 + rng.nextInt(12))).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    for (trial <- 1 to 60) {
      val pieces = Seq("a", "b", "c", "d", "e", "t", "é", "ab", "bc", "ta",
        "abc", "φ", "𝄞")
      val table = (1 to (1 + rng.nextInt(14))).map { _ =>
        pieces(rng.nextInt(pieces.size)) -> pieces(rng.nextInt(pieces.size))
      }
      val bpe2 = BpeTokenCounter(table)
      val text = (1 to (1 + rng.nextInt(8))).map(_ => randWord()).mkString(" ")
      val want = reference(table, text)
      val got = bpe2.encodeTokens(text).toSeq
      assert(got == want, s"trial $trial: table $table text '$text'")
      assert(bpe2.countTokens(text) == want.size.toLong, s"count, trial $trial")
    }
    // the pinned table over longer mixed text, against the same reference
    val longText = "the stream strains tabletable data struggle batch " +
      "query inline growth éé 𝄞𝄞 agg eggs matter"
    assert(bpe.encodeTokens(longText).toSeq == reference(TokenCounters.tinyMerges, longText))
  }

  test("encoderForName: bpe resolves, count-only tokenizers fail loudly") {
    assert(TokenCounters.encoderForName("bpe").isInstanceOf[BpeTokenCounter])
    val e = intercept[IllegalArgumentException](
      TokenCounters.encoderForName("whitespace"))
    assert(e.getMessage.contains("cannot emit ids"))
  }

  test("encode column path: null → null array, codegen residency, eval parity") {
    val dir = tmpDir("graft_tokenc_")
    Seq((1L, "table data"), (2L, null), (3L, ""))
      .toDF("id", "text").write.mode("overwrite").parquet(dir)
    val proj = spark.read.parquet(dir)
      .select(col("id"), TokenCounters.encode(bpe, col("text")).as("ids"))
    // codegen residency on the bare projection (an orderBy wraps the
    // plan in an unfinalized AQE node that hides the codegen span)
    val hasWsc = proj.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWsc, proj.queryExecution.executedPlan.toString)
    val rows = proj.orderBy("id").collect()
    assert(rows(0).getSeq[Int](1) == bpe.encodeTokens("table data").toSeq)
    assert(rows(1).isNullAt(1))
    assert(rows(2).getSeq[Int](1).isEmpty)
  }
}
