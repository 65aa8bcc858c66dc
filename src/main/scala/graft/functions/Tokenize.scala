package graft.functions

import org.apache.spark.sql.Column

/** Pluggable token-counting SPI for the budget-driven operators (packing
  * q52, token-budget sampling q58, training-order shuffling q92, the
  * `pack`/`sample` task types).
  *
  * Those operators take token counts as an INPUT column precisely so the
  * counting rule is swappable — a whitespace count undercounts any real
  * BPE vocabulary's budget (reference analog: dasladen delegates row
  * shaping to pluggable petl lambdas, `task.py:264-276`; the counting
  * rule here is the same kind of user-owned hook). Implementations are
  * discovered three ways, mirroring the module-transform SPI
  * (graft.transform.ModuleClasspath):
  *
  *  1. built-ins by name — `whitespace` (the q52/q58 default contract)
  *    and `bpe` (the pinned [[TokenCounters.tinyBpe]] merges table);
  *  2. `java.util.ServiceLoader` over `graft.functions.TokenCounter`
  *    (drop a provider jar on the module classpath);
  *  3. programmatically — any [[TokenCounter]] passed to
  *    [[TokenCounters.count]].
  *
  * Column evaluation goes through one codegen'd Catalyst expression
  * (`TokenCountExpr`) that ships the counter to executors as a plan
  * reference object — counting stays inside whole-stage codegen for ANY
  * SPI implementation, never a Scala UDF (SURVEY.md §4.2 preference
  * order). At 100 TB the count is a pure map-side pass: no shuffle, no
  * token array materialized, O(word length × merge table) per row.
  */
trait TokenCounter extends Serializable {
  /** Registry name ([[TokenCounters.forName]] key, task-file value). */
  def name: String

  /** Token count of one document. Called per row inside generated code —
    * must be deterministic and allocation-light. Null handling lives in
    * the expression (null text → null count, like the built-ins).
    */
  def countTokens(text: String): Long
}

/** A [[TokenCounter]] that can also MATERIALIZE the token ids — the SPI
  * member behind [[graft.ops.Packing.packTokens]], the step that turns a
  * curated corpus into training-ready `array<int>` sequences instead of
  * offsets over raw text. The contract ties the two methods together:
  * `encodeTokens(text).length == countTokens(text)` for every input, so
  * budgets/packing computed from counts agree exactly with the ids a
  * writer emits.
  *
  * Id space (for implementations without an external vocabulary file,
  * like the built-in BPE): a single-code-point token's id is its code
  * point (0 ≤ id ≤ 0x10FFFF); a merged token's id is 0x110000 + the
  * FIRST merge rank whose concatenation produces it. Injective and
  * derivable from the merges table alone — a consumer with a real
  * toolkit vocabulary can re-map ids with one bounded join against its
  * vocab file.
  */
trait TokenEncoder extends TokenCounter {
  /** Token ids of one document, in stream order; empty array for a text
    * with no tokens. Null handling lives in the expression (null text →
    * null array).
    */
  def encodeTokens(text: String): Array[Int]
}

/** The q52/q58 whitespace contract: single-space split FIELD count
  * (separators + 1, empty fields included) — exactly
  * `LEN(STRING_SPLIT(text, ' '))` / `split(text, ' ')` size, and exactly
  * the `ws_tokens` leg of [[VectorFunctions.tokenCountsStruct]].
  */
case object WhitespaceTokenCounter extends TokenCounter {
  override def name: String = "whitespace"
  override def countTokens(text: String): Long = {
    var n = 1L
    var i = 0
    val len = text.length
    while (i < len) {
      if (text.charAt(i) == ' ') n += 1
      i += 1
    }
    n
  }
}

/** Greedy byte-pair-encoding token count over a pinned, ordered merges
  * table (Sennrich et al., "Neural Machine Translation of Rare Words with
  * Subword Units", ACL 2016 — the tokenization rule, applied with a fixed
  * table instead of a trained one so results stay oracle-checkable).
  *
  * Semantics, chosen to be expressible identically in the DuckDB oracle
  * (a recursive CTE — see SparkEntry.bpeWordCtes):
  *
  *  - pre-tokens: maximal runs of non-`' '` characters (the engine's
  *    single-space field convention, empties dropped);
  *  - each pre-token starts as its code-point sequence; repeatedly the
  *    LEFTMOST pair with the LOWEST merge rank is merged, until no
  *    adjacent pair is in the table; the document's count is the sum of
  *    final symbol counts over all pre-token occurrences.
  *
  * Deterministic by construction (strict leftmost-lowest tie-break), so
  * q52b/q58b hash-check against the oracle like exact queries. The table
  * rides the serialized expression to executors (a broadcast literal —
  * a real vocabulary's ~50k merges is still only ~1 MB of plan payload).
  */
final case class BpeTokenCounter(merges: Seq[(String, String)])
  extends TokenEncoder {

  override def name: String = "bpe"

  // (left, right) -> rank; lower rank merges first
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + " " + r, i) }
    m
  }

  // merged-symbol string -> id (MERGED_ID_BASE + first producing rank).
  // Every multi-code-point symbol the greedy walk can emit is some
  // rule's concatenation, so this map is total over merged outputs;
  // single-code-point symbols fall through to their code point.
  @transient private lazy val symIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + r, Integer.valueOf(BpeTokenCounter.MergedIdBase + i))
    }
    m
  }

  override def countTokens(text: String): Long = {
    var total = 0L
    val len = text.length
    var i = 0
    while (i < len) {
      while (i < len && text.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && text.charAt(i) != ' ') i += 1
      if (i > start) total += countWord(text, start, i)
    }
    total
  }

  override def encodeTokens(text: String): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    val len = text.length
    var i = 0
    while (i < len) {
      while (i < len && text.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && text.charAt(i) != ' ') i += 1
      if (i > start) {
        val (syms, n) = mergeWord(text, start, i)
        var j = 0
        while (j < n) {
          val id = symIds.get(syms(j))
          out += (if (id != null) id.intValue else syms(j).codePointAt(0))
          j += 1
        }
      }
    }
    out.result()
  }

  private def countWord(text: String, from: Int, until: Int): Long =
    mergeWord(text, from, until)._2.toLong

  /** The greedy walk shared by count and encode: final symbols (first
    * `n` slots of the returned array) after leftmost-lowest-rank
    * merging.
    */
  private def mergeWord(text: String, from: Int, until: Int)
      : (Array[String], Int) = {
    // split the word into code-point symbols
    var syms = new Array[String](until - from)
    var n = 0
    var i = from
    while (i < until) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      syms(n) = text.substring(i, i + w)
      n += 1
      i += w
    }
    // greedy: merge the leftmost lowest-rank adjacent pair until none left
    var done = n <= 1
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < n - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r < bestRank) { bestRank = r; best = j }
        j += 1
      }
      if (best < 0) done = true
      else {
        syms(best) = syms(best) + syms(best + 1)
        var k = best + 1
        while (k < n - 1) { syms(k) = syms(k + 1); k += 1 }
        n -= 1
        if (n <= 1) done = true
      }
    }
    (syms, n)
  }
}

object BpeTokenCounter {
  /** First id of the merged-symbol range: one past the last Unicode code
    * point, so code-point ids and merged ids can never collide.
    */
  val MergedIdBase: Int = 0x110000
}

object TokenCounters {

  /** The whitespace default — what every budget operator uses when no
    * counter is configured (q52/q58's oracle-pinned contract).
    */
  val whitespace: TokenCounter = WhitespaceTokenCounter

  /** The pinned tiny merges table behind the `bpe` built-in and the
    * q52b/q58b oracle twins. Deliberately exercises every interesting
    * shape of the greedy rule over the fixture vocabulary: a four-deep
    * chain (`t a→ta b→tab l→tabl e` = "table" in one token), rank
    * priority between overlapping rules (`t a` at rank 0 beats `a t` at
    * rank 4 inside "data"), multi-character symbols on either side
    * (`st r`, `in e`, `r ow`), and a repeated-character pair (`g g`).
    */
  val tinyMerges: Seq[(String, String)] = Seq(
    "t" -> "a", "ta" -> "b", "tab" -> "l", "tabl" -> "e",
    "a" -> "t", "s" -> "t", "e" -> "r", "o" -> "w",
    "r" -> "ow", "i" -> "n", "in" -> "e", "a" -> "l",
    "g" -> "g", "s" -> "m", "q" -> "u", "h" -> "a",
    "st" -> "r", "e" -> "a")

  /** The `bpe` built-in: greedy merges over [[tinyMerges]]. */
  val tinyBpe: BpeTokenCounter = BpeTokenCounter(tinyMerges)

  /** Load an ordered merges table from a standard `merges.txt` (the BPE
    * paper's interchange format, what subword tokenizer toolkits ship
    * next to a vocabulary): one `left right` pair per line, file order =
    * merge priority, an optional leading `#version:` header and blank
    * lines skipped. Read through the Hadoop filesystem API so the same
    * string works for local paths, `file://` URIs, and any mounted
    * distributed store; the table is driver-read ONCE and rides the
    * serialized expression to executors (~1 MB for a real 50k-merge
    * vocabulary — plan payload, not a per-row cost). Fails fast on a
    * malformed line: a silently dropped merge would desynchronize the
    * count from the vocabulary that produced the file.
    */
  def loadMerges(path: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      val merges = src.getLines().zipWithIndex.flatMap { case (line, i) =>
        val t = line.trim
        if (t.isEmpty || (i == 0 && t.startsWith("#version"))) None
        else t.split(" ", -1) match {
          case Array(l, r) if l.nonEmpty && r.nonEmpty => Some(l -> r)
          case _ => throw new IllegalArgumentException(
            s"malformed merges line ${i + 1} in $path: '$line' " +
              "(expected 'left right')")
        }
      }.toVector
      if (merges.isEmpty)
        throw new IllegalArgumentException(s"no merges in $path")
      merges
    } finally in.close()
  }

  /** A greedy-BPE counter over a `merges.txt` file ([[loadMerges]]) —
    * the `bpe:<path>` registry form.
    */
  def bpeFromFile(path: String): BpeTokenCounter =
    BpeTokenCounter(loadMerges(path))

  /** Resolve a counter by registry name: built-ins first (`whitespace`,
    * `bpe`, and `bpe:<merges.txt path>` for a user vocabulary), then
    * `ServiceLoader` providers on the current (module) classpath.
    */
  def forName(name: String): TokenCounter = name match {
    case "whitespace" => whitespace
    case "bpe" => tinyBpe
    case f if f.startsWith("bpe:") => bpeFromFile(f.substring(4))
    case other =>
      val it = java.util.ServiceLoader
        .load(classOf[TokenCounter], Thread.currentThread.getContextClassLoader)
        .iterator()
      var found: TokenCounter = null
      while (found == null && it.hasNext) {
        val c = it.next()
        if (c.name == other) found = c
      }
      if (found == null)
        throw new IllegalArgumentException(
          s"unknown tokenizer '$other' (built-ins: whitespace, bpe; " +
            "others via ServiceLoader on the module classpath)")
      found
  }

  /** Column form: `count(counter, $"text")` — one codegen'd expression,
    * null text → null count.
    */
  def count(counter: TokenCounter, text: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.tokenCount(text, counter)

  /** [[forName]] for the id-materializing surfaces: same registry, but
    * the resolved counter must be a [[TokenEncoder]] — fail fast with
    * the reason rather than letting a count-only tokenizer reach an
    * operator that needs ids (`whitespace` counts fields; without a
    * vocabulary there is no id to emit).
    */
  def encoderForName(name: String): TokenEncoder = forName(name) match {
    case e: TokenEncoder => e
    case c => throw new IllegalArgumentException(
      s"tokenizer '${c.name}' counts tokens but cannot emit ids " +
        "(implement graft.functions.TokenEncoder; built-in: bpe, bpe:<path>)")
  }

  /** Column form of id materialization: `encode(encoder, $"text")` →
    * `array<int>` token ids, one codegen'd expression, null text → null
    * array.
    */
  def encode(encoder: TokenEncoder, text: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.tokenEncode(text, encoder)
}
