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

  /** Canonical token id of a rule-side string: single code point → the
    * code point, else the merged-output id ([[symIds]]) — the exact id
    * space [[encodeTokens]] emits, injective with symbol strings, so
    * rank lookups keyed on (leftId, rightId) agree with the string walk
    * pair for pair. −1 = a side no merge sequence can ever produce (the
    * rule is dead; the string walk could never match it either).
    */
  private def idOf(s: String): Int =
    if (s.codePointCount(0, s.length) == 1) s.codePointAt(0)
    else {
      val id = symIds.get(s)
      if (id == null) -1 else id.intValue
    }

  // (leftId, rightId) packed long -> (rank, mergedId) packed long.
  // put-overwrites like the old string map, so a duplicated (l, r) rule
  // keeps its LAST rank; the merged id is the canonical (first-rank)
  // id of the concatenation regardless of which rule fired.
  @transient private lazy val pairTable: BpeTokenCounter.LongLongMap = {
    val t = new BpeTokenCounter.LongLongMap(merges.size)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val li = idOf(l)
      val ri = idOf(r)
      if (li >= 0 && ri >= 0)
        t.put((li.toLong << 32) | (ri.toLong & 0xffffffffL),
          (i.toLong << 32) | (symIds.get(l + r).toLong & 0xffffffffL))
    }
    t
  }

  override def countTokens(text: String): Long = {
    var total = 0L
    val len = text.length
    var i = 0
    while (i < len) {
      while (i < len && text.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && text.charAt(i) != ' ') i += 1
      if (i > start) total += mergeWord(text, start, i)._2.toLong
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
        val (ids, n) = mergeWord(text, start, i)
        var j = 0
        while (j < n) { out += ids(j); j += 1 }
      }
    }
    out.result()
  }

  /** The greedy walk shared by count and encode, as a (rank, position)
    * min-heap over a doubly-linked symbol list — O(symbols·log symbols)
    * per word instead of the old rescan-and-shift O(symbols²·rules).
    * Symbols are tracked as their canonical token ids (injective with
    * symbol strings), so pair-rank lookups and the emitted ids agree
    * with the string walk exactly; the packed (rank << 32 | position)
    * heap order IS the leftmost-lowest-rank tie-break, and stale heap
    * entries are skipped by a liveness + rank re-check (ranks are
    * unique per rule, and a slot's symbol string only ever lengthens,
    * so a matching rank proves the recorded pair is still current).
    * Returns the final token ids compacted into the first `n` slots.
    */
  private def mergeWord(text: String, from: Int, until: Int)
      : (Array[Int], Int) = {
    // split the word into code-point symbol ids
    val ids = new Array[Int](until - from)
    var n = 0
    var i = from
    while (i < until) {
      val cp = text.codePointAt(i)
      ids(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    if (n <= 1) return (ids, n)
    val table = pairTable
    // fast path: two symbols, at most one merge possible
    if (n == 2) {
      val v = table.get((ids(0).toLong << 32) | (ids(1).toLong & 0xffffffffL))
      if (v < 0L) return (ids, 2)
      ids(0) = (v & 0xffffffffL).toInt
      return (ids, 1)
    }
    // initial candidates; a word with no applicable rule allocates
    // nothing beyond the ids array
    var heap: Array[Long] = null
    var hn = 0
    var j = 0
    while (j < n - 1) {
      val v = table.get((ids(j).toLong << 32) | (ids(j + 1).toLong & 0xffffffffL))
      if (v >= 0L) {
        // pushes are bounded: n-1 initial + 2 per merge × (n-1) merges
        if (heap == null) heap = new Array[Long](3 * n)
        hn = BpeTokenCounter.heapPush(heap, hn, (v >>> 32 << 32) | j.toLong)
      }
      j += 1
    }
    if (hn == 0) return (ids, n)
    val nxt = new Array[Int](n)
    val prv = new Array[Int](n)
    j = 0
    while (j < n) { nxt(j) = j + 1; prv(j) = j - 1; j += 1 }
    var live = n
    while (hn > 0 && live > 1) {
      val top = heap(0)
      hn = BpeTokenCounter.heapPopMin(heap, hn)
      val pos = (top & 0xffffffffL).toInt
      val rank = (top >>> 32).toInt
      if (ids(pos) >= 0) {  // left slot still live
        val q = nxt(pos)
        if (q < n) {        // still has a right neighbor
          val v = table.get(
            (ids(pos).toLong << 32) | (ids(q).toLong & 0xffffffffL))
          if (v >= 0L && (v >>> 32).toInt == rank) {  // pair still current
            ids(pos) = (v & 0xffffffffL).toInt
            ids(q) = -1
            val q2 = nxt(q)
            nxt(pos) = q2
            if (q2 < n) prv(q2) = pos
            live -= 1
            val p = prv(pos)
            if (p >= 0) {
              val v2 = table.get(
                (ids(p).toLong << 32) | (ids(pos).toLong & 0xffffffffL))
              if (v2 >= 0L)
                hn = BpeTokenCounter.heapPush(heap, hn,
                  (v2 >>> 32 << 32) | p.toLong)
            }
            if (q2 < n) {
              val v3 = table.get(
                (ids(pos).toLong << 32) | (ids(q2).toLong & 0xffffffffL))
              if (v3 >= 0L)
                hn = BpeTokenCounter.heapPush(heap, hn,
                  (v3 >>> 32 << 32) | pos.toLong)
            }
          }
        }
      }
    }
    // compact the live ids left-to-right (slot 0 never dies: it has no
    // left neighbor to absorb it)
    var w = 0
    j = 0
    while (j < n) { ids(w) = ids(j); w += 1; j = nxt(j) }
    (ids, live)
  }
}

object BpeTokenCounter {
  /** First id of the merged-symbol range: one past the last Unicode code
    * point, so code-point ids and merged ids can never collide.
    */
  val MergedIdBase: Int = 0x110000

  /** Open-addressed long→long table (linear probe, ≤0.5 load, key −1 =
    * empty — packed (id, id) keys are always ≥ 0). The pair-rank lookup
    * is the single hottest call in the BPE walk; `java.util.HashMap`
    * would box every probe and the old string keys allocated a fresh
    * concatenation per probe.
    */
  private[functions] final class LongLongMap(nEntries: Int)
    extends Serializable {
    private val cap = {
      var c = 4
      while (c < nEntries * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val keys = {
      val a = new Array[Long](cap)
      java.util.Arrays.fill(a, -1L)
      a
    }
    private val vals = new Array[Long](cap)

    private def slot(k: Long): Int = {
      var h = k * 0x9E3779B97F4A7C15L
      h ^= h >>> 32
      h.toInt & mask
    }

    def put(k: Long, v: Long): Unit = {
      var i = slot(k)
      while (keys(i) != -1L && keys(i) != k) i = (i + 1) & mask
      keys(i) = k
      vals(i) = v
    }

    /** Value for `k`, or a negative sentinel when absent (stored values
      * pack (rank, mergedId), both ≥ 0, so every present value is ≥ 0).
      */
    def get(k: Long): Long = {
      var i = slot(k)
      var kk = keys(i)
      while (kk != k) {
        if (kk == -1L) return Long.MinValue
        i = (i + 1) & mask
        kk = keys(i)
      }
      vals(i)
    }
  }

  /** Binary min-heap over packed (rank << 32 | position) longs — the
    * natural long order is exactly (rank, then leftmost). Static with
    * explicit (array, size) so the per-word walk stays closure-free.
    */
  private[functions] def heapPush(h: Array[Long], size: Int, v: Long): Int = {
    var c = size
    h(c) = v
    while (c > 0 && h((c - 1) >> 1) > h(c)) {
      val p = (c - 1) >> 1
      val t = h(p); h(p) = h(c); h(c) = t
      c = p
    }
    size + 1
  }

  /** Removes h(0) (read it before calling); returns the new size. */
  private[functions] def heapPopMin(h: Array[Long], size: Int): Int = {
    val m = size - 1
    h(0) = h(m)
    var c = 0
    var done = false
    while (!done) {
      val l = 2 * c + 1
      val r = l + 1
      var s = c
      if (l < m && h(l) < h(s)) s = l
      if (r < m && h(r) < h(s)) s = r
      if (s == c) done = true
      else { val t = h(s); h(s) = h(c); h(c) = t; c = s }
    }
    m
  }
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
