package graft.functions

import org.apache.spark.sql.Column

/** Public face of the custom vector expressions
  * (org.apache.spark.sql.graft.DotProduct — see that file for why the
  * implementation lives in Spark's package space).
  */
object VectorFunctions {
  /** Dot product of two array<double> columns as one fused codegen loop. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.dot(a, b)

  /** Distinct w-word shingles of a space-split text column, single pass. */
  def wordShingles(text: Column, w: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.wordShingles(text, w)

  /** Random-hyperplane LSH bucket ('0'/'1' sign-bit string) of an
    * array<double> vector; `band` selects an independent plane family.
    * Plan size is O(1) in dim and nBits (planes ride along as a codegen
    * reference object, not literals).
    */
  def lshBucket(vec: Column, dim: Int, nBits: Int, band: Int = 0): Column =
    org.apache.spark.sql.graft.VectorBridge.lshBucket(vec, dim, nBits, band)

  /** Deterministic random projection to `outDim` components — cosine
    * ranks approximately preserved at a fraction of the vector bytes
    * (md5-derived matrix disjoint from the LSH planes; plan size O(1)).
    */
  def randomProject(vec: Column, dim: Int, outDim: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.randomProject(vec, dim, outDim)

  /** Per-document SimHash fingerprint ('0'/'1' string) in one pass. */
  def simHashBits(text: Column, bits: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.simHashBits(text, bits)

  /** Winnowing fingerprint selection (distinct window-min k-gram md5s) in
    * one deque pass.
    */
  def winnow(text: Column, k: Int, t: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.winnow(text, k, t)

  /** Positional w-gram md5-hex hashes of a pre-split word array in one
    * digest pass per window — the span-excision family's gram formula
    * (q88/q90/q91 and the gram index layouts); byte-identical to the
    * `transform(sequence, md5∘concat_ws∘slice)` composition it replaced.
    */
  def wordGramHashes(words: Column, w: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.wordGramHashes(words, w)

  /** IVF coarse-quantizer assignment: index of the nearest centroid by
    * cosine, as a zero-shuffle projection (centroids ride as a reference
    * object, not plan literals).
    */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.VectorBridge.nearestCentroid(vec, centroids)

  /** The nProbe nearest centroid indices by cosine as array<int> — the
    * batch-probe twin of [[nearestCentroid]] (backs ivfKnnJoin, q54).
    */
  def nearestCentroids(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.nearestCentroids(vec, centroids, nProbe)

  /** Token shape statistics struct (mean_word_len, digit_frac,
    * top_token_share) in one pass — backs qualitySignals (q46).
    */
  def tokenStats(text: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.tokenStats(text)

  /** N-gram repetition statistics struct (total, n_distinct, max_count)
    * over the token stream's n-grams in one pass — backs the Gopher
    * repetition filters (q51).
    */
  def ngramRep(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.ngramRep(text, n)

  /** Gopher-rule integer counts struct (words/lengths/alpha/stop hits,
    * line shapes, symbol tallies) in one pass — backs gopherFilter (q146).
    */
  def gopherStats(text: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.gopherStats(text)

  /** HTML -> rendered text in one codegen'd call (the Web.html* rule
    * chain; the fold spelling blows the 64 KB stage method limit when
    * composed into intake projections) — backs Web.htmlToText (q145).
    */
  def htmlToText(html: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.htmlToText(html)

  /** Charset-sniffed transcode of a crawl payload (BOM → Content-Type
    * header → meta prescan → UTF-8; replacement semantics, logic in
    * graft.sources.Charsets) — backs WarcReader.responses. A null
    * content-type hint still decodes via the remaining rungs.
    */
  def decodeCharset(payload: Column, contentType: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.decodeCharset(payload,
      org.apache.spark.sql.functions.coalesce(contentType,
        org.apache.spark.sql.functions.lit("")))

  /** The sniffed charset NAME (canonical) — the audit column beside
    * decodeCharset; same rung order by construction.
    */
  def sniffCharset(payload: Column, contentType: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.sniffCharset(payload,
      org.apache.spark.sql.functions.coalesce(contentType,
        org.apache.spark.sql.functions.lit("")))

  /** The Gopher keep decision in one codegen'd call (one stats pass +
    * thresholds in Scala; the struct-derived spelling re-evaluates the
    * stats per flag when used as a FILTER) — backs
    * TextAnalysis.gopherKeep (q148's gate, the gopher task's keep_only).
    */
  def gopherKeep(text: Column, minWords: Long, maxWords: Long,
                 minMeanWordLen: Double, maxMeanWordLen: Double,
                 maxSymbolWordRatio: Double, maxBulletLineFrac: Double,
                 maxEllipsisLineFrac: Double, minAlphaWordFrac: Double,
                 minStopHits: Long): Column =
    org.apache.spark.sql.graft.VectorBridge.gopherKeep(text, minWords,
      maxWords, minMeanWordLen, maxMeanWordLen, maxSymbolWordRatio,
      maxBulletLineFrac, maxEllipsisLineFrac, minAlphaWordFrac, minStopHits)

  /** Paragraph units in one codegen'd call (blank-line split, trimmed,
    * empties dropped; the split/transform/filter HOF spelling is
    * CodegenFallback and drops its stage out of codegen) — backs
    * TextAnalysis.paragraphsCol (q151/q152).
    */
  def paragraphs(text: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.paragraphs(text)

  /** Longest-suffix registered-domain cut in one codegen'd call (the
    * Web.publicSuffixes walk; the chained-when fold spelling blows the
    * 64 KB stage limit when a stage evaluates it twice) — backs
    * Web.registeredDomain (q143/q150).
    */
  def registeredDomain(host: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.registeredDomain(host)

  /** The cut under a runtime-loaded rule set (Web.loadPublicSuffixes). */
  def registeredDomain(host: Column,
                       rules: graft.ops.PublicSuffixRules): Column =
    org.apache.spark.sql.graft.VectorBridge.registeredDomain(host, rules)

  /** Token profile struct (n_tokens, n_distinct, hits per stopword list)
    * in one pass — backs languageId (q33) and qualityScore (q34).
    */
  def tokenProfile(text: Column, lists: Seq[Seq[String]]): Column =
    org.apache.spark.sql.graft.VectorBridge.tokenProfile(text, lists)

  /** Both q35 token counts (whitespace fields, BPE-ish pre-tokenizer
    * runs) as one code-point pass — no regex engine, no token array.
    */
  def tokenCountsStruct(text: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.tokenCounts(text)

  /** Unicode NFC normalization (codegen'd, quick-check fast path) — the
    * canonical-composition step before any content hashing; backs
    * [[graft.ops.TextAnalysis.normalizeText]] (q144).
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.nfcNormalize(text)

  /** Symmetric int8 quantization struct (scale, q: array<byte>) — the 4×
    * index-storage reduction behind quantizedTopK (q59); cosine over the
    * q arrays is scale-free, so ranks survive to quantization precision.
    */
  def quantizeInt8(vec: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.quantizeInt8(vec)

  /** Product-quantization encode: per-subspace nearest-codeword codes
    * (array<int>, squared-L2, ties to the lowest code) — m small ints
    * replace m·subDim doubles in a stored ANN row.
    */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graft.VectorBridge.pqEncode(vec, codebooks)

  /** Product-quantization ADC scoring: approximate cosine from the codes
    * alone via a driver-built per-query lookup table (no stored floats
    * touched in the scan).
    */
  def pqAdcScore(codes: Column, dots: Array[Array[Double]],
                 norm2: Array[Array[Double]], qNorm: Double): Column =
    org.apache.spark.sql.graft.VectorBridge.pqAdcScore(codes, dots, norm2, qNorm)

  /** Per-query ADC lookup table as a column — the batch-join form of the
    * driver-built LUT: flattened `dots[s·nCodes + c] = dot(q_s, w)`
    * (m·nCodes doubles), computed once per query row on a broadcast
    * probe side.
    */
  def pqQueryLut(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graft.VectorBridge.pqQueryLut(vec, codebooks)

  /** ADC scoring against a per-row LUT column ([[pqQueryLut]]) — the
    * batch-join twin of [[pqAdcScore]]: m array probes per
    * (query, corpus) pair, identical arithmetic to the point form.
    */
  def pqAdcScoreBatch(codes: Column, lut: Column, qNorm: Column,
                      norm2: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.VectorBridge.pqAdcScoreBatch(codes, lut, qNorm, norm2)

  /** Elementwise residual against the row's assigned centroid — the
    * encode-side primitive of residual IVF-PQ.
    */
  def centroidResidual(vec: Column, cell: Column,
                       centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.VectorBridge.centroidResidual(vec, cell, centroids)

  /** Packed per-query setup (LUT ++ centroid dots ++ |q|) for residual
    * ADC scoring — one array column, computed once per query row.
    */
  def pqResidualQueryLut(vec: Column, codebooks: Array[Array[Array[Double]]],
                         centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.VectorBridge.pqResidualQueryLut(vec, codebooks, centroids)

  /** Residual ADC scoring: exact cosine against `centroid + decode(codes)`
    * at m array probes per row.
    */
  def pqAdcResidualScore(codes: Column, cell: Column, lutPlus: Column,
                         norm2: Array[Array[Double]],
                         cd: Array[Array[Array[Double]]],
                         cn2: Array[Double]): Column =
    org.apache.spark.sql.graft.VectorBridge.pqAdcResidualScore(
      codes, cell, lutPlus, norm2, cd, cn2)

  /** Hashing-trick document vector: dim-wide token-bucket multiplicity
    * counts in one pass (md5-bucketed, engine-portable) — raw text into
    * the similarity family without a trained embedder.
    */
  def hashEmbed(text: Column, dim: Int): Column =
    org.apache.spark.sql.graft.VectorBridge.hashEmbed(text, dim)

  /** Probe a driver-built Bloom filter (no false negatives) — the
    * broadcast runtime-filter primitive behind decontaminateBloom (q50).
    */
  def bloomMightContain(text: Column,
                        bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    org.apache.spark.sql.graft.VectorBridge.bloomMightContain(text, bloom)

  /** Element-wise mean of array<double> vectors — the typed-Aggregator
    * UDAF (SURVEY §2.7). Map-side partial aggregation into a dim-width
    * buffer: per-group centroids without exploding n×dim rows.
    */
  lazy val vectorMean: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(VectorMean)

  /** Expose the extension functions to SQL (`SELECT graft_dot(a, b) ...`)
    * on this session — the internal-catalog task path registers them
    * automatically; call this for hand-built sessions. Idempotent.
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.GraftSqlFunctions.register(spark)
    spark.udf.register("graft_vector_mean", vectorMean)
  }
}
