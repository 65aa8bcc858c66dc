package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Dataset, SparkSession}

/** From-scratch WARC (ISO 28500, versions 1.0/1.1) record reader — the
  * step between "crawl dump" and [[graft.ops.Web.intake]]. Web crawls
  * ship as WARC: a concatenation of records, each
  *
  * {{{
  *   WARC/1.0<CRLF>
  *   Field-Name: value<CRLF> ...   (continuation lines start with LWS)
  *   <CRLF>
  *   <Content-Length bytes of block>
  *   <CRLF><CRLF>
  * }}}
  *
  * `response` records carry an HTTP response in the block (status line +
  * headers + CRLFCRLF + body); the reader splits that too, surfacing the
  * status, the HTTP Content-Type (the charset rung's first sniff source,
  * [[Charsets]]) and the BODY as the payload. Other record types
  * (warcinfo/request/metadata/resource/…) surface their whole block.
  *
  * Scale shape: one task per file via `sparkContext.binaryFiles` —
  * `PortableDataStream` opens the file lazily ON THE EXECUTOR (Hadoop FS
  * conf rides Spark's own serialization), and records stream off a
  * bounded buffer, so a 1 GB .warc.gz never materializes as one row the
  * way `binaryFile`-format reads would. WARC's natural parallelism unit
  * IS the file (gzip members are not splittable; crawls ship thousands
  * of files), matching how every public crawl pipeline shards.
  * `.warc.gz` is per-record/multi-member gzip — JDK `GZIPInputStream`
  * reads concatenated members natively.
  *
  * Malformed input policy (the S5 bad-config convention): a stream that
  * does not start a record with `WARC/` or truncates a declared block
  * throws with the file name — silent partial reads would undercount a
  * corpus invisibly.
  */
object WarcReader {

  /** One parsed record. `http_status`/`http_content_type` are None for
    * non-response records (and for response blocks with no parseable
    * HTTP head, whose block then passes through whole).
    * `payload_digest` is the crawler's own `WARC-Payload-Digest` (e.g.
    * `sha1:...`) when present — exact dedup can key on it WITHOUT
    * re-hashing payloads, and it is how `revisit` records (re-fetched
    * unchanged pages; empty/absent block by profile) point at the
    * content they duplicate.
    */
  final case class WarcRecord(
      warc_file: String,
      warc_type: String,
      url: String,
      warc_date: String,
      record_id: String,
      content_type: String,
      payload_digest: Option[String],
      http_status: Option[Int],
      http_content_type: Option[String],
      // the response's `X-Robots-Tag` header verbatim, when present —
      // the crawl-compliance signal the robots gate reads (None for
      // non-response records and responses without the header)
      http_robots: Option[String],
      payload: Array[Byte])

  /** All records under `path` (a file, directory or glob; `.gz` decoded
    * per file extension). One partition per file up to `minPartitions`.
    */
  def read(spark: SparkSession, path: String,
           minPartitions: Int = 0): Dataset[WarcRecord] = {
    import spark.implicits._
    val minP =
      if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    spark.createDataset(
      spark.sparkContext.binaryFiles(path, minP).flatMap {
        case (file, pds) =>
          val raw = pds.open()
          val in = new BufferedInputStream(
            if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16)
            else raw,
            1 << 16)
          // close on task end even if the iterator is abandoned mid-file
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null)
            tc.addTaskCompletionListener[Unit](_ =>
              try in.close() catch { case _: java.io.IOException => () })
          records(file, in)
      })
  }

  /** [[read]] over an EXPLICIT file list — every path opens as the
    * LITERAL file it names. `binaryFiles` would hand the list to
    * Hadoop's path grammar, whose comma splitter is only
    * curly-brace-aware (backslash escapes cannot protect a comma) and
    * whose globber expands `{}[]*?`, so a landing shard named
    * `crawl,{a}.warc.gz` silently mis-parses there. Here each file is
    * one task that opens the path through the FS API directly — no
    * list grammar, no glob expansion, and the same streamed
    * bounded-buffer parse as [[read]]. The file-arrival streaming
    * sink's per-batch entry point ([[graft.streaming.Streams
    * .warcIngestSink]]), whose source hands concrete file paths.
    */
  def readMany(spark: SparkSession,
               paths: Seq[String]): Dataset[WarcRecord] = {
    import spark.implicits._
    if (paths.isEmpty) return spark.emptyDataset[WarcRecord]
    // Configuration is Writable, not Serializable — ship its entries
    // and rebuild once per task (bounded: one build per file)
    val confKV = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    spark.createDataset(
      spark.sparkContext.parallelize(paths, paths.length).flatMap { file =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confKV.foreach { case (k, v) => conf.set(k, v) }
        val p = new org.apache.hadoop.fs.Path(file)
        val raw = p.getFileSystem(conf).open(p)
        val in = new BufferedInputStream(
          if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16)
          else raw,
          1 << 16)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null)
          tc.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: java.io.IOException => () })
        records(file, in)
      })
  }

  /** `response` records decoded to text — the intake-facing projection:
    * (url, warc_date, record_id, http_status, http_content_type, html).
    * The charset rung ([[Charsets]] via the codegen'd expression) runs
    * as a pure map-side projection over the streamed records.
    */
  /** The default decode gate: SQL LIKE patterns over the lowercased
    * mime (Content-Type parameters stripped) that mark a response
    * payload as text worth charset-decoding. A real crawl is full of
    * image/PDF/octet-stream responses — decoding those into garbage
    * strings pays the transcoding AND carries the width downstream
    * until a quality gate kills them; at the reader they cost one
    * map-side predicate. Records with NO parseable HTTP head (null
    * content type) pass: absence of a label is not evidence of media.
    */
  val textishContentTypes: Seq[String] =
    Seq("text/%", "%html%", "%xml%", "%json%", "%javascript%")

  /** The gate as a Column predicate — shared by [[responses]], the
    * dedup path and audit profiles (q156's kill counts).
    */
  def textish(contentType: org.apache.spark.sql.Column,
              patterns: Seq[String] = textishContentTypes)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val mime = trim(lower(substring_index(contentType, ";", 1)))
    patterns.map(mime.like(_)).reduce(_ || _) || contentType.isNull
  }

  def responses(spark: SparkSession, path: String)
      : org.apache.spark.sql.DataFrame =
    responses(read(spark, path))

  def responses(spark: SparkSession, path: String,
                minPartitions: Int): org.apache.spark.sql.DataFrame =
    responses(read(spark, path, minPartitions))

  /** The same projection over an already-parsed record set — the shape
    * [[readMany]] callers and the digest-dedup path compose with.
    * `decodeContentTypes` is the [[textish]] gate's pattern list;
    * pass `Nil` to decode every response payload regardless of type.
    *
    * `robotsGate = true` honors noindex opt-outs at the reader
    * ([[graft.ops.Web.robotsHeaderNoindex]] /
    * [[graft.ops.Web.metaRobotsNoindex]]): header-opted-out records
    * drop BEFORE their payload is charset-decoded (the header check is
    * free); meta-opted-out pages drop right after decode, before any
    * text leaves the reader. Both are map-side predicates in the scan's
    * codegen span — no exchange, no extra pass.
    */
  def responses(records: Dataset[WarcRecord],
                decodeContentTypes: Seq[String] = textishContentTypes,
                robotsGate: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = records.where(col("warc_type") === "response")
    val gated =
      if (decodeContentTypes.isEmpty) base
      else base.where(textish(col("http_content_type"), decodeContentTypes))
    val polite =
      if (!robotsGate) gated
      else gated.where(!graft.ops.Web.robotsHeaderNoindex(col("http_robots")))
    val decoded = polite
      .select(col("url"), col("warc_date"), col("record_id"),
        col("http_status"), col("http_content_type"),
        graft.functions.VectorFunctions
          .decodeCharset(col("payload"), col("http_content_type"))
          .as("html"))
    if (!robotsGate) decoded
    else decoded.where(!graft.ops.Web.metaRobotsNoindex(col("html")))
  }

  /** Digest-keyed PRE-DECODE exact dedup — the rung that runs before
    * any charset decode pays for a byte-duplicate page. The key is the
    * crawler's own `WARC-Payload-Digest` when present (md5 of the raw
    * payload as the fallback for writers that omit it); `revisit`
    * records — re-fetches whose digest the crawler had already stored;
    * empty block by profile — count into their digest's group without
    * carrying a payload at all. Per digest:
    *
    *   - the representative is the minimum (warc_date, record_id)
    *     RESPONSE record, all its columns carried;
    *   - `n_fetches` counts every response + revisit sharing the
    *     digest; `n_revisits` counts just the revisits.
    *
    * A digest whose only records are revisits (the response lives in
    * an earlier crawl) yields NO row — screening those is the standing
    * digest-index gate's job ([[graft.ops.Dedup.dedupAgainstKeyIndex]]).
    *
    * Scale shape: ONE shuffle on the fixed-width digest key with
    * map-side combine (duplicates collapse before the wire); the
    * payload rides as the min-struct payload, never as the key — the
    * [[graft.ops.Web.intake]] 100-TB rule. Decode work for the
    * collapsed copies is SKIPPED entirely: at crawl dedup rates
    * (30–60% byte-identical re-fetches) that is the single biggest
    * saving between landing and intake.
    *
    * TRUST: the default key is the crawler's own claimed digest,
    * case-normalized (writers vary hex/base32 case; `sha1:abc` and
    * `SHA1:ABC` name the same content) with md5(payload) filling in
    * for writers that omit it. Two residual holes follow from trusting
    * the writer: (a) byte-identical payloads DON'T group when one
    * record carries a digest and another doesn't (or the writers used
    * different algorithms), and (b) a corrupt or hostile record
    * CLAIMING an already-seen digest collapses distinct payloads
    * unverified. `verifyDigests = true` closes both for untrusted
    * crawls: every RESPONSE keys on a locally computed md5(payload)
    * (claims are never trusted), and revisit records — which carry no
    * payload to re-hash by profile — remap their claimed digest to the
    * local key through the responses that claimed it (one extra
    * digest-width equi-join; a revisit whose claim matches no response
    * in the batch drops, exactly the no-response-group rule below).
    * The same trust assumption applies at the standing
    * [[graft.ops.Dedup.dedupAgainstKeyIndex]] gate: a digest-keyed
    * index admits/rejects on the stored key — feed it verified keys
    * (this mode, or [[graft.ops.Dedup.buildExactKeyIndex]]'s own
    * hashes) when the crawl writer is not trusted.
    */
  def dedupByDigest(records: Dataset[WarcRecord],
                    verifyDigests: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = records.where(col("warc_type").isin("response", "revisit"))
    // claimed-digest case canonicalization: `alg:VALUE` → lowercase
    // algorithm, uppercase value (the convention real crawl writers
    // emit — sha1 + uppercase base32 — so well-formed digests pass
    // through unchanged); a prefix-less claim uppercases whole. Hex and
    // base32 are both case-insensitively unique, so normalizing only
    // MERGES same-content groups, never splits one.
    def normDigest(d: org.apache.spark.sql.Column) =
      when(d.contains(":"),
        concat(lower(substring_index(d, ":", 1)), lit(":"),
          upper(substring_index(d, ":", -1))))
        .otherwise(upper(d))
    val keyed =
      if (!verifyDigests)
        base.select(
          coalesce(normDigest(col("payload_digest")), md5(col("payload")))
            .as("payload_digest"),
          col("warc_type"), col("url"), col("warc_date"), col("record_id"),
          col("http_status"), col("http_content_type"), col("http_robots"),
          col("payload"))
      else {
        val resp = base.where(col("warc_type") === "response")
          .select(md5(col("payload")).as("payload_digest"),
            normDigest(col("payload_digest")).as("_claimed"),
            col("warc_type"), col("url"), col("warc_date"), col("record_id"),
            col("http_status"), col("http_content_type"), col("http_robots"),
            col("payload"))
        // claimed → verified key map, from the responses that claimed
        // one; aggregated BEFORE the join so a revisit joining a heavily
        // re-fetched digest contributes one row, not one per fetch. min
        // (not distinct): under a FORGED duplicate claim two different
        // payloads share a claimed digest — the remap then picks the
        // min local key deterministically instead of double-counting
        // the revisit into both groups
        val claimMap = resp.where(col("_claimed").isNotNull)
          .groupBy(col("_claimed"))
          .agg(min(col("payload_digest")).as("payload_digest"))
        val revisits = base.where(col("warc_type") === "revisit")
          .select(normDigest(col("payload_digest")).as("_claimed"),
            col("warc_type"), col("url"), col("warc_date"), col("record_id"),
            col("http_status"), col("http_content_type"), col("http_robots"),
            col("payload"))
          .join(claimMap, Seq("_claimed"))
        resp.drop("_claimed").unionByName(revisits.drop("_claimed"))
      }
    keyed
      .groupBy(col("payload_digest"))
      .agg(
        // min over a struct ordered by its leading fields (record ids
        // unique → fields after record_id never decide the winner);
        // null (= no response in the group) when only revisits carry
        // the digest
        min(when(col("warc_type") === "response",
          struct(col("warc_date"), col("record_id"), col("url"),
            col("http_status"), col("http_content_type"),
            col("http_robots"), col("payload")))).as("_r"),
        count(lit(1)).as("n_fetches"),
        sum(when(col("warc_type") === "revisit", 1L).otherwise(0L))
          .as("n_revisits"))
      .where(col("_r").isNotNull)
      .select(col("_r.url").as("url"), col("_r.warc_date").as("warc_date"),
        col("_r.record_id").as("record_id"),
        col("_r.http_status").as("http_status"),
        col("_r.http_content_type").as("http_content_type"),
        col("_r.http_robots").as("http_robots"),
        col("_r.payload").as("payload"),
        col("payload_digest"), col("n_fetches"), col("n_revisits"))
  }

  /** [[responses]] with the digest rung in front: content-type gate →
    * digest dedup → charset decode, in that order — media payloads
    * never enter the shuffle, duplicate payloads never reach the
    * decoder. Output adds (payload_digest, n_fetches, n_revisits) to
    * the [[responses]] projection. Revisits pass the gate regardless
    * of the pattern list (no HTTP head by profile → null content type).
    *
    * `robotsGate = true` applies the [[responses]] noindex opt-out
    * discipline AFTER the digest collapse — the cheap order: the
    * header check ([[graft.ops.Web.robotsHeaderNoindex]], the
    * `X-Robots-Tag` each representative carried through the rung)
    * kills before its payload is decoded, the meta check right after
    * decode; the collapsed copies were never decoded at all.
    */
  def responsesDeduped(records: Dataset[WarcRecord],
                       decodeContentTypes: Seq[String] = textishContentTypes,
                       verifyDigests: Boolean = false,
                       robotsGate: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val gated =
      if (decodeContentTypes.isEmpty) records
      else records.where(
        textish(col("http_content_type"), decodeContentTypes))
    val deduped = dedupByDigest(gated, verifyDigests)
    val polite =
      if (!robotsGate) deduped
      else deduped.where(!graft.ops.Web.robotsHeaderNoindex(col("http_robots")))
    val decoded = polite
      .select(col("url"), col("warc_date"), col("record_id"),
        col("http_status"), col("http_content_type"), col("http_robots"),
        col("payload_digest"), col("n_fetches"), col("n_revisits"),
        graft.functions.VectorFunctions
          .decodeCharset(col("payload"), col("http_content_type"))
          .as("html"))
    if (!robotsGate) decoded
    else decoded.where(!graft.ops.Web.metaRobotsNoindex(col("html")))
  }

  def responsesDeduped(spark: SparkSession, path: String)
      : org.apache.spark.sql.DataFrame =
    responsesDeduped(read(spark, path))

  /** URL-level re-fetch dedup — the OTHER crawl multiplicity: the same
    * page fetched repeatedly over time with CHANGED content (so the
    * digest rung keeps every version), where training wants one
    * representative per page. Keys on the CANONICAL url
    * ([[graft.ops.Web.canonicalizeUrl]] — scheme/host case, ports,
    * userinfo, query and fragment collapse; un-canonicalizable strings
    * key on the raw url) and keeps the NEWEST fetch: max (warc_date,
    * record_id). `n_fetches` counts the fetches the representative
    * stands for. Content gate first, decode after the dedup — the
    * [[responsesDeduped]] scale shape on a different key (one shuffle,
    * payload rides as the max-struct payload).
    */
  def latestByUrl(records: Dataset[WarcRecord],
                  decodeContentTypes: Seq[String] = textishContentTypes)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = records.where(col("warc_type") === "response")
    val gated =
      if (decodeContentTypes.isEmpty) base
      else base.where(textish(col("http_content_type"), decodeContentTypes))
    gated
      .select(
        coalesce(graft.ops.Web.canonicalizeUrl(col("url")), col("url"))
          .as("canon_url"),
        col("warc_date"), col("record_id"), col("url"),
        col("http_status"), col("http_content_type"), col("http_robots"),
        col("payload"))
      .groupBy(col("canon_url"))
      .agg(
        // max over (warc_date, record_id, …): record ids unique, so
        // fields after record_id never decide the winner
        max(struct(col("warc_date"), col("record_id"), col("url"),
          col("http_status"), col("http_content_type"),
          col("http_robots"), col("payload")))
          .as("_r"),
        count(lit(1)).as("n_fetches"))
      .select(col("_r.url").as("url"), col("_r.warc_date").as("warc_date"),
        col("_r.record_id").as("record_id"),
        col("_r.http_status").as("http_status"),
        col("_r.http_content_type").as("http_content_type"),
        col("_r.http_robots").as("http_robots"),
        col("canon_url"), col("n_fetches"),
        graft.functions.VectorFunctions
          .decodeCharset(col("_r.payload"), col("_r.http_content_type"))
          .as("html"))
  }

  def latestByUrl(spark: SparkSession, path: String)
      : org.apache.spark.sql.DataFrame =
    latestByUrl(read(spark, path))

  /** Streaming record iterator over one open (already-decompressed)
    * stream; closes `in` at end-of-stream.
    */
  private[sources] def records(file: String,
                               in: InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false

      private def advance(): Unit =
        if (nextRec == null && !done) {
          nextRec = readRecord(file, in)
          if (nextRec == null) {
            done = true
            in.close()
          }
        }

      override def hasNext: Boolean = { advance(); nextRec != null }

      override def next(): WarcRecord = {
        advance()
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec
        nextRec = null
        r
      }
    }

  /** One record, or null at a clean end-of-stream. */
  private def readRecord(file: String, in: InputStream): WarcRecord = {
    // skip the inter-record CRLFs (spec: two; be tolerant of more)
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return null
    if (!line.startsWith("WARC/"))
      throw new IllegalArgumentException(
        s"$file: expected a WARC/x.y version line, got: ${line.take(64)}")
    val headers = readHeaders(file, in)
    val len = headers.getOrElse("content-length",
      throw new IllegalArgumentException(
        s"$file: record missing Content-Length")).trim.toLong
    val block = readFully(file, in, len)
    val warcType = headers.getOrElse("warc-type", "")
    val contentType = headers.getOrElse("content-type", "")
    val (status, httpCt, httpRobots, payload) =
      if (warcType == "response" &&
          contentType.toLowerCase.startsWith("application/http"))
        splitHttp(block)
      else (None, None, None, block)
    WarcRecord(
      warc_file = file,
      warc_type = warcType,
      url = headers.getOrElse("warc-target-uri", ""),
      warc_date = headers.getOrElse("warc-date", ""),
      record_id = headers.getOrElse("warc-record-id", ""),
      content_type = contentType,
      payload_digest = headers.get("warc-payload-digest"),
      http_status = status,
      http_content_type = httpCt,
      http_robots = httpRobots,
      payload = payload)
  }

  /** Named fields until the blank line; names lowercased; LWS
    * continuation lines (ISO 28500 §4) fold into the previous value.
    */
  private def readHeaders(file: String,
                          in: InputStream): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var last: String = null
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
        if (last == null)
          throw new IllegalArgumentException(
            s"$file: header continuation with no preceding field")
        out(last) = out(last) + " " + line.trim
      } else {
        val i = line.indexOf(':')
        if (i < 0)
          throw new IllegalArgumentException(
            s"$file: malformed header line: ${line.take(64)}")
        last = line.substring(0, i).trim.toLowerCase
        out(last) = line.substring(i + 1).trim
      }
      line = readLine(in)
    }
    if (line == null)
      throw new IllegalArgumentException(
        s"$file: end of stream inside a record header")
    out.toMap
  }

  /** HTTP head off a response block: (status, Content-Type,
    * X-Robots-Tag, body).
    * No CRLFCRLF head terminator → the whole block passes through.
    *
    * The body is decoded the way a client would read it — WARC
    * `response` records store the RAW wire bytes, and real crawls are
    * full of both inner encodings:
    *   - `Transfer-Encoding: chunked` → de-chunked (hex size lines,
    *     extensions ignored, trailers dropped);
    *   - `Content-Encoding: gzip/x-gzip/deflate` → decompressed
    *     (deflate tries zlib-wrapped, then raw — both exist in the
    *     wild).
    * Chunked unwraps FIRST (it frames the compressed stream). An inner
    * decode that fails degrades to the raw bytes rather than throwing:
    * the WARC record framing (Content-Length) is intact, and one
    * server's malformed chunk stream must not kill a corpus-scale scan
    * — unlike record-level truncation, which still throws.
    */
  private def splitHttp(block: Array[Byte])
      : (Option[Int], Option[String], Option[String], Array[Byte]) = {
    val sep = indexOfDoubleCrlf(block)
    if (sep < 0) return (None, None, None, block)
    val lines = new String(block, 0, sep, ISO_8859_1).split("\r\n")
    val status = lines.headOption
      .filter(_.startsWith("HTTP/"))
      .flatMap(_.split(" ", 3).lift(1))
      .flatMap(_.toIntOption)
    def header(name: String): Option[String] = lines.iterator.drop(1)
      .find(_.toLowerCase.startsWith(name + ":"))
      .map(l => l.substring(l.indexOf(':') + 1).trim)
    val ct = header("content-type")
    val robots = header("x-robots-tag")
    var body = java.util.Arrays.copyOfRange(block, sep + 4, block.length)
    if (header("transfer-encoding").exists(_.toLowerCase.contains("chunked")))
      dechunk(body).foreach(body = _)
    header("content-encoding").map(_.toLowerCase) match {
      case Some("gzip") | Some("x-gzip") => gunzip(body).foreach(body = _)
      case Some("deflate")               => inflate(body).foreach(body = _)
      case _                             => ()
    }
    (status, ct, robots, body)
  }

  /** De-chunk an HTTP/1.1 chunked body; None on any malformed framing
    * (caller keeps the raw bytes).
    */
  private[sources] def dechunk(b: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (true) {
      // hex chunk size up to CRLF; `;ext` chunk extensions ignored
      val eol = indexOfCrlf(b, i)
      if (eol < 0) return None
      val sizeStr = new String(b, i, eol - i, ISO_8859_1)
        .takeWhile(_ != ';').trim
      val size =
        try java.lang.Long.parseLong(sizeStr, 16)
        catch { case _: NumberFormatException => return None }
      if (size < 0 || size > Int.MaxValue) return None
      i = eol + 2
      if (size == 0) return Some(out.toByteArray) // trailers dropped
      if (i + size + 2 > b.length) return None
      out.write(b, i, size.toInt)
      i += size.toInt
      if (b(i) != '\r' || b(i + 1) != '\n') return None
      i += 2
    }
    None // unreachable
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private def gunzip(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(b))
      try Some(in.readAllBytes()) finally in.close()
    } catch { case _: java.io.IOException => None }

  private def inflate(b: Array[Byte]): Option[Array[Byte]] = {
    def run(raw: Boolean): Option[Array[Byte]] =
      try {
        val in = new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(b),
          new java.util.zip.Inflater(raw))
        try Some(in.readAllBytes()) finally in.close()
      } catch { case _: java.io.IOException => None }
    run(raw = false).orElse(run(raw = true))
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' &&
          b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** One CRLF- (or LF-) terminated line, ISO-8859-1 (header lines are
    * ASCII by spec); null at end-of-stream.
    */
  private def readLine(in: InputStream): String = {
    var c = in.read()
    if (c < 0) return null
    val buf = new java.io.ByteArrayOutputStream(96)
    while (c >= 0 && c != '\n') {
      buf.write(c)
      c = in.read()
    }
    val bytes = buf.toByteArray
    val n =
      if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
      else bytes.length
    new String(bytes, 0, n, ISO_8859_1)
  }

  private def readFully(file: String, in: InputStream,
                        len: Long): Array[Byte] = {
    require(len >= 0 && len <= Int.MaxValue,
      s"$file: unsupported block length $len")
    // readNBytes grows its buffer in bounded chunks as bytes actually
    // arrive — a corrupt or hostile Content-Length can no longer
    // trigger an up-front multi-GB allocation; truncation surfaces as
    // the short read below, same fail-loud contract as before
    val out = in.readNBytes(len.toInt)
    if (out.length < len)
      throw new EOFException(
        s"$file: truncated WARC block (${out.length} of $len bytes)")
    out
  }
}
