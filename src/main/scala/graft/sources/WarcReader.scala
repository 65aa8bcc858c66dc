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

  /** `response` records decoded to text — the intake-facing projection:
    * (url, warc_date, record_id, http_status, http_content_type, html).
    * The charset rung ([[Charsets]] via the codegen'd expression) runs
    * as a pure map-side projection over the streamed records.
    */
  def responses(spark: SparkSession, path: String,
                minPartitions: Int = 0): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, path, minPartitions)
      .where(col("warc_type") === "response")
      .select(col("url"), col("warc_date"), col("record_id"),
        col("http_status"), col("http_content_type"),
        graft.functions.VectorFunctions
          .decodeCharset(col("payload"), col("http_content_type"))
          .as("html"))
  }

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
    val (status, httpCt, payload) =
      if (warcType == "response" &&
          contentType.toLowerCase.startsWith("application/http"))
        splitHttp(block)
      else (None, None, block)
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

  /** HTTP head off a response block: (status, Content-Type, body).
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
  private def splitHttp(
      block: Array[Byte]): (Option[Int], Option[String], Array[Byte]) = {
    val sep = indexOfDoubleCrlf(block)
    if (sep < 0) return (None, None, block)
    val lines = new String(block, 0, sep, ISO_8859_1).split("\r\n")
    val status = lines.headOption
      .filter(_.startsWith("HTTP/"))
      .flatMap(_.split(" ", 3).lift(1))
      .flatMap(_.toIntOption)
    def header(name: String): Option[String] = lines.iterator.drop(1)
      .find(_.toLowerCase.startsWith(name + ":"))
      .map(l => l.substring(l.indexOf(':') + 1).trim)
    val ct = header("content-type")
    var body = java.util.Arrays.copyOfRange(block, sep + 4, block.length)
    if (header("transfer-encoding").exists(_.toLowerCase.contains("chunked")))
      dechunk(body).foreach(body = _)
    header("content-encoding").map(_.toLowerCase) match {
      case Some("gzip") | Some("x-gzip") => gunzip(body).foreach(body = _)
      case Some("deflate")               => inflate(body).foreach(body = _)
      case _                             => ()
    }
    (status, ct, body)
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
    val out = new Array[Byte](len.toInt)
    var off = 0
    while (off < len) {
      val r = in.read(out, off, len.toInt - off)
      if (r < 0)
        throw new EOFException(
          s"$file: truncated WARC block ($off of $len bytes)")
      off += r
    }
    out
  }
}
