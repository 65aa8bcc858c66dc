package graft.sources

import java.io.{ByteArrayOutputStream, OutputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.GZIPOutputStream

/** Minimal WARC (ISO 28500) record WRITER — the dual of [[WarcReader]]
  * used for archival sinks and fixtures. Bytes out follow the spec
  * grammar the reader parses: version line, named fields, CRLF, block,
  * CRLFCRLF; the `.gz` form writes one gzip MEMBER per record (the
  * convention real crawl writers use so readers can seek to member
  * boundaries — and what makes multi-member decoding in the reader a
  * tested path, not an assumption).
  *
  * Driver-side, single-stream: fixture and archive writing is bounded
  * work; the 100 TB direction of this engine is READING crawls, which
  * is the distributed path ([[WarcReader.read]]).
  */
object WarcWriter {

  /** An HTTP response block: status line + minimal headers + body. */
  def httpResponseBlock(status: Int, contentType: String,
                        body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    val h = head.getBytes(ISO_8859_1)
    val out = new Array[Byte](h.length + body.length)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(body, 0, out, h.length, body.length)
    out
  }

  /** One complete record: headers sized to the block, trailing CRLFCRLF.
    * `extraHeaders` carries optional named fields (WARC-Payload-Digest,
    * WARC-Profile, WARC-Refers-To, …) verbatim.
    */
  def record(warcType: String, url: String, date: String, recordId: String,
             blockContentType: String, block: Array[Byte],
             extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder(256)
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    if (url.nonEmpty) sb.append("WARC-Target-URI: ").append(url).append("\r\n")
    if (date.nonEmpty) sb.append("WARC-Date: ").append(date).append("\r\n")
    if (recordId.nonEmpty)
      sb.append("WARC-Record-ID: ").append(recordId).append("\r\n")
    extraHeaders.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    if (blockContentType.nonEmpty)
      sb.append("Content-Type: ").append(blockContentType).append("\r\n")
    sb.append("Content-Length: ").append(block.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(head.length + block.length + 4)
    out.write(head)
    out.write(block)
    out.write("\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  /** `WARC-Payload-Digest` value of an HTTP payload, the convention
    * real crawl writers emit: sha1 over the PAYLOAD bytes (the body
    * after the HTTP head — what [[WarcReader]] surfaces as `payload`),
    * rendered as `sha1:` + unpadded RFC 4648 base32. 160 bits = exactly
    * 32 base32 chars, so no padding arises.
    */
  def payloadDigest(body: Array[Byte]): String = {
    val sha = java.security.MessageDigest.getInstance("SHA-1").digest(body)
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder(32)
    var buf = 0L
    var bits = 0
    sha.foreach { b =>
      buf = (buf << 8) | (b & 0xFFL)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(alpha(((buf >> bits) & 0x1F).toInt))
      }
    }
    "sha1:" + sb.toString
  }

  /** A `response` record carrying an HTTP response whose body is `html`
    * encoded in `charset`; `declareInHeader` = advertise the charset in
    * the HTTP Content-Type (else the body's own meta tag / BOM / UTF-8
    * fallback must carry the sniff). Emits the body's
    * [[payloadDigest]] — the pre-decode dedup key every record should
    * carry.
    */
  def responseRecord(url: String, date: String, recordId: String,
                     html: String, charset: String,
                     declareInHeader: Boolean): Array[Byte] = {
    val ct = if (declareInHeader) s"text/html; charset=$charset"
      else "text/html"
    mediaResponseRecord(url, date, recordId, ct,
      html.getBytes(java.nio.charset.Charset.forName(charset)))
  }

  /** A `response` record with an ARBITRARY HTTP Content-Type and raw
    * body bytes — how crawls carry images/PDFs/octet-streams. Emits
    * the body's [[payloadDigest]].
    */
  def mediaResponseRecord(url: String, date: String, recordId: String,
                          contentType: String,
                          body: Array[Byte]): Array[Byte] =
    record("response", url, date, recordId,
      "application/http; msgtype=response",
      httpResponseBlock(200, contentType, body),
      extraHeaders = Seq("WARC-Payload-Digest" -> payloadDigest(body)))

  /** A `revisit` record (ISO 28500 §6.7.2, identical-payload-digest
    * profile): the crawler re-fetched `url` and found content whose
    * digest it had already stored — the block is EMPTY by profile and
    * `digest` points at the content it duplicates. These are exact
    * duplicates by construction; the digest-keyed dedup rung counts
    * them without ever touching a payload.
    */
  def revisitRecord(url: String, date: String, recordId: String,
                    digest: String): Array[Byte] =
    record("revisit", url, date, recordId, "", Array.emptyByteArray,
      extraHeaders = Seq(
        "WARC-Payload-Digest" -> digest,
        "WARC-Profile" ->
          "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"))

  /** Write records to `path` through the Hadoop FS API; `.gz` suffix →
    * one gzip member per record.
    */
  def write(spark: org.apache.spark.sql.SparkSession, path: String,
            records: Iterator[Array[Byte]]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os: OutputStream = fs.create(p, true)
    try {
      if (path.endsWith(".gz")) {
        // each member's GZIPOutputStream must be close()d — finish()
        // ends the gzip member but never releases the native zlib
        // Deflater, so a 100k-record write would pile up 100k native
        // deflater states until GC cleaners run. close() ends the
        // deflater too; the no-op-close wrapper keeps the underlying
        // file stream open across members.
        val keepOpen = new java.io.FilterOutputStream(os) {
          override def write(b: Array[Byte], off: Int, len: Int): Unit =
            out.write(b, off, len)
          override def close(): Unit = flush()
        }
        records.foreach { r =>
          val gz = new GZIPOutputStream(keepOpen, 1 << 16)
          gz.write(r)
          gz.close() // end the member AND its Deflater
        }
      } else records.foreach(os.write)
    } finally os.close()
  }
}
