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

  /** A `response` record carrying an HTTP response whose body is `html`
    * encoded in `charset`; `declareInHeader` = advertise the charset in
    * the HTTP Content-Type (else the body's own meta tag / BOM / UTF-8
    * fallback must carry the sniff).
    */
  def responseRecord(url: String, date: String, recordId: String,
                     html: String, charset: String,
                     declareInHeader: Boolean): Array[Byte] = {
    val ct = if (declareInHeader) s"text/html; charset=$charset"
      else "text/html"
    record("response", url, date, recordId,
      "application/http; msgtype=response",
      httpResponseBlock(200, ct,
        html.getBytes(java.nio.charset.Charset.forName(charset))))
  }

  /** Write records to `path` through the Hadoop FS API; `.gz` suffix →
    * one gzip member per record.
    */
  def write(spark: org.apache.spark.sql.SparkSession, path: String,
            records: Iterator[Array[Byte]]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os: OutputStream = fs.create(p, true)
    try {
      if (path.endsWith(".gz"))
        records.foreach { r =>
          val gz = new GZIPOutputStream(os, 1 << 16)
          gz.write(r)
          gz.finish() // end the member, keep the underlying stream open
        }
      else records.foreach(os.write)
    } finally os.close()
  }
}
