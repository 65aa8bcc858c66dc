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

  /** An HTTP response block: status line + minimal headers + body.
    * `extraHttpHeaders` carries additional response headers verbatim
    * (X-Robots-Tag, Cache-Control, …).
    */
  def httpResponseBlock(status: Int, contentType: String,
                        body: Array[Byte],
                        extraHttpHeaders: Seq[(String, String)] = Nil)
      : Array[Byte] = {
    val extra = extraHttpHeaders
      .map { case (k, v) => s"$k: $v\r\n" }.mkString
    val head = s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: $contentType\r\n" + extra +
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
                     declareInHeader: Boolean,
                     httpHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val ct = if (declareInHeader) s"text/html; charset=$charset"
      else "text/html"
    mediaResponseRecord(url, date, recordId, ct,
      html.getBytes(java.nio.charset.Charset.forName(charset)), httpHeaders)
  }

  /** A `response` record with an ARBITRARY HTTP Content-Type and raw
    * body bytes — how crawls carry images/PDFs/octet-streams. Emits
    * the body's [[payloadDigest]].
    */
  def mediaResponseRecord(url: String, date: String, recordId: String,
                          contentType: String, body: Array[Byte],
                          httpHeaders: Seq[(String, String)] = Nil)
      : Array[Byte] =
    record("response", url, date, recordId,
      "application/http; msgtype=response",
      httpResponseBlock(200, contentType, body, httpHeaders),
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

  /** DISTRIBUTED archival sink — the crawl REPACK operation: after the
    * digest/URL/quality rungs shrink a crawl, the survivors ship back
    * out as WARC shards (the interchange format every crawl consumer
    * reads), one `.warc.gz` shard per partition, written ON THE
    * EXECUTORS through the Hadoop FS API. Rows must carry the
    * [[WarcReader.WarcRecord]] response projection: url, warc_date,
    * record_id, http_status (null → 200), http_content_type (null →
    * `text/html`) and a `payload` binary column (the RAW body bytes —
    * repacking re-encodes nothing). Each record gets a fresh
    * `WARC-Payload-Digest` over its payload, so a repacked crawl's
    * digest rung works without the original headers.
    *
    * Scale shape: a pure `foreachPartition` write — no shuffle, no
    * driver data path; shard count = the input's partitioning (callers
    * `repartition(n)` to choose it, exactly how parquet writers size
    * output). Files land as `part-NNNNN.warc.gz` under `dir`;
    * [[WarcReader.read]](dir) round-trips them. Task retries may leave
    * partial files on crash; writes go to `_tmp.` names with a rename
    * on completion, so readers listing `*.warc.gz` never see a torn
    * shard (the parquet committer convention, one file deep).
    */
  def writeShards(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
    writeShardFiles(df.selectExpr(
      "cast(url as string) as url",
      "cast(warc_date as string) as warc_date",
      "cast(record_id as string) as record_id",
      "cast(coalesce(http_status, 200) as int) as http_status",
      "cast(coalesce(http_content_type, 'text/html') as string) " +
        "as http_content_type",
      "cast(payload as binary) as payload"), dir) { r =>
      val body = r.getAs[Array[Byte]]("payload")
      record("response", r.getAs[String]("url"),
        r.getAs[String]("warc_date"), r.getAs[String]("record_id"),
        "application/http; msgtype=response",
        httpResponseBlock(r.getAs[Int]("http_status"),
          r.getAs[String]("http_content_type"), body),
        extraHeaders = Seq("WARC-Payload-Digest" -> payloadDigest(body)))
    }

  /** WET-style EXTRACTED-TEXT shards — the crawl ecosystem's text
    * interchange: ISO 28500 `conversion` records (the record type the
    * public WET convention uses), `text/plain` UTF-8 bodies, fresh
    * payload digests. Rows carry `record_id` and the text column
    * (`textCol`), plus optional `url`/`warc_date` passed through when
    * present — so [[graft.ops.Web.intake]] output (doc_id = the source
    * record id, norm_text) pipes straight out as a text crawl any WET
    * consumer reads. Same executor-side shard writer as [[writeShards]].
    */
  def writeTextShards(df: org.apache.spark.sql.DataFrame, dir: String,
                      textCol: String): Unit = {
    val names = df.columns.toSet
    def opt(c: String) =
      if (names(c)) s"cast($c as string) as $c" else s"'' as $c"
    val idExpr =
      if (names("record_id")) "record_id"
      else if (names("doc_id")) "doc_id"
      else throw new IllegalArgumentException(
        s"writeTextShards: no record_id/doc_id column in " +
          s"[${df.columns.mkString(", ")}]")
    writeShardFiles(df.where(org.apache.spark.sql.functions.col(textCol)
        .isNotNull)
      .selectExpr(opt("url"), opt("warc_date"),
        s"cast($idExpr as string) as record_id",
        s"cast($textCol as string) as text"), dir) { r =>
      val body = r.getAs[String]("text").getBytes(UTF_8)
      record("conversion", r.getAs[String]("url"),
        r.getAs[String]("warc_date"), r.getAs[String]("record_id"),
        "text/plain", body,
        extraHeaders = Seq("WARC-Payload-Digest" -> payloadDigest(body)))
    }
  }

  /** Prepare a shard destination for [[writeShards]]/[[writeTextShards]]
    * under the task-DSL `truncate` contract every other target honors:
    * `truncate = true` deletes any existing `part-*.warc.gz` shards
    * (and stranded `_tmp.` files) so a re-run can never mix fresh and
    * stale shards — the writer names shards by partition index, so a
    * re-run with FEWER partitions would otherwise leave the tail of the
    * previous run in place and silently duplicate records on read-back.
    * `truncate = false` fails loudly when shards already exist: the
    * shard namespace collides by construction, so "append" here is
    * never a safe merge — write to a fresh directory instead.
    */
  def prepareShardDir(spark: org.apache.spark.sql.SparkSession,
                      dir: String, truncate: Boolean): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val entries = fs.listStatus(p).map(_.getPath)
    val shards = entries.filter { f =>
      val n = f.getName
      n.startsWith("part-") && n.endsWith(".warc.gz")
    }
    val stranded = entries.filter(_.getName.startsWith("_tmp."))
    if (truncate) (shards ++ stranded).foreach(fs.delete(_, false))
    else if (shards.nonEmpty)
      throw new IllegalStateException(
        s"warc shard target $dir already holds ${shards.length} " +
          "part-*.warc.gz shard(s); re-running without truncate would mix " +
          "stale and fresh shards (set \"truncate\": true, or point the " +
          "task at a fresh directory)")
  }

  /** Sweep stranded `_tmp.` attempt files after a successful shard
    * commit — failed task attempts leave them behind (readers never see
    * them: FileInputFormat's hidden-file filter skips `_` prefixes, and
    * [[WarcReader.read]]'s glob callers match `*.warc.gz`), but without
    * a sweep they accumulate for the directory's lifetime.
    */
  def sweepTmpFiles(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      fs.listStatus(p).map(_.getPath)
        .filter(_.getName.startsWith("_tmp."))
        .foreach(fs.delete(_, false))
  }

  /** The shared executor-side shard writer: one `.warc.gz` shard per
    * non-empty partition, per-member gzip with Deflater release,
    * `_tmp.`+rename so listers never see a torn shard.
    */
  private def writeShardFiles(projected: org.apache.spark.sql.DataFrame,
                              dir: String)
                             (rec: org.apache.spark.sql.Row => Array[Byte])
      : Unit = {
    // Configuration is Writable, not Serializable — ship its entries
    // and rebuild once per task (the WarcReader.readMany pattern)
    val confKV = {
      val it = projected.sparkSession.sparkContext
        .hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    projected.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val shard = f"part-${tc.partitionId()}%05d.warc.gz"
          val fin = new org.apache.hadoop.fs.Path(s"$dir/$shard")
          val tmp = new org.apache.hadoop.fs.Path(
            s"$dir/_tmp.$shard.attempt${tc.taskAttemptId()}")
          val conf = new org.apache.hadoop.conf.Configuration(false)
          confKV.foreach { case (k, v) => conf.set(k, v) }
          val fs = fin.getFileSystem(conf)
          val os = fs.create(tmp, true)
          try {
            val keepOpen = new java.io.FilterOutputStream(os) {
              override def write(b: Array[Byte], off: Int, len: Int): Unit =
                out.write(b, off, len)
              override def close(): Unit = flush()
            }
            rows.foreach { r =>
              val gz = new GZIPOutputStream(keepOpen, 1 << 16)
              gz.write(rec(r))
              gz.close() // end the member AND its Deflater
            }
          } finally os.close()
          // Hadoop FS signals failure by RETURN VALUE. A false with the
          // destination present is a lost race against another attempt
          // of this same deterministic partition — benign; a false with
          // no destination is silent data loss — abort loudly. Stranded
          // `_tmp.` files are invisible to readers (FileInputFormat's
          // hidden-file filter skips `_`/`.` prefixes).
          if (!fs.rename(tmp, fin) && !fs.exists(fin))
            throw new java.io.IOException(
              s"failed to commit warc shard $fin")
          ()
        }
    }
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
