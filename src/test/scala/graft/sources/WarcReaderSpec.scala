package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC reader + charset rung: the synthetic multi-record,
  * multi-charset fixture exercises every record class the ISO 28500
  * grammar allows through the reader — warcinfo/request/response,
  * continuation headers, per-record gzip members — and every sniff
  * rung (BOM > HTTP header > meta tag > UTF-8 fallback), ending with
  * the crawl-file → [[graft.ops.Web.intake]] composition the reader
  * exists for.
  */
class WarcReaderSpec extends SparkSpec {
  import spark.implicits._

  private val date = "2026-01-02T03:04:05Z"

  private def rid(i: Int) = s"<urn:uuid:0000-$i>"

  // one page per charset class; the non-ASCII chars differ by encoding
  private val utf8Html =
    "<html><body><p>utf-8 café ’quote’ —dash</p></body></html>"
  private val latin1Html =
    "<html><body><p>latin café ± ÷ straße</p></body></html>"
  private val cp1252Html =
    "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\"></head>" +
      "<body><p>cp1252 ’smart’ — €uro</p></body></html>"
  private val bomHtml =
    "<html><body><p>bom café ✓</p></body></html>"

  private def fixtureRecords: Seq[Array[Byte]] = Seq(
    WarcWriter.record("warcinfo", "", date, rid(0),
      "application/warc-fields",
      "software: graft-spec\r\nformat: WARC File Format 1.0\r\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)),
    WarcWriter.record("request", "https://ex.com/a", date, rid(1),
      "application/http; msgtype=request",
      "GET /a HTTP/1.1\r\nHost: ex.com\r\n\r\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)),
    WarcWriter.responseRecord("https://ex.com/a", date, rid(2),
      utf8Html, "utf-8", declareInHeader = true),
    WarcWriter.responseRecord("https://ex.com/b", date, rid(3),
      latin1Html, "iso-8859-1", declareInHeader = true),
    // charset only in the meta tag — header says bare text/html
    WarcWriter.responseRecord("https://ex.com/c", date, rid(4),
      cp1252Html, "windows-1252", declareInHeader = false),
    // BOM beats everything: header LIES (latin-1), bytes carry a UTF-8 BOM
    WarcWriter.record("response", "https://ex.com/d", date, rid(5),
      "application/http; msgtype=response",
      WarcWriter.httpResponseBlock(200, "text/html; charset=iso-8859-1",
        Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
          bomHtml.getBytes(java.nio.charset.StandardCharsets.UTF_8))),
    // no charset anywhere (bare text/html, no meta, no BOM): UTF-8 rung
    WarcWriter.responseRecord("https://ex.com/e", date, rid(6),
      utf8Html, "utf-8", declareInHeader = false))

  private def writeFixture(path: String): Unit =
    WarcWriter.write(spark, path, fixtureRecords.iterator)

  test("multi-record parse: types, fields, HTTP split, plain and per-record gzip") {
    val wd = tmpDir("graft_warc_")
    for (f <- Seq(s"$wd/crawl.warc", s"$wd/crawl.warc.gz")) {
      writeFixture(f)
      val recs = WarcReader.read(spark, f).collect()
        .sortBy(_.record_id)
      assert(recs.length == fixtureRecords.length, f)
      assert(recs.map(_.warc_type).count(_ == "response") == 5)
      val info = recs.find(_.warc_type == "warcinfo").get
      assert(info.url == "" && info.http_status.isEmpty)
      assert(new String(info.payload).contains("graft-spec"))
      val req = recs.find(_.warc_type == "request").get
      assert(req.url == "https://ex.com/a" && req.http_status.isEmpty)
      val resp = recs.find(_.record_id == rid(2)).get
      assert(resp.http_status.contains(200))
      assert(resp.http_content_type.contains("text/html; charset=utf-8"))
      assert(resp.warc_date == date)
      // the HTTP head is stripped: payload IS the body bytes
      assert(new String(resp.payload,
        java.nio.charset.StandardCharsets.UTF_8) == utf8Html)
    }
  }

  test("charset rungs: header, meta tag, BOM precedence, UTF-8 fallback") {
    val wd = tmpDir("graft_warc_")
    val f = s"$wd/crawl.warc"
    writeFixture(f)
    val got = WarcReader.responses(spark, f)
      .select(col("url"), col("html"))
      .as[(String, String)].collect().toMap
    assert(got("https://ex.com/a") == utf8Html)
    assert(got("https://ex.com/b") == latin1Html)
    assert(got("https://ex.com/c") == cp1252Html, "meta-tag rung")
    assert(got("https://ex.com/d") == bomHtml,
      "BOM must beat a lying header, and be stripped")
    assert(got("https://ex.com/e") == utf8Html, "UTF-8 fallback")
    // decoding never throws: latin-1 bytes mislabeled utf-8 come back
    // with replacement chars, not an exception
    val mangled = Charsets.decode(
      "café".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
      "text/html; charset=utf-8")
    assert(mangled.contains('�'))
    // unknown charset NAME in the header falls to the meta rung
    assert(Charsets.sniff(cp1252Html
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
      "text/html; charset=not-a-charset") == "windows-1252")
    // HTML5 meta rung: a meta-declared UTF-16 family remaps to UTF-8 —
    // the prescan only found the tag because the bytes are
    // ASCII-compatible, so the literal decode would be mojibake
    for (n <- Seq("utf-16", "UTF-16LE", "utf-16be")) {
      val html = s"""<html><head><meta charset="$n"></head>""" +
        "<body><p>mislabeled café</p></body></html>"
      val bytes = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(Charsets.sniff(bytes, null) == "UTF-8", n)
      assert(Charsets.decode(bytes, null) == html, n)
    }
    // an HTTP-HEADER utf-16 declaration is still honored literally
    // (that rung's label is trusted; only the meta prescan remaps)
    val u16 = "ok".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    assert(Charsets.decode(u16, "text/html; charset=utf-16le") == "ok")
  }

  test("payload digest surfaces; revisit records carry the digest with an empty block") {
    val body = "<html><body><p>digested page body here</p></body></html>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val digest = "sha1:EXAMPLEDIGESTBASE32VALUE"
    val recs = Seq(
      WarcWriter.record("response", "https://ex.com/orig", date, rid(1),
        "application/http; msgtype=response",
        WarcWriter.httpResponseBlock(200, "text/html", body),
        extraHeaders = Seq("WARC-Payload-Digest" -> digest)),
      // a crawler's re-fetch of the SAME content: no body, digest points
      // at what it duplicates (the identical-payload-digest profile)
      WarcWriter.record("revisit", "https://ex.com/copy", date, rid(2),
        "application/http; msgtype=response", Array.emptyByteArray,
        extraHeaders = Seq(
          "WARC-Payload-Digest" -> digest,
          "WARC-Profile" ->
            "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest",
          "WARC-Refers-To" -> rid(1))),
      WarcWriter.record("response", "https://ex.com/plain", date, rid(3),
        "application/http; msgtype=response",
        WarcWriter.httpResponseBlock(200, "text/html", body)))
    val wd = tmpDir("graft_warc_digest_")
    WarcWriter.write(spark, s"$wd/d.warc", recs.iterator)
    val out = WarcReader.read(spark, s"$wd/d.warc").collect()
      .map(r => r.record_id -> r).toMap
    assert(out(rid(1)).payload_digest.contains(digest))
    assert(out(rid(3)).payload_digest.isEmpty)
    val rev = out(rid(2))
    assert(rev.warc_type == "revisit" && rev.payload_digest.contains(digest)
      && rev.url == "https://ex.com/copy")
    // digest-keyed exact dedup needs NO payload hashing: the response +
    // revisit pair collapses on the crawler's own digest
    import spark.implicits._
    val byDigest = WarcReader.read(spark, s"$wd/d.warc")
      .filter(r => r.payload_digest.isDefined)
      .groupByKey(_.payload_digest.get).count().collect().toMap
    assert(byDigest(digest) == 2L)
  }

  test("responsesDeduped: digest groups collapse pre-decode, revisits count, min-(date,record_id) representative") {
    val shared = "<html><body><p>the shared page body càfé</p></body></html>"
    val sharedDigest = WarcWriter.payloadDigest(
      shared.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val recs = Seq(
      // two byte-identical fetches of one page: writer-computed digests
      // match; the LATER record id wins nothing — min keeps rid(1)
      WarcWriter.responseRecord("https://ex.com/a", date, rid(1),
        shared, "utf-8", declareInHeader = true),
      WarcWriter.responseRecord("https://ex.com/a2", date, rid(2),
        shared, "utf-8", declareInHeader = true),
      // a revisit of the same digest: counts, carries no payload
      WarcWriter.revisitRecord("https://ex.com/a", date, rid(3),
        sharedDigest),
      // unique page
      WarcWriter.responseRecord("https://ex.com/b", date, rid(4),
        utf8Html, "utf-8", declareInHeader = true),
      // digest-LESS response (raw record, no digest header): md5
      // fallback keys it alone
      WarcWriter.record("response", "https://ex.com/c", date, rid(5),
        "application/http; msgtype=response",
        WarcWriter.httpResponseBlock(200, "text/html",
          "<p>no digest here</p>".getBytes("UTF-8"))),
      // revisit of a digest NO response in this crawl carries: no row
      WarcWriter.revisitRecord("https://ex.com/zzz", date, rid(6),
        "sha1:ABSENTDIGESTVALUE00000000000000X"))
    val wd = tmpDir("graft_warc_dd_")
    WarcWriter.write(spark, s"$wd/d.warc.gz", recs.iterator)
    val out = WarcReader.responsesDeduped(spark, s"$wd/d.warc.gz")
      .collect().map(r => r.getAs[String]("record_id") -> r).toMap
    assert(out.keySet == Set(rid(1), rid(4), rid(5)), s"${out.keySet}")
    val rep = out(rid(1))
    assert(rep.getAs[Long]("n_fetches") == 3L, s"$rep")
    assert(rep.getAs[Long]("n_revisits") == 1L, s"$rep")
    assert(rep.getAs[String]("payload_digest") == sharedDigest)
    assert(rep.getAs[String]("html") == shared, "decode after dedup")
    assert(out(rid(4)).getAs[Long]("n_fetches") == 1L)
    assert(out(rid(5)).getAs[Long]("n_fetches") == 1L &&
      out(rid(5)).getAs[String]("payload_digest").length == 32,
      "md5 fallback key for digest-less records")
  }

  test("content-type gate: media responses never decode; Nil restores decode-everything") {
    val media = WarcWriter.mediaResponseRecord("https://ex.com/img", date,
      rid(7), "image/png",
      Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0xFF.toByte, 0x00))
    val page = WarcWriter.responseRecord("https://ex.com/a", date, rid(1),
      utf8Html, "utf-8", declareInHeader = true)
    // json/xml pass the default pattern list; octet-stream does not
    val json = WarcWriter.mediaResponseRecord("https://ex.com/j", date,
      rid(8), "application/json; charset=utf-8",
      """{"k": 1}""".getBytes("UTF-8"))
    val blob = WarcWriter.mediaResponseRecord("https://ex.com/o", date,
      rid(9), "application/octet-stream", Array[Byte](1, 2, 3))
    val wd = tmpDir("graft_warc_gate_")
    WarcWriter.write(spark, s"$wd/m.warc",
      Iterator(media, page, json, blob))
    val gated = WarcReader.responses(spark, s"$wd/m.warc")
      .select("record_id").as[String].collect().toSet
    assert(gated == Set(rid(1), rid(8)), s"$gated")
    val all = WarcReader.responses(
        WarcReader.read(spark, s"$wd/m.warc"), decodeContentTypes = Nil)
      .select("record_id").as[String].collect().toSet
    assert(all == Set(rid(1), rid(7), rid(8), rid(9)), s"$all")
    // the deduped path gates BEFORE the shuffle too
    val dd = WarcReader.responsesDeduped(spark, s"$wd/m.warc")
      .select("record_id").as[String].collect().toSet
    assert(dd == Set(rid(1), rid(8)), s"$dd")
  }

  test("latestByUrl: canonical-url re-fetch dedup keeps the newest, counts fetches, gates media") {
    def resp(url: String, when: String, id: String, body: String) =
      WarcWriter.responseRecord(url, when, id,
        s"<html><body><p>$body</p></body></html>", "utf-8",
        declareInHeader = true)
    val wd = tmpDir("graft_warc_latest_")
    WarcWriter.write(spark, s"$wd/r.warc.gz", Iterator(
      // three fetches of ONE page across messy url spellings — the
      // canonical key folds them; the newest date wins
      resp("https://ex.com/a", "2026-01-01T00:00:00Z", rid(1), "a v1"),
      resp("HTTPS://EX.COM:443/a?utm=x", "2026-03-01T00:00:00Z", rid(2),
        "a v3"),
      resp("https://user@ex.com/a#frag", "2026-02-01T00:00:00Z", rid(3),
        "a v2"),
      // single fetch
      resp("https://ex.com/b", "2026-01-01T00:00:00Z", rid(4), "b only"),
      // un-canonicalizable url keys on the raw string
      resp("not a url", "2026-01-01T00:00:00Z", rid(5), "odd"),
      // media response: the gate kills it before the shuffle
      WarcWriter.mediaResponseRecord("https://ex.com/img",
        "2026-01-01T00:00:00Z", rid(6), "image/png",
        Array[Byte](0x89.toByte, 0x50))))
    val out = WarcReader.latestByUrl(spark, s"$wd/r.warc.gz")
      .collect().map(r => r.getAs[String]("canon_url") -> r).toMap
    assert(out.keySet == Set("https://ex.com/a", "https://ex.com/b",
      "not a url"), s"${out.keySet}")
    val a = out("https://ex.com/a")
    assert(a.getAs[Long]("n_fetches") == 3L)
    assert(a.getAs[String]("record_id") == rid(2), "newest date wins")
    assert(a.getAs[String]("html").contains("a v3"))
    assert(out("https://ex.com/b").getAs[Long]("n_fetches") == 1L)
  }

  test("crawl repack: deduped_raw -> distributed warc shards round-trip through the reader") {
    val wd = tmpDir("graft_warc_repack_")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$wd/input"))
    val pages = (1 to 6).map { i =>
      // 1 and 2 byte-identical; 5 is media (gate kills pre-shuffle)
      val body = if (i <= 2) "<p>shared page café</p>"
        else s"<p>page $i café</p>"
      if (i == 5)
        WarcWriter.mediaResponseRecord(s"https://ex.com/m$i", date, rid(i),
          "image/png", Array[Byte](0x89.toByte, 0x50, 0x4E))
      else WarcWriter.responseRecord(s"https://ex.com/p$i", date, rid(i),
        s"<html><body>$body</body></html>", "windows-1252",
        declareInHeader = true)
    }
    WarcWriter.write(spark, s"$wd/input/crawl.warc.gz", pages.iterator)
    val json =
      s"""{"tasks": [
         |  {"type": "warc", "name": "repack",
         |   "source": {"folder": "input", "file": "crawl.warc.gz"},
         |   "warc": {"mode": "deduped_raw"},
         |   "target": {"format": "warc", "file": "repacked", "shards": 2}}
         |]}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$wd/task.json"), json)
    graft.runner.TaskRunner.runFile(s"$wd/task.json", spark, wd,
      graft.runner.TaskLog.Silent)
    val shards = new java.io.File(s"$wd/output/repacked").listFiles()
      .map(_.getName).filter(_.endsWith(".warc.gz")).sorted
    assert(shards.length == 2, shards.mkString(","))
    assert(shards.forall(_.startsWith("part-")), "no torn tmp shards")
    // read the repacked crawl back: 4 survivors (1≡2 collapsed, media
    // gated), fresh digests present, charset survives the round-trip
    val back = WarcReader.responses(spark, s"$wd/output/repacked")
      .collect().map(r => r.getAs[String]("record_id") -> r).toMap
    assert(back.keySet == Set(rid(1), rid(3), rid(4), rid(6)),
      s"${back.keySet}")
    assert(back(rid(3)).getAs[String]("html").contains("page 3 café"),
      "payload bytes repacked verbatim; charset declared and re-decoded")
    val raw = WarcReader.read(spark, s"$wd/output/repacked").collect()
    assert(raw.forall(_.payload_digest.exists(_.startsWith("sha1:"))),
      "repacked records carry fresh payload digests")
  }

  test("wet target: intake output ships as conversion-record text shards, reader round-trips") {
    val wd = tmpDir("graft_warc_wet_")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$wd/input"))
    val body = "the quick brown fox jumped over the lazy dog and kept " +
      "a steady pace to the end of the long field where it could rest"
    WarcWriter.write(spark, s"$wd/input/crawl.warc.gz", (1 to 4).iterator
      .map(i => WarcWriter.responseRecord(s"https://ex.com/p$i", date,
        rid(i), s"<html><body><p>$body page $i café</p></body></html>",
        "utf-8", declareInHeader = true)))
    val json =
      s"""{"tasks": [
         |  {"type": "intake", "name": "wet",
         |   "source": {"folder": "input", "file": "crawl.warc.gz",
         |              "format": "warc"},
         |   "intake": {"id": "record_id", "min_words": 10,
         |              "min_stop_hits": 0},
         |   "target": {"format": "wet", "file": "textcrawl", "shards": 2}}
         |]}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$wd/task.json"), json)
    graft.runner.TaskRunner.runFile(s"$wd/task.json", spark, wd,
      graft.runner.TaskLog.Silent)
    val recs = WarcReader.read(spark, s"$wd/output/textcrawl").collect()
    assert(recs.length == 4 && recs.forall(_.warc_type == "conversion"),
      recs.map(_.warc_type).mkString(","))
    assert(recs.forall(_.content_type == "text/plain"))
    assert(recs.forall(_.payload_digest.exists(_.startsWith("sha1:"))))
    val texts = recs.map(r => new String(r.payload, "UTF-8")).toSet
    assert(texts.exists(_.contains("page 3 café")),
      "normalized text round-trips as the conversion payload")
    assert(recs.map(_.record_id).toSet == (1 to 4).map(rid).toSet,
      "intake doc_id (the source record id) carries through")
  }

  test("readMany: literal paths with comma and glob metacharacters read as named") {
    val wd = tmpDir("graft_warc_paths_")
    val weird = s"$wd/crawl,{a}[1].warc"
    val plain = s"$wd/plain.warc"
    WarcWriter.write(spark, weird, Iterator(
      WarcWriter.responseRecord("https://ex.com/w", date, rid(1),
        utf8Html, "utf-8", declareInHeader = true)))
    WarcWriter.write(spark, plain, Iterator(
      WarcWriter.responseRecord("https://ex.com/p", date, rid(2),
        utf8Html, "utf-8", declareInHeader = true)))
    val urls = WarcReader.readMany(spark, Seq(weird, plain))
      .collect().map(_.url).toSet
    assert(urls == Set("https://ex.com/w", "https://ex.com/p"), s"$urls")
  }

  test("hostile Content-Length fails loud without a multi-GB pre-allocation") {
    val wd = tmpDir("graft_warc_hostile_")
    val f = s"$wd/h.warc"
    // declares 1.5 GB, carries 10 bytes — the reader must fail with a
    // truncation error having allocated only what arrived
    java.nio.file.Files.write(java.nio.file.Paths.get(f),
      ("WARC/1.0\r\nWARC-Type: resource\r\n" +
        "Content-Length: 1500000000\r\n\r\n0123456789").getBytes)
    val e = intercept[org.apache.spark.SparkException] {
      WarcReader.read(spark, f).count()
    }
    assert(e.getMessage.contains("truncated") ||
      (e.getCause != null && e.getCause.getMessage.contains("truncated")),
      s"$e")
  }

  test("inner HTTP encodings: chunked, gzip, deflate, chunked+gzip, malformed degrades to raw") {
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    def chunk(payload: Array[Byte], sizes: Seq[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var off = 0
      for (s <- sizes) {
        out.write(s"${s.toHexString}\r\n".getBytes(ISO_8859_1))
        out.write(payload, off, s); off += s
        out.write("\r\n".getBytes(ISO_8859_1))
      }
      assert(off == payload.length)
      out.write("0\r\n\r\n".getBytes(ISO_8859_1))
      out.toByteArray
    }
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    def defl(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos)
      d.write(b); d.close(); bos.toByteArray
    }
    def respBlock(headers: String, body: Array[Byte]): Array[Byte] = {
      val head = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        headers + "\r\n").getBytes(ISO_8859_1)
      head ++ body
    }
    val html = "<html><body><p>inner-encoded café body</p></body></html>"
    val raw = html.getBytes(UTF_8)
    val recs = Seq(
      ("https://ex.com/chunked",
        respBlock("Transfer-Encoding: chunked\r\n", chunk(raw, Seq(10, 25, raw.length - 35)))),
      ("https://ex.com/gzip",
        respBlock("Content-Encoding: gzip\r\n", gz(raw))),
      ("https://ex.com/deflate",
        respBlock("Content-Encoding: deflate\r\n", defl(raw))),
      ("https://ex.com/both",
        respBlock("Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
          chunk(gz(raw), Seq(gz(raw).length)))),
      ("https://ex.com/badchunk",
        respBlock("Transfer-Encoding: chunked\r\n",
          "zz-not-hex\r\nbroken".getBytes(ISO_8859_1))))
      .zipWithIndex.map { case ((url, block), i) =>
        WarcWriter.record("response", url, date, rid(100 + i),
          "application/http; msgtype=response", block)
      }
    val wd = tmpDir("graft_warc_enc_")
    WarcWriter.write(spark, s"$wd/enc.warc", recs.iterator)
    val got = WarcReader.responses(spark, s"$wd/enc.warc")
      .select(col("url"), col("html"))
      .as[(String, String)].collect().toMap
    assert(got("https://ex.com/chunked") == html)
    assert(got("https://ex.com/gzip") == html)
    assert(got("https://ex.com/deflate") == html)
    assert(got("https://ex.com/both") == html,
      "chunked unwraps first, then content-encoding")
    assert(got("https://ex.com/badchunk").contains("zz-not-hex"),
      "malformed inner framing degrades to raw bytes, never throws")
    // raw (zlib-headerless) deflate — the other wild spelling
    val rawDefl = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length * 2 + 64)
      val n = d.deflate(buf); java.util.Arrays.copyOf(buf, n)
    }
    val rec2 = WarcWriter.record("response", "https://ex.com/rawdeflate",
      date, rid(200), "application/http; msgtype=response",
      respBlock("Content-Encoding: deflate\r\n", rawDefl))
    WarcWriter.write(spark, s"$wd/enc2.warc", Iterator(rec2))
    val got2 = WarcReader.responses(spark, s"$wd/enc2.warc")
      .select(col("html")).as[String].head()
    assert(got2 == html, "raw deflate decodes via the fallback")
  }

  test("malformed input throws with file context; truncation never silently drops") {
    val wd = tmpDir("graft_warc_")
    val garbage = s"$wd/garbage.warc"
    java.nio.file.Files.write(java.nio.file.Paths.get(garbage),
      "HTTP/1.1 200 OK\r\n\r\n".getBytes)
    val e1 = intercept[org.apache.spark.SparkException] {
      WarcReader.read(spark, garbage).count()
    }
    assert(e1.getMessage.contains("WARC") ||
      e1.getCause != null, s"$e1")
    val truncated = s"$wd/trunc.warc"
    val full = fixtureRecords.head
    java.nio.file.Files.write(java.nio.file.Paths.get(truncated),
      java.util.Arrays.copyOf(full, full.length - 10))
    intercept[org.apache.spark.SparkException] {
      WarcReader.read(spark, truncated).count()
    }
  }

  test("continuation headers fold; header names are case-insensitive") {
    val rec = ("WARC/1.0\r\n" +
      "warc-type: metadata\r\n" +
      "WARC-TARGET-URI: https://ex.com/x\r\n" +
      "X-Long: first part\r\n second part\r\n" +
      "CONTENT-LENGTH: 2\r\n\r\nhi\r\n\r\n").getBytes
    val out = WarcReader.records("inline",
      new java.io.ByteArrayInputStream(rec)).toSeq
    assert(out.length == 1)
    assert(out.head.warc_type == "metadata")
    assert(out.head.url == "https://ex.com/x")
    assert(new String(out.head.payload) == "hi")
  }

  test("warc task type + warc source format: crawl file -> intake end-to-end") {
    val wd = tmpDir("graft_warc_task_")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$wd/input"))
    // enough body to clear the default-ish word gate
    val body = "the quick brown fox jumped over the lazy dog and kept " +
      "a steady pace to the end of the long field where it could rest " +
      "for a while in the cool shade café"
    val recs = (1 to 6).map { i =>
      WarcWriter.responseRecord(s"https://ex.com/p$i", date, rid(i),
        s"<html><body><h1>T${if (i % 2 == 0) "0" else i.toString}</h1>" +
          s"<p>$body ${if (i % 2 == 0) "even" else s"odd $i"}</p></body></html>",
        if (i % 2 == 0) "windows-1252" else "utf-8",
        declareInHeader = true)
    }
    WarcWriter.write(spark, s"$wd/input/crawl.warc.gz", recs.iterator)
    val json =
      s"""{"tasks": [
         |  {"type": "warc", "name": "scan",
         |   "source": {"folder": "input", "file": "crawl.warc.gz"},
         |   "target": {"file": "pages", "truncate": true}},
         |  {"type": "warc", "name": "raw",
         |   "source": {"folder": "input", "file": "crawl.warc.gz"},
         |   "warc": {"mode": "records"},
         |   "target": {"file": "records", "truncate": true}},
         |  {"type": "warc", "name": "dd",
         |   "source": {"folder": "input", "file": "crawl.warc.gz"},
         |   "warc": {"mode": "deduped"},
         |   "target": {"file": "deduped", "truncate": true}},
         |  {"type": "intake", "name": "in",
         |   "source": {"folder": "input", "file": "crawl.warc.gz",
         |              "format": "warc"},
         |   "intake": {"id": "record_id", "min_words": 10,
         |              "min_stop_hits": 0},
         |   "target": {"file": "intake", "truncate": true}},
         |  {"type": "intake", "name": "in_dd",
         |   "source": {"folder": "input", "file": "crawl.warc.gz",
         |              "format": "warc", "digest_dedup": true},
         |   "intake": {"id": "record_id", "min_words": 10,
         |              "min_stop_hits": 0},
         |   "target": {"file": "intake_dd", "truncate": true}}
         |]}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$wd/task.json"), json)
    graft.runner.TaskRunner.runFile(s"$wd/task.json", spark, wd,
      graft.runner.TaskLog.Silent)
    val pages = spark.read.parquet(s"$wd/output/pages")
    assert(pages.count() == 6)
    assert(pages.columns.toSet ==
      Set("url", "warc_date", "record_id", "http_status",
        "http_content_type", "html"))
    // records mode: every record type, raw payload bytes, digest column
    val raw = spark.read.parquet(s"$wd/output/records")
    assert(raw.count() == 6)
    assert(raw.columns.toSet == Set("warc_file", "warc_type", "url",
      "warc_date", "record_id", "content_type", "payload_digest",
      "http_status", "http_content_type", "http_robots", "payload"))
    // deduped mode: the 3 byte-identical even pages collapse on their
    // writer-emitted digest to the min record_id, pre-decode
    val dd = spark.read.parquet(s"$wd/output/deduped")
    assert(dd.count() == 4, dd.collect().mkString("\n"))
    val ddRep = dd.where(col("n_fetches") === 3).collect()
    assert(ddRep.length == 1 &&
      ddRep.head.getAs[String]("record_id") == rid(2), ddRep.mkString)
    assert(dd.columns.contains("payload_digest"))
    val intake = spark.read.parquet(s"$wd/output/intake")
    // 3 even docs share a body -> 1 representative + 3 distinct odd docs
    assert(intake.count() == 4, intake.collect().mkString("\n"))
    assert(intake.where(col("n_dupes") === 3).count() == 1)
    // the charset survived the whole chain: café intact in the output
    assert(intake.where(col("norm_text").contains("café")).count() == 4)
    // digest_dedup source knob: the byte-identical even pages collapse
    // BEFORE decode, so intake sees 4 pages and emits the same 4 reps
    // (n_dupes 1 everywhere — the digest rung already collapsed)
    val intakeDd = spark.read.parquet(s"$wd/output/intake_dd")
    assert(intakeDd.count() == 4, intakeDd.collect().mkString("\n"))
    assert(intakeDd.where(col("n_dupes") =!= 1).count() == 0)
    assert(intakeDd.select("norm_text").as[String].collect().toSet ==
      intake.select("norm_text").as[String].collect().toSet)
  }

  test("digest trust: case-scrambled claims normalize into one group; verify mode re-keys locally and isolates forged claims") {
    val shared = "<html><body><p>the canonical shared page</p></body></html>"
    val sharedBytes = shared.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sharedDigest = WarcWriter.payloadDigest(sharedBytes)
    // the same digest with scrambled algorithm/value case — writers
    // vary; both name the same content
    val scrambled = "SHA1:" + sharedDigest.stripPrefix("sha1:").toLowerCase
    def claimed(url: String, id: String, body: Array[Byte], claim: String) =
      WarcWriter.record("response", url, date, id,
        "application/http; msgtype=response",
        WarcWriter.httpResponseBlock(200, "text/html", body),
        extraHeaders = Seq("WARC-Payload-Digest" -> claim))
    val wd = tmpDir("graft_warc_trust_")
    // file A: canonical + scrambled-case claims over identical bytes,
    // plus a revisit claiming lowercase — all one content
    WarcWriter.write(spark, s"$wd/a.warc.gz", Iterator(
      claimed("https://ex.com/1", rid(1), sharedBytes, sharedDigest),
      claimed("https://ex.com/2", rid(2), sharedBytes, scrambled),
      WarcWriter.revisitRecord("https://ex.com/3", date, rid(3),
        sharedDigest.toLowerCase)))
    val a = WarcReader.dedupByDigest(WarcReader.read(spark, s"$wd/a.warc.gz"))
      .collect()
    assert(a.length == 1, a.mkString("\n"))
    assert(a.head.getAs[Long]("n_fetches") == 3L &&
      a.head.getAs[Long]("n_revisits") == 1L,
      "case-scrambled claims and revisits must normalize into one group")
    assert(a.head.getAs[String]("payload_digest") == sharedDigest,
      "canonical form: lowercase algorithm, uppercase value")
    // verify mode: local keys agree for identical bytes; the revisit's
    // claim remaps through the responses that claimed it
    val av = WarcReader.dedupByDigest(
      WarcReader.read(spark, s"$wd/a.warc.gz"), verifyDigests = true)
      .collect()
    assert(av.length == 1 && av.head.getAs[Long]("n_fetches") == 3L &&
      av.head.getAs[Long]("n_revisits") == 1L, av.mkString("\n"))
    assert(av.head.getAs[String]("payload_digest").length == 32,
      "verify mode keys on the locally computed hash, never the claim")
    // file B: a FORGED claim — different bytes, the shared digest
    val forgedBytes = "<html><body><p>hostile, not the shared page</p></body></html>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    WarcWriter.write(spark, s"$wd/b.warc.gz", Iterator(
      claimed("https://ex.com/1", rid(1), sharedBytes, sharedDigest),
      claimed("https://ex.com/9", rid(9), forgedBytes, sharedDigest)))
    // default mode TRUSTS the writer: the forgery collapses in (the
    // documented trust assumption)
    assert(WarcReader.dedupByDigest(
      WarcReader.read(spark, s"$wd/b.warc.gz")).count() == 1)
    // verify mode isolates it: two groups, one per distinct payload
    val bv = WarcReader.dedupByDigest(
      WarcReader.read(spark, s"$wd/b.warc.gz"), verifyDigests = true)
      .collect()
    assert(bv.length == 2 && bv.forall(_.getAs[Long]("n_fetches") == 1L),
      bv.mkString("\n"))
  }

  test("robots gate: header and meta noindex variants drop, nofollow-only and plain pages survive") {
    import org.apache.spark.sql.functions.col
    def page(head: String, body: String) =
      s"<html><head>$head</head><body><p>$body and some ordinary page " +
        "text to carry the body</p></body></html>"
    val recs = Seq(
      // header opt-outs, spelling variants — all must die pre-decode
      WarcWriter.responseRecord("https://ex.com/h1", date, rid(1),
        page("", "h1"), "utf-8", declareInHeader = true,
        httpHeaders = Seq("X-Robots-Tag" -> "noindex")),
      WarcWriter.responseRecord("https://ex.com/h2", date, rid(2),
        page("", "h2"), "utf-8", declareInHeader = true,
        httpHeaders = Seq("X-Robots-Tag" -> "NOINDEX, nofollow")),
      WarcWriter.responseRecord("https://ex.com/h3", date, rid(3),
        page("", "h3"), "utf-8", declareInHeader = true,
        httpHeaders = Seq("X-Robots-Tag" -> "googlebot: noindex")),
      // meta opt-outs: both attribute orders, quote styles, case
      WarcWriter.responseRecord("https://ex.com/m1", date, rid(4),
        page("<meta name=\"robots\" content=\"noindex, nofollow\">", "m1"),
        "utf-8", declareInHeader = true),
      WarcWriter.responseRecord("https://ex.com/m2", date, rid(5),
        page("<META content='noindex' name='Robots'>", "m2"),
        "utf-8", declareInHeader = true),
      WarcWriter.responseRecord("https://ex.com/m3", date, rid(6),
        page("<meta name=robots content=noindex>", "m3"),
        "utf-8", declareInHeader = true),
      // survivors: nofollow-only meta, an unrelated header value, a
      // description meta whose TEXT contains the word, a plain page
      WarcWriter.responseRecord("https://ex.com/k1", date, rid(7),
        page("<meta name=\"robots\" content=\"nofollow\">", "k1"),
        "utf-8", declareInHeader = true),
      WarcWriter.responseRecord("https://ex.com/k2", date, rid(8),
        page("", "k2"), "utf-8", declareInHeader = true,
        httpHeaders = Seq("X-Robots-Tag" -> "nofollow, noarchive")),
      WarcWriter.responseRecord("https://ex.com/k3", date, rid(9),
        page("<meta name=\"description\" content=\"how to noindex a page\">",
          "k3"), "utf-8", declareInHeader = true),
      WarcWriter.responseRecord("https://ex.com/k4", date, rid(10),
        page("", "k4"), "utf-8", declareInHeader = true))
    val wd = tmpDir("graft_warc_robots_")
    WarcWriter.write(spark, s"$wd/d.warc.gz", recs.iterator)
    val raw = WarcReader.read(spark, s"$wd/d.warc.gz")
    // the header surfaces verbatim on the record
    assert(raw.collect().find(_.record_id == rid(3))
      .get.http_robots.contains("googlebot: noindex"))
    val kept = WarcReader.responses(raw, robotsGate = true)
      .select(col("record_id")).collect().map(_.getString(0)).toSet
    assert(kept == Set(rid(7), rid(8), rid(9), rid(10)), s"$kept")
    // gate off: everything decodes (the default is unchanged behavior)
    assert(WarcReader.responses(raw).count() == 10)
    // task knob: the warc source's robots_gate flag drives the same gate
    val json =
      s"""{"tasks": [
         |  {"type": "warc", "name": "w",
         |   "source": {"folder": ".", "file": "d.warc.gz"},
         |   "warc": {"mode": "responses", "robots_gate": true},
         |   "target": {"file": "polite", "truncate": true}}
         |]}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$wd/task.json"), json)
    graft.runner.TaskRunner.runFile(s"$wd/task.json", spark, wd,
      graft.runner.TaskLog.Silent)
    assert(spark.read.parquet(s"$wd/output/polite")
      .select("record_id").collect().map(_.getString(0)).toSet == kept)
  }

  test("responsesDeduped robotsGate: collapse first, then the opt-out kills — replicas of opted-out pages never decode twice") {
    import org.apache.spark.sql.functions.col
    def page(head: String, body: String) =
      s"<html><head>$head</head><body><p>$body carries enough ordinary " +
        "page text for the fixture</p></body></html>"
    val meta = "<meta name=\"robots\" content=\"noindex\">"
    val recs = Seq(
      // a kept page re-fetched byte-identically: one row, n_fetches = 2
      WarcWriter.responseRecord("https://ex.com/a", date, rid(1),
        page("", "alpha"), "utf-8", declareInHeader = true),
      WarcWriter.responseRecord("https://ex.com/a", "2026-01-09T00:00:00Z",
        rid(2), page("", "alpha"), "utf-8", declareInHeader = true),
      // a header-opted-out page, also re-fetched — collapses, then dies
      WarcWriter.responseRecord("https://ex.com/h", date, rid(3),
        page("", "hdr"), "utf-8", declareInHeader = true,
        httpHeaders = Seq("X-Robots-Tag" -> "noindex")),
      WarcWriter.responseRecord("https://ex.com/h", "2026-01-09T00:00:00Z",
        rid(4), page("", "hdr"), "utf-8", declareInHeader = true,
        httpHeaders = Seq("X-Robots-Tag" -> "noindex")),
      // a meta-opted-out page: survives the rung, dies after decode
      WarcWriter.responseRecord("https://ex.com/m", date, rid(5),
        page(meta, "meta"), "utf-8", declareInHeader = true),
      // a plain single-fetch survivor
      WarcWriter.responseRecord("https://ex.com/k", date, rid(6),
        page("", "kept"), "utf-8", declareInHeader = true))
    val wd = tmpDir("graft_warc_ddgate_")
    WarcWriter.write(spark, s"$wd/d.warc.gz", recs.iterator)
    val raw = WarcReader.read(spark, s"$wd/d.warc.gz")
    val out = WarcReader.responsesDeduped(raw, robotsGate = true)
      .select(col("record_id"), col("n_fetches")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(rid(1) -> 2L, rid(6) -> 1L), s"$out")
    // gate off: the opted-out representatives still surface (default
    // behavior unchanged), each group one row
    assert(WarcReader.responsesDeduped(raw).count() == 4)
  }

  test("warc shard target: truncate clears stale shards and tmp files; no-truncate fails loudly on a shard collision") {
    val wd = tmpDir("graft_warc_trunc_")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$wd/input"))
    WarcWriter.write(spark, s"$wd/input/crawl.warc.gz", (1 to 4).iterator
      .map(i => WarcWriter.responseRecord(s"https://ex.com/p$i", date,
        rid(i), s"<html><body><p>page $i</p></body></html>", "utf-8",
        declareInHeader = true)))
    def task(shards: Int, truncate: Boolean) =
      s"""{"tasks": [
         |  {"type": "warc", "name": "repack",
         |   "source": {"folder": "input", "file": "crawl.warc.gz"},
         |   "warc": {"mode": "deduped_raw"},
         |   "target": {"format": "warc", "file": "repacked",
         |              "shards": $shards, "truncate": $truncate}}
         |]}""".stripMargin
    def run(json: String): Unit = {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$wd/task.json"), json)
      graft.runner.TaskRunner.runFile(s"$wd/task.json", spark, wd,
        graft.runner.TaskLog.Silent)
    }
    run(task(shards = 3, truncate = true))
    val outDir = new java.io.File(s"$wd/output/repacked")
    assert(outDir.listFiles().count(_.getName.endsWith(".warc.gz")) == 3)
    // plant a stranded attempt file: re-runs must sweep it
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/_tmp.part-00009.warc.gz.attempt1"),
      "torn")
    // re-run WITHOUT truncate: the shard namespace collides — loud fail
    val e = intercept[Exception] { run(task(shards = 1, truncate = false)) }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(_.isInstanceOf[IllegalStateException]),
      s"expected IllegalStateException in ${chain(e).map(_.getClass)}")
    // re-run WITH truncate and FEWER shards: stale part-00001/2 must go
    run(task(shards = 1, truncate = true))
    val names = outDir.listFiles().map(_.getName).sorted
    assert(names.count(_.endsWith(".warc.gz")) == 1 &&
      !names.exists(_.startsWith("_tmp.")),
      s"stale shards and tmp files must be gone: ${names.mkString(",")}")
    assert(WarcReader.responses(spark, s"$outDir").count() == 4,
      "read-back sees exactly one fresh run's records")
  }
}
