package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** The charset rung between a WARC response payload and the text
  * pipeline: crawl bytes arrive in whatever encoding each server chose,
  * and feeding them to [[graft.ops.Web.intake]] as if they were UTF-8
  * mangles every non-ASCII character into replacement chars that poison
  * shingles, dedup keys and tokenization.
  *
  * Sniff order (the HTML5 prescan convention, public spec):
  *   1. a byte-order mark (UTF-8 / UTF-16LE / UTF-16BE) — authoritative;
  *   2. `charset=` in the HTTP `Content-Type` header;
  *   3. `charset=` inside a `<meta …>` tag in the first 1024 bytes of
  *      the payload (covers both `<meta charset="…">` and the
  *      http-equiv `content="text/html; charset=…"` spelling);
  *   4. UTF-8.
  *
  * Decoding never throws: malformed/unmappable byte sequences become
  * U+FFFD (`CodingErrorAction.REPLACE`) — at corpus scale some records
  * ARE mislabeled, and one bad page must not kill a 100 TB scan. An
  * unrecognized charset NAME falls through to the next rung the same
  * way.
  */
object Charsets {

  /** `charset=name`, optionally quoted — the value grammar shared by
    * the HTTP header and the meta-tag content attribute.
    */
  private val charsetParam = java.util.regex.Pattern.compile(
    "(?i)charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9][A-Za-z0-9._:\\-]*)")

  /** `<meta … charset=…` within the prescan window. The {0,512} bound
    * keeps the scan linear on hostile input.
    */
  private val metaCharset = java.util.regex.Pattern.compile(
    "(?i)<meta[^>]{0,512}?charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9][A-Za-z0-9._:\\-]*)")

  private val prescanWindow = 1024

  private def forName(name: String): Charset =
    try {
      Charset.forName(name)
    } catch {
      case _: IllegalArgumentException => null // unknown name: next rung
    }

  /** (charset, bytes to skip) — BOM bytes are consumed so the decoded
    * text does not lead with U+FEFF.
    */
  private def bom(payload: Array[Byte]): (Charset, Int) =
    if (payload.length >= 3 && payload(0) == 0xEF.toByte &&
        payload(1) == 0xBB.toByte && payload(2) == 0xBF.toByte)
      (StandardCharsets.UTF_8, 3)
    else if (payload.length >= 2 && payload(0) == 0xFE.toByte &&
        payload(1) == 0xFF.toByte)
      (StandardCharsets.UTF_16BE, 2)
    else if (payload.length >= 2 && payload(0) == 0xFF.toByte &&
        payload(1) == 0xFE.toByte)
      (StandardCharsets.UTF_16LE, 2)
    else (null, 0)

  /** The sniffed charset name (for audit columns) — same rungs as
    * [[decode]].
    */
  def sniff(payload: Array[Byte], contentType: String): String =
    sniffWithOffset(payload, contentType)._1.name()

  private def sniffWithOffset(payload: Array[Byte],
                              contentType: String): (Charset, Int) = {
    val (bomCs, skip) = bom(payload)
    if (bomCs != null) return (bomCs, skip)
    if (contentType != null && contentType.nonEmpty) {
      val m = charsetParam.matcher(contentType)
      if (m.find) {
        val cs = forName(m.group(1))
        if (cs != null) return (cs, 0)
      }
    }
    val window = new String(payload, 0,
      math.min(prescanWindow, payload.length), StandardCharsets.ISO_8859_1)
    val m = metaCharset.matcher(window)
    if (m.find) {
      val cs = forName(remapMetaName(m.group(1)))
      if (cs != null) return (cs, 0)
    }
    (StandardCharsets.UTF_8, 0)
  }

  /** HTML5 encoding-sniffing rule for the meta rung: a meta-declared
    * UTF-16 family maps to UTF-8 — the prescan only FOUND the tag
    * because the bytes are ASCII-compatible (real UTF-16 pages carry a
    * BOM, caught at rung 1), so honoring the (commonly mislabeled)
    * declaration literally would decode the page to mojibake.
    */
  private def remapMetaName(name: String): String =
    if (name.equalsIgnoreCase("utf-16") || name.equalsIgnoreCase("utf-16le") ||
        name.equalsIgnoreCase("utf-16be")) "UTF-8"
    else name

  /** Transcode `payload` to a String under the sniffed charset —
    * replacement semantics, never throws. Shared by the interpreted and
    * codegen paths of the `DecodeCharset` expression.
    */
  def decode(payload: Array[Byte], contentType: String): String = {
    val (cs, skip) = sniffWithOffset(payload, contentType)
    cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
      .decode(ByteBuffer.wrap(payload, skip, payload.length - skip))
      .toString
  }
}
