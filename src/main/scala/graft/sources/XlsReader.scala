package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.mutable

/** Minimal XLS (BIFF8) reader — the one source Spark cannot provide and no
  * offline jar covers (SURVEY.md §7.6: no POI). Scope is bounded per
  * SURVEY.md §7.5: OLE2 compound container (FAT + miniFAT), the Workbook
  * stream, first-or-named sheet, cell types LABELSST/LABEL/NUMBER/RK/
  * MULRK/BOOLERR/FORMULA-with-cached-result. Numbers render via a
  * compact-decimal format.
  *
  * Date cells follow the reference's `use_view=True` view semantics
  * (task.py:326 → petl fromxls → xlutils.view): a numeric cell whose XF
  * points at a date/time number format (built-in ids or a custom FORMAT
  * string with date tokens) is decoded through the Excel serial-date
  * rules (1900/1904 DATEMODE, the phantom-1900-leap-day offset xlrd
  * applies at serial 61) and rendered the way petl's CSV sink prints the
  * resulting datetime/time object: `yyyy-MM-dd HH:mm:ss`, or `HH:mm:ss`
  * for time-only values. One deviation: xlrd raises XLDateAmbiguous for
  * 1900-mode serials below 61; we render them proleptically instead of
  * failing the whole file.
  *
  * Matching the reference pipeline (xls-csv, task.py:319-347), the first
  * row is the header and every value is a string. Parsing is driver-side
  * (like xlrd); the result is distributed via createDataFrame — XLS inputs
  * in this DSL are operational files, not the 100 TB path.
  */
object XlsReader {

  /** @param useView `true` (reference default, task.py:325-326) renders
    *                 date-formatted numerics through the serial-date
    *                 rules; `false` is xlrd's RAW mode — every numeric
    *                 cell keeps its stored value (date serials included)
    *                 and no view formatting is applied.
    */
  def read(spark: SparkSession, path: String, sheet: Option[String],
           useView: Boolean = true): DataFrame = {
    val rows = readRows(path, sheet, useView)
    if (rows.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], StructType(Nil))
    val header = rows.head.map(v => if (v == null) "" else v)
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data = rows.tail.map(r => Row.fromSeq(r.padTo(header.size, null).take(header.size)))
    spark.createDataFrame(spark.sparkContext.parallelize(data.toList), schema)
  }

  /** All cell rows of the selected sheet as strings (dense, null-padded).
    * Routes by extension: `.xlsx`/`.xlsm` → the [[XlsxReader]] OPC path,
    * everything else → BIFF8 — one entry point for both formats, so the
    * `xls-csv` task config is format-agnostic.
    */
  def readRows(path: String, sheet: Option[String],
               useView: Boolean = true): Seq[Seq[String]] = {
    val lower = path.toLowerCase
    if (lower.endsWith(".xlsx") || lower.endsWith(".xlsm"))
      XlsxReader.readRows(path, sheet, useView)
    else {
      val stream = workbookStream(Files.readAllBytes(Paths.get(path)))
      parseWorkbook(stream, sheet, useView)
    }
  }

  // ---- OLE2 / CFB container ------------------------------------------------

  private def le(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  private[sources] def workbookStream(file: Array[Byte]): Array[Byte] = {
    val buf = le(file)
    require(buf.getLong(0) == 0xE11AB1A1E011CFD0L, s"not an OLE2 compound file")
    val sectorSize = 1 << buf.getShort(30)
    val miniSectorSize = 1 << buf.getShort(32)
    val firstDirSector = buf.getInt(48)
    val miniCutoff = buf.getInt(56)
    val firstMiniFatSector = buf.getInt(60)
    val numMiniFat = buf.getInt(64)
    val firstDifatSector = buf.getInt(68)

    def sectorOffset(s: Int): Int = 512 + s * sectorSize

    // DIFAT: 109 header entries + chained DIFAT sectors
    val difat = mutable.ArrayBuffer[Int]()
    for (i <- 0 until 109) {
      val v = buf.getInt(76 + i * 4)
      if (v >= 0) difat += v
    }
    var difatSector = firstDifatSector
    while (difatSector >= 0) {
      val off = sectorOffset(difatSector)
      for (i <- 0 until (sectorSize / 4 - 1)) {
        val v = buf.getInt(off + i * 4)
        if (v >= 0) difat += v
      }
      difatSector = buf.getInt(off + sectorSize - 4)
    }
    // FAT
    val fat = mutable.ArrayBuffer[Int]()
    difat.foreach { fs =>
      val off = sectorOffset(fs)
      for (i <- 0 until sectorSize / 4) fat += buf.getInt(off + i * 4)
    }
    def chain(start: Int): Seq[Int] = {
      val sectors = mutable.ArrayBuffer[Int]()
      var s = start
      while (s >= 0) { sectors += s; s = fat(s) }
      sectors.toSeq
    }
    def readChain(start: Int, size: Int): Array[Byte] = {
      val out = new Array[Byte](size)
      var pos = 0
      chain(start).foreach { s =>
        val n = math.min(sectorSize, size - pos)
        if (n > 0) { System.arraycopy(file, sectorOffset(s), out, pos, n); pos += n }
      }
      out
    }
    // Directory entries (128 bytes each)
    val dirBytes = {
      val sectors = chain(firstDirSector)
      val out = new Array[Byte](sectors.size * sectorSize)
      sectors.zipWithIndex.foreach { case (s, i) =>
        System.arraycopy(file, sectorOffset(s), out, i * sectorSize, sectorSize)
      }
      out
    }
    val dbuf = le(dirBytes)
    case class DirEntry(name: String, start: Int, size: Int)
    val entries = (0 until dirBytes.length / 128).map { i =>
      val base = i * 128
      val nameLen = dbuf.getShort(base + 64)
      val name =
        if (nameLen >= 2)
          new String(dirBytes, base, nameLen - 2, "UTF-16LE")
        else ""
      DirEntry(name, dbuf.getInt(base + 116), dbuf.getInt(base + 120))
    }
    val root = entries.head // Root Entry holds the mini stream
    val wb = entries.find(e => e.name == "Workbook" || e.name == "Book")
      .getOrElse(throw new IllegalArgumentException("no Workbook stream in XLS file"))

    if (wb.size >= miniCutoff) readChain(wb.start, wb.size)
    else {
      // mini stream: 64-byte sectors inside the root entry's stream,
      // chained through the miniFAT
      val miniStream = readChain(root.start, root.size)
      val miniFatBytes = {
        val sectors = chain(firstMiniFatSector).take(numMiniFat)
        val out = new Array[Byte](sectors.size * sectorSize)
        sectors.zipWithIndex.foreach { case (s, i) =>
          System.arraycopy(file, sectorOffset(s), out, i * sectorSize, sectorSize)
        }
        out
      }
      val mbuf = le(miniFatBytes)
      val out = new Array[Byte](wb.size)
      var pos = 0
      var s = wb.start
      while (s >= 0 && pos < wb.size) {
        val n = math.min(miniSectorSize, wb.size - pos)
        System.arraycopy(miniStream, s * miniSectorSize, out, pos, n)
        pos += n
        s = mbuf.getInt(s * 4)
      }
      out
    }
  }

  // ---- BIFF8 records -------------------------------------------------------

  private case class Record(id: Int, data: Array[Byte], pos: Int)

  private def records(stream: Array[Byte]): Iterator[Record] = new Iterator[Record] {
    private val buf = le(stream)
    private var p = 0
    def hasNext: Boolean = p + 4 <= stream.length
    def next(): Record = {
      val id = buf.getShort(p) & 0xFFFF
      val len = buf.getShort(p + 2) & 0xFFFF
      val rec = Record(id, stream.slice(p + 4, p + 4 + len), p)
      p += 4 + len
      rec
    }
  }

  private val BOF = 0x809
  private val EOF_R = 0x0A
  private val BOUNDSHEET = 0x85
  private val SST = 0xFC
  private val CONTINUE = 0x3C
  private val LABELSST = 0xFD
  private val LABEL = 0x204
  private val NUMBER = 0x203
  private val RK = 0x27E
  private val MULRK = 0xBD
  private val BOOLERR = 0x205
  private val FORMULA = 0x06
  private val STRING_R = 0x207
  private val XF = 0xE0
  private val FORMAT_R = 0x41E
  private val DATEMODE = 0x22

  private[sources] def parseWorkbook(stream: Array[Byte], sheet: Option[String],
                                     useView: Boolean = true): Seq[Seq[String]] = {
    // Pass 1 (globals): SST, BOUNDSHEET positions, XF → format index,
    // custom FORMAT strings, 1900/1904 DATEMODE
    var sst = Vector.empty[String]
    val sheets = mutable.ArrayBuffer[(String, Int)]() // name -> BOF offset
    val pending = mutable.ArrayBuffer[Record]()
    val xfFormats = mutable.ArrayBuffer[Int]()       // XF index -> ifmt
    val customFormats = mutable.Map[Int, String]()   // ifmt -> format string
    var date1904 = false
    var lastWasSst = false
    records(stream).foreach { r =>
      r.id match {
        case BOUNDSHEET =>
          val b = le(r.data)
          val bofPos = b.getInt(0)
          val nameLen = r.data(6) & 0xFF
          val grbit = r.data(7) & 0xFF
          val name =
            if ((grbit & 1) == 0) new String(r.data, 8, nameLen, "ISO-8859-1")
            else new String(r.data, 8, nameLen * 2, "UTF-16LE")
          sheets += name -> bofPos
          lastWasSst = false
        case SST => pending += r; lastWasSst = true
        case CONTINUE if lastWasSst => pending += r
        case XF =>
          xfFormats += (le(r.data).getShort(2) & 0xFFFF)
          lastWasSst = false
        case FORMAT_R =>
          val b = le(r.data)
          val ifmt = b.getShort(0) & 0xFFFF
          val cch = b.getShort(2) & 0xFFFF
          val grbit = r.data(4) & 0xFF
          customFormats(ifmt) =
            if ((grbit & 1) == 0) new String(r.data, 5, cch, "ISO-8859-1")
            else new String(r.data, 5, cch * 2, "UTF-16LE")
          lastWasSst = false
        case DATEMODE =>
          date1904 = (le(r.data).getShort(0) & 0xFFFF) == 1
          lastWasSst = false
        case _ => lastWasSst = false
      }
    }
    if (pending.nonEmpty) sst = parseSst(pending.toSeq)

    // use_view rendering: numeric cell + date XF -> formatted date
    // string; raw mode (use_view false, task.py:325-326) keeps the
    // stored serial — no date detection at all
    def renderNum(v: Double, xf: Int): String =
      if (useView && v >= 0 && xf < xfFormats.length &&
          isDateFormat(xfFormats(xf), customFormats)) xlDateString(v, date1904)
      else fmtNum(v)

    val sheetPos = sheet match {
      case Some(s) =>
        // name or numeric index, like xlrd
        s.toIntOption match {
          case Some(i) if i < sheets.size => sheets(i)._2
          case _ => sheets.find(_._1 == s).map(_._2)
            .getOrElse(throw new IllegalArgumentException(s"sheet not found: $s"))
        }
      case None => sheets.headOption.map(_._2)
        .getOrElse(throw new IllegalArgumentException("workbook has no sheets"))
    }

    // Pass 2: cells of the selected sheet substream
    val cells = mutable.Map[(Int, Int), String]()
    val sub = records(stream.drop(sheetPos))
    var done = false
    var pendingFormulaCell: Option[(Int, Int)] = None
    var depth = 0
    while (sub.hasNext && !done) {
      val r = sub.next()
      val b = le(r.data)
      r.id match {
        case BOF => depth += 1
        case EOF_R => depth -= 1; if (depth <= 0) done = true
        case LABELSST =>
          cells((b.getShort(0) & 0xFFFF, b.getShort(2) & 0xFFFF)) = sst(b.getInt(6))
        case LABEL =>
          val cch = b.getShort(6) & 0xFFFF
          val grbit = r.data(8) & 0xFF
          val s =
            if ((grbit & 1) == 0) new String(r.data, 9, cch, "ISO-8859-1")
            else new String(r.data, 9, cch * 2, "UTF-16LE")
          cells((b.getShort(0) & 0xFFFF, b.getShort(2) & 0xFFFF)) = s
        case NUMBER =>
          cells((b.getShort(0) & 0xFFFF, b.getShort(2) & 0xFFFF)) =
            renderNum(b.getDouble(6), b.getShort(4) & 0xFFFF)
        case RK =>
          cells((b.getShort(0) & 0xFFFF, b.getShort(2) & 0xFFFF)) =
            renderNum(decodeRk(b.getInt(6)), b.getShort(4) & 0xFFFF)
        case MULRK =>
          val row = b.getShort(0) & 0xFFFF
          val firstCol = b.getShort(2) & 0xFFFF
          val nCells = (r.data.length - 6) / 6
          for (i <- 0 until nCells)
            cells((row, firstCol + i)) =
              renderNum(decodeRk(b.getInt(4 + i * 6 + 2)), b.getShort(4 + i * 6) & 0xFFFF)
        case BOOLERR =>
          val isErr = r.data(7) != 0
          val v = r.data(6) & 0xFF
          cells((b.getShort(0) & 0xFFFF, b.getShort(2) & 0xFFFF)) =
            if (isErr) s"#ERR$v" else if (v != 0) "true" else "false"
        case FORMULA =>
          val row = b.getShort(0) & 0xFFFF
          val colIdx = b.getShort(2) & 0xFFFF
          val resultBytes = r.data.slice(6, 14)
          val rb = le(resultBytes)
          if ((resultBytes(6) == -1) && (resultBytes(7) == -1)) {
            resultBytes(0) match {
              case 0 => pendingFormulaCell = Some((row, colIdx)) // string follows
              case 1 => cells((row, colIdx)) = if (resultBytes(2) != 0) "true" else "false"
              case _ => cells((row, colIdx)) = ""
            }
          } else cells((row, colIdx)) = renderNum(rb.getDouble(0), b.getShort(4) & 0xFFFF)
        case STRING_R =>
          pendingFormulaCell.foreach { rc =>
            val cch = b.getShort(0) & 0xFFFF
            val grbit = r.data(2) & 0xFF
            cells(rc) =
              if ((grbit & 1) == 0) new String(r.data, 3, cch, "ISO-8859-1")
              else new String(r.data, 3, cch * 2, "UTF-16LE")
          }
          pendingFormulaCell = None
        case _ => ()
      }
    }
    if (cells.isEmpty) return Seq.empty
    val maxRow = cells.keys.map(_._1).max
    val maxCol = cells.keys.map(_._2).max
    (0 to maxRow).map(r => (0 to maxCol).map(c => cells.getOrElse((r, c), null)))
  }

  /** SST across CONTINUE boundaries. Each string may restart with a fresh
    * grbit byte at a continuation — the classic BIFF8 subtlety.
    */
  private def parseSst(recs: Seq[Record]): Vector[String] = {
    val out = mutable.ArrayBuffer[String]()
    var recIdx = 0
    var pos = 8 // skip total/unique counts in the SST record
    val count = le(recs.head.data).getInt(4)

    def data = recs(recIdx).data
    def avail = data.length - pos
    def advance(): Unit = { recIdx += 1; pos = 0 }
    def u8(): Int = { val v = data(pos) & 0xFF; pos += 1; v }
    def u16(): Int = {
      if (avail < 2) advance()
      val v = le(data).getShort(pos) & 0xFFFF; pos += 2; v
    }

    for (_ <- 0 until count) {
      if (avail < 3) advance()
      val cch = u16()
      var grbit = u8()
      val richCount = if ((grbit & 8) != 0) u16() else 0
      val extLen = if ((grbit & 4) != 0) {
        if (avail < 4) advance()
        val v = le(data).getInt(pos); pos += 4; v
      } else 0
      val sb = new StringBuilder
      var remaining = cch
      while (remaining > 0) {
        if (avail == 0) { advance(); grbit = u8() } // continuation restates grbit
        val wide = (grbit & 1) != 0
        val charSize = if (wide) 2 else 1
        val n = math.min(remaining, avail / charSize)
        if (n == 0 && avail > 0 && wide) { // split mid-char: impossible per spec
          advance(); grbit = u8()
        } else {
          sb.append(new String(data, pos, n * charSize, if (wide) "UTF-16LE" else "ISO-8859-1"))
          pos += n * charSize
          remaining -= n
        }
      }
      // skip rich runs / ext data (may span records)
      var skip = richCount * 4 + extLen
      while (skip > 0) {
        if (avail == 0) advance()
        val n = math.min(skip, avail)
        pos += n; skip -= n
      }
      out += sb.toString
    }
    out.toVector
  }

  /** RK: 30-bit value; bit0 = /100, bit1 = integer. */
  private def decodeRk(rk: Int): Double = {
    val base =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  /** Integral doubles print without ".0" — the way a cell displays. */
  private[sources] def fmtNum(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** Built-in date/time number-format ids (xlrd's is_date_format_string
    * tables): 14-22 date/time, 27-36 East-Asian date, 45-47 elapsed,
    * 50-58 East-Asian date.
    */
  private val builtinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** Is the XF's number format a date/time display? Custom format strings
    * are scanned for date tokens (y/m/d/h/s) after stripping `"quoted"`
    * literals, `[bracketed]` colors/locales, and `\`-escaped chars — the
    * shape of xlrd's heuristic. Elapsed `[h]:mm` still matches via its
    * `mm` body.
    */
  private[sources] def isDateFormat(ifmt: Int, custom: collection.Map[Int, String]): Boolean =
    builtinDateFmts(ifmt) || custom.get(ifmt).exists { f =>
      val sb = new StringBuilder
      var i = 0
      var inQ = false
      var inB = false
      while (i < f.length) {
        val c = f.charAt(i)
        if (inQ) { if (c == '"') inQ = false }
        else if (inB) { if (c == ']') inB = false }
        else c match {
          case '"'  => inQ = true
          case '['  => inB = true
          case '\\' => i += 1
          case _    => sb.append(c)
        }
        i += 1
      }
      sb.toString.toLowerCase.exists("ymdhs".contains(_))
    }

  /** Excel serial → the string petl's CSV sink prints for the
    * datetime/time object xlutils.view yields: xlrd xldate_as_tuple rules
    * (round the day fraction to whole seconds, carry 86400 into the next
    * day, serial-61 phantom-leap-day offset in 1900 mode, 1904 epoch),
    * then `yyyy-MM-dd HH:mm:ss` — or `HH:mm:ss` when the day part is 0.
    */
  private val ambiguous1900Warned = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def warnAmbiguous1900(xldays: Long): Unit =
    if (ambiguous1900Warned.compareAndSet(false, true))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ambiguous 1900-mode Excel serial $xldays (< 61): rendering " +
          "proleptically from 1899-12-31 where xlrd raises XLDateAmbiguous " +
          "(further occurrences not logged)")

  private[sources] def xlDateString(serial: Double, date1904: Boolean): String = {
    var xldays = serial.toLong
    var seconds = math.round((serial - xldays) * 86400.0)
    if (seconds == 86400L) { seconds = 0; xldays += 1 }
    val h = seconds / 3600
    val mi = (seconds / 60) % 60
    val s = seconds % 60
    if (xldays == 0) f"$h%02d:$mi%02d:$s%02d"
    else {
      val d =
        if (date1904) java.time.LocalDate.of(1904, 1, 1).plusDays(xldays)
        // xlrd raises XLDateAmbiguous below 61 (the phantom 1900-02-29);
        // we render proleptically rather than fail the file — a DELIBERATE
        // deviation (serial 60 prints 1900-03-01 where Excel shows the
        // phantom 1900-02-29, and serials 1-59 render where xlrd errors),
        // surfaced via a once-per-JVM warning so the substitution is
        // observable
        else if (xldays < 61) {
          warnAmbiguous1900(xldays)
          java.time.LocalDate.of(1899, 12, 31).plusDays(xldays)
        }
        else java.time.LocalDate.of(1899, 12, 31).plusDays(xldays - 1)
      f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d $h%02d:$mi%02d:$s%02d"
    }
  }
}
