package graft.sources

import graft.SparkSpec
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** XlsReader spec over a hand-built BIFF8 workbook in a minimal OLE2
  * container (no XLS writer exists offline, so the fixture is constructed
  * byte-by-byte — which also pins the container/record layouts we claim to
  * parse).
  */
class XlsReaderSpec extends SparkSpec {

  // ---- BIFF8 record builders ----------------------------------------------

  private def rec(id: Int, data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(id.toShort).putShort(data.length.toShort).put(data)
    b.array()
  }

  private def bof(substreamType: Int): Array[Byte] = {
    val d = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    d.putShort(0x0600.toShort).putShort(substreamType.toShort)
    rec(0x809, d.array())
  }

  private def sst(strings: Seq[String]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    head.putInt(strings.size).putInt(strings.size)
    body.write(head.array())
    strings.foreach { s =>
      val b = ByteBuffer.allocate(3 + s.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(s.length.toShort).put(0.toByte).put(s.getBytes("ISO-8859-1"))
      body.write(b.array())
    }
    rec(0xFC, body.toByteArray)
  }

  private def boundsheet(bofPos: Int, name: String): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + name.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(bofPos).putShort(0).put(name.length.toByte).put(0.toByte)
      .put(name.getBytes("ISO-8859-1"))
    rec(0x85, b.array())
  }

  private def labelSst(row: Int, col: Int, isst: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(row.toShort).putShort(col.toShort).putShort(0).putInt(isst)
    rec(0xFD, b.array())
  }

  private def number(row: Int, col: Int, v: Double, xf: Int = 0): Array[Byte] = {
    val b = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(row.toShort).putShort(col.toShort).putShort(xf.toShort).putDouble(v)
    rec(0x203, b.array())
  }

  private def rkNum(row: Int, col: Int, intVal: Int, xf: Int = 0): Array[Byte] = {
    val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(row.toShort).putShort(col.toShort).putShort(xf.toShort)
      .putInt((intVal << 2) | 2) // integer RK encoding
    rec(0x27E, b.array())
  }

  /** XF record: only the ifmt (offset 2) is read; rest zeroed. */
  private def xf(ifmt: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(0).putShort(ifmt.toShort)
    rec(0xE0, b.array())
  }

  /** Custom FORMAT record (compressed 8-bit string form). */
  private def format(ifmt: Int, fmt: String): Array[Byte] = {
    val b = ByteBuffer.allocate(5 + fmt.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(ifmt.toShort).putShort(fmt.length.toShort).put(0.toByte)
      .put(fmt.getBytes("ISO-8859-1"))
    rec(0x41E, b.array())
  }

  private def datemode(is1904: Boolean): Array[Byte] = {
    val b = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(if (is1904) 1.toShort else 0.toShort)
    rec(0x22, b.array())
  }

  /** MULRK: run of integer RK cells from firstCol, one (xf, rk) pair each. */
  private def mulRk(row: Int, firstCol: Int, vals: Seq[Int], xf: Int = 0): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + vals.size * 6 + 2).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(row.toShort).putShort(firstCol.toShort)
    vals.foreach { v => b.putShort(xf.toShort).putInt((v << 2) | 2) }
    b.putShort((firstCol + vals.size - 1).toShort)
    rec(0xBD, b.array())
  }

  private def boolErr(row: Int, col: Int, value: Boolean): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(row.toShort).putShort(col.toShort).putShort(0)
      .put((if (value) 1 else 0).toByte).put(0.toByte) // fErr=0 -> boolean
    rec(0x205, b.array())
  }

  /** FORMULA with a cached numeric result. */
  private def formulaNum(row: Int, col: Int, v: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(row.toShort).putShort(col.toShort).putShort(0)
    b.putDouble(v)          // cached result (not the 0xFFFF-tagged form)
    b.putShort(0).putInt(0) // grbit + chn
    b.putShort(0)           // cce = 0 (no formula tokens needed for parsing)
    rec(0x06, b.array())
  }

  /** FORMULA whose cached result is a string (tag 0) + following STRING record. */
  private def formulaStr(row: Int, col: Int, s: String): Array[Byte] = {
    val f = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
    f.putShort(row.toShort).putShort(col.toShort).putShort(0)
    f.put(0.toByte).put(0.toByte).putInt(0).putShort(0xFFFF.toShort) // string-result tag
    f.putShort(0).putInt(0).putShort(0)
    val sr = ByteBuffer.allocate(3 + s.length).order(ByteOrder.LITTLE_ENDIAN)
    sr.putShort(s.length.toShort).put(0.toByte).put(s.getBytes("ISO-8859-1"))
    concat(rec(0x06, f.array()), rec(0x207, sr.array()))
  }

  private val eofRec = rec(0x0A, Array.empty)

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  /** Workbook stream: globals (BOF, SST, BOUNDSHEET, EOF) + one sheet. */
  private def workbook(): Array[Byte] = {
    val strings = Seq("name", "qty", "apple", "pear")
    val sheetCells = concat(
      bof(0x10),
      labelSst(0, 0, 0), labelSst(0, 1, 1),  // header: name, qty
      labelSst(1, 0, 2), number(1, 1, 5.0),  // apple, 5
      labelSst(2, 0, 3), rkNum(2, 1, 7),     // pear, 7
      eofRec)
    // globals size depends on the boundsheet record itself (fixed name)
    val globalsFor = (pos: Int) => concat(bof(0x05), sst(strings), boundsheet(pos, "Sheet1"), eofRec)
    val globalsLen = globalsFor(0).length
    concat(globalsFor(globalsLen), sheetCells)
  }

  /** Wrap a stream as an OLE2 compound file: FAT sector + directory sector
    * + stream sectors; mini-cutoff forced to 0 so the stream always lives
    * in the regular FAT.
    */
  private def ole2(stream: Array[Byte]): Array[Byte] = {
    val sectorSize = 512
    val nStreamSectors = (stream.length + sectorSize - 1) / sectorSize
    val totalSectors = 2 + nStreamSectors // 0=FAT, 1=dir, 2..=stream
    val out = ByteBuffer.allocate(512 + totalSectors * sectorSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    // header
    out.putLong(0, 0xE11AB1A1E011CFD0L)
    out.putShort(30, 9)   // sector shift (512)
    out.putShort(32, 6)   // mini sector shift
    out.putInt(44, 1)     // number of FAT sectors
    out.putInt(48, 1)     // first directory sector
    out.putInt(56, 0)     // mini stream cutoff: 0 → never use ministream
    out.putInt(60, -2)    // first miniFAT sector
    out.putInt(64, 0)     // miniFAT count
    out.putInt(68, -2)    // first DIFAT sector
    out.putInt(72, 0)     // DIFAT sector count
    out.putInt(76, 0)     // DIFAT[0] = FAT at sector 0
    for (i <- 1 until 109) out.putInt(76 + i * 4, -1)
    // FAT (sector 0)
    val fatBase = 512
    out.putInt(fatBase, -3)     // sector 0: FAT itself
    out.putInt(fatBase + 4, -2) // sector 1: directory, end of chain
    for (i <- 0 until nStreamSectors) {
      val sector = 2 + i
      val next = if (i == nStreamSectors - 1) -2 else sector + 1
      out.putInt(fatBase + sector * 4, next)
    }
    for (i <- (2 + nStreamSectors) until sectorSize / 4) out.putInt(fatBase + i * 4, -1)
    // directory (sector 1): Root Entry + Workbook
    val dirBase = 512 + sectorSize
    def dirEntry(idx: Int, name: String, objType: Byte, start: Int, size: Int): Unit = {
      val base = dirBase + idx * 128
      val utf16 = name.getBytes("UTF-16LE")
      for (i <- utf16.indices) out.put(base + i, utf16(i))
      out.putShort(base + 64, (utf16.length + 2).toShort)
      out.put(base + 66, objType)
      out.putInt(base + 116, start)
      out.putInt(base + 120, size)
    }
    dirEntry(0, "Root Entry", 5, -2, 0)
    dirEntry(1, "Workbook", 2, 2, stream.length)
    // stream sectors
    for (i <- stream.indices) out.put(512 + 2 * sectorSize + i, stream(i))
    out.array()
  }

  private def fixture(): String = {
    val path = s"${tmpDir("graft_xls_")}/test.xls"
    Files.write(Paths.get(path), ole2(workbook()))
    path
  }

  /** Workbook with XF/FORMAT/DATEMODE records and date-formatted cells.
    * XF 0: general; XF 1: built-in 14 (m/d/yy); XF 2: custom date;
    * XF 3: custom non-date number; XF 4: built-in 21 (h:mm:ss).
    */
  private def dateWorkbook(is1904: Boolean): Array[Byte] = {
    val strings = Seq("d")
    val sheetCells = concat(
      bof(0x10),
      labelSst(0, 0, 0),
      number(1, 0, 44927.0, xf = 1),          // 2023-01-01, built-in date
      number(2, 0, 44927.520833333336, xf = 2), // custom date fmt, 12:30:00
      number(3, 0, 44927.0, xf = 3),          // custom NON-date fmt: stays numeric
      number(4, 0, 0.75, xf = 4),             // time-only
      rkNum(5, 0, 100, xf = 1),               // RK cell with date XF
      eofRec)
    val globalsFor = (pos: Int) => concat(
      bof(0x05),
      datemode(is1904),
      format(164, "dd/mm/yyyy hh:mm"),
      format(165, "#,##0.00"),
      xf(0), xf(14), xf(164), xf(165), xf(21),
      sst(strings), boundsheet(pos, "Sheet1"), eofRec)
    val globalsLen = globalsFor(0).length
    concat(globalsFor(globalsLen), sheetCells)
  }

  private def dateFixture(is1904: Boolean = false): String = {
    val path = s"${tmpDir("graft_xls_")}/dates.xls"
    Files.write(Paths.get(path), ole2(dateWorkbook(is1904)))
    path
  }

  test("reads header + typed cells from a BIFF8 workbook") {
    val rows = XlsReader.readRows(fixture(), None)
    assert(rows == Seq(
      Seq("name", "qty"),
      Seq("apple", "5"),
      Seq("pear", "7")))
  }

  test("sheet selection by name and by index") {
    val path = fixture()
    assert(XlsReader.readRows(path, Some("Sheet1")).size == 3)
    assert(XlsReader.readRows(path, Some("0")).size == 3)
    assertThrows[IllegalArgumentException](XlsReader.readRows(path, Some("Nope")))
  }

  test("read() yields an all-string DataFrame with the header as schema") {
    val df = XlsReader.read(spark, fixture(), None)
    assert(df.columns.toSeq == Seq("name", "qty"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 2)
  }

  test("MULRK, BOOLERR and FORMULA (numeric + cached-string) cells parse") {
    val strings = Seq("h")
    val sheetCells = concat(
      bof(0x10),
      labelSst(0, 0, 0),
      mulRk(1, 0, Seq(10, 20, 30)),
      boolErr(2, 0, value = true), boolErr(2, 1, value = false),
      formulaNum(3, 0, 6.25),
      formulaStr(3, 1, "cached"),
      eofRec)
    val globalsFor = (pos: Int) =>
      concat(bof(0x05), sst(strings), boundsheet(pos, "S"), eofRec)
    val globalsLen = globalsFor(0).length
    val wb = concat(globalsFor(globalsLen), sheetCells)
    val path = s"${tmpDir("graft_xls_")}/records.xls"
    Files.write(Paths.get(path), ole2(wb))
    val rows = XlsReader.readRows(path, None)
    assert(rows(1) == Seq("10", "20", "30"))
    assert(rows(2).take(2) == Seq("true", "false"))
    assert(rows(3) == Seq("6.25", "cached", null)) // dense grid pads to maxCol
  }

  test("use_view date formatting: date XFs render as date strings, 1900 mode") {
    val rows = XlsReader.readRows(dateFixture(), None)
    assert(rows(1) == Seq("2023-01-01 00:00:00"), "built-in date format id")
    assert(rows(2) == Seq("2023-01-01 12:30:00"), "custom date format string")
    assert(rows(3) == Seq("44927"), "custom non-date format stays numeric")
    assert(rows(4) == Seq("18:00:00"), "day part 0 renders time-only")
    // serial 100 in 1900 mode, < 61 region rule does not apply: 1900-04-09
    assert(rows(5) == Seq("1900-04-09 00:00:00"), "RK cell honours its date XF")
  }

  test("use_view date formatting: 1904 datemode shifts the epoch") {
    val rows = XlsReader.readRows(dateFixture(is1904 = true), None)
    // serial 44927 in the 1904 system = 2027-01-02
    assert(rows(1) == Seq("2027-01-02 00:00:00"))
    // serial 100 = 1904-01-01 + 100 days
    assert(rows(5) == Seq("1904-04-10 00:00:00"))
  }

  test("use_view false: BIFF numerics keep raw serials, no date rendering") {
    // xlrd raw mode (reference task.py:325-326): stored values verbatim
    val rows = XlsReader.readRows(dateFixture(), None, useView = false)
    assert(rows(1) == Seq("44927"), "built-in date XF stays a serial")
    assert(rows(2) == Seq("44927.520833333336"), "custom date XF stays a serial")
    assert(rows(3) == Seq("44927"), "non-date numeric unchanged")
    assert(rows(4) == Seq("0.75"), "time fraction stays a fraction")
    assert(rows(5) == Seq("100"), "RK cell with date XF stays a serial")
    // and the flag must not disturb non-numeric cells
    assert(rows(0) == Seq("d"))
  }

  test("non-OLE2 input is rejected") {
    val path = s"${tmpDir("graft_xls_")}/bad.xls"
    Files.write(Paths.get(path), "not an xls".getBytes)
    assertThrows[IllegalArgumentException](XlsReader.readRows(path, None))
  }

  // ── XLSX (OPC) path ──────────────────────────────────────────────────

  private def xlsxFixture(parts: Map[String, String],
                          suffix: String = ".xlsx"): String = {
    val f = java.nio.file.Files.createTempFile("graft_xlsx_", suffix)
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(f))
    parts.foreach { case (name, content) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    out.close()
    f.toString
  }

  private def stdXlsx(date1904: Boolean = false): String = xlsxFixture(Map(
    "xl/workbook.xml" ->
      s"""<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |  <workbookPr date1904="${if (date1904) "1" else "0"}"/>
         |  <sheets>
         |    <sheet name="Data" sheetId="1" r:id="rId1"/>
         |    <sheet name="Other" sheetId="2" r:id="rId2"/>
         |  </sheets>
         |</workbook>""".stripMargin,
    "xl/_rels/workbook.xml.rels" ->
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
        |  <Relationship Id="rId2" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin,
    "xl/sharedStrings.xml" ->
      """<sst><si><t>name</t></si><si><r><t>är</t></r><r><t>ger</t></r></si></sst>""",
    "xl/styles.xml" ->
      """<styleSheet>
        |  <numFmts><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd"/></numFmts>
        |  <cellXfs>
        |    <xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/>
        |  </cellXfs>
        |</styleSheet>""".stripMargin,
    "xl/worksheets/sheet1.xml" ->
      """<worksheet><sheetData>
        |  <row r="1">
        |    <c r="A1" t="s"><v>0</v></c>
        |    <c r="B1" t="inlineStr"><is><t>qty</t></is></c>
        |    <c r="C1" t="s"><v>0</v></c>
        |  </row>
        |  <row r="2">
        |    <c r="A2" t="s"><v>1</v></c>
        |    <c r="B2"><v>42</v></c>
        |    <c r="C2" s="1"><v>45000</v></c>
        |  </row>
        |  <row r="3">
        |    <c r="A3" t="str"><f>X</f><v>cached</v></c>
        |    <c r="B3" t="b"><v>1</v></c>
        |    <c r="C3" s="2"><v>0.5</v></c>
        |  </row>
        |  <row r="5">
        |    <c r="C5" t="e"><v>#DIV/0!</v></c>
        |  </row>
        |</sheetData></worksheet>""".stripMargin,
    "xl/worksheets/sheet2.xml" ->
      """<worksheet><sheetData>
        |  <row r="1"><c r="A1" t="inlineStr"><is><t>other</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin))

  test("xlsx: shared/inline/formula strings, numbers, bools, errors, sparse rows") {
    val rows = XlsReader.readRows(stdXlsx(), None)
    assert(rows(0) == Seq("name", "qty", "name"))
    assert(rows(1) == Seq("ärger", "42", XlsReader.xlDateString(45000, date1904 = false)),
      s"shared-string runs concatenate; date style renders: ${rows(1)}")
    assert(rows(2) == Seq("cached", "true", "12:00:00"),
      s"formula-cached string, bool, custom-date time-only: ${rows(2)}")
    assert(rows(3) == Seq(null, null, null), "skipped row is all null")
    assert(rows(4) == Seq(null, null, "#DIV/0!"), "error cell keeps its display text")
  }

  test("xlsx: sheet selection by name and index; 1904 epoch honored") {
    val path = stdXlsx()
    assert(XlsReader.readRows(path, Some("Other")) == Seq(Seq("other")))
    assert(XlsReader.readRows(path, Some("1")) == Seq(Seq("other")))
    assertThrows[IllegalArgumentException](XlsReader.readRows(path, Some("Nope")))
    val r1904 = XlsReader.readRows(stdXlsx(date1904 = true), None)
    assert(r1904(1)(2) == XlsReader.xlDateString(45000, date1904 = true))
    assert(r1904(1)(2) != XlsReader.readRows(path, None)(1)(2),
      "1904 epoch must shift the rendered date")
  }

  test("xlsx: use_view false keeps raw stored numerics, no date rendering") {
    val rows = XlsReader.readRows(stdXlsx(), None, useView = false)
    assert(rows(1) == Seq("ärger", "42", "45000"),
      s"date-styled serial stays raw: ${rows(1)}")
    assert(rows(2) == Seq("cached", "true", "0.5"),
      s"custom-date 0.5 stays a fraction: ${rows(2)}")
  }

  test("xlsx: lowercase cell references fold to the correct columns") {
    // some non-Excel writers emit lowercase refs; 'a' must mean column 0
    // (and 'aa' column 26), not the garbage 'a'-'A'+1 would produce
    val path = xlsxFixture(Map(
      "xl/workbook.xml" ->
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |  <sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |  <Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData>
          |  <row r="1">
          |    <c r="a1" t="inlineStr"><is><t>x</t></is></c>
          |    <c r="b1"><v>7</v></c>
          |  </row>
          |</sheetData></worksheet>""".stripMargin))
    val rows = XlsReader.readRows(path, None)
    assert(rows == Seq(Seq("x", "7")),
      s"lowercase refs must land in columns 0 and 1: $rows")
  }

  test("xlsx: cells and rows without r attributes take implied sequential positions") {
    // ECMA-376 makes r optional on <row> and <c>; streaming writers omit
    // them — and a phonetic-guide run (rPh) must not leak into values
    val path = xlsxFixture(Map(
      "xl/workbook.xml" ->
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |  <sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |  <Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/sharedStrings.xml" ->
        """<sst><si><t>東京</t><rPh sb="0" eb="2"><t>トウキョウ</t></rPh></si></sst>""",
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData>
          |  <row><c t="s"><v>0</v></c><c><v>7</v></c></row>
          |  <row><c t="inlineStr"><is><t>x</t></is></c><c r="C2"><v>9</v></c></row>
          |</sheetData></worksheet>""".stripMargin))
    val rows = XlsReader.readRows(path, None)
    assert(rows(0) == Seq("東京", "7", null),
      s"implied positions + phonetic runs excluded: ${rows(0)}")
    assert(rows(1) == Seq("x", null, "9"),
      s"explicit ref after implied cells resumes correctly: ${rows(1)}")
    // negative numeric sheet selector falls through to not-found, not a crash
    assertThrows[IllegalArgumentException](XlsReader.readRows(path, Some("-1")))
  }

  test("xlsx: read() routes by extension into the same all-string DataFrame contract") {
    val df = XlsReader.read(spark, stdXlsx(), None)
    assert(df.columns.length == 3)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 4)
    val bad = xlsxFixture(Map("nope.txt" -> "x"))
    assertThrows[IllegalArgumentException](XlsReader.readRows(bad, None))
  }
}
