package graft.sources

import scala.collection.mutable

/** Minimal XLSX (OPC/OOXML) reader — the sibling of [[XlsReader]]'s
  * from-scratch BIFF8 path, covering the file real users drop into the
  * capture folder today even though the reference itself is .xls-only
  * (task.py:328 reads via xlrd, which dropped xlsx support in 2.0).
  * Same bounded scope and the SAME output contract as the BIFF8 reader:
  * header = first row, every value a string, numbers in compact-decimal
  * form, numeric cells whose style carries a date/time number format
  * rendered through the Excel serial rules (`use_view=True` view
  * semantics, 1900/1904 datemode honored via `workbookPr date1904`) —
  * both formats route through [[XlsReader.read]] by extension, so a
  * task's `xls-csv` config needs no change.
  *
  * Parsed parts: `xl/workbook.xml` (sheet order/names, date1904),
  * `xl/_rels/workbook.xml.rels` (sheet targets), `xl/sharedStrings.xml`
  * (t runs concatenated), `xl/styles.xml` (cellXfs numFmtId + custom
  * numFmts, fed to the shared [[XlsReader]] date-format heuristic), and
  * the selected worksheet's `sheetData`. Cell types: shared string,
  * inline string, formula-cached string (`t="str"`), boolean, error
  * (rendered as its display text, e.g. `#DIV/0!` — OOXML stores the
  * text where BIFF8 stored a code), and numeric (with or without a
  * cached formula). Driver-side parse like the BIFF8 path — XLS(X)
  * inputs in this DSL are operational files, not the 100 TB path.
  */
object XlsxReader {

  def readRows(path: String, sheet: Option[String],
               useView: Boolean = true): Seq[Seq[String]] = {
    val zip = new java.util.zip.ZipFile(path)
    try {
      def entry(name: String): Option[scala.xml.Elem] =
        Option(zip.getEntry(name)).map { e =>
          val in = zip.getInputStream(e)
          try scala.xml.XML.load(in) finally in.close()
        }
      val workbook = entry("xl/workbook.xml").getOrElse(
        throw new IllegalArgumentException(s"$path: not an xlsx (no xl/workbook.xml)"))
      val date1904 = (workbook \ "workbookPr").headOption
        .flatMap(_.attribute("date1904")).map(_.text)
        .exists(v => v == "1" || v == "true")
      val rels = entry("xl/_rels/workbook.xml.rels")
        .map(r => (r \ "Relationship").map(n =>
          (n \@ "Id") -> (n \@ "Target")).toMap)
        .getOrElse(Map.empty)
      val sheetsInOrder: Seq[(String, String)] = (workbook \ "sheets" \ "sheet")
        .map { s =>
          val rid = s.attributes.collectFirst {
            case a: scala.xml.Attribute if a.key == "id" => a.value.text
          }.getOrElse("")
          val target = rels.getOrElse(rid, "worksheets/sheet1.xml")
          val norm =
            if (target.startsWith("/")) target.stripPrefix("/")
            else s"xl/$target"
          (s \@ "name") -> norm
        }
      val sheetPath = (sheet match {
        case Some(s) => s.toIntOption match {
          case Some(i) if i >= 0 && i < sheetsInOrder.size =>
            Some(sheetsInOrder(i))
          case _ => sheetsInOrder.find(_._1 == s).orElse(
            throw new IllegalArgumentException(s"sheet not found: $s"))
        }
        case None => sheetsInOrder.headOption.orElse(
          throw new IllegalArgumentException("workbook has no sheets"))
      }).get._2

      // top-level <t> plus rich-text <r><t> runs ONLY — the descendant
      // axis would also pick up phonetic-guide runs (<rPh><t>furigana),
      // corrupting cells from East-Asian workbooks with reading text
      def siText(si: scala.xml.Node): String =
        ((si \ "t") ++ (si \ "r" \ "t")).map(_.text).mkString
      val sst: Vector[String] = entry("xl/sharedStrings.xml")
        .map(e => (e \ "si").map(siText).toVector)
        .getOrElse(Vector.empty)

      // style index -> numFmtId, plus custom formatCode strings — handed
      // to the SAME date-format heuristic and serial renderer as BIFF8
      val (xfFormats, customFormats) = entry("xl/styles.xml") match {
        case Some(st) =>
          val xfs = (st \ "cellXfs" \ "xf")
            .map(x => (x \@ "numFmtId") match {
              case "" => 0
              case v  => v.toInt
            }).toIndexedSeq
          val custom = (st \ "numFmts" \ "numFmt")
            .map(n => (n \@ "numFmtId").toInt -> (n \@ "formatCode")).toMap
          (xfs, custom)
        case None => (IndexedSeq.empty[Int], Map.empty[Int, String])
      }
      def renderNum(raw: String, styleIdx: Int): String = {
        val v = raw.toDouble
        // raw mode (use_view false): stored serial, no date rendering
        if (useView && v >= 0 && styleIdx >= 0 && styleIdx < xfFormats.length &&
            XlsReader.isDateFormat(xfFormats(styleIdx), customFormats))
          XlsReader.xlDateString(v, date1904)
        else XlsReader.fmtNum(v)
      }

      val ws = entry(sheetPath).getOrElse(
        throw new IllegalArgumentException(s"$path: missing $sheetPath"))
      val cells = mutable.Map[(Int, Int), String]()
      // ECMA-376 makes the r attribute on <row> and <c> OPTIONAL —
      // streaming writers rely on implied sequential position, so track
      // "previous + 1" fallbacks alongside the explicit references
      var impliedRow = -1
      (ws \ "sheetData" \ "row").foreach { row =>
        val rowIdx = (row \@ "r") match {
          case "" => impliedRow + 1
          case r  => r.toInt - 1
        }
        impliedRow = rowIdx
        var impliedCol = -1
        (row \ "c").foreach { c =>
          val ref = c \@ "r" // e.g. "BC12"
          val letters = ref.takeWhile(_.isLetter)
          val colIdx =
            if (letters.isEmpty) impliedCol + 1
            // toUpper: some non-Excel writers emit lowercase refs, and
            // 'a' - 'A' + 1 would otherwise fold to column 33
            else letters.foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1
          impliedCol = colIdx
          val t = c \@ "t"
          val v = (c \ "v").headOption.map(_.text)
          val value: Option[String] = t match {
            case "s"         => v.map(i => sst(i.toInt))
            case "str"       => v
            case "inlineStr" =>
              Some((((c \ "is" \ "t") ++ (c \ "is" \ "r" \ "t")))
                .map(_.text).mkString)
            case "b"         => v.map(b => if (b != "0") "true" else "false")
            case "e"         => v
            case _ =>
              val si = (c \@ "s") match { case "" => -1; case s => s.toInt }
              v.map(renderNum(_, si))
          }
          value.foreach(cells((rowIdx, colIdx)) = _)
        }
      }
      if (cells.isEmpty) return Seq.empty
      val maxRow = cells.keys.map(_._1).max
      val maxCol = cells.keys.map(_._2).max
      (0 to maxRow).map(r => (0 to maxCol).map(c => cells.getOrElse((r, c), null)))
    } finally zip.close()
  }
}
