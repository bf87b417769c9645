package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import graft.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** Excel (.xlsx) read/write, mirroring the reference's calamine-based
  * `read_excel` (reference: src/io/read.rs:18-67 — first sheet by
  * default, first row is the header, Int/Float/String/Bool cells) and
  * xlsxwriter-based `to_excel` (write.rs:10-69 — numbers as numbers,
  * booleans as "TRUE"/"FALSE" strings, nulls as blanks).
  *
  * Implemented directly on the OOXML container (a zip of XML parts) with
  * only JDK facilities — the build is offline, so no spark-excel/POI.
  * Excel is an inherently driver-scale format (the sheet grid caps at
  * ~1M rows): `read` parses on the driver and parallelizes the rows out;
  * `write` collects. Both ends document that boundary; bulk data belongs
  * in parquet/CSV, xlsx is an interchange edge.
  */
object ExcelSource {

  // ---- write ---------------------------------------------------------------

  def write(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit = {
    val cols = df.columns
    val rows = df.collect() // driver-scale by design; see scaladoc
    val sheet = new StringBuilder
    sheet ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sheet ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    def cellRef(r: Int, c: Int): String = colLetters(c) + (r + 1)
    def strCell(r: Int, c: Int, v: String): String =
      s"""<c r="${cellRef(r, c)}" t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
    def numCell(r: Int, c: Int, v: Any): String =
      s"""<c r="${cellRef(r, c)}"><v>$v</v></c>"""
    sheet ++= "<row r=\"1\">" + cols.indices.map(i => strCell(0, i, cols(i))).mkString + "</row>"
    rows.zipWithIndex.foreach { case (row, ri) =>
      sheet ++= s"""<row r="${ri + 2}">"""
      cols.indices.foreach { ci =>
        row.get(ci) match {
          case null                  => () // blank cell = omitted cell
          case b: Boolean            => sheet ++= strCell(ri + 1, ci, if (b) "TRUE" else "FALSE")
          case n @ (_: Long | _: Int | _: Short | _: Byte | _: Double | _: Float) =>
            sheet ++= numCell(ri + 1, ci, n)
          case other                 => sheet ++= strCell(ri + 1, ci, other.toString)
        }
      }
      sheet ++= "</row>"
    }
    sheet ++= "</sheetData></worksheet>"

    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" -> sheet.toString)

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    } finally zos.close()
  }

  // ---- read ----------------------------------------------------------------

  /** First sheet by default (like the reference); header from row 1;
    * numeric cells that parse as integral become longs, other numerics
    * doubles, the rest strings — the same widening as `read_csv`. */
  def read(spark: SparkSession, path: String, sheetName: Option[String] = None): DataFrame = {
    val (header, data) = parseSheet(path, sheetName)
    Graft.fromColumns(spark, data, header)
  }

  /** Engine-independent sheet parse: (ordered header, column -> cells).
    * Runs wherever it is called — the V2 connector calls it inside a
    * PartitionReader on an EXECUTOR, keeping the driver out of the data
    * path. */
  def parseSheet(path: String, sheetName: Option[String] = None): (Seq[String], Map[String, Seq[Any]]) = {
    val zip = new ZipFile(path)
    try {
      val sheetPath = locateSheet(zip, sheetName)
      val shared = readSharedStrings(zip)
      val sheetXml = readEntry(zip, sheetPath)
      val doc = parseXml(sheetXml)
      val rowNodes = elementsByTag(doc.getDocumentElement, "row")
      require(rowNodes.nonEmpty, s"read_excel: sheet $sheetPath has no rows")

      // (rowIdx, colIdx) -> value, from explicit cell refs (sparse grid).
      val cells = mutable.Map.empty[(Int, Int), Any]
      var maxCol = -1
      var maxRow = -1
      var minCol = Int.MaxValue
      var minRow = Int.MaxValue
      rowNodes.foreach { rn =>
        elementsByTag(rn, "c").foreach { c =>
          val ref = c.getAttribute("r")
          require(ref.nonEmpty, "read_excel: cell without a reference")
          val (ri, ci) = parseRef(ref)
          maxCol = math.max(maxCol, ci); maxRow = math.max(maxRow, ri)
          minCol = math.min(minCol, ci); minRow = math.min(minRow, ri)
          val t = c.getAttribute("t")
          val value: Any = t match {
            case "s" => // shared-string index
              shared(firstTagText(c, "v").trim.toInt)
            case "inlineStr" =>
              elementsByTag(c, "is").headOption.map(is => firstTagText(is, "t")).getOrElse("")
            case "b" =>
              firstTagText(c, "v").trim == "1"
            case "str" =>
              firstTagText(c, "v")
            case _ =>
              val raw = firstTagText(c, "v").trim
              if (raw.isEmpty) null else inferNumeric(raw)
          }
          if (value != null) cells((ri, ci)) = value
        }
      }

      // Range-relative addressing, like the reference's calamine
      // worksheet_range: the used range starts at the first occupied
      // cell, so a sheet whose data begins at B2 still yields its first
      // column/row as the first DataFrame column/header.
      val header = (minCol to maxCol).map(ci =>
        cells.getOrElse((minRow, ci), s"col${ci - minCol}").toString)
      val data: Map[String, Seq[Any]] = header.zipWithIndex.map { case (h, i) =>
        h -> (minRow + 1 to maxRow).map(ri => cells.getOrElse((ri, minCol + i), null): Any)
      }.toMap
      (header, data)
    } finally zip.close()
  }

  // ---- helpers -------------------------------------------------------------

  private def inferNumeric(raw: String): Any =
    try {
      val d = raw.toDouble
      if (d.isWhole && !raw.contains('.') && !raw.toLowerCase.contains('e')) raw.toLong else d
    } catch { case _: NumberFormatException => raw }

  private def locateSheet(zip: ZipFile, sheetName: Option[String]): String = {
    val wb = parseXml(readEntry(zip, "xl/workbook.xml"))
    val sheets = elementsByTag(wb.getDocumentElement, "sheet")
    require(sheets.nonEmpty, "read_excel: no sheets found")
    val idx = sheetName match {
      case None => 0
      case Some(n) =>
        val i = sheets.indexWhere(_.getAttribute("name") == n)
        require(i >= 0, s"read_excel: sheet '$n' not found")
        i
    }
    // Resolve the sheet's r:id through workbook.xml.rels (robust against
    // non-sequential sheet file names).
    val rid = sheets(idx).getAttribute("r:id")
    val rels = parseXml(readEntry(zip, "xl/_rels/workbook.xml.rels"))
    val rel = elementsByTag(rels.getDocumentElement, "Relationship")
      .find(_.getAttribute("Id") == rid)
    val target = rel.map(_.getAttribute("Target")).getOrElse(s"worksheets/sheet${idx + 1}.xml")
    if (target.startsWith("/")) target.drop(1) else s"xl/$target"
  }

  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) IndexedSeq.empty
    else {
      val doc = parseXml(readEntry(zip, "xl/sharedStrings.xml"))
      elementsByTag(doc.getDocumentElement, "si").map { si =>
        // a shared string may be split into runs: concatenate every <t>
        elementsByTag(si, "t").map(_.getTextContent).mkString
      }.toIndexedSeq
    }
  }

  private def readEntry(zip: ZipFile, name: String): String = {
    val e = zip.getEntry(name)
    require(e != null, s"read_excel: missing zip entry $name")
    val in = zip.getInputStream(e)
    try {
      val out = new ByteArrayOutputStream()
      in.transferTo(out)
      out.toString(StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def parseXml(s: String): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(s.getBytes(StandardCharsets.UTF_8)))
  }

  private def elementsByTag(e: org.w3c.dom.Element, tag: String): Seq[org.w3c.dom.Element] = {
    val nl = e.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  private def firstTagText(e: org.w3c.dom.Element, tag: String): String =
    elementsByTag(e, tag).headOption.map(_.getTextContent).getOrElse("")

  /** "BC23" -> (22, 54): 0-based row and column. */
  def parseRef(ref: String): (Int, Int) = {
    val (letters, digits) = ref.span(_.isLetter)
    val ci = letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
    (digits.toInt - 1, ci)
  }

  def colLetters(ci: Int): String = {
    var n = ci + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '&' => "&amp;"
      case '"' => "&quot;"
      case c   => c.toString
    }
}
