package graft.pipeline

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** S9 — minimal OOXML (.xlsx) workbook writer. The reference exports
  * invoices to Excel with openpyxl (reference app/utils/exporter.py:
  * 99-117): one sheet named "Invoices", header row, auto column widths
  * of max(cell string length) + 2 computed over every cell INCLUDING
  * the header. No POI jar exists in this environment, but an xlsx is
  * just a ZIP of XML parts — this writer emits the five mandatory
  * parts with inline strings (no sharedStrings table) and numeric
  * cells for integral values, which any xlsx reader (openpyxl, Excel,
  * LibreOffice) accepts.
  */
object XlsxSink {

  /** Build one workbook: a header row plus `rows`, sheet `sheetName`,
    * reference-rule column widths. Cell typing mirrors pandas
    * to_excel: numbers (Int/Long/Double) as numeric cells, everything
    * else as inline strings; null renders as an empty string cell.
    */
  def build(
      headers: Seq[String],
      rows: Iterable[Seq[Any]],
      sheetName: String = "Invoices"): Array[Byte] = {
    val widths = columnWidths(headers, rows)
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="${escape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/worksheets/sheet1.xml", sheetXml(headers, rows, widths))
    zip.close()
    bos.toByteArray
  }

  /** Reference width rule (exporter.py:105-116): per column,
    * max(len(str(cell))) over header + data cells, + 2.
    */
  def columnWidths(headers: Seq[String], rows: Iterable[Seq[Any]]): Seq[Int] = {
    val w = headers.map(_.length).toArray
    rows.foreach { r =>
      var i = 0
      r.foreach { cell =>
        if (i < w.length) w(i) = math.max(w(i), cellString(cell).length)
        i += 1
      }
    }
    w.map(_ + 2).toSeq
  }

  private def cellString(v: Any): String = v match {
    case null => ""
    case s: String => s
    case other => other.toString
  }

  private def isNumeric(v: Any): Boolean = v match {
    case _: Int | _: Long | _: Short | _: Byte | _: Double | _: Float => true
    case _ => false
  }

  /** Column index (0-based) → A1-style letter. */
  def colLetter(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def sheetXml(
      headers: Seq[String], rows: Iterable[Seq[Any]], widths: Seq[Int]): String = {
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">\n<cols>")
    widths.zipWithIndex.foreach { case (w, i) =>
      sb.append(s"""<col min="${i + 1}" max="${i + 1}" width="$w" customWidth="1"/>""")
    }
    sb.append("</cols>\n<sheetData>\n")
    def row(r: Int, cells: Seq[Any]): Unit = {
      sb.append(s"""<row r="$r">""")
      cells.zipWithIndex.foreach { case (v, i) =>
        val ref = s"${colLetter(i)}$r"
        if (isNumeric(v))
          sb.append(s"""<c r="$ref"><v>${cellString(v)}</v></c>""")
        else
          sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${escape(cellString(v))}</t></is></c>""")
      }
      sb.append("</row>\n")
    }
    row(1, headers)
    var r = 2
    rows.foreach { cells => row(r, cells); r += 1 }
    sb.append("</sheetData>\n</worksheet>")
    sb.toString
  }
}
