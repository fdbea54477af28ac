package graft.kernel

import scala.collection.mutable.ArrayBuffer
import java.nio.charset.StandardCharsets

/** Minimal PDF reader/writer pair for the engine's text-layer path.
  *
  * Reader: parses the xref-less essentials of a PDF — object graph, the
  * /Pages → /Kids order, per-page /Contents streams — and extracts the
  * text layer from `Tj`/`TJ` operators ("PDF text-layer parsing with
  * fallback to OCR inference", BASELINE.json north_star; the reference
  * delegates page handling to PyMuPDF, app/utils/file_handler.py:163-186).
  * Pages whose content is an image XObject (no text operators) surface
  * as [[ImagePage]] rasters for the OCR stand-in.
  *
  * Writer ([[build]]): authors the uncompressed single-font PDFs the
  * fixtures use (FIXTURES.md §1) — valid PDF 1.4 with xref table, one
  * content stream per page, text via `BT/Td/Tj/ET`, rasters as
  * 8-bit /DeviceGray image XObjects with no filter.
  */
object PdfText {

  sealed trait Page
  /** Text-layer page: lines joined with \n. */
  final case class TextPage(text: String) extends Page
  /** Rasterized page (gray 8-bit, row-major) for the OCR path. */
  final case class ImagePage(gray: Array[Byte], width: Int, height: Int) extends Page

  // -------------------------------------------------------------------------
  // Reader
  // -------------------------------------------------------------------------

  /** Extract pages in /Kids document order. */
  def extractPages(bytes: Array[Byte]): Seq[Page] = {
    // ISO-8859-1 maps bytes 1:1 to chars, so binary streams survive.
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val objects = parseObjects(s)
    val pagesObj = objects.collectFirst {
      case (_, dict, _) if dict.contains("/Type /Pages") => dict
    }.getOrElse(return Nil)
    val kids = refList(pagesObj, "/Kids")
    kids.flatMap { pageNum =>
      objects.find(_._1 == pageNum).flatMap { case (_, pageDict, _) =>
        ref(pageDict, "/Contents").flatMap { contentNum =>
          objects.find(_._1 == contentNum).map { case (_, contentDict, stream) =>
            parseContent(stream, pageDict, objects)
          }
        }
      }
    }
  }

  /** (objNum, dictText, streamBytes as ISO-8859-1 string or ""). */
  private def parseObjects(s: String): Seq[(Int, String, String)] = {
    val out = ArrayBuffer.empty[(Int, String, String)]
    val objPat = java.util.regex.Pattern.compile("(\\d+)\\s+0\\s+obj")
    val m = objPat.matcher(s)
    while (m.find()) {
      val num = m.group(1).toInt
      val bodyStart = m.end
      val end = s.indexOf("endobj", bodyStart)
      if (end > 0) {
        val body = s.substring(bodyStart, end)
        val streamIdx = body.indexOf("stream")
        if (streamIdx >= 0) {
          val dict = body.substring(0, streamIdx)
          var dataStart = streamIdx + "stream".length
          if (dataStart < body.length && body.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < body.length && body.charAt(dataStart) == '\n') dataStart += 1
          val dataEnd = body.lastIndexOf("endstream")
          val raw = if (dataEnd > dataStart) body.substring(dataStart, dataEnd) else ""
          // strip the single trailing EOL the writer places before endstream
          val stream = if (raw.endsWith("\n")) raw.dropRight(1) else raw
          out += ((num, dict, stream))
        } else out += ((num, body, ""))
      }
    }
    out.toSeq
  }

  private def ref(dict: String, key: String): Option[Int] = {
    val p = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(key) + "\\s+(\\d+)\\s+0\\s+R")
    val m = p.matcher(dict)
    if (m.find()) Some(m.group(1).toInt) else None
  }

  private def refList(dict: String, key: String): Seq[Int] = {
    val p = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(key) + "\\s*\\[([^\\]]*)\\]")
    val m = p.matcher(dict)
    if (!m.find()) return Nil
    val inner = m.group(1)
    val rp = java.util.regex.Pattern.compile("(\\d+)\\s+0\\s+R").matcher(inner)
    val out = ArrayBuffer.empty[Int]
    while (rp.find()) out += rp.group(1).toInt
    out.toSeq
  }

  /** Text ops if present; else resolve the page's image XObject. */
  private def parseContent(
      stream: String,
      pageDict: String,
      objects: Seq[(Int, String, String)]): Page = {
    val text = extractTextOps(stream)
    if (text.nonEmpty) TextPage(text.mkString("\n"))
    else {
      // image-only page: find the XObject the content stream Do-invokes
      val xobj = {
        val p = java.util.regex.Pattern.compile("/Im\\d+\\s+(\\d+)\\s+0\\s+R")
        val m = p.matcher(pageDict)
        if (m.find()) Some(m.group(1).toInt) else None
      }
      xobj.flatMap(num => objects.find(_._1 == num)).map {
        case (_, dict, data) =>
          val w = intVal(dict, "/Width").getOrElse(0)
          val h = intVal(dict, "/Height").getOrElse(0)
          if (w > 0 && h > 0 && data.length >= w * h) {
            val gray = new Array[Byte](w * h)
            var i = 0
            while (i < w * h) { gray(i) = data.charAt(i).toByte; i += 1 }
            ImagePage(gray, w, h)
          } else TextPage("")
      }.getOrElse(TextPage(""))
    }
  }

  private def intVal(dict: String, key: String): Option[Int] = {
    val p = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(key) + "\\s+(\\d+)")
    val m = p.matcher(dict)
    if (m.find()) Some(m.group(1).toInt) else None
  }

  /** Pull strings from `(...) Tj` and `[...] TJ` operators, one line per
    * operator, honoring PDF string escapes.
    */
  def extractTextOps(stream: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    val n = stream.length
    while (i < n) {
      if (stream.charAt(i) == '(') {
        val sb = new StringBuilder
        var j = i + 1
        var done = false
        while (j < n && !done) {
          stream.charAt(j) match {
            case '\\' if j + 1 < n =>
              stream.charAt(j + 1) match {
                case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
                case 't' => sb.append('\t')
                case c => sb.append(c)
              }
              j += 2
            case ')' => done = true; j += 1
            case c => sb.append(c); j += 1
          }
        }
        // is the operator after this string (skipping ws/]) Tj or TJ?
        var k = j
        while (k < n && (stream.charAt(k).isWhitespace || stream.charAt(k) == ']')) k += 1
        if (k + 1 < n && stream.charAt(k) == 'T' &&
          (stream.charAt(k + 1) == 'j' || stream.charAt(k + 1) == 'J'))
          out += sb.toString
        i = j
      } else i += 1
    }
    out.toSeq
  }

  // -------------------------------------------------------------------------
  // Writer (fixtures)
  // -------------------------------------------------------------------------

  sealed trait PageSpec
  final case class TextPageSpec(lines: Seq[String]) extends PageSpec
  final case class ImagePageSpec(gray: Array[Byte], width: Int, height: Int) extends PageSpec

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** Author a valid uncompressed PDF 1.4 with the given pages. */
  def build(pages: Seq[PageSpec]): Array[Byte] = {
    val objs = ArrayBuffer.empty[String] // bodies, 1-indexed by position+1
    val pageObjNums = ArrayBuffer.empty[Int]
    // obj 1 = catalog, obj 2 = pages; children appended after
    def addObj(body: String): Int = { objs += body; objs.length }

    objs += "" // placeholder obj 1 (catalog)
    objs += "" // placeholder obj 2 (pages)

    pages.foreach {
      case TextPageSpec(lines) =>
        val content = new StringBuilder("BT\n/F1 12 Tf\n72 760 Td\n")
        lines.zipWithIndex.foreach { case (line, i) =>
          if (i > 0) content.append("0 -14 Td\n")
          content.append("(").append(escape(line)).append(") Tj\n")
        }
        content.append("ET")
        val cs = content.toString
        val contentNum = addObj(
          s"<< /Length ${cs.length} >>\nstream\n$cs\nendstream")
        val pageNum = addObj(
          s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            s"/Resources << /Font << /F1 ${0} >> >> /Contents $contentNum 0 R >>")
        pageObjNums += pageNum
      case ImagePageSpec(gray, w, h) =>
        val data = new StringBuilder(w * h)
        gray.foreach(g => data.append((g & 0xff).toChar))
        val imgNum = addObj(
          s"<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
            s"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length ${w * h} >>\n" +
            s"stream\n$data\nendstream")
        val cs = s"q\n$w 0 0 $h 72 ${760 - h} cm\n/Im0 Do\nQ"
        val contentNum = addObj(
          s"<< /Length ${cs.length} >>\nstream\n$cs\nendstream")
        val pageNum = addObj(
          s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            s"/Resources << /XObject << /Im0 $imgNum 0 R >> >> " +
            s"/Contents $contentNum 0 R >>")
        pageObjNums += pageNum
    }
    // font object shared by text pages
    val fontNum = addObj(
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objs(0) = "<< /Type /Catalog /Pages 2 0 R >>"
    objs(1) = s"<< /Type /Pages /Kids [${pageObjNums.map(n => s"$n 0 R").mkString(" ")}] " +
      s"/Count ${pageObjNums.length} >>"
    // patch the font placeholder reference in page resources
    val bodies = objs.zipWithIndex.map { case (b, i) =>
      (i + 1, b.replace("/F1 0 >>", s"/F1 $fontNum 0 R >>"))
    }

    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    val offsets = ArrayBuffer.empty[Int]
    bodies.foreach { case (num, body) =>
      offsets += sb.length
      sb.append(s"$num 0 obj\n").append(body).append("\nendobj\n")
    }
    val xrefPos = sb.length
    sb.append(s"xref\n0 ${bodies.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${bodies.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefPos\n%%EOF\n")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }
}
