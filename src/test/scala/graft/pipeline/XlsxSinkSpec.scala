package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the minimal OOXML writer: XML escaping, cell
  * typing, width rule, column letters past Z.
  */
class XlsxSinkSpec extends AnyFunSuite {

  test("special characters are escaped and survive the XML round-trip") {
    val bytes = XlsxSink.build(
      Seq("Vendor", "N"),
      Seq(Seq("A&B <Supplies> \"Ltd\"", 7L), Seq(null, 2.5)))
    val entries = graft.kernel.ZipExplode.entries(bytes).toMap
    val sheet = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(entries("xl/worksheets/sheet1.xml")))
    val rows = sheet.getElementsByTagName("row")
    assert(rows.getLength == 3)
    val r2 = rows.item(1).getChildNodes
    assert(r2.item(0).getTextContent == "A&B <Supplies> \"Ltd\"")
    // numeric cell carries a plain <v>, no inlineStr attr
    assert(r2.item(1).getAttributes.getNamedItem("t") == null)
    assert(r2.item(1).getTextContent == "7")
    // null renders as empty string cell
    assert(rows.item(2).getChildNodes.item(0).getTextContent == "")
  }

  test("width rule and column letters") {
    val w = XlsxSink.columnWidths(Seq("ab", "x"), Seq(Seq("hello", 123456L)))
    assert(w == Seq(5 + 2, 6 + 2))
    assert(XlsxSink.colLetter(0) == "A")
    assert(XlsxSink.colLetter(25) == "Z")
    assert(XlsxSink.colLetter(26) == "AA")
    assert(XlsxSink.colLetter(27 * 26) == "AAA")
  }
}
