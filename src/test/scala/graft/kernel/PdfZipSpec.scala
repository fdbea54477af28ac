package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class PdfZipSpec extends AnyFunSuite {

  test("pdf writer/reader: multi-page text layer") {
    val pdf = PdfText.build(Seq(
      PdfText.TextPageSpec(Seq("Invoice Number: INV-11111", "Total: $10.00")),
      PdfText.TextPageSpec(Seq("page two line one", "line (with) parens \\ backslash"))))
    assert(MimeSniffer.sniff(pdf) == MimeSniffer.Pdf)
    val pages = PdfText.extractPages(pdf)
    assert(pages.length == 2)
    assert(pages(0) == PdfText.TextPage("Invoice Number: INV-11111\nTotal: $10.00"))
    assert(pages(1) == PdfText.TextPage("page two line one\nline (with) parens \\ backslash"))
  }

  test("pdf image page surfaces raster for OCR fallback") {
    val (gray, w, h) = GlyphFont.render(Seq("TOTAL: $55.00"), scale = 2)
    val pdf = PdfText.build(Seq(
      PdfText.TextPageSpec(Seq("text page")),
      PdfText.ImagePageSpec(gray, w, h)))
    val pages = PdfText.extractPages(pdf)
    assert(pages.length == 2)
    assert(pages(0) == PdfText.TextPage("text page"))
    pages(1) match {
      case PdfText.ImagePage(g, pw, ph) =>
        assert(pw == w && ph == h)
        assert(OcrStandin.ocrGray(g, pw, ph) == "TOTAL: $55.00")
      case other => fail(s"expected ImagePage, got $other")
    }
  }

  test("zip build/explode roundtrip skips directories") {
    val entries = Seq(
      "a.txt" -> "hello".getBytes,
      "sub/b.pdf" -> PdfText.build(Seq(PdfText.TextPageSpec(Seq("inner")))))
    val zip = ZipExplode.build(entries)
    assert(MimeSniffer.sniff(zip) == MimeSniffer.Zip)
    val got = ZipExplode.entries(zip)
    assert(got.map(_._1) == Seq("a.txt", "sub/b.pdf"))
    assert(new String(got(0)._2) == "hello")
    assert(PdfText.extractPages(got(1)._2) == Seq(PdfText.TextPage("inner")))
  }

  test("zip build is deterministic") {
    val e = Seq("x" -> "payload".getBytes)
    assert(ZipExplode.build(e).toSeq == ZipExplode.build(e).toSeq)
  }
}
