package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** F11/F12/F14 — word boxes, line/block layout, table-cell rows from
  * the OCR stand-in.
  */
class OcrDetailedSpec extends AnyFunSuite {

  test("words carry bounding boxes in reading order") {
    val (gray, w, h) = GlyphFont.render(Seq("TOTAL: $12.00"), scale = 2)
    val r = OcrStandin.ocrDetailed(gray, w, h)
    assert(r.text == "TOTAL: $12.00")
    assert(r.lines.length == 1)
    val words = r.lines.head.words
    assert(words.map(_.text) == Seq("TOTAL:", "$12.00"))
    // boxes are x-ordered, non-overlapping, within the raster
    assert(words(0).x1 < words(1).x0)
    words.foreach { wd =>
      assert(wd.x0 >= 0 && wd.x1 < w && wd.y0 >= 0 && wd.y1 < h)
      assert(wd.x0 < wd.x1 && wd.y0 < wd.y1)
    }
  }

  test("table rows: words of a line become cells") {
    val (gray, w, h) = GlyphFont.render(
      Seq("WIDGET 2 3.50 7.00", "GADGET 1 1.00 1.00"), scale = 2)
    val r = OcrStandin.ocrDetailed(gray, w, h)
    assert(r.tableRows == Seq(
      Seq("WIDGET", "2", "3.50", "7.00"),
      Seq("GADGET", "1", "1.00", "1.00")))
    // the GCV items path consumes these rows (skipping the header)
    val items = FieldExtract.extractItems(Seq(r.tableRows))
    assert(items.length == 1 && items.head.description.contains("GADGET"))
  }

  test("blocks split on vertical whitespace") {
    // render two paragraphs separated by two blank lines
    val (gray, w, h) = GlyphFont.render(
      Seq("FIRST BLOCK LINE", "SECOND LINE", "", "", "NEW BLOCK"), scale = 2)
    val r = OcrStandin.ocrDetailed(gray, w, h)
    assert(r.blocks.length == 2)
    assert(r.blocks(0).map(_.text) == Seq("FIRST BLOCK LINE", "SECOND LINE"))
    assert(r.blocks(1).map(_.text) == Seq("NEW BLOCK"))
  }

  test("skew angle is reported") {
    val (gray, w, h) = GlyphFont.render(Seq("SKEWED TEXT LINE HERE"),
      scale = 3, skewDeg = 2.0)
    val r = OcrStandin.ocrDetailed(gray, w, h)
    assert(math.abs(r.skewDeg - 2.0) <= 0.5, r.skewDeg.toString)
    assert(r.text == "SKEWED TEXT LINE HERE")
  }
}
