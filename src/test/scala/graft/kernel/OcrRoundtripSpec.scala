package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class OcrRoundtripSpec extends AnyFunSuite {

  private val invoiceLines = Seq(
    "ACME SUPPLY CO",
    "12 MAIN ST",
    "SPRINGFIELD, IL 62704",
    "INVOICE NUMBER: INV-88412",
    "INVOICE DATE: 14 MAR 2024",
    "SUBTOTAL: $2,450.00",
    "TAX: $196.00",
    "TOTAL: $2,646.00")

  test("clean render roundtrips exactly") {
    val (gray, w, h) = GlyphFont.render(invoiceLines, scale = 2)
    assert(OcrStandin.ocrGray(gray, w, h) == invoiceLines.mkString("\n"))
  }

  test("full charset roundtrips") {
    val lines = Seq(
      "ABCDEFGHIJKLM",
      "NOPQRSTUVWXYZ",
      "0123456789",
      "-:,.$#/ END")
    val (gray, w, h) = GlyphFont.render(lines, scale = 2)
    assert(OcrStandin.ocrGray(gray, w, h) == lines.mkString("\n"))
  }

  test("noisy render still roundtrips (despeckle)") {
    val rng = new java.util.Random(7)
    val (gray, w, h) = GlyphFont.render(invoiceLines, scale = 2, noise = 40, rng = rng)
    assert(OcrStandin.ocrGray(gray, w, h) == invoiceLines.mkString("\n"))
  }

  test("skewed render roundtrips (Hough deskew)") {
    for (angle <- Seq(-3.0, -1.5, 1.0, 2.5)) {
      val (gray, w, h) = GlyphFont.render(invoiceLines, scale = 3, skewDeg = angle)
      val got = OcrStandin.ocrGray(gray, w, h)
      assert(got == invoiceLines.mkString("\n"), s"at angle $angle")
    }
  }

  test("skew + noise roundtrips") {
    val rng = new java.util.Random(11)
    val (gray, w, h) =
      GlyphFont.render(invoiceLines, scale = 3, skewDeg = 2.0, noise = 30, rng = rng)
    assert(OcrStandin.ocrGray(gray, w, h) == invoiceLines.mkString("\n"))
  }

  test("png and jpeg encode/decode roundtrip") {
    val lines = Seq("TOTAL: $123.45")
    val (gray, w, h) = GlyphFont.render(lines, scale = 2)
    val png = GlyphFont.toPng(gray, w, h)
    assert(MimeSniffer.sniff(png) == MimeSniffer.Png)
    val imgP = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(OcrStandin.ocrImage(imgP) == "TOTAL: $123.45")
    val jpg = GlyphFont.toJpeg(gray, w, h)
    assert(MimeSniffer.sniff(jpg) == MimeSniffer.Jpeg)
    val imgJ = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(OcrStandin.ocrImage(imgJ) == "TOTAL: $123.45")
  }

  test("sanitize maps arbitrary text into the charset") {
    assert(GlyphFont.sanitize("Fish & Chips (daily)!") == "FISH CHIPS DAILY")
    assert(GlyphFont.sanitize("Invoice Number: INV-1") == "INVOICE NUMBER: INV-1")
  }

  test("otsu threshold on a bimodal histogram") {
    val gray = Array.fill(100)(20.toByte) ++ Array.fill(100)(220.toByte)
    val t = ImageOps.otsuThreshold(gray)
    assert(t >= 20 && t < 220)
  }

  test("empty page gives empty text") {
    val (gray, w, h) = GlyphFont.render(Seq("   "), scale = 2)
    assert(OcrStandin.ocrGray(gray, w, h) == "")
  }
}
