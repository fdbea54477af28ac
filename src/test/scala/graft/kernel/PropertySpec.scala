package graft.kernel

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5.2): decimal round-trips, span order
  * preservation, ZIP explode multiset identity, validator tolerance
  * boundary, sniff/extension agreement, glyph roundtrip over the
  * whole charset.
  */
class PropertySpec extends AnyFunSuite {

  /** Drive scalacheck directly (the scalatestplus bridge isn't in the
    * offline artifact cache).
    */
  private def check(p: Prop, minSuccessful: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, res.status.toString)
  }

  test("parseDecimal round-trips any cents value with currency junk") {
    check(Prop.forAll(Gen.chooseNum(0L, 99999999L), Gen.oneOf("$", "USD ", "", "  $")) {
      (cents, junk) =>
        val s = f"$junk${cents / 100}%d.${cents % 100}%02d"
        FieldExtract.parseDecimal(s)
          .contains(BigDecimal(cents) / 100)
    })
  }

  test("parseDecimal: negatives and garbage") {
    check(Prop.forAll(Gen.chooseNum(1L, 999999L)) { cents =>
      FieldExtract.parseDecimal(f"-$$${cents / 100}%d.${cents % 100}%02d")
        .contains(BigDecimal(-cents) / 100)
    })
    assert(FieldExtract.parseDecimal("no digits").isEmpty)
  }

  test("zip explode returns exactly the built entry multiset, in order") {
    val entryGen = for {
      n <- Gen.chooseNum(0, 8)
      names <- Gen.listOfN(n, Gen.identifier.map(_.take(12)))
      bodies <- Gen.listOfN(n, Gen.listOf(Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray))
    } yield names.zipWithIndex.map { case (nm, i) => (s"$i-$nm", bodies(i)) }
    check(Prop.forAll(entryGen) { entries =>
      val got = ZipExplode.entries(ZipExplode.build(entries))
      got.map(_._1) == entries.map(_._1) &&
        got.zip(entries).forall { case ((_, a), (_, b)) => a.sameElements(b) }
    })
  }

  test("validator totals tolerance boundary is exactly 0.01") {
    // |grand + taxes - final| <= 0.01 passes; > 0.01 warns (validator.py:98)
    import graft.model._
    def mismatchWarns(deltaCents: Int): Boolean = {
      val g = BigDecimal("100.00"); val t = BigDecimal("10.00")
      val f = g + t + BigDecimal(deltaCents) / 100
      (g + t - f).abs > BigDecimal("0.01")
    }
    assert(!mismatchWarns(0))
    assert(!mismatchWarns(1)) // exactly 0.01 -> no warning (strict >)
    assert(mismatchWarns(2))
    assert(mismatchWarns(-2))
  }

  test("pdf build/extract round-trips arbitrary printable text lines") {
    val lineGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(40)),
      Gen.const("with (parens) and \\ slash"),
      Gen.const("Total: $1,234.56"))).map(_.take(6))
    val pagesGen = Gen.listOf(lineGen).map(_.take(4)).suchThat(_.nonEmpty)
    check(Prop.forAll(pagesGen) { pages =>
      val pdf = PdfText.build(pages.map(PdfText.TextPageSpec(_)))
      val got = PdfText.extractPages(pdf)
      got == pages.map(p => PdfText.TextPage(p.mkString("\n")))
    })
  }

  test("glyph render/ocr identity over random charset strings") {
    val charGen = Gen.oneOf(
      ('A' to 'Z') ++ ('0' to '9') ++ Seq('-', ':', ',', '.', '$', '#', '/'))
    val lineGen = Gen.listOfN(12, charGen).map(_.mkString)
      .suchThat(s => s.trim == s && s.nonEmpty)
    check(Prop.forAll(Gen.listOfN(3, lineGen)) { lines =>
      val (gray, w, h) = GlyphFont.render(lines, scale = 2)
      OcrStandin.ocrGray(gray, w, h) == lines.mkString("\n")
    }, minSuccessful = 30)
  }

  test("mime sniff beats extension for every self-authored format") {
    val (gray, w, h) = GlyphFont.render(Seq("X"), scale = 2)
    val cases = Seq(
      GlyphFont.toPng(gray, w, h) -> MimeSniffer.Png,
      GlyphFont.toJpeg(gray, w, h) -> MimeSniffer.Jpeg,
      PdfText.build(Seq(PdfText.TextPageSpec(Seq("x")))) -> MimeSniffer.Pdf,
      ZipExplode.build(Seq("a" -> Array[Byte](1))) -> MimeSniffer.Zip)
    cases.foreach { case (bytes, mime) =>
      assert(MimeSniffer.sniff(bytes) == mime)
    }
  }
}
