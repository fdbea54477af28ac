package graft.kernel

import java.awt.image.BufferedImage

/** Self-authored 5×7 dot-matrix font (classic public LED-display
  * patterns). Fixtures render invoice text with it (FIXTURES.md §1) and
  * [[OcrStandin]] recognizes against the same bitmaps — a deterministic
  * local replacement for the reference's cloud OCR call
  * (reference app/utils/ocr_engine.py:275-306).
  * Charset: A-Z 0-9 and `- : , . $ # /` (space = empty cell).
  */
object GlyphFont {

  val GlyphW = 5
  val GlyphH = 7
  /** char cell advance in glyph columns (5 glyph + 1 gap). */
  val CellW = 6
  /** line advance in glyph rows (7 glyph + 2 leading). */
  val CellH = 9

  val glyphs: Map[Char, Array[String]] = Map(
    'A' -> Array("01110", "10001", "10001", "11111", "10001", "10001", "10001"),
    'B' -> Array("11110", "10001", "10001", "11110", "10001", "10001", "11110"),
    'C' -> Array("01110", "10001", "10000", "10000", "10000", "10001", "01110"),
    'D' -> Array("11110", "10001", "10001", "10001", "10001", "10001", "11110"),
    'E' -> Array("11111", "10000", "10000", "11110", "10000", "10000", "11111"),
    'F' -> Array("11111", "10000", "10000", "11110", "10000", "10000", "10000"),
    'G' -> Array("01110", "10001", "10000", "10111", "10001", "10001", "01111"),
    'H' -> Array("10001", "10001", "10001", "11111", "10001", "10001", "10001"),
    'I' -> Array("01110", "00100", "00100", "00100", "00100", "00100", "01110"),
    'J' -> Array("00111", "00010", "00010", "00010", "00010", "10010", "01100"),
    'K' -> Array("10001", "10010", "10100", "11000", "10100", "10010", "10001"),
    'L' -> Array("10000", "10000", "10000", "10000", "10000", "10000", "11111"),
    'M' -> Array("10001", "11011", "10101", "10101", "10001", "10001", "10001"),
    'N' -> Array("10001", "11001", "10101", "10011", "10001", "10001", "10001"),
    'O' -> Array("01110", "10001", "10001", "10001", "10001", "10001", "01110"),
    'P' -> Array("11110", "10001", "10001", "11110", "10000", "10000", "10000"),
    'Q' -> Array("01110", "10001", "10001", "10001", "10101", "10010", "01101"),
    'R' -> Array("11110", "10001", "10001", "11110", "10100", "10010", "10001"),
    'S' -> Array("01111", "10000", "10000", "01110", "00001", "00001", "11110"),
    'T' -> Array("11111", "00100", "00100", "00100", "00100", "00100", "00100"),
    'U' -> Array("10001", "10001", "10001", "10001", "10001", "10001", "01110"),
    'V' -> Array("10001", "10001", "10001", "10001", "10001", "01010", "00100"),
    'W' -> Array("10001", "10001", "10001", "10101", "10101", "11011", "10001"),
    'X' -> Array("10001", "10001", "01010", "00100", "01010", "10001", "10001"),
    'Y' -> Array("10001", "10001", "01010", "00100", "00100", "00100", "00100"),
    'Z' -> Array("11111", "00001", "00010", "00100", "01000", "10000", "11111"),
    '0' -> Array("01110", "10001", "10011", "10101", "11001", "10001", "01110"),
    '1' -> Array("00100", "01100", "00100", "00100", "00100", "00100", "01110"),
    '2' -> Array("01110", "10001", "00001", "00010", "00100", "01000", "11111"),
    '3' -> Array("11111", "00010", "00100", "00010", "00001", "10001", "01110"),
    '4' -> Array("00010", "00110", "01010", "10010", "11111", "00010", "00010"),
    '5' -> Array("11111", "10000", "11110", "00001", "00001", "10001", "01110"),
    '6' -> Array("00110", "01000", "10000", "11110", "10001", "10001", "01110"),
    '7' -> Array("11111", "00001", "00010", "00100", "01000", "01000", "01000"),
    '8' -> Array("01110", "10001", "10001", "01110", "10001", "10001", "01110"),
    '9' -> Array("01110", "10001", "10001", "01111", "00001", "00010", "01100"),
    '-' -> Array("00000", "00000", "00000", "11111", "00000", "00000", "00000"),
    ':' -> Array("00000", "00100", "00100", "00000", "00100", "00100", "00000"),
    ',' -> Array("00000", "00000", "00000", "00000", "00100", "00100", "01000"),
    '.' -> Array("00000", "00000", "00000", "00000", "00000", "00110", "00110"),
    '$' -> Array("00100", "01111", "10100", "01110", "00101", "11110", "00100"),
    '#' -> Array("01010", "01010", "11111", "01010", "11111", "01010", "01010"),
    '/' -> Array("00001", "00010", "00010", "00100", "01000", "01000", "10000"))

  /** Chars renderable by this font (plus space). */
  def supports(c: Char): Boolean = c == ' ' || glyphs.contains(c)

  /** Uppercase + replace unsupported chars so any text becomes
    * renderable; the golden text is the sanitized form.
    */
  def sanitize(text: String): String =
    text.toUpperCase.map(c => if (supports(c)) c else ' ')
      .replaceAll(" +", " ").trim

  /** Render lines to a gray raster (255 = paper, 0 = ink), with optional
    * skew (degrees, counter-clockwise) and isolated salt-pepper noise
    * pixels (removable by despeckle). Deterministic given the rng.
    */
  def render(
      lines: Seq[String],
      scale: Int = 2,
      skewDeg: Double = 0.0,
      noise: Int = 0,
      rng: java.util.Random = new java.util.Random(0),
      margin: Int = 8): (Array[Byte], Int, Int) = {
    val maxLen = math.max(1, if (lines.isEmpty) 1 else lines.map(_.length).max)
    val w = 2 * margin + maxLen * CellW * scale
    val h = 2 * margin + lines.length * CellH * scale
    val gray = Array.fill(w * h)(255.toByte)
    lines.zipWithIndex.foreach { case (line, li) =>
      line.zipWithIndex.foreach { case (c, ci) =>
        glyphs.get(c).foreach { pat =>
          val ox = margin + ci * CellW * scale
          val oy = margin + li * CellH * scale + scale // 1-row leading
          for (gy <- 0 until GlyphH; gx <- 0 until GlyphW
               if pat(gy).charAt(gx) == '1';
               sy <- 0 until scale; sx <- 0 until scale) {
            gray((oy + gy * scale + sy) * w + (ox + gx * scale + sx)) = 0.toByte
          }
        }
      }
    }
    var rendered = gray
    if (skewDeg != 0.0) {
      val rad = math.toRadians(skewDeg)
      val sin = math.sin(rad); val cos = math.cos(rad)
      val cx = (w - 1) / 2.0; val cy = (h - 1) / 2.0
      val rot = Array.fill(w * h)(255.toByte)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val dx = x - cx; val dy = y - cy
          val sx = (cos * dx + sin * dy + cx + 0.5).toInt
          val sy = (-sin * dx + cos * dy + cy + 0.5).toInt
          if (sx >= 0 && sx < w && sy >= 0 && sy < h)
            rot(y * w + x) = rendered(sy * w + sx)
          x += 1
        }
        y += 1
      }
      rendered = rot
    }
    var k = 0
    var attempts = 0
    while (k < noise && attempts < noise * 20) {
      val x = 1 + rng.nextInt(w - 2); val y = 1 + rng.nextInt(h - 2)
      // only flip pixels whose 8 neighbours are uniform paper, so the
      // speck stays isolated and despeckle can provably remove it
      val isolated = (-1 to 1).forall(dy => (-1 to 1).forall(dx =>
        (dx == 0 && dy == 0) || (rendered((y + dy) * w + (x + dx)) & 0xff) > 200))
      if (isolated && (rendered(y * w + x) & 0xff) > 200) {
        rendered(y * w + x) = 0.toByte
        k += 1
      }
      attempts += 1
    }
    (rendered, w, h)
  }

  def toBufferedImage(gray: Array[Byte], w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = gray(y * w + x) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  def toPng(gray: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(gray, w, h), "png", bos)
    bos.toByteArray
  }

  def toJpeg(gray: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(gray, w, h), "jpg", bos)
    bos.toByteArray
  }
}
