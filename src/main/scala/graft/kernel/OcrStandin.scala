package graft.kernel

import java.awt.image.BufferedImage
import scala.collection.mutable.ArrayBuffer

/** Deterministic OCR inference over rasters rendered with [[GlyphFont]]:
  * despeckle → Otsu binarize → Hough deskew → connected-component
  * labeling → line/word segmentation → nearest-glyph match.
  * Local stand-in for the reference's cloud OCR
  * (reference app/utils/ocr_engine.py:261-306), with the graft-mandated
  * deskew + CCL layout steps (BASELINE.json north_star).
  */
object OcrStandin {

  def ocrImage(img: BufferedImage): String = {
    val (gray, w, h) = ImageOps.grayFrom(img)
    ocrGray(gray, w, h)
  }

  def ocrGray(gray: Array[Byte], w: Int, h: Int): String =
    ocrDetailed(gray, w, h).text

  /** A recognized word with its bounding box (the reference's OCR
    * result carries words + 4-vertex boxes, ocr_engine.py:287-303).
    */
  final case class Word(text: String, x0: Int, y0: Int, x1: Int, y1: Int)

  /** One text line: words in x order + the line's y band. */
  final case class Line(words: Seq[Word], y0: Int, y1: Int) {
    def text: String = words.map(_.text).mkString(" ")
  }

  /** Full layout result (F11/F12/F14): text, per-word boxes, lines
    * grouped into blocks by vertical whitespace, and table rows (cells
    * split at wide gaps — the reference's paragraph→row-of-word-cells
    * stand-in, ocr_engine.py:330-340).
    */
  final case class OcrResult(lines: Seq[Line], skewDeg: Double) {
    def text: String = lines.map(_.text).mkString("\n")
    def words: Seq[Word] = lines.flatMap(_.words)
    /** blocks = runs of lines whose vertical gap < 1.5 line heights. */
    def blocks: Seq[Seq[Line]] = {
      if (lines.isEmpty) return Nil
      val out = ArrayBuffer(ArrayBuffer(lines.head))
      lines.sliding(2).foreach {
        case Seq(a, b) =>
          val lineH = math.max(1, a.y1 - a.y0)
          if (b.y0 - a.y1 > 1.5 * lineH) out += ArrayBuffer(b)
          else out.last += b
        case _ =>
      }
      out.map(_.toSeq).toSeq
    }
    /** table rows: each line's words as cells (multi-space separated
      * words are distinct cells already at the word level).
      */
    def tableRows: Seq[Seq[String]] = lines.map(_.words.map(_.text))
  }

  /** Full per-image pipeline over the thread's [[ImageOps.Scratch]]
    * buffers: the only allocations that survive a page are the
    * components/words/lines that escape — every full-page intermediate
    * (despeckled gray, binarized page, rotated page, Hough points, CCL
    * labels) reuses thread-local storage (the round-1 GC ceiling fix).
    */
  def ocrDetailed(gray: Array[Byte], w: Int, h: Int): OcrResult = {
    val s = ImageOps.scratch.get()
    val n = w * h
    val clean = ImageOps.despeckleInto(gray, w, h, s.bytesA(n))
    val bin = ImageOps.otsuBinarizeInto(clean, w, h, s.boolA(n))
    var hasFg = false
    var i = 0
    while (i < n && !hasFg) { hasFg = bin(i); i += 1 }
    if (!hasFg) return OcrResult(Nil, 0.0)
    val angle = ImageOps.houghSkewAngle(bin, w, h, ptsScratch = s.intsA(n))
    val fixed =
      if (math.abs(angle) >= 0.25) ImageOps.rotateInto(bin, w, h, -angle, s.boolB(n))
      else bin
    val comps = ImageOps.connectedComponents(fixed, w, h, minPixels = 2,
      labelsScratch = s.intsA(n))
    if (comps.isEmpty) return OcrResult(Nil, angle)
    OcrResult(groupLines(comps).map(lineWords), angle)
  }

  /** Group components into text lines by y-interval overlap, top to
    * bottom; within a line sort by x and merge x-overlapping pieces
    * (multi-dot glyphs like ':').
    */
  private def groupLines(comps: Seq[ImageOps.Component])
      : Seq[Seq[ImageOps.Component]] = {
    val sorted = comps.sortBy(_.minY)
    val lines = ArrayBuffer.empty[ArrayBuffer[ImageOps.Component]]
    var curMinY = -1; var curMaxY = -1
    sorted.foreach { c =>
      if (lines.nonEmpty && c.minY <= curMaxY) {
        lines.last += c
        curMaxY = math.max(curMaxY, c.maxY)
      } else {
        lines += ArrayBuffer(c)
        curMinY = c.minY; curMaxY = c.maxY
      }
    }
    lines.map(line => line.sortBy(_.minX).toSeq).toSeq
  }

  /** Per-glyph tight-cropped patterns, precomputed. */
  private val croppedGlyphs: Seq[(Char, Array[Array[Boolean]])] =
    GlyphFont.glyphs.toSeq.map { case (ch, pat) =>
      val on = for {
        y <- 0 until GlyphFont.GlyphH
        x <- 0 until GlyphFont.GlyphW
        if pat(y).charAt(x) == '1'
      } yield (x, y)
      val minX = on.map(_._1).min; val maxX = on.map(_._1).max
      val minY = on.map(_._2).min; val maxY = on.map(_._2).max
      val grid = Array.ofDim[Boolean](maxY - minY + 1, maxX - minX + 1)
      on.foreach { case (x, y) => grid(y - minY)(x - minX) = true }
      (ch, grid)
    }

  private def lineWords(rawLine: Seq[ImageOps.Component]): Line = {
    // scale estimate: tallest glyph in the line is 7 pattern-rows tall
    val maxH = rawLine.map(_.height).max
    val scale = math.max(1.0, maxH / 7.0)
    // merge x-overlapping or near-touching pieces: multi-dot glyphs
    // (':') and strokes broken by rotation artifacts. Legitimate
    // inter-glyph gaps are ≥ 1*scale, so merging below 0.9*scale is safe.
    val line = {
      val merged = ArrayBuffer.empty[ImageOps.Component]
      rawLine.foreach { c =>
        if (merged.nonEmpty && c.minX <= merged.last.maxX + 0.9 * scale) {
          merged(merged.length - 1) = ImageOps.mergeComponents(merged.last, c)
        } else merged += c
      }
      merged.toSeq
    }
    val words = ArrayBuffer.empty[Word]
    val sb = new StringBuilder
    var wx0 = 0; var wy0 = Int.MaxValue; var wx1 = 0; var wy1 = 0
    var prevMaxX = Int.MinValue
    def flushWord(): Unit = {
      if (sb.nonEmpty) words += Word(sb.toString, wx0, wy0, wx1, wy1)
      sb.clear(); wy0 = Int.MaxValue; wx1 = 0; wy1 = 0
    }
    line.foreach { c =>
      if (prevMaxX != Int.MinValue) {
        val gap = c.minX - prevMaxX - 1
        // normal inter-glyph gap ≤ 5*scale (cell gap + empty glyph
        // columns); a space adds a full 6*scale cell
        if (gap > 5.5 * scale) flushWord()
      }
      if (sb.isEmpty) wx0 = c.minX
      sb.append(matchGlyph(c, scale))
      wx1 = math.max(wx1, c.maxX)
      wy0 = math.min(wy0, c.minY); wy1 = math.max(wy1, c.maxY)
      prevMaxX = c.maxX
    }
    flushWord()
    Line(words.toSeq,
      if (words.isEmpty) 0 else words.map(_.y0).min,
      if (words.isEmpty) 0 else words.map(_.y1).max)
  }

  /** Nearest glyph by resampled-bitmap Hamming distance; candidates
    * filtered by compatible aspect ratio AND absolute size at the
    * line's scale (a dense 'E' must not match the coarse-grid '.').
    */
  private def matchGlyph(c: ImageOps.Component, scale: Double): Char = {
    val cw = c.width; val ch = c.height
    var best = '?'; var bestScore = Double.MaxValue
    croppedGlyphs.foreach { case (gc, grid) =>
      val gh = grid.length; val gw = grid(0).length
      val aspectDiff = math.abs(
        math.log(cw.toDouble / ch) - math.log(gw.toDouble / gh))
      val sizeOk = math.abs(cw - gw * scale) <= 2.01 * scale &&
        math.abs(ch - gh * scale) <= 2.01 * scale
      if (aspectDiff < 0.7 && sizeOk) {
        // resample the component's bbox to the glyph's cropped grid
        var mismatches = 0
        var gy = 0
        while (gy < gh) {
          var gx = 0
          while (gx < gw) {
            // fraction of on-pixels in the corresponding source region
            val x0 = gx * cw / gw; val x1 = math.max(x0 + 1, (gx + 1) * cw / gw)
            val y0 = gy * ch / gh; val y1 = math.max(y0 + 1, (gy + 1) * ch / gh)
            var on = 0; var tot = 0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { if (c.bit(x, y)) on += 1; tot += 1; x += 1 }
              y += 1
            }
            val sampled = on.toDouble / tot >= 0.35
            if (sampled != grid(gy)(gx)) mismatches += 1
            gx += 1
          }
          gy += 1
        }
        val score = mismatches.toDouble / (gw * gh) + aspectDiff * 0.1
        if (score < bestScore) { bestScore = score; best = gc }
      }
    }
    best
  }
}
