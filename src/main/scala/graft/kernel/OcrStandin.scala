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

  def ocrGray(gray: Array[Int], w: Int, h: Int): String = {
    val clean = ImageOps.despeckle(gray, w, h)
    val bin = ImageOps.otsuBinarize(clean, w, h)
    if (!bin.exists(identity)) return ""
    val angle = ImageOps.houghSkewAngle(bin, w, h)
    val fixed = if (math.abs(angle) >= 0.25) ImageOps.rotate(bin, w, h, -angle) else bin
    val comps = ImageOps.connectedComponents(fixed, w, h, minPixels = 2)
    if (comps.isEmpty) return ""
    val lines = groupLines(comps)
    lines.map(lineText).mkString("\n")
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

  private def lineText(rawLine: Seq[ImageOps.Component]): String = {
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
    val sb = new StringBuilder
    var prevMaxX = Int.MinValue
    line.foreach { c =>
      if (prevMaxX != Int.MinValue) {
        val gap = c.minX - prevMaxX - 1
        // normal inter-glyph gap ≤ 5*scale (cell gap + empty glyph
        // columns); a space adds a full 6*scale cell
        if (gap > 5.5 * scale) sb.append(' ')
      }
      sb.append(matchGlyph(c, scale))
      prevMaxX = c.maxX
    }
    sb.toString
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
