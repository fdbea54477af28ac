package graft.kernel

import java.awt.image.BufferedImage
import scala.collection.mutable.ArrayBuffer

/** Image preprocessing kernels — the deterministic local stand-ins for
  * the reference's cv2 pipeline (reference app/utils/ocr_engine.py:261-273:
  * BGR→gray, denoise, Otsu binarize) plus the graft-mandated extensions
  * (BASELINE.json north_star): deskew via Hough-angle estimation and
  * connected-component labeling for layout segmentation. All classic
  * public algorithms (Otsu 1979; Duda & Hart 1972 Hough transform;
  * two-pass union-find CCL).
  *
  * Memory discipline (the north rule's scaling constraint): rasters are
  * `Array[Byte]` gray (unsigned via `& 0xff`) — a quarter of the int
  * rasters' traffic — and every full-page intermediate (despeckle
  * output, binarized page, rotated page, CCL label map, Hough points)
  * lives in a per-thread grow-on-demand [[Scratch]], so steady-state
  * kernel throughput allocates only the small structures that escape
  * (components, words, lines). Round-1 measurement: allocation/GC bound
  * the 8→32-thread efficiency at ~0.72; full-page buffers were the bulk
  * of the allocation.
  */
object ImageOps {

  // ImageIO's default stream cache is file-backed and lock-guarded —
  // a contention point with 32 decode threads. In-memory cache instead.
  javax.imageio.ImageIO.setUseCache(false)

  /** Per-thread reusable buffers for the OCR pipeline. Contract: a
    * buffer handed out by `bytesA`/`boolA`/... is valid until the SAME
    * accessor is called again on this thread — the per-image pipeline
    * in OcrStandin uses each at most once per image.
    */
  final class Scratch {
    private var _bytesA = new Array[Byte](0)
    private var _bytesB = new Array[Byte](0)
    private var _boolA = new Array[Boolean](0)
    private var _boolB = new Array[Boolean](0)
    private var _intsA = new Array[Int](0)
    def bytesA(n: Int): Array[Byte] = {
      if (_bytesA.length < n) _bytesA = new Array[Byte](n); _bytesA
    }
    def bytesB(n: Int): Array[Byte] = {
      if (_bytesB.length < n) _bytesB = new Array[Byte](n); _bytesB
    }
    def boolA(n: Int): Array[Boolean] = {
      if (_boolA.length < n) _boolA = new Array[Boolean](n); _boolA
    }
    def boolB(n: Int): Array[Boolean] = {
      if (_boolB.length < n) _boolB = new Array[Boolean](n); _boolB
    }
    def intsA(n: Int): Array[Int] = {
      if (_intsA.length < n) _intsA = new Array[Int](n); _intsA
    }
  }

  val scratch: ThreadLocal[Scratch] = ThreadLocal.withInitial(() => new Scratch)

  /** Luma grayscale from an RGB image (ITU-R BT.601 weights, same family
    * as cv2.cvtColor BGR2GRAY). Row-major byte array, 0..255 unsigned.
    * Bulk getRGB: one raster conversion call, not w*h JNI-ish lookups.
    */
  def grayFrom(img: BufferedImage): (Array[Byte], Int, Int) = {
    val w = img.getWidth; val h = img.getHeight
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < rgb.length) {
      val v = rgb(i)
      val r = (v >> 16) & 0xff; val g = (v >> 8) & 0xff; val b = v & 0xff
      out(i) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
      i += 1
    }
    (out, w, h)
  }

  /** Bilinear resize of a row-major gray raster to ow×oh — the
    * feature-extraction primitive (perceptual hashing downsamples
    * through it; any thumbnail path would too). Sample coordinates map
    * pixel centers (the standard half-pixel alignment), clamped at the
    * border.
    */
  def resizeGrayBilinear(
      gray: Array[Byte], w: Int, h: Int, ow: Int, oh: Int): Array[Byte] = {
    require(w > 0 && h > 0 && ow > 0 && oh > 0)
    val out = new Array[Byte](ow * oh)
    val sx = w.toDouble / ow
    val sy = h.toDouble / oh
    var oy = 0
    while (oy < oh) {
      val fy = math.max(0.0, (oy + 0.5) * sy - 0.5)
      val y0 = math.min(fy.toInt, h - 1)
      val y1 = math.min(y0 + 1, h - 1)
      val wy = fy - y0
      var ox = 0
      while (ox < ow) {
        val fx = math.max(0.0, (ox + 0.5) * sx - 0.5)
        val x0 = math.min(fx.toInt, w - 1)
        val x1 = math.min(x0 + 1, w - 1)
        val wx = fx - x0
        val p00 = gray(y0 * w + x0) & 0xff; val p01 = gray(y0 * w + x1) & 0xff
        val p10 = gray(y1 * w + x0) & 0xff; val p11 = gray(y1 * w + x1) & 0xff
        val top = p00 + (p01 - p00) * wx
        val bot = p10 + (p11 - p10) * wx
        out(oy * ow + ox) = math.round(top + (bot - top) * wy).toByte
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Salt-and-pepper despeckle (denoise stand-in for
    * fastNlMeansDenoising): a pixel whose 8 neighbours all sit on the
    * other side of mid-gray is replaced by the neighbour majority value.
    * Preserves strokes (only isolated pixels move). Writes into `out`
    * (≥ w*h) and returns it.
    */
  def despeckleInto(gray: Array[Byte], w: Int, h: Int,
      out: Array[Byte]): Array[Byte] = {
    System.arraycopy(gray, 0, out, 0, w * h)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val v = gray(y * w + x) & 0xff
        val dark = v < 128
        var oppose = 0; var sum = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            if (dx != 0 || dy != 0) {
              val nv = gray((y + dy) * w + (x + dx)) & 0xff
              if ((nv < 128) != dark) oppose += 1
              sum += nv
            }
            dx += 1
          }
          dy += 1
        }
        if (oppose == 8) out(y * w + x) = (sum / 8).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  def despeckle(gray: Array[Byte], w: Int, h: Int): Array[Byte] =
    despeckleInto(gray, w, h, new Array[Byte](w * h))

  /** Otsu's threshold from the 256-bin histogram (exact classic
    * between-class variance maximization — reference's
    * THRESH_BINARY+THRESH_OTSU, ocr_engine.py:268-270).
    */
  def otsuThreshold(gray: Array[Byte], n: Int): Int = {
    val hist = new Array[Long](256)
    var p = 0
    while (p < n) { hist(gray(p) & 0xff) += 1; p += 1 }
    val total = n.toLong
    var sumAll = 0.0
    var i = 0
    while (i < 256) { sumAll += i.toDouble * hist(i); i += 1 }
    var sumB = 0.0; var wB = 0L
    var maxVar = -1.0; var threshold = 0
    i = 0
    while (i < 256) {
      wB += hist(i)
      if (wB != 0 && wB != total) {
        sumB += i.toDouble * hist(i)
        val wF = total - wB
        val mB = sumB / wB
        val mF = (sumAll - sumB) / wF
        val between = wB.toDouble * wF.toDouble * (mB - mF) * (mB - mF)
        if (between > maxVar) { maxVar = between; threshold = i }
      } else if (wB != 0) {
        sumB += i.toDouble * hist(i)
      }
      i += 1
    }
    threshold
  }

  def otsuThreshold(gray: Array[Byte]): Int = otsuThreshold(gray, gray.length)

  /** Binarize into `out` (≥ w*h): foreground (true) = dark ink. */
  def otsuBinarizeInto(gray: Array[Byte], w: Int, h: Int,
      out: Array[Boolean]): Array[Boolean] = {
    val t = otsuThreshold(gray, w * h)
    var i = 0
    while (i < w * h) { out(i) = (gray(i) & 0xff) <= t; i += 1 }
    out
  }

  def otsuBinarize(gray: Array[Byte], w: Int, h: Int): Array[Boolean] =
    otsuBinarizeInto(gray, w, h, new Array[Boolean](w * h))

  /** Skew estimate via Hough transform: foreground pixels vote in
    * (theta, rho) space over theta ∈ [-maxDeg, +maxDeg]; the theta whose
    * rho-histogram concentrates votes the most (max sum of squared bin
    * counts) is the text-baseline angle. Returns degrees; positive =
    * text rotated counter-clockwise. `ptsScratch` (≥ #fg pixels, may be
    * null) avoids the per-image point-array allocation.
    */
  def houghSkewAngle(fg: Array[Boolean], w: Int, h: Int,
      maxDeg: Double = 6.0, stepDeg: Double = 0.25,
      ptsScratch: Array[Int] = null): Double = {
    val nSteps = math.round(2 * maxDeg / stepDeg).toInt
    val thetas = (0 to nSteps).map(i => -maxDeg + i * stepDeg).toArray
    val diag = math.sqrt(w.toDouble * w + h.toDouble * h).toInt + 2
    var bestTheta = 0.0; var bestScore = -1.0
    // collect foreground pixels packed x<<16|y (no boxed tuples — a
    // measured allocation hotspot at 32 kernel threads)
    var fgCount = 0
    var i = 0
    while (i < w * h) { if (fg(i)) fgCount += 1; i += 1 }
    val pts =
      if (ptsScratch != null && ptsScratch.length >= fgCount) ptsScratch
      else new Array[Int](fgCount)
    var k = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (fg(y * w + x)) { pts(k) = (x << 16) | y; k += 1 }
        x += 1
      }
      y += 1
    }
    // subsample for speed on large pages
    val stride = math.max(1, fgCount / 20000)
    val acc = new Array[Int](2 * diag + 1)
    thetas.foreach { deg =>
      val rad = math.toRadians(deg)
      val sin = math.sin(rad); val cos = math.cos(rad)
      java.util.Arrays.fill(acc, 0)
      var p = 0
      while (p < fgCount) {
        val v = pts(p)
        val x = v >>> 16; val py = v & 0xffff
        // distance of the (skewed) baseline: rho = y*cos - x*sin
        val rho = (py * cos - x * sin).toInt + diag
        acc(rho) += 1
        p += stride
      }
      var score = 0.0
      var j = 0
      while (j < acc.length) { val c = acc(j).toDouble; score += c * c; j += 1 }
      if (score > bestScore) { bestScore = score; bestTheta = deg }
    }
    bestTheta
  }

  /** Rotate a binary raster by `deg` around the center, nearest
    * neighbour, background = false. Writes into `out` (≥ w*h, fully
    * overwritten) and returns it.
    */
  def rotateInto(fg: Array[Boolean], w: Int, h: Int, deg: Double,
      out: Array[Boolean]): Array[Boolean] = {
    val rad = math.toRadians(deg)
    val sin = math.sin(rad); val cos = math.cos(rad)
    val cx = (w - 1) / 2.0; val cy = (h - 1) / 2.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // inverse map
        val dx = x - cx; val dy = y - cy
        val sx = (cos * dx + sin * dy + cx + 0.5).toInt
        val sy = (-sin * dx + cos * dy + cy + 0.5).toInt
        out(y * w + x) =
          sx >= 0 && sx < w && sy >= 0 && sy < h && fg(sy * w + sx)
        x += 1
      }
      y += 1
    }
    out
  }

  def rotate(fg: Array[Boolean], w: Int, h: Int, deg: Double): Array[Boolean] =
    if (deg == 0.0) fg.clone()
    else rotateInto(fg, w, h, deg, new Array[Boolean](w * h))

  /** Connected component: bounding box + a row-major bitmap of the box
    * (primitive array — per-pixel tuple boxing was a measured GC
    * hotspot at 32 kernel threads).
    */
  final case class Component(
      minX: Int, minY: Int, maxX: Int, maxY: Int, bitmap: Array[Boolean]) {
    def width: Int = maxX - minX + 1
    def height: Int = maxY - minY + 1
    def centerY: Double = (minY + maxY) / 2.0
    def bit(bx: Int, by: Int): Boolean = bitmap(by * width + bx)
  }

  /** Union of two components (multi-dot glyphs, broken strokes). */
  def mergeComponents(a: Component, b: Component): Component = {
    val minX = math.min(a.minX, b.minX); val minY = math.min(a.minY, b.minY)
    val maxX = math.max(a.maxX, b.maxX); val maxY = math.max(a.maxY, b.maxY)
    val w = maxX - minX + 1
    val bm = new Array[Boolean]((maxY - minY + 1) * w)
    def blit(c: Component): Unit = {
      var y = 0
      while (y < c.height) {
        var x = 0
        while (x < c.width) {
          if (c.bitmap(y * c.width + x))
            bm((y + c.minY - minY) * w + (x + c.minX - minX)) = true
          x += 1
        }
        y += 1
      }
    }
    blit(a); blit(b)
    Component(minX, minY, maxX, maxY, bm)
  }

  /** Two-pass 8-connectivity CCL with union-find — layout segmentation
    * primitive (north_star names CCL explicitly; replaces the
    * reference's cloud layout call, ocr_engine.py:308-328).
    * `labelsScratch` (≥ w*h, may be null) is zeroed and reused for the
    * label map; component bitmaps (which escape) are always fresh.
    */
  def connectedComponents(fg: Array[Boolean], w: Int, h: Int,
      minPixels: Int = 2, labelsScratch: Array[Int] = null): Seq[Component] = {
    val labels =
      if (labelsScratch != null && labelsScratch.length >= w * h) {
        java.util.Arrays.fill(labelsScratch, 0, w * h, 0); labelsScratch
      } else new Array[Int](w * h)
    val parent = ArrayBuffer[Int](0)
    def find(a: Int): Int = {
      var r = a
      while (parent(r) != r) r = parent(r)
      var c = a
      while (parent(c) != r) { val next = parent(c); parent(c) = r; c = next }
      r
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    var next = 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (fg(y * w + x)) {
          // neighbours already scanned (W, NW, N, NE) — unrolled inline,
          // no per-pixel candidate-array or closure-ref allocation
          var best = 0
          val cW = if (x > 0) labels(y * w + x - 1) else 0
          if (cW > 0) best = cW
          val cNW = if (x > 0 && y > 0) labels((y - 1) * w + x - 1) else 0
          if (cNW > 0) { if (best == 0) best = cNW else union(best, cNW) }
          val cN = if (y > 0) labels((y - 1) * w + x) else 0
          if (cN > 0) { if (best == 0) best = cN else union(best, cN) }
          val cNE = if (x < w - 1 && y > 0) labels((y - 1) * w + x + 1) else 0
          if (cNE > 0) { if (best == 0) best = cNE else union(best, cNE) }
          if (best == 0) { best = next; parent += next; next += 1 }
          labels(y * w + x) = best
        }
        x += 1
      }
      y += 1
    }
    // pass 2a: per-root bbox + pixel counts (primitive arrays only)
    val nLabels = parent.length
    val minXs = Array.fill(nLabels)(Int.MaxValue)
    val minYs = Array.fill(nLabels)(Int.MaxValue)
    val maxXs = new Array[Int](nLabels)
    val maxYs = new Array[Int](nLabels)
    val counts = new Array[Int](nLabels)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = labels(y * w + x)
        if (l > 0) {
          val r = find(l)
          labels(y * w + x) = r // memoize root for pass 2b
          if (x < minXs(r)) minXs(r) = x
          if (x > maxXs(r)) maxXs(r) = x
          if (y < minYs(r)) minYs(r) = y
          if (y > maxYs(r)) maxYs(r) = y
          counts(r) += 1
        }
        x += 1
      }
      y += 1
    }
    // pass 2b: fill per-root bbox bitmaps
    val bitmaps = new Array[Array[Boolean]](nLabels)
    var r = 1
    while (r < nLabels) {
      if (counts(r) >= minPixels)
        bitmaps(r) = new Array[Boolean]((maxYs(r) - minYs(r) + 1) * (maxXs(r) - minXs(r) + 1))
      r += 1
    }
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = labels(y * w + x)
        if (l > 0 && bitmaps(l) != null) {
          val bw = maxXs(l) - minXs(l) + 1
          bitmaps(l)((y - minYs(l)) * bw + (x - minXs(l))) = true
        }
        x += 1
      }
      y += 1
    }
    val out = ArrayBuffer.empty[Component]
    r = 1
    while (r < nLabels) {
      if (bitmaps(r) != null)
        out += Component(minXs(r), minYs(r), maxXs(r), maxYs(r), bitmaps(r))
      r += 1
    }
    out.toSeq
  }
}
