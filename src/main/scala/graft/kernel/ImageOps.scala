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
  */
object ImageOps {

  /** Luma grayscale from an RGB image (ITU-R BT.601 weights, same family
    * as cv2.cvtColor BGR2GRAY). Row-major Int array, 0..255.
    */
  def grayFrom(img: BufferedImage): (Array[Int], Int, Int) = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        out(y * w + x) = ((299 * r + 587 * g + 114 * b) / 1000)
        x += 1
      }
      y += 1
    }
    (out, w, h)
  }

  /** Salt-and-pepper despeckle (denoise stand-in for
    * fastNlMeansDenoising): a pixel whose 8 neighbours all sit on the
    * other side of mid-gray is replaced by the neighbour majority value.
    * Preserves strokes (only isolated pixels move).
    */
  def despeckle(gray: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = gray.clone()
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val v = gray(y * w + x)
        val dark = v < 128
        var oppose = 0; var sum = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            if (dx != 0 || dy != 0) {
              val nv = gray((y + dy) * w + (x + dx))
              if ((nv < 128) != dark) oppose += 1
              sum += nv
            }
            dx += 1
          }
          dy += 1
        }
        if (oppose == 8) out(y * w + x) = sum / 8
        x += 1
      }
      y += 1
    }
    out
  }

  /** Otsu's threshold from the 256-bin histogram (exact classic
    * between-class variance maximization — reference's
    * THRESH_BINARY+THRESH_OTSU, ocr_engine.py:268-270).
    */
  def otsuThreshold(gray: Array[Int]): Int = {
    val hist = new Array[Long](256)
    gray.foreach(v => hist(v) += 1)
    val total = gray.length.toLong
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

  /** Binarize: foreground (true) = dark ink on light paper. */
  def otsuBinarize(gray: Array[Int], w: Int, h: Int): Array[Boolean] = {
    val t = otsuThreshold(gray)
    gray.map(_ <= t)
  }

  /** Skew estimate via Hough transform: foreground pixels vote in
    * (theta, rho) space over theta ∈ [-maxDeg, +maxDeg]; the theta whose
    * rho-histogram concentrates votes the most (max sum of squared bin
    * counts) is the text-baseline angle. Returns degrees; positive =
    * text rotated counter-clockwise.
    */
  def houghSkewAngle(fg: Array[Boolean], w: Int, h: Int,
      maxDeg: Double = 6.0, stepDeg: Double = 0.25): Double = {
    val nSteps = math.round(2 * maxDeg / stepDeg).toInt
    val thetas = (0 to nSteps).map(i => -maxDeg + i * stepDeg).toArray
    val diag = math.sqrt(w.toDouble * w + h.toDouble * h).toInt + 2
    var bestTheta = 0.0; var bestScore = -1.0
    // subsample foreground pixels for speed on large pages
    val pts = ArrayBuffer.empty[(Int, Int)]
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (fg(y * w + x)) pts += ((x, y))
        x += 1
      }
      y += 1
    }
    val stride = math.max(1, pts.length / 20000)
    thetas.foreach { deg =>
      val rad = math.toRadians(deg)
      val sin = math.sin(rad); val cos = math.cos(rad)
      val acc = new Array[Int](2 * diag + 1)
      var i = 0
      while (i < pts.length) {
        val (x, py) = pts(i)
        // distance of the (skewed) baseline: rho = y*cos - x*sin
        val rho = (py * cos - x * sin).toInt + diag
        acc(rho) += 1
        i += stride
      }
      var score = 0.0
      var j = 0
      while (j < acc.length) { val c = acc(j).toDouble; score += c * c; j += 1 }
      if (score > bestScore) { bestScore = score; bestTheta = deg }
    }
    bestTheta
  }

  /** Rotate a binary raster by `deg` around the center, nearest
    * neighbour, background = false.
    */
  def rotate(fg: Array[Boolean], w: Int, h: Int, deg: Double): Array[Boolean] = {
    if (deg == 0.0) return fg.clone()
    val rad = math.toRadians(deg)
    val sin = math.sin(rad); val cos = math.cos(rad)
    val cx = (w - 1) / 2.0; val cy = (h - 1) / 2.0
    val out = new Array[Boolean](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // inverse map
        val dx = x - cx; val dy = y - cy
        val sx = (cos * dx + sin * dy + cx + 0.5).toInt
        val sy = (-sin * dx + cos * dy + cy + 0.5).toInt
        if (sx >= 0 && sx < w && sy >= 0 && sy < h && fg(sy * w + sx))
          out(y * w + x) = true
        x += 1
      }
      y += 1
    }
    out
  }

  /** Connected component: bounding box + pixel bitmap. */
  final case class Component(
      minX: Int, minY: Int, maxX: Int, maxY: Int, pixels: Array[(Int, Int)]) {
    def width: Int = maxX - minX + 1
    def height: Int = maxY - minY + 1
    def centerY: Double = (minY + maxY) / 2.0
  }

  /** Two-pass 8-connectivity CCL with union-find — layout segmentation
    * primitive (north_star names CCL explicitly; replaces the
    * reference's cloud layout call, ocr_engine.py:308-328).
    */
  def connectedComponents(fg: Array[Boolean], w: Int, h: Int,
      minPixels: Int = 2): Seq[Component] = {
    val labels = new Array[Int](w * h)
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
          var best = 0
          // neighbours already scanned: W, NW, N, NE
          val candidates = Array(
            if (x > 0) labels(y * w + x - 1) else 0,
            if (x > 0 && y > 0) labels((y - 1) * w + x - 1) else 0,
            if (y > 0) labels((y - 1) * w + x) else 0,
            if (x < w - 1 && y > 0) labels((y - 1) * w + x + 1) else 0)
          candidates.foreach { c =>
            if (c > 0) { if (best == 0) best = c else union(best, c) }
          }
          if (best == 0) { best = next; parent += next; next += 1 }
          labels(y * w + x) = best
        }
        x += 1
      }
      y += 1
    }
    // second pass: resolve + collect
    val comps = scala.collection.mutable.LinkedHashMap.empty[Int, ArrayBuffer[(Int, Int)]]
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = labels(y * w + x)
        if (l > 0) comps.getOrElseUpdate(find(l), ArrayBuffer.empty) += ((x, y))
        x += 1
      }
      y += 1
    }
    comps.values.iterator
      .filter(_.length >= minPixels)
      .map { pts =>
        var minX = Int.MaxValue; var minY = Int.MaxValue
        var maxX = 0; var maxY = 0
        pts.foreach { case (x, py) =>
          if (x < minX) minX = x; if (x > maxX) maxX = x
          if (py < minY) minY = py; if (py > maxY) maxY = py
        }
        Component(minX, minY, maxX, maxY, pts.toArray)
      }.toSeq
  }
}
