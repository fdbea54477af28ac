package graft.tools
import java.util.concurrent.{Executors, TimeUnit}
import graft.kernel._
import graft.fixtures.CorpusGen

/** Spark-free kernel scaling probe: OCR the same payload set on a
  * fixed-size thread pool; compare throughput across pool sizes.
  */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val threads = sys.env.getOrElse("PROBE_THREADS", "8").toInt
    val decode = sys.env.getOrElse("PROBE_DECODE", "0") == "1"
    val n = sys.env.getOrElse("PROBE_N", "2400").toInt
    // pre-render payloads (not timed)
    val rng = new java.util.Random(1)
    // PROBE_DISTINCT: images in the pre-rendered pool. The default 300
    // cycles the pool (cache-friendlier than real data); set to n for
    // all-distinct payloads (honest DRAM profile).
    val nDistinct = sys.env.getOrElse("PROBE_DISTINCT", "300").toInt
    val rendered = (0 until nDistinct).map { i =>
      val (lines, _) = CorpusGen.ocrInvoiceLines(rng, s"f$i")
      val skew = (i % 5 - 2) * 1.0
      GlyphFont.render(lines, scale = if (skew == 0.0) 2 else 3, skewDeg = skew,
        noise = i % 15, rng = rng)
    }
    val payloads = (0 until n).map(i => rendered(i % rendered.length))
    val pngs = if (decode) payloads.map { case (g, w, h) => GlyphFont.toPng(g, w, h) } else Nil
    // warm-up
    payloads.take(50).foreach { case (g, w, h) => OcrStandin.ocrGray(g, w, h) }
    if (decode) pngs.take(20).foreach(b => javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futs =
      if (decode) pngs.map { b =>
        pool.submit(new Runnable { def run(): Unit = {
          val g = ImageDecode.readGray(b)
          OcrStandin.ocrGray(g._1, g._2, g._3); ()
        } })
      } else payloads.map { case (g, w, h) =>
        pool.submit(new Runnable { def run(): Unit = { OcrStandin.ocrGray(g, w, h); () } })
      }
    futs.foreach(_.get())
    val sec = (System.nanoTime() - t0) / 1e9
    pool.shutdown(); pool.awaitTermination(1, TimeUnit.SECONDS)
    println(f"PROBE threads=$threads n=$n sec=$sec%.2f ocr_per_sec=${n / sec}%.1f")
  }
}
