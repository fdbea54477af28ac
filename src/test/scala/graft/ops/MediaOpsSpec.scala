package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.kernel.{GlyphFont, ImageOps}

/** Image feature extraction + near-dup: dHash invariances (brightness
  * shift → identical hash), separation (different content → far), and
  * the banded pair op end-to-end over rendered PNGs.
  */
class MediaOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def png(lines: Seq[String]): Array[Byte] = {
    val (gray, w, h) = GlyphFont.render(lines, scale = 2)
    GlyphFont.toPng(gray, w, h)
  }

  private def brightPng(lines: Seq[String], delta: Int): Array[Byte] = {
    val (gray, w, h) = GlyphFont.render(lines, scale = 2)
    val shifted = gray.map(b =>
      math.min(255, math.max(0, (b & 0xff) + delta)).toByte)
    GlyphFont.toPng(shifted, w, h)
  }

  test("resizeGrayBilinear: constant image stays constant; dims honored") {
    val in = Array.fill(40 * 30)(117.toByte)
    val out = ImageOps.resizeGrayBilinear(in, 40, 30, 9, 8)
    assert(out.length == 9 * 8)
    assert(out.forall(b => (b & 0xff) == 117))
    // gradient direction survives downscale: left-dark right-bright
    val grad = Array.tabulate(64 * 16)(i => ((i % 64) * 4).toByte)
    val small = ImageOps.resizeGrayBilinear(grad, 64, 16, 9, 8)
    (0 until 8).foreach(y =>
      assert((small(y * 9) & 0xff) < (small(y * 9 + 8) & 0xff)))
  }

  test("dHash64 is brightness-invariant and separates different content") {
    val a = MediaOps.dHash64(png(Seq("INVOICE 12345", "TOTAL 99.00"))).get
    val aBright = MediaOps.dHash64(
      brightPng(Seq("INVOICE 12345", "TOTAL 99.00"), 40)).get
    assert(java.lang.Long.bitCount(a ^ aBright) == 0,
      "row-gradient signs must ignore a global brightness shift")
    val b = MediaOps.dHash64(png(Seq("COMPLETELY OTHER", "CONTENT HERE"))).get
    assert(java.lang.Long.bitCount(a ^ b) >= 10,
      s"different content too close: ${java.lang.Long.bitCount(a ^ b)}")
    assert(MediaOps.dHash64(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("imageNearDupPairs recalls planted dups, skips unrelated, reports undecodable as NULL") {
    val rows = Seq(
      ("img/a", png(Seq("INVOICE 12345", "TOTAL 99.00"))),
      ("img/a-dup", brightPng(Seq("INVOICE 12345", "TOTAL 99.00"), 30)),
      ("img/b", png(Seq("COMPLETELY OTHER", "CONTENT HERE"))),
      ("img/broken", Array[Byte](9, 9, 9)))
    val media = rows.toDF("media_ref", "bytes")
    val hashes = MediaOps.imageDHashes(media)
    assert(hashes.filter(col("dhash").isNull).select("media_ref")
      .as[String].collect().toSeq == Seq("img/broken"))
    val pairs = MediaOps.imageNearDupPairs(hashes, maxHamming = 6)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(pairs == Set(("img/a", "img/a-dup")), pairs.toString)
  }

  test("imageOversizedBuckets reports exactly the buckets the pair op drops") {
    // 1200 identical hashes (over the 1000 cap) + 2 planted near-dups:
    // every band bucket of the identical mass is a victim; the planted
    // pair still pairs up
    val bomb = (0 until 1200).map(i => (f"bomb/$i%04d", 0x0F0F0F0F0F0F0F0FL))
    val pairRows = Seq(("p/a", 0x123456789ABCDEFL), ("p/b", 0x123456789ABCDEEL))
    val hashes = (bomb ++ pairRows).toDF("media_ref", "dhash")
    val victims = MediaOps.imageOversizedBuckets(hashes)
      .select("band", "bucket_n").as[(Int, Long)].collect()
    assert(victims.length == 8 && victims.forall(_._2 == 1200L),
      victims.mkString(", "))
    val pairs = MediaOps.imageNearDupPairs(hashes)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(pairs == Set(("p/a", "p/b")), pairs.toString)
  }

  test("hashRaster is the exact dHash64 inverse through PNG encode/decode") {
    val rng = new scala.util.Random(11)
    val cases = Seq(0L, -1L, Long.MinValue, 0x5555555555555555L) ++
      Seq.fill(20)(rng.nextLong())
    cases.foreach { h =>
      val png = GlyphFont.toPng(MediaOps.hashRaster(h), 9, 8)
      assert(MediaOps.dHash64(png) == Some(h),
        f"hash 0x$h%016x did not round-trip")
    }
  }

  test("default band/verify radii are pigeonhole-consistent: any hamming<=maxHamming pair shares a band") {
    // bandBits=8 → 8 bands; plant pairs at the WORST spread (6 flipped
    // bits in 6 distinct bands) and assert they are still caught —
    // the round-4 bandBits=16 default deterministically missed these
    val base = 0x0123456789ABCDEFL
    val flipped = base ^ 0x010101010101L // bits 0,8,16,24,32,40 — 6 bands
    val hashes = Seq(("a", base), ("b", flipped))
      .toDF("media_ref", "dhash")
    val pairs = MediaOps.imageNearDupPairs(hashes)
      .select("id_a", "id_b", "hamming")
      .as[(String, String, Int)].collect().toSet
    assert(pairs == Set(("a", "b", 6)), pairs.toString)
  }
}
