package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kernel.{ImageDecode, ImageOps}
import graft.model.MediaBlob

/** Multimodal feature extraction over the media sidecar — the step
  * beyond decode that a training-data pipeline needs: a perceptual
  * fingerprint per image so near-duplicate IMAGES dedupe like
  * near-duplicate text. Public-algorithm lineage: difference hash
  * (dHash — gradient hash popularized by Krawetz/pHash family);
  * candidate banding reuses the exact guarded in-bucket machinery of
  * [[DedupOps]].
  *
  * Scale shape: hashing runs in `mapPartitions` at scan granularity
  * (payload bytes never leave their scan partitions — only the
  * (media_ref, 64-bit hash) rows shuffle); the pair join operates on
  * hash bands with the degenerate-bucket guard, never all-pairs.
  */
object MediaOps {

  /** 64-bit difference hash of one image payload: decode → grayscale
    * → bilinear resize to 9×8 → bit (y,x) = 1 iff px(y,x+1) > px(y,x).
    * Row-gradient signs are invariant to global brightness/contrast
    * shifts, robust to small noise, and change ~proportionally to
    * visual difference (hamming distance ≈ dissimilarity). None for
    * undecodable payloads.
    */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    val g = ImageDecode.readGray(bytes)
    if (g == null) return None
    val (px, w, h) = g
    val small = ImageOps.resizeGrayBilinear(px, w, h, 9, 8)
    var hash = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((small(y * 9 + x + 1) & 0xff) > (small(y * 9 + x) & 0xff))
          hash |= 1L << bit
        bit += 1
        x += 1
      }
      y += 1
    }
    Some(hash)
  }

  /** 9×8 gray raster whose [[dHash64]] is EXACTLY `hash` — the
    * dHash inverse at native resolution (the 9×8→9×8 bilinear resize
    * is the identity map): each row starts at gray 100 and steps +1
    * where the corresponding hash bit is 1 (strictly greater → bit 1)
    * and −1 where it is 0 (not greater → bit 0); values stay in
    * [92, 108]. Encoded losslessly (PNG), the planted hash survives
    * decode bit-for-bit, making the whole dHash → band → hamming
    * lattice oracle-checkable from the hash formula alone (q32 —
    * the planted-rule pattern of q31).
    */
  def hashRaster(hash: Long): Array[Byte] = {
    val px = new Array[Byte](9 * 8)
    var y = 0
    while (y < 8) {
      var v = 100
      px(y * 9) = v.toByte
      var x = 0
      while (x < 8) {
        v += (if (((hash >>> (y * 8 + x)) & 1L) == 1L) 1 else -1)
        px(y * 9 + x + 1) = v.toByte
        x += 1
      }
      y += 1
    }
    px
  }

  /** media(media_ref, bytes) → (media_ref, dhash:long nullable).
    * Typed mapPartitions: the only stage touching bytes; undecodable
    * payloads yield NULL (surfaced, not dropped — count them for
    * lineage like kernel error spans).
    */
  def imageDHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_ref"), col("bytes")).as[MediaBlob]
      .mapPartitions(_.map(b =>
        (b.media_ref, dHash64(b.bytes).map(java.lang.Long.valueOf).orNull)))
      .toDF("media_ref", "dhash")
  }

  /** Near-duplicate image pairs from a (media_ref, dhash) frame:
    * candidates collide on a `bandBits`-bit slice of the hash (an
    * image pair within hamming distance d shares ≥1 of the 64/bandBits
    * bands whenever d < 64/bandBits — pigeonhole), verified by full
    * hamming ≤ `maxHamming`. DEFAULTS ARE CONSISTENT BY PIGEONHOLE:
    * bandBits=8 gives 8 bands, so every pair with hamming ≤ 7 ≥
    * maxHamming=6 shares a band DETERMINISTICALLY — no probabilistic
    * recall gap (the round-4 bandBits=16 default guaranteed only
    * d < 4 while verifying to 6; advisor finding). If you raise
    * `maxHamming`, lower `bandBits` so 64/bandBits > maxHamming keeps
    * the guarantee. The guarded in-bucket pair generation is
    * [[DedupOps]]'s — count filter first, collect bounded, pairs
    * row-bounded sub-bucket by sub-bucket; victims of the cap are the
    * exact-dup-pass's work (report via a groupBy on dhash before
    * this). NOTE: a band key space of 2^bandBits is coarse — at
    * extreme corpus sizes raise `bandBits` (fewer, longer bands trade
    * the deterministic radius for bucket population) or exact-dedup
    * on the full hash first.
    */
  def imageNearDupPairs(
      hashes: DataFrame,
      maxHamming: Int = 6,
      bandBits: Int = 8,
      maxBucket: Int = 1000): DataFrame = {
    val clean = hashes.filter(col("dhash").isNotNull)
      .select(col("media_ref").as("id"), col("dhash"))
    val bands = clean.select(col("id"),
      explode(DedupOps.hashBands64(col("dhash"), bandBits)).as("bb"))
    val smallBuckets = bands.groupBy(col("bb"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucket))
      .select(col("bb"))
    val pairs = DedupOps.boundedSelfPairs(
      bands.join(smallBuckets, Seq("bb"))
        .groupBy(col("bb"))
        .agg(array_sort(collect_set(col("id"))).as("ids")),
      "ids")
      .distinct()
    val h = clean
    pairs
      .join(h.select(col("id").as("id_a"), col("dhash").as("h_a")), Seq("id_a"))
      .join(h.select(col("id").as("id_b"), col("dhash").as("h_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** The band buckets [[imageNearDupPairs]] DROPPED under its
    * `maxBucket` guard — (band, bucket, bucket_n) per oversized
    * bucket. The no-silent-caps report (parity with
    * [[DedupOps.minhashOversizedBuckets]] /
    * [[SimilarityOps.oversizedSigBuckets]]): a guarded pipeline should
    * count these; their members are exact-dedup work on the full hash
    * (identical images hash identically), not banded-LSH work.
    */
  def imageOversizedBuckets(
      hashes: DataFrame,
      bandBits: Int = 8,
      maxBucket: Int = 1000): DataFrame = {
    hashes.filter(col("dhash").isNotNull)
      .select(explode(DedupOps.hashBands64(col("dhash"), bandBits)).as("bb"))
      .groupBy(col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
  }
}
