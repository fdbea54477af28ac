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
    * bands whenever d < 64/bandBits), verified by full hamming ≤
    * `maxHamming`. The guarded in-bucket pair generation is
    * [[DedupOps.pairsWithin]]'s — count filter first, collect bounded,
    * pairs in place; victims of the cap are the exact-dup-pass's work
    * (report via a groupBy on dhash before this). NOTE: a band key
    * space of 2^bandBits is coarse — at extreme corpus sizes raise
    * `bandBits` (fewer, longer bands trade recall radius for bucket
    * population) or exact-dedup on the full hash first.
    */
  def imageNearDupPairs(
      hashes: DataFrame,
      maxHamming: Int = 6,
      bandBits: Int = 16,
      maxBucket: Int = 1000): DataFrame = {
    require(64 % bandBits == 0, "bandBits must divide 64")
    val nBands = 64 / bandBits
    val mask = (1L << bandBits) - 1
    val clean = hashes.filter(col("dhash").isNotNull)
      .select(col("media_ref").as("id"), col("dhash"))
    val bands = clean.select(col("id"),
      explode(transform(sequence(lit(0), lit(nBands - 1)), b =>
        struct(b.as("band"),
          call_function("shiftright", col("dhash"), b * lit(bandBits))
            .bitwiseAND(lit(mask)).as("bucket")))).as("bb"))
    val smallBuckets = bands.groupBy(col("bb"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucket))
      .select(col("bb"))
    val pairs = bands.join(smallBuckets, Seq("bb"))
      .groupBy(col("bb"))
      .agg(array_sort(collect_set(col("id"))).as("ids"))
      .select(explode(DedupOps.pairsWithin(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    val h = clean
    pairs
      .join(h.select(col("id").as("id_a"), col("dhash").as("h_a")), Seq("id_a"))
      .join(h.select(col("id").as("id_b"), col("dhash").as("h_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
