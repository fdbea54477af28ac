package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket
  * join), SimHash, and n-gram-Jaccard verification. Public-algorithm
  * lineage (Broder 1997 minhash; Charikar 2002 simhash).
  *
  * Scale notes: signatures are per-row Catalyst HOFs (no shuffle); the
  * only shuffles are the groupBy on band buckets / hash keys — both on
  * high-cardinality keys, AQE-coalesced. The candidate self-join is on
  * (band, bucket), never all-pairs: at 10^12 docs the all-pairs join is
  * impossible, the banded join is linear in candidates.
  */
object DedupOps {

  /** Exact dedup: groups by full-text md5; keeper = min doc id.
    * 1 shuffle on the hash (high-cardinality, uniform).
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper"))

  /** 3-token shingles — the minhash unit. Unigram tokens degenerate on
    * vocabulary-saturated corpora (every doc contains every common
    * word, so all signatures collide); word shingles keep diversity.
    */
  def tokenShingles(text: Column): Column = {
    val tokens = split(text, " ")
    array_distinct(when(size(tokens) >= 3,
      transform(sequence(lit(0), size(tokens) - 3), i =>
        concat_ws(" ", element_at(tokens, i + 1), element_at(tokens, i + 2),
          element_at(tokens, i + 3))))
      .otherwise(array(concat_ws(" ", tokens))))
  }

  /** Engine-neutral 64-bit hash (md5-derived): Spark and DuckDB compute
    * identical values, so minhash pipelines built on it are
    * oracle-checkable end-to-end. 15 hex chars = 60 bits — always
    * non-negative, never overflows LONG. DuckDB twin:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
    */
  def md5Hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** MinHash signature as an array<long> of k per-seed minima over
    * 3-token shingles — computed per-row with HOFs (zero shuffle).
    * `neutral = true` swaps xxhash64 for the md5-derived hash so the
    * signature (and every LSH decision downstream) is reproducible in
    * DuckDB; xxhash64 stays the default (faster) engine hash.
    */
  def minhashSignature(text: Column, k: Int, neutral: Boolean = false): Column = {
    val shingles = tokenShingles(text)
    transform(sequence(lit(0), lit(k - 1)), seed =>
      array_min(transform(shingles, t =>
        if (neutral) md5Hash64(concat(seed.cast("string"), lit(":"), t))
        else xxhash64(t, seed))))
  }

  /** LSH band buckets: the k-long signature split into `bands` groups
    * whose hashes become join keys; near-dups collide in ≥1 band whp.
    * Neutral buckets are md5 of the comma-joined slice (string key).
    */
  def lshBands(sig: Column, k: Int, bands: Int, neutral: Boolean = false): Column = {
    val rows = k / bands
    transform(sequence(lit(0), lit(bands - 1)), b => {
      val sl = slice(sig, b * lit(rows) + lit(1), lit(rows))
      val bucket =
        if (neutral) md5(concat_ws(",", transform(sl, x => x.cast("string"))))
          .cast("string").as("bucket")
        else xxhash64(sl).cast("string").as("bucket")
      struct(b.as("band"), bucket)
    })
  }

  /** Candidate near-dup pairs via MinHash+LSH, verified by n-gram
    * Jaccard ≥ `thresholdX1M`. Returns (id_a, id_b, jaccard_x1m),
    * id_a < id_b.
    *
    * Shuffle discipline (the 100 TB budget): only (id, band-bucket)
    * pairs ride the band explode and the candidate join — document
    * bodies do NOT (round 1 shuffled full texts ×bands through the
    * join and distinct'd strings instead of ids; at scale that
    * replicates every document body `bands` times). Texts are
    * re-joined exactly once, per DISTINCT candidate pair, for the
    * Jaccard verification.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, thresholdX1M: Long = 600000L,
      neutral: Boolean = false): DataFrame = {
    // two-step select: aliasing and referencing in one projection would
    // trip Spark's lateral-column-alias resolution on same-named columns
    val withSig = df.select(col(idCol).as("id"), col(textCol).as("text"),
      minhashSignature(col(textCol), k, neutral).as("sig"))
    val withBands = withSig.select(col("id"),
      explode(lshBands(col("sig"), k, bands, neutral)).as("bb"))
    val a = withBands.select(col("id").as("id_a"), col("bb").as("bb_a"))
    val b = withBands.select(col("id").as("id_b"), col("bb").as("bb_b"))
    // dedup candidate id pairs BEFORE the (expensive) Jaccard verify:
    // on vocabulary-uniform corpora many bands collide for the same pair
    val pairs = a
      .join(b, col("bb_a") === col("bb_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val texts = withSig.select(col("id"), col("text"))
    pairs
      .join(texts.select(col("id").as("id_a"), col("text").as("text_a")), Seq("id_a"))
      .join(texts.select(col("id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TextOps.ngramJaccardX1M(col("text_a"), col("text_b"), 3).as("jaccard_x1m"))
      .filter(col("jaccard_x1m") >= thresholdX1M)
  }

  /** 64-bit SimHash over whitespace tokens: per-bit ±1 votes folded with
    * HOFs, packed as the sign vector. Per-row, zero shuffle.
    * `neutral = true` swaps xxhash64 for the md5-derived hash (60
    * effective bits — the top 4 sign bits stay 0) so the signature is
    * DuckDB-reproducible; xxhash64 stays the engine default.
    */
  def simhash64(text: Column, neutral: Boolean = false): Column = {
    val tokens = split(text, " ")
    val votes = aggregate(
      tokens,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = if (neutral) md5Hash64(t) else xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)), (a, i) =>
          a + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two simhash values (near-dup if small). */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
