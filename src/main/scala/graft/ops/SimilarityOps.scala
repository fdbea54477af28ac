package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine top-k as the exact baseline, and an LSH
  * (random-hyperplane signature) bucketing as the scale path — at
  * 10^12 rows the brute-force scan is one pass (acceptable for a single
  * query), but batch ANN needs the bucketed variant so candidates are
  * joined by signature instead of crossed.
  */
object SimilarityOps {

  /** Dot product via zip_with + aggregate (codegen HOFs, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Rank the k rows of an already-limited top-k result WITHOUT a
    * global window: rank = 1 + count of strictly-better rows, via a
    * broadcast self-join over the k-row result. A
    * `row_number().over(Window.orderBy(...))` with no partition moves
    * the ENTIRE scored input to one partition (the round-1
    * scale-killer); here the full input is reduced by a distributed
    * TakeOrderedAndProject first and only k rows ever meet the join.
    */
  private def withRank(top: DataFrame, idCol: String): DataFrame = {
    val better = top.select(col(idCol).as("_bid"), col("cos_sim").as("_bsim"))
    top.join(broadcast(better),
        col("_bsim") > col("cos_sim") ||
          (col("_bsim") === col("cos_sim") && col("_bid") < col(idCol)),
        "left")
      .groupBy(col(idCol), col("cos_sim"))
      .agg((count(col("_bid")) + 1).cast("int").as("rank"))
  }

  /** Exact top-k by cosine against one query vector (broadcast as a
    * literal-free 1-row cross join — Spark broadcasts the tiny side).
    * Ranking uses cosine rounded to 6 dp with id tie-break so results
    * are stable across engines and summation orders. The top-k itself
    * is `orderBy(...).limit(k)` → TakeOrderedAndProject: each partition
    * keeps its local k, the driver merges — distributed at any scale.
    */
  def bruteForceTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val query = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"))
    val scored = embeddings
      .join(broadcast(query))
      .select(col(idCol),
        round(cosine(col(vecCol), col("query_vec")), 6).as("cos_sim"))
    val top = scored.orderBy(col("cos_sim").desc, col(idCol).asc).limit(k)
    withRank(top, idCol).select(col(idCol), col("cos_sim"), col("rank"))
  }

  /** Random-hyperplane LSH signature: bit i = sign of dot(v, h_i) where
    * hyperplane components are deterministic pseudo-random ±values from
    * xxhash64(i, dim). Per-row HOFs; bucket join replaces all-pairs.
    * `neutral = true` derives components from the md5-based hash
    * (DedupOps.md5Hash64, 60 bits recentred to [-1, 1)) so the bucket
    * assignment is DuckDB-reproducible; xxhash64 stays the default.
    */
  def hyperplaneSignature(vec: Column, bits: Int, neutral: Boolean = false): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    val half = math.pow(2, 59)
    aggregate(
      zip_with(
        sequence(lit(0), lit(bits - 1)),
        array_repeat(lit(0L), bits), // placeholder to thread the index
        (i, _) => {
          val d = aggregate(
            zip_with(vec, dims, (x, j) => {
              // deterministic hyperplane component in [-1, 1)
              val comp =
                if (neutral)
                  (DedupOps.md5Hash64(concat(i.cast("string"), lit(":"),
                    j.cast("string"))).cast("double") - lit(half)) / lit(half)
                else xxhash64(i, j).cast("double") / lit(Long.MaxValue.toDouble)
              x.cast("double") * comp
            }),
            lit(0.0), (acc, x) => acc + x)
          when(d > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))
        }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Bucketed ANN top-k: candidates share the query's LSH bucket (or a
    * 1-bit neighbour), then exact cosine re-ranks. The scale path: the
    * probe joins on bucket instead of scanning all rows.
    */
  def lshTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, bits: Int = 12,
      neutral: Boolean = false): DataFrame = {
    val withSig = embeddings.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), bits, neutral).as("sig"))
    val query = withSig.filter(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"), col("sig").as("query_sig"))
    // probe buckets: exact signature plus all 1-bit flips
    val probes = query.select(col("query_vec"),
      explode(concat(array(col("query_sig")),
        transform(sequence(lit(0), lit(bits - 1)),
          i => col("query_sig").bitwiseXOR(call_function("shiftleft", lit(1L), i)))))
        .as("probe_sig"))
    val candidates = withSig.join(broadcast(probes),
      col("sig") === col("probe_sig"))
    val top = candidates
      .select(col(idCol),
        round(cosine(col(vecCol), col("query_vec")), 6).as("cos_sim"))
      .distinct()
      .orderBy(col("cos_sim").desc, col(idCol).asc).limit(k)
    withRank(top, idCol).select(col(idCol), col("cos_sim"), col("rank"))
  }
}
