package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine top-k as the exact baseline, an LSH
  * (random-hyperplane signature) bucketing as the scale path, and a
  * bucketed all-pairs near-dup operator — at 10^12 rows the
  * brute-force scan is one pass (acceptable for a single query), but
  * batch ANN / batch near-dup needs the bucketed variants so
  * candidates are joined by signature instead of crossed.
  */
object SimilarityOps {

  /** Dot product as the native codegen'd [[graft.exprs.VecDot]]
    * expression (round 8). Bit-identical to the previous
    * `aggregate(zip_with(a, b, x·y), 0.0, +)` HOF fold — same
    * left-to-right IEEE sequence, same NULL semantics (length
    * mismatch / NULL element / NULL input → NULL, empty → 0.0) — but
    * it runs as a tight primitive loop inside whole-stage codegen and
    * participates in common-subexpression elimination, which the
    * interpreted HOF fold (lambda subtrees) never did: a cosine's
    * twice-referenced denominator used to cost two full folds.
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Rank the k rows of an already-limited top-k result WITHOUT a
    * global window and WITHOUT a nested-loop join: pack the k rows
    * into one sorted array (desc cos_sim, asc id — the cross-engine
    * tie-break), posexplode, rank = position + 1. A
    * `row_number().over(Window.orderBy(...))` with no partition moves
    * the ENTIRE scored input to one partition (the round-1
    * scale-killer); the round-2 broadcast self-join was scale-safe but
    * left a BroadcastNestedLoopJoin in every top-k plan — this
    * packs only the k already-reduced rows, no join at all.
    */
  private def withRank(top: DataFrame, idCol: String): DataFrame =
    top
      .agg(array_sort(collect_list(struct(
        (-col("cos_sim")).as("neg_sim"), col(idCol).as("id"),
        col("cos_sim").as("cs")))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("pos", "row")))
      .select(col("row.id").as(idCol), col("row.cs").as("cos_sim"),
        (col("pos") + 1).cast("int").as("rank"))

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
    withRank(top, idCol)
  }

  /** Hyperplane component matrix, precomputed ONCE at plan-build time —
    * the component for (bit i, dim j) is data-independent, so
    * recomputing it per row (as round 2 did, one md5 + base conversion
    * per (bit × dim × row)) is pure waste; q26 regressed 0.8→3.0 s on
    * it. `neutral` uses the md5-derived formula the DuckDB oracle
    * reproduces (bit-identical: long→double conversion, subtract,
    * divide are the same IEEE ops driver-side as in Catalyst);
    * the default uses splitmix64 (public-domain mixer, Steele et al.
    * 2014) — deterministic across JVMs, no cross-engine requirement.
    */
  def hyperplaneMatrix(
      bits: Int, dims: Int, neutral: Boolean): Seq[Seq[Double]] = {
    val half = math.pow(2, 59)
    def splitmix64(v: Long): Long = {
      var x = v + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    (0 until bits).map(i => (0 until dims).map { j =>
      if (neutral) (DedupOps.md5Hash64Scala(s"$i:$j") - half) / half
      else splitmix64(i.toLong * dims + j).toDouble / Long.MaxValue.toDouble
    })
  }

  /** Random-hyperplane LSH signature: bit i = sign of dot(v, h_i). The
    * bits×dims hyperplane matrix rides the plan as a literal nested
    * array; the per-row cost is pure HOF arithmetic (no hashing).
    * `dims` must match the embedding length (extra dims are ignored by
    * zip_with; missing dims null out the dot product → bit 0).
    */
  def hyperplaneSignature(
      vec: Column, bits: Int, dims: Int,
      neutral: Boolean = false): Column = {
    val mat = typedlit(hyperplaneMatrix(bits, dims, neutral))
    aggregate(
      zip_with(sequence(lit(0), lit(bits - 1)), mat, (i, row) => {
        // vec_dot (round 8): one native call per bit instead of a
        // dims-element interpreted lambda fold — same IEEE sequence
        val d = call_function("vec_dot", vec, row)
        when(d > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** The probe set for a signature: itself plus all 1-bit flips
    * (hamming-1 multi-probe — standard LSH recall booster).
    */
  private def probesOf(sig: Column, bits: Int): Column =
    concat(array(sig),
      transform(sequence(lit(0), lit(bits - 1)),
        i => sig.bitwiseXOR(call_function("shiftleft", lit(1L), i))))

  /** Bucketed ANN top-k: candidates share the query's LSH bucket (or a
    * 1-bit neighbour), then exact cosine re-ranks. The scale path: the
    * probe joins on bucket instead of scanning all rows.
    */
  def lshTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, bits: Int = 12, dims: Int = 64,
      neutral: Boolean = false): DataFrame = {
    val withSig = embeddings.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), bits, dims, neutral).as("sig"))
    val query = withSig.filter(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"), col("sig").as("query_sig"))
    val probes = query.select(col("query_vec"),
      explode(probesOf(col("query_sig"), bits)).as("probe_sig"))
    val candidates = withSig.join(broadcast(probes),
      col("sig") === col("probe_sig"))
    val top = candidates
      .select(col(idCol),
        round(cosine(col(vecCol), col("query_vec")), 6).as("cos_sim"))
      .distinct()
      .orderBy(col("cos_sim").desc, col(idCol).asc).limit(k)
    withRank(top, idCol)
  }

  /** Batch LSH ANN: ONE plan answers MANY queries — the serving shape
    * of [[ivfQueryBatch]] for the hyperplane family. Corpus signatures
    * are computed once; each query row explodes its hamming-≤1 probe
    * set (1 + bits signatures) and candidates JOIN on the signature —
    * never a corpus scan per query, and the query side (Q × (1+bits)
    * rows) broadcasts. Exact cosine re-ranks under a window
    * PARTITIONED by query id (hash-distributed, never a global sort).
    * Per-query results are identical to [[lshTopK]] (same probes, same
    * 6-dp rounding and id tie-break). Output: (query_id, idCol,
    * cos_sim, rank).
    */
  def lshTopKBatch(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, bits: Int = 12, dims: Int = 64,
      neutral: Boolean = false): DataFrame = {
    val withSig = embeddings.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), bits, dims, neutral).as("sig"))
    val probes = queries
      .select(col(qidCol).as("query_id"), col(qvecCol).as("_qvec"),
        hyperplaneSignature(col(qvecCol), bits, dims, neutral).as("_qsig"))
      .select(col("query_id"), col("_qvec"),
        explode(probesOf(col("_qsig"), bits)).as("sig"))
    val candidates = withSig.join(broadcast(probes), Seq("sig"))
    val scored = candidates
      .select(col("query_id"), col(idCol),
        round(cosine(col(vecCol), col("_qvec")), 6).as("cos_sim"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  // -------------------------------------------------------------------
  // IVF (inverted-file) ANN — the second family beside the
  // random-hyperplane LSH of [[lshTopK]], in its MATERIALIZED
  // build/query form (round 6; the round-5 one-shot recomputed every
  // vector's cell assignment inside every query's plan — a full-corpus
  // C×D pass per query that could not partition-prune).
  // -------------------------------------------------------------------

  /** Handle to a materialized IVF index: the cell-partitioned table
    * under `root/cells` (columns idCol, vecCol, partition column cell;
    * one directory per cell) plus the exact centroid matrix the
    * assignment used — persisted alongside the cells (centroids.json,
    * shortest round-trip double rendering, so a fresh session reloads
    * bit-identical centroids via [[ivfLoad]]). `deltas` are committed
    * per-epoch delta tables (same cell-partitioned layout) written by
    * [[graft.pipeline.StreamingIndex]]; queries read base ∪ deltas,
    * each root partition-pruning independently.
    */
  final case class IvfIndex(
      root: String, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], deltas: Seq[String] = Nil,
      gen: Int = 0, quantized: Boolean = false) {
    def cellsPath: String = ivfCellsPath(root, gen)
    def dataPaths: Seq[String] = cellsPath +: deltas
  }

  /** Base cell table of generation `gen`. Generation 0 is the
    * [[ivfBuild]] layout (`root/cells`); each reader-safe compaction
    * ([[graft.pipeline.StreamingIndex.compact]]) writes the folded
    * base to the NEXT generation directory and atomically swaps the
    * pointer ([[ivfWriteGeneration]]) — handles loaded before the
    * swap keep reading their own generation's intact files.
    */
  def ivfCellsPath(root: String, gen: Int): String =
    if (gen == 0) s"$root/cells" else s"$root/cells-gen$gen"

  /** The index's rows: base cells plus every committed delta. Each
    * root is read separately (own partition discovery) and unioned, so
    * a `cell` filter partition-prunes inside EVERY branch — pruning
    * survives the union.
    */
  private[graft] def readCells(
      spark: org.apache.spark.sql.SparkSession, index: IvfIndex): DataFrame =
    index.dataPaths.map(spark.read.parquet(_)).reduce(_.unionByName(_))

  /** Assign rows to the index's cells with its frozen centroid matrix
    * — the exact argmax the build used, exposed for incremental paths
    * ([[ivfAppend]], [[graft.pipeline.StreamingIndex]]). On a
    * quantized index ([[ivfBuild]] `quantize = true`) the SQ8 columns
    * are derived here too, so every writer — build, batch append,
    * streaming delta — produces the same cell schema. The struct is
    * projected FIRST (interpreted-expression pitfall: three field
    * extractions over an inline [[graft.exprs.Int8Pack]] call would
    * re-pack per reference; the non-cheap struct blocks
    * CollapseProject, so one pack feeds all three).
    */
  def assignCells(df: DataFrame, index: IvfIndex): DataFrame = {
    val assigned = withCellOf(df, index.idCol, index.vecCol, index.centroids)
    if (!index.quantized) assigned
    else assigned
      .select(col(index.idCol), col(index.vecCol), col("cell"),
        call_function("int8_pack", col(index.vecCol)).as("_sq8"))
      .select(col(index.idCol), col(index.vecCol),
        col("_sq8.code").as("code8"), col("_sq8.scale").as("scale8"),
        col("_sq8.cnorm").as("cnorm8"), col("cell"))
  }

  /** Driver-side twin of the assignment/probe dot product: the HOF
    * fold `aggregate(zip_with(vec, c, x·c), 0.0, +)` sums strictly
    * left-to-right, and this fold performs the identical IEEE sequence
    * (Float→Double per element, multiply, running add) — so cells
    * computed plan-side and probes ranked driver-side agree exactly.
    */
  def dotScala(vec: Seq[Double], c: Seq[Double]): Double = {
    var acc = 0.0
    var j = 0
    val n = math.min(vec.length, c.length)
    while (j < n) { acc += vec(j) * c(j); j += 1 }
    acc
  }

  /** Deterministic sampled centroid bootstrap of classic IVF: the
    * vectors with id % centroidEvery == 0, first `maxCentroids` by id
    * — chosen so the whole operator is oracle-checkable, like q26's
    * neutral hyperplanes. The collect is bounded by `maxCentroids`
    * (small constant), never corpus-sized.
    */
  def sampleCentroids(
      embeddings: DataFrame, idCol: String, vecCol: String,
      centroidEvery: Long, maxCentroids: Int): Seq[Seq[Double]] =
    embeddings
      .filter(col(idCol) % centroidEvery === 0)
      .orderBy(col(idCol)).limit(maxCentroids)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq

  /** argmax-raw-dot cell assignment over a literal centroid matrix — a
    * per-row HOF, zero shuffle; raw dot, not cosine, so no
    * sqrt/division enters the cross-engine argmax. Ties assign to the
    * lowest cell index. dots are projected FIRST (argmax references
    * the array twice, and a computed subtree re-evaluates per
    * reference under interpreted HOFs).
    */
  private def withCellOf(
      df: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Seq[Double]]): DataFrame = {
    val mat = typedlit(cents)
    df.select(col(idCol), col(vecCol),
      transform(mat, c =>
        call_function("vec_dot", col(vecCol), c)).as("dots"))
      .select(col(idCol), col(vecCol),
        (array_position(col("dots"), array_max(col("dots"))) - 1)
          .cast("int").as("cell"))
  }

  /** Lloyd refinement of a centroid SET (assignment and probing are
    * unchanged — the classic k-means fix for the sampled bootstrap's
    * missing balance guarantee: a skewed corpus puts most vectors in
    * few sampled cells and nprobe recall collapses). Each iteration is
    * ONE DataFrame pass: assign by argmax raw dot, groupBy cell, one
    * codegen'd sum per dimension, collect ≤ |centroids| rows, average
    * driver-side. Empty cells keep their previous centroid. NOTE:
    * double summation order across partitions is nondeterministic, so
    * refined centroids vary in ulps across runs — refinement is an
    * engine-side option (refineIters = 0 stays the oracle path).
    */
  def refineCentroids(
      embeddings: DataFrame, idCol: String, vecCol: String,
      init: Seq[Seq[Double]], iters: Int): Seq[Seq[Double]] = {
    var cents = init
    val dims = init.headOption.map(_.length).getOrElse(0)
    (0 until iters).foreach { _ =>
      val assigned = withCellOf(embeddings, idCol, vecCol, cents)
      val sums = (0 until dims).map(j =>
        sum(element_at(col(vecCol), j + 1).cast("double")).as(s"s$j"))
      val rows = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
        .map(r => r.getInt(0) -> r).toMap
      cents = cents.zipWithIndex.map { case (c, i) =>
        rows.get(i) match {
          case Some(r) if r.getLong(1) > 0 =>
            val n = r.getLong(1).toDouble
            (0 until dims).map(j => r.getDouble(j + 2) / n)
          case _ => c
        }
      }
    }
    cents
  }

  /** Build the materialized IVF index: assignment computed ONCE over
    * the corpus, written `partitionBy("cell")` so queries
    * partition-prune to their probed cells — the compute-once /
    * probe-many split (the reference's Redis OCR cache,
    * app/utils/ocr_engine.py:123-135, is the same split at document
    * grain). `sortWithinPartitions(cell)` keeps one open writer per
    * task; within a cell file ids arrive in scan order, so id-lookup
    * row-group stats stay tight. The centroid matrix is persisted next
    * to the cells; reload with [[ivfLoad]]. `refineIters > 0` runs
    * [[refineCentroids]] first.
    *
    * Balance is observable, not silent: [[ivfCellStats]] reports
    * per-cell populations (the no-silent-caps convention, parity with
    * [[DedupOps.minhashOversizedBuckets]]).
    */
  def ivfBuild(
      embeddings: DataFrame, idCol: String, vecCol: String,
      indexDir: String, centroidEvery: Long = 64,
      maxCentroids: Int = 64, refineIters: Int = 0,
      quantize: Boolean = false): IvfIndex = {
    val sampled = sampleCentroids(embeddings, idCol, vecCol,
      centroidEvery, maxCentroids)
    require(sampled.nonEmpty, "no centroids sampled — lower centroidEvery")
    val cents =
      if (refineIters > 0)
        refineCentroids(embeddings, idCol, vecCol, sampled, refineIters)
      else sampled
    val idx0 = IvfIndex(indexDir, idCol, vecCol, cents,
      quantized = quantize)
    // maxFoldedEpoch read BEFORE any mutation and carried through the
    // reset (advisor, round 7): silently dropping it to -1 would lose
    // the replay backstop if the same streaming checkpoint lineage
    // continues against the rebuilt index
    val (_, _, maxFolded) = ivfReadGenerationFull(indexDir)
    assignCells(embeddings, idx0)
      .sortWithinPartitions(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/cells")
    // a rebuild RESETS the index: deltas assigned under the previous
    // centroid matrix are stale — retire their manifests and swap the
    // pointer back to generation 0 BEFORE overwriting centroids.json
    // (advisor, round 7: the old order let a reader on a gen>0 index
    // pair the NEW matrix with the OLD generation's cells). NOTE:
    // rebuild-IN-PLACE is inherently not reader-safe — generation 0's
    // cell directory is overwritten above, and the pointer and
    // centroids.json are two files with no joint commit point — so a
    // rebuild requires no concurrent readers (build into a fresh
    // indexDir for zero-downtime swaps); this ordering only shrinks
    // the inconsistent window, it cannot close it.
    ivfManifestTokens(indexDir).foreach(t =>
      java.nio.file.Files.deleteIfExists(ivfDeltaManifestToken(indexDir, t)))
    ivfWriteGeneration(indexDir, 0, Set.empty, maxFolded)
    // java.lang.Double.toString is the shortest exact round-trip
    // rendering; parsing it back yields the identical bits
    val json = "{\"idCol\":\"" + idCol + "\",\"vecCol\":\"" + vecCol +
      "\",\"sq8\":" + quantize + ",\"centroids\":[" +
      cents.map(_.map(d => java.lang.Double.toString(d))
        .mkString("[", ",", "]")).mkString(",") + "]}"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(indexDir, "centroids.json"), json)
    idx0
  }

  /** Incrementally add vectors to a materialized index — the classic
    * IVF insert: the centroid matrix is FROZEN (assignment stays the
    * exact argmax the build used, so append-then-query ≡
    * rebuild-over-the-union bit for bit), new vectors are assigned in
    * one pass and appended into their cell partitions. Queries see
    * the new vectors with zero rebuild and zero touch of existing
    * rows — the arriving-corpus counterpart of build-once/query-many.
    * Cost: one scan of ONLY the new batch + one partitioned append;
    * the existing 10^12-row table is never read or rewritten.
    *
    * Durability (round 7): the batch is written as a COMMITTED DELTA
    * — the exact layout [[graft.pipeline.StreamingIndex]] uses for
    * streaming epochs (cell-partitioned delta dir + atomic tmp+rename
    * manifest), written synchronously. A crash mid-write leaves an
    * unmanifested delta dir that no reader ([[ivfLoad]]) ever sees; a
    * retried append overwrites it under a fresh token. The base table
    * is never touched, so a crash can no longer poison subsequent
    * reads with partial part-files. [[graft.pipeline.StreamingIndex
    * .compact]] folds batch deltas and streaming deltas alike.
    * Single-writer per index (the suite-wide convention, parity with
    * [[graft.pipeline.Commit]]): two appenders racing the token
    * allocation could pick the same token — serialize appends, or use
    * [[graft.pipeline.StreamingIndex]] where the checkpoint serializes
    * arrival. Drift note: appends skew cell balance over time; watch
    * [[ivfCellStats]] and rebuild with `refineIters > 0` when a cell
    * runs hot.
    */
  def ivfAppend(index: IvfIndex, newVectors: DataFrame): IvfIndex = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.createDirectories(Paths.get(index.root, "_delta_manifest"))
    val (_, folded) = ivfReadGeneration(index.root)
    // next unused append token: committed + folded tokens are taken
    // forever (a folded token's rows live in the base — reusing it
    // could resurrect them); an UNmanifested dir of the same name is a
    // crashed attempt and is safely overwritten
    val used = (ivfManifestTokens(index.root) ++ folded)
      .collect { case t if t.startsWith("append-") =>
        t.stripPrefix("append-").toLong }
    val token = s"append-${if (used.isEmpty) 0L else used.max + 1L}"
    val path = ivfDeltaPathToken(index.root, token)
    assignCells(newVectors, index)
      .sortWithinPartitions(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(path)
    val rows = newVectors.sparkSession.read.parquet(path).count()
    val tmp = Paths.get(index.root, "_delta_manifest", s".$token.json.tmp")
    Files.writeString(tmp, s"""{"token":"$token","rowCount":$rows}""")
    Files.move(tmp, ivfDeltaManifestToken(index.root, token),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    index.copy(deltas = index.deltas :+ path)
  }

  /** Reload an index handle written by [[ivfBuild]] (fresh session /
    * query-only deployment — nothing is recomputed). Committed
    * streaming deltas under the index root are picked up automatically
    * — an epoch delta written but never manifest-renamed (crash) stays
    * invisible until its replay commits it.
    */
  def ivfLoad(indexDir: String): IvfIndex = {
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(indexDir, "centroids.json"))
    def field(name: String): String =
      ("\"" + name + "\":\"([^\"]*)\"").r.findFirstMatchIn(json)
        .getOrElse(sys.error(s"bad centroids.json: no $name")).group(1)
    val cents = "\\[([^\\[\\]]+)\\]".r.findAllMatchIn(
        json.substring(json.indexOf("\"centroids\"")))
      .map(_.group(1).split(",").map(_.toDouble).toSeq).toSeq
    // Manifest listing BEFORE the single pointer read — the order that
    // makes a load racing a compaction consistent: if the pointer
    // (read second) still shows generation G, the swap had not yet
    // happened when the earlier listing ran, so the listing is
    // complete for G's delta set; if it already shows G+1, the folded
    // filter strips exactly what G+1 absorbed (compaction retires
    // manifests only AFTER the swap). Pointer-first would allow
    // (old gen, post-retirement empty listing) — a handle silently
    // missing the folded rows.
    val listed = ivfManifestTokens(indexDir)
    val (gen, folded, _) = ivfReadGenerationFull(indexDir)
    IvfIndex(indexDir, field("idCol"), field("vecCol"), cents,
      listed.filterNot(folded).map(t => ivfDeltaPathToken(indexDir, t)), gen,
      quantized = json.contains("\"sq8\":true"))
  }

  // --- delta layout (streaming epochs AND batch appends) -------------
  // root/delta/<token>/cell=<c>/...    delta rows; token is epoch-<id>
  //                                    (StreamingIndex) or append-<n>
  //                                    (ivfAppend)
  // root/_delta_manifest/<token>.json  the atomic commit point
  // root/generation.json               base-generation pointer + the
  //                                    tokens already folded into it

  def ivfDeltaPath(indexDir: String, epoch: Long): String =
    ivfDeltaPathToken(indexDir, s"epoch-$epoch")

  def ivfDeltaPathToken(indexDir: String, token: String): String =
    s"$indexDir/delta/$token"

  def ivfDeltaManifest(indexDir: String, epoch: Long): java.nio.file.Path =
    ivfDeltaManifestToken(indexDir, s"epoch-$epoch")

  def ivfDeltaManifestToken(
      indexDir: String, token: String): java.nio.file.Path =
    java.nio.file.Paths.get(indexDir, "_delta_manifest", s"$token.json")

  /** Every manifest-listed delta token, sorted (epochs first, then
    * appends, numerically within each kind — a deterministic union
    * order for [[readCells]]).
    */
  private[graft] def ivfManifestTokens(indexDir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val mDir = java.nio.file.Paths.get(indexDir, "_delta_manifest")
    if (!java.nio.file.Files.isDirectory(mDir)) Nil
    else {
      val s = java.nio.file.Files.list(mDir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.matches("(epoch|append)-\\d+\\.json") =>
          n.stripSuffix(".json") }
        .toSeq
        .sortBy { t =>
          val Array(kind, num) = t.split("-", 2)
          (if (kind == "epoch") 0 else 1, num.toLong)
        }
      finally s.close()
    }
  }

  /** Delta tokens any reader may see: committed (manifest present) and
    * NOT folded into the current base generation. The folded exclusion
    * closes the compaction crash window — if a crash lands between the
    * generation swap and manifest retirement, the lingering manifests
    * are ignored rather than double-counted (advisor, round 6).
    */
  def ivfCommittedDeltaTokens(indexDir: String): Seq[String] = {
    // same listing-before-pointer order as ivfLoad (see its comment)
    val listed = ivfManifestTokens(indexDir)
    val (_, folded) = ivfReadGeneration(indexDir)
    listed.filterNot(folded)
  }

  /** Streaming-epoch ids among the live committed deltas. */
  def ivfCommittedDeltaEpochs(indexDir: String): Seq[Long] =
    ivfCommittedDeltaTokens(indexDir)
      .collect { case t if t.startsWith("epoch-") =>
        t.stripPrefix("epoch-").toLong }

  /** Read the generation pointer: (generation, folded tokens).
    * (0, empty) when absent — the fresh-build layout.
    */
  def ivfReadGeneration(indexDir: String): (Int, Set[String]) = {
    val (gen, folded, _) = ivfReadGenerationFull(indexDir)
    (gen, folded)
  }

  /** Full pointer: (generation, folded tokens, maxFoldedEpoch).
    * `maxFoldedEpoch` is the highest STREAMING epoch id ever folded
    * into any base generation — monotone, never pruned (one long, not
    * a growing list). It outlives the folded list so that a crashed
    * epoch replay arriving after compaction retired the manifest AND
    * [[graft.pipeline.StreamingIndex.vacuum]] pruned the folded entry
    * still cannot re-commit rows the base already holds. Consistent
    * with the manifest convention's standing contract: one streaming
    * checkpoint lineage per index dir (epoch ids are the dedup key).
    */
  def ivfReadGenerationFull(indexDir: String): (Int, Set[String], Long) = {
    val p = java.nio.file.Paths.get(indexDir, "generation.json")
    if (!java.nio.file.Files.exists(p)) (0, Set.empty, -1L)
    else {
      val json = java.nio.file.Files.readString(p)
      val gen = "\"gen\":(\\d+)".r.findFirstMatchIn(json)
        .map(_.group(1).toInt).getOrElse(0)
      val folded = "\"((?:epoch|append)-\\d+)\"".r.findAllMatchIn(json)
        .map(_.group(1)).toSet
      val maxEpoch = "\"maxFoldedEpoch\":(-?\\d+)".r.findFirstMatchIn(json)
        .map(_.group(1).toLong).getOrElse(-1L)
      (gen, folded, maxEpoch)
    }
  }

  /** Atomically swap the generation pointer (tmp + rename — the
    * manifest convention). This single rename is the ONLY commit point
    * of a compaction: a reader loads either the old generation with
    * its deltas or the new generation without them, never a mix.
    */
  def ivfWriteGeneration(
      indexDir: String, gen: Int, folded: Set[String],
      maxFoldedEpoch: Long = -1L): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val json = s"""{"gen":$gen,"maxFoldedEpoch":$maxFoldedEpoch,"folded":[""" +
      folded.toSeq.sorted.map("\"" + _ + "\"").mkString(",") + "]}"
    val tmp = Paths.get(indexDir, ".generation.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(indexDir, "generation.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Per-cell populations of a built index — the balance report a
    * deployment checks before trusting nprobe recall (one hot cell =
    * the degenerate-bucket problem; fix with `refineIters`).
    */
  def ivfCellStats(spark: org.apache.spark.sql.SparkSession,
      index: IvfIndex): DataFrame =
    readCells(spark, index)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))

  /** Measure the index's recall@k-vs-nprobe curve on a query sample —
    * in ONE corpus pass, for EVERY nprobe at once. The analytic trick:
    * [[ivfQueryBatch]] re-ranks visible candidates by exact cosine
    * with the same (desc cos, asc id) order the exact top-k uses, so
    * an exact-top-k member that is VISIBLE at nprobe n is necessarily
    * IN the served top-k at nprobe n (any row beating it would itself
    * be an exact-top-k member). Visibility of a row is determined by
    * one number: the probe-rank of its cell in the query's
    * descending-raw-dot centroid order. So the whole curve falls out
    * of the exact top-k (one brute-force pass over the index rows,
    * Q-sample × corpus scored) joined to the per-query cell ranking
    * (plan-side vs the literal centroid matrix — the exact
    * [[ivfQueryBatch]] probe lattice):
    * `hits(n) = Σ_q |{exact top-k of q} with cell-rank ≤ n|`,
    * `recall@k(nprobe=n) = hits(n) / (Q·k)`.
    *
    * Returns the CUMULATIVE hit counts (`hits(1)..hits(C)`) plus Q —
    * integers, so downstream threshold decisions
    * ([[ivfNprobeForRecall]]) are exact and cross-engine stable (the
    * `thresholdX1M` convention). Collects are bounded by C (the
    * per-rank histogram) — never query- or corpus-sized. Cost is the
    * honest price of measuring recall: one scan of the index rows
    * with |sample| scores per row; sample accordingly.
    */
  def ivfRecallHits(
      spark: org.apache.spark.sql.SparkSession, index: IvfIndex,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int): (Seq[Long], Long) = {
    val mat = typedlit(index.centroids)
    val nc = index.centroids.length
    val qv = queries.select(col(qidCol).as("query_id"),
      col(qvecCol).as("_qvec"))
    // per-query cell ranking, plan-side (the ivfQueryBatch probe
    // lattice with the full ranking kept, not sliced to nprobe)
    val cellRanks = qv
      .select(col("query_id"),
        transform(mat, c =>
          call_function("vec_dot", col("_qvec"), c)).as("_dots"))
      .select(col("query_id"),
        posexplode(transform(
          array_sort(zip_with(
            col("_dots"), sequence(lit(0), lit(nc - 1)),
            (d, i) => struct((-d).as("nd"), i.as("cell")))),
          p => p("cell").cast("int"))).as(Seq("pos", "cell")))
      .select(col("query_id"), col("cell"),
        (col("pos") + 1).cast("int").as("cellrank"))
    // exact top-k per query over the index rows (which carry `cell`)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col(index.idCol).asc)
    val exactTopK = readCells(spark, index)
      .join(broadcast(qv))
      .select(col("query_id"), col(index.idCol), col("cell"),
        round(cosine(col(index.vecCol), col("_qvec")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cell"))
    val perRank = exactTopK
      .join(cellRanks, Seq("query_id", "cell"))
      .groupBy(col("cellrank")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cum = (1 to nc).scanLeft(0L)((acc, n) =>
      acc + perRank.getOrElse(n, 0L)).tail
    (cum, queries.select(col(qidCol)).distinct().count())
  }

  /** Smallest nprobe whose measured recall meets the target —
    * `hits(n)·10^6 ≥ targetX1M·Q·k`, an ALL-INTEGER comparison (no
    * float threshold can straddle an engine boundary); the full scan
    * (nprobe = C, recall 1 by construction) when no measured point
    * reaches the target.
    */
  def ivfNprobeForRecall(
      hits: Seq[Long], numQueries: Long, k: Int, targetX1M: Long): Int =
    hits.indexWhere(_ * 1000000L >= targetX1M * numQueries * k) match {
      case -1 => hits.length
      case i  => i + 1
    }

  /** Content tag of the index as a reader sees it right now: centroid
    * matrix + base generation + live committed delta tokens. Any
    * append (new token), compaction (generation bump), or rebuild
    * (new centroids) changes the tag — the staleness fence for the
    * persisted recall curve. Conservative on compaction: folding
    * preserves answers, so a re-measure there is wasted-but-safe (the
    * alternative — proving content equality across the fold — buys
    * one corpus pass per compaction and a subtle invariant; not worth
    * it).
    */
  private def ivfStateTag(indexDir: String): String = {
    val cents = java.nio.file.Files.readString(
      java.nio.file.Paths.get(indexDir, "centroids.json"))
    val (gen, folded, _) = ivfReadGenerationFull(indexDir)
    val tokens = ivfManifestTokens(indexDir).filterNot(folded)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"$gen|${tokens.mkString(",")}|$cents".getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Persist a measured curve beside the centroids (recall.json, tmp +
    * atomic rename — the manifest convention) so a query-only session
    * tunes nprobe without re-measuring. The record carries the index's
    * content tag ([[ivfStateTag]]); readers treat a tag mismatch as
    * no-curve, so a curve measured before an append, compaction, or
    * rebuild can never silently tune the grown index.
    */
  def ivfWriteRecall(
      indexDir: String, k: Int, numQueries: Long, hits: Seq[Long],
      sampleTag: String = ""): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val json = s"""{"k":$k,"queries":$numQueries,""" +
      s""""state":"${ivfStateTag(indexDir)}","sample":"$sampleTag",""" +
      s""""hits":[""" + hits.mkString(",") + "]}"
    val tmp = Paths.get(indexDir, ".recall.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(indexDir, "recall.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Identity tag of a query sample: md5 over the SORTED distinct id
    * set. Persisted beside the curve so a different sample of the same
    * SIZE cannot silently reuse it (advisor, round 7 — the (k, count)
    * check fenced index content but not sample identity). The collect
    * is bounded by the sample size — the caller's own tuning sample,
    * small by design (it already paid a count() here before).
    */
  def ivfSampleTag(ids: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(ids.sorted.mkString(",").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Read a persisted curve: (k, queries, cumulative hits). None when
    * absent OR when the index content changed since the measurement
    * (state-tag mismatch — see [[ivfStateTag]]).
    */
  def ivfReadRecall(indexDir: String): Option[(Int, Long, Seq[Long])] =
    ivfReadRecallFull(indexDir).map { case (k, q, h, _) => (k, q, h) }

  /** [[ivfReadRecall]] plus the persisted sample tag (empty when the
    * record predates the tag).
    */
  def ivfReadRecallFull(
      indexDir: String): Option[(Int, Long, Seq[Long], String)] = {
    val p = java.nio.file.Paths.get(indexDir, "recall.json")
    if (!java.nio.file.Files.exists(p)) None
    else {
      val json = java.nio.file.Files.readString(p)
      val state = "\"state\":\"([0-9a-f]+)\"".r.findFirstMatchIn(json)
        .map(_.group(1))
      if (!state.contains(ivfStateTag(indexDir))) None
      else {
        def num(name: String): Long =
          ("\"" + name + "\":(\\d+)").r.findFirstMatchIn(json)
            .map(_.group(1).toLong)
            .getOrElse(sys.error(s"bad recall.json: no $name"))
        val sample = "\"sample\":\"([0-9a-f]*)\"".r.findFirstMatchIn(json)
          .map(_.group(1)).getOrElse("")
        val hits = "\\[([^\\]]*)\\]".r.findFirstMatchIn(json)
          .map(_.group(1)).filter(_.nonEmpty)
          .map(_.split(",").map(_.trim.toLong).toSeq).getOrElse(Nil)
        Some((num("k").toInt, num("queries"), hits, sample))
      }
    }
  }

  /** Recall-targeted batch serving: measure the curve on `sample`
    * (persisting it beside the index), pick the smallest nprobe
    * meeting `targetX1M` recall@`k`, serve the batch at that nprobe —
    * the full tune-then-serve loop a deployment runs, as one call. A
    * curve already persisted WITH THE SAME k and query count is
    * reused (the query-only fast path). Output adds the chosen
    * `nprobe` as a column so the decision itself is part of the
    * verifiable result.
    */
  def ivfQueryBatchAtRecall(
      spark: org.apache.spark.sql.SparkSession, index: IvfIndex,
      sample: DataFrame, queries: DataFrame, qidCol: String,
      qvecCol: String, k: Int, targetX1M: Long): DataFrame = {
    // distinct ids collected ONCE (bounded by the sample size —
    // replaces the former count() action): the count feeds the reuse
    // check, the sorted-id hash fences sample IDENTITY (advisor,
    // round 7 — a different sample of the same size must not silently
    // tune from a stale curve)
    val sampleIds = sample.select(col(qidCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val sampleN = sampleIds.length.toLong
    val sampleTag = ivfSampleTag(sampleIds)
    val (hits, nq) = ivfReadRecallFull(index.root) match {
      case Some((pk, pq, ph, ptag))
          if pk == k && pq == sampleN && ptag == sampleTag => (ph, pq)
      case _ =>
        val (h, n) = ivfRecallHits(spark, index, sample, qidCol, qvecCol, k)
        ivfWriteRecall(index.root, k, n, h, sampleTag)
        (h, n)
    }
    val np = ivfNprobeForRecall(hits, nq, k, targetX1M)
    ivfQueryBatch(spark, index, queries, qidCol, qvecCol, k, np)
      .withColumn("nprobe", lit(np).cast("int"))
  }

  /** Query a materialized index with an explicit query vector: probe
    * cells are ranked DRIVER-SIDE against the persisted centroids
    * (≤ C dot products — no corpus scan, no join), and the candidate
    * read partition-prunes to exactly the `nprobe` probed cells
    * (PartitionFilters on `cell` — PlanSpec-asserted): with C cells
    * the query touches ~nprobe/C of the corpus, and the plan is
    * scan → project(cosine) → TakeOrderedAndProject, join-free.
    */
  def ivfQuery(
      spark: org.apache.spark.sql.SparkSession, index: IvfIndex,
      queryVec: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    // descending dot, ties → lowest cell: the exact order the round-5
    // in-plan array_sort over struct(-d, cell) produced (primitive ==
    // treats -0.0/0.0 as the same tie both here and in SQL ordering)
    val probes = index.centroids.zipWithIndex
      .map { case (c, i) => (dotScala(queryVec, c), i) }
      .sortWith((a, b) => if (a._1 != b._1) a._1 > b._1 else a._2 < b._2)
      .take(nprobe).map(_._2)
    val candidates = readCells(spark, index)
      .filter(col("cell").isin(probes.map(Int.box): _*))
    val qv = typedlit(queryVec)
    val top = candidates
      .select(col(index.idCol),
        round(cosine(col(index.vecCol), qv), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(index.idCol).asc).limit(k)
    withRank(top, index.idCol)
  }

  /** [[ivfQuery]] over the SQ8-quantized codes with exact re-rank —
    * the 100-TB bytes story: the candidate-SCORING pass reads 1 byte
    * per dimension plus one precomputed norm instead of the 4-byte
    * float vector (cosine needs no scale — it cancels against the
    * code norm), so the pass that touches every candidate moves ~4×
    * fewer bytes (spec-asserted: its scan's ReadSchema carries
    * `code8`/`cnorm8` and NOT the embedding column). The top
    * `k·rerank` approximate candidates (asymmetric [[graft.exprs
    * .Int8Dot]] — full-precision query against quantized codes, a
    * tight codegen'd byte loop) are then re-ranked by EXACT cosine in
    * a second pass that reads full vectors for ONLY those rows (an
    * id-pushed filter over the same pruned cells; the collect is
    * bounded by k·rerank, never corpus-sized). Requires
    * `ivfBuild(quantize = true)`; output shape matches [[ivfQuery]].
    */
  def ivfQuerySQ(
      spark: org.apache.spark.sql.SparkSession, index: IvfIndex,
      queryVec: Seq[Double], k: Int, nprobe: Int,
      rerank: Int = 4): DataFrame = {
    require(index.quantized,
      "ivfQuerySQ needs an index built with quantize = true")
    val qnorm = math.sqrt(dotScala(queryVec, queryVec))
    require(qnorm > 0, "zero query vector")
    val probes = index.centroids.zipWithIndex
      .map { case (c, i) => (dotScala(queryVec, c), i) }
      .sortWith((a, b) => if (a._1 != b._1) a._1 > b._1 else a._2 < b._2)
      .take(nprobe).map(_._2)
    val pruned = readCells(spark, index)
      .filter(col("cell").isin(probes.map(Int.box): _*))
    val qlit = typedlit(queryVec)
    val approx = sq8ApproxPass(pruned, index, qlit, qnorm)
    val ids = approx
      .orderBy(col("approx_sim").desc, col(index.idCol).asc)
      .limit(k * rerank)
      .select(col(index.idCol)).collect().map(_.getLong(0)).toSeq
    val exact = pruned
      .filter(col(index.idCol).isin(ids.map(Long.box): _*))
      .select(col(index.idCol),
        round(cosine(col(index.vecCol), qlit), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(index.idCol).asc).limit(k)
    withRank(exact, index.idCol)
  }

  /** Batch quantized serving: [[ivfQuerySQ]]'s two-pass shape for a
    * whole query DataFrame in ONE plan, with NO query-sized collect —
    * the only driver-side set is the probed-cell union (bounded by C,
    * as in [[ivfQueryBatch]]). Pass 1 joins the pruned code columns to
    * the per-query probe rows ON cell and ranks the asymmetric int8
    * scores under a window PARTITIONED by query id; the top k·rerank
    * per query form the shortlist — a Q·k·rerank-row frame that stays
    * distributed. Pass 2 joins the shortlist back to the pruned cells
    * on the id column (Spark broadcasts the small shortlist side) and
    * to the query vectors on query id, re-ranking by exact cosine.
    * Per query, the result is bit-identical to [[ivfQuerySQ]] (the
    * plan-side query-norm fold performs the same IEEE sequence as the
    * driver-side [[dotScala]]); spec-asserted.
    */
  def ivfQuerySQBatch(
      spark: org.apache.spark.sql.SparkSession, index: IvfIndex,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nprobe: Int, rerank: Int = 4): DataFrame = {
    require(index.quantized,
      "ivfQuerySQBatch needs an index built with quantize = true")
    val mat = typedlit(index.centroids)
    val nc = index.centroids.length
    // probe cells + query norm, both projected BEFORE the explode (the
    // interpreted-HOF pitfall — one fold each, not one per probe row)
    val probed = queries
      .select(col(qidCol).as("query_id"), col(qvecCol).as("_qvec"),
        transform(mat, c =>
          call_function("vec_dot", col(qvecCol), c)).as("_dots"),
        sqrt(call_function("vec_dot", col(qvecCol), col(qvecCol)))
          .as("_qnorm"))
      .select(col("query_id"), col("_qvec"), col("_qnorm"),
        explode(transform(
          slice(array_sort(zip_with(
            col("_dots"), sequence(lit(0), lit(nc - 1)),
            (d, i) => struct((-d).as("nd"), i.as("cell")))), 1, nprobe),
          p => p("cell").cast("int"))).as("cell"))
    val cellSet = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val pruned = readCells(spark, index)
      .filter(col("cell").isin(cellSet.map(Int.box): _*))
    val approx = pruned
      .select(col(index.idCol), col("code8"), col("cnorm8"), col("cell"))
      .join(probed, Seq("cell"))
      .select(col("query_id"), col(index.idCol),
        when(col("cnorm8") > 0 && col("_qnorm") > 0,
          call_function("int8_dot", col("code8"), col("_qvec")) /
            (col("_qnorm") * col("cnorm8")))
          .otherwise(lit(0.0)).as("approx_sim"))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx_sim").desc, col(index.idCol).asc)
    val shortlist = approx
      .withColumn("arank", row_number().over(w1))
      .filter(col("arank") <= k * rerank)
      .select(col("query_id"), col(index.idCol))
    val exact = shortlist
      .join(pruned.select(col(index.idCol), col(index.vecCol)),
        Seq(index.idCol))
      .join(queries.select(col(qidCol).as("query_id"),
        col(qvecCol).as("_qvec2")), Seq("query_id"))
      .select(col("query_id"), col(index.idCol),
        round(cosine(col(index.vecCol), col("_qvec2")), 6).as("cos_sim"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col(index.idCol).asc)
    exact
      .withColumn("rank", row_number().over(w2).cast("int"))
      .filter(col("rank") <= k)
  }

  /** The quantized scoring projection of [[ivfQuerySQ]], factored so
    * its plan is assertable: the ONLY data columns it references are
    * `code8` and `cnorm8` — the scan's ReadSchema must not contain
    * the embedding column (the 4×-fewer-bytes claim, spec-asserted).
    */
  private[graft] def sq8ApproxPass(
      pruned: DataFrame, index: IvfIndex, qlit: Column,
      qnorm: Double): DataFrame =
    pruned.select(col(index.idCol),
      when(col("cnorm8") > 0,
        call_function("int8_dot", col("code8"), qlit) /
          (lit(qnorm) * col("cnorm8")))
        .otherwise(lit(0.0)).as("approx_sim"))

  /** Batch ANN over a materialized index: ONE plan answers MANY
    * queries — the serving shape when queries arrive in batches
    * rather than one at a time. Per query row, probe cells are
    * computed PLAN-SIDE against the same literal centroid matrix the
    * build used (top-`nprobe` by descending raw dot, cell-index
    * tie-break — the exact [[ivfQuery]] ranking, expressed as
    * array_sort over struct(-d, cell), where SQL comparison treats
    * -0.0 and 0.0 as the same tie the driver-side primitive `==`
    * does). The index scan still partition-prunes: the union of
    * probed cells is collected first (bounded by the number of
    * centroids C — never query- or corpus-sized) and becomes an
    * `isin` on the partition column, so only probed partitions are
    * read even when the query batch is a DataFrame. Candidates then
    * join queries ON cell — each vector lives in exactly one cell, so
    * no per-query dedup is needed — and top-k ranks per query under a
    * window PARTITIONED BY query id: hash-distributed across
    * executors, never the single-partition global sort the suite
    * forbids. Output: (query_id, idCol, cos_sim, rank).
    *
    * Scale: the query side carries Q×nprobe rows (id, vector, cell) —
    * tiny next to the probed corpus slice, so Spark broadcasts it;
    * past the broadcast threshold the join degrades to a shuffle hash
    * on cell, where AQE's skew split handles hot cells (and
    * [[ivfCellStats]] + `refineIters` exist to keep cells balanced).
    */
  def ivfQueryBatch(
      spark: org.apache.spark.sql.SparkSession, index: IvfIndex,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val mat = typedlit(index.centroids)
    val nc = index.centroids.length
    val probed = queries
      .select(col(qidCol).as("query_id"), col(qvecCol).as("_qvec"),
        // dots projected FIRST (interpreted-HOF pitfall: a computed
        // subtree referenced inside a later lambda re-evaluates per
        // element)
        transform(mat, c =>
          call_function("vec_dot", col(qvecCol), c)).as("_dots"))
      .select(col("query_id"), col("_qvec"),
        explode(transform(
          slice(array_sort(zip_with(
            col("_dots"), sequence(lit(0), lit(nc - 1)),
            (d, i) => struct((-d).as("nd"), i.as("cell")))), 1, nprobe),
          p => p("cell").cast("int"))).as("cell"))
    // bounded collect: ≤ C distinct cells across the whole batch — the
    // prune set for PartitionFilters, independent of Q and corpus size
    val cellSet = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val candidates = readCells(spark, index)
      .filter(col("cell").isin(cellSet.map(Int.box): _*))
    val scored = candidates.join(probed, Seq("cell"))
      .select(col("query_id"), col(index.idCol),
        round(cosine(col(index.vecCol), col("_qvec")), 6).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col(index.idCol).asc)
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** [[ivfQuery]] with the query vector fetched by id from the index
    * itself — a pushed-filter, column-pruned lookup (row-group stats
    * prune on id; a production deployment would front this with a
    * key-value lookup).
    */
  def ivfQueryById(
      spark: org.apache.spark.sql.SparkSession, index: IvfIndex,
      queryId: Long, k: Int, nprobe: Int): DataFrame = {
    val qv = readCells(spark, index)
      .filter(col(index.idCol) === queryId)
      .select(col(index.vecCol)).head()
      .getSeq[Float](0).map(_.toDouble).toSeq
    ivfQuery(spark, index, qv, k, nprobe)
  }

  /** One-shot IVF top-k: [[ivfBuild]] into `indexDir` (a fresh temp
    * dir when omitted) then [[ivfQuery]] — kept as the single-call
    * convenience the q35 oracle exercises. The lattice (sampled
    * centroids, argmax-raw-dot assignment, descending-dot probe
    * ranking, exact-cosine re-rank, id tie-breaks) is unchanged from
    * the round-5 in-plan form, so the oracle is unchanged — but the
    * assignment now happens exactly once, materialized, and the
    * query's scan reads ONLY the probed cell partitions.
    */
  def ivfTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, centroidEvery: Long = 64,
      maxCentroids: Int = 64, nprobe: Int = 4,
      indexDir: Option[String] = None): DataFrame = {
    val spark = embeddings.sparkSession
    val dir = indexDir.getOrElse(tempIndexDir())
    val index = ivfBuild(embeddings, idCol, vecCol, dir,
      centroidEvery, maxCentroids)
    // the query vector comes from the source frame (pushed filter on
    // id, column-pruned) — not another corpus pass
    val qv = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0).map(_.toDouble).toSeq
    ivfQuery(spark, index, qv, k, nprobe)
  }

  /** Temp index dirs created by [[ivfTopK]]'s indexDir-less path, all
    * swept by ONE JVM shutdown hook — without it every invocation
    * leaked a corpus-sized parquet tree (advisor, round 6). Callers
    * that need the index to outlive the session pass an explicit
    * indexDir.
    */
  private val tmpIndexDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val tmpCleanupHook: Unit = {
    sys.addShutdownHook {
      tmpIndexDirs.forEach(p => deleteRecursively(p.toString))
    }
    ()
  }
  private def tempIndexDir(): String = {
    tmpCleanupHook
    val d = java.nio.file.Files.createTempDirectory("graft_ivf")
    tmpIndexDirs.add(d)
    d.toString
  }

  /** Best-effort recursive delete (shared by temp-index cleanup and
    * [[graft.pipeline.StreamingIndex.vacuum]]).
    */
  private[graft] def deleteRecursively(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.isDirectory(root)) {
      import scala.jdk.CollectionConverters._
      val all = java.nio.file.Files.walk(root)
      try all.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally all.close()
    }
  }

  /** Batch embedding near-dup pairs, LSH-bucketed — the scale shape
    * for corpus-wide near-dup removal. Candidate pairs collide on the
    * hyperplane bucket (exact or 1-bit-flip probe: hamming ≤ 1), then
    * exact cosine verifies ≥ `threshold`. Shuffle discipline mirrors
    * [[DedupOps.minhashLshPairs]]: only (id, signature) rides the
    * candidate join; vectors are re-joined once, per DISTINCT pair,
    * for verification. Never all-pairs — the round-2 q27
    * BroadcastNestedLoopJoin baseline is retired (O(n²) cosine at
    * 100×); recall is governed by (bits, probe radius), identically in
    * the DuckDB oracle.
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame, idCol: String, vecCol: String,
      bits: Int = 8, dims: Int = 64, threshold: Double = 0.9,
      neutral: Boolean = false, maxBucket: Int = 1000): DataFrame = {
    val allSigs = embeddings.select(col(idCol).as("id"),
      hyperplaneSignature(col(vecCol), bits, dims, neutral).as("sig"))
    // Degenerate-bucket guard (round 4, mirrors
    // DedupOps.minhashLshPairs): a home bucket with B members yields
    // O(B²) candidate pairs inside one join key — the skew bomb AQE
    // can split but not bound. Vectors whose HOME bucket exceeds
    // `maxBucket` are excluded from BOTH join sides (their members are
    // exact-dup-pass work — identical embeddings hash identically);
    // the count filter runs BEFORE any collect, so a bomb bucket's ids
    // are never materialized. Report victims: [[oversizedSigBuckets]].
    val smallSigs = allSigs.groupBy(col("sig"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucket)
      .select(col("sig"))
    // Bucket-level candidate generation (round 4): collapse to ONE ROW
    // PER DISTINCT SIGNATURE carrying its (guard-bounded) id set, then
    //  - hamming-0 pairs in place within each bucket;
    //  - hamming-1 pairs via a join of each bucket against its 1-bit
    //    flips — a join over DISTINCT signatures, not over rows. The
    //    round-3 shape shuffled (1+bits)×n probe ROWS through the
    //    self-join; this shuffles one row per occupied bucket.
    val buckets = allSigs.join(smallSigs, Seq("sig"))
      .groupBy(col("sig"))
      .agg(array_sort(collect_set(col("id"))).as("ids"))
    // round 5: both pair generators are ROW-BOUNDED (sub-bucket
    // splitting, DedupOps.boundedSelf/CrossPairs) — a pair of
    // cap-sized buckets would otherwise cross up to maxBucket²
    // structs in one row
    val within = DedupOps.boundedSelfPairs(
      buckets.filter(size(col("ids")) >= 2), "ids")
    // sig < nsig keeps each unordered bucket pair exactly once (the
    // 1-bit-flip relation is symmetric)
    val flips = buckets
      .select(col("sig"), col("ids").as("ids_a"),
        explode(transform(sequence(lit(0), lit(bits - 1)),
          i => col("sig").bitwiseXOR(
            call_function("shiftleft", lit(1L), i)))).as("nsig"))
      .filter(col("sig") < col("nsig"))
    val cross = DedupOps.boundedCrossPairs(
      flips.join(
        buckets.select(col("sig").as("nsig"), col("ids").as("ids_b")),
        Seq("nsig")),
      "ids_a", "ids_b")
    val pairs = within.unionByName(cross).distinct()
    val vecs = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
    pairs
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("vec_a"), col("vec_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** The signature buckets [[embeddingNearDupPairs]] DROPPED under its
    * `maxBucket` guard — (sig, bucket_n) per oversized home bucket.
    * The no-silent-caps report for pipelines applying the guard.
    */
  def oversizedSigBuckets(
      embeddings: DataFrame, idCol: String, vecCol: String,
      bits: Int = 8, dims: Int = 64, neutral: Boolean = false,
      maxBucket: Int = 1000): DataFrame =
    embeddings
      .select(hyperplaneSignature(col(vecCol), bits, dims, neutral).as("sig"))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
}
