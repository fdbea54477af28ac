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
    *
    * Built with zip_with over three shifted slices rather than
    * `transform(sequence(...), i => element_at(tokens, i+...))`:
    * higher-order functions evaluate interpreted, so a COMPUTED
    * subtree referenced inside a lambda is re-evaluated per element —
    * the element_at form re-ran `split` three times per window,
    * O(tokens²) chars per row. zip_with evaluates each slice once.
    */
  def tokenShingles(text: Column): Column = {
    val toks = split(text, " ")
    val w = size(toks) - 2 // window count when >= 3 tokens
    val shingled = zip_with(
      slice(toks, lit(1), w),
      zip_with(slice(toks, lit(2), w), slice(toks, lit(3), w),
        (b, c) => concat(b, lit(" "), c)),
      (a, bc) => concat(a, lit(" "), bc))
    array_distinct(when(size(toks) >= 3, shingled)
      .otherwise(array(concat_ws(" ", toks))))
  }

  /** Engine-neutral 64-bit hash (md5-derived): Spark and DuckDB compute
    * identical values, so minhash pipelines built on it are
    * oracle-checkable end-to-end. 15 hex chars = 60 bits — always
    * non-negative, never overflows LONG. DuckDB twin:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. Since round 8
    * the engine side is the native [[graft.exprs.Md5Hash64]] (same
    * digest, value computed from the bytes instead of a hex-string
    * render + base conversion + re-parse per call — this ran once per
    * SHINGLE in q24/q33/q39 and once per TOKEN in q25).
    */
  def md5Hash64(c: Column): Column = call_function("md5_hash64", c)

  /** Driver-side twin of [[md5Hash64]] (identical value for the same
    * input string) — used to precompute per-seed mixing constants once
    * at plan-build time instead of per row.
    */
  def md5Hash64Scala(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map("%02x".format(_)).mkString.take(15), 16)
  }

  // (the per-seed rotate+xor mixer formerly spelled here as Column
  // arithmetic now lives natively in graft.exprs.MinhashMix — same
  // bijection on [0, 2^60), same DuckDB-reproducible formula)

  /** MinHash signature as an array<long> of k per-seed minima over
    * 3-token shingles — computed per-row with HOFs (zero shuffle).
    * Each shingle is hashed ONCE; the k per-seed values derive from
    * that hash by cheap mixing (`neutral`: rotate+xor with md5-derived
    * constants, DuckDB-reproducible; default: xxhash64 over the 8-byte
    * hash — fixed-width re-hash instead of k string hashes).
    * Requires k <= 60 (rotation distance must stay inside the 60-bit
    * neutral hash space).
    *
    * Shaped as ONE `aggregate` over the hash array folding an
    * array-of-k minima accumulator — NOT `transform(seq(k), seed =>
    * array_min(...))`: HOFs are interpreted, so the per-seed form
    * re-evaluated the entire shingle+hash subtree k times per row
    * (round 2's q24 spent 19% of the whole bench there). Here the
    * shingle/hash pipeline runs once per row; the fold body is pure
    * arithmetic on lambda variables and literals.
    */
  def minhashSignature(text: Column, k: Int, neutral: Boolean = false): Column = {
    require(k <= 60, s"minhash k=$k exceeds the 60-bit mixing space")
    val hashes = transform(tokenShingles(text), t =>
      if (neutral) md5Hash64(t) else xxhash64(t))
    // the k-minima fold as the native [[graft.exprs.MinhashMix]]
    // expression (round 8): the HOF fold paid k interpreted lambda
    // evaluations (each several expression nodes) per SHINGLE; the
    // native loop replicates the same mixers — rot+xor constants in
    // neutral mode, the exact XXH64 chain otherwise — and the same
    // least/NULL/empty semantics, so signatures are bit-identical
    // (DedupOpsSpec + the q24/q33/q39 oracles).
    val seedConsts =
      if (neutral) typedlit((0 until k).map(s => md5Hash64Scala(s"seed:$s")))
      else lit(null).cast("array<long>")
    call_function("minhash_mix", hashes, lit(k), seedConsts)
  }

  /** All ordered pairs (id_a < id_b) within one SORTED id array, as
    * array<struct<id_a, id_b>> — in-place candidate generation for ONE
    * row. ROW-SIZE ENVELOPE: n ids materialize n·(n-1)/2 structs in
    * this single row's buffer, so callers must bound n — the pipeline
    * operators go through [[boundedSelfPairs]], which sub-splits
    * guard-sized buckets to keep every row under subSize²/2 structs
    * (round-4 verdict: a maxBucket=1000 bucket built ~499,500 structs
    * in one aggregation row).
    */
  def pairsWithin(sortedIds: Column): Column =
    flatten(zip_with(sortedIds,
      sequence(lit(1), greatest(size(sortedIds), lit(1))),
      (x, i) => transform(
        slice(sortedIds, i + 1, greatest(size(sortedIds) - i, lit(0))),
        y => struct(x.as("id_a"), y.as("id_b")))))

  /** Default sub-bucket width for row-bounded pair generation: a
    * sub-bucket pair row holds at most 64² = 4,096 pair structs
    * (vs ~500k for a cap-sized bucket in one row) — small enough for
    * any task row buffer, large enough that a cap-sized bucket only
    * explodes into ceil(1000/64)² ≈ 136 rows.
    */
  val PairSubBucket = 64

  /** All (x, y) cross pairs of two id slices; `ordered = true` when
    * every element of `as` precedes every element of `bs` (adjacent
    * slices of one sorted array), else least/greatest orders each pair.
    * Inputs must be plain attributes (interpreted HOFs re-evaluate
    * computed subtrees per element).
    */
  private def crossPairs(as: Column, bs: Column, ordered: Boolean): Column =
    flatten(transform(as, x => transform(bs, y =>
      if (ordered) struct(x.as("id_a"), y.as("id_b"))
      else struct(least(x, y).as("id_a"), greatest(x, y).as("id_b")))))

  /** Pre-explode shape of [[boundedSelfPairs]]: one row per
    * (sub-bucket i ≤ sub-bucket j) with that cell's pair array —
    * exposed package-private so the row-size envelope is testable
    * (max array size ≤ subSize² by construction).
    */
  private[graft] def boundedSelfPairSlices(
      buckets: DataFrame, idsCol: String, subSize: Int): DataFrame = {
    require(subSize >= 2)
    val m = greatest(ceil(size(col(idsCol)) / lit(subSize)), lit(1))
      .cast("int")
    buckets
      .select(col(idsCol).as("ids"), m.as("m"))
      .select(col("ids"),
        explode(flatten(transform(sequence(lit(0), col("m") - 1), i =>
          transform(sequence(i, col("m") - 1), j =>
            struct(i.as("i"), j.as("j")))))).as("ij"))
      .select(
        slice(col("ids"), col("ij.i") * subSize + 1, lit(subSize)).as("a"),
        slice(col("ids"), col("ij.j") * subSize + 1, lit(subSize)).as("b"),
        (col("ij.i") === col("ij.j")).as("same"))
      .select(when(col("same"), pairsWithin(col("a")))
        // adjacent slices of one SORTED array: all of a < all of b
        .otherwise(crossPairs(col("a"), col("b"), ordered = true))
        .as("pairs"))
  }

  /** Row-bounded in-bucket pair generation (round-5 fix for the
    * single-row pair bomb): `buckets` holds one SORTED id array per
    * bucket (the guard has bounded its length ≤ maxBucket); instead of
    * materializing all ~maxBucket²/2 pair structs in ONE row, the
    * array is viewed as ceil(n/subSize) sub-slices and each
    * (slice i ≤ slice j) cell becomes its own row — within-slice pairs
    * via [[pairsWithin]], cross-slice pairs via an ordered cross — so
    * no row ever holds more than subSize² structs. The pair SET is
    * identical to `explode(pairsWithin(ids))`
    * (DedupOpsSpec cross-checks). Returns (id_a, id_b).
    */
  def boundedSelfPairs(
      buckets: DataFrame, idsCol: String,
      subSize: Int = PairSubBucket): DataFrame =
    boundedSelfPairSlices(buckets, idsCol, subSize)
      .select(explode(col("pairs")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))

  /** Pre-explode shape of [[boundedCrossPairs]] — see
    * [[boundedSelfPairSlices]]. */
  private[graft] def boundedCrossPairSlices(
      df: DataFrame, aCol: String, bCol: String, subSize: Int): DataFrame = {
    require(subSize >= 2)
    def m(c: String) =
      greatest(ceil(size(col(c)) / lit(subSize)), lit(1)).cast("int")
    df
      .select(col(aCol).as("as_"), col(bCol).as("bs_"),
        m(aCol).as("ma"), m(bCol).as("mb"))
      .select(col("as_"), col("bs_"),
        explode(flatten(transform(sequence(lit(0), col("ma") - 1), i =>
          transform(sequence(lit(0), col("mb") - 1), j =>
            struct(i.as("i"), j.as("j")))))).as("ij"))
      .select(
        slice(col("as_"), col("ij.i") * subSize + 1, lit(subSize)).as("a"),
        slice(col("bs_"), col("ij.j") * subSize + 1, lit(subSize)).as("b"))
      // arrays from two DIFFERENT buckets: no global order between
      // them, least/greatest orders each pair
      .select(crossPairs(col("a"), col("b"), ordered = false).as("pairs"))
  }

  /** Row-bounded cross-bucket pair generation: `df` carries two
    * DISJOINT sorted id arrays per row (two buckets related by e.g. a
    * 1-bit signature flip, each ≤ maxBucket long — up to maxBucket²
    * structs if crossed in one row); each (slice_a i, slice_b j) cell
    * becomes its own row of ≤ subSize² pair structs, ordered
    * id_a < id_b via least/greatest. Returns (id_a, id_b).
    */
  def boundedCrossPairs(
      df: DataFrame, aCol: String, bCol: String,
      subSize: Int = PairSubBucket): DataFrame =
    boundedCrossPairSlices(df, aCol, bCol, subSize)
      .select(explode(col("pairs")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))

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
    *
    * Degenerate-bucket guard (round 4): a band bucket holding B
    * members yields O(B²) candidate pairs INSIDE one join key — a
    * 100 TB web corpus contains exactly such regions (thousands of
    * empty/boilerplate-identical documents), and AQE's skew split
    * mitigates but cannot bound the quadratic pair count. Buckets with
    * more than `maxBucket` members are excluded from candidate
    * generation. This is a CAP, not silent truncation: report the
    * victims with [[minhashOversizedBuckets]] (same parameters → same
    * buckets). Discipline: run exact dedup (q18) FIRST — identical
    * documents are the dominant bucket-bomb source and belong to the
    * exact pass anyway.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, thresholdX1M: Long = 600000L,
      neutral: Boolean = false, maxBucket: Int = 1000): DataFrame = {
    // two-step select: aliasing and referencing in one projection would
    // trip Spark's lateral-column-alias resolution on same-named columns
    val withSig = df.select(col(idCol).as("id"), col(textCol).as("text"),
      minhashSignature(col(textCol), k, neutral).as("sig"))
    val allBands = withSig.select(col("id"),
      explode(lshBands(col("sig"), k, bands, neutral)).as("bb"))
    // Guard + in-bucket pair generation (round 4): the count
    // aggregation filters oversized buckets FIRST (so no collect ever
    // materializes a bomb bucket's ids), then each surviving bucket
    // collects its ≤ maxBucket ids and emits its pairs IN PLACE — one
    // groupBy replaces the round-3 two-sided self-join, removing a
    // full (id, bucket) shuffle: the collect groupBy sits on the join
    // output already partitioned by the bucket key. Pairs are
    // distinct'd BEFORE the (expensive) Jaccard verify: on
    // vocabulary-uniform corpora many bands collide for the same pair.
    val smallBuckets = allBands.groupBy(col("bb"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucket))
      .select(col("bb"))
    // sort INSIDE the agg projection: the pair HOFs reference their
    // input inside lambdas, and interpreted HOFs re-evaluate computed
    // subtrees per element — the input must be a plain attribute.
    // boundedSelfPairs (round 5) keeps every generated row under
    // subSize² structs instead of one ~maxBucket²/2-struct row.
    val pairs = boundedSelfPairs(
      allBands.join(smallBuckets, Seq("bb"))
        .groupBy(col("bb"))
        .agg(array_sort(collect_set(col("id"))).as("ids")),
      "ids")
      .distinct()
    val texts = withSig.select(col("id"), col("text"))
    pairs
      .join(texts.select(col("id").as("id_a"), col("text").as("text_a")), Seq("id_a"))
      .join(texts.select(col("id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TextOps.ngramJaccardX1M(col("text_a"), col("text_b"), 3).as("jaccard_x1m"))
      .filter(col("jaccard_x1m") >= thresholdX1M)
  }

  /** The band buckets [[minhashLshPairs]] DROPPED under its
    * `maxBucket` guard — (band, bucket, bucket_n) per oversized
    * bucket. The no-silent-caps report: a pipeline applying the guard
    * should count/log these (their members are exact-dup-pass work,
    * not LSH work).
    */
  def minhashOversizedBuckets(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, neutral: Boolean = false,
      maxBucket: Int = 1000): DataFrame = {
    val withSig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), k, neutral).as("sig"))
    withSig.select(explode(lshBands(col("sig"), k, bands, neutral)).as("bb"))
      .groupBy(col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
  }

  /** Connected components over an undirected pair graph — the last
    * step of the near-dup story: [[minhashLshPairs]] /
    * [[graft.ops.SimilarityOps.embeddingNearDupPairs]] emit PAIRS, and
    * choosing one keeper per duplicate GROUP needs the transitive
    * closure. Returns (id, cluster) for every vertex, where `cluster`
    * is the component's minimum id — the canonical keeper.
    *
    * Algorithm: min-label propagation WITH POINTER JUMPING — each
    * round every vertex adopts the minimum label among itself and its
    * neighbours, then follows its label to THAT vertex's label
    * (path-halving, the classic PRAM/MapReduce trick — same family as
    * Kiveris et al. 2014's star operations). Neighbour propagation
    * alone needs O(diameter) rounds (a 10^6-vertex chain would never
    * finish); the jump makes label paths halve each round, so
    * convergence is O(log n) rounds on ANY graph shape. Each round is
    * two joins + one groupBy on the vertex key (shuffles on
    * high-cardinality ids, AQE-coalesced); a per-round checkpoint
    * cuts the otherwise O(rounds)-deep lineage, and the driver loop
    * submits O(log n) jobs — never O(rows) work.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    // Durability (round 5): with `checkpointDir` set, each round's
    // state is materialized as a parquet table under the dir and read
    // back — a reliable checkpoint on the shared filesystem (the
    // 100-TB posture, where one lost executor must not invalidate many
    // rounds of truncated-lineage state the way executor-local
    // localCheckpoint blocks would) WITHOUT touching the
    // context-global `setCheckpointDir` (which would silently redirect
    // every other checkpoint user in the session — reviewer finding).
    // Superseded rounds are deleted as the loop advances, so the dir
    // holds O(1) tables: the edges, the current labels, and on return
    // the FINAL labels (a durable artifact callers may reuse or
    // delete). Default stays localCheckpoint (fastest; fine for local
    // mode / short jobs). Point each run at its OWN dir: the round
    // tables use fixed names (edges, labels-N), so two concurrent runs
    // sharing a dir would overwrite each other's state.
    val spark = pairs.sparkSession
    val hadoopFs = checkpointDir.map { dir =>
      new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
    }
    def save(df: DataFrame, name: String): DataFrame = checkpointDir match {
      case Some(dir) =>
        val p = s"$dir/$name"
        df.write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      case None => df.localCheckpoint()
    }
    def drop(name: String): Unit = checkpointDir.foreach { dir =>
      hadoopFs.foreach(_.delete(new org.apache.hadoop.fs.Path(s"$dir/$name"), true))
    }
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val und = save(edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct(), "edges")
    // Initial labels carry the FIRST propagation step (round 8): label
    // = min(self, neighbours) from the same groupBy that previously
    // just enumerated vertices — every vertex appears as src (und
    // holds both directions), so the vertex set is identical, and
    // min-label propagation converges to the component minimum from
    // ANY intermediate state of its own sequence, so the fixpoint (and
    // the zero-changed convergence test) is unchanged. Saves one full
    // two-join round per invocation (q30/q33/q36/q39 and every
    // dropNearDups call).
    var labels = save(und.groupBy(col("src"))
      .agg(min(col("dst")).as("_mn"))
      .select(col("src").as("id"),
        least(col("src"), col("_mn")).as("cluster")), "labels-0")
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // the propagation groupBy carries BOTH the neighbour-min and the
      // previous label (round 5): the self branch is tagged, so
      // prev = min(cluster) over self rows (exactly one per id) — the
      // convergence check needs no second join against prior labels
      val contrib = und
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("cluster"), lit(false).as("self"))
        .unionByName(labels.withColumn("self", lit(true)))
      val prop = contrib
        .groupBy(col("id"))
        .agg(min(col("cluster")).as("cluster"),
          min(when(col("self"), col("cluster"))).as("prev"))
      // pointer jump: cluster(v) ← cluster(cluster(v)). Every label
      // value is itself a vertex (it is some vertex's id), so the
      // self-join always resolves; coalesce guards the left join.
      // Convergence (round 6): the changed-count rides the checkpoint
      // materialization as an `observe` metric — labels only ever
      // decrease, so fixpoint ⇔ no (id, cluster) changed, and the
      // CollectMetrics node folds that count into the SAME job that
      // writes/materializes the round's labels. ONE action per round
      // (was two: materialize + a count scan of the checkpoint),
      // halving driver round-trips over the O(log n) loop.
      val obs = new org.apache.spark.sql.Observation(s"cc-changed-$i")
      val next = save(prop
        .join(prop.select(col("id").as("cluster"), col("cluster").as("parent")),
          Seq("cluster"), "left")
        .select(col("id"),
          coalesce(col("parent"), col("cluster")).as("cluster"),
          (coalesce(col("parent"), col("cluster")) =!= col("prev"))
            .as("changed"))
        .observe(obs, count(when(col("changed"), lit(1))).as("changed"))
        .select(col("id"), col("cluster")), s"labels-${i + 1}")
      val changed = obs.get("changed").asInstanceOf[Long]
      drop(s"labels-$i") // superseded round: keep the dir O(1)
      labels = next
      converged = changed == 0
      i += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** End of the dedup story: drop every non-keeper of each near-dup
    * group. Keeper = the component's minimum id (the label
    * [[connectedComponents]] assigns), so exactly one row per group
    * survives; rows in no pair are untouched. Compose as:
    * exact dedup (q18) → `minhashLshPairs` → `dropNearDups`.
    */
  def dropNearDups(
      df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      checkpointDir: Option[String] = None): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol,
      checkpointDir = checkpointDir)
      .filter(col("id") =!= col("cluster"))
      .select(col("id"))
    df.join(losers, df(idCol) === losers("id"), "left_anti")
  }

  /** 64-bit SimHash over whitespace tokens: per-bit ±1 votes folded with
    * HOFs, packed as the sign vector. Per-row, zero shuffle.
    * `neutral = true` swaps xxhash64 for the md5-derived hash (60
    * effective bits — the top 4 sign bits stay 0) so the signature is
    * DuckDB-reproducible; xxhash64 stays the engine default.
    */
  def simhash64(text: Column, neutral: Boolean = false): Column = {
    // hash per token ONCE (transform), then the vote/pack fold as the
    // native [[graft.exprs.SimhashPack]] expression (round 8): the HOF
    // form paid 64 interpreted lambda evaluations per TOKEN (measured
    // 4.4 s warm on q25's 5k docs); the native loop replicates its
    // semantics exactly — arithmetic shift votes, NULL hash ≡ 0L,
    // sign-packing — so signatures are bit-identical.
    val hashes = transform(split(text, " "), t =>
      if (neutral) md5Hash64(t) else xxhash64(t))
    call_function("simhash_pack", hashes)
  }

  /** Hamming distance between two simhash values (near-dup if small). */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Band decomposition of a 64-bit hash: the 64/bandBits contiguous
    * bandBits-bit slices as (band, bucket) structs — the shared
    * banding unit of [[MediaOps.imageNearDupPairs]] and the streaming
    * near-dup guard. Pigeonhole: two hashes within hamming distance
    * d < 64/bandBits share at least one identical band.
    */
  def hashBands64(h: Column, bandBits: Int): Column = {
    require(64 % bandBits == 0, "bandBits must divide 64")
    val mask = (1L << bandBits) - 1
    transform(sequence(lit(0), lit(64 / bandBits - 1)), b =>
      struct(b.as("band"),
        call_function("shiftright", h, b * lit(bandBits))
          .bitwiseAND(lit(mask)).as("bucket")))
  }
}
