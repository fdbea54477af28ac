package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent chunked commits + lineage manifest — the engine's
  * Iceberg-semantics stand-in (no Iceberg runtime jar exists in this
  * environment, SURVEY.md env facts; snapshots/commits are emulated
  * over Parquet + an atomic manifest convention we own).
  *
  * The input is deterministically split into `chunks` by
  * pmod(xxhash64(doc_id), chunks). Each chunk is extracted and written
  * to `out/data/chunk=<k>/`, then a manifest record is written via
  * tmp-file + atomic rename to `out/_manifest/chunk-<k>.json`. A killed
  * run resumes by skipping manifested chunks — the cache-hit
  * anti-join semantics of the reference's Redis memoization (reference
  * app/utils/ocr_engine.py:123-135; SURVEY.md J3) at commit granularity:
  * input LEFT ANTI JOIN committed ON chunk(doc_id).
  *
  * Each manifest line carries lineage: run id, source snapshot, chunk,
  * row/span/error counts, wall time (north rule: per-partition lineage
  * + metrics).
  */
object Commit {

  /** Per-chunk lineage record (north rule: source snapshot, partition
    * id, row counts, span-mismatch counters). `mismatchCount` is the
    * number of output docs whose span sequence differs from the
    * `expected` table passed to [[run]] — 0 when no expectation is
    * supplied (the production case; goldens exist in validation runs).
    */
  final case class ChunkManifest(
      runId: String,
      chunk: Int,
      sourceSnapshot: String,
      rowCount: Long,
      spanCount: Long,
      errorCount: Long,
      wallMillis: Long,
      mismatchCount: Long = 0L)

  final case class RunSummary(
      committed: Seq[ChunkManifest],
      skipped: Seq[Int])

  def manifestDir(outDir: String): Path = Paths.get(outDir, "_manifest")

  /** Files.list with the directory stream CLOSED (a bare
    * `Files.list(...).iterator()` leaks one fd per call until GC —
    * reviewer finding; a long-lived driver staging/polling in a loop
    * can crawl toward the fd ulimit).
    */
  private def listDir(dir: Path): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Files.walk, deepest-first, stream closed (see [[listDir]]). */
  private def walkDeepestFirst(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try s.iterator().asScala.toSeq.reverse finally s.close()
  }

  /** Chunks already committed (resume set). */
  def committedChunks(outDir: String): Map[Int, ChunkManifest] = {
    listDir(manifestDir(outDir))
      .filter(_.getFileName.toString.matches("chunk-\\d+\\.json"))
      .flatMap(p => parseManifest(Files.readString(p)))
      .map(m => m.chunk -> m)
      .toMap
  }

  /** Stage the input partitioned by the chunk key — the
    * Iceberg-partitioned-table stand-in. Without this, every chunk
    * iteration re-scans the FULL docs and media tables and filters by
    * a hash predicate that cannot push down (k full scans — a
    * quadratic read bill at 100 TB with hundreds of chunks). Staged,
    * each iteration partition-prunes to exactly its slice; media is
    * co-partitioned by the chunk of the doc(s) referencing it, so a
    * chunk's payload bytes are read once, by that chunk only — the
    * storage co-partitioning design the media join relies on at scale.
    * One blob referenced from two chunks is duplicated across their
    * partitions (storage for read-locality, same trade Iceberg makes).
    *
    * INCREMENTAL invalidation (round 5; was all-or-nothing): staging
    * reuse is decided PER CHUNK, behind a per-chunk atomic sentinel
    * recording that chunk's content fingerprint — an order-independent
    * sum of per-row hashes plus row count, over the chunk's doc rows
    * and over its referenced media keys (two column-pruned aggregate
    * passes, collected as ≤ `chunks` rows). Appending one document
    * restages exactly the chunk it hashes into; every other chunk's
    * directories are untouched — the reference's per-document cache
    * semantics (ocr_engine.py:123-135) at chunk grain, matching the
    * granularity the commit manifests already resume at. Writes go
    * through dynamic partition overwrite so only dirty partitions are
    * replaced; chunks that vanished from the input are deleted.
    * Crash-safe: a dirty chunk's sentinel is removed BEFORE its
    * directories are rewritten and re-written (tmp + atomic rename)
    * only after, so a run killed mid-staging leaves the chunk dirty,
    * never half-trusted. Payload IMMUTABILITY BY REF is assumed (the
    * object-store/Iceberg contract): the media fingerprint covers the
    * chunk's ref SET, not payload bytes — re-hashing 100 TB of bytes
    * per staging call would defeat the point.
    *
    * Unchanged-input FAST PATH: an atomic `_input_snapshot` records
    * the input file set the sentinels were written under; when it
    * matches, even the fingerprint scan is skipped — the common
    * resume case costs a file listing, not a pass over the corpus.
    */
  def stageByChunk(
      spark: SparkSession,
      docs: DataFrame,
      media: DataFrame,
      outDir: String,
      chunks: Int): (DataFrame, DataFrame) = {
    val stagedRoot = Paths.get(outDir, s"_staged", s"chunks=$chunks")
    val sentDir = stagedRoot.resolve("_chunk_sentinels")
    Files.createDirectories(sentDir)
    // pre-round-5 whole-input sentinel: its presence marks a layout
    // without per-chunk fingerprints — drop it and let every chunk
    // re-fingerprint (their dirs are rewritten on mismatch anyway)
    Files.deleteIfExists(stagedRoot.resolve("_staged_complete"))
    // FAST PATH: if the input FILE SET (docs + media) is byte-for-byte
    // the set the sentinels were written under, the per-chunk
    // fingerprints cannot have changed — skip the content-hash scan
    // entirely. The common resume case (nothing changed) then costs a
    // file listing, not a pass over the corpus; any file-set change
    // falls through to the authoritative per-chunk content
    // fingerprints below. (Parquet writers never rewrite a file in
    // place under the same name, so the file set is a sound
    // unchanged-detector; the content hashes remain the decider
    // whenever it misses.)
    val inputSnap = snapshotId(docs) + "|" + snapshotId(media)
    val snapFile = stagedRoot.resolve("_input_snapshot")
    // in-memory frames have no input files — their snapshot degenerates
    // to a schema hash, which two different datasets share; only
    // file-backed inputs may take the fast path
    val unchangedFastPath =
      docs.inputFiles.nonEmpty && media.inputFiles.nonEmpty &&
      Files.exists(snapFile) && Files.readString(snapFile) == inputSnap
    val chunkOf = pmod(xxhash64(col("doc_id")), lit(chunks))
    if (!unchangedFastPath)
      stageByChunkSlow(docs, media, stagedRoot, sentDir,
        chunkOf, inputSnap, snapFile)
    // explicit schemas: an empty staged table (no media in the corpus)
    // reads back as an empty frame instead of failing schema inference
    Files.createDirectories(stagedRoot.resolve("docs"))
    Files.createDirectories(stagedRoot.resolve("media"))
    val chunkField = org.apache.spark.sql.types.StructField(
      "chunk", org.apache.spark.sql.types.LongType)
    (spark.read.schema(org.apache.spark.sql.types.StructType(
        docs.schema.fields :+ chunkField))
        .parquet(s"$stagedRoot/docs"),
      spark.read.schema(org.apache.spark.sql.types.StructType(
        media.schema.fields :+ chunkField))
        .parquet(s"$stagedRoot/media"))
  }

  /** The invalidation/rewrite half of [[stageByChunk]], run only when
    * the input file set changed (or first staging): per-chunk content
    * fingerprints decide which chunk partitions to rewrite.
    */
  private def stageByChunkSlow(
      docs: DataFrame,
      media: DataFrame,
      stagedRoot: Path,
      sentDir: Path,
      chunkOf: org.apache.spark.sql.Column,
      inputSnap: String,
      snapFile: Path): Unit = {
    // per-chunk content fingerprints: docs rows + referenced media keys
    // bit_xor folds are order-independent and cannot overflow (ANSI
    // mode makes sum() throw). TWO xor folds travel with the count:
    // the plain fold cancels on even-multiplicity swaps ({A,A}→{C,C}
    // keeps xor AND count identical — advisor, round 5), so a second
    // fold over the DISTINCT row hashes (A^B vs C^B differ) closes the
    // pair-cancellation hole; a change fooling all three simultaneously
    // would need equal xor, equal distinct-xor, and equal count.
    val rowHash = xxhash64(to_json(struct(docs.columns.toIndexedSeq.map(col): _*)))
    val docSums = docs.select(chunkOf.as("chunk"), rowHash.as("h"))
      .groupBy(col("chunk"))
      .agg(expr("bit_xor(h)").as("hsum"),
        expr("bit_xor(DISTINCT h)").as("hsumd"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val refChunks = docs
      .select(chunkOf.as("chunk"),
        explode(col("spans.media_ref")).as("media_ref"))
      .filter(col("media_ref") =!= "")
      .distinct()
    val mediaSums = media.select(col("media_ref")).join(refChunks, Seq("media_ref"))
      .select(col("chunk"), xxhash64(col("media_ref")).as("h"))
      .groupBy(col("chunk"))
      .agg(expr("bit_xor(h)").as("hsum"),
        expr("bit_xor(DISTINCT h)").as("hsumd"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // fpv is an EXPLICIT format version (advisor, round 6): any change
    // to the fingerprint recipe or the snapshotId fields invalidates
    // every sentinel written by prior releases, and the first run
    // after an upgrade then pays a ONE-TIME full re-stage of all
    // chunks — intentional (stale reuse would be worse), but operators
    // should see a version bump in the sentinel rather than diagnose
    // the rewrite as staleness. Bump fpv whenever the recipe changes
    // (round 5 changed it silently: second DISTINCT fold + len/mtime
    // in snapshotId).
    def fingerprint(k: Long): String = {
      val (dh, dhd, dn) = docSums.getOrElse(k, (0L, 0L, 0L))
      val (mh, mhd, mn) = mediaSums.getOrElse(k, (0L, 0L, 0L))
      s"fpv=7 docs:$dh:$dhd:$dn media:$mh:$mhd:$mn layout=rowgroup4m"
    }
    def sentinelPath(k: Long) = sentDir.resolve(s"chunk-$k")
    val live = docSums.keySet
    val sentineled = listDir(sentDir)
      .map(_.getFileName.toString)
      .collect { case s if s.matches("chunk-\\d+") => s.drop(6).toLong }
      .toSet
    def chunkDirs(k: Long) =
      Seq(stagedRoot.resolve(s"docs/chunk=$k"), stagedRoot.resolve(s"media/chunk=$k"))
    def deleteDir(p: Path): Unit =
      if (Files.isDirectory(p)) walkDeepestFirst(p).foreach(Files.delete)
    val dirty = live.filter { k =>
      !(Files.exists(sentinelPath(k)) &&
        Files.readString(sentinelPath(k)) == fingerprint(k))
    }.toSeq.sorted
    // the input changed: yesterday's snapshot no longer vouches for
    // the sentinels — remove it BEFORE rewriting so a crash mid-stage
    // cannot leave a stale fast-path marker
    Files.deleteIfExists(snapFile)
    // chunks staged before (sentinel or leftover dir) but gone from
    // the input: remove, or a pruned read would resurrect stale docs
    val dirIds = Seq("docs", "media").flatMap { t =>
      listDir(stagedRoot.resolve(t)).map(_.getFileName.toString)
        .collect { case s if s.matches("chunk=\\d+") => s.drop(6).toLong }
    }.toSet
    ((sentineled ++ dirIds) -- live).foreach { k =>
      Files.deleteIfExists(sentinelPath(k))
      chunkDirs(k).foreach(deleteDir)
    }
    if (dirty.nonEmpty) {
      // invalidate first (crash ⇒ still dirty), clear the partitions,
      // then rewrite ONLY the dirty partitions (dynamic overwrite)
      dirty.foreach { k =>
        Files.deleteIfExists(sentinelPath(k))
        chunkDirs(k).foreach(deleteDir)
      }
      docs.withColumn("chunk", chunkOf)
        .filter(col("chunk").isin(dirty: _*))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("chunk")
        .parquet(s"$stagedRoot/docs")
      // 4 MB row groups: scan-split = kernel-scheduling unit (see
      // CorpusGen.write / ExtractionPipeline session factory)
      media.join(refChunks.filter(col("chunk").isin(dirty: _*)),
          Seq("media_ref"), "inner")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("chunk")
        .option("parquet.block.size", s"${4 << 20}")
        .parquet(s"$stagedRoot/media")
      dirty.foreach { k =>
        val tmp = sentDir.resolve(s".chunk-$k.tmp")
        Files.writeString(tmp, fingerprint(k))
        Files.move(tmp, sentinelPath(k),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
    }
    // all sentinels now reflect THIS input — arm the fast path
    val tmp = stagedRoot.resolve("._input_snapshot.tmp")
    Files.writeString(tmp, inputSnap)
    Files.move(tmp, snapFile,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** A4 — progress % (reference models.py ProcessingStatus.progress ∈
    * [0,100] + the polling endpoint): task-level progress from a
    * SparkListener. Attach around a run; `percent` is completed/total
    * tasks over all submitted stages — the Spark-native equivalent of
    * the reference's per-file progress callback.
    */
  final class TaskProgressListener
      extends org.apache.spark.scheduler.SparkListener {
    private val total = new java.util.concurrent.atomic.AtomicLong
    private val done = new java.util.concurrent.atomic.AtomicLong
    override def onStageSubmitted(
        s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
      total.addAndGet(s.stageInfo.numTasks.toLong)
    // only SUCCESSFUL task ends count (advisor, round 4): failed/killed
    // attempts re-run and would double-count; speculative duplicates
    // and stage resubmission can still nudge done past total, so
    // percent clamps to 100 rather than overshooting the poll surface.
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (t.reason == org.apache.spark.Success) done.incrementAndGet()
    def completedTasks: Long = done.get
    def totalTasks: Long = total.get
    def percent: Double =
      if (total.get == 0L) 0.0
      else math.min(100.0, done.get * 100.0 / total.get)
  }

  /** Chunk-granularity progress record, written atomically to
    * `_manifest/progress.json` after every chunk commit — a resumable
    * run's poll surface (the reference polls task progress %,
    * main.py:311-317; here the unit is the chunk, the same grain the
    * lineage manifests use).
    */
  def writeProgress(outDir: String, runId: String, done: Int, total: Int): Unit = {
    val pct = if (total == 0) 100.0 else done * 100.0 / total
    val json =
      s"""{"runId":"$runId","chunksDone":$done,"chunksTotal":$total,""" +
        f""""percent":$pct%.1f}"""
    val dir = manifestDir(outDir)
    val tmp = dir.resolve(".progress.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, dir.resolve("progress.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readProgress(outDir: String): Option[Double] = {
    val p = manifestDir(outDir).resolve("progress.json")
    if (!Files.exists(p)) None
    else """"percent":([0-9.]+)""".r.findFirstMatchIn(Files.readString(p))
      .map(_.group(1).toDouble)
  }

  /** Handle to a bucketed staging layout (see [[stageBucketed]]). */
  final case class BucketedStage(
      tasksTable: String,
      mediaTable: String,
      inlineDir: String,
      buckets: Int)

  /** Order-independent content fingerprint of a media ref SET (bytes
    * immutable by ref — the object-store contract): xor of key hashes
    * + count. Shared by [[stageBucketed]] and [[stageMediaBucketed]]
    * so the two sentinel formats cannot drift apart.
    */
  private def mediaRefFingerprint(mediaClean: DataFrame): String = {
    val r = mediaClean.select(xxhash64(col("media_ref")).as("h"))
      .agg(expr("bit_xor(h)").as("hx"),
        expr("bit_xor(DISTINCT h)").as("hxd"),
        count(lit(1)).as("n")).head()
    def nz(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
    // two xor folds + count (see stageByChunkSlow): the distinct fold
    // breaks the even-multiplicity cancellation of the plain fold
    s"xor:${nz(0)}:${nz(1)}:n:${r.getLong(2)} layout=rowgroup4m"
  }

  /** Write a (media_ref, bytes) frame as a bucketed+sorted parquet
    * table, one file per bucket, 4 MB row groups (scan-split =
    * kernel-scheduling unit).
    */
  private def writeBucketedMedia(
      spark: SparkSession, mediaClean: DataFrame,
      path: String, tbl: String, buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    mediaClean
      .repartition(buckets, col("media_ref"))
      .write.format("parquet")
      .bucketBy(buckets, "media_ref").sortBy("media_ref")
      .option("path", path)
      .option("parquet.block.size", s"${4 << 20}")
      .mode("overwrite").saveAsTable(tbl)
  }

  /** Recreate a catalog entry over EXISTING bucketed files — the
    * catalog is session state; a fresh session must re-register, never
    * rewrite, an intact (possibly 100-TB) staged table.
    */
  private def registerBucketedTable(
      spark: SparkSession, tbl: String, schemaDdl: String,
      path: String, buckets: Int): Unit =
    spark.sql(
      s"""CREATE TABLE $tbl ($schemaDdl) USING PARQUET
         |CLUSTERED BY (media_ref) SORTED BY (media_ref)
         |INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)

  /** Sentinel-guarded component freshness: fresh sentinel + live table
    * → no-op; fresh sentinel + lost table → `reRegister` over the
    * existing files; anything else → invalidate (crash mid-rewrite ⇒
    * still dirty), `rewrite`, re-arm the sentinel atomically.
    *
    * reRegister is gated on the data location still holding at least
    * one data file (advisor, round 5): a sentinel that survived while
    * the data subdir was removed must NOT register an empty table —
    * CREATE TABLE ... LOCATION over nothing would silently proceed
    * with every payload missing; such a component falls through to the
    * invalidate-and-rewrite branch instead.
    */
  private def freshComponent(
      root: Path, name: String, fingerprint: String, tableOk: Boolean,
      reRegister: Option[() => Unit] = None,
      dataDir: Option[Path] = None)(rewrite: () => Unit): Unit = {
    val sentinel = root.resolve(s"_${name}_complete")
    val sentinelFresh = Files.exists(sentinel) &&
      Files.readString(sentinel) == fingerprint
    def hasDataFiles = dataDir.forall(d => listDir(d).exists { p =>
      val n = p.getFileName.toString
      !n.startsWith("_") && !n.startsWith(".")
    })
    if (sentinelFresh && tableOk) ()
    else if (sentinelFresh && reRegister.isDefined && hasDataFiles)
      reRegister.get.apply()
    else {
      Files.deleteIfExists(sentinel)
      rewrite()
      val tmp = root.resolve(s"._${name}_complete.tmp")
      Files.writeString(tmp, fingerprint)
      Files.move(tmp, sentinel,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Stage the input CO-BUCKETED BY `media_ref` — the storage layout
    * under which the media join needs neither a broadcast nor any
    * exchange (ExtractionPipeline.extractStaged). Three outputs:
    *
    *  - media-span task metadata (doc_id, offset, kind, media_ref —
    *    bytes-free), bucketed+sorted by media_ref;
    *  - payloads, bucketed+sorted by media_ref, 4 MB row groups;
    *  - inline tasks (text/html/empty-doc/ref-less), plain parquet —
    *    they never touch the join.
    *
    * Both bucketed writes repartition by the bucket key first so each
    * bucket lands in ONE file (write-side HashPartitioning matches the
    * bucket spec), letting the scan-side sort elide. Bucket metadata
    * lives in the session catalog (saveAsTable): this is the sandbox
    * stand-in for an Iceberg table whose partition spec carries
    * `bucket(N, media_ref)` durably — reuse across sessions restages
    * if the catalog entry is gone.
    *
    * Invalidation is PER COMPONENT (round 5; was one whole-input
    * sentinel): tasks, media, and inline each carry their own atomic
    * content-fingerprint sentinel (order-independent xor of row hashes
    * + count — [[stageByChunk]]'s scheme), so a change touching only
    * doc text rewrites the two small metadata components and REUSES
    * the bucketed payload table — the dominant bytes at 100 TB.
    * Payload immutability by ref is assumed, as in [[stageByChunk]].
    * Finer grain (appending a few refs into existing buckets) is
    * Iceberg's bucket-partitioned append; Spark's bucketed writer only
    * replaces tables wholesale, so the media fingerprint decides reuse
    * per TABLE, not per bucket.
    */
  def stageBucketed(
      spark: SparkSession,
      docs: DataFrame,
      media: DataFrame,
      outDir: String,
      buckets: Int): BucketedStage = {
    require(buckets > 0)
    val root = Paths.get(outDir, "_bucketed", s"buckets=$buckets")
    Files.createDirectories(root)
    // pre-round-5 whole-input sentinel → no component fingerprints:
    // drop it, every component re-fingerprints (and rewrites on miss)
    Files.deleteIfExists(root.resolve("_bucketed_complete"))
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$outDir|$buckets".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val tasksTbl = s"graft_bucketed_tasks_$tag"
    val mediaTbl = s"graft_bucketed_media_$tag"
    // unchanged-input fast path (see stageByChunk): identical input
    // file set + live catalog tables ⇒ the component fingerprints
    // cannot have changed; skip the three fingerprint scans
    val inputSnap = snapshotId(docs) + "|" + snapshotId(media)
    val snapFile = root.resolve("_input_snapshot")
    // file-backed inputs only: in-memory frames degenerate to a
    // schema-hash snapshot (see stageByChunk)
    if (docs.inputFiles.nonEmpty && media.inputFiles.nonEmpty &&
        Files.exists(snapFile) && Files.readString(snapFile) == inputSnap &&
        spark.catalog.tableExists(tasksTbl) &&
        spark.catalog.tableExists(mediaTbl))
      return BucketedStage(tasksTbl, mediaTbl, s"$root/inline", buckets)
    Files.deleteIfExists(snapFile) // stale until every component is fresh
    val tasks = ExtractionPipeline.spanTasks(docs)
    val isMedia = ExtractionPipeline.isMediaSpan
    def fp(df: DataFrame): String = {
      val cols = struct(df.columns.toIndexedSeq.map(col): _*)
      val r = df.select(xxhash64(to_json(cols)).as("h"))
        .agg(expr("bit_xor(h)").as("hx"),
          expr("bit_xor(DISTINCT h)").as("hxd"),
          count(lit(1)).as("n")).head()
      def nz(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
      // two xor folds + count (see stageByChunkSlow): the distinct fold
      // breaks the even-multiplicity cancellation of the plain fold
      s"xor:${nz(0)}:${nz(1)}:n:${r.getLong(2)} layout=rowgroup4m"
    }
    val mediaClean = media.filter(col("media_ref") =!= lit(""))
      .select(col("media_ref"), col("bytes"))
    val mediaTasks = tasks.filter(isMedia)
      .select(col("doc_id"), col("offset"), col("kind"), col("media_ref"))
    val inlineTasks = tasks.filter(!isMedia)
    freshComponent(root, "tasks", fp(mediaTasks),
      spark.catalog.tableExists(tasksTbl),
      reRegister = Some(() => registerBucketedTable(spark, tasksTbl,
        "doc_id STRING, offset INT, kind STRING, media_ref STRING",
        s"$root/tasks", buckets)),
      dataDir = Some(root.resolve("tasks"))) { () =>
      spark.sql(s"DROP TABLE IF EXISTS $tasksTbl")
      mediaTasks
        .repartition(buckets, col("media_ref"))
        .write.format("parquet")
        .bucketBy(buckets, "media_ref").sortBy("media_ref")
        .option("path", s"$root/tasks")
        .mode("overwrite").saveAsTable(tasksTbl)
    }
    freshComponent(root, "media", mediaRefFingerprint(mediaClean),
      spark.catalog.tableExists(mediaTbl),
      reRegister = Some(() => registerBucketedTable(spark, mediaTbl,
        "media_ref STRING, bytes BINARY", s"$root/media", buckets)),
      dataDir = Some(root.resolve("media"))) { () =>
      writeBucketedMedia(spark, mediaClean, s"$root/media", mediaTbl, buckets)
    }
    freshComponent(root, "inline", fp(inlineTasks), tableOk = true) { () =>
      inlineTasks.write.mode("overwrite").parquet(s"$root/inline")
    }
    // every component fresh under THIS input — arm the fast path
    val snapTmp = root.resolve("._input_snapshot.tmp")
    Files.writeString(snapTmp, inputSnap)
    Files.move(snapTmp, snapFile,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    BucketedStage(tasksTbl, mediaTbl, s"$root/inline", buckets)
  }

  /** Stage ONLY the media sidecar bucketed by `media_ref` — the
    * static side of the streaming no-broadcast join
    * (ExtractionPipeline.extractVsBucketedMedia): payloads land
    * bucketed+sorted once, every micro-batch joins against them
    * exchange-free on the payload side. Guarded by the same atomic
    * content-fingerprint sentinel as [[stageBucketed]]'s media
    * component (ref-set xor + count; payload immutability by ref).
    * Returns the catalog table name.
    */
  def stageMediaBucketed(
      spark: SparkSession,
      media: DataFrame,
      outDir: String,
      buckets: Int): String = {
    require(buckets > 0)
    val root = Paths.get(outDir, "_bucketed_media", s"buckets=$buckets")
    Files.createDirectories(root)
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$outDir|media|$buckets".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val tbl = s"graft_bucketed_smedia_$tag"
    // unchanged-input fast path, file-backed inputs only (see
    // stageByChunk)
    val inputSnap = snapshotId(media)
    val snapFile = root.resolve("_input_snapshot")
    if (media.inputFiles.nonEmpty &&
        Files.exists(snapFile) && Files.readString(snapFile) == inputSnap &&
        spark.catalog.tableExists(tbl))
      return tbl
    Files.deleteIfExists(snapFile)
    val mediaClean = media.filter(col("media_ref") =!= lit(""))
      .select(col("media_ref"), col("bytes"))
    freshComponent(root, "media", mediaRefFingerprint(mediaClean),
      spark.catalog.tableExists(tbl),
      reRegister = Some(() => registerBucketedTable(spark, tbl,
        "media_ref STRING, bytes BINARY", s"$root/media", buckets)),
      dataDir = Some(root.resolve("media"))) { () =>
      writeBucketedMedia(spark, mediaClean, s"$root/media", tbl, buckets)
    }
    val snapTmp = root.resolve("._input_snapshot.tmp")
    Files.writeString(snapTmp, inputSnap)
    Files.move(snapTmp, snapFile,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    tbl
  }

  /** Run the extraction chunk-by-chunk with idempotent commits.
    *
    * @param failAfterChunks test hook — throw after committing this many
    *        chunks (simulates a killed run for the resume test)
    * @param bucketedJoin route each chunk through the NO-BROADCAST
    *        co-bucketed join (stageBucketed + extractStaged) instead of
    *        the gated-broadcast `extract` — the 10^12-doc path, behind
    *        a flag so the default chunk loop keeps its single staging
    *        pass. Each chunk's pruned slice is bucket-staged under its
    *        own sentinel-guarded dir, so resume pays no re-staging for
    *        unchanged chunks.
    */
  def run(
      spark: SparkSession,
      docs: DataFrame,
      media: DataFrame,
      outDir: String,
      runId: String,
      chunks: Int = 4,
      partitions: Int = 32,
      failAfterChunks: Int = Int.MaxValue,
      expected: Option[DataFrame] = None,
      bucketedJoin: Boolean = false): RunSummary = {
    require(chunks > 0)
    Files.createDirectories(manifestDir(outDir))
    val sourceSnapshot = snapshotId(docs)
    val already = committedChunks(outDir)
    val (stagedDocs, stagedMedia) =
      stageByChunk(spark, docs, media, outDir, chunks)
    val committed = scala.collection.mutable.ArrayBuffer.empty[ChunkManifest]
    var done = 0
    writeProgress(outDir, runId, already.size, chunks)
    (0 until chunks).foreach { k =>
      if (already.contains(k)) ()
      else {
        if (done >= failAfterChunks)
          throw new RuntimeException(s"injected failure before chunk $k")
        val t0 = System.nanoTime()
        // partition-pruned reads: chunk k touches only its own slice of
        // docs AND media (PlanSpec asserts the PartitionFilters)
        val chunkDocs = stagedDocs.filter(col("chunk") === lit(k)).drop("chunk")
        val chunkMedia = stagedMedia.filter(col("chunk") === lit(k)).drop("chunk")
        // chunk-scoped co-bucketed layout (own dir → own catalog
        // tables + sentinels): the media join is exchange-free and
        // broadcast-free at any chunk size. Reclaimed after the
        // chunk's commit (below) — a committed chunk never re-runs,
        // so its staging is dead weight; footprint stays one chunk.
        val stageOpt =
          if (bucketedJoin) Some(stageBucketed(spark, chunkDocs, chunkMedia,
            s"$outDir/_chunk_stage/chunk=$k", partitions))
          else None
        val out = stageOpt match {
          case Some(stage) =>
            ExtractionPipeline.extractStaged(spark, stage, partitions)
          case None =>
            ExtractionPipeline.extract(chunkDocs, chunkMedia, partitions)
        }
        out.write.mode("overwrite").parquet(s"$outDir/data/chunk=$k")
        // counts from the written files (what actually committed)
        val written = spark.read.parquet(s"$outDir/data/chunk=$k")
        val stats = written.select(
          count(lit(1)).as("rows"),
          coalesce(sum(size(col("spans"))), lit(0L)).as("spans"),
          coalesce(sum(size(filter(col("spans"), s => s("kind") === lit("error")))),
            lit(0L)).as("errors")).head()
        // span-mismatch counter (north rule lineage field): committed
        // docs whose span sequence differs from the expectation —
        // only the chunk's own rows join, so the check is pruned too
        val mismatches = expected.map { g =>
          written.select(col("doc_id"), col("spans").as("a"))
            .join(g.select(col("doc_id"), col("spans").as("b")),
              Seq("doc_id"), "left")
            .where(not(col("a") <=> col("b"))).count()
        }.getOrElse(0L)
        val m = ChunkManifest(runId, k, sourceSnapshot,
          stats.getLong(0), stats.getLong(1), stats.getLong(2),
          (System.nanoTime() - t0) / 1000000L, mismatches)
        writeManifest(outDir, m)
        // the chunk is committed — reclaim its bucketed staging
        // (catalog tables + dir); resume skips committed chunks, so
        // nothing will ever read it again (reviewer finding: the
        // per-chunk stages otherwise accumulate unboundedly)
        stageOpt.foreach { stage =>
          spark.sql(s"DROP TABLE IF EXISTS ${stage.tasksTable}")
          spark.sql(s"DROP TABLE IF EXISTS ${stage.mediaTable}")
          val d = Paths.get(s"$outDir/_chunk_stage/chunk=$k")
          if (Files.isDirectory(d)) walkDeepestFirst(d).foreach(Files.delete)
        }
        committed += m
        done += 1
        writeProgress(outDir, runId, already.size + done, chunks)
      }
    }
    RunSummary(committed.toSeq, already.keys.toSeq.sorted)
  }

  /** Read the committed output table (all chunks). */
  def readOutput(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/data")

  // -------------------------------------------------------------------
  // S12 — maintenance (temp-file GC twin, reference
  // app/utils/maintenance.py:13-58): vacuum orphaned data dirs from
  // aborted writes, compact chunk manifests into a snapshot summary.
  // -------------------------------------------------------------------

  /** Delete `data/chunk=k` directories that have NO manifest entry —
    * leftovers of a write that died before its commit record. Returns
    * the vacuumed chunk ids. Never touches manifested chunks.
    */
  def vacuum(outDir: String): Seq[Int] = {
    val dataDir = Paths.get(outDir, "data")
    if (!Files.isDirectory(dataDir)) return Nil
    val committed = committedChunks(outDir).keySet
    val orphans = listDir(dataDir)
      .filter(p => p.getFileName.toString.matches("chunk=\\d+"))
      .filter(p => !committed.contains(p.getFileName.toString.drop(6).toInt))
    orphans.foreach(dir => walkDeepestFirst(dir).foreach(Files.delete))
    orphans.map(_.getFileName.toString.drop(6).toInt).sorted
  }

  /** Write `_manifest/snapshot.json` aggregating all chunk manifests —
    * the Iceberg-snapshot stand-in a downstream reader checks instead
    * of N chunk files.
    */
  def compact(outDir: String): ChunkManifest = {
    val all = committedChunks(outDir).values.toSeq.sortBy(_.chunk)
    require(all.nonEmpty, "nothing committed")
    val total = ChunkManifest(
      runId = all.map(_.runId).distinct.mkString("+"),
      chunk = -1,
      sourceSnapshot = all.map(_.sourceSnapshot).distinct.mkString("+"),
      rowCount = all.map(_.rowCount).sum,
      spanCount = all.map(_.spanCount).sum,
      errorCount = all.map(_.errorCount).sum,
      wallMillis = all.map(_.wallMillis).sum,
      mismatchCount = all.map(_.mismatchCount).sum)
    val json =
      s"""{"runId":"${total.runId}","chunks":${all.length},""" +
        s""""sourceSnapshot":"${total.sourceSnapshot}","rowCount":${total.rowCount},""" +
        s""""spanCount":${total.spanCount},"errorCount":${total.errorCount},""" +
        s""""mismatchCount":${total.mismatchCount},"wallMillis":${total.wallMillis}}"""
    val tmp = manifestDir(outDir).resolve(".snapshot.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestDir(outDir).resolve("snapshot.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    total
  }

  /** Source snapshot id: stable fingerprint of the input's files/shape —
    * recorded in lineage so a manifest can be traced to its input.
    *
    * Each file contributes path + length + modificationTime (advisor,
    * round 5): the path set alone misses a file rewritten IN PLACE
    * under the same name (non-Spark tooling, object-store overwrite,
    * same-name compaction), and the `_input_snapshot` fast paths skip
    * the authoritative content fingerprints when the snapshot matches —
    * so the cheap path must itself detect in-place rewrites. Statuses
    * come from ONE listStatus per parent directory (not one RPC per
    * file — a 100-TB table has many thousands of files).
    */
  def snapshotId(docs: DataFrame): String = {
    val files = docs.inputFiles.sorted
    val h = java.security.MessageDigest.getInstance("MD5")
    if (files.isEmpty) h.update(docs.schema.catalogString.getBytes("UTF-8"))
    else {
      val conf = docs.sparkSession.sparkContext.hadoopConfiguration
      // keys normalized through Path.toString on BOTH sides: inputFiles
      // yields file:///x URIs, FileStatus.getPath file:/x — a raw-string
      // lookup would silently miss every file
      val statusByPath: Map[String, (Long, Long)] = files
        .map(f => new org.apache.hadoop.fs.Path(f))
        .groupBy(_.getParent)
        .flatMap { case (parent, _) =>
          try parent.getFileSystem(conf).listStatus(parent).toSeq
            .map(s => s.getPath.toString ->
              ((s.getLen, s.getModificationTime)))
          catch { case _: java.io.IOException => Nil }
        }
      files.foreach { f =>
        val key = new org.apache.hadoop.fs.Path(f).toString
        val (len, mtime) = statusByPath.getOrElse(key, (-1L, -1L))
        h.update(s"$f|$len|$mtime".getBytes("UTF-8"))
      }
    }
    h.digest().map("%02x".format(_)).mkString.take(16)
  }

  private def writeManifest(outDir: String, m: ChunkManifest): Unit = {
    val json =
      s"""{"runId":"${m.runId}","chunk":${m.chunk},"sourceSnapshot":"${m.sourceSnapshot}",""" +
        s""""rowCount":${m.rowCount},"spanCount":${m.spanCount},""" +
        s""""errorCount":${m.errorCount},"mismatchCount":${m.mismatchCount},""" +
        s""""wallMillis":${m.wallMillis}}"""
    val dir = manifestDir(outDir)
    val tmp = dir.resolve(s".chunk-${m.chunk}.json.tmp")
    Files.writeString(tmp, json)
    // Single-writer is the contract (as in Iceberg, where optimistic
    // manifest locking enforces it); if a concurrent run races us to
    // the same chunk anyway, losing the rename is NON-FATAL — the
    // winner committed the same deterministic output, so discard our
    // tmp record instead of dying after the data write. (The data-dir
    // write itself is not multi-writer-safe: don't run two
    // uncoordinated writers against one outDir.)
    try Files.move(tmp, dir.resolve(s"chunk-${m.chunk}.json"),
      StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
    }
  }

  // mismatchCount group optional: manifests written before round 4
  // lack the field and must keep parsing (read as 0)
  private val manifestPattern =
    ("""\{"runId":"([^"]*)","chunk":(\d+),"sourceSnapshot":"([^"]*)",""" +
      """"rowCount":(\d+),"spanCount":(\d+),"errorCount":(\d+),""" +
      """(?:"mismatchCount":(\d+),)?"wallMillis":(\d+)\}""").r

  def parseManifest(json: String): Option[ChunkManifest] = json.trim match {
    case manifestPattern(runId, chunk, snap, rows, spans, errs, mism, wall) =>
      Some(ChunkManifest(runId, chunk.toInt, snap, rows.toLong, spans.toLong,
        errs.toLong, wall.toLong,
        Option(mism).map(_.toLong).getOrElse(0L)))
    case _ => None
  }
}
