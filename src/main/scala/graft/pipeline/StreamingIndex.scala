package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.SimilarityOps

/** Streaming ANN index maintenance — the continuous-arrival
  * counterpart of [[SimilarityOps.ivfAppend]]: embedding batches
  * landing in a directory stream are assigned with the index's FROZEN
  * centroid matrix (the exact argmax the build used, so
  * stream-then-query ≡ rebuild-over-the-union) and committed as
  * per-epoch DELTA tables beside the base cells — the same
  * cell-partitioned layout, the same atomic tmp+rename manifest as
  * [[StreamingExtract]], so the at-least-once `foreachBatch` replay
  * after a crash skips an already-committed epoch and an epoch
  * written-but-not-committed stays invisible to every reader:
  * effectively-once index growth, resumable from the checkpoint.
  *
  * Queries need no refresh step: [[SimilarityOps.ivfLoad]] picks up
  * committed deltas, and every query reads base ∪ deltas with the
  * `cell` filter partition-pruning inside each root independently —
  * the probe cost stays ~nprobe/C of (base + deltas), never a rescan.
  * Delta-count growth is bounded by [[compact]], which folds committed
  * deltas into the base exactly like [[Commit.compact]] folds chunk
  * files.
  */
object StreamingIndex {

  /** Start (or resume, given the same checkpoint) streaming index
    * maintenance over `vecsDir`. `Trigger.AvailableNow` drains what is
    * available then stops (the testable batch of streaming); pass
    * `continuous = true` for an unbounded query. The index must
    * already exist ([[SimilarityOps.ivfBuild]]); its centroid matrix
    * is loaded once and frozen for the life of the query — balance
    * drift under a shifting embedding distribution is observable via
    * [[SimilarityOps.ivfCellStats]] and fixed by a rebuild with
    * `refineIters > 0`.
    */
  def run(
      spark: SparkSession,
      vecsDir: String,
      indexDir: String,
      checkpointDir: String,
      continuous: Boolean = false,
      maxFilesPerTrigger: Int = 100): StreamingQuery = {
    val index = SimilarityOps.ivfLoad(indexDir)
    val schema = spark.read.parquet(vecsDir).schema
    val reader = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(vecsDir)
    Files.createDirectories(Paths.get(indexDir, "_delta_manifest"))
    reader.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val manifest = SimilarityOps.ivfDeltaManifest(indexDir, epochId)
        if (!Files.exists(manifest)) { // replayed epoch → already committed
          val deltaPath = SimilarityOps.ivfDeltaPath(indexDir, epochId)
          SimilarityOps.assignCells(batch, index)
            .sortWithinPartitions(col("cell"))
            .write.mode("overwrite").partitionBy("cell")
            .parquet(deltaPath)
          val rows = spark.read.parquet(deltaPath).count()
          val tmp = Paths.get(indexDir, "_delta_manifest",
            s".epoch-$epochId.json.tmp")
          Files.writeString(tmp, s"""{"epoch":$epochId,"rowCount":$rows}""")
          Files.move(tmp, manifest,
            StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        }
        (): Unit
      }
      .trigger(if (continuous) Trigger.ProcessingTime(0) else Trigger.AvailableNow())
      .start()
  }

  /** Fold every COMMITTED delta into the base cell table, so query
    * plans return to a single pruned scan per probe (many small deltas
    * = many scan branches and small files — the LSM compaction moment;
    * parity with [[Commit.compact]]). Uncommitted delta dirs are left
    * untouched for their replay. Sequence: append delta rows into the
    * base partitions ([[SimilarityOps.ivfAppend]] semantics — cell
    * values are already assigned and identical under the frozen
    * centroids, so rows are appended verbatim), then retire manifests
    * BEFORE delta dirs — a crash between those two steps loses nothing
    * (rows already in base) and shows no duplicates (manifest gone →
    * delta invisible). The non-atomic step is the base append itself:
    * run compaction in a maintenance window, not under concurrent
    * readers — a reader racing the append can transiently see a
    * compacting epoch's rows twice (base partial + delta still
    * committed), and a crash mid-append needs the partial part-files
    * swept before retry. Streaming ingestion itself needs no pause —
    * it writes NEW epochs, which compact doesn't touch.
    */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    val epochs = SimilarityOps.ivfCommittedDeltaEpochs(indexDir)
    if (epochs.isEmpty) return
    val index = SimilarityOps.ivfLoad(indexDir)
    val deltaDirs = epochs.map(e => SimilarityOps.ivfDeltaPath(indexDir, e))
    // one read per root (a multi-root read trips partition-discovery's
    // conflicting-directory check: epoch-N isn't a partition dir)
    deltaDirs.map(spark.read.parquet(_)).reduce(_.unionByName(_))
      .select(col(index.idCol), col(index.vecCol), col("cell"))
      .sortWithinPartitions(col("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(index.cellsPath)
    epochs.foreach { e =>
      Files.deleteIfExists(SimilarityOps.ivfDeltaManifest(indexDir, e))
    }
    deltaDirs.foreach { d =>
      val root = Paths.get(d)
      if (Files.isDirectory(root)) {
        import scala.jdk.CollectionConverters._
        val all = Files.walk(root)
        try all.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        finally all.close()
      }
    }
  }
}
