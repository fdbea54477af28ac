package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.fixtures.CorpusGen

/** §2.9 — streaming ingestion: docs arriving in waves stream through
  * the extraction dataflow; output accumulates to exactly the golden
  * spans; a restart with the same checkpoint processes only the new
  * files (no duplicates, no gaps).
  */
class StreamingExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("two-wave streaming extraction matches goldens with no duplicates across restart") {
    val corpus = Files.createTempDirectory("graft_stream_corpus").toString
    CorpusGen.write(spark, corpus,
      CorpusGen.Params(nDocs = 120, kinds = Seq("text", "html", "pdf")))
    val media = spark.read.parquet(s"$corpus/media")
    val golden = spark.read.parquet(s"$corpus/golden_spans")

    // stream dir fed in waves with the corpus' own parquet part files
    val streamDir = Files.createTempDirectory("graft_stream_in").toString
    val outDir = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val parts = new java.io.File(s"$corpus/docs").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length >= 2, "need at least two part files for two waves")
    val (wave1, wave2) = parts.splitAt(parts.length / 2)

    wave1.foreach(f => Files.copy(f.toPath,
      Paths.get(streamDir, f.getName)))
    val q1 = StreamingExtract.run(spark, streamDir, media, outDir, ckpt,
      partitions = 4)
    q1.awaitTermination()
    val afterWave1 = StreamingExtract.readOutput(spark, outDir).count()
    val wave1Docs = spark.read.parquet(
      wave1.map(_.getPath): _*).count()
    assert(afterWave1 == wave1Docs)

    // second wave + RESTARTED query on the same checkpoint: only the
    // new files process (the committed epochs and seen files skip)
    wave2.foreach(f => Files.copy(f.toPath,
      Paths.get(streamDir, f.getName)))
    val q2 = StreamingExtract.run(spark, streamDir, media, outDir, ckpt,
      partitions = 4)
    q2.awaitTermination()

    val out = StreamingExtract.readOutput(spark, outDir)
      .select(col("doc_id"), col("spans"))
    assert(out.count() == golden.count(), "every doc exactly once")
    val mismatches = out.select(col("doc_id"), col("spans").as("a"))
      .join(golden.select(col("doc_id"), col("spans").as("b")),
        Seq("doc_id"), "full_outer")
      .where(not(col("a") <=> col("b"))).count()
    assert(mismatches == 0L)
  }

  test("streaming over the BUCKETED no-broadcast media join matches goldens across restart") {
    val corpus = Files.createTempDirectory("graft_streamb_corpus").toString
    CorpusGen.write(spark, corpus,
      CorpusGen.Params(nDocs = 100, kinds = Seq("text", "html", "pdf", "png")))
    val media = spark.read.parquet(s"$corpus/media")
    val golden = spark.read.parquet(s"$corpus/golden_spans")
    val streamDir = Files.createTempDirectory("graft_streamb_in").toString
    val outDir = Files.createTempDirectory("graft_streamb_out").toString
    val ckpt = Files.createTempDirectory("graft_streamb_ckpt").toString
    val parts = new java.io.File(s"$corpus/docs").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val (wave1, wave2) = parts.splitAt(parts.length / 2)
    wave1.foreach(f => Files.copy(f.toPath, Paths.get(streamDir, f.getName)))
    StreamingExtract.run(spark, streamDir, media, outDir, ckpt,
      partitions = 4, bucketedMediaBuckets = Some(4)).awaitTermination()
    wave2.foreach(f => Files.copy(f.toPath, Paths.get(streamDir, f.getName)))
    StreamingExtract.run(spark, streamDir, media, outDir, ckpt,
      partitions = 4, bucketedMediaBuckets = Some(4)).awaitTermination()
    val out = StreamingExtract.readOutput(spark, outDir)
      .select(col("doc_id"), col("spans"))
    assert(out.count() == golden.count(), "every doc exactly once")
    val mm = out.select(col("doc_id"), col("spans").as("a"))
      .join(golden.select(col("doc_id"), col("spans").as("b")),
        Seq("doc_id"), "full_outer")
      .where(not(col("a") <=> col("b"))).count()
    assert(mm == 0L)
  }
}
