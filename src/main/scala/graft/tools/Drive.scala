package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import graft.pipeline.{ExtractionPipeline, SpanKernel}
import graft.model.SpanTask

/** Throwaway stage-cost probe: times extract variants on the cached
  * bench corpus to attribute pipeline overhead. Delete after use.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = ExtractionPipeline.session("graft-drive", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/tmp/graft_bench_corpus_9000"
    val docs = spark.read.parquet(s"$dir/docs")
    val media = spark.read.parquet(s"$dir/media")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }

    // variant A: current full extract
    def full(): Long = ExtractionPipeline.extract(docs, media, cpus * 4).count()

    // variant B: kernel-only — explode, inner join, salt, kernel, count
    def kernelOnly(): Long = {
      val tasks = docs.select(col("doc_id"), explode(col("spans")).as("span"))
        .select(col("doc_id"), col("span.offset").as("offset"),
          col("span.kind").as("kind"), col("span.text").as("text"),
          coalesce(col("span.media_ref"), lit("")).as("media_ref"))
      val inline = tasks.filter(col("media_ref") === lit(""))
        .withColumn("bytes", lit(null).cast(BinaryType))
      val withMedia = tasks.filter(col("media_ref") =!= lit(""))
        .join(media.select(col("media_ref"), col("bytes")), Seq("media_ref"), "inner")
      val cols = Seq("doc_id", "offset", "kind", "text", "media_ref", "bytes")
      val all = inline.select(cols.map(col): _*)
        .unionByName(withMedia.select(cols.map(col): _*))
      val salted = all.repartition(cpus * 4,
        pmod(xxhash64(col("doc_id"), col("offset")), lit(cpus * 4)))
      salted.as[SpanTask].mapPartitions(_.flatMap(t => SpanKernel.process(t)))
        .count()
    }

    // variant C: kernel + reassemble, NO final doc join
    def noFinalJoin(): Long = {
      val tasks = docs.select(col("doc_id"), explode(col("spans")).as("span"))
        .select(col("doc_id"), col("span.offset").as("offset"),
          col("span.kind").as("kind"), col("span.text").as("text"),
          coalesce(col("span.media_ref"), lit("")).as("media_ref"))
      val inline = tasks.filter(col("media_ref") === lit(""))
        .withColumn("bytes", lit(null).cast(BinaryType))
      val withMedia = tasks.filter(col("media_ref") =!= lit(""))
        .join(media.select(col("media_ref"), col("bytes")), Seq("media_ref"), "inner")
      val cols = Seq("doc_id", "offset", "kind", "text", "media_ref", "bytes")
      val all = inline.select(cols.map(col): _*)
        .unionByName(withMedia.select(cols.map(col): _*))
      val salted = all.repartition(cpus * 4,
        pmod(xxhash64(col("doc_id"), col("offset")), lit(cpus * 4)))
      val subs = salted.as[SpanTask]
        .mapPartitions(_.flatMap(t => SpanKernel.process(t)))
      ExtractionPipeline.reassemble(subs.toDF()).count()
    }

    // warm-up
    kernelOnly()
    time("kernel-only   ")(kernelOnly())
    time("plus-reassemble")(noFinalJoin())
    time("full-extract  ")(full())
    time("kernel-only#2 ")(kernelOnly())
    spark.stop()
  }
}
