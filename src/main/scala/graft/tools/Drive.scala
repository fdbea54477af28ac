package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import graft.pipeline.{ExtractionPipeline, SpanKernel}
import graft.model.SpanTask

/** Throwaway probe: extract WITHOUT the salted byte shuffle, kernel on
  * scan-granularity partitions (maxPartitionBytes sized small). Delete
  * after use.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val mpb = sys.env.getOrElse("PROBE_MPB", "16m")
    val spark = ExtractionPipeline.session("drive", cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/tmp/graft_bench_corpus_36000")
    val docs = spark.read.parquet(s"$dir/docs")
    val media = spark.read.parquet(s"$dir/media")

    def noShuffle(): (Long, Long) = {
      val tasks = docs.select(col("doc_id"), explode(col("spans")).as("span"))
        .select(col("doc_id"), col("span.offset").as("offset"),
          col("span.kind").as("kind"), col("span.text").as("text"),
          coalesce(col("span.media_ref"), lit("")).as("media_ref"))
      val inline = tasks.filter(col("media_ref") === lit(""))
        .withColumn("bytes", lit(null).cast(BinaryType))
      val withMedia = media.select(col("media_ref"), col("bytes"))
        .join(broadcast(tasks.filter(col("media_ref") =!= lit(""))), Seq("media_ref"))
      val cols = Seq("doc_id", "offset", "kind", "text", "media_ref", "bytes")
      val all = withMedia.select(cols.map(col): _*)
        .unionByName(inline.select(cols.map(col): _*))
      val subs = all.as[SpanTask]
        .mapPartitions(_.flatMap(t => SpanKernel.process(t)))
      val r = ExtractionPipeline.reassemble(subs.toDF())
        .agg(count(lit(1)), sum(size(col("spans")))).head()
      (r.getLong(0), r.getLong(1))
    }
    // warmup + measure
    noShuffle()
    val t0 = System.nanoTime()
    val (rows, spans) = noShuffle()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"NOSHUFFLE cpus=$cpus mpb=$mpb sec=$sec%.1f docs_per_sec=${rows / sec}%.1f rows=$rows spans=$spans")
    spark.stop()
  }
}
