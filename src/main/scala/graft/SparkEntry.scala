package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full extraction pipeline (explode → media join →
    * salted repartition → typed mapPartitions kernel → reassemble) over
    * a deterministic synthesized interleaved corpus. Driver smoke-checks
    * rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/tmp/graft_entry_corpus"
    fixtures.CorpusGen.ensure(spark, dir, fixtures.CorpusGen.Params(nDocs = 150))
    pipeline.ExtractionPipeline.extract(
      spark.read.parquet(s"$dir/docs"),
      spark.read.parquet(s"$dir/media"),
      partitions = spark.sparkContext.defaultParallelism)
  }
  /** One entry per implemented operator from SURVEY.md §2 (see Queries). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
