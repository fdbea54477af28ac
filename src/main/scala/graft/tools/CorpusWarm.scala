package graft.tools

import graft.fixtures.CorpusGen
import graft.pipeline.ExtractionPipeline

/** Generate (or reuse) the bench corpus at full machine width — the
  * scaling harness calls this once so neither measured configuration
  * pays generation cost.
  */
object CorpusWarm {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "9000").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR",
      s"/tmp/graft_bench_corpus_$nDocs")
    val spark = ExtractionPipeline.session("graft-corpus-warm", 32)
    spark.sparkContext.setLogLevel("WARN")
    CorpusGen.ensure(spark, dir, CorpusGen.Params(nDocs = nDocs))
    println(s"corpus ready: $dir")
    spark.stop()
  }
}
