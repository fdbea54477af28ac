package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.ExtractionPipeline

/** One shared local session for all Spark-backed specs. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = ExtractionPipeline.session("graft-test", 4)
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
