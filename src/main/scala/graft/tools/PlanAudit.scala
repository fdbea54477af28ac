package graft.tools

import org.apache.spark.sql.functions._

/** One-shot plan audit: entry smoke + formatted plans of the hot
  * paths, for eyeballing shuffle/broadcast/pushdown shapes.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.pipeline.ExtractionPipeline.session("plan-audit", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val entry = graft.SparkEntry.entry(spark)
    println(s"ENTRY rows=${entry.count()}")
    println("=== extract plan (formatted, truncated) ===")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(out) { entry.explain("formatted") }
    val plan = out.toString
    println(plan.take(4000))
    println("=== invoice chain plan ===")
    val inv = graft.pipeline.InvoiceExtract.fromSpans(entry)
    val out2 = new java.io.ByteArrayOutputStream()
    Console.withOut(out2) { inv.toDF().explain("formatted") }
    println(out2.toString.take(3000))
    println(s"INVOICES=${inv.count()}")
    spark.stop()
  }
}
