package graft.exprs

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's native Catalyst expressions with a session
  * (`SparkSession.builder().withExtensions(new GraftExtensions)`, or
  * `spark.sql.extensions=graft.exprs.GraftExtensions` on a stock
  * spark-submit). Registry functions resolve for both the DataFrame
  * API (`call_function("int8_dot", ...)`) and SQL text — the public
  * extension seam, per the Spark docs' preference order: native
  * codegen expression over UDF.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("int8_pack"),
      new ExpressionInfo(classOf[Int8Pack].getName, "int8_pack"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "int8_pack(vec)")
        Int8Pack(children.head)
      }))
    ext.injectFunction((FunctionIdentifier("int8_dot"),
      new ExpressionInfo(classOf[Int8Dot].getName, "int8_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "int8_dot(code, query)")
        Int8Dot(children(0), children(1))
      }))
  }
}
