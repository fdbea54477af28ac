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
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot(a, b)")
        VecDot(children(0), children(1))
      }))
    ext.injectFunction((FunctionIdentifier("simhash_pack"),
      new ExpressionInfo(classOf[SimhashPack].getName, "simhash_pack"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash_pack(hashes)")
        SimhashPack(children.head)
      }))
    ext.injectFunction((FunctionIdentifier("md5_hash64"),
      new ExpressionInfo(classOf[Md5Hash64].getName, "md5_hash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "md5_hash64(s)")
        Md5Hash64(children.head)
      }))
    ext.injectFunction((FunctionIdentifier("minhash_mix"),
      new ExpressionInfo(classOf[MinhashMix].getName, "minhash_mix"),
      (children: Seq[Expression]) => {
        require(children.length == 3 && children(1).foldable &&
          children(2).foldable,
          "minhash_mix(hashes, k-literal, consts-array-literal-or-null)")
        val k = children(1).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => sys.error(s"minhash_mix: bad k $other")
        }
        val consts = children(2).eval(null) match {
          case null => Nil
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toLongArray().toSeq
          case other => sys.error(s"minhash_mix: bad consts $other")
        }
        MinhashMix(children(0), k, consts)
      }))
    ext.injectFunction((FunctionIdentifier("ngram_jaccard_x1m"),
      new ExpressionInfo(
        classOf[CharNgramJaccardX1M].getName, "ngram_jaccard_x1m"),
      (children: Seq[Expression]) => {
        require(children.length == 3 &&
          children(2).foldable, "ngram_jaccard_x1m(a, b, n-literal)")
        val n = children(2).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => sys.error(s"ngram_jaccard_x1m: bad n $other")
        }
        CharNgramJaccardX1M(children(0), children(1), n)
      }))
  }
}
