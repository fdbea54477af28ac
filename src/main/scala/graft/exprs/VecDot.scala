package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `Σ_j a(j) · b(j)` over two numeric arrays — the vector dot product
  * as ONE native codegen'd expression (round 8; the serving-path
  * precedent is [[Int8Dot]]).
  *
  * Every similarity/ANN operator previously spelled this as
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, (acc, x) => acc + x)` — higher-order functions evaluate
  * INTERPRETED (CodegenFallback) and are excluded from common-
  * subexpression elimination, so a 64-dim dot paid 64 boxed lambda
  * evaluations per reference, and a cosine (3 dots + a twice-referenced
  * denominator) paid it ~5×. This expression is the drop-in
  * replacement: a tight primitive loop inside whole-stage codegen.
  *
  * BIT-IDENTICAL to the HOF fold by construction, so every persisted
  * oracle hash is unchanged:
  *  - strictly left-to-right accumulation from a 0.0 seed — the same
  *    IEEE sequence as the fold and as the driver-side
  *    [[graft.ops.SimilarityOps.dotScala]];
  *  - Float elements widen exactly to Double before multiplying;
  *  - NULL when either array is NULL, when lengths differ (zip_with
  *    pads the shorter side with NULL, and a NULL product poisons the
  *    fold), or when any element is NULL — and 0.0 (the seed) for two
  *    empty arrays.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs two array<float|double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  // NULL on length mismatch / element NULL even when both inputs are
  // non-null — so nullable regardless of child nullability
  override def nullable: Boolean = true

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val av = l.asInstanceOf[ArrayData]
    val bv = r.asInstanceOf[ArrayData]
    val n = av.numElements()
    if (n != bv.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (av.isNullAt(i) || bv.isNullAt(i)) return null
      val x = if (leftIsFloat) av.getFloat(i).toDouble else av.getDouble(i)
      val y = if (rightIsFloat) bv.getFloat(i).toDouble else bv.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = left.genCode(ctx)
    val b = right.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val bad = ctx.freshName("bad")
    def get(v: String, isFloat: Boolean): String =
      if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
    val code =
      code"""
         |${a.code}
         |${b.code}
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!${a.isNull} && !${b.isNull}) {
         |  int $n = ${a.value}.numElements();
         |  if ($n == ${b.value}.numElements()) {
         |    double $acc = 0.0;
         |    boolean $bad = false;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (${a.value}.isNullAt($i) || ${b.value}.isNullAt($i)) {
         |        $bad = true; break;
         |      }
         |      $acc += ${get(a.value, leftIsFloat)} * ${get(b.value, rightIsFloat)};
         |    }
         |    if (!$bad) { ${ev.isNull} = false; ${ev.value} = $acc; }
         |  }
         |}
       """.stripMargin
    ev.copy(code = code)
  }

  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
