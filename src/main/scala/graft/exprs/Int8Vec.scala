package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, CodegenFallback}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Scalar int8 quantization of an embedding vector (the IVF-SQ8
  * compression scheme: Faiss's `ScalarQuantizer` family, re-expressed
  * as Catalyst expressions so the whole path stays inside the plan).
  *
  * Per vector: `scale = max_j |x_j| / 127`,
  * `code_j = clamp(round_half_away(x_j / scale), -127, 127)` packed as
  * SIGNED bytes into one binary cell — 1 byte per dimension instead of
  * 4 (float32): the candidate-scoring pass of a 100-TB index reads a
  * quarter of the bytes. `cnorm = √Σ code_j²` is precomputed so
  * cosine ranking needs no scale at all (it cancels:
  * cos(q, x̂) = Σ q_j·code_j / (|q|·cnorm)); `scale` is kept for
  * dot-product metrics and reconstruction.
  *
  * Cross-engine determinism (the oracle convention): the rounding is
  * EXACT half-away-from-zero on the binary double — `a − floor(a)` is
  * exact for every a ≥ 0 (Sterbenz), so the ≥ 0.5 tie test never sees
  * an `x + 0.5` addition error — matching DuckDB's `round(DOUBLE)`
  * (C `std::round`) bit for bit. An all-zero vector gets scale 0,
  * all-zero codes, cnorm 0 (callers guard the division, as
  * [[graft.ops.SimilarityOps.cosine]] does).
  */
object Int8Vec {

  /** Exact half-away-from-zero rounding of a binary double — the
    * `std::round` semantics DuckDB's `round(DOUBLE)` has. Written
    * without `x + 0.5` (whose FP error flips values just under a
    * half up).
    */
  def roundHalfAway(r: Double): Double = {
    val a = math.abs(r)
    val fl = math.floor(a)
    val m = if (a - fl >= 0.5) fl + 1.0 else fl
    if (r < 0) -m else m
  }

  private[exprs] def pack(
      arr: ArrayData): (Array[Byte], Double, Double) = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var j = 0
    while (j < n) {
      val a = math.abs(arr.getDouble(j))
      if (a > maxAbs) maxAbs = a
      j += 1
    }
    val scale = maxAbs / 127.0
    val code = new Array[Byte](n)
    var sq = 0.0
    j = 0
    while (j < n) {
      val c =
        if (scale > 0) {
          val r = roundHalfAway(arr.getDouble(j) / scale)
          math.max(-127.0, math.min(127.0, r))
        } else 0.0
      code(j) = c.toByte
      sq += c * c
      j += 1
    }
    (code, scale, math.sqrt(sq))
  }
}

/** `array<double> → struct<code: binary, scale: double, cnorm:
  * double>` — one pass per vector, build-path only (the serving hot
  * path is [[Int8Dot]]). Interpreted (CodegenFallback) by the same
  * budget the build's HOF assignment pass already spends; the build
  * is a one-time corpus pass, not the per-query path.
  */
case class Int8Pack(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with CodegenFallback {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("code", BinaryType, nullable = false),
    StructField("scale", DoubleType, nullable = false),
    StructField("cnorm", DoubleType, nullable = false)))
  override def nullSafeEval(input: Any): Any = {
    val (code, scale, cnorm) = Int8Vec.pack(input.asInstanceOf[ArrayData])
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](code, scale, cnorm))
  }
  override def prettyName: String = "int8_pack"
  override protected def withNewChildInternal(
      newChild: Expression): Int8Pack = copy(child = newChild)
}

/** `Σ_j query(j) · code[j]` — the asymmetric int8 dot product (full-
  * precision query against quantized codes, the standard SQ serving
  * trick: only the STORED side is compressed). This IS the serving
  * hot path, so it generates real code: a tight primitive loop over
  * the byte array inside whole-stage codegen — no boxing, no HOF
  * interpretation, no UDF.
  */
case class Int8Dot(code: Expression, query: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def left: Expression = code
  override def right: Expression = query
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(c: Any, q: Any): Any = {
    val bytes = c.asInstanceOf[Array[Byte]]
    val arr = q.asInstanceOf[ArrayData]
    var acc = 0.0
    var j = 0
    val n = math.min(bytes.length, arr.numElements())
    while (j < n) { acc += arr.getDouble(j) * bytes(j).toDouble; j += 1 }
    acc
  }
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, q) => {
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      s"""
         |double $acc = 0.0;
         |int $n = java.lang.Math.min($c.length, $q.numElements());
         |for (int $j = 0; $j < $n; $j++) {
         |  $acc += $q.getDouble($j) * (double) $c[$j];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override def prettyName: String = "int8_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(code = newLeft, query = newRight)
}
