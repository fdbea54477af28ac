package graft.exprs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-similarity kernels (round 8): the SimHash vote/pack
  * fold and the char-n-gram Jaccard, each previously an interpreted
  * HOF lattice evaluated per row (and, for Jaccard, re-evaluated per
  * REFERENCE — the intersect/union expression referenced each n-gram
  * array several times, and lambda-bearing subtrees are excluded from
  * codegen common-subexpression elimination). Both are CodegenFallback
  * (one boxed call per row); the win is the native inner loop, not the
  * call boundary — q25 spent 64 interpreted lambda evaluations per
  * TOKEN, q22 rebuilt its n-gram arrays up to 6× per row.
  *
  * Both replicate the previous Catalyst-HOF semantics exactly (the
  * oracle-parity requirement), documented per expression below.
  */
object TextSim

/** `array<long> → long`: SimHash votes + sign-pack over per-token
  * hashes — the [[graft.ops.DedupOps.simhash64]] fold as one native
  * loop. Exact replication of the HOF form:
  *  - per hash h, bit i votes +1 when `(h >> i) & 1 == 1` (arithmetic
  *    shift — negative xxhash64 values sign-extend, exactly as
  *    `shiftright` did), else −1;
  *  - a NULL hash element voted −1 on every bit in the HOF form (the
  *    `when` condition went NULL → otherwise branch), which is the
  *    h = 0 vote pattern — replicated via the 0L substitution;
  *  - bit i of the result is set iff votes(i) > 0;
  *  - NULL input array → NULL result (aggregate over NULL).
  */
case class SimhashPack(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = if (arr.isNullAt(j)) 0L else arr.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }
  override def prettyName: String = "simhash_pack"
  override protected def withNewChildInternal(
      newChild: Expression): SimhashPack = copy(child = newChild)
}

/** `string → long`: the engine-neutral 60-bit md5-derived hash — the
  * [[graft.ops.DedupOps.md5Hash64]] chain (`conv(substring(md5(s), 1,
  * 15), 16, 10) :: long`) as one native step. The Column form rendered
  * the 16-byte digest to a 32-char hex string, substring'd it, ran a
  * base-16→base-10 STRING conversion and re-parsed the result as a
  * long — per shingle/token. The first 15 hex chars are the first
  * 7 bytes plus the high nibble of byte 8, so the value is computed
  * directly from the digest bytes; equality with the driver-side
  * [[graft.ops.DedupOps.md5Hash64Scala]] twin is spec-asserted.
  * NULL input → NULL (as md5(NULL) was).
  */
case class Md5Hash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val md = Md5Hash64.digest.get()
    md.reset()
    val d = md.digest(input.asInstanceOf[UTF8String].getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }
  override def prettyName: String = "md5_hash64"
  override protected def withNewChildInternal(
      newChild: Expression): Md5Hash64 = copy(child = newChild)
}

object Md5Hash64 {
  private val digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
}

/** `array<long> → array<long>`: the k per-seed MinHash minima over
  * already-computed shingle hashes — the
  * [[graft.ops.DedupOps.minhashSignature]] fold as one native loop.
  * Exact replication of the HOF form:
  *  - accumulator starts at `Long.MaxValue` per seed; per hash h (in
  *    array order) each seed takes `min(acc, mix(h, seed))`;
  *  - `consts` non-empty (the md5-derived per-seed constants) selects
  *    the NEUTRAL mixer: rotate h right by `seed` within the 60-bit
  *    space, XOR the constant — the same shift/mask/or sequence the
  *    Column expressions performed (arithmetic `>>` equals logical
  *    here: neutral hashes are non-negative);
  *  - `consts` empty selects the default mixer `xxhash64(h, seed)`,
  *    replicated through the exact [[XXH64]] chain the XxHash64
  *    expression evaluates: `hashInt(seed, hashLong(h, 42))` (h is a
  *    LONG column, the seed ordinal an INT — each hashed in child
  *    order);
  *  - NULL hash elements follow each mixer's own semantics: the
  *    neutral mixer propagates NULL, so `least(acc, NULL)` left the
  *    accumulator untouched (replicated by skipping); but Spark's
  *    hash functions SKIP null children, so `xxhash64(NULL, seed)`
  *    still produced `hashInt(seed, 42)` and competed in the minima —
  *    replicated by hashing from the bare 42 seed;
  *  - NULL input array → NULL; empty array → all-MaxValue signature
  *    (the fold's zero).
  */
case class MinhashMix(child: Expression, k: Int, consts: Seq[Long])
    extends UnaryExpression with ImplicitCastInputTypes
    with CodegenFallback {
  require(k >= 1 && k <= 60, s"minhash k=$k exceeds the 60-bit mixing space")
  require(consts.isEmpty || consts.length == k,
    "seed constants must be empty (xxhash mode) or k-long (neutral)")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val constArr: Array[Long] = consts.toArray
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    val neutral = constArr.length == k
    var j = 0
    while (j < n) {
      val hNull = arr.isNullAt(j)
      if (neutral) {
        if (!hNull) {
          val h = arr.getLong(j)
          var seed = 0
          while (seed < k) {
            val rot = (h >> seed) | ((h & ((1L << seed) - 1)) << (60 - seed))
            val v = rot ^ constArr(seed)
            if (v < acc(seed)) acc(seed) = v
            seed += 1
          }
        }
      } else {
        val h1 =
          if (hNull) 42L // hash functions skip null children
          else org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(arr.getLong(j), 42L)
        var seed = 0
        while (seed < k) {
          val v = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashInt(seed, h1)
          if (v < acc(seed)) acc(seed) = v
          seed += 1
        }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }
  override def prettyName: String = "minhash_mix"
  override protected def withNewChildInternal(
      newChild: Expression): MinhashMix = copy(child = newChild)
}

/** `(string, string) → long`: distinct char-n-gram Jaccard ×10⁶ — the
  * [[graft.ops.TextOps.ngramJaccardX1M]] lattice as one native pass.
  * Exact replication of the Catalyst form:
  *  - n-gram set of a text = its distinct length-n CHARACTER windows
  *    (`UTF8String.substringSQL`, the same method `Column.substr`
  *    evaluates); texts shorter than n chars — and NULL texts, whose
  *    `when(length ≥ n)` guard fell to the empty-array branch —
  *    contribute the empty set;
  *  - intersection/union counted over the sets (array_distinct /
  *    array_intersect sizes are set cardinalities; Spark string
  *    equality is byte equality, as is [[UTF8String]] hashing here);
  *  - result `floor((inter · 10⁶) / union)` with the same
  *    long→double division Spark's `/` performs, or 1,000,000 when the
  *    union is empty. Never NULL (matches the `when/otherwise` form).
  */
case class CharNgramJaccardX1M(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with ImplicitCastInputTypes
    with CodegenFallback {
  require(n >= 1, "n must be positive")
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private def ngramSet(v: Any): java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String]()
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val chars = s.numChars()
      var i = 1
      while (i <= chars - n + 1) {
        set.add(s.substringSQL(i, n))
        i += 1
      }
    }
    set
  }

  /** Open-addressed long set for the ASCII fast path — avoids one
    * UTF8String allocation per n-gram (the measured cost of the
    * general path).
    */
  private final class LongSet(expected: Int) {
    private var cap = java.lang.Integer.highestOneBit(
      math.max(16, expected * 2) * 2 - 1)
    private var keys = new Array[Long](cap)
    private var full = new Array[Boolean](cap)
    var size = 0
    private def idx(k: Long): Int =
      (((k * 0x9E3779B97F4A7C15L) >>> 40).toInt) & (cap - 1)
    def add(k: Long): Unit = {
      var i = idx(k)
      while (full(i)) {
        if (keys(i) == k) return
        i = (i + 1) & (cap - 1)
      }
      keys(i) = k; full(i) = true; size += 1
      if (size * 2 > cap) grow()
    }
    private def grow(): Unit = {
      val ok = keys; val of = full
      cap *= 2; keys = new Array[Long](cap); full = new Array[Boolean](cap)
      size = 0
      var i = 0
      while (i < ok.length) { if (of(i)) add(ok(i)); i += 1 }
    }
    def contains(k: Long): Boolean = {
      var i = idx(k)
      while (full(i)) {
        if (keys(i) == k) return true
        i = (i + 1) & (cap - 1)
      }
      false
    }
    def foreachKey(f: Long => Unit): Unit = {
      var i = 0
      while (i < cap) { if (full(i)) f(keys(i)); i += 1 }
    }
  }

  private def isAscii(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) { if (b(i) < 0) return false; i += 1 }
    true
  }

  /** Packed n-byte windows of an ASCII string (1 byte = 1 char, so
    * byte windows ARE the character n-grams, and distinct packed longs
    * biject onto distinct n-gram strings — identical set cardinalities
    * to the general path).
    */
  private def packedSet(b: Array[Byte]): LongSet = {
    val set = new LongSet(math.max(0, b.length - n + 1))
    var i = 0
    while (i <= b.length - n) {
      var k = 0L
      var j = 0
      while (j < n) { k = (k << 8) | (b(i + j) & 0xffL); j += 1 }
      set.add(k)
      i += 1
    }
    set
  }

  override def eval(input: InternalRow): Any = {
    val va = left.eval(input)
    val vb = right.eval(input)
    val ba = if (va == null) Array.emptyByteArray
      else va.asInstanceOf[UTF8String].getBytes
    val bb = if (vb == null) Array.emptyByteArray
      else vb.asInstanceOf[UTF8String].getBytes
    var interL = 0L
    var unionL = 0L
    if (n <= 8 && isAscii(ba) && isAscii(bb)) {
      val sa = packedSet(ba)
      val sb = packedSet(bb)
      val (small, big) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
      var inter = 0L
      small.foreachKey(k => if (big.contains(k)) inter += 1)
      interL = inter
      unionL = sa.size.toLong + sb.size.toLong - inter
    } else {
      val sa = ngramSet(va)
      val sb = ngramSet(vb)
      val (small, big) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
      var inter = 0L
      val it = small.iterator()
      while (it.hasNext) if (big.contains(it.next())) inter += 1
      interL = inter
      unionL = sa.size.toLong + sb.size.toLong - inter
    }
    if (unionL > 0)
      math.floor((interL * 1000000L).toDouble / unionL.toDouble).toLong
    else 1000000L
  }
  override def prettyName: String = "ngram_jaccard_x1m"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharNgramJaccardX1M =
    copy(left = newLeft, right = newRight)
}
