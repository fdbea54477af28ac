package graft.exprs

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ops.{DedupOps, SimilarityOps, TextOps}

/** Round-8 native-expression equivalence fences: each optimization
  * replaced an interpreted Catalyst-HOF lattice with a native
  * expression that must be BIT-IDENTICAL (the oracle hashes depend on
  * it). Every test reconstructs the ORIGINAL Column form inline and
  * compares it value-for-value against the shipped native path over
  * inputs that exercise the edge semantics (NULLs, length mismatches,
  * empty arrays, non-ASCII text).
  */
class NativeExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The pre-round-8 HOF dot fold, verbatim. */
  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("vec_dot ≡ the HOF fold: values, NULL element, length mismatch, empty") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Seq[Option[Float]], Seq[Option[Float]])] =
      (0 until 50).map { i =>
        val n = 1 + rnd.nextInt(80)
        val m = if (i % 7 == 0) n + 1 else n // some length mismatches
        def vec(len: Int) = (0 until len).map { j =>
          if (i % 11 == 0 && j == len / 2) None // some NULL elements
          else Some(rnd.nextFloat() * 2 - 1)
        }
        (vec(n), vec(m))
      } :+ ((Seq.empty[Option[Float]], Seq.empty[Option[Float]]))
    val df = rows.toDF("a", "b")
      .select(hofDot(col("a"), col("b")).as("hof"),
        call_function("vec_dot", col("a"), col("b")).as("native"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          s"bits differ: $r")
    }
  }

  test("md5_hash64 ≡ conv(substring(md5, 1, 15), 16, 10) and the Scala twin") {
    val inputs = Seq("", "a", "hello world", "shingle one two",
      "ünïcôde Ω snow☃", "tab\tand\nnewline", "0", " ")
    val df = inputs.toDF("s").select(col("s"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("old"),
      call_function("md5_hash64", col("s")).as("native"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"md5_hash64 differs for '${r.getString(0)}'")
      assert(r.getLong(2) == DedupOps.md5Hash64Scala(r.getString(0)),
        s"driver twin differs for '${r.getString(0)}'")
    }
    // NULL propagates
    val n = Seq(Option.empty[String]).toDF("s")
      .select(call_function("md5_hash64", col("s"))).head()
    assert(n.isNullAt(0))
  }

  /** The pre-round-8 simhash vote/pack fold, verbatim. */
  private def hofSimhash(hashes: org.apache.spark.sql.Column) = {
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) =>
        zip_with(acc, sequence(lit(0), lit(63)), (a, i) =>
          a + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1)
            .otherwise(-1)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  test("simhash_pack ≡ the HOF vote/pack fold (negatives, NULL element, empty)") {
    val rnd = new scala.util.Random(13)
    val rows: Seq[Seq[Option[Long]]] = (0 until 30).map { i =>
      (0 until 1 + rnd.nextInt(40)).map { j =>
        if (i % 5 == 0 && j == 0) None else Some(rnd.nextLong())
      }
    } :+ Seq.empty[Option[Long]]
    val df = rows.toDF("hs").select(
      hofSimhash(col("hs")).as("hof"),
      call_function("simhash_pack", col("hs")).as("native"))
    df.collect().foreach(r =>
      assert(r.getLong(0) == r.getLong(1), s"simhash differs: $r"))
  }

  /** The pre-round-8 minhash k-minima fold, verbatim (both mixers). */
  private def hofMinhash(hashes: org.apache.spark.sql.Column, k: Int,
      neutral: Boolean) = {
    val seedConsts = typedlit(
      (0 until k).map(s => DedupOps.md5Hash64Scala(s"seed:$s")))
    def rotXorMix(h: org.apache.spark.sql.Column,
        seed: org.apache.spark.sql.Column,
        c: org.apache.spark.sql.Column) = {
      val rot = call_function("shiftright", h, seed)
        .bitwiseOR(call_function("shiftleft",
          h.bitwiseAND(call_function("shiftleft", lit(1L), seed) - 1),
          lit(60) - seed))
      rot.bitwiseXOR(c)
    }
    aggregate(
      hashes,
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(k - 1)), (a, seed) =>
        least(a,
          if (neutral) rotXorMix(h, seed, element_at(seedConsts, seed + 1))
          else xxhash64(h, seed))))
  }

  test("minhash_mix ≡ the HOF k-minima fold, neutral AND xxhash modes") {
    val rnd = new scala.util.Random(29)
    val rows: Seq[Seq[Option[Long]]] = (0 until 25).map { i =>
      (0 until 1 + rnd.nextInt(30)).map { j =>
        if (i % 6 == 0 && j == 1) None
        // neutral hashes live in [0, 2^60); xxhash mode gets full range
        else Some(rnd.nextLong() & ((1L << 60) - 1))
      }
    } :+ Seq.empty[Option[Long]]
    Seq(true, false).foreach { neutral =>
      val consts =
        if (neutral)
          typedlit((0 until 16).map(s => DedupOps.md5Hash64Scala(s"seed:$s")))
        else lit(null).cast("array<long>")
      val df = rows.toDF("hs").select(
        hofMinhash(col("hs"), 16, neutral).as("hof"),
        call_function("minhash_mix", col("hs"), lit(16), consts).as("native"))
      df.collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"minhash (neutral=$neutral) differs: $r")
      }
    }
  }

  /** The pre-round-8 Catalyst n-gram Jaccard, verbatim. */
  private def hofJaccard(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, n: Int) = {
    def charNgrams(text: org.apache.spark.sql.Column) =
      when(length(text) >= n,
        array_distinct(transform(
          sequence(lit(1), length(text) - lit(n - 1)),
          i => text.substr(i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    val ga = charNgrams(a)
    val gb = charNgrams(b)
    val inter = size(array_intersect(ga, gb)).cast("long")
    val union = (size(ga) + size(gb)).cast("long") - inter
    when(union > 0, floor(inter * lit(1000000L) / union).cast("long"))
      .otherwise(lit(1000000L))
  }

  test("ngram_jaccard_x1m ≡ the Catalyst lattice (ASCII fast path, unicode fallback, NULL, short)") {
    val rows = Seq(
      ("the quick brown fox jumps", "the quick brown dog jumps"),
      ("identical text here", "identical text here"),
      ("completely different", "nothing shared at all zzz"),
      ("ab", "abc"), // below/at the n boundary
      ("", ""),
      ("ünïcôde test Ωmega snow☃ path", "ünïcôde test Ωmega rain path"),
      ("mixed ünïcôde vs ascii", "plain ascii only here"),
      (null, "non-null side"),
      (null, null),
      ("aaaaaaa", "aaaa"))
    val df = rows.toDF("a", "b").select(
      hofJaccard(col("a"), col("b"), 3).as("hof"),
      TextOps.ngramJaccardX1M(col("a"), col("b"), 3).as("native"))
    df.collect().foreach(r =>
      assert(r.getLong(0) == r.getLong(1), s"jaccard differs: $r"))
  }

  test("cosine over vec_dot is codegen'd end to end (no HOF fallback in the projection)") {
    // spark.range keeps a real Project (a local Seq would constant-fold
    // to LocalTableScan and hide the expression)
    val df = spark.range(4).select(
      transform(sequence(lit(1), lit(8)),
        i => (i + col("id")).cast("float")).as("v"))
    val scored = df.select(
      round(SimilarityOps.cosine(col("v"),
        typedlit((1 to 8).map(_.toDouble))), 6).as("c"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("vec_dot"), s"plan lost vec_dot:\n$plan")
    assert(!plan.contains("aggregate(zip_with"), s"HOF dot resurfaced:\n$plan")
    scored.collect()
  }
}
