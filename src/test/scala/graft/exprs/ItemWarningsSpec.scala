package graft.exprs

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** V9 — per-item validation warnings, message-exact vs the reference
  * (app/utils/validator.py:110-132).
  */
case class Item(
    description: Option[String], quantity: Option[Int],
    unit_price: Option[BigDecimal], total: Option[BigDecimal])

class ItemWarningsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def warningsOf(items: Seq[Item]): String = {
    import spark.implicits._
    Seq(Tuple1(items)).toDF("items")
      .select(ValidationExprs.itemWarnings(col("items")).as("w"))
      .head().getString(0)
  }

  test("empty items -> no-items warning only") {
    assert(warningsOf(Nil) == "No line items found in the invoice")
  }

  test("clean item -> no warnings") {
    assert(warningsOf(Seq(Item(Some("Widget"), Some(2),
      Some(BigDecimal("3.50")), Some(BigDecimal("7.00"))))) == "")
  }

  test("all checks fire with 1-based index") {
    val w = warningsOf(Seq(
      Item(Some("ok"), Some(1), Some(BigDecimal("1.00")), Some(BigDecimal("1.00"))),
      Item(Some(""), Some(0), Some(BigDecimal("-1.00")), None)))
    assert(w == Seq(
      "Item 2: Description is missing",
      "Item 2: Unusual quantity",
      "Item 2: Unusual unit price",
      "Item 2: Total is missing").mkString("|"), w)
  }

  test("qty*price tolerance boundary at 0.01 (strict >)") {
    def mk(total: String) = Seq(Item(Some("x"), Some(3),
      Some(BigDecimal("1.10")), Some(BigDecimal(total))))
    assert(warningsOf(mk("3.30")) == "")
    assert(warningsOf(mk("3.31")) == "") // |3.30-3.31| = 0.01, not > 0.01
    assert(warningsOf(mk("3.32")) ==
      "Item 1: Total may not match quantity * unit price")
  }
}
