package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Columnar twins of the extraction kernel's SQL-expressible functions
  * (SURVEY.md §2.5 F1-F5, F8) — pure Catalyst expressions so they
  * whole-stage-codegen and can be oracle-checked against DuckDB.
  * Semantics mirror graft.kernel.FieldExtract exactly (same patterns,
  * same ordered-cascade and first-match-wins behaviour, including the
  * documented quirks).
  *
  * ANSI note: Spark 4 runs with spark.sql.ansi.enabled=true — every
  * cast here is a try_cast so unparseable values yield NULL (the
  * reference's permissive None semantics), never an exception.
  */
object InvoiceExprs {

  /** F1 — ordered 3-pattern cascade, first match wins, null if none. */
  def invoiceNumber(text: Column): Column = {
    val patterns = Seq(
      "(?i)invoice\\s*number?[:\\s]*([A-Za-z0-9-]{5,})",
      "(?i)invoice\\s*#[:\\s]*([A-Za-z0-9-]{5,})",
      "(?i)inv[:\\s]*([A-Za-z0-9-]{5,})")
    coalesce(patterns.map(p => nullif(regexp_extract(text, p, 1), lit(""))): _*)
  }

  /** ANSI-safe string→decimal(18,2): cast only behind a validity-regex
    * guard (branch-not-taken is never evaluated), so malformed input
    * yields NULL instead of an ANSI exception, and the bounded digit
    * count makes overflow impossible.
    */
  def safeDecimal(c: Column): Column =
    when(c.rlike("^-?\\d{1,15}(\\.\\d{1,6})?$"),
      c.cast(org.apache.spark.sql.types.DecimalType(18, 2)))

  /** F3 — strip `[^\d.-]`, parse as decimal(18,2), null on failure. */
  def parseDecimal(s: Column): Column =
    safeDecimal(nullif(regexp_replace(s, "[^0-9.-]", ""), lit("")))

  private val money = "([\\d,]+\\.\\d{2})"

  private def firstAmount(text: Column, keyword: String): Column = {
    val captured = nullif(
      regexp_extract(text, s"(?i)$keyword[:\\s]*\\$$?$money", 1), lit(""))
    safeDecimal(regexp_replace(captured, ",", ""))
  }

  /** F2 — grand_total from `subtotal`, taxes from `tax`, final_total
    * from `total` (which matches inside "Subtotal" — quirk preserved:
    * regexp_extract returns the leftmost match).
    */
  def grandTotal(text: Column): Column = firstAmount(text, "subtotal")
  def taxes(text: Column): Column = firstAmount(text, "tax")
  def finalTotal(text: Column): Column = firstAmount(text, "total")

  private def line(text: Column, i: Int): Column =
    get(split(text, "\n"), lit(i)) // 0-based, null out-of-bounds (ANSI-safe)

  /** F4 — vendor name = line 0. */
  def vendorName(text: Column): Column = coalesce(line(text, 0), lit(""))

  /** F4/F5 — street = line 1 of the doc text (line 0 of address text). */
  def street(text: Column): Column = coalesce(line(text, 1), lit(""))

  /** F5 — postal code from line 2 (zip or zip+4). */
  def postalCode(text: Column): Column =
    regexp_extract(coalesce(line(text, 2), lit("")), "\\b\\d{5}(?:-\\d{4})?\\b", 0)

  /** F5 — city/state from `City, ST` in line 2. */
  def city(text: Column): Column =
    trim(regexp_extract(coalesce(line(text, 2), lit("")), "([A-Za-z\\s]+),\\s*([A-Z]{2})", 1))

  def state(text: Column): Column =
    regexp_extract(coalesce(line(text, 2), lit("")), "([A-Za-z\\s]+),\\s*([A-Z]{2})", 2)

  /** SQL-expressible slice of the date cascade (ISO + 8-digit YYYYMMDD);
    * the full keyword-proximity cascade lives in kernel.DateExtract.
    */
  def dateSqlSubset(text: Column): Column = {
    val iso = nullif(regexp_extract(text, "\\b(\\d{4}-\\d{2}-\\d{2})\\b", 1), lit(""))
    val eight = nullif(regexp_extract(text, "\\b(\\d{8})\\b", 1), lit(""))
    coalesce(
      try_to_timestamp(iso, lit("yyyy-MM-dd")).cast("date"),
      try_to_timestamp(eight, lit("yyyyMMdd")).cast("date"))
  }

  /** S3 — extension → MIME fallback map (when(...) chain). */
  def mimeFromExtension(filename: Column): Column = {
    val lower_ = lower(filename)
    when(lower_.endsWith(".pdf"), "application/pdf")
      .when(lower_.endsWith(".jpg") || lower_.endsWith(".jpeg"), "image/jpeg")
      .when(lower_.endsWith(".png"), "image/png")
      .when(lower_.endsWith(".zip"), "application/zip")
      .otherwise("application/octet-stream")
  }

  /** P1 — allowed-type predicate. */
  def isAllowedMime(mime: Column): Column =
    mime.isin("application/pdf", "image/jpeg", "image/png", "application/zip")
}
