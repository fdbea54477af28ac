package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The warnings engine (SURVEY.md §2.6 V1-V10) and anomaly predicates
  * (P4) as pure Column expressions. Warning messages mirror the
  * reference verbatim (app/utils/validator.py:42-132, 151-172); each
  * check yields NULL when it passes, a message when it fires, and the
  * per-invoice warning list is a concat_ws over the pieces (concat_ws
  * skips NULLs — identical semantics in DuckDB for the oracle twins).
  */
object ValidationExprs {

  private def blank(c: Column): Column = c.isNull || trim(c) === ""

  /** V1 */
  def filenameWarning(filename: Column): Column =
    when(blank(filename), "Filename is missing")

  /** V2 */
  def invoiceNumberWarning(num: Column): Column =
    when(blank(num), "Invoice number is missing")
      .when(!num.rlike("^[A-Za-z0-9-]{5,}$"),
        concat(lit("Unusual invoice number format: "), num))

  /** V3 */
  def vendorNameWarning(name: Column): Column =
    when(blank(name), "Vendor name is missing")

  /** V4 — five presence checks. */
  def addressWarnings(street: Column, city: Column, state: Column,
      postal: Column, country: Column): Seq[Column] = Seq(
    when(blank(street), "Vendor street is missing"),
    when(blank(city), "Vendor city is missing"),
    when(blank(state), "Vendor state is missing"),
    when(blank(postal), "Vendor postal code is missing"),
    when(blank(country), "Vendor country is missing"))

  /** V5 — `asOf` pins date.today() (reference validator.py:83). */
  def dateWarning(date: Column, asOf: Column): Column =
    when(date.isNull, "Invoice date is missing")
      .when(date > asOf,
        concat(lit("Invoice date "), date.cast("string"), lit(" is in the future")))

  /** V6 — applied to grand/taxes/final with their display names. */
  def amountWarning(amount: Column, fieldName: String): Column =
    when(amount.isNull, s"$fieldName is missing")
      .when(amount < 0, s"$fieldName is negative")

  /** V7 — |grand+taxes−final| > 0.01 (tolerance boundary inclusive-ok). */
  def totalsWarning(grand: Column, taxes: Column, fin: Column): Column =
    when(grand.isNotNull && taxes.isNotNull && fin.isNotNull &&
      abs(grand + taxes - fin) > lit("0.01").cast("decimal(18,2)"),
      concat(lit("Total amounts may not match: "), grand.cast("string"),
        lit(" + "), taxes.cast("string"), lit(" ≈ "), fin.cast("string")))

  /** V8 */
  def pagesWarning(pages: Column): Column =
    when(pages.isNull, "Number of pages is missing")
      .when(pages < 1, concat(lit("Unusual number of pages: "), pages.cast("string")))

  /** V10 — flat warning list as a '|'-joined string (NULL-skipping). */
  def allWarnings(filename: Column, num: Column, vendorName: Column,
      street: Column, city: Column, state: Column, postal: Column,
      country: Column, date: Column, asOf: Column, grand: Column,
      taxes: Column, fin: Column, pages: Column): Column = {
    val pieces = Seq(
      filenameWarning(filename),
      invoiceNumberWarning(num),
      vendorNameWarning(vendorName)) ++
      addressWarnings(street, city, state, postal, country) ++ Seq(
      dateWarning(date, asOf),
      amountWarning(grand, "Grand total"),
      amountWarning(taxes, "Taxes"),
      amountWarning(fin, "Final total"),
      totalsWarning(grand, taxes, fin),
      pagesWarning(pages))
    concat_ws("|", pieces: _*)
  }

  /** V10 — categorized warnings as `map<string, array<string>>`,
    * mirroring the reference's per-category dict exactly
    * (validator.py:17-33): keys are the ten category names in the
    * reference's insertion order; each value is that category's
    * (possibly empty) warning list. `vendor` carries both the name and
    * the five address checks, as in `_validate_vendor`.
    */
  def categorizedWarnings(filename: Column, num: Column, vendorName: Column,
      street: Column, city: Column, state: Column, postal: Column,
      country: Column, date: Column, asOf: Column, grand: Column,
      taxes: Column, fin: Column, pages: Column, items: Column): Column = {
    def cat(ws: Seq[Column]): Column = array_compact(array(ws: _*))
    map_from_arrays(
      array(CategoryOrder.map(lit): _*),
      array(
        cat(Seq(filenameWarning(filename))),
        cat(Seq(invoiceNumberWarning(num))),
        cat(vendorNameWarning(vendorName) +:
          addressWarnings(street, city, state, postal, country)),
        cat(Seq(dateWarning(date, asOf))),
        cat(Seq(amountWarning(grand, "Grand total"))),
        cat(Seq(amountWarning(taxes, "Taxes"))),
        cat(Seq(amountWarning(fin, "Final total"))),
        cat(Seq(totalsWarning(grand, taxes, fin))),
        cat(Seq(pagesWarning(pages))),
        itemWarningsArray(items)))
  }

  /** The reference's category keys, insertion order (validator.py:17-30). */
  val CategoryOrder: Seq[String] = Seq(
    "filename", "invoice_number", "vendor", "invoice_date", "grand_total",
    "taxes", "final_total", "totals", "pages", "items")

  /** V9 — per-item checks over an
    * `items: array<struct<description,quantity,unit_price,total>>`
    * column (reference validator.py:110-132): presence + positivity per
    * field, and |round(qty*price, 2) − total| > 0.01. Messages are
    * 1-based-indexed like the reference; result is the '|'-joined list
    * prefixed by the no-items warning when the array is empty.
    */
  def itemWarnings(items: Column): Column =
    array_join(itemWarningsArray(items), "|")

  /** V9 as the raw warning array (feeds both the flat '|'-join and the
    * categorized map's `items` entry).
    */
  def itemWarningsArray(items: Column): Column = {
    val perItemRaw = flatten(zip_with(
      items,
      sequence(lit(1), greatest(size(items), lit(1))),
      (item, idx) => {
        val i = idx.cast("string")
        val qty = item.getField("quantity")
        val price = item.getField("unit_price")
        val total = item.getField("total")
        array(
          when(blank(item.getField("description")),
            concat(lit("Item "), i, lit(": Description is missing"))),
          when(qty.isNull, concat(lit("Item "), i, lit(": Quantity is missing")))
            .when(qty <= 0, concat(lit("Item "), i, lit(": Unusual quantity"))),
          when(price.isNull, concat(lit("Item "), i, lit(": Unit price is missing")))
            .when(price < 0, concat(lit("Item "), i, lit(": Unusual unit price"))),
          when(total.isNull, concat(lit("Item "), i, lit(": Total is missing")))
            .when(total < 0, concat(lit("Item "), i, lit(": Unusual total"))),
          when(qty.isNotNull && price.isNotNull && total.isNotNull &&
            abs(round(qty * price, 2) - total) > lit("0.01").cast("decimal(18,2)"),
            concat(lit("Item "), i, lit(": Total may not match quantity * unit price"))))
      }))
    // zip_with pads the empty-items case with a null item whose checks
    // would all fire — gate on size instead
    val perItem = when(size(items) > 0, perItemRaw)
      .otherwise(array().cast("array<string>"))
    val noItems = when(size(items) === 0 || items.isNull,
      array(lit("No line items found in the invoice")))
      .otherwise(array().cast("array<string>"))
    filter(concat(noItems, perItem), w => w.isNotNull)
  }

  /** P4 — anomaly flags (reference validator.py:151-172), '|'-joined;
    * empty string = not flagged.
    */
  def anomalyFlags(date: Column, asOf: Column, finalTotal: Column,
      itemCount: Column): Column = concat_ws("|",
    when(date.isNotNull && date > asOf, "Future date"),
    when(finalTotal.isNotNull && finalTotal > lit(10000), "Unusually high total amount"),
    when(itemCount.isNotNull && itemCount > lit(20), "Large number of line items"))
}
