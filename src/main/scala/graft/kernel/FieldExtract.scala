package graft.kernel

import java.util.regex.Pattern
import graft.model.{Address, Invoice, InvoiceItem, Vendor}

/** Invoice field extraction — semantics mirror the reference's regex
  * cascade (reference app/utils/data_extractor.py:374-483), including
  * its two verified quirks:
  *   - invoice-number pattern 3 (`inv[:\s]*`) can capture "-12345" out
  *     of "INV-12345" when patterns 1-2 miss (data_extractor.py:378);
  *   - the `total` regex matches inside "Subtotal", so when subtotal
  *     precedes total in the text, final_total = subtotal value
  *     (data_extractor.py:440-442).
  * All functions are pure Scala (no Spark dependency) so they unit-test
  * standalone and run inside the typed mapPartitions kernel stage.
  */
object FieldExtract {

  private val invoiceNumberPatterns: Seq[Pattern] = Seq(
    "(?i)invoice\\s*number?[:\\s]*([A-Za-z0-9-]{5,})",
    "(?i)invoice\\s*#[:\\s]*([A-Za-z0-9-]{5,})",
    "(?i)inv[:\\s]*([A-Za-z0-9-]{5,})"
  ).map(Pattern.compile)

  /** First match of the ordered pattern list (data_extractor.py:374-384). */
  def extractInvoiceNumber(text: String): Option[String] = {
    invoiceNumberPatterns.iterator.flatMap { p =>
      val m = p.matcher(text)
      if (m.find()) Some(m.group(1)) else None
    }.nextOption()
  }

  /** line 0 = vendor name; lines 1..3 = address text
    * (data_extractor.py:386-397). Python str.split('\n') on "" yields
    * [""] so name = "" for empty text — same here.
    */
  def extractVendor(text: String): Vendor = {
    val lines = text.split("\n", -1)
    val name = if (lines.nonEmpty) lines(0) else ""
    val addressText =
      if (lines.length > 1) lines.slice(1, 4).mkString("\n") else ""
    Vendor(name = name, address = extractAddress(addressText))
  }

  private val postalPattern = Pattern.compile("\\b\\d{5}(?:-\\d{4})?\\b")
  private val cityStatePattern = Pattern.compile("([A-Za-z\\s]+),\\s*([A-Z]{2})")

  /** street = line 0; postal + city/state from line 1; country always ""
    * (data_extractor.py:399-425).
    */
  def extractAddress(text: String): Address = {
    val lines = text.split("\n", -1)
    val street = if (lines.nonEmpty) lines(0) else ""
    var city = ""; var state = ""; var postal = ""
    if (lines.length > 1) {
      val line = lines(1)
      val pm = postalPattern.matcher(line)
      if (pm.find()) postal = pm.group(0)
      val cs = cityStatePattern.matcher(line)
      if (cs.find()) { city = cs.group(1).trim; state = cs.group(2) }
    }
    Address(street = street, city = city, state = state, country = "",
      postal_code = postal)
  }

  private val subtotalPattern =
    Pattern.compile("(?i)subtotal[:\\s]*\\$?([\\d,]+\\.\\d{2})")
  private val taxPattern =
    Pattern.compile("(?i)tax[:\\s]*\\$?([\\d,]+\\.\\d{2})")
  private val totalPattern =
    Pattern.compile("(?i)total[:\\s]*\\$?([\\d,]+\\.\\d{2})")

  /** (grand_total, taxes, final_total) — first match each, with the
    * "total matches inside Subtotal" quirk preserved
    * (data_extractor.py:427-444).
    */
  def extractTotals(text: String)
      : (Option[BigDecimal], Option[BigDecimal], Option[BigDecimal]) = {
    def first(p: Pattern): Option[BigDecimal] = {
      val m = p.matcher(text)
      if (m.find()) parseDecimal(m.group(1)) else None
    }
    (first(subtotalPattern), first(taxPattern), first(totalPattern))
  }

  private val nonDecimalChars = Pattern.compile("[^\\d.-]")

  /** strip `[^\d.-]` then parse (data_extractor.py:470-483). The
    * reference's price_parser fallback is unreachable for our fixtures
    * (post-regex captures are always parseable) — on failure: None.
    */
  def parseDecimal(s: String): Option[BigDecimal] = {
    if (s == null || s.trim.isEmpty) None
    else {
      val cleaned = nonDecimalChars.matcher(s).replaceAll("")
      try Some(BigDecimal(cleaned)) catch { case _: NumberFormatException => None }
    }
  }

  /** GCV-path items: skip the header row (`table[1:]`), row arity ≥ 4,
    * per-row parse errors skip the row (data_extractor.py:446-468).
    */
  def extractItems(tables: Seq[Seq[Seq[String]]]): Seq[InvoiceItem] =
    extractItemRows(tables.flatMap(t => if (t.length > 1) t.tail else Nil))

  /** DocAI-path items: does NOT skip the header row — a distinct
    * behaviour kept deliberately (data_extractor.py:318-333).
    */
  def extractItemsDocai(tables: Seq[Seq[Seq[String]]]): Seq[InvoiceItem] =
    extractItemRows(tables.flatten)

  private def extractItemRows(rows: Seq[Seq[String]]): Seq[InvoiceItem] =
    rows.flatMap { row =>
      if (row.length >= 4) {
        try {
          Some(InvoiceItem(
            description = Some(row(0)),
            // trim before parse: Python int(' 3 ') accepts padded cells
            // (data_extractor.py:455); parseInt on the raw cell would
            // throw and drop the whole row
            quantity =
              if (row(1).trim.nonEmpty) Some(Integer.parseInt(row(1).trim)) else None,
            unit_price =
              if (row(2).trim.nonEmpty) parseDecimal(row(2)) else None,
            total =
              if (row(3).trim.nonEmpty) parseDecimal(row(3)) else None))
        } catch { case _: NumberFormatException => None }
      } else None
    }

  /** The DocAI-validity gate P2 (data_extractor.py:270-274): accept the
    * entity-path invoice iff any headline field is present.
    */
  def isInvoiceValid(inv: Invoice): Boolean =
    inv.invoice_number.exists(_.nonEmpty) ||
      inv.vendor.name.nonEmpty ||
      inv.invoice_date.isDefined ||
      inv.grand_total.isDefined

  /** The reference's only mutating model validator: a future
    * invoice_date is silently clamped to today (models.py:51-55; the
    * engine pins "today" to `asOf` for determinism). Applied at Invoice
    * construction on BOTH extraction paths, exactly like the pydantic
    * validator — so downstream V5/P4 future-date checks never fire on
    * a clamped date.
    */
  def clampFutureDate(
      date: Option[String], asOf: java.time.LocalDate): Option[String] =
    date.map { s =>
      if (java.time.LocalDate.parse(s).isAfter(asOf)) asOf.toString else s
    }

  /** DocAI entity types the engine recognizes (data_extractor.py:276-345
    * reads exactly these keys from the entities map).
    */
  val DocAiEntityTypes: Set[String] = Set(
    "supplier_name", "supplier_address", "supplier_city", "supplier_state",
    "supplier_country", "supplier_zip", "invoice_id", "invoice_date",
    "total_amount", "total_tax_amount")

  /** F10/F16 — the local DocAI stand-in: a kv line (first-':' split,
    * ocr_engine.py:342-353) whose key is EXACTLY a DocAI entity type
    * becomes an entity. Human-format labels ("Invoice Date: ...") stay
    * layout kv-pairs, not entities — the cloud processor keys entities
    * by canonical snake_case types, never by display labels, so regular
    * invoice texts produce no entities and take the regex path (the
    * reference's GCV fallback). Last occurrence wins (dict semantics).
    */
  def entitiesFromText(text: String): Map[String, String] =
    text.split("\n").iterator.flatMap { line =>
      val i = line.indexOf(':')
      if (i > 0) {
        val k = line.substring(0, i).trim
        if (DocAiEntityTypes(k)) Some(k -> line.substring(i + 1).trim)
        else None
      } else None
    }.toMap

  /** Entity-map path (data_extractor.py:276-345). Note total_amount maps
    * to BOTH grand_total and final_total (kept); invoice_date must be
    * strict `%Y-%m-%d`; pages is hardcoded 1 exactly like
    * `_extract_from_docai` (data_extractor.py:341 — only the GCV path
    * carries `ocr_result['num_pages']`).
    */
  def extractFromEntities(
      entities: Map[String, String],
      tables: Seq[Seq[Seq[String]]],
      filename: String,
      asOf: java.time.LocalDate = DateExtract.DefaultAsOf): Invoice = {
    val vendor = Vendor(
      name = entities.getOrElse("supplier_name", ""),
      address = Address(
        street = entities.getOrElse("supplier_address", ""),
        city = entities.getOrElse("supplier_city", ""),
        state = entities.getOrElse("supplier_state", ""),
        country = entities.getOrElse("supplier_country", ""),
        postal_code = entities.getOrElse("supplier_zip", "")))
    val invoiceDate = entities.get("invoice_date").flatMap { s =>
      if (s.matches("\\d{4}-\\d{2}-\\d{2}")) {
        try {
          java.time.LocalDate.parse(s); Some(s)
        } catch { case _: java.time.format.DateTimeParseException => None }
      } else None
    }
    Invoice(
      filename = filename,
      invoice_number = entities.get("invoice_id").orElse(Some("")),
      vendor = vendor,
      invoice_date = clampFutureDate(invoiceDate, asOf),
      grand_total = entities.get("total_amount").flatMap(parseDecimal),
      taxes = entities.get("total_tax_amount").flatMap(parseDecimal),
      final_total = entities.get("total_amount").flatMap(parseDecimal),
      items = extractItemsDocai(tables),
      pages = 1)
  }

  /** GCV/regex path (data_extractor.py:347-372), date handled by
    * [[DateExtract]].
    */
  def extractFromText(
      text: String,
      filename: String,
      tables: Seq[Seq[Seq[String]]] = Nil,
      numPages: Int = 1,
      asOf: java.time.LocalDate = DateExtract.DefaultAsOf): Invoice = {
    val (grand, taxes, fin) = extractTotals(text)
    Invoice(
      filename = filename,
      invoice_number = extractInvoiceNumber(text),
      vendor = extractVendor(text),
      invoice_date = clampFutureDate(
        DateExtract.extractDate(text, asOf = asOf).map(_.toString), asOf),
      grand_total = grand,
      taxes = taxes,
      final_total = fin,
      items = extractItems(tables),
      pages = numPages)
  }
}
