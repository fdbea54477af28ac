package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class FieldExtractSpec extends AnyFunSuite {

  test("invoice number: ordered patterns, first wins") {
    assert(FieldExtract.extractInvoiceNumber("Invoice Number: INV-12345")
      .contains("INV-12345"))
    assert(FieldExtract.extractInvoiceNumber("invoice # ABC99")
      .contains("ABC99"))
    assert(FieldExtract.extractInvoiceNumber("no numbers here").isEmpty)
  }

  test("invoice number quirk: bare INV- captures the dash tail") {
    // pattern 3 `inv[:\s]*` matches inside "INV-12345" when patterns 1-2
    // miss — reference data_extractor.py:378 behaviour, kept on purpose.
    assert(FieldExtract.extractInvoiceNumber("INV-12345 thanks")
      .contains("-12345"))
  }

  test("invoice number: min 5 chars") {
    assert(FieldExtract.extractInvoiceNumber("Invoice Number: AB12").isEmpty)
  }

  test("totals: subtotal/tax/total with $ and commas") {
    val t = "Subtotal: $1,234.50\nTax: $123.45\nGrand sum 10.00"
    val (g, tax, f) = FieldExtract.extractTotals(t)
    assert(g.contains(BigDecimal("1234.50")))
    assert(tax.contains(BigDecimal("123.45")))
    // quirk: `total` matches inside "Subtotal" first
    assert(f.contains(BigDecimal("1234.50")))
  }

  test("totals quirk: total-before-subtotal text gives distinct totals") {
    val t = "Total: $99.00\nSubtotal: $90.00\nTax: $9.00"
    val (g, tax, f) = FieldExtract.extractTotals(t)
    assert(g.contains(BigDecimal("90.00")))
    assert(tax.contains(BigDecimal("9.00")))
    assert(f.contains(BigDecimal("99.00")))
  }

  test("parse decimal strips currency junk") {
    assert(FieldExtract.parseDecimal("$1,234.56").contains(BigDecimal("1234.56")))
    assert(FieldExtract.parseDecimal("  ").isEmpty)
    assert(FieldExtract.parseDecimal("abc").isEmpty)
    assert(FieldExtract.parseDecimal("-12.00").contains(BigDecimal("-12.00")))
  }

  test("vendor: first line name, lines 1..3 address") {
    val v = FieldExtract.extractVendor(
      "Acme Corp\n12 Main St\nSpringfield, IL 62704\nUSA")
    assert(v.name == "Acme Corp")
    assert(v.address.street == "12 Main St")
    assert(v.address.city == "Springfield")
    assert(v.address.state == "IL")
    assert(v.address.postal_code == "62704")
    assert(v.address.country == "") // always "" — data_extractor.py:422
  }

  test("address: zip+4 and missing city") {
    val a = FieldExtract.extractAddress("1 Elm Rd\n99999-1234")
    assert(a.postal_code == "99999-1234")
    assert(a.city == "" && a.state == "")
  }

  test("items: GCV path skips header row; short rows skipped") {
    val tables = Seq(Seq(
      Seq("desc", "qty", "unit", "total"),
      Seq("Widget", "2", "3.50", "7.00"),
      Seq("tooshort"),
      Seq("Gadget", "x", "1.00", "1.00") // int("x") throws -> row skipped
    ))
    val items = FieldExtract.extractItems(tables)
    assert(items.length == 1)
    assert(items.head.description.contains("Widget"))
    assert(items.head.quantity.contains(2))
    assert(items.head.unit_price.contains(BigDecimal("3.50")))
  }

  test("items: DocAI path does NOT skip header row") {
    val tables = Seq(Seq(
      Seq("Widget", "2", "3.50", "7.00"),
      Seq("Gadget", "1", "1.00", "1.00")))
    assert(FieldExtract.extractItemsDocai(tables).length == 2)
  }

  test("docai validity gate") {
    val empty = FieldExtract.extractFromEntities(Map.empty, Nil, "f.pdf")
    assert(!FieldExtract.isInvoiceValid(empty))
    val withNum = FieldExtract.extractFromEntities(
      Map("invoice_id" -> "INV-1"), Nil, "f.pdf")
    assert(FieldExtract.isInvoiceValid(withNum))
  }

  test("entities: total_amount maps to both grand and final total") {
    val inv = FieldExtract.extractFromEntities(
      Map("total_amount" -> "$150.00", "invoice_date" -> "2024-03-05"),
      Nil, "f.pdf")
    assert(inv.grand_total.contains(BigDecimal("150.00")))
    assert(inv.final_total.contains(BigDecimal("150.00")))
    assert(inv.invoice_date.contains("2024-03-05"))
  }

  test("entities: bad strict date dropped") {
    val inv = FieldExtract.extractFromEntities(
      Map("invoice_date" -> "03/05/2024", "invoice_id" -> "INV-1"), Nil, "f")
    assert(inv.invoice_date.isEmpty)
  }

  test("future invoice_date clamps to asOf on BOTH paths (models.py:51-55)") {
    val asOf = java.time.LocalDate.of(2025, 4, 18)
    // regex path: explicit future ISO date in text
    val futText = "Acme\nInvoice Date: 2026-01-15\nSubtotal: $10.00"
    val viaText = FieldExtract.extractFromText(futText, "f", asOf = asOf)
    assert(viaText.invoice_date.contains("2025-04-18"))
    // entity path
    val viaEnt = FieldExtract.extractFromEntities(
      Map("invoice_id" -> "INV-1", "invoice_date" -> "2026-01-15"),
      Nil, "f", asOf = asOf)
    assert(viaEnt.invoice_date.contains("2025-04-18"))
    // past dates pass through untouched; boundary (== asOf) not clamped
    assert(FieldExtract.clampFutureDate(Some("2024-01-01"), asOf)
      .contains("2024-01-01"))
    assert(FieldExtract.clampFutureDate(Some("2025-04-18"), asOf)
      .contains("2025-04-18"))
    assert(FieldExtract.clampFutureDate(None, asOf).isEmpty)
  }

  test("clamped date no longer trips the V5/P4 future checks") {
    val asOf = java.time.LocalDate.of(2025, 4, 18)
    val inv = FieldExtract.extractFromText(
      "Acme\nInvoice Date: 2026-01-15\nTotal: $5.00", "f", asOf = asOf)
    // the date the validators see is the clamped one
    assert(inv.invoice_date.exists(d =>
      !java.time.LocalDate.parse(d).isAfter(asOf)))
  }

  test("items: whitespace-padded quantity cells parse like Python int()") {
    val tables = Seq(Seq(
      Seq("h", "h", "h", "h"),
      Seq("Widget", " 3 ", "2.00", "6.00")))
    val items = FieldExtract.extractItems(tables)
    assert(items.length == 1 && items.head.quantity.contains(3))
  }

  test("entitiesFromText: exact snake_case DocAI keys only, last wins") {
    val ents = FieldExtract.entitiesFromText(
      "supplier_name: Acme\nInvoice Number: INV-1\nTax: $1.00\n" +
        "total_amount: 5.00\ntotal_amount: 7.00\nnot_an_entity: x")
    assert(ents == Map("supplier_name" -> "Acme", "total_amount" -> "7.00"))
    // a regular regex-style invoice yields NO entities (labels aren't types)
    assert(FieldExtract.entitiesFromText(
      "Acme Corp\nInvoice Number: INV-2\nSubtotal: $1.00").isEmpty)
  }

  test("full text path assembles an invoice") {
    val text = "Acme Corp\n12 Main St\nSpringfield, IL 62704\n" +
      "Invoice Number: INV-77777\nInvoice Date: 31/12/2024\n" +
      "Subtotal: $100.00\nTax: $10.00\nTotal: $110.00"
    val inv = FieldExtract.extractFromText(text, "a.pdf")
    assert(inv.invoice_number.contains("INV-77777"))
    assert(inv.vendor.name == "Acme Corp")
    assert(inv.invoice_date.contains("2024-12-31"))
    assert(inv.grand_total.contains(BigDecimal("100.00")))
    assert(inv.taxes.contains(BigDecimal("10.00")))
    // quirk: first `total` match is inside "Subtotal"
    assert(inv.final_total.contains(BigDecimal("100.00")))
  }
}
