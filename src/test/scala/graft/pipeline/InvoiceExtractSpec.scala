package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.exprs.ValidationExprs
import graft.fixtures.CorpusGen

/** Structured extraction vs golden_invoices: every golden row must be
  * reproduced field-for-field from the pipeline's extracted spans.
  */
class InvoiceExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_inv").toString
    CorpusGen.write(spark, d, CorpusGen.Params(nDocs = 250, seed = 7L))
    d
  }

  private lazy val extractedInvoices = {
    val out = ExtractionPipeline.extract(
      spark.read.parquet(s"$dir/docs"),
      spark.read.parquet(s"$dir/media"), partitions = 8)
    InvoiceExtract.fromSpans(out).toDF()
  }

  test("golden invoices reproduced field-for-field") {
    val golden = spark.read.parquet(s"$dir/golden_invoices")
    assert(golden.count() > 50, "fixture should contain invoices")
    val joined = golden.as("g").join(extractedInvoices.as("e"),
      col("g.filename") === col("e.filename"), "left")
    val mismatches = joined.filter(
      col("e.filename").isNull ||
        not(col("g.invoice_number") <=> col("e.invoice_number")) ||
        not(col("g.vendor_name") <=> col("e.vendor_name")) ||
        not(col("g.street") <=> col("e.street")) ||
        not(col("g.city") <=> col("e.city")) ||
        not(col("g.state") <=> col("e.state")) ||
        not(col("g.postal_code") <=> col("e.postal_code")) ||
        not(col("g.country") <=> col("e.country")) ||
        not(col("g.pages") <=> col("e.pages")) ||
        not(col("g.invoice_date") <=> coalesce(col("e.invoice_date"), lit(""))) ||
        not(col("g.grand_total").cast("decimal(18,2)") <=> col("e.grand_total")) ||
        not(col("g.taxes").cast("decimal(18,2)") <=> col("e.taxes")) ||
        not(col("g.final_total").cast("decimal(18,2)") <=> col("e.final_total")) ||
        not(size(col("g.items")) <=> size(col("e.items"))) ||
        not(transform(col("g.items"), it => struct(
          it.getField("_1").as("d"), it.getField("_2").as("q"),
          it.getField("_3").cast("decimal(18,2)").as("u"),
          it.getField("_4").cast("decimal(18,2)").as("t"))) <=>
          transform(col("e.items"), it => struct(
            it.getField("description").as("d"), it.getField("quantity").as("q"),
            it.getField("unit_price").cast("decimal(18,2)").as("u"),
            it.getField("total").cast("decimal(18,2)").as("t")))))
    val bad = mismatches.limit(5).collect()
    assert(bad.isEmpty, s"mismatching invoices:\n${bad.mkString("\n")}")
  }

  test("warnings engine over extracted invoices matches independent derivation") {
    val e = extractedInvoices
    val withWarnings = e.select(col("filename"),
      ValidationExprs.allWarnings(
        col("filename"), col("invoice_number"), col("vendor_name"),
        col("street"), col("city"), col("state"), col("postal_code"),
        col("country"), // "" on the regex path, supplier_country via DocAI
        to_date(col("invoice_date")), lit("2025-04-18").cast("date"),
        col("grand_total"), col("taxes"), col("final_total"),
        col("pages")).as("warnings"))
    // independent oracle: derive expectations in plain Scala from goldens
    val golden = spark.read.parquet(s"$dir/golden_invoices").collect()
    val got = withWarnings.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    golden.foreach { g =>
      val filename = g.getString(0)
      val num = g.getString(1)
      val gVendor = g.getString(2); val gStreet = g.getString(3)
      val gCity = g.getString(4); val gState = g.getString(5)
      val gPostal = g.getString(6); val gDate = g.getString(7)
      val gCountry = g.getString(12)
      val expected = Seq(
        if (num == null || num.trim.isEmpty) Some("Invoice number is missing")
        else if (!num.matches("^[A-Za-z0-9-]{5,}$"))
          Some(s"Unusual invoice number format: $num") else None,
        if (gVendor.trim.isEmpty) Some("Vendor name is missing") else None,
        if (gStreet.trim.isEmpty) Some("Vendor street is missing") else None,
        if (gCity.trim.isEmpty) Some("Vendor city is missing") else None,
        if (gState.trim.isEmpty) Some("Vendor state is missing") else None,
        if (gPostal.trim.isEmpty) Some("Vendor postal code is missing") else None,
        if (gCountry.trim.isEmpty) Some("Vendor country is missing") else None,
        if (gDate.isEmpty) Some("Invoice date is missing")
        // goldens are post-clamp, so the future branch can never fire —
        // kept as a tripwire that clamping holds end-to-end
        else if (gDate > "2025-04-18") Some(s"Invoice date $gDate is in the future")
        else None
      ).flatten
      val gotW = got(filename)
      expected.foreach(w => assert(gotW.contains(w),
        s"$filename: expected warning [$w] in [$gotW]"))
      // no date-missing warning when a date exists
      if (gDate.nonEmpty)
        assert(!gotW.contains("Invoice date is missing"), filename)
    }
  }

  test("anomaly flags fire on high totals; future dates are pre-clamped") {
    val flagged = extractedInvoices.select(col("filename"),
      col("invoice_date"), col("final_total"),
      ValidationExprs.anomalyFlags(
        to_date(col("invoice_date")), lit("2025-04-18").cast("date"),
        col("final_total"), lit(0)).as("flags"))
      .filter(col("flags") =!= "")
    val rows = flagged.collect()
    assert(rows.nonEmpty, "fixtures plant >10000 totals")
    rows.foreach { r =>
      val total = Option(r.getDecimal(2))
      val flags = r.getString(3)
      // the model-level clamp (reference models.py:51-55) runs before
      // validation, so no LIVE invoice can carry a future date
      assert(!flags.contains("Future date"), r.toString)
      if (flags.contains("Unusually high total amount"))
        assert(total.exists(_.compareTo(new java.math.BigDecimal(10000)) > 0), r.toString)
    }
    // e2e clamp proof: zero extracted dates past asOf
    assert(extractedInvoices
      .filter(to_date(col("invoice_date")) > lit("2025-04-18").cast("date"))
      .count() == 0L)
    // the P4 future-date predicate itself stays covered on raw rows
    // (pre-model data, e.g. driver-query inputs)
    import spark.implicits._
    val raw = Seq(("2026-06-01", BigDecimal(5)), ("2024-06-01", BigDecimal(5)))
      .toDF("d", "t")
      .select(ValidationExprs.anomalyFlags(to_date(col("d")),
        lit("2025-04-18").cast("date"), col("t"), lit(0)).as("flags"))
      .as[String].collect()
    assert(raw.toSeq == Seq("Future date", ""))
  }

  test("entity fallback lattice: valid entities win, invalid fall back to regex") {
    val viaEntities = InvoiceExtract.withEntityFallback(
      Map("invoice_id" -> "INV-9", "total_amount" -> "55.00"), Nil,
      "Acme\nInvoice Number: INV-11111", "f1")
    assert(viaEntities.invoice_number.contains("INV-9"))
    assert(viaEntities.grand_total.contains(BigDecimal("55.00")))
    // empty entities fail the validity gate -> regex path
    val viaRegex = InvoiceExtract.withEntityFallback(
      Map("other" -> "x"), Nil, "Acme\nInvoice Number: INV-11111", "f2")
    assert(viaRegex.invoice_number.contains("INV-11111"))
  }

  test("entity path runs LIVE in the pipeline (not just the helper)") {
    // entity-doc fixtures carry supplier_country=US — only the DocAI
    // path can produce a non-empty country, so their presence proves
    // the lattice ran inside fromSpans
    val viaEntities = extractedInvoices.filter(col("country") === "US")
    assert(viaEntities.count() > 0)
    // and the gate-fail fixtures prove the fallback edge: their vendor
    // name is the raw kv line 0 (regex path on an entity-bearing doc)
    val fallbacks = extractedInvoices
      .filter(col("vendor_name").startsWith("supplier_city:"))
    assert(fallbacks.count() > 0)
    assert(fallbacks.filter(col("country") =!= "").count() == 0)
  }

  test("PDF page counts propagate into pages (V8 exercised both ways)") {
    val paged = extractedInvoices.filter(col("filename").rlike("#page\\d+$"))
    assert(paged.count() > 0)
    assert(paged.filter(col("pages") >= 1).count() == paged.count())
    // multi-page PDFs must carry pages > 1 (fixtures plant 1-3 pages)
    assert(paged.filter(col("pages") > 1).count() > 0)
    // non-media invoices are single-page
    assert(extractedInvoices.filter(!col("filename").rlike("#page\\d+$"))
      .filter(col("pages") =!= 1).count() == 0)
  }

  test("CSV export sink writes the 12 reference columns") {
    val outDir = Files.createTempDirectory("graft_csv").toString + "/inv"
    InvoiceExtract.writeCsv(extractedInvoices.limit(20), outDir)
    val back = spark.read.option("header", "true").csv(outDir)
    assert(back.columns.toSeq == Seq("Filename", "Invoice Number",
      "Vendor Name", "Address", "Invoice Date", "Grand Total", "Taxes",
      "Final Total", "Quantity", "Unit Price", "Total", "Pages"))
    assert(back.count() == 20)
    // money format is %.2f
    val money = back.filter(col("Grand Total") =!= "")
      .select(col("Grand Total")).limit(5).collect()
    money.foreach(r => assert(r.getString(0).matches("\\d+\\.\\d{2}"), r.toString))
  }

  test("Excel export sink writes valid xlsx with the reference width rule") {
    val outDir = Files.createTempDirectory("graft_xlsx").toString + "/inv"
    val invoices = extractedInvoices.limit(20).coalesce(1)
    InvoiceExtract.writeXlsx(invoices, outDir)
    val files = new java.io.File(outDir).listFiles()
      .filter(_.getName.endsWith(".xlsx")).sortBy(_.getName)
    assert(files.length == 1, files.mkString(", "))
    val bytes = java.nio.file.Files.readAllBytes(files.head.toPath)
    // it is a real ZIP with the mandatory OOXML parts
    val entries = graft.kernel.ZipExplode.entries(bytes).toMap
    assert(entries.keySet == Set("[Content_Types].xml", "_rels/.rels",
      "xl/workbook.xml", "xl/_rels/workbook.xml.rels",
      "xl/worksheets/sheet1.xml"))
    // every XML part parses with the JDK parser (well-formedness)
    def dom(name: String) = javax.xml.parsers.DocumentBuilderFactory
      .newInstance().newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(entries(name)))
    assert(dom("xl/workbook.xml").getElementsByTagName("sheet")
      .item(0).getAttributes.getNamedItem("name").getNodeValue == "Invoices")
    val sheet = dom("xl/worksheets/sheet1.xml")
    // header row + 20 data rows
    val rowsN = sheet.getElementsByTagName("row")
    assert(rowsN.getLength == 21)
    def rowCells(i: Int): Seq[String] = {
      val cells = rowsN.item(i).getChildNodes
      (0 until cells.getLength).map(j => cells.item(j).getTextContent)
    }
    assert(rowCells(0) == Seq("Filename", "Invoice Number", "Vendor Name",
      "Address", "Invoice Date", "Grand Total", "Taxes", "Final Total",
      "Quantity", "Unit Price", "Total", "Pages"))
    // data matches the CSV twin row-for-row (same projection)
    val csvRows = InvoiceExtract.exportProjection(invoices).collect()
      .map(r => (0 until r.length).map(v =>
        Option(r.get(v)).map(_.toString).getOrElse("")))
    (1 to 20).foreach(i => assert(rowCells(i) == csvRows(i - 1),
      s"row $i mismatch"))
    // reference width rule: max cell length (header included) + 2
    val cols = sheet.getElementsByTagName("col")
    assert(cols.getLength == 12)
    val width0 = cols.item(0).getAttributes.getNamedItem("width")
      .getNodeValue.toInt
    val expected0 = (Seq("Filename") ++ csvRows.map(_(0))).map(_.length).max + 2
    assert(width0 == expected0)
  }
}
