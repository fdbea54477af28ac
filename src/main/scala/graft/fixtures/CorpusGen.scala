package graft.fixtures

import java.util.Random
import scala.collection.mutable.ArrayBuffer
import graft.kernel.{GlyphFont, PdfText, ZipExplode}
import graft.model.{Doc, MediaBlob, Span}

/** Deterministic corpus + golden generator (FIXTURES.md §1-2).
  *
  * Every fixture is synthesized from a fixed seed; goldens are authored
  * FROM THE GENERATION PARAMETERS (the generator knows what text it
  * rendered into each payload), never by running the pipeline on itself
  * — no circularity. The reference ships zero test data (all test files
  * are 0-byte stubs, SURVEY.md §5), so this generator is the corpus.
  *
  * Doc shape per BASELINE.json input_hint: interleaved spans of
  * text | html | pdf | png | jpeg | zip; media payloads in a sidecar
  * `media(media_ref, bytes)` table (object-storage stand-in).
  */
object CorpusGen {

  val AllKinds: Seq[String] = Seq("text", "html", "pdf", "png", "jpeg", "zip")

  case class Params(
      nDocs: Int,
      seed: Long = 42L,
      kinds: Seq[String] = AllKinds,
      /** every k-th doc is a many-span "whale" (skew fixture). */
      whaleEvery: Int = 97,
      whaleSpans: Int = 40)

  /** One generated doc: input row, golden output row, media payloads,
    * and (filename → invoice-bearing text) goldens for the structured
    * extraction operators.
    */
  case class DocFixture(
      doc: Doc,
      golden: Doc,
      media: Seq[MediaBlob],
      invoices: Seq[GoldenInvoice])

  /** Golden structured-invoice row (known at generation time).
    * invoice_date is post-clamp (a future date is recorded as AsOf,
    * mirroring the reference's model validator, models.py:51-55).
    */
  case class GoldenInvoice(
      filename: String,
      invoice_number: String,
      vendor_name: String,
      street: String,
      city: String,
      state: String,
      postal_code: String,
      invoice_date: String, // ISO, "" if the doc has no date line
      grand_total: java.math.BigDecimal,
      taxes: java.math.BigDecimal,
      final_total: java.math.BigDecimal,
      items: Seq[GoldenItem] = Nil,
      country: String = "",
      pages: Int = 1)

  /** Pinned "today" for date clamping and future-date checks. */
  val AsOf: java.time.LocalDate = graft.kernel.DateExtract.DefaultAsOf

  /** Golden line item (description, qty, unit price, total). */
  case class GoldenItem(
      description: String,
      quantity: Int,
      unit_price: java.math.BigDecimal,
      total: java.math.BigDecimal)

  private val vocab = Array(
    "ledger", "batch", "carton", "freight", "pallet", "invoice", "remit",
    "quarterly", "shipment", "terminal", "harbor", "voucher", "manifest",
    "customs", "transit", "billing", "account", "warehouse", "courier",
    "dispatch", "receipt", "container", "liner", "broker", "tariff",
    "clearance", "dockyard", "payload", "consignment", "waybill")

  private val vendorNames = Array(
    "Acme Supply Co", "Globex Industrial", "Initech Partners",
    "Umbrella Logistics", "Stark Fabrication", "Wayne Materials",
    "Tyrell Imports", "Cyberdyne Tooling")

  private val streets = Array(
    "12 Main St", "742 Evergreen Terrace", "1 Infinite Loop",
    "221B Baker St", "30 Rockefeller Plaza", "4 Privet Drive")

  private val cities = Array(
    ("Springfield", "IL", "62704"), ("Shelbyville", "KY", "40065"),
    ("Centerville", "OH", "45459"), ("Riverton", "WY", "82501"),
    ("Fairview", "TX", "75069"), ("Madison", "WI", "53703"))

  def rngFor(seed: Long, idx: Int): Random =
    new Random(seed * 1000003L + idx.toLong * 0x9E3779B9L)

  def prose(rng: Random, minWords: Int = 8, maxWords: Int = 30): String = {
    val n = minWords + rng.nextInt(maxWords - minWords + 1)
    (0 until n).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ")
  }

  /** A sentence guaranteed ≥ 25 chars (HtmlStrip keep threshold). */
  private def paragraph(rng: Random): String = prose(rng, 6, 18) + " end"

  // -------------------------------------------------------------------------
  // Invoice text + golden fields
  // -------------------------------------------------------------------------

  /** Date string formats the extraction cascade provably recovers
    * (DateExtractSpec); day is always ≥ 13 so numeric orders are
    * unambiguous under the DMY→MDY→YMD cascade.
    */
  private def formatDate(rng: Random, d: java.time.LocalDate): String = {
    val day = d.getDayOfMonth; val mon = d.getMonthValue; val yr = d.getYear
    val months = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
      "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
    rng.nextInt(7) match {
      case 0 => f"$day%02d/$mon%02d/$yr%04d"
      case 1 => f"$yr%04d-$mon%02d-$day%02d"
      case 2 => f"$mon%02d/$day%02d/$yr%04d"
      case 3 => s"$day ${months(mon - 1)} $yr"
      case 4 => s"${months(mon - 1)} $day, $yr"
      case 5 => f"$yr%04d$mon%02d$day%02d"
      case 6 => f"$day%02d.$mon%02d.${yr % 100}%02d"
    }
  }

  private def genDate(rng: Random): java.time.LocalDate = {
    // mostly past dates; ~8% future (anomaly-flag fixtures)
    val year = if (rng.nextInt(100) < 8) 2026 else 2020 + rng.nextInt(5)
    java.time.LocalDate.of(year, 1 + rng.nextInt(12), 13 + rng.nextInt(16))
  }

  private def money(rng: Random): java.math.BigDecimal =
    new java.math.BigDecimal(100 + rng.nextInt(999900)).movePointLeft(2)

  /** Invoice text + its golden fields. `filename` is the provenance the
    * extraction operator will see. Layout A (subtotal first) exhibits
    * the reference's final_total=subtotal quirk; layout B (total first)
    * does not — goldens encode whichever applies.
    */
  def invoiceText(rng: Random, filename: String): (String, GoldenInvoice) = {
    val vendor = vendorNames(rng.nextInt(vendorNames.length))
    val street = streets(rng.nextInt(streets.length))
    val (city, state, zip) = cities(rng.nextInt(cities.length))
    val number = f"INV-${10000 + rng.nextInt(90000)}%05d"
    val hasDate = rng.nextInt(10) > 0
    val date = genDate(rng)
    val dateStr = formatDate(rng, date)
    val sub = money(rng)
    val tax = sub.multiply(new java.math.BigDecimal("0.10"))
      .setScale(2, java.math.RoundingMode.HALF_UP)
    val tot = sub.add(tax)
    val layoutA = rng.nextBoolean()
    def m(v: java.math.BigDecimal) = f"$$${v.toPlainString}%s"
    val totalLines =
      if (layoutA) Seq(s"Subtotal: ${m(sub)}", s"Tax: ${m(tax)}", s"Total: ${m(tot)}")
      else Seq(s"Total: ${m(tot)}", s"Subtotal: ${m(sub)}", s"Tax: ${m(tax)}")
    // line items as whitespace-cell rows (the reference's layout-table
    // stand-in treats a text line's words as table cells,
    // ocr_engine.py:330-340); ~60% of invoices carry 1-4 items
    val itemNames = Array("Widget", "Gadget", "Flange", "Bracket", "Gasket")
    val items = if (rng.nextInt(10) < 6) (0 until 1 + rng.nextInt(4)).map { _ =>
      val qty = 1 + rng.nextInt(9)
      val unit = new java.math.BigDecimal(50 + rng.nextInt(9950)).movePointLeft(2)
      GoldenItem(itemNames(rng.nextInt(itemNames.length)), qty, unit,
        unit.multiply(new java.math.BigDecimal(qty)).setScale(2))
    } else Nil
    val itemLines = items.map(it =>
      s"${it.description} ${it.quantity} ${it.unit_price.toPlainString} ${it.total.toPlainString}")
    val lines = Seq(vendor, street, s"$city, $state $zip",
      s"Invoice Number: $number") ++
      (if (hasDate) Seq(s"Invoice Date: $dateStr") else Nil) ++
      itemLines ++ totalLines ++ Seq("Thank you for your business")
    val golden = GoldenInvoice(
      filename = filename,
      invoice_number = number,
      vendor_name = vendor,
      street = street, city = city, state = state, postal_code = zip,
      // future dates clamp to AsOf (reference models.py:51-55)
      invoice_date =
        if (!hasDate) ""
        else if (date.isAfter(AsOf)) AsOf.toString
        else date.toString,
      grand_total = sub,
      taxes = tax,
      // the reference's `total` regex finds "Subtotal" first in layout A
      final_total = if (layoutA) sub else tot,
      items = items)
    (lines.mkString("\n"), golden)
  }

  /** DocAI-style entity document: kv lines keyed by exact entity types
    * (the F16 stand-in's contract). `gateFails = false` → the entity
    * path wins (P2 gate passes on invoice_id); golden fields follow
    * DocAI semantics incl. total_amount double-mapped to grand AND
    * final totals and country carried. `gateFails = true` → entities
    * exist but carry no headline field, so the engine must fall back
    * to the regex path over the raw text; golden fields are authored
    * from REGEX semantics (line-position vendor/address, the
    * Subtotal/Total quirk, and the postal regex capturing the invoice
    * number's 5 digits from the line-2 scan — a real reference quirk).
    */
  def entityInvoiceText(rng: Random, filename: String, gateFails: Boolean)
      : (String, GoldenInvoice) = {
    val vendor = vendorNames(rng.nextInt(vendorNames.length))
    val street = streets(rng.nextInt(streets.length))
    val (city, state, zip) = cities(rng.nextInt(cities.length))
    val number = f"INV-${10000 + rng.nextInt(90000)}%05d"
    val date = genDate(rng)
    val sub = money(rng)
    val tax = sub.multiply(new java.math.BigDecimal("0.10"))
      .setScale(2, java.math.RoundingMode.HALF_UP)
    if (!gateFails) {
      val lines = Seq(
        s"supplier_name: $vendor",
        s"supplier_address: $street",
        s"supplier_city: $city",
        s"supplier_state: $state",
        s"supplier_zip: $zip",
        "supplier_country: US",
        s"invoice_id: $number",
        s"invoice_date: ${date.toString}",
        s"total_amount: ${sub.toPlainString}",
        s"total_tax_amount: ${tax.toPlainString}")
      val clamped = if (date.isAfter(AsOf)) AsOf else date
      (lines.mkString("\n"), GoldenInvoice(
        filename = filename,
        invoice_number = number,
        vendor_name = vendor,
        street = street, city = city, state = state, postal_code = zip,
        invoice_date = clamped.toString,
        grand_total = sub,
        taxes = tax,
        final_total = sub, // total_amount double-maps (data_extractor.py:307,315)
        items = Nil,
        country = "US"))
    } else {
      val lines = Seq(
        s"supplier_city: $city",
        s"total_tax_amount: ${tax.toPlainString}",
        s"Invoice Number: $number",
        s"Subtotal: $$${sub.toPlainString}",
        s"Tax: $$${tax.toPlainString}",
        s"Total: $$${sub.add(tax).toPlainString}")
      (lines.mkString("\n"), GoldenInvoice(
        filename = filename,
        invoice_number = number,
        // regex path: vendor = line 0, street = line 1 (verbatim kv lines)
        vendor_name = s"supplier_city: $city",
        street = s"total_tax_amount: ${tax.toPlainString}",
        // line 2 = "Invoice Number: INV-xxxxx": no "City, ST" match, but
        // the postal regex \b\d{5}\b captures the number's digit run
        city = "", state = "", postal_code = number.substring(4),
        invoice_date = "",
        grand_total = sub,
        taxes = tax,
        final_total = sub, // Subtotal precedes Total → quirk fires
        items = Nil))
    }
  }

  /** Uppercase charset-safe invoice lines for rasterized payloads. */
  def ocrInvoiceLines(rng: Random, filename: String): (Seq[String], GoldenInvoice) = {
    val (text, golden) = invoiceText(rng, filename)
    (text.split("\n").toSeq.map(GlyphFont.sanitize), golden.copy(
      vendor_name = GlyphFont.sanitize(golden.vendor_name),
      street = GlyphFont.sanitize(golden.street),
      city = GlyphFont.sanitize(golden.city),
      items = golden.items.map(it =>
        it.copy(description = GlyphFont.sanitize(it.description)))))
  }

  // -------------------------------------------------------------------------
  // HTML page + golden main text
  // -------------------------------------------------------------------------

  def htmlPage(rng: Random): (String, String) = {
    val paras = (0 until 1 + rng.nextInt(3)).map(_ => paragraph(rng))
    val navLinks = (0 until 3 + rng.nextInt(4))
      .map(i => s"""<a href="/p$i">${vocab(rng.nextInt(vocab.length))} link</a>""")
      .mkString(" ")
    val html =
      s"""<html><head><title>${vocab(rng.nextInt(vocab.length))}</title>
         |<style>body{margin:0}</style><script>var t=${rng.nextInt(100)};</script></head>
         |<body><header><h1>${vocab(rng.nextInt(vocab.length))} portal</h1>
         |<nav>$navLinks</nav></header>
         |<article>${paras.map(p => s"<p>$p</p>").mkString("\n")}</article>
         |<aside><ul><li><a href="/r1">related one</a></li><li><a href="/r2">related two</a></li></ul></aside>
         |<footer>copyright 2024 ${vocab(rng.nextInt(vocab.length))} inc <a href="/privacy">privacy</a></footer>
         |</body></html>""".stripMargin
    (html, paras.mkString("\n"))
  }

  // -------------------------------------------------------------------------
  // Doc assembly
  // -------------------------------------------------------------------------

  def genDoc(idx: Int, p: Params): DocFixture = {
    val rng = rngFor(p.seed, idx)
    val docId = f"doc-$idx%09d"
    val isWhale = p.whaleEvery > 0 && idx > 0 && idx % p.whaleEvery == 0
    val nSpans = if (isWhale) p.whaleSpans else 1 + rng.nextInt(6)
    val spans = ArrayBuffer.empty[Span]
    val goldenSubs = ArrayBuffer.empty[(String, String, String)] // kind,text,ref
    val media = ArrayBuffer.empty[MediaBlob]
    val invoices = ArrayBuffer.empty[GoldenInvoice]

    (0 until nSpans).foreach { i =>
      val ref = s"m/$docId/$i"
      val kind = p.kinds(rng.nextInt(p.kinds.length))
      kind match {
        case "text" =>
          // provenance for inline spans = doc_id:<renumbered offset>; the
          // renumbered offset equals the golden sub-span count so far
          val fname = s"$docId:${goldenSubs.length}"
          val roll = rng.nextInt(100)
          val content = if (roll < 22) {
            val (t, g) = invoiceText(rng, fname)
            invoices += g; t
          } else if (roll < 30) {
            // DocAI-stand-in entity docs: valid-gate (entity path wins)
            val (t, g) = entityInvoiceText(rng, fname, gateFails = false)
            invoices += g; t
          } else if (roll < 34) {
            // entities present but gate fails → regex fallback observable
            val (t, g) = entityInvoiceText(rng, fname, gateFails = true)
            invoices += g; t
          } else prose(rng)
          spans += Span("text", content, "", i)
          goldenSubs += (("text", content, ""))
        case "html" =>
          val (html, main) = htmlPage(rng)
          spans += Span("html", html, "", i)
          goldenSubs += (("text", main, ""))
        case "pdf" =>
          val nPages = 1 + rng.nextInt(3)
          val pages = (0 until nPages).map { pi =>
            if (rng.nextInt(100) < 25) {
              // rasterized page → OCR-inference fallback path
              val (lines, g) = ocrInvoiceLines(rng, s"$ref#page${pi + 1}")
              invoices += g.copy(pages = nPages) // per-page num_pages carry
              val skew = (rng.nextInt(5) - 2) * 1.0
              // proven-exact OCR envelope: scale 2 unskewed, scale 3 skewed
              val (gray, w, h) = GlyphFont.render(lines,
                scale = if (skew == 0.0) 2 else 3,
                skewDeg = skew, noise = rng.nextInt(15), rng = rng)
              (PdfText.ImagePageSpec(gray, w, h), lines.mkString("\n"))
            } else if (rng.nextInt(100) < 40) {
              val (t, g) = invoiceText(rng, s"$ref#page${pi + 1}")
              invoices += g.copy(pages = nPages)
              (PdfText.TextPageSpec(t.split("\n").toSeq), t)
            } else {
              val t = prose(rng) + "\n" + prose(rng)
              (PdfText.TextPageSpec(t.split("\n").toSeq), t)
            }
          }
          media += MediaBlob(ref, PdfText.build(pages.map(_._1)))
          spans += Span("pdf", "", ref, i)
          pages.zipWithIndex.foreach { case ((_, gText), pi) =>
            goldenSubs += (("text", gText, s"$ref#page${pi + 1}"))
          }
        case "png" | "jpeg" =>
          val (lines, g) = ocrInvoiceLines(rng, ref)
          invoices += g
          val skew = (rng.nextInt(5) - 2) * 1.0
          val (gray, w, h) = GlyphFont.render(lines,
            scale = if (skew == 0.0) 2 else 3,
            skewDeg = skew, noise = rng.nextInt(15), rng = rng)
          val bytes = if (kind == "png") GlyphFont.toPng(gray, w, h)
            else GlyphFont.toJpeg(gray, w, h)
          media += MediaBlob(ref, bytes)
          spans += Span(kind, "", ref, i)
          goldenSubs += (("text", lines.mkString("\n"), ref))
        case "zip" =>
          val nEntries = 1 + rng.nextInt(2)
          val entries = (0 until nEntries).map { ei =>
            if (rng.nextBoolean()) {
              val t = prose(rng)
              val name = s"doc$ei.pdf"
              (name, PdfText.build(Seq(PdfText.TextPageSpec(t.split("\n").toSeq))),
                Seq((s"$ref!$name#page1", t)))
            } else {
              val (lines, g) = ocrInvoiceLines(rng, s"$ref!img$ei.png")
              invoices += g
              val (gray, w, h) = GlyphFont.render(lines, scale = 2)
              val name = s"img$ei.png"
              (name, GlyphFont.toPng(gray, w, h),
                Seq((s"$ref!$name", lines.mkString("\n"))))
            }
          }
          media += MediaBlob(ref, ZipExplode.build(entries.map(e => (e._1, e._2))))
          spans += Span("zip", "", ref, i)
          entries.foreach(_._3.foreach { case (gRef, gText) =>
            goldenSubs += (("text", gText, gRef))
          })
      }
    }
    val golden = Doc(docId, goldenSubs.zipWithIndex.map {
      case ((k, t, r), o) => Span(k, t, r, o)
    }.toSeq)
    DocFixture(Doc(docId, spans.toSeq), golden, media.toSeq, invoices.toSeq)
  }

  def generate(p: Params): Seq[DocFixture] =
    (0 until p.nDocs).map(genDoc(_, p))

  /** Write docs/media/golden_spans/golden_invoices parquet under dir.
    * Generation is distributed (each doc derives from (seed, idx) alone,
    * so workers generate independently) and cached across the three
    * output writes — glyph rendering dominates generation cost.
    */
  /** Sentinel content for a complete corpus: parameters PLUS the
    * layout version. The 4 MB payload row groups are load-bearing
    * (scan-split = kernel-scheduling unit, ExtractionPipeline session
    * factory); a cached corpus written under an older layout must be
    * regenerated, not silently benchmarked (advisor, round 3).
    */
  def markerContent(p: Params): String =
    s"nDocs=${p.nDocs} seed=${p.seed} layout=rowgroup4m"

  /** Generate into `dir` unless a COMPLETE corpus with the SAME params
    * and layout version is already there. Completion is marked by a
    * sentinel file written after the last table — a run killed
    * mid-write, or a corpus from an older layout/params, is
    * regenerated, never reused.
    */
  def ensure(spark: org.apache.spark.sql.SparkSession, dir: String, p: Params): Unit = {
    val marker = java.nio.file.Paths.get(dir, "_corpus_complete")
    val expected = markerContent(p) + "\n"
    val reusable = java.nio.file.Files.exists(marker) &&
      java.nio.file.Files.readString(marker) == expected
    if (!reusable) {
      java.nio.file.Files.deleteIfExists(marker)
      write(spark, dir, p)
      java.nio.file.Files.writeString(marker, expected)
    }
  }

  def write(spark: org.apache.spark.sql.SparkSession, dir: String, p: Params): Unit = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val fixtures = spark.range(p.nDocs).repartition(par).as[Long]
      .mapPartitions(_.map(i => genDoc(i.toInt, p)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      fixtures.map(_.doc).toDF()
        .write.mode("overwrite").parquet(s"$dir/docs")
      // 4 MB row groups on the payload table: the kernel runs at scan
      // granularity (no payload shuffle), so the row group is the unit
      // of kernel scheduling — 128 MB stock row groups would leave
      // maxPartitionBytes splits mostly empty and parallelism at
      // file granularity
      fixtures.flatMap(_.media).toDF()
        .write.mode("overwrite").option("parquet.block.size", s"${4 << 20}")
        .parquet(s"$dir/media")
      fixtures.map(_.golden).toDF()
        .write.mode("overwrite").parquet(s"$dir/golden_spans")
      fixtures.flatMap(_.invoices).map(g =>
        (g.filename, g.invoice_number, g.vendor_name, g.street, g.city,
          g.state, g.postal_code, g.invoice_date,
          BigDecimal(g.grand_total), BigDecimal(g.taxes), BigDecimal(g.final_total),
          g.items.map(it => (it.description, it.quantity,
            BigDecimal(it.unit_price), BigDecimal(it.total))),
          g.country, g.pages))
        .toDF("filename", "invoice_number", "vendor_name", "street", "city",
          "state", "postal_code", "invoice_date", "grand_total", "taxes",
          "final_total", "items", "country", "pages")
        .write.mode("overwrite").parquet(s"$dir/golden_invoices")
    } finally fixtures.unpersist()
  }
}
