package graft.pipeline

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.kernel.{DateExtract, FieldExtract}
import graft.model.Invoice

/** Structured invoice extraction over extracted document spans — the
  * engine's realization of the reference's GCV/regex path
  * (reference app/utils/data_extractor.py:347-372) with the DocAI
  * fallback lattice P2 (data_extractor.py:259-274) available via
  * [[withEntityFallback]].
  *
  * Runs as a typed map over (filename, text) pairs because the date
  * cascade (F6) is kernel logic; everything downstream (warnings,
  * anomaly flags, export projection) is pure Catalyst.
  */
object InvoiceExtract {

  /** Flat extraction row (invoice without nested structs — the
    * relational edge shape; money as BigDecimal(18,2)).
    */
  final case class InvoiceRow(
      filename: String,
      invoice_number: Option[String],
      vendor_name: String,
      street: String,
      city: String,
      state: String,
      postal_code: String,
      country: String,
      invoice_date: Option[String],
      grand_total: Option[BigDecimal],
      taxes: Option[BigDecimal],
      final_total: Option[BigDecimal],
      items: Seq[graft.model.InvoiceItem],
      pages: Int)

  private def toRow(inv: Invoice): InvoiceRow = InvoiceRow(
    filename = inv.filename,
    invoice_number = inv.invoice_number,
    vendor_name = inv.vendor.name,
    street = inv.vendor.address.street,
    city = inv.vendor.address.city,
    state = inv.vendor.address.state,
    postal_code = inv.vendor.address.postal_code,
    // carried for the DocAI entity path (supplier_country); always ""
    // on the regex path (data_extractor.py:423: country stays empty)
    country = inv.vendor.address.country,
    invoice_date = inv.invoice_date,
    grand_total = inv.grand_total.map(_.setScale(2)),
    taxes = inv.taxes.map(_.setScale(2)),
    final_total = inv.final_total.map(_.setScale(2)),
    items = inv.items,
    pages = inv.pages)

  /** Extract one invoice per text span of the extraction output.
    * Provenance filename = media_ref for media-derived spans (already
    * `ref#page{n}`-shaped, mirroring the reference's `_page{n}` file
    * naming), else `doc_id:offset` for inline spans.
    *
    * Two live extraction paths, exactly the reference's lattice
    * (SURVEY.md P2, data_extractor.py:259-274): the kernel derives a
    * DocAI-stand-in entities map from kv lines (F10/F16); if it passes
    * the validity gate the entity path wins, else the regex path runs
    * over the raw text.
    *
    * `pages` = the reference's per-page `num_pages` carry
    * (ocr_engine.py:296-303): for a `ref#page{n}` span, the count of
    * sibling page spans of the same source — computed with a per-row
    * HOF over the doc's own spans array (zero shuffle; a PDF's pages
    * always live in one row).
    */
  def fromSpans(extracted: DataFrame,
      asOf: LocalDate = DateExtract.DefaultAsOf): Dataset[InvoiceRow] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    val pageBase = "^(.*)#page\\d+$"
    val texts = extracted
      .select(col("doc_id"), col("spans"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "text")
      .select(
        when(col("s.media_ref") =!= "", col("s.media_ref"))
          .otherwise(concat(col("doc_id"), lit(":"), col("s.offset")))
          .as("filename"),
        col("s.text").as("text"),
        // distinct refs: a doc referencing the same media_ref from two
        // spans must not double-count its pages
        when(regexp_extract(col("s.media_ref"), pageBase, 1) === "", lit(1))
          .otherwise(size(array_distinct(transform(
            filter(col("spans"), x =>
              regexp_extract(x.getField("media_ref"), pageBase, 1) ===
                regexp_extract(col("s.media_ref"), pageBase, 1)),
            x => x.getField("media_ref")))))
          .as("pages"))
      .as[(String, String, Int)]
      // Round-robin spread before the CPU-heavy typed map (date
      // cascade): AQE sizes the upstream reassembly shuffle by BYTES
      // (parallelism-first floor = defaultParallelism), but per-row
      // date-cascade cost varies a lot, so 1-task-per-core schedules
      // straggle. Measured round 3 at local[32], 3k-doc corpus:
      // removing this exchange = 7.6 s -> 9.4 s invoice chain (+24%).
      // The shuffle moves only (filename, text, pages). PlanSpec
      // asserts the chain has exactly this one round-robin exchange.
      .repartition(spark.sparkContext.defaultParallelism * 4)
    texts.mapPartitions(_.map { case (filename, text, pages) =>
      withEntityFallback(FieldExtract.entitiesFromText(text),
        textTables(text), text, filename, numPages = pages, asOf = asOf)
    })
  }

  /** Layout-table stand-in over extracted text: each line's
    * whitespace-separated words are one row of cells — the reference's
    * paragraph→row-of-word-cells table extraction (ocr_engine.py:330-340,
    * equivalently OcrStandin.tableRows). The GCV items path then skips
    * the header row (the vendor-name line) and rows whose qty cell
    * isn't an int self-skip (data_extractor.py:446-468).
    */
  def textTables(text: String): Seq[Seq[Seq[String]]] =
    Seq(text.split("\n").toSeq.map(_.split(" ").toSeq))

  /** The P2 fallback lattice: entity path accepted iff the validity
    * gate passes, else the regex path over raw text.
    */
  def withEntityFallback(
      entities: Map[String, String],
      tables: Seq[Seq[Seq[String]]],
      text: String,
      filename: String,
      numPages: Int = 1,
      asOf: LocalDate = DateExtract.DefaultAsOf): InvoiceRow = {
    // entity extraction only runs when entities exist — the common
    // (regex-path) document never pays for the DocAI projection.
    // A kv line consumed into the entities map is an ENTITY, not a
    // table row (the cloud processor reports entities and tables as
    // disjoint structures) — so the DocAI items path sees the tables
    // minus entity rows, while the regex fallback keeps the full text
    // tables exactly as GCV layout would.
    val viaEntities =
      if (entities.isEmpty) None
      else {
        val docaiTables = tables.map(_.filterNot(row =>
          row.headOption.exists(c => c.endsWith(":") &&
            FieldExtract.DocAiEntityTypes(c.dropRight(1)))))
        // pages is pinned to 1 inside extractFromEntities (the
        // reference's _extract_from_docai hardcodes it; numPages only
        // feeds the GCV/regex path)
        Some(FieldExtract.extractFromEntities(
          entities, docaiTables, filename, asOf))
          .filter(FieldExtract.isInvoiceValid)
      }
    viaEntities.map(toRow).getOrElse(
      toRow(FieldExtract.extractFromText(text, filename,
        tables = tables, numPages = numPages, asOf = asOf)))
  }

  /** The reference exporter's fixed 12-column CSV projection
    * (reference app/utils/exporter.py:14-18, 38-84): address concat in
    * reference field order, item rollup (empty-items → zeros), money
    * as %.2f strings.
    */
  def exportProjection(invoices: DataFrame): DataFrame = {
    def money(c: org.apache.spark.sql.Column) =
      // %.2f needs a double; a 2-dp decimal is exactly representable
      when(c.isNotNull, format_string("%.2f", c.cast("double"))).otherwise(lit(""))
    val qtySum = coalesce(aggregate(col("items"), lit(0L),
      (acc, it) => acc + coalesce(it.getField("quantity").cast("long"), lit(0L))),
      lit(0L))
    val centsSum = coalesce(aggregate(col("items"), lit(0L),
      (acc, it) => acc + coalesce(
        round(it.getField("total") * 100).cast("long"), lit(0L))),
      lit(0L))
    def centsStr(c: org.apache.spark.sql.Column) = {
      // sign extracted first: %d on floor(c/100) would render -150 as
      // "-2.-50" (Spark % keeps the dividend's sign); negatives are
      // in-domain (parseDecimal keeps '-', Python str(Decimal('-1.50'))
      // == "-1.50")
      val a = abs(c)
      concat(when(c < 0, "-").otherwise(""),
        format_string("%d.%02d", floor(a / 100).cast("long"), a % 100))
    }
    invoices.select(
      col("filename").as("Filename"),
      coalesce(col("invoice_number"), lit("")).as("Invoice Number"),
      col("vendor_name").as("Vendor Name"),
      // reference field order incl. country 5th (exporter.py:42-49)
      concat_ws(", ",
        nullif(col("street"), lit("")), nullif(col("city"), lit("")),
        nullif(col("state"), lit("")), nullif(col("postal_code"), lit("")),
        nullif(col("country"), lit("")))
        .as("Address"),
      coalesce(col("invoice_date"), lit("")).as("Invoice Date"),
      money(col("grand_total")).as("Grand Total"),
      money(col("taxes")).as("Taxes"),
      money(col("final_total")).as("Final Total"),
      // A1 item rollup as array HOFs (per-row, stays pipelined —
      // exporter.py:51-65: sum qty, sum totals, avg unit = sum/sum).
      // Integer cents: decimal HOF accumulators widen per step and
      // break aggregate's fixed zero type.
      qtySum.as("Quantity"),
      // reference displays avg = total/qty through %.2f, which ROUNDS
      when(qtySum > 0, centsStr(round(centsSum / qtySum).cast("long")))
        .otherwise("0.00").as("Unit Price"),
      centsStr(centsSum).as("Total"),
      col("pages").as("Pages"))
  }

  /** S8 — CSV sink. */
  def writeCsv(invoices: DataFrame, path: String): Unit =
    exportProjection(invoices)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** S9 — Excel sink (reference app/utils/exporter.py:99-117): sheet
    * "Invoices", the same 12-column projection as the CSV twin, auto
    * column widths (max cell length + 2, header included). Written as
    * real minimal OOXML workbooks ([[XlsxSink]] — no POI needed): one
    * .xlsx per partition via the Hadoop FS API, mirroring the shape
    * of every other Spark file sink (the reference's single in-memory
    * workbook is a bounded per-task export; a single file at scale
    * would serialize the world through the driver — coalesce(1)
    * upstream if one file is genuinely wanted). Each partition's rows
    * are buffered once to compute the width rule, which needs a full
    * column pass by definition.
    */
  def writeXlsx(invoices: DataFrame, path: String): Unit = {
    val proj = exportProjection(invoices)
    val headers = proj.columns.toSeq
    // the SESSION's Hadoop configuration rides to executors (its
    // effective entries, serialized as plain pairs — Configuration
    // itself is not Serializable and Spark's SerializableConfiguration
    // wrapper is private[spark]) — a bare `new Configuration()` would
    // drop non-default FS settings (fs.defaultFS, object-store
    // credentials) and write to the wrong filesystem (advisor, round 4)
    import scala.jdk.CollectionConverters._
    val confEntries = invoices.sparkSession.sparkContext
      .hadoopConfiguration.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toVector
    proj.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val rows = it.map(r => (0 until r.length).map(r.get).toSeq).toVector
        val bytes = XlsxSink.build(headers, rows)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val p = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.xlsx")
        val fs = p.getFileSystem(conf)
        val out = fs.create(p, true)
        try out.write(bytes) finally out.close()
      }
    }
  }
}
