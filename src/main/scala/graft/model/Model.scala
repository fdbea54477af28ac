package graft.model

/** Core row types for the extraction engine.
  *
  * The input table shape is mandated by BASELINE.json `input_hint`:
  * `docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`.
  * Mapping from the reference's record model (one row = one uploaded
  * document, reference ocr_engine.py:106-111) is documented in
  * SURVEY.md §1.3.
  */

/** One span of an interleaved document.
  * kind ∈ {text, html, pdf, png, jpeg, zip}; text is inline for
  * text/html kinds; media_ref points into the `media` sidecar table for
  * binary kinds (reference inlines bytes; at 10^12 docs we don't).
  * offset is the 0-based order within the document — order is part of
  * the per-row invariant (span-sequence equality).
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** One document row of the input/output table. */
case class Doc(doc_id: String, spans: Seq[Span])

/** Sidecar binary payload (stand-in for object storage at scale). */
case class MediaBlob(media_ref: String, bytes: Array[Byte])

/** Unit of kernel work: one span with its (optional) payload bytes.
  * Granularity = span, not doc, so a 1000-page "whale" document is
  * spread across partitions (skew defense, SURVEY.md §4 B3).
  */
case class SpanTask(
    doc_id: String,
    offset: Int,
    kind: String,
    text: String,
    media_ref: String,
    bytes: Array[Byte])

/** Kernel output: one extracted sub-span. A media span may expand into
  * several sub-spans (one per PDF page / ZIP entry), ordered by `sub`.
  * Mirrors the reference's per-page explode with `_page{n}` naming
  * (reference ocr_engine.py:174-227, file_handler.py:163-186).
  */
case class SubSpan(
    doc_id: String,
    offset: Int,
    sub: Int,
    kind: String,
    text: String,
    media_ref: String,
    error: String)

// ---------------------------------------------------------------------------
// Structured invoice extraction output (reference app/models.py).
// Money is BigDecimal(18,2) — never double (SURVEY.md §1.2).
// ---------------------------------------------------------------------------

case class Address(
    street: String = "",
    city: String = "",
    state: String = "",
    country: String = "",
    postal_code: String = "")

case class Vendor(name: String = "", address: Address = Address())

case class InvoiceItem(
    description: Option[String],
    quantity: Option[Int],
    unit_price: Option[BigDecimal],
    total: Option[BigDecimal])

/** Structured invoice (reference app/models.py:32-41). `invoice_date`
  * is ISO yyyy-MM-dd or null — kept as String at the kernel edge so the
  * Spark schema stays DateType-convertible without Encoder friction.
  */
case class Invoice(
    filename: String,
    invoice_number: Option[String],
    vendor: Vendor,
    invoice_date: Option[String],
    grand_total: Option[BigDecimal],
    taxes: Option[BigDecimal],
    final_total: Option[BigDecimal],
    items: Seq[InvoiceItem],
    pages: Int = 1)
