package graft.pipeline

import java.time.LocalDate
import graft.kernel._
import graft.model.{SpanTask, SubSpan}

/** The per-span kernel: one SpanTask in, N extracted SubSpans out.
  * Runs inside the typed `mapPartitions` stage (the engine's only
  * non-Catalyst compute, SURVEY.md §2.10). Dispatch mirrors the
  * reference's MIME dispatch (reference app/utils/ocr_engine.py:106-172,
  * file_handler.py:70-116):
  *
  *  - text  → passthrough;
  *  - html  → boilerplate strip (graft F17);
  *  - pdf   → per-page text layer, OCR fallback for rasterized pages,
  *            page provenance `ref#page{n}` mirroring the reference's
  *            `_page{n}` renaming (ocr_engine.py:64, 197);
  *  - png/jpeg → preprocess + OCR stand-in;
  *  - zip   → explode entries, recurse (file_handler.py:130-151).
  *
  * Per-row try/catch → error sub-span: a poison document must not kill
  * the partition (SURVEY.md §2.8 B4); errors are counted into lineage.
  */
object SpanKernel {

  /** Kind assigned to every successfully extracted output span. */
  val TextKind = "text"
  val ErrorKind = "error"

  /** Kinds whose payload lives in the media sidecar. Only these enter
    * the media join in ExtractionPipeline.extract: an inline
    * (text/html) span that happens to carry a media_ref keeps its
    * inline text — routing it through the join would erase it.
    */
  val MediaKinds: Seq[String] = Seq("pdf", "png", "jpeg", "zip")

  /** Sentinel task kind for a doc whose spans array was empty/null
    * (explode_outer row): the kernel answers with a marker sub-span so
    * the doc_id survives the reassembly groupBy; reassemble strips the
    * marker, yielding an empty output spans array.
    */
  val EmptyDocKind = "__empty_doc"

  def process(t: SpanTask, asOf: LocalDate = DateExtract.DefaultAsOf): Seq[SubSpan] = {
    try {
      t.kind match {
        case "text" =>
          Seq(sub(t, 0, t.text, ""))
        case EmptyDocKind =>
          Seq(SubSpan(t.doc_id, 0, 0, EmptyDocKind, "", "", ""))
        case "html" =>
          Seq(sub(t, 0, HtmlStrip.strip(t.text), ""))
        // delegate to MediaKinds so routing (ExtractionPipeline
        // isMediaSpan) and kernel dispatch share one source of truth —
        // a kind added to one list but not the other produced spurious
        // 'unsupported span kind' errors (advisor, round 4)
        case k if MediaKinds.contains(k) =>
          decodeMedia(t)
        case other =>
          Seq(err(t, s"unsupported span kind: $other"))
      }
    } catch {
      case e: Exception => Seq(err(t, s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }

  private def decodeMedia(t: SpanTask): Seq[SubSpan] = {
    if (t.bytes == null || t.bytes.isEmpty)
      return Seq(err(t, s"missing media payload for ${t.media_ref}"))
    // sniff wins over the declared kind, as in ocr_engine.py:116
    val mime = MimeSniffer.sniff(t.bytes) match {
      case MimeSniffer.Unknown => MimeSniffer.fromExtension(t.media_ref) match {
        case MimeSniffer.Unknown => kindToMime(t.kind)
        case m => m
      }
      case m => m
    }
    extractBytes(t, t.bytes, mime, t.media_ref)
  }

  private def kindToMime(kind: String): String = kind match {
    case "pdf" => MimeSniffer.Pdf
    case "png" => MimeSniffer.Png
    case "jpeg" => MimeSniffer.Jpeg
    case "zip" => MimeSniffer.Zip
    case _ => MimeSniffer.Unknown
  }

  /** Extract text spans from a binary payload; `ref` carries provenance
    * and grows `#page{n}` / `!{entry}` suffixes as the payload explodes.
    */
  def extractBytes(t: SpanTask, bytes: Array[Byte], mime: String, ref: String)
      : Seq[SubSpan] = mime match {
    case MimeSniffer.Pdf =>
      val pages = PdfText.extractPages(bytes)
      if (pages.isEmpty) Seq(err(t, s"empty pdf: $ref"))
      else pages.zipWithIndex.map { case (page, i) =>
        val text = page match {
          case PdfText.TextPage(s) => s
          case PdfText.ImagePage(raster, w, h) => OcrStandin.ocrGray(raster, w, h)
        }
        // reference names exploded pages `{filename}_page{n}`, 1-based
        sub(t, i, text, s"$ref#page${i + 1}")
      }
    case MimeSniffer.Png | MimeSniffer.Jpeg =>
      val g = ImageDecode.readGray(bytes)
      if (g == null) Seq(err(t, s"undecodable image: $ref"))
      else Seq(sub(t, 0, OcrStandin.ocrGray(g._1, g._2, g._3), ref))
    case MimeSniffer.Zip =>
      val entries = ZipExplode.entries(bytes)
      if (entries.isEmpty) Seq(err(t, s"empty zip: $ref"))
      else entries.zipWithIndex.flatMap { case ((name, entryBytes), i) =>
        val entryMime = MimeSniffer.sniff(entryBytes) match {
          case MimeSniffer.Unknown => MimeSniffer.fromExtension(name)
          case m => m
        }
        val entryRef = s"$ref!$name"
        if (entryMime == MimeSniffer.Zip)
          Seq(err(t, s"nested zip not supported: $entryRef")) // matches reference: zip entries recurse into pdf/image only (file_handler.py:142-151)
        else extractBytes(t, entryBytes, entryMime, entryRef)
      }.zipWithIndex.map { case (s, i) => s.copy(sub = i) }
    case _ =>
      Seq(err(t, s"unsupported media type for $ref"))
  }

  private def sub(t: SpanTask, n: Int, text: String, ref: String): SubSpan =
    SubSpan(t.doc_id, t.offset, n, TextKind, text, ref, "")

  private def err(t: SpanTask, msg: String): SubSpan =
    SubSpan(t.doc_id, t.offset, 0, ErrorKind, "", t.media_ref, msg)
}
