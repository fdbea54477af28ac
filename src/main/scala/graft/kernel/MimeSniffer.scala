package graft.kernel

/** Magic-byte MIME sniffing over binary payloads — the pure-Scala twin
  * of the reference's libmagic call (reference
  * app/utils/file_handler.py:44-51) and its magic-byte fallback table
  * (reference app/utils/ocr_engine.py:436-441). Sniff wins over the
  * extension map, as in ocr_engine.py:116.
  */
object MimeSniffer {

  val Pdf = "application/pdf"
  val Jpeg = "image/jpeg"
  val Png = "image/png"
  val Zip = "application/zip"
  val Unknown = "application/octet-stream"

  private val PngMagic =
    Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Content-type from leading bytes (first 1KB suffices, like the
    * reference's `magic.from_buffer(content[:1024])`).
    */
  def sniff(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 4) Unknown
    else if (bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F') Pdf
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff) Jpeg
    else if (bytes.length >= 8 && PngMagic.indices.forall(i => bytes(i) == PngMagic(i))) Png
    else if (bytes(0) == 'P' && bytes(1) == 'K' && bytes(2) == 0x03 && bytes(3) == 0x04) Zip
    else Unknown
  }

  /** Extension → MIME fallback map (reference app/main.py:74-84,
    * ocr_engine.py:419-434). Used only when sniffing is impossible.
    */
  def fromExtension(filename: String): String = {
    val lower = filename.toLowerCase
    if (lower.endsWith(".pdf")) Pdf
    else if (lower.endsWith(".jpg") || lower.endsWith(".jpeg")) Jpeg
    else if (lower.endsWith(".png")) Png
    else if (lower.endsWith(".zip")) Zip
    else Unknown
  }

  /** Allowed-type predicate P1 (reference app/main.py:280-282,
    * models.py:68-73).
    */
  def isAllowed(mime: String): Boolean =
    mime == Pdf || mime == Jpeg || mime == Png || mime == Zip
}
