package graft.kernel

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageInputStream

/** Contention-free image decoding. `ImageIO.read` performs a service
  * registry lookup per call and routes through shared stream plumbing —
  * measured to halve OCR scaling efficiency at 32 kernel threads
  * (0.81 → 0.52 in the thread-pool probe). Each kernel thread keeps its
  * own reader instances and feeds them memory-backed streams directly.
  */
object ImageDecode {

  private def readerFor(format: String) = {
    val it = ImageIO.getImageReadersByFormatName(format)
    if (!it.hasNext) throw new IllegalStateException(s"no reader for $format")
    it.next()
  }

  private val pngReader =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() => readerFor("png"))
  private val jpegReader =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() => readerFor("jpeg"))

  /** Decode PNG/JPEG bytes straight to a gray raster, skipping the
    * BufferedImage color model entirely: `readRaster` hands back the
    * decoder's raw bands (PNG: RGB, JPEG: YCbCr/gray — band 0 = Y =
    * luma). Our rasters are achromatic (r=g=b), so band 0 IS the gray
    * channel in both formats. Returns null if undecodable.
    *
    * Byte discipline: band 0 is copied straight out of the decoder's
    * DataBufferByte into the thread's scratch raster (valid until this
    * thread's next readGray — the kernel finishes each image before
    * decoding the next). No int[] samples array, no per-image
    * full-page allocation.
    */
  def readGray(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    val reader = MimeSniffer.sniff(bytes) match {
      case MimeSniffer.Png => pngReader.get()
      case MimeSniffer.Jpeg => jpegReader.get()
      case _ => return null
    }
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      val raster =
        if (reader.canReadRaster) reader.readRaster(0, null)
        else reader.read(0).getRaster
      val w = raster.getWidth; val h = raster.getHeight
      val gray = ImageOps.scratch.get().bytesB(w * h)
      raster.getDataBuffer match {
        case db: java.awt.image.DataBufferByte
            if raster.getSampleModel.isInstanceOf[java.awt.image.PixelInterleavedSampleModel] =>
          val sm = raster.getSampleModel
            .asInstanceOf[java.awt.image.PixelInterleavedSampleModel]
          val stride = sm.getPixelStride
          val scan = sm.getScanlineStride
          val off = sm.getBandOffsets()(0) + db.getOffset
          val data = db.getData
          if (stride == 1 && scan == w) {
            System.arraycopy(data, off, gray, 0, w * h)
          } else {
            var y = 0
            while (y < h) {
              var x = 0
              val rowOff = off + y * scan
              while (x < w) { gray(y * w + x) = data(rowOff + x * stride); x += 1 }
              y += 1
            }
          }
        case _ =>
          // general fallback (non-byte buffers): per-sample copy
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              gray(y * w + x) = raster.getSample(x, y, 0).toByte; x += 1
            }
            y += 1
          }
      }
      (gray, w, h)
    } catch {
      case _: Exception => null
    } finally {
      reader.setInput(null)
      iis.close()
    }
  }

  /** Decode PNG or JPEG bytes (sniffed) to a BufferedImage; null if the
    * payload is not decodable.
    */
  def read(bytes: Array[Byte]): BufferedImage = {
    val reader = MimeSniffer.sniff(bytes) match {
      case MimeSniffer.Png => pngReader.get()
      case MimeSniffer.Jpeg => jpegReader.get()
      case _ => return null
    }
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } catch {
      case _: Exception => null
    } finally {
      reader.setInput(null)
      iis.close()
    }
  }
}
