package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class MimeSnifferSpec extends AnyFunSuite {

  test("magic bytes") {
    assert(MimeSniffer.sniff("%PDF-1.4".getBytes) == MimeSniffer.Pdf)
    assert(MimeSniffer.sniff(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)) == MimeSniffer.Jpeg)
    assert(MimeSniffer.sniff(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)) == MimeSniffer.Png)
    assert(MimeSniffer.sniff("PKrest".getBytes("ISO-8859-1")) == MimeSniffer.Zip)
    assert(MimeSniffer.sniff("hello".getBytes) == MimeSniffer.Unknown)
    assert(MimeSniffer.sniff(Array.emptyByteArray) == MimeSniffer.Unknown)
  }

  test("extension fallback") {
    assert(MimeSniffer.fromExtension("a.PDF") == MimeSniffer.Pdf)
    assert(MimeSniffer.fromExtension("b.jpeg") == MimeSniffer.Jpeg)
    assert(MimeSniffer.fromExtension("c.jpg") == MimeSniffer.Jpeg)
    assert(MimeSniffer.fromExtension("d.png") == MimeSniffer.Png)
    assert(MimeSniffer.fromExtension("e.zip") == MimeSniffer.Zip)
    assert(MimeSniffer.fromExtension("f.txt") == MimeSniffer.Unknown)
  }

  test("allowed types P1") {
    assert(MimeSniffer.isAllowed(MimeSniffer.Pdf))
    assert(!MimeSniffer.isAllowed(MimeSniffer.Unknown))
  }
}
