package graft

import graft.functions.Codecs
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level checks for the pure-JVM WAV/BMP codecs: encode→decode
  * round-trips, header-field placement, padding handling, and rejection of
  * malformed input (the quarantine path the PERMISSIVE scans rely on).
  */
class CodecsSpec extends AnyFunSuite {

  test("WAV round-trip preserves rate and samples") {
    val samples = Array.tabulate[Short](777)(i => ((i * 37) % 65536 - 32768).toShort)
    val wav = Codecs.encodeWav(22050, samples)
    assert(wav.length == 44 + 777 * 2)
    // RIFF magic + WAVE form type at the documented offsets
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val d = Codecs.decodeWav(wav)
    assert(d.sampleRate == 22050 && d.channels == 1 && d.bitsPerSample == 16)
    assert(d.samples.toSeq == samples.toSeq)
  }

  test("WAV decoder skips unknown chunks like real files carry") {
    val base = Codecs.encodeWav(8000, Array[Short](1, -2, 3))
    // splice a LIST chunk between fmt and data (12 header + 24 fmt bytes)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.slice(0, 36) ++ listChunk ++ base.slice(36, base.length)
    val d = Codecs.decodeWav(spliced)
    assert(d.samples.toSeq == Seq[Short](1, -2, 3))
  }

  test("WAV decoder rejects non-RIFF and non-PCM input") {
    assertThrows[IllegalArgumentException](
      Codecs.decodeWav("not audio at all".getBytes))
    val wav = Codecs.encodeWav(8000, Array[Short](0))
    wav(20) = 2 // format tag -> ADPCM
    assertThrows[IllegalArgumentException](Codecs.decodeWav(wav))
  }

  test("BMP round-trip preserves pixels through padding and bottom-up rows") {
    // w=3 -> 9 data bytes/row, padded to 12: padding path exercised
    val bmp = Codecs.encodeBmp(3, 2, (x, y) => (x, y * 10, x + y))
    val d = Codecs.decodeBmp(bmp)
    assert(d.width == 3 && d.height == 2 && d.bitsPerPixel == 24)
    assert(d.pixels(0)(2) == ((2, 0, 2))) // top row y=0
    assert(d.pixels(1)(0) == ((0, 10, 1)))
  }

  test("BMP decoder rejects wrong magic and unsupported bpp") {
    assertThrows[IllegalArgumentException](
      Codecs.decodeBmp("PNG?????".getBytes))
    val bmp = Codecs.encodeBmp(2, 2, (_, _) => (0, 0, 0))
    bmp(28) = 32 // bpp field
    assertThrows[IllegalArgumentException](Codecs.decodeBmp(bmp))
  }

}
