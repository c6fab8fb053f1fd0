package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal operators: a real PCM WAV
  * encoder/decoder (RIFF container, fmt/data chunks, little-endian) and a
  * real 24-bpp BMP encoder/decoder (BITMAPFILEHEADER + BITMAPINFOHEADER,
  * 4-byte-padded pixel rows, bottom-up row order). No external media
  * library is involved — these parse the actual byte layout of the two
  * simplest mainstream media formats, which is exactly the work a decode
  * stage does before feature extraction.
  *
  * Format references (public layout docs): RIFF/WAVE as in the Microsoft
  * multimedia file format spec; BMP as in the Windows bitmap header spec.
  */
object Codecs {

  // ---------------------------------------------------------------- WAV

  final case class WavData(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Short])

  /** Encode 16-bit mono PCM samples into a complete WAV file. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a PCM WAV file: validates the RIFF/WAVE magics, walks the
    * chunk list (skipping unknown chunks — real files carry LIST/fact),
    * and reads the fmt fields and raw samples. Throws on malformed input;
    * wrap with a try for quarantine flows.
    */
  def decodeWav(bytes: Array[Byte]): WavData = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); buf.get(a); new String(a, "US-ASCII")
    }
    require(ascii(4) == "RIFF", "not a RIFF file")
    buf.getInt // declared riff size
    require(ascii(4) == "WAVE", "not a WAVE file")
    var sampleRate = 0; var channels = 0; var bits = 0
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (samples == null || sampleRate == 0)) {
      val id = ascii(4)
      val len = buf.getInt
      id match {
        case "fmt " =>
          val start = buf.position()
          val fmt = buf.getShort
          require(fmt == 1, s"not PCM (fmt=$fmt)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort.toInt
          require(bits == 16, s"only 16-bit supported (bits=$bits)")
          buf.position(start + len)
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
        case _ => // skip unknown chunk (word-aligned)
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt or data chunk")
    WavData(sampleRate, channels, bits, samples)
  }

  // ---------------------------------------------------------------- BMP

  final case class BmpData(width: Int, height: Int, bitsPerPixel: Int,
      /** pixels(y)(x) = (b, g, r), top-down row order. */
      pixels: Array[Array[(Int, Int, Int)]])

  /** Encode a 24-bpp bottom-up BMP; pixel(x, y) gives (b, g, r) with y=0
    * the TOP row (the encoder writes rows bottom-up as the format wants).
    */
  def encodeBmp(w: Int, h: Int, pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3 // rows padded to 4 bytes
    val dataLen = rowBytes * h
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54)        // reserved, pixel offset
    buf.putInt(40).putInt(w).putInt(h)           // BITMAPINFOHEADER
      .putShort(1).putShort(24)                  // planes, bpp
      .putInt(0).putInt(dataLen)                 // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) {                             // bottom-up
      var x = 0
      while (x < w) {
        val (b, g, r) = pixel(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode a 24-bpp uncompressed BMP: validates the BM magic, reads the
    * pixel-array offset and dimensions from the info header, honors row
    * padding and bottom-up order. Returns pixels in top-down order.
    */
  def decodeBmp(bytes: Array[Byte]): BmpData = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "not a BMP")
    buf.getInt; buf.getShort; buf.getShort
    val pixelOffset = buf.getInt
    val hdrSize = buf.getInt
    require(hdrSize >= 40, s"unsupported header size $hdrSize")
    val w = buf.getInt
    val h = buf.getInt
    require(h > 0, "top-down BMPs not supported")
    buf.getShort
    val bpp = buf.getShort.toInt
    require(bpp == 24, s"only 24bpp supported (bpp=$bpp)")
    val compression = buf.getInt
    require(compression == 0, s"compressed BMP not supported ($compression)")
    val rowBytes = (w * 3 + 3) & ~3
    val pixels = Array.ofDim[(Int, Int, Int)](h, w)
    var y = 0
    while (y < h) {
      // row y from the top lives at file row (h-1-y) — bottom-up storage
      buf.position(pixelOffset + (h - 1 - y) * rowBytes)
      var x = 0
      while (x < w) {
        val b = buf.get() & 0xff; val g = buf.get() & 0xff
        val r = buf.get() & 0xff
        pixels(y)(x) = (b, g, r)
        x += 1
      }
      y += 1
    }
    BmpData(w, h, bpp, pixels)
  }
}
