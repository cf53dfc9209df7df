package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real byte-level media codecs for the decode stage: binary PPM (P6)
  * images, canonical PCM WAV audio, and YUV4MPEG2 (C420) video — three
  * genuine, tool-compatible formats simple enough to implement without
  * external codec libraries (the zero-egress constraint), so
  * [[MediaOps.decodeFeatures]] certifies an actual byte parse, not a stub.
  *
  * The encoders synthesize complete, VALID payloads (every declared
  * dimension is backed by real pixel/sample bytes); the decoder is strict —
  * it re-derives width/height/duration exclusively from the container
  * headers and rejects any payload whose body does not match its
  * declaration. Tests tamper with single header bytes to pin that the
  * features really come from parsing.
  */
object MediaCodec {

  // ------------------------------------------------------------------ encode

  /** Deterministic filler for pixel/sample bodies. */
  private def body(seed: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = ((seed * 131 + i * 31) & 0xff).toByte; i += 1 }
    out
  }

  /** Binary PPM: `P6\n<w> <h>\n255\n` + w·h RGB triples. */
  def encodePpm(w: Int, h: Int, seed: Long): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ body(seed, w * h * 3)
  }

  val WavRate = 8000
  val WavBits = 8
  val WavChannels = 1

  /** Canonical 44-byte RIFF/WAVE header (PCM fmt chunk + data chunk) over
    * 8-bit mono samples at [[WavRate]] Hz.
    */
  def encodeWav(samples: Int, seed: Long): Array[Byte] = {
    val dataSize = samples * WavChannels * (WavBits / 8)
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(WavChannels.toShort)
    buf.putInt(WavRate)
    buf.putInt(WavRate * WavChannels * (WavBits / 8)) // byte rate
    buf.putShort((WavChannels * (WavBits / 8)).toShort) // block align
    buf.putShort(WavBits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    buf.put(body(seed, dataSize))
    buf.array()
  }

  val Y4mFps = 10

  /** YUV4MPEG2 stream: parameter line, then `FRAME\n` + 4:2:0 planes
    * (w·h·3/2 bytes) per frame. `w`, `h` must be even.
    */
  def encodeY4m(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, s"4:2:0 needs even dims, got ${w}x$h")
    val header = s"YUV4MPEG2 W$w H$h F$Y4mFps:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val frameSize = w * h * 3 / 2
    val out = ByteBuffer.allocate(header.length + frames * (6 + frameSize))
    out.put(header)
    (0 until frames).foreach { f =>
      out.put("FRAME\n".getBytes("US-ASCII"))
      out.put(body(seed + f, frameSize))
    }
    out.array()
  }

  // ------------------------------------------------------------------ decode

  final case class Decoded(width: Int, height: Int, durationS: Double)

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Sniff the container magic and parse strictly. Every feature comes from
    * the HEADER bytes; the body is validated against the declaration
    * (truncated or padded payloads are rejected, like a real demuxer).
    */
  def decode(bytes: Array[Byte]): Decoded = {
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes.length >= 12 && ascii(bytes, 0, 4) == "RIFF" && ascii(bytes, 8, 4) == "WAVE")
      decodeWav(bytes)
    else if (bytes.length >= 9 && ascii(bytes, 0, 9) == "YUV4MPEG2") decodeY4m(bytes)
    else fail(s"unrecognized container (${bytes.length} bytes)")
  }

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, "US-ASCII")

  private def decodePpm(b: Array[Byte]): Decoded = {
    val (w, h, _) = decodePpmBody(b)
    Decoded(w, h, 0.0)
  }

  /** Strict PPM parse that also returns the pixel-body offset, for stages
    * that read the RGB samples themselves (perceptual hashing, resize
    * kernels). Same validation as the feature decode: header-declared
    * dimensions must be backed by exactly w·h RGB triples.
    */
  def decodePpmBody(b: Array[Byte]): (Int, Int, Int) = {
    // P6, then three whitespace-separated ASCII ints: width height maxval
    var i = 2
    def token(): Int = {
      while (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\t' || b(i) == '\r')) i += 1
      val start = i
      while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
      if (i == start) fail("PPM: malformed header token")
      ascii(b, start, i - start).toInt
    }
    val w = token(); val h = token(); val maxval = token()
    if (maxval != 255) fail(s"PPM: unsupported maxval $maxval")
    i += 1 // single whitespace after maxval
    if (b.length - i != w * h * 3)
      fail(s"PPM: declared ${w}x$h needs ${w * h * 3} body bytes, got ${b.length - i}")
    (w, h, i)
  }

  private def decodeWav(b: Array[Byte]): Decoded = {
    val (rate, channels, bits, dataOff, dataSize) = decodeWavBody(b)
    val _ = dataOff
    Decoded(0, 0, dataSize.toDouble * 8 / (rate.toLong * channels * bits))
  }

  /** Strict RIFF/WAVE parse that also returns the PCM body location, for
    * stages that read the samples themselves (audio fingerprinting).
    * Returns (rate, channels, bits, dataOffset, dataSize); same validation
    * as the feature decode.
    */
  def decodeWavBody(b: Array[Byte]): (Int, Int, Int, Int, Int) = {
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    if (b.length < 12 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE")
      fail("WAV: not a RIFF/WAVE container")
    val riffSize = buf.getInt(4)
    if (riffSize != b.length - 8) fail(s"WAV: RIFF size $riffSize vs ${b.length - 8}")
    // walk chunks for fmt and data
    var pos = 12
    var rate = -1; var channels = -1; var bits = -1; var dataSize = -1; var dataOff = -1
    while (pos + 8 <= b.length) {
      val id = ascii(b, pos, 4)
      val size = buf.getInt(pos + 4)
      if (id == "fmt ") {
        if (buf.getShort(pos + 8) != 1) fail("WAV: not PCM")
        channels = buf.getShort(pos + 10)
        rate = buf.getInt(pos + 12)
        bits = buf.getShort(pos + 22)
      } else if (id == "data") {
        dataSize = size
        dataOff = pos + 8
        if (pos + 8 + size != b.length) fail("WAV: data chunk size mismatch")
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (rate <= 0 || channels <= 0 || bits <= 0 || dataSize < 0)
      fail("WAV: missing fmt or data chunk")
    (rate, channels, bits, dataOff, dataSize)
  }

  private def decodeY4m(b: Array[Byte]): Decoded = {
    val eol = b.indexOf('\n'.toByte)
    if (eol < 0) fail("Y4M: no parameter line")
    val params = ascii(b, 0, eol).split(" ")
    def param(tag: Char): Option[String] =
      params.iterator.drop(1).find(_.headOption.contains(tag)).map(_.tail)
    val w = param('W').getOrElse(fail("Y4M: no width")).toInt
    val h = param('H').getOrElse(fail("Y4M: no height")).toInt
    val Array(fn, fd) = param('F').getOrElse(fail("Y4M: no frame rate")).split(":").map(_.toInt)
    param('C').foreach(c => if (c != "420") fail(s"Y4M: unsupported chroma $c"))
    val frameSize = w * h * 3 / 2
    var pos = eol + 1
    var frames = 0
    while (pos < b.length) {
      if (pos + 6 > b.length || ascii(b, pos, 5) != "FRAME") fail("Y4M: bad FRAME marker")
      val fEol = b.indexOf('\n'.toByte, pos)
      if (fEol < 0 || b.length - (fEol + 1) < frameSize) fail("Y4M: truncated frame")
      pos = fEol + 1 + frameSize
      frames += 1
    }
    Decoded(w, h, frames.toDouble * fd / fn)
  }
}
