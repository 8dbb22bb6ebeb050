package graft.ops

/** Pure-JVM codecs for three UNCOMPRESSED media containers — the real
  * decode step behind [[Multimodal]] (no image/audio libraries exist in
  * the offline sandbox, and none are needed for these formats):
  *
  *   - BMP, 24-bit uncompressed (BITMAPINFOHEADER, bottom-up rows padded
  *     to 4 bytes) — the classic Windows device-independent bitmap;
  *   - WAV, PCM 16-bit mono little-endian (canonical 44-byte RIFF
  *     header) — the standard uncompressed audio container;
  *   - PPM (P6, maxval 255) binary image frames, concatenated
  *     back-to-back as a raw video stream (the `ffmpeg -f image2pipe`
  *     shape for uncompressed frame sequences).
  *
  * Decoders parse the real byte layout (magic, chunk walk, padding,
  * bottom-up row order) and throw on malformed or unsupported input —
  * a third-party BMP/WAV/PPM file of the supported profile decodes
  * correctly. Encoders exist so the fixture can synthesize genuine
  * containers deterministically; round-trip identity is spec-tested.
  */
object MediaCodec {

  /** Decoded image: row-major top-down RGB triples (3 bytes/pixel). */
  final case class ImageData(width: Int, height: Int, rgb: Array[Byte])

  /** Decoded audio: PCM samples at `sampleRate` Hz, mono. */
  final case class AudioData(sampleRate: Int, samples: Array[Short])

  /** Decoded video: fixed-geometry RGB frames (each like ImageData.rgb). */
  final case class VideoData(width: Int, height: Int, frames: Array[Array[Byte]])

  // ---------------------------------------------------------------- BMP

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte
    b(off + 3) = (v >>> 24).toByte
  }
  private def putShortLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
  }
  private def intLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def shortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Row stride of a 24 bpp BMP: pixel bytes padded up to 4. */
  def bmpStride(width: Int): Int = (3 * width + 3) / 4 * 4

  /** Encode a 24-bit BMP from top-down RGB data. */
  def encodeBmp(img: ImageData): Array[Byte] = {
    val ImageData(w, h, rgb) = img
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"encodeBmp: need ${w * h * 3} rgb bytes for ${w}x$h, got ${rgb.length}")
    val stride = bmpStride(w)
    val size = 54 + stride * h
    val out = new Array[Byte](size)
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, size)
    putIntLE(out, 10, 54) // pixel data offset
    putIntLE(out, 14, 40) // BITMAPINFOHEADER size
    putIntLE(out, 18, w)
    putIntLE(out, 22, h) // positive height = bottom-up rows
    putShortLE(out, 26, 1) // planes
    putShortLE(out, 28, 24) // bpp
    putIntLE(out, 30, 0) // BI_RGB (uncompressed)
    putIntLE(out, 34, stride * h)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        // BMP stores B,G,R
        out(rowOff + x * 3) = rgb(p + 2)
        out(rowOff + x * 3 + 1) = rgb(p + 1)
        out(rowOff + x * 3 + 2) = rgb(p)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bit uncompressed BMP into top-down RGB. Throws on
    * malformed input or an unsupported profile (compressed, paletted,
    * top-down negative height) rather than guessing. */
  def decodeBmp(bytes: Array[Byte]): ImageData = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "decodeBmp: not a BMP (missing BM magic or truncated header)")
    val dataOff = intLE(bytes, 10)
    val w = intLE(bytes, 18)
    val h = intLE(bytes, 22)
    val bpp = shortLE(bytes, 28)
    val compression = intLE(bytes, 30)
    require(bpp == 24 && compression == 0,
      s"decodeBmp: unsupported profile (bpp=$bpp compression=$compression); only 24-bit BI_RGB")
    require(w > 0 && h > 0, s"decodeBmp: unsupported geometry ${w}x$h (top-down BMPs not handled)")
    val stride = bmpStride(w)
    require(bytes.length >= dataOff + stride * h, "decodeBmp: pixel data truncated")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val rowOff = dataOff + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        rgb(p) = bytes(rowOff + x * 3 + 2)
        rgb(p + 1) = bytes(rowOff + x * 3 + 1)
        rgb(p + 2) = bytes(rowOff + x * 3)
        x += 1
      }
      y += 1
    }
    ImageData(w, h, rgb)
  }

  // ---------------------------------------------------------------- WAV

  /** Encode PCM16 mono into the canonical 44-byte-header WAV. */
  def encodeWav(audio: AudioData): Array[Byte] = {
    val n = audio.samples.length
    val out = new Array[Byte](44 + 2 * n)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putIntLE(out, 4, 36 + 2 * n)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putIntLE(out, 16, 16) // fmt chunk size
    putShortLE(out, 20, 1) // PCM
    putShortLE(out, 22, 1) // mono
    putIntLE(out, 24, audio.sampleRate)
    putIntLE(out, 28, audio.sampleRate * 2) // byte rate
    putShortLE(out, 32, 2) // block align
    putShortLE(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putIntLE(out, 40, 2 * n)
    var i = 0
    while (i < n) { putShortLE(out, 44 + 2 * i, audio.samples(i) & 0xffff); i += 1 }
    out
  }

  /** Decode a PCM16 mono WAV by walking RIFF chunks to `data` (extra
    * chunks like LIST are skipped, as the spec requires). */
  def decodeWav(bytes: Array[Byte]): AudioData = {
    require(bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "decodeWav: not a RIFF/WAVE container")
    var off = 12
    var sampleRate = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = intLE(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"decodeWav: chunk '$id' overruns the container")
      if (id == "fmt ") {
        require(len >= 16, "decodeWav: fmt chunk too short")
        val fmt = shortLE(bytes, off + 8)
        val channels = shortLE(bytes, off + 10)
        val bits = shortLE(bytes, off + 22)
        require(fmt == 1 && channels == 1 && bits == 16,
          s"decodeWav: unsupported profile (fmt=$fmt channels=$channels bits=$bits); only PCM16 mono")
        sampleRate = intLE(bytes, off + 12)
      } else if (id == "data") {
        dataOff = off + 8; dataLen = len
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0, "decodeWav: missing fmt chunk")
    require(dataOff >= 0, "decodeWav: missing data chunk")
    require(dataLen % 2 == 0, "decodeWav: odd PCM16 data length")
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) { samples(i) = shortLE(bytes, dataOff + 2 * i).toShort; i += 1 }
    AudioData(sampleRate, samples)
  }

  // ------------------------------------------------------- PPM / video

  /** Binary PPM (P6, maxval 255) of one frame. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"encodePpm: need ${width * height * 3} bytes, got ${rgb.length}")
    val header = s"P6\n$width $height\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Concatenated P6 frames as a raw video stream. All frames must share
    * one geometry. */
  def encodePpmStream(video: VideoData): Array[Byte] =
    video.frames.iterator
      .map(f => encodePpm(video.width, video.height, f))
      .foldLeft(Array.emptyByteArray)(_ ++ _)

  /** Parse one P6 header at `off`: returns (width, height, pixelDataOff).
    * Handles the whitespace grammar (any ASCII whitespace between tokens)
    * so PPMs from other writers parse too; maxval must be 255. */
  private def parsePpmHeader(bytes: Array[Byte], off: Int): (Int, Int, Int) = {
    require(off + 2 <= bytes.length && bytes(off) == 'P' && bytes(off + 1) == '6',
      "decodePpm: missing P6 magic")
    var p = off + 2
    def skipWs(): Unit = {
      var more = true
      while (more && p < bytes.length) {
        val c = bytes(p)
        if (c == ' ' || c == '\n' || c == '\r' || c == '\t') p += 1
        else if (c == '#') { while (p < bytes.length && bytes(p) != '\n') p += 1 } // comment
        else more = false
      }
    }
    def readInt(): Int = {
      skipWs()
      val start = p
      var v = 0
      while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
        v = v * 10 + (bytes(p) - '0'); p += 1
      }
      require(p > start, "decodePpm: expected an integer token")
      v
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    require(maxval == 255, s"decodePpm: unsupported maxval $maxval")
    require(p < bytes.length, "decodePpm: header runs off the container")
    // exactly ONE whitespace byte separates maxval from pixel data
    (w, h, p + 1)
  }

  /** Decode a concatenated-P6 stream; every frame must share the first
    * frame's geometry. */
  def decodePpmStream(bytes: Array[Byte]): VideoData = {
    require(bytes.nonEmpty, "decodePpmStream: empty stream")
    val frames = Array.newBuilder[Array[Byte]]
    var off = 0
    var w = -1
    var h = -1
    while (off < bytes.length) {
      val (fw, fh, dataOff) = parsePpmHeader(bytes, off)
      if (w < 0) { w = fw; h = fh }
      else require(fw == w && fh == h,
        s"decodePpmStream: frame geometry changed ${fw}x$fh vs ${w}x$h")
      val n = fw * fh * 3
      require(dataOff + n <= bytes.length, "decodePpmStream: frame pixel data truncated")
      frames += java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + n)
      off = dataOff + n
    }
    VideoData(w, h, frames.result())
  }
}
