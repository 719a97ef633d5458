package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM media codecs for the multimodal lane: PPM (P6) and BMP
  * (24-bit uncompressed) image decode, WAV (PCM 16-bit) audio decode,
  * plus the matching encoders used to synthesize deterministic fixture
  * media from the documents table. All three formats are trivially
  * parseable public formats (netpbm spec; BITMAPINFOHEADER layout;
  * RIFF/WAVE chunks), so the decode step needs no codec library — the
  * bytes a user hands us in these formats get REAL pixels and samples
  * out, and the features derived from them are integer-exact and
  * therefore oracle-able.
  *
  * Fixture synthesis is a closed-form function of the media id alone
  * (dims, pixel values, sample values below), which is what lets the
  * DuckDB oracle compute the same features straight from the formula:
  * value parity then proves encode∘decode is the identity on every blob
  * — a decoder bug anywhere (header math, row padding, bottom-up order,
  * channel order, sample endianness) breaks the hash compare.
  *
  * Scale: per-blob work is embarrassingly parallel and map-only; blobs
  * never shuffle — only the small derived feature rows do.
  */
object MediaCodec {

  /** Decoded image: logical top-down row-major pixels, rgb(y*w+x)*3+c,
    * c ∈ {0=R, 1=G, 2=B}, values 0..255. */
  final case class Image(width: Int, height: Int, rgb: Array[Int])

  /** Decoded audio: mono PCM samples. */
  final case class Audio(sampleRate: Int, samples: Array[Short])

  // ---------- fixture synthesis (closed form, mirrored by the oracle) ----

  def mediaTypeFor(id: Long): String = (id % 3) match {
    case 0 => "image/ppm"
    case 1 => "image/bmp"
    case _ => "audio/wav"
  }

  /** Image dims: w in 8..16, h in 8..14 — small, varied, every aHash
    * cell nonempty (w,h >= 8). */
  def imageDims(id: Long): (Int, Int) =
    ((8 + id % 9).toInt, (8 + (id / 3) % 7).toInt)

  /** Pixel channel value at flat index idx = (y*w + x)*3 + c. */
  def pixelValue(id: Long, idx: Int): Int =
    ((id * 97 + idx.toLong * 31) % 256).toInt

  def sampleCount(id: Long): Int = (256 + id % 512).toInt

  /** PCM sample i: small-amplitude deterministic wave in -2048..2047. */
  def sampleValue(id: Long, i: Int): Short =
    (((id * 37 + i.toLong * 101) % 4096) - 2048).toShort

  val WavSampleRate = 8000

  /** The (media_type, encoded bytes) for one media id. */
  def synthesize(id: Long): (String, Array[Byte]) = mediaTypeFor(id) match {
    case mt @ "image/ppm" =>
      val (w, h) = imageDims(id)
      (mt, encodePpm(w, h, Array.tabulate(w * h * 3)(pixelValue(id, _))))
    case mt @ "image/bmp" =>
      val (w, h) = imageDims(id)
      (mt, encodeBmp(w, h, Array.tabulate(w * h * 3)(pixelValue(id, _))))
    case mt =>
      val n = sampleCount(id)
      (mt, encodeWav(Array.tabulate(n)(sampleValue(id, _)), WavSampleRate))
  }

  /** splitmix64 finalizer (public mixing constants) — the per-pixel
    * diffusion for content-keyed media: a LINEAR pixel formula would make
    * two different seeds differ by a near-constant offset, correlating
    * their aHashes; full 64-bit mixing makes distinct seeds' signatures
    * independent (collision ~2⁻⁶⁴). */
  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Content-keyed image synthesis: every property (dims, pixels)
    * derives from the CONTENT seed alone — two documents with identical
    * text get bit-identical images regardless of their ids, which is
    * what lets pixel-level duplicate detection (m06) be oracled against
    * text equality. Format still alternates by id (PPM/BMP) — identical
    * pixels must pair across formats, so the format choice is free. */
  def contentImage(seed: Long): (Int, Int, Array[Int]) = {
    val w = 8 + java.lang.Math.floorMod(mix64(seed), 9L).toInt
    val h = 8 + java.lang.Math.floorMod(mix64(seed + 1), 7L).toInt
    val rgb = Array.tabulate(w * h * 3)(idx =>
      (mix64(seed ^ (idx.toLong * 0x9E3779B97F4A7C15L)) & 0xFF).toInt)
    (w, h, rgb)
  }

  /** Content seed for a text: first 8 bytes of its MD5, big-endian —
    * deterministic, engine-independent, collision-safe at corpus scale. */
  def contentSeed(text: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  // ---------- encoders -------------------------------------------------

  /** PPM P6: "P6\n<w> <h>\n255\n" + raw RGB bytes, top-down row-major. */
  def encodePpm(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h * 3, "encodePpm: rgb length != w*h*3")
    val header = s"P6\n$w $h\n255\n".getBytes(US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < rgb.length) { out(header.length + i) = rgb(i).toByte; i += 1 }
    out
  }

  /** BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, 24 bpp,
    * BI_RGB, positive height = BOTTOM-UP rows, each row padded to a
    * 4-byte boundary, pixels stored B,G,R. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h * 3, "encodeBmp: rgb length != w*h*3")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val fileSize = 54 + dataSize
    val out = new ByteArrayOutputStream(fileSize)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    out.write('B'); out.write('M')
    le32(fileSize); le32(0); le32(54) // reserved, pixel-array offset
    le32(40); le32(w); le32(h)        // info size, width, height (bottom-up)
    le16(1); le16(24)                 // planes, bpp
    le32(0); le32(dataSize)           // BI_RGB, image size
    le32(0); le32(0); le32(0); le32(0) // ppm x/y, colors used/important
    var row = h - 1
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val p = (row * w + x) * 3
        out.write(rgb(p + 2) & 0xff) // B
        out.write(rgb(p + 1) & 0xff) // G
        out.write(rgb(p) & 0xff)     // R
        x += 1
      }
      var pad = w * 3
      while (pad % 4 != 0) { out.write(0); pad += 1 }
      row -= 1
    }
    out.toByteArray
  }

  /** WAV: canonical 44-byte RIFF/WAVE header (PCM, mono, 16-bit) +
    * little-endian samples. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new ByteArrayOutputStream(44 + dataSize)
    def ascii(s: String): Unit = out.write(s.getBytes(US_ASCII), 0, 4)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    ascii("RIFF"); le32(36 + dataSize); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1); le16(1)                  // PCM, mono
    le32(sampleRate); le32(sampleRate * 2) // byte rate = rate * block align
    le16(2); le16(16)                 // block align, bits per sample
    ascii("data"); le32(dataSize)
    samples.foreach(s => le16(s & 0xffff))
    out.toByteArray
  }

  // ---------- decoders (loud failures — exact ops fail loudly) ---------

  /** Sniff + decode an image blob: P6 PPM or 24-bit BMP. */
  def decodeImage(bytes: Array[Byte]): Image =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else throw new IllegalArgumentException(
      s"decodeImage: unrecognized magic in ${bytes.length}-byte blob")

  def decodePpm(bytes: Array[Byte]): Image = {
    var pos = 2 // past "P6"
    def token(): Int = {
      // skip whitespace and '#' comment lines (netpbm allows them)
      var inComment = false
      while (pos < bytes.length &&
        (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') inComment = true
        else if (bytes(pos) == '\n') inComment = false
        pos += 1
      }
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      if (!any) throw new IllegalArgumentException("decodePpm: truncated header")
      v
    }
    val w = token(); val h = token(); val maxval = token()
    if (maxval != 255) throw new IllegalArgumentException(
      s"decodePpm: only maxval 255 supported, got $maxval")
    pos += 1 // exactly one whitespace byte after maxval per spec
    if (bytes.length - pos < w * h * 3) throw new IllegalArgumentException(
      s"decodePpm: ${bytes.length - pos} payload bytes for ${w}x$h")
    Image(w, h, Array.tabulate(w * h * 3)(i => bytes(pos + i) & 0xff))
  }

  def decodeBmp(bytes: Array[Byte]): Image = {
    def le16(at: Int): Int = (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    def le32(at: Int): Int = le16(at) | (le16(at + 2) << 16)
    if (bytes.length < 54) throw new IllegalArgumentException("decodeBmp: short header")
    val dataOffset = le32(10)
    val w = le32(18)
    val hRaw = le32(22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    val bpp = le16(28)
    val compression = le32(30)
    if (bpp != 24 || compression != 0) throw new IllegalArgumentException(
      s"decodeBmp: only 24bpp BI_RGB supported (bpp=$bpp compression=$compression)")
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (bytes.length < dataOffset + rowSize * h)
      throw new IllegalArgumentException("decodeBmp: truncated pixel array")
    val rgb = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      val base = dataOffset + srcRow * rowSize
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        rgb(p) = bytes(base + x * 3 + 2) & 0xff     // R
        rgb(p + 1) = bytes(base + x * 3 + 1) & 0xff // G
        rgb(p + 2) = bytes(base + x * 3) & 0xff     // B
        x += 1
      }
      y += 1
    }
    Image(w, h, rgb)
  }

  def decodeWav(bytes: Array[Byte]): Audio = {
    def le16(at: Int): Int = (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    def le32(at: Int): Int = le16(at) | (le16(at + 2) << 16)
    def tag(at: Int): String = new String(bytes, at, 4, US_ASCII)
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
      throw new IllegalArgumentException("decodeWav: not a RIFF/WAVE stream")
    var pos = 12
    var rate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (rate < 0 || samples == null)) {
      val id = tag(pos); val size = le32(pos + 4)
      id match {
        case "fmt " =>
          val fmt = le16(pos + 8); val ch = le16(pos + 10)
          val bits = le16(pos + 22)
          if (fmt != 1 || ch != 1 || bits != 16)
            throw new IllegalArgumentException(
              s"decodeWav: only PCM mono 16-bit supported (fmt=$fmt ch=$ch bits=$bits)")
          rate = le32(pos + 12)
        case "data" =>
          val n = size / 2
          samples = Array.tabulate(n)(i => le16(pos + 8 + i * 2).toShort)
        case _ => // skip unknown chunk
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (rate < 0 || samples == null)
      throw new IllegalArgumentException("decodeWav: missing fmt/data chunk")
    Audio(rate, samples)
  }

  // ---------- integer-exact features -----------------------------------

  /** Per-channel sums, global min/max, and the 64-bit aHash over an 8×8
    * block-averaged gray grid — all integer math: gray = (r+g+b)/3,
    * cell(x,y) = (y*8/h)*8 + x*8/w, cell value = mean gray (integer
    * division), bit i = cell i's value > the 64-cell mean. Returned as
    * (r_sum, g_sum, b_sum, px_min, px_max, ahashBits, ahashSig). */
  def imageFeatures(img: Image): (Long, Long, Long, Long, Long, String, Long) = {
    val Image(w, h, rgb) = img
    var rSum = 0L; var gSum = 0L; var bSum = 0L
    var mn = 255; var mx = 0
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        val r = rgb(p); val g = rgb(p + 1); val b = rgb(p + 2)
        rSum += r; gSum += g; bSum += b
        if (r < mn) mn = r; if (g < mn) mn = g; if (b < mn) mn = b
        if (r > mx) mx = r; if (g > mx) mx = g; if (b > mx) mx = b
        val cell = cy * 8 + x * 8 / w
        cellSum(cell) += (r + g + b) / 3
        cellN(cell) += 1
        x += 1
      }
      y += 1
    }
    val cavg = Array.tabulate(64)(i => cellSum(i) / cellN(i))
    val gmean = cavg.sum / 64
    val bits = new StringBuilder(64)
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (cavg(i) > gmean) { bits += '1'; sig |= (1L << i) } else bits += '0'
      i += 1
    }
    (rSum, gSum, bSum, mn.toLong, mx.toLong, bits.toString, sig)
  }

  /** (sumSquares, zeroCrossings, durationMs, rms-unrounded): all integer
    * except the final rms double — sqrt is IEEE correctly-rounded, so the
    * value is bit-equal cross-engine given the same sum/count; callers
    * apply the engine's round(…, 9) convention on the FINAL column. */
  def audioFeatures(a: Audio): (Long, Long, Long, Double) = {
    val s = a.samples
    var sumSq = 0L
    var zc = 0L
    var i = 0
    while (i < s.length) {
      sumSq += s(i).toLong * s(i)
      if (i > 0 && ((s(i) < 0) != (s(i - 1) < 0))) zc += 1
      i += 1
    }
    val durMs = s.length.toLong * 1000 / a.sampleRate
    val rms = if (s.length == 0) 0.0 else math.sqrt(sumSq.toDouble / s.length)
    (sumSq, zc, durMs, rms)
  }
}
