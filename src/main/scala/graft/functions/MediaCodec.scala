package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media container codecs for the multimodal pipeline: a real
  * BMP (BITMAPINFOHEADER, 24-bpp) writer/parser and a real WAV (RIFF
  * PCM16 mono) writer/parser — no native image/audio libraries, which the
  * container doesn't ship. The DECODER is the product surface: it sniffs
  * the container magic, parses the headers at their fixed little-endian
  * offsets, walks the payload (pixel array with 4-byte row stride / PCM16
  * sample stream), and reduces to exact integer statistics, so the whole
  * decode → feature path is oracle-checkable with fixed-offset byte math.
  *
  * The encoders exist so tests and the synthetic `media` table can
  * produce REAL containers deterministically from document bytes; at
  * deployment the decoder reads whatever BMP/WAV bytes the lake holds.
  */
object MediaCodec {

  /** Exact integer features of one decoded media payload.
    *  - bmp: dim1=width, dim2=height, valSum=Σ all pixel-array bytes
    *    (channels included), valMin/valMax over pixel-array bytes.
    *  - wav: dim1=sample rate, dim2=sample count, valSum=Σ samples
    *    (signed PCM16), valMin/valMax over samples.
    */
  final case class MediaFeatures(fmt: String, dim1: Long, dim2: Long,
                                 valSum: Long, valMin: Long, valMax: Long)

  /** 24-bpp bottom-up BMP from a grayscale byte array (one value per
    * pixel, replicated across B,G,R). Row stride pads to 4 bytes per the
    * format; pixels are written in index order (stats are order-free).
    */
  def encodeBmp24(gray: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(gray.length == width * height, "gray must be width*height values")
    val stride = ((width * 3 + 3) / 4) * 4
    val pixelBytes = stride * height
    val fileSize = 54 + pixelBytes
    val buf = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(fileSize)
    buf.putInt(0)           // reserved
    buf.putInt(54)          // pixel-array offset
    buf.putInt(40)          // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height)      // positive: bottom-up
    buf.putShort(1)         // planes
    buf.putShort(24)        // bpp
    buf.putInt(0)           // BI_RGB
    buf.putInt(pixelBytes)
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(0).putInt(0) // palette
    var row = 0
    while (row < height) {
      var x = 0
      while (x < width) {
        val g = (gray(row * width + x) & 0xff).toByte
        buf.put(g).put(g).put(g)
        x += 1
      }
      var pad = width * 3
      while (pad < stride) { buf.put(0.toByte); pad += 1 }
      row += 1
    }
    buf.array()
  }

  /** RIFF/WAVE, PCM (format 1), mono, 16-bit little-endian samples. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataBytes = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataBytes)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)          // fmt chunk size
    buf.putShort(1)         // PCM
    buf.putShort(1)         // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2)         // block align
    buf.putShort(16)        // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataBytes)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Sniff the container magic and decode. Returns None for payloads that
    * are neither a parseable BMP nor a parseable WAV (corrupt rows are
    * data, not exceptions — callers route them to a quarantine side).
    */
  def decode(bytes: Array[Byte]): Option[MediaFeatures] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 12 &&
             bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
             bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
      decodeWav(bytes)
    else None

  /** Validated 24-bpp BMP geometry: pixel-array offset, dimensions, and
    * row stride. One header walk shared by the stats decode and the
    * perceptual hash.
    */
  private final case class BmpGeom(pixelOffset: Int, width: Int, height: Int,
                                   stride: Int)

  private def bmpGeom(bytes: Array[Byte]): Option[BmpGeom] = {
    if (bytes.length < 54) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xffff
    if (width <= 0 || height <= 0 || bpp != 24) return None
    // stride math in Long: a crafted width near Int.MaxValue/3 would
    // overflow Int stride to negative and slip past the bounds check
    val strideL = ((width.toLong * 3 + 3) / 4) * 4
    if (pixelOffset < 54 ||
        pixelOffset.toLong + strideL * height > bytes.length) return None
    Some(BmpGeom(pixelOffset, width, height, strideL.toInt))
  }

  /** 60-bit perceptual average-hash (aHash) of a BMP: nearest-neighbour
    * downsample of the channel-0 (blue) pixel bytes to an 8×8 grid in
    * FILE row order, then bit k = 60·cell(k) > Σcells over the first 60
    * cells in row-major order. 60 bits (not 64) is deliberate: the
    * fingerprint slots straight into the simhash 4×15-bit band-join
    * machinery, keeping its pigeonhole guarantee (≤3 differing bits
    * always share a band) with no out-of-band bits, and every engine can
    * build it without shifting into the sign bit. All-integer, so the
    * DuckDB oracle reproduces it exactly from the source bytes.
    * Returns None for anything that is not a parseable 24-bpp BMP
    * (WAVs and corrupt payloads drop out, matching decode()).
    */
  def ahash60(bytes: Array[Byte]): Option[Long] =
    if (!(bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')) None
    else bmpGeom(bytes).map { g =>
      val cells = new Array[Long](60)
      var k = 0
      while (k < 60) {
        // grid math in Long: 7·height (or 7·width) overflows Int for a
        // legitimately tall/wide BMP that passes bmpGeom's bounds —
        // same hardening as the stride math there and afp60's bound()
        val r = ((k / 8).toLong * g.height / 8).toInt
        val c = ((k % 8).toLong * g.width / 8).toInt
        cells(k) = bytes(g.pixelOffset + r * g.stride + c * 3) & 0xff
        k += 1
      }
      val s = cells.sum
      var fp = 0L
      k = 0
      while (k < 60) {
        if (60L * cells(k) > s) fp |= 1L << k
        k += 1
      }
      fp
    }

  /** Nearest-neighbour RESIZE of a 24-bpp BMP's channel-0 (blue) bytes to
    * an ow×oh grid in FILE row order — [[ahash60]]'s sampling rule
    * generalized to an arbitrary target geometry and returning the pixels
    * themselves (the thumbnail payload) instead of folding them into a
    * fingerprint. Output cell k (row-major) samples source
    * (row (k/ow)·height/oh, col (k%ow)·width/ow); grid math in Long for
    * the same overflow hardening as ahash60. Returns None for anything
    * that is not a parseable 24-bpp BMP (WAVs and corrupt payloads drop
    * out, matching decode()).
    */
  def resizeGray(bytes: Array[Byte], ow: Int, oh: Int): Option[Array[Int]] =
    if (!(bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')) None
    else bmpGeom(bytes).map { g =>
      Array.tabulate(ow * oh) { k =>
        val r = ((k / ow).toLong * g.height / oh).toInt
        val c = ((k % ow).toLong * g.width / ow).toInt
        bytes(g.pixelOffset + r * g.stride + c * 3) & 0xff
      }
    }

  private def decodeBmp(bytes: Array[Byte]): Option[MediaFeatures] = {
    val g = bmpGeom(bytes) match {
      case Some(v) => v
      case None => return None
    }
    val pixelOffset = g.pixelOffset
    val width = g.width
    val height = g.height
    val stride = g.stride
    var sum = 0L
    var min = Long.MaxValue
    var max = Long.MinValue
    var row = 0
    while (row < height) {
      val base = pixelOffset + row * stride
      var i = 0
      val rowBytes = width * 3 // stride padding is filler, not pixel data
      while (i < rowBytes) {
        val v = (bytes(base + i) & 0xff).toLong
        sum += v
        if (v < min) min = v
        if (v > max) max = v
        i += 1
      }
      row += 1
    }
    Some(MediaFeatures("bmp", width.toLong, height.toLong, sum, min, max))
  }

  /** Validated PCM16 WAV geometry: sample rate, data offset, and sample
    * count. One RIFF chunk walk shared by the stats decode and the
    * perceptual audio fingerprint.
    */
  private final case class WavGeom(sampleRate: Int, dataOff: Int, n: Int)

  private def wavGeom(bytes: Array[Byte]): Option[WavGeom] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // walk RIFF chunks after "WAVE" — real WAVs may carry LIST/fact
    // chunks before fmt/data, so offsets 12+ are discovered, not assumed
    var off = 12
    var sampleRate = 0
    var bits = 0
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= bytes.length && (dataOff < 0 || sampleRate == 0)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = buf.getInt(off + 4)
      // bound math in Long: a near-Int.MaxValue size field would overflow
      // the sum negative, pass the check, then throw from the sample loop
      // instead of quarantining (decode's contract is None, not exceptions)
      if (size < 0 || off.toLong + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          // wFormatTag must be 1 (plain PCM): a compressed or
          // WAVE_FORMAT_EXTENSIBLE container whose fmt happens to report
          // 16 bits per sample would otherwise walk the data chunk as
          // raw PCM16 and emit plausible-but-wrong stats and a
          // meaningless fingerprint — quarantine (None) is the contract
          // (r18 self-review)
          if ((buf.getShort(off + 8) & 0xffff) != 1) return None
          sampleRate = buf.getInt(off + 12)
          bits = buf.getShort(off + 22) & 0xffff
        case "data" =>
          dataOff = off + 8
          dataLen = size
        case _ => ()
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || bits != 16 || dataOff < 0) return None
    Some(WavGeom(sampleRate, dataOff, dataLen / 2))
  }

  private def decodeWav(bytes: Array[Byte]): Option[MediaFeatures] =
    wavGeom(bytes).map { g =>
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var sum = 0L
      var min = Long.MaxValue
      var max = Long.MinValue
      var i = 0
      while (i < g.n) {
        val v = buf.getShort(g.dataOff + 2 * i).toLong
        sum += v
        if (v < min) min = v
        if (v > max) max = v
        i += 1
      }
      if (g.n == 0) { min = 0L; max = 0L }
      MediaFeatures("wav", g.sampleRate.toLong, g.n.toLong, sum, min, max)
    }

  /** Per-container QUALITY stats (q_mm_quality): the curation signals
    * that catch degenerate media before training —
    *  - bmp: nUnits = pixel bytes (padding excluded, like [[decode]]),
    *    metricA = the variance numerator n·Σb² − (Σb)² (0 ⇔ every pixel
    *    byte equal = blank/flat frame), metricB = Σb. The numerator is
    *    n²·var ≤ n²·127.5², which outgrows Long at n ≈ 2.4e7 pixel
    *    bytes (~8 MP high-contrast) — so it accumulates in BigInt and
    *    SATURATES at Long.MaxValue past the exact envelope (a saturated
    *    value is by definition non-zero, so the blank-frame flag stays
    *    correct at any size; the oracle never sees saturation because
    *    DuckDB BIGINT would error first, and fixture images are tiny).
    *  - wav: nUnits = samples, metricA = full-scale CLIP count
    *    (sample = ±32767/−32768 — the hard-clipping distortion signal),
    *    metricB = Σ|sample|.
    * Same geometry walks as [[decode]]; anything unparseable is None.
    */
  final case class MediaQuality(fmt: String, nUnits: Long,
                                metricA: Long, metricB: Long)

  def quality(bytes: Array[Byte]): Option[MediaQuality] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      bmpGeom(bytes).map { g =>
        var n = 0L; var s = 0L; var s2 = 0L
        var row = 0
        while (row < g.height) {
          val base = g.pixelOffset + row * g.stride
          var i = 0
          val rowBytes = g.width * 3
          while (i < rowBytes) {
            val v = (bytes(base + i) & 0xff).toLong
            n += 1; s += v; s2 += v * v
            i += 1
          }
          row += 1
        }
        // s ≤ 255n and s2 ≤ 255²n stay in Long to n ≈ 1.4e14 bytes, but
        // the PRODUCTS wrap from ~2.4e7 — widen the final combination
        val varNum = BigInt(n) * BigInt(s2) - BigInt(s) * BigInt(s)
        val varNumL =
          if (varNum.isValidLong) varNum.toLong else Long.MaxValue
        MediaQuality("bmp", n, varNumL, s)
      }
    else if (bytes.length >= 12 &&
             bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
             bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
             bytes(10) == 'V' && bytes(11) == 'E')
      wavGeom(bytes).map { g =>
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        var clips = 0L; var absSum = 0L
        var i = 0
        while (i < g.n) {
          val v = buf.getShort(g.dataOff + 2 * i).toLong
          if (v == 32767L || v == -32768L) clips += 1
          absSum += math.abs(v)
          i += 1
        }
        MediaQuality("wav", g.n.toLong, clips, absSum)
      }
    else None

  /** 60-bit perceptual audio fingerprint (amplitude-envelope hash) of a
    * PCM16 WAV: the sample stream splits into 60 equal-span frames
    * (frame k covers samples [k·n DIV 60, (k+1)·n DIV 60)), frame energy
    * is the sum of |sample|, and bit k = frame k's MEAN energy above the
    * stream mean — compared cross-multiplied (energy_k·n > total·count_k)
    * so the math stays exact integer at any frame skew; no floats, no
    * division. 60 bits for the same reason as [[ahash60]]: the
    * fingerprint drops straight into the simhash 4×15-bit band-join
    * machinery with its ≤3-bit pigeonhole guarantee intact. Frames with
    * no samples (n < 60) get bit 0 on both sides of the oracle (0 > 0).
    * Returns None for anything that is not a parseable PCM16 WAV (BMPs
    * and corrupt payloads drop out).
    */
  def afp60(bytes: Array[Byte]): Option[Long] =
    if (!(bytes.length >= 12 &&
          bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      None
    else wavGeom(bytes).map { g =>
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      // frame k = samples [k·n DIV 60, (k+1)·n DIV 60): consecutive
      // floor-division boundaries tile [0, n) exactly, and the oracle's
      // list slices use the IDENTICAL bounds
      // boundary math in Long: k·n overflows Int for a (legitimate)
      // multi-GiB data chunk
      def bound(k: Int): Int = (k.toLong * g.n / 60).toInt
      val fs = new Array[Long](60)
      var tot = 0L
      var k = 0
      while (k < 60) {
        var i = bound(k)
        val hi = bound(k + 1)
        while (i < hi) {
          val v = math.abs(buf.getShort(g.dataOff + 2 * i).toLong)
          fs(k) += v
          tot += v
          i += 1
        }
        k += 1
      }
      var fp = 0L
      k = 0
      while (k < 60) {
        val cnt = (bound(k + 1) - bound(k)).toLong
        // BigInt: energy·n reaches n²·2¹⁵, past 2⁶³ for a ~17-minute
        // 16 kHz chunk — 60 arbitrary-precision compares per row are
        // noise next to the sample walk above
        if (BigInt(fs(k)) * g.n > BigInt(tot) * cnt) fp |= 1L << k
        k += 1
      }
      fp
    }
}
