package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** REAL image pixel decoding for the one mainstream format that needs
  * no codec: uncompressed 24-bit BMP stores raw BGR bytes. The image
  * twin of [[PcmStats]] — full header validation plus the padded-row
  * pixel loop as ONE codegen'd expression, so pixel statistics run at
  * scan speed with the payload never leaving the row. PNG pixels are
  * decoded too ([[PngPixelStats]] — zlib ships with the JDK), GIF via
  * its self-contained LZW ([[GifPixelStats]]), and JPEG via the JDK's
  * own baseline codec ([[JpegPixelStats]]) — every E5 image format
  * decodes for REAL; the header-metadata tier
  * ([[graft.operators.Multimodal]]) remains as the cheap screen.
  *
  * Emits `struct(width, height, n_pixels, sum_r, sum_g, sum_b)` —
  * exact integer channel sums (the inputs to mean-brightness /
  * channel-balance quality filters) — or NULL for anything that is not
  * a well-formed uncompressed 24-bit BITMAPINFOHEADER BMP (wrong
  * magic, other bit depths, BI_RLE/BI_BITFIELDS compression, truncated
  * pixel array, nonpositive dimensions).
  */
case class BmpPixelStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BmpPixelStats.schema

  override def nullable: Boolean = true

  override def prettyName: String = "bmp_pixel_stats"

  override def nullSafeEval(payload: Any): Any =
    BmpPixelStats.compute(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.BmpPixelStats$$.MODULE$$.compute($b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BmpPixelStats =
    copy(child = newChild)
}

object BmpPixelStats {

  val schema: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def leS32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Strict decode: BITMAPFILEHEADER ('BM', pixel-array offset) +
    * BITMAPINFOHEADER (size ≥ 40, planes 1, 24 bpp, BI_RGB), rows
    * bottom-up or top-down (negative height), stride padded to 4
    * bytes. Channel sums are orientation-invariant, so row order never
    * matters to the result — only the padding skip does.
    */
  def compute(b: Array[Byte]): InternalRow = {
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return null
    val dataOff = leS32(b, 10)
    val dibSize = leS32(b, 14)
    val width = leS32(b, 18)
    val rawHeight = leS32(b, 22)
    val planes = leU16(b, 26)
    val bpp = leU16(b, 28)
    val compression = leS32(b, 30)
    if (dibSize < 40 || planes != 1 || bpp != 24 || compression != 0) return null
    // height in LONG: math.abs(Int.MinValue) IS Int.MinValue, so a
    // hostile height of 0x80000000 would stay negative, skip the pixel
    // loop entirely, and return a garbage non-null row
    val heightL = math.abs(rawHeight.toLong)
    if (width <= 0 || heightL == 0 || dataOff < 54) return null
    // stride in LONG: a hostile width near Int.MaxValue overflows
    // width*3 to a negative int, which would slip past the bounds
    // check and decode as an empty raster instead of null
    val strideL = (width.toLong * 3 + 3) & ~3L // rows padded to 4 bytes
    // DIVISION-form bounds check: strideL · heightL can itself wrap
    // Long for combined hostile dims (2.1e9 × 1.5e9 ≈ 9.4e18 → negative
    // product → a vacuously-passing additive check → the pixel loop
    // reads out of bounds). heightL > avail/strideL is overflow-free
    // (strideL ≥ 4; a dataOff past the buffer makes avail negative and
    // fails for every height).
    val avail = b.length.toLong - dataOff
    if (avail < 0 || heightL > avail / strideL) return null
    val stride = strideL.toInt // safe: stride ≤ avail ≤ b.length < 2^31
    val height = heightL.toInt
    var sumR = 0L
    var sumG = 0L
    var sumB = 0L
    var row = 0
    while (row < height) {
      var i = dataOff + row * stride
      val end = i + width * 3
      while (i < end) {
        sumB += b(i) & 0xff
        sumG += b(i + 1) & 0xff
        sumR += b(i + 2) & 0xff
        i += 3
      }
      row += 1
    }
    InternalRow(width.toLong, height.toLong, width.toLong * height,
      sumR, sumG, sumB)
  }

  /** Column-level entry point. */
  def bmpPixelStats(payload: Column): Column =
    ColumnBridge.column(BmpPixelStats(ColumnBridge.expression(payload)))

  /** Fixture-side BMP assembly (the ingest twin of [[compute]]): a
    * minimal bottom-up uncompressed 24-bit BMP around (r, g, b) pixel
    * rows given top-to-bottom. Used by specs and the q_bmp_pixels
    * fixture builder.
    */
  def bmpBytes(width: Int, height: Int,
               pixels: Array[(Int, Int, Int)]): Array[Byte] = {
    require(pixels.length == width * height, "pixels must fill the raster")
    val stride = (width * 3 + 3) & ~3
    val dataLen = stride * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + dataLen).putInt(0).putInt(54)
    bb.putInt(40).putInt(width).putInt(height) // bottom-up
    bb.putShort(1).putShort(24)
    bb.putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up: last pixel row first in the file
    var row = height - 1
    while (row >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, cb) = pixels(row * width + x)
        bb.put(cb.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      row -= 1
    }
    bb.array()
  }
}

/** REAL compressed-image pixel decoding: PNG's "codec" is zlib — which
  * the JDK ships (`java.util.zip`) — plus five per-scanline predictor
  * filters defined in the PNG spec (RFC 2083 §6). So unlike JPEG's DCT
  * entropy coding, FULL PNG pixel decode needs nothing this container
  * lacks: chunk walk with CRC32 verification, concatenated-IDAT
  * inflate, and None/Sub/Up/Average/Paeth unfiltering, emitting the
  * same exact channel-sum struct as [[BmpPixelStats]]. This upgrades
  * the E5 multimodal tier from "PNG header metadata" to "PNG pixels".
  * (GIF-LZW and JPEG pixels followed — [[GifPixelStats]] /
  * [[JpegPixelStats]] — so no format is left at the header-only tier.)
  *
  * Strictness: 8-bit RGB (color type 2), non-interlaced only; any
  * malformed structure — bad signature, chunk CRC mismatch, truncated
  * chunk, inflate error, wrong decompressed size — returns NULL, as
  * does a raster larger than [[PngPixelStats.MaxRawBytes]] (the
  * zip-bomb guard: IDAT is attacker-compressed, the declared dims size
  * the inflate buffer, so the decoder refuses oversized rasters
  * instead of allocating them).
  *
  * Not whole-stage-codegen'd arithmetic like the BMP walk — the value
  * IS produced inside generated code, but via one static call whose
  * body drives Inflater (stateful JDK native); that is the same
  * codegen shape Spark's own codec-touching expressions use.
  */
case class PngPixelStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BmpPixelStats.schema

  override def nullable: Boolean = true

  override def prettyName: String = "png_pixel_stats"

  override def nullSafeEval(payload: Any): Any =
    PngPixelStats.compute(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.PngPixelStats$$.MODULE$$.compute($b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PngPixelStats =
    copy(child = newChild)
}

object PngPixelStats {

  /** Refuse rasters whose decompressed size exceeds 64 MiB. */
  val MaxRawBytes: Long = 1L << 26

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def crcOf(b: Array[Byte], typeOff: Int, dataLen: Int): Long = {
    val crc = new java.util.zip.CRC32
    crc.update(b, typeOff, 4 + dataLen)
    crc.getValue
  }

  private def paeth(a: Int, up: Int, c: Int): Int = {
    val p = a + up - c
    val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
  }

  /** Strict decode; see the class doc for the acceptance contract. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b.length < 8) return null
    var i = 0
    while (i < 8) { if (b(i) != Signature(i)) return null; i += 1 }
    var pos = 8
    var width = 0L
    var height = 0L
    var sawIhdr = false
    var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      if (pos + 8 > b.length) return null
      val len = beU32(b, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > b.length) return null
      val dataOff = pos + 8
      val ilen = len.toInt
      if (crcOf(b, pos + 4, ilen) != beU32(b, dataOff + ilen)) return null
      val ctype = new String(b, pos + 4, 4, "US-ASCII")
      ctype match {
        case "IHDR" =>
          if (sawIhdr || ilen != 13) return null
          width = beU32(b, dataOff)
          height = beU32(b, dataOff + 4)
          val bitDepth = b(dataOff + 8) & 0xff
          val colorType = b(dataOff + 9) & 0xff
          val compression = b(dataOff + 10) & 0xff
          val filterMethod = b(dataOff + 11) & 0xff
          val interlace = b(dataOff + 12) & 0xff
          if (bitDepth != 8 || colorType != 2 || compression != 0 ||
            filterMethod != 0 || interlace != 0) return null
          if (width <= 0 || height <= 0) return null
          sawIhdr = true
        case "IDAT" =>
          if (!sawIhdr) return null
          idat.write(b, dataOff, ilen)
        case "IEND" =>
          if (!sawIhdr || ilen != 0) return null
          sawIend = true
        case _ => if (!sawIhdr) return null // ancillary chunks skipped
      }
      pos = dataOff + ilen + 4
    }
    // bound each dim BEFORE the product: 32-bit dims near 2^32 would
    // wrap height·(3·width+1) past Long and skip the byte bound below
    if (width > MaxRawBytes || height > MaxRawBytes) return null
    val stride = width * 3
    val rawLen = height * (stride + 1) // ≤ 3·2^52 + 2^26: no overflow
    if (rawLen > MaxRawBytes) return null
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // all input was provided up front, so ANY zero-progress state
        // (truncated stream, or the FDICT preset-dictionary flag that
        // stalls Inflater awaiting setDictionary) is terminal — without
        // this the FDICT case loops forever
        if (n == 0) return null
        got += n
      }
      if (got != raw.length) return null
      // surplus pixel data is as malformed as missing data
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) > 0) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    // unfilter in place, summing as we go
    val w3 = stride.toInt
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var row = 0
    while (row < height) {
      val base = row * (w3 + 1)
      val filter = raw(base) & 0xff
      if (filter > 4) return null
      var x = 0
      while (x < w3) {
        val idx = base + 1 + x
        val left = if (x >= 3) raw(idx - 3) & 0xff else 0
        val up = if (row > 0) raw(idx - (w3 + 1)) & 0xff else 0
        val upLeft =
          if (row > 0 && x >= 3) raw(idx - (w3 + 1) - 3) & 0xff else 0
        val pred = filter match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        val v = ((raw(idx) & 0xff) + pred) & 0xff
        raw(idx) = v.toByte
        (x % 3) match {
          case 0 => sumR += v
          case 1 => sumG += v
          case 2 => sumB += v
        }
        x += 1
      }
      row += 1
    }
    InternalRow(width, height, width * height, sumR, sumG, sumB)
  }

  /** Column-level entry point. */
  def pngPixelStats(payload: Column): Column =
    ColumnBridge.column(PngPixelStats(ColumnBridge.expression(payload)))

  /** Fixture-side PNG assembly (the ingest twin of [[compute]]): a
    * REAL spec-conformant PNG — zlib-deflated IDAT (split into two
    * chunks when the stream is long enough, exercising concatenation)
    * with each scanline filtered by `filterFor(row)` (default cycles
    * all five predictors, so a round trip proves every unfilter path).
    */
  def pngBytes(width: Int, height: Int, pixels: Array[(Int, Int, Int)],
               filterFor: Int => Int = _ % 5): Array[Byte] = {
    require(pixels.length == width * height, "pixels must fill the raster")
    val w3 = width * 3
    val raw = new Array[Byte](height * (w3 + 1))
    // raw (unfiltered) scanlines first, for predictor inputs
    val plain = new Array[Byte](height * w3)
    var p = 0
    pixels.foreach { case (r, g, bl) =>
      plain(p) = r.toByte; plain(p + 1) = g.toByte; plain(p + 2) = bl.toByte
      p += 3
    }
    var row = 0
    while (row < height) {
      val f = filterFor(row)
      require(f >= 0 && f <= 4, "PNG filter must be 0-4")
      raw(row * (w3 + 1)) = f.toByte
      var x = 0
      while (x < w3) {
        val cur = plain(row * w3 + x) & 0xff
        val left = if (x >= 3) plain(row * w3 + x - 3) & 0xff else 0
        val up = if (row > 0) plain((row - 1) * w3 + x) & 0xff else 0
        val upLeft =
          if (row > 0 && x >= 3) plain((row - 1) * w3 + x - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        raw(row * (w3 + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      row += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val z = zbuf.toByteArray
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length)
      out.put(ctype.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(ctype.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val idats =
      if (z.length > 16) Seq(z.take(z.length / 2), z.drop(z.length / 2))
      else Seq(z)
    (Signature +: chunk("IHDR", ihdr) +: idats.map(chunk("IDAT", _)) :+
      chunk("IEND", Array.empty[Byte])).reduce(_ ++ _)
  }
}

/** REAL GIF pixel decoding: GIF's "codec" is LZW — a pure dictionary
  * decoder needing no library at all — plus a palette lookup. With
  * [[BmpPixelStats]] (raw), [[PngPixelStats]] (zlib), this (LZW) and
  * [[JpegPixelStats]] (the JDK's own baseline-JPEG codec), every
  * mainstream still-image container decodes for real in this library.
  *
  * Strictness (the encoder twin's envelope, like PNG's color-type-2
  * rule): GIF87a/89a, global color table required, a single
  * non-interlaced image with no local color table; extension blocks
  * are skipped (89a graphics-control etc.). Any structural defect —
  * bad signature, truncated sub-block, LZW code past the dictionary,
  * index outside the palette, wrong decoded pixel count — returns
  * NULL. Emits the same channel-sum struct as the BMP/PNG twins.
  */
case class GifPixelStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BmpPixelStats.schema

  override def nullable: Boolean = true

  override def prettyName: String = "gif_pixel_stats"

  override def nullSafeEval(payload: Any): Any =
    GifPixelStats.compute(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.GifPixelStats$$.MODULE$$.compute($b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GifPixelStats =
    copy(child = newChild)
}

object GifPixelStats {

  /** Refuse rasters past 64 Mi pixels (the PNG guard's LZW twin). */
  val MaxPixels: Long = 1L << 26

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Strict decode; see the class doc for the acceptance contract. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b.length < 13) return null
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    val sw = leU16(b, 6)
    val sh = leU16(b, 8)
    val packed = b(10) & 0xff
    if ((packed & 0x80) == 0) return null // global color table required
    val gctSize = 1 << ((packed & 0x07) + 1)
    var pos = 13
    if (pos + gctSize * 3 > b.length) return null
    val palOff = pos
    pos += gctSize * 3
    // skip extension blocks (0x21 label, sub-blocks until 0)
    while (pos < b.length && (b(pos) & 0xff) == 0x21) {
      pos += 2
      while (pos < b.length && (b(pos) & 0xff) != 0) {
        pos += 1 + (b(pos) & 0xff)
        if (pos > b.length) return null
      }
      if (pos >= b.length) return null
      pos += 1
    }
    if (pos >= b.length || (b(pos) & 0xff) != 0x2c) return null
    if (pos + 10 > b.length) return null
    val iw = leU16(b, pos + 5)
    val ih = leU16(b, pos + 7)
    val ipacked = b(pos + 9) & 0xff
    if ((ipacked & 0x80) != 0) return null // local color table: out of envelope
    if ((ipacked & 0x40) != 0) return null // interlaced: out of envelope
    if (iw <= 0 || ih <= 0 || iw != sw || ih != sh) return null
    val nPix = iw.toLong * ih
    if (nPix > MaxPixels) return null
    pos += 10
    if (pos >= b.length) return null
    val minCode = b(pos) & 0xff
    if (minCode < 2 || minCode > 8) return null
    pos += 1
    // concatenate data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (pos >= b.length) return null
      val len = b(pos) & 0xff
      pos += 1
      if (len == 0) done = true
      else {
        if (pos + len > b.length) return null
        data.write(b, pos, len)
        pos += len
      }
    }
    if (pos >= b.length || (b(pos) & 0xff) != 0x3b) return null
    // LZW decode
    val z = data.toByteArray
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val stack = new Array[Int](4097)
    var nextCode = eoi + 1
    var codeSize = minCode + 1
    var prev = -1
    var bitPos = 0
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var out = 0L
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    def emit(idx: Int): Boolean = {
      if (idx >= gctSize) return false
      val o = palOff + idx * 3
      sumR += b(o) & 0xff; sumG += b(o + 1) & 0xff; sumB += b(o + 2) & 0xff
      out += 1
      true
    }
    def emitSeq(code: Int): Boolean = {
      var c = code
      var sp = 0
      while (c >= clear) {
        if (sp >= stack.length) return false
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      if (!emit(c)) return false
      while (sp > 0) { sp -= 1; if (!emit(stack(sp))) return false }
      true
    }
    var eoiSeen = false
    while (!eoiSeen) {
      if (bitPos + codeSize > z.length * 8) return null
      var code = 0
      var i = 0
      while (i < codeSize) {
        val bp = bitPos + i
        if ((z(bp >> 3) & (1 << (bp & 7))) != 0) code |= 1 << i
        i += 1
      }
      bitPos += codeSize
      if (code == clear) {
        nextCode = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (code == eoi) {
        eoiSeen = true
      } else if (prev == -1) {
        if (code >= clear || !emit(code)) return null
        prev = code
      } else {
        var firstByte = 0
        if (code < nextCode) {
          firstByte = firstOf(code)
          if (!emitSeq(code)) return null
        } else if (code == nextCode && nextCode < 4096) {
          firstByte = firstOf(prev)
          if (!emitSeq(prev) || !emit(firstByte)) return null
        } else return null
        if (nextCode < 4096) {
          prefix(nextCode) = prev; suffix(nextCode) = firstByte
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
      if (out > nPix) return null
    }
    if (out != nPix) return null
    InternalRow(iw.toLong, ih.toLong, nPix, sumR, sumG, sumB)
  }

  /** Column-level entry point. */
  def gifPixelStats(payload: Column): Column =
    ColumnBridge.column(GifPixelStats(ColumnBridge.expression(payload)))

  /** Fixture-side GIF assembly (the ingest twin of [[compute]]): a
    * REAL GIF87a with the given palette and a genuinely LZW-COMPRESSED
    * index stream (hash-map dictionary, variable code width, clear on
    * dictionary overflow) split into ≤255-byte sub-blocks — round
    * trips exercise real dictionary chains, not just literals.
    */
  def gifBytes(width: Int, height: Int, palette: Array[(Int, Int, Int)],
               indices: Array[Int]): Array[Byte] = {
    require(indices.length == width * height, "indices must fill the raster")
    // the container stores dims as u16 — silently wrapping mod 65536
    // would surface far away as the decoder's out != nPix null
    require(width > 0 && width <= 0xFFFF && height > 0 && height <= 0xFFFF,
      "GIF dims must fit u16")
    require(palette.length >= 4 && palette.length <= 256 &&
      Integer.bitCount(palette.length) == 1, "palette size must be 2^k, 4-256")
    require(indices.forall(i => i >= 0 && i < palette.length))
    val minCode = math.max(2,
      32 - Integer.numberOfLeadingZeros(palette.length - 1))
    val clear = 1 << minCode
    val eoi = clear + 1
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    var codeSize = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += codeSize
      while (accBits >= 8) {
        bits.write((acc & 0xff).toInt); acc >>= 8; accBits -= 8
      }
    }
    // LongMap, not java.util.HashMap[Long, Int]: a miss there unboxes
    // null to 0, silently aliasing palette index 0
    val dict = scala.collection.mutable.LongMap.empty[Int]
    var nextCode = eoi + 1
    put(clear)
    var cur = indices(0)
    var i = 1
    while (i < indices.length) {
      val b = indices(i)
      val key = (cur.toLong << 12) | b
      val hit = dict.getOrElse(key, -1)
      if (hit >= 0) cur = hit
      else {
        put(cur)
        if (nextCode < 4096) {
          dict.put(key, nextCode)
          // GIF encoders bump the width when the NEXT code to assign
          // would not fit the current width
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          nextCode += 1
        } else {
          put(clear)
          dict.clear(); nextCode = eoi + 1; codeSize = minCode + 1
        }
        cur = b
      }
      i += 1
    }
    put(cur)
    // mirror the decoder's entry-add for this FINAL data code: the
    // decoder assigns one more dictionary slot after reading it, and
    // if that lands exactly on 2^codeSize it reads EOI one bit wider —
    // without this the all-same-pixel (KwKwK) stream desyncs at EOI
    if (nextCode < 4096 && nextCode == (1 << codeSize) && codeSize < 12)
      codeSize += 1
    put(eoi)
    if (accBits > 0) bits.write((acc & 0xff).toInt)
    val z = bits.toByteArray
    val outBuf = new java.io.ByteArrayOutputStream()
    outBuf.write("GIF87a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { outBuf.write(v & 0xff); outBuf.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    outBuf.write(0x80 | (minCode - 1)) // GCT present, size 2^minCode
    outBuf.write(0); outBuf.write(0)
    palette.foreach { case (r, g, bl) =>
      outBuf.write(r); outBuf.write(g); outBuf.write(bl)
    }
    outBuf.write(0x2c); u16(0); u16(0); u16(width); u16(height); outBuf.write(0)
    outBuf.write(minCode)
    var off = 0
    while (off < z.length) {
      val n = math.min(255, z.length - off)
      outBuf.write(n); outBuf.write(z, off, n)
      off += n
    }
    outBuf.write(0)
    outBuf.write(0x3b)
    outBuf.toByteArray
  }
}

/** REAL JPEG pixel decoding — the last E5 format off the header tier.
  * The JDK itself ships a baseline-JPEG codec (`javax.imageio`, part
  * of java.desktop, headless-safe), so "no codecs in this container"
  * was never quite true for JPEG either; this expression wraps that
  * decoder behind the same channel-sum struct as the BMP/PNG/GIF
  * twins. A leading FFD8 magic check short-circuits non-JPEG payloads
  * before ImageIO ever allocates; any decode failure returns NULL.
  *
  * The ORACLE CONTRACT differs from the lossless twins, necessarily:
  * JPEG is lossy, so decoded sums cannot hash-match raw integers.
  * `q_jpeg_pixels` therefore ships exact RAW sums plus a
  * tolerance-banded verdict (|decoded mean − raw mean| ≤ tol per
  * channel) that the oracle asserts TRUE — the q_hll_rollup
  * convention for engine-specific numerics. Unlike the hand-rolled
  * decoders this calls a stateful library per row (no codegen
  * arithmetic to fuse), which is exactly the `mapInPandas`-style
  * plumbing the E5 mandate asks to be real even where the codec is a
  * black box.
  */
case class JpegPixelStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BmpPixelStats.schema

  override def nullable: Boolean = true

  override def prettyName: String = "jpeg_pixel_stats"

  override def nullSafeEval(payload: Any): Any =
    JpegPixelStats.compute(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.JpegPixelStats$$.MODULE$$.compute($b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegPixelStats =
    copy(child = newChild)
}

object JpegPixelStats {

  /** Refuse rasters past 64 Mi pixels before buffering them. */
  val MaxPixels: Long = 1L << 26

  def compute(b: Array[Byte]): InternalRow = {
    if (b.length < 3 || b(0) != 0xFF.toByte || b(1) != 0xD8.toByte ||
      b(2) != 0xFF.toByte) return null
    try {
      // dims from the STREAM HEADER before any raster is allocated —
      // ImageIO.read would decode (and OOM on) an adversarial
      // 65500×65500 declaration before a post-hoc check could run
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return null }
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
        val img = reader.read(0)
        var sumR = 0L; var sumG = 0L; var sumB = 0L
        val rowBuf = new Array[Int](w)
        var y = 0
        while (y < h) {
          // one bulk row fetch, not w ColorModel calls
          img.getRGB(0, y, w, 1, rowBuf, 0, w)
          var x = 0
          while (x < w) {
            val rgb = rowBuf(x)
            sumR += (rgb >> 16) & 0xff
            sumG += (rgb >> 8) & 0xff
            sumB += rgb & 0xff
            x += 1
          }
          y += 1
        }
        InternalRow(w.toLong, h.toLong, w.toLong * h, sumR, sumG, sumB)
      } finally {
        reader.dispose()
        iis.close()
      }
    } catch {
      case _: java.io.IOException => null
      case _: RuntimeException => null
    }
  }

  /** Column-level entry point. */
  def jpegPixelStats(payload: Column): Column =
    ColumnBridge.column(JpegPixelStats(ColumnBridge.expression(payload)))

  /** Fixture-side JPEG assembly: the JDK encoder at its default
    * quality. LOSSY — round trips approximate, which is the whole
    * point of the verdict-gated oracle contract.
    */
  def jpegBytes(width: Int, height: Int,
                pixels: Array[(Int, Int, Int)]): Array[Byte] = {
    require(pixels.length == width * height, "pixels must fill the raster")
    require(width > 0 && width <= 0xFFFF && height > 0 && height <= 0xFFFF,
      "JPEG dims must fit u16")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < pixels.length) {
      val (r, g, b) = pixels(i)
      img.setRGB(i % width, i / width, (r << 16) | (g << 8) | b)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
}

/** Magic-byte MIME sniffing — classify an opaque binary payload by its
  * leading bytes (the crawl-curation primitive that routes blobs to
  * the right decode path BEFORE any codec runs; classification never
  * trusts a container-supplied content type). One codegen'd prefix
  * compare per format, at scan speed.
  *
  * Recognized: png, jpeg, gif (87a/89a), wav (RIFF....WAVE), bmp,
  * pdf, zip, gzip; everything else (including UTF-8 text) → "other".
  * Rule order matters only for documentation — the magics are
  * mutually exclusive byte-wise.
  */
case class MagicKind(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.StringType

  override def prettyName: String = "magic_kind"

  override def nullSafeEval(p: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      MagicKind.sniff(p.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.MagicKind$$.MODULE$$.sniff($c))")

  override protected def withNewChildInternal(newChild: Expression): MagicKind =
    copy(child = newChild)
}

object MagicKind {

  def of(payload: Column): Column =
    ColumnBridge.column(MagicKind(ColumnBridge.expression(payload)))

  // precomputed magic byte arrays + while-loop compare: the probe runs
  // per input row inside generated code, so it must not allocate (the
  // varargs/closure formulation boxed a Seq per probe)
  private val Png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
  private val Jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)
  private val Gif87 = "GIF87a".getBytes("US-ASCII")
  private val Gif89 = "GIF89a".getBytes("US-ASCII")
  private val Riff = "RIFF".getBytes("US-ASCII")
  private val Wave = "WAVE".getBytes("US-ASCII")
  private val Bmp = "BM".getBytes("US-ASCII")
  private val Pdf = "%PDF".getBytes("US-ASCII")
  private val Zip = Array[Byte](0x50, 0x4B, 0x03, 0x04)
  private val Gzip = Array[Byte](0x1F, 0x8B.toByte)

  private def has(b: Array[Byte], at: Int, magic: Array[Byte]): Boolean = {
    if (b.length < at + magic.length) return false
    var i = 0
    while (i < magic.length) {
      if (b(at + i) != magic(i)) return false
      i += 1
    }
    true
  }

  def sniff(b: Array[Byte]): String =
    if (has(b, 0, Png)) "png"
    else if (has(b, 0, Jpeg)) "jpeg"
    else if (has(b, 0, Gif87) || has(b, 0, Gif89)) "gif"
    else if (has(b, 0, Riff) && has(b, 8, Wave)) "wav"
    else if (has(b, 0, Bmp)) "bmp"
    else if (has(b, 0, Pdf)) "pdf"
    else if (has(b, 0, Zip)) "zip"
    else if (has(b, 0, Gzip)) "gzip"
    else "other"
}

/** Perceptual difference-hash (dHash) over a decoded BMP raster — the
  * image twin of MinHash: a 64-bit fingerprint whose Hamming distance
  * tracks VISUAL similarity, so re-encoded / brightness-shifted /
  * lightly-edited copies of an image land within a few bits of each
  * other while distinct images sit near 32. The standard recipe
  * (public domain, widely documented as "dHash"): resample to a 9×8
  * grayscale grid by integer block-averaging, then bit(r,c) =
  * gray(r,c) < gray(r,c+1) for the 8 horizontal comparisons of each of
  * the 8 rows — gradients survive global brightness/contrast shifts
  * that would move every absolute value.
  *
  * Emits `struct(hash_hi, hash_lo)` — the 64 bits split as two
  * unsigned-32-bit halves in BIGINTs (bit idx = row·8 + col; idx < 32
  * in hash_lo) so both halves stay nonnegative in every engine — or
  * NULL for anything that is not a well-formed uncompressed 24-bit BMP
  * of at least 9×8 pixels ([[BmpPixelStats]]' strictness, plus the
  * minimum-size rule so every grid block is nonempty). Grayscale is
  * the integer ITU-R 601 luma floor((299·r + 587·g + 114·b)/1000);
  * block average is the floor of the block sum — all integer-exact,
  * which is what lets an oracle replay the hash from raw pixel
  * formulas without touching image bytes.
  *
  * Unlike [[BmpPixelStats]]' channel sums, dHash is
  * orientation-SENSITIVE, so bottom-up rasters (positive BMP height)
  * are mapped back to image order before resampling; top-down
  * (negative height) reads straight through.
  *
  * Scale: one codegen'd projection per payload, no allocation beyond a
  * 72-long grid; pairing happens downstream on the banded hash
  * ([[graft.operators.Dedup.hammingNearDuplicates]]), never on pixels.
  */
case class ImageDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageDHash.schema

  override def nullable: Boolean = true

  override def prettyName: String = "image_dhash"

  override def nullSafeEval(payload: Any): Any =
    ImageDHash.compute(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.ImageDHash$$.MODULE$$.compute($b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageDHash =
    copy(child = newChild)
}

object ImageDHash {

  val schema: StructType = StructType(Seq(
    StructField("hash_hi", LongType, nullable = false),
    StructField("hash_lo", LongType, nullable = false)))

  private val GridW = 9
  private val GridH = 8

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def leS32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Same strict header walk as [[BmpPixelStats.compute]] (including
    * its hostile-dimension overflow guards), then block-average
    * grayscale resample to 9×8 and the horizontal-gradient bits.
    */
  def compute(b: Array[Byte]): InternalRow = {
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return null
    val dataOff = leS32(b, 10)
    val dibSize = leS32(b, 14)
    val width = leS32(b, 18)
    val rawHeight = leS32(b, 22)
    val planes = leU16(b, 26)
    val bpp = leU16(b, 28)
    val compression = leS32(b, 30)
    if (dibSize < 40 || planes != 1 || bpp != 24 || compression != 0) return null
    val heightL = math.abs(rawHeight.toLong)
    if (width < GridW || heightL < GridH || dataOff < 54) return null
    val strideL = (width.toLong * 3 + 3) & ~3L
    val avail = b.length.toLong - dataOff
    if (avail < 0 || heightL > avail / strideL) return null
    val stride = strideL.toInt
    val height = heightL.toInt
    val bottomUp = rawHeight > 0
    // block-average 9×8 grayscale grid; block (gr, gc) covers image
    // rows [gr·H/8, (gr+1)·H/8) × cols [gc·W/9, (gc+1)·W/9) — floor
    // boundaries, nonempty because W ≥ 9, H ≥ 8
    val grid = new Array[Long](GridH * GridW)
    var gr = 0
    while (gr < GridH) {
      val r0 = (gr.toLong * height / GridH).toInt
      val r1 = ((gr + 1).toLong * height / GridH).toInt
      var gc = 0
      while (gc < GridW) {
        val c0 = (gc.toLong * width / GridW).toInt
        val c1 = ((gc + 1).toLong * width / GridW).toInt
        var sum = 0L
        var r = r0
        while (r < r1) {
          val fileRow = if (bottomUp) height - 1 - r else r
          var i = dataOff + fileRow * stride + c0 * 3
          var c = c0
          while (c < c1) {
            val blue = b(i) & 0xff
            val green = b(i + 1) & 0xff
            val red = b(i + 2) & 0xff
            sum += (299L * red + 587L * green + 114L * blue) / 1000L
            c += 1
            i += 3
          }
          r += 1
        }
        grid(gr * GridW + gc) = sum / ((r1 - r0).toLong * (c1 - c0))
        gc += 1
      }
      gr += 1
    }
    var hi = 0L
    var lo = 0L
    gr = 0
    while (gr < GridH) {
      var gc = 0
      while (gc < GridW - 1) {
        if (grid(gr * GridW + gc) < grid(gr * GridW + gc + 1)) {
          val idx = gr * 8 + gc
          if (idx < 32) lo |= 1L << idx else hi |= 1L << (idx - 32)
        }
        gc += 1
      }
      gr += 1
    }
    InternalRow(hi, lo)
  }

  /** Column-level entry point. */
  def imageDHash(payload: Column): Column =
    ColumnBridge.column(ImageDHash(ColumnBridge.expression(payload)))
}
