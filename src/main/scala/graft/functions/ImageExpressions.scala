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
  * scan speed with the payload never leaving the row. Compressed
  * formats (PNG/JPEG pixels) stay at the header-metadata tier
  * ([[graft.operators.Multimodal]]) — those genuinely need codecs this
  * container does not ship.
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
