package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types._

/** Standard-container pixel decode via `javax.imageio` (m12) — the
  * JDK's own PNG/JPEG/GIF/BMP decoders, public knowledge and present
  * in every JVM, widening [[PngPixels]]' hand-rolled 8-bit-grayscale
  * path to truecolor PNG, palette PNG, and (lossy) JPEG. The
  * hand-rolled decoder stays as the adversarial-input arm (it sees
  * every byte); this one is the production rung that makes
  * cross-FORMAT re-encodes (PNG↔JPEG) land in the same perceptual
  * buckets through [[PixelHash]]'s dHash.
  *
  * Safety discipline (the m01/m08 probe rules): NULL on anything
  * undecodable, never a throw; dimensions are read from the header and
  * capped BEFORE pixel allocation (a decompression bomb stops at the
  * size check); luma is the exact-integer BT.601 form
  * `(299·r + 587·g + 114·b + 500) div 1000`, which reduces to the gray
  * value when r = g = b — so lossless decodes of gray-valued fixtures
  * replay exactly in SQL. */
object ImageIoPixels {

  /** Same pixel cap as [[PngPixels]]; dims additionally boxed to the
    * dHash-meaningful range. */
  private val MaxPixels = 1L << 22

  /** `imageio_dhash64(payload)` → the decoded raster's 64-bit dHash
    * ([[PixelHashImpl.dhashOf]] — identical grid arithmetic to GPR1/
    * GPC1 hashes, so hashes are comparable across decode paths). */
  def imageDhash64(payload: Column): Column =
    graftx.column(ImageIoDhash64(graftx.expr(payload)))

  /** `imageio_stats(payload)` → (width, height, px_sum, px_min,
    * px_max, checksum) over the decoded LUMA raster — m11's feature
    * set, same position-weighted checksum. */
  def imageStats(payload: Column): Column =
    graftx.column(ImageIoStatsExpr(graftx.expr(payload)))

  val statsType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("px_min", IntegerType, nullable = false),
    StructField("px_max", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Decode to a row-major luma grid; null on anything malformed,
    * unsupported, or adversarially sized. */
  private[expressions] def decodeLuma(b: Array[Byte]): (Int, Int, Array[Int]) = {
    if (b == null || b.length < 16) return null
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      // MemoryCacheImageInputStream keeps decoding fully in-memory: the
      // default createImageInputStream path spools through a temp FILE
      // per row, and on a read-only/full tmp dir the IOException would
      // be swallowed into a silent all-NULL column.
      iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(b))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(iis)
        // header-declared dims, checked BEFORE any pixel allocation
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        if (w < 1 || h < 1 || w > 4096 || h > 4096 ||
          w.toLong * h > MaxPixels) return null
        val img = reader.read(0)
        if (img == null || img.getWidth != w || img.getHeight != h) return null
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val bl = rgb & 0xff
            px(y * w + x) = (299 * r + 587 * g + 114 * bl + 500) / 1000
            x += 1
          }
          y += 1
        }
        (w, h, px)
      } finally reader.dispose()
    } catch {
      case _: Exception => null // truncated/hostile input: NULL, never a throw
    } finally {
      if (iis != null) try iis.close() catch { case _: Exception => () }
    }
  }

  /** `imageio_resize(payload, W, H)` → exact-integer AREA-AVERAGE
    * downsample features (m14) — the real operation behind
    * `Multimodal.resizeStub`, now that pixels genuinely decode. Source
    * pixel (x, y) feeds output cell (x·W div w, y·H div h) — the
    * floor-partitioned boxes SQL replays verbatim as GROUP BY keys —
    * and each cell's value is the floor-div mean of its box. Features
    * over the RESIZED grid: sum, min, max, position-weighted checksum
    * (catches a transposed or mis-binned cell a sum would not). */
  def imageResize(payload: Column, outW: Int, outH: Int): Column =
    graftx.column(ImageIoResizeExpr(graftx.expr(payload), outW, outH))

  val resizeType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("r_sum", LongType, nullable = false),
    StructField("r_min", IntegerType, nullable = false),
    StructField("r_max", IntegerType, nullable = false),
    StructField("r_checksum", LongType, nullable = false)))

  def resizeImpl(b: Array[Byte], outW: Int, outH: Int): InternalRow = {
    val d = decodeLuma(b)
    if (d == null) return null
    val (w, h, px) = d
    if (outW > w || outH > h) return null // downsample only
    val sums = new Array[Long](outW * outH)
    val counts = new Array[Long](outW * outH)
    var y = 0
    while (y < h) {
      val yy = y.toLong * outH / h
      var x = 0
      while (x < w) {
        val cell = (yy * outW + x.toLong * outW / w).toInt
        sums(cell) += px(y * w + x)
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var sum = 0L; var mn = 255; var mx = 0; var chk = 0L
    var k = 0
    while (k < sums.length) {
      val v = (sums(k) / counts(k)).toInt
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      chk += v.toLong * (1L + k % 97)
      k += 1
    }
    InternalRow(w, h, sum, mn, mx, chk)
  }

  /** Boxed entry for the Catalyst layer: Long dHash or null. The 9×8
    * floor is the dHash GRID minimum and applies only here — stats and
    * resize accept any decodable dims (a 3×3 icon has features even
    * though it has no difference hash). */
  def dhashImpl(b: Array[Byte]): java.lang.Long = {
    val d = decodeLuma(b)
    if (d == null || d._1 < 9 || d._2 < 8) null
    else java.lang.Long.valueOf(PixelHashImpl.dhashOf(d._1, d._2, d._3))
  }

  def statsImpl(b: Array[Byte]): InternalRow = {
    val d = decodeLuma(b)
    if (d == null) return null
    val (w, h, px) = d
    var sum = 0L; var mn = 255; var mx = 0; var chk = 0L
    var k = 0
    while (k < px.length) {
      val v = px(k)
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      chk += v.toLong * (1L + k % 97)
      k += 1
    }
    InternalRow(w, h, sum, mn, mx, chk)
  }
}

case class ImageIoDhash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "imageio_dhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val v = ImageIoPixels.dhashImpl(input.asInstanceOf[Array[Byte]])
    if (v == null) null else v.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("dh")
      s"""
        java.lang.Long $boxed = graft.expressions.ImageIoPixels.dhashImpl($c);
        ${ev.isNull} = ($boxed == null);
        if (!${ev.isNull}) ${ev.value} = $boxed.longValue();
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ImageIoDhash64 =
    copy(child = newChild)
}

case class ImageIoResizeExpr(child: Expression, outW: Int, outH: Int)
    extends UnaryExpression {
  require(outW > 0 && outH > 0, s"imageio_resize: bad target ${outW}x$outH")
  override def dataType: DataType = ImageIoPixels.resizeType
  override def nullable: Boolean = true
  override def prettyName: String = "imageio_resize"

  override protected def nullSafeEval(input: Any): Any =
    ImageIoPixels.resizeImpl(input.asInstanceOf[Array[Byte]], outW, outH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.ImageIoPixels.resizeImpl($c, $outW, $outH);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageIoResizeExpr =
    copy(child = newChild)
}

case class ImageIoStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageIoPixels.statsType
  override def nullable: Boolean = true
  override def prettyName: String = "imageio_stats"

  override protected def nullSafeEval(input: Any): Any =
    ImageIoPixels.statsImpl(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.ImageIoPixels.statsImpl($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageIoStatsExpr =
    copy(child = newChild)
}
