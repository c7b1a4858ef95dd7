package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.BinaryFeatures

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads travel as opaque `binary` columns with typed metadata, and
  * every operator below is built from codegen'd built-ins (or a custom
  * codegen'd expression), so the plumbing — schema, partitioning,
  * pruning, null-safety — is production-real and 100 TB-ready.
  *
  * Header DECODING is real where headers are parseable without a
  * codec: [[decodeImageHeader]] reads PNG IHDR / JPEG SOF dimensions
  * with pure byte arithmetic. Full pixel/sample decoding remains
  * STUBBED ([[decodeImageStub]] for unparsed formats, [[BinaryFeatures]]
  * embeds raw bytes instead of decoded pixels) — actual image/audio
  * codecs are not in this container. Swapping in a real codec changes
  * only the kernel behind each operator — the dataflow contract
  * (`binary → struct` / `binary → array<double>`) stays identical.
  *
  * Scale notes: all ops are narrow (per-row) — no shuffle anywhere;
  * [[frameSample]]'s explode multiplies rows by sampled-frame count,
  * which is bounded by `payload_bytes / (frameBytes · every)`, so
  * output volume is a fixed fraction of input volume regardless of
  * row count or cluster size.
  */
object Multimodal {

  /** Magic-byte prefixes for format sniffing (real detection logic —
    * the standard file signatures). Checked in order. */
  val formatMagics: Seq[(String, String)] = Seq(
    "jpeg" -> "FFD8FF",
    "png" -> "89504E47",
    "gif" -> "47494638",
    "riff" -> "52494646", // WAV / AVI container
    "pdf" -> "25504446")

  /** Sniff the payload format from its magic bytes; "bin" when unknown. */
  def sniffFormat(payload: Column): Column = {
    val prefix = hex(substring(payload, 1, 8))
    formatMagics.foldRight(lit("bin"): Column) { case ((name, magic), els) =>
      when(prefix.startsWith(magic), lit(name)).otherwise(els)
    }
  }

  /** Byte length of a binary column (Spark `length` on binary = bytes). */
  def byteLength(payload: Column): Column = length(payload)

  /** Content fingerprint of a binary payload: md5 over its hex rendering
    * (hex-domain so the DuckDB oracle — whose md5 is VARCHAR-only — can
    * reproduce it bit-for-bit). */
  def fingerprint(payload: Column): Column =
    md5(hex(payload).cast("binary"))

  /** Typed metadata projection: (id, byte_len, fingerprint, format). */
  def binaryMeta(df: DataFrame, payloadCol: Column, idCol: Column): DataFrame =
    df.select(
      idCol.as("id"),
      byteLength(payloadCol).as("byte_len"),
      fingerprint(payloadCol).as("fingerprint"),
      sniffFormat(payloadCol).as("format"))

  /** REAL image-header decode: width/height/channels parsed from the
    * PNG IHDR chunk or the first JPEG SOF segment with pure byte
    * arithmetic ([[graft.expressions.ImageHeader]]) — no codec library
    * involved, so this runs as a codegen'd kernel like every other
    * scalar here. NULL for malformed/truncated headers and for formats
    * without a parser (filter on it; never an exception mid-stage). */
  def decodeImageHeader(payload: Column): Column = {
    import graft.expressions.ImageHeader
    when(sniffFormat(payload) === "png", ImageHeader.pngDims(payload))
      .when(sniffFormat(payload) === "jpeg", ImageHeader.jpegDims(payload))
      .when(sniffFormat(payload) === "gif", ImageHeader.gifDims(payload))
      .otherwise(lit(null).cast(ImageHeader.dimsType))
  }

  /** STUB image decode: dimension/channel metadata derived
    * arithmetically from the payload length (a real codec would parse
    * the header — [[decodeImageHeader]] does exactly that for PNG/JPEG;
    * this stub remains for formats without a header parser).
    * Deterministic and oracle-expressible. */
  def decodeImageStub(payload: Column): Column = {
    val len = byteLength(payload)
    // floor(len/7) is exact: len < 2^31, so the double quotient is never
    // within rounding distance of the wrong integer
    struct(
      (lit(16) + pmod(len, lit(240))).as("width"),
      (lit(16) + pmod(floor(len / 7).cast("int"), lit(240))).as("height"),
      (lit(1) + pmod(len, lit(3))).as("channels"))
  }

  /** STUB resize: recomputes metadata for the target dimensions; the
    * payload itself is untouched (a real codec would re-encode). */
  def resizeStub(meta: Column, width: Int, height: Int): Column =
    struct(
      lit(width).as("width"),
      lit(height).as("height"),
      meta.getField("channels").as("channels"),
      (lit(width) * lit(height) * meta.getField("channels")).as("est_bytes"))

  /** Frame sampling over a binary stream: treat the payload as
    * consecutive `frameBytes`-byte frames and emit every `every`-th one
    * with its content hash — (id, frame_idx, frame_hash, frame binary).
    * The hash is md5 over the frame's hex rendering (oracle-matchable);
    * `frame` carries the actual bytes for downstream feature extraction. */
  def frameSample(df: DataFrame, payloadCol: Column, idCol: Column,
      frameBytes: Int = 64, every: Int = 2): DataFrame = {
    val step = frameBytes * every
    df.select(idCol.as("id"), payloadCol.as("payload"))
      .filter(length(col("payload")) > 0)
      .select(col("id"), col("payload"), hex(col("payload")).as("h"),
        explode(sequence(lit(0), length(col("payload")) - 1, lit(step))).as("off"))
      .select(
        col("id"),
        expr(s"CAST(off / $frameBytes AS INT)").as("frame_idx"),
        md5(substring(col("h"), col("off") * 2 + 1, lit(frameBytes * 2)).cast("binary")).as("frame_hash"),
        expr(s"substring(payload, off + 1, $frameBytes)").as("frame"))
  }

  /** Byte-level feature embedding (STUB for a model-backed embedder; see
    * [[graft.expressions.BinaryFeatures]]): binary → array<double>[dim],
    * NULL for empty payloads. Output plugs directly into the
    * [[Similarity]] stack (cosine kNN, LSH buckets). */
  def extractFeatures(payload: Column, dim: Int = 16): Column =
    BinaryFeatures(payload, dim)

  /** Perceptual 64-bit difference hash over DECODED grayscale pixels
    * ([[graft.expressions.PixelHash]]) — catches re-encoded duplicate
    * images that share no payload bytes (m05's byte sketches miss
    * them by construction); NULL on malformed containers. Pair with
    * [[Dedup.hamming64Pairs]] for banded near-dup detection. */
  /** A REAL 8-bit-grayscale PNG encoder (m11's fixture side): proper
    * signature, IHDR with CRC32s, per-row forward filters cycling
    * through ALL five types (y mod 5 — so the decoder's every
    * unfilter branch is exercised), a zlib-deflated IDAT (split across
    * TWO chunks on every third image — concatenation exercised), an
    * ancillary tEXt chunk on every fifth (skip branch), IEND. Pixels
    * come from the deterministic formula
    * p(x,y) = (id·31 + y·w + x·7) mod 256 with w = 8 + id mod 9,
    * h = 8 + 3·id mod 9 — both engines state ground truth from it
    * (builder-parser identity, m03/m06/m10 discipline), and the
    * decode is genuinely end-to-end: deflate → inflate → unfilter. */
  def pngEncode(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (8 + (id * 3) % 9).toInt
    def px(x: Int, y: Int): Int = ((id * 31 + y.toLong * w + x.toLong * 7) % 256).toInt
    // forward-filter the scanlines
    val raw = new Array[Byte](h * (w + 1))
    for (y <- 0 until h) {
      val f = y % 5
      raw(y * (w + 1)) = f.toByte
      for (x <- 0 until w) {
        val cur = px(x, y)
        val a = if (x > 0) px(x - 1, y) else 0
        val b = if (y > 0) px(x, y - 1) else 0
        val c = if (x > 0 && y > 0) px(x - 1, y - 1) else 0
        val filtered = f match {
          case 0 => cur
          case 1 => (cur - a) & 0xff
          case 2 => (cur - b) & 0xff
          case 3 => (cur - ((a + b) >> 1)) & 0xff
          case 4 =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (cur - pred) & 0xff
        }
        raw(y * (w + 1) + 1 + x) = filtered.toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](512)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val z = zout.toByteArray
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(body)
      be32(body.length.toLong) ++ t ++ body ++ be32(crc.getValue)
    }
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = chunk("IHDR",
      be32(w.toLong) ++ be32(h.toLong) ++ Array[Byte](8, 0, 0, 0, 0))
    val text = if (id % 5 == 0)
      chunk("tEXt", s"id $id".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    else Array.empty[Byte]
    val idat = if (id % 3 == 0 && z.length > 1) {
      val cut = z.length / 2
      chunk("IDAT", z.take(cut)) ++ chunk("IDAT", z.drop(cut))
    } else chunk("IDAT", z)
    sig ++ ihdr ++ text ++ idat ++ chunk("IEND", Array.empty[Byte])
  }

  def grayDhash64(payload: Column): Column =
    graft.expressions.PixelHash.grayDhash64(payload)

  // ---- m12: standard-container fixtures encoded through javax.imageio ----

  /** m12's image: 72×64, nine 8×8-FLAT gray blocks per row — the block
    * value is an m09-style multiplicative mix quantized to 12 levels
    * 17 apart (range 25..212). Flat blocks aligned to JPEG's 8×8 DCT
    * grid make the lossy arm's dHash DETERMINISTICALLY equal to the
    * lossless one's: a flat block has only a DC coefficient, DC
    * dequantization is monotone in the block value with error far
    * under the 17-level gap, and equal blocks decode identically — so
    * no adjacent-mean comparison can flip. That turns "PNG↔JPEG
    * re-encode lands in the same perceptual bucket" from a
    * probabilistic claim into an oracle-solid one. */
  def m12Block(d: Long, br: Int, bc: Int): Int = {
    // mix is reduced mod the prime BEFORE the Knuth multiply so the
    // product stays ~2^51 — no Long wrap at any doc_id, and the DuckDB
    // oracle (which would NOT wrap) evaluates the identical value.
    val mix = (d * 31 + bc * 7 + br * 13 + bc.toLong * br + d * bc +
      2 * d * br) % 1000003L
    ((((mix * 2654435761L) % 1000003L) % 12L) * 17L + 25L).toInt
  }

  val M12W = 72
  val M12H = 64

  private def m12Raster(d: Long,
      img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    var y = 0
    while (y < M12H) {
      var x = 0
      while (x < M12W) {
        val v = m12Block(d, y / 8, x / 8)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  private def writeBytes(img: java.awt.image.BufferedImage,
      fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  // ---- m13: IMA-ADPCM fixture -------------------------------------------

  /** m13's per-doc parameters: mono, rate from m10's family, 64..127
    * samples in 36-byte blocks (65 samples per block → 1–2 blocks, the
    * second partial — so block restarts AND pad-nibble stopping are
    * both exercised). Headers and nibbles come from closed-form
    * formulas BOTH engines evaluate; the decoded waveform is the
    * state machine over them (the oracle replays it recursively). */
  def m13Rate(d: Long): Int = (8000 * (1 + d % 5)).toInt
  def m13Nf(d: Long): Int = (64 + d % 64).toInt
  val M13BlockAlign = 36
  val M13Spb: Int = (M13BlockAlign - 4) * 2 + 1 // 65

  def m13Predictor(d: Long, b: Int): Int =
    (((d * 131 + b * 7919) % 20001) - 10000).toInt
  def m13Index(d: Long, b: Int): Int = ((d * 17 + b * 31) % 89).toInt
  def m13Nibble(d: Long, b: Int, j: Int): Int = ((d * 7 + b * 5 + j * 13) % 16).toInt

  /** A complete mono IMA-ADPCM WAV for doc `d`: fmt (tag 0x0011, bits
    * 4, the cbSize=2 samples-per-block extension), fact (true sample
    * count), and full-size blocks whose trailing nibbles past the fact
    * count are pad (the decoder must stop, not decode them). */
  def adpcmEncode(d: Long): Array[Byte] = {
    val nf = m13Nf(d)
    val nBlocks = (nf + M13Spb - 1) / M13Spb
    val dataBytes = nBlocks * M13BlockAlign
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    def tag(t: String): Unit = t.foreach(c => w8(c.toInt))
    tag("RIFF"); w32(4L + (8 + 20) + (8 + 4) + (8 + dataBytes)); tag("WAVE")
    tag("fmt "); w32(20L)
    w16(0x11); w16(1); w32(m13Rate(d).toLong)
    w32(m13Rate(d).toLong * M13BlockAlign / M13Spb) // nominal byte rate
    w16(M13BlockAlign); w16(4); w16(2); w16(M13Spb)
    tag("fact"); w32(4L); w32(nf.toLong)
    tag("data"); w32(dataBytes.toLong)
    for (b <- 0 until nBlocks) {
      w16(m13Predictor(d, b) & 0xffff); w8(m13Index(d, b)); w8(0)
      var j = 0
      while (j < (M13BlockAlign - 4) * 2) {
        val lo = m13Nibble(d, b, j)
        val hi = m13Nibble(d, b, j + 1)
        w8(lo | (hi << 4))
        j += 2
      }
    }
    out.toByteArray
  }

  /** Truecolor (color-type-2) PNG of the m12 grid. */
  def encodePng24(d: Long): Array[Byte] =
    writeBytes(m12Raster(d, new java.awt.image.BufferedImage(
      M12W, M12H, java.awt.image.BufferedImage.TYPE_INT_RGB)), "png")

  /** PALETTE (color-type-3) PNG of the SAME grid: an indexed raster
    * over a 16-entry palette — a genuinely different byte stream and
    * PNG color model for the same picture. The 12 used entries are
    * exact grays (v, v, v) so luma replays the formula; the 4 filler
    * entries are deliberately NON-gray — a full gray-ramp palette
    * makes the JDK writer "optimize" to color type 0 (grayscale),
    * whose linear-gray decode shifts every value through a gamma
    * curve (monotone — dHash survives — but the stats oracle
    * wouldn't). */
  def encodePng8(d: Long): Array[Byte] = writeBytes(m12Indexed(d), "png")

  /** The shared indexed raster behind the palette PNG and GIF arms. */
  private def m12Indexed(d: Long): java.awt.image.BufferedImage = {
    val r = new Array[Byte](16); val g = new Array[Byte](16); val b = new Array[Byte](16)
    for (i <- 0 until 12) {
      val v = (25 + 17 * i).toByte
      r(i) = v; g(i) = v; b(i) = v
    }
    for (i <- 12 until 16) { r(i) = 0xff.toByte; g(i) = 0; b(i) = (i * 16).toByte }
    val cm = new java.awt.image.IndexColorModel(8, 16, r, g, b)
    val img = new java.awt.image.BufferedImage(
      M12W, M12H, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = img.getRaster
    var y = 0
    while (y < M12H) {
      var x = 0
      while (x < M12W) {
        raster.setSample(x, y, 0, (m12Block(d, y / 8, x / 8) - 25) / 17)
        x += 1
      }
      y += 1
    }
    img
  }

  /** GIF of the SAME grid — the fourth container through the one
    * decode path: lossless palette format, so features replay the
    * formula exactly and the dHash equals the PNGs'. Reuses the
    * indexed raster (GIF is palette-native). */
  def encodeGif(d: Long): Array[Byte] = writeBytes(m12Indexed(d), "gif")

  // ---- m14: textured truecolor PNG for the REAL resize ------------------

  /** m14's source: per-doc dims (20+d%13 × 16+3d%11 — deliberately NOT
    * multiples of the 7×5 target, so uneven boxes are on the scored
    * path), m11's textured pixel formula rendered as exact gray RGB. */
  def m14W(d: Long): Int = (20 + d % 13).toInt
  def m14H(d: Long): Int = (16 + (d * 3) % 11).toInt
  def m14Px(d: Long, x: Int, y: Int): Int =
    ((d % 1000003L * 31 + y.toLong * m14W(d) + x.toLong * 7) % 256).toInt

  def encodePngTextured(d: Long): Array[Byte] = {
    val w = m14W(d); val h = m14H(d)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = m14Px(d, x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    writeBytes(img, "png")
  }

  // ---- m15: audio perceptual near-dup fixtures -----------------------
  //
  // The same recording encoded twice — exact PCM16 and lossy IMA-ADPCM
  // (a REAL encoder this time, not m13's pseudorandom nibbles: the
  // standard sign + 3-comparison-bit quantizer whose internal predictor
  // state equals the decoder's, so decode(encode(s)) is the encoder's
  // own valpred walk — the IMA property the oracle's fused
  // encoder/decoder recursion relies on). The signal is 72 constant
  // blocks ("tone blocks") of 16 samples, amplitude 256 or 1024 chosen
  // by a two-modulus hash (so the level vector is NOT additive in d —
  // ~128k distinct classes, no cross-doc flooding), sign alternating
  // per block (zero crossings stay on the decode path).

  /** m15 band level (0 = amp 256, 1 = amp 1024) for doc d, band gb —
    * the two-modulus mix keeps the 72-level vector non-additive in d. */
  def m15Lvl(d: Long, gb: Int): Int =
    ((((d % 1009 + 1) * (gb + 3) + (d % 127) * (gb.toLong * gb + 1)) % 101) % 2).toInt

  /** m15 sample k of doc d: constant ±amp per 16-sample band. */
  def m15Sample(d: Long, k: Int): Int = {
    val gb = k / 16
    val amp = if (m15Lvl(d, gb) == 1) 1024 else 256
    if (gb % 2 == 0) amp else -amp
  }

  val M15N: Int = graft.expressions.AudioFingerprint.NSamples // 1152

  /** Mono PCM16 WAV of the m15 signal (fmt 1, rate 8000). */
  def m15WavPcm(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    def tag(t: String): Unit = t.foreach(c => w8(c.toInt))
    tag("RIFF"); w32(36L + 2L * M15N); tag("WAVE")
    tag("fmt "); w32(16L)
    w16(1); w16(1); w32(8000L); w32(16000L); w16(2); w16(16)
    tag("data"); w32(2L * M15N)
    var k = 0
    while (k < M15N) { w16(m15Sample(d, k) & 0xffff); k += 1 }
    out.toByteArray
  }

  /** ONE IMA nibble of the standard encoder: quantize `diff` against
    * the current step by the three public-spec comparisons. */
  def imaEncodeNibble(diff: Int, step: Int): Int = {
    var dd = diff
    var nib = 0
    if (dd < 0) { nib = 8; dd = -dd }
    if (dd >= step) { nib |= 4; dd -= step }
    if (dd >= (step >> 1)) { nib |= 2; dd -= step >> 1 }
    if (dd >= (step >> 2)) nib |= 1
    nib
  }

  /** Mono IMA-ADPCM WAV of the SAME m15 signal — one block holding all
    * 1152 samples (header predictor = sample 0, index 0; 1151 data
    * nibbles + 1 pad). Each nibble is chosen by [[imaEncodeNibble]]
    * against the RECONSTRUCTED predictor, then state advances through
    * the same [[graft.expressions.AudioAdpcm.step]] the decoder runs —
    * encoder and decoder states are identical by construction. */
  def m15WavAdpcm(d: Long): Array[Byte] = {
    val nNib = M15N - 1 // 1151 data nibbles
    val nibBytes = (nNib + 1) / 2 // 576 (last high nibble is pad)
    val blockAlign = 4 + nibBytes // 580
    val spb = nibBytes * 2 + 1 // 1153
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    def tag(t: String): Unit = t.foreach(c => w8(c.toInt))
    tag("RIFF"); w32(4L + (8 + 20) + (8 + 4) + (8 + blockAlign)); tag("WAVE")
    tag("fmt "); w32(20L)
    w16(0x11); w16(1); w32(8000L)
    w32(8000L * blockAlign / spb) // nominal byte rate
    w16(blockAlign); w16(4); w16(2); w16(spb)
    tag("fact"); w32(4L); w32(M15N.toLong)
    tag("data"); w32(blockAlign.toLong)
    var valpred = m15Sample(d, 0)
    var index = 0
    w16(valpred & 0xffff); w8(index); w8(0)
    var j = 0
    var lo = -1
    while (j < nNib) {
      val diff = m15Sample(d, j + 1) - valpred
      val nib = imaEncodeNibble(diff, graft.expressions.AudioAdpcm.StepTable(index))
      val (v2, i2) = graft.expressions.AudioAdpcm.step(valpred, index, nib)
      valpred = v2; index = i2
      if (lo < 0) lo = nib
      else { w8(lo | (nib << 4)); lo = -1 }
      j += 1
    }
    if (lo >= 0) w8(lo) // pad high nibble 0
    out.toByteArray
  }

  /** The m15 fixture arms for one doc: (arm id, WAV payload) — exact
    * PCM16, the IMA-ADPCM re-encode, and (every other fixture doc) a
    * truncated-ADPCM hostile arm. Shared by m15 and its streaming twin
    * s33 so both build byte-identical corpora. */
  def m15Arms(id: Long): Seq[(Long, Array[Byte])] = {
    val base = Seq((id * 4, m15WavPcm(id)), (id * 4 + 1, m15WavAdpcm(id)))
    if (id % 16 == 2) base :+ ((id * 4 + 2, m15WavAdpcm(id).take(40)))
    else base
  }

  /** ONE micro-batch of the streaming perceptual near-dup fold (s33):
    * fingerprint ONLY the arriving docs' arms (the stored corpus is
    * never re-decoded — its state is the narrow (id, fp) signature
    * table, payload bytes are dropped at the batch boundary), discover
    * the pairs this batch completes via [[Dedup.hamming64PairsIncrement]]
    * (each unordered pair exactly once, when its later member
    * arrives), and fold both into the state table. State rows:
    * (kind='sig', id_a=id, fp) ∪ (kind='pair', id_a, id_b, hamming).
    * Folding over ANY slicing of the fixture corpus yields exactly
    * m15's one-shot pair set (AudioFingerprintSpec pins it). */
  def audioNeardupFold(state: DataFrame, batch: DataFrame): DataFrame = {
    import batch.sparkSession.implicits._
    neardupFoldStep(state,
      batch.select(col("doc_id")).as[Long]
        .flatMap(m15Arms).toDF("id", "payload")
        .select(col("id"),
          graft.expressions.AudioFingerprint.audioFp64(col("payload")).as("fp")))
  }

  /** The generic perceptual-fold step both s33 (audio) and s34 (image)
    * share: given this batch's (id, fp) signatures (NULL fps dropped
    * here), discover the pairs the batch completes against the stored
    * signature rows and fold both into the state table. */
  def neardupFoldStep(state: DataFrame, batchSigs: DataFrame): DataFrame = {
    val sigs = batchSigs.filter(col("fp").isNotNull)
    val stored = state.filter(col("kind") === "sig")
      .select(col("id_a").as("id"), col("fp"))
    val pairs = Dedup.hamming64PairsIncrement(stored, sigs, "id", "fp", maxHamming = 3)
    state
      .unionByName(sigs.select(lit("sig").as("kind"), col("id").as("id_a"),
        lit(null).cast("long").as("id_b"), col("fp"),
        lit(null).cast("long").as("hamming")))
      .unionByName(pairs.select(lit("pair").as("kind"), col("id_a"), col("id_b"),
        lit(null).cast("long").as("fp"), col("hamming")))
  }

  // ---- m16: EXIF/TIFF orientation + dimensions fixtures --------------

  def m16Width(d: Long): Int = (16 + d % 2000).toInt
  def m16Height(d: Long): Int = (16 + (d * 3) % 2000).toInt
  def m16Orient(d: Long): Int = (1 + d % 8).toInt
  /** Big-endian (`MM`) on every other fixture doc. */
  def m16Be(d: Long): Boolean = (d / 8) % 2 == 1
  /** Width stored as a LONG (type 4) entry instead of SHORT on every
    * third doc — both inline value-slot layouts stay exercised. */
  def m16WidthLong(d: Long): Boolean = d % 3 == 0

  /** A bare TIFF head: byte-order marker, magic 42, IFD0 with four
    * ascending-tag entries (ImageWidth SHORT-or-LONG, ImageLength,
    * Orientation, and an ExifIFDPointer the walker must SKIP), zero
    * next-IFD offset. `corrupt` (doc_id % 32 == 0) points IFD0 far
    * beyond EOF — the adversarial 32-bit offset a LONG-position walk
    * must reject, not wrap. */
  def m16Tiff(d: Long): Array[Byte] = {
    val be = m16Be(d)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (be) { w8(v >> 8); w8(v) } else { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit =
      if (be) { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }
      else { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    def entryShort(tag: Int, v: Int): Unit = {
      w16(tag); w16(3); w32(1L); w16(v); w8(0); w8(0)
    }
    def entryLong(tag: Int, v: Long): Unit = { w16(tag); w16(4); w32(1L); w32(v) }
    if (be) { w8('M'); w8('M') } else { w8('I'); w8('I') }
    w16(42)
    w32(if (d % 32 == 0) 0xFFFFFF00L else 8L) // corrupt: IFD far past EOF
    w16(4) // entry count
    if (m16WidthLong(d)) entryLong(0x0100, m16Width(d).toLong)
    else entryShort(0x0100, m16Width(d))
    entryShort(0x0101, m16Height(d))
    entryShort(0x0112, m16Orient(d))
    entryLong(0x8769, 8L) // ExifIFDPointer — unknown to the probe, skipped
    w32(0L) // no next IFD
    out.toByteArray
  }

  /** The same TIFF stream wrapped the camera-JPEG way: FFD8, a COM
    * segment (the walker must step the chain, not read a fixed
    * offset), then APP1 `Exif\0\0` + TIFF. The hostile JPEG
    * (doc_id % 32 == 4) carries NO APP1 — COM straight to SOS. */
  def m16JpegExif(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    w8(0xff); w8(0xd8)
    val comLen = (4 + d % 5).toInt
    w8(0xff); w8(0xfe); w8((comLen + 2) >> 8); w8((comLen + 2) & 0xff)
    (0 until comLen).foreach(_ => w8('J'))
    if (d % 32 == 4) { w8(0xff); w8(0xda); w8(0); w8(4); w8(0); w8(0) }
    else {
      val tiff = m16Tiff(d)
      val len = 2 + 6 + tiff.length
      w8(0xff); w8(0xe1); w8(len >> 8); w8(len & 0xff)
      "Exif".foreach(c => w8(c.toInt)); w8(0); w8(0)
      tiff.foreach(b => w8(b & 0xff))
    }
    out.toByteArray
  }

  /** JPEG of the SAME grid at quality 0.95 — the LOSSY re-encode. */
  def encodeJpeg(d: Long): Array[Byte] = {
    val img = m12Raster(d, new java.awt.image.BufferedImage(
      M12W, M12H, java.awt.image.BufferedImage.TYPE_INT_RGB))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  // ---- m17/m18: MP4 sample-table fixtures ------------------------------

  /** m17's per-video parameters — ONE arithmetic surface stated three
    * ways: the builder writes them into real ISO-BMFF stbl boxes, the
    * kernel ([[graft.expressions.Mp4SampleTable]]) re-derives them by
    * walking those boxes, and the DuckDB oracle states them directly
    * (m03's builder-parser identity). 6–10 samples; sizes 20–59 bytes;
    * stts has TWO runs (delta switches after sample 3); every third
    * sample is a sync sample. */
  def mp4SampleCount(d: Long): Int = (6 + d % 5).toInt
  def mp4SampleSize(d: Long, i: Int): Int = (20 + (d * 31 + i * 17) % 40).toInt
  def mp4SampleByte(d: Long, i: Int, j: Int): Int = ((d * 31 + i * 17 + j * 7) % 256).toInt
  def mp4Delta(d: Long, i: Int): Long = {
    val d1 = 100 + d % 50
    if (i < 3) d1 else d1 + 40
  }

  /** ctts composition offset for sample i — present on every
    * d % 5 ∈ {1, 3} document (two runs, switching after sample 2);
    * 0 (no ctts box) otherwise. pts = dts + this. */
  def mp4CttsOffset(d: Long, i: Int): Long =
    if (d % 5 == 1 || d % 5 == 3) { if (i < 2) (d % 4) * 30 else 90 }
    else 0L

  /** A COMPLETE ISO-BMFF file with a REAL sample table —
    * moov/trak/mdia/{hdlr,minf/stbl{stts,stsz,stsc,stco,stss}} + mdat.
    * Arm 0 groups 3 samples per chunk, chunks in natural file order.
    * Arm 1 ("remux") is the SAME media re-containerized: 2 samples per
    * chunk, chunks written in REVERSE file order (stco points at them
    * correctly), plus a variable-length `free` box before moov — the
    * container bytes share almost nothing with arm 0, the frame bytes
    * are identical, and frame offsets are non-monotone in sample
    * order, so only a genuine stsc/stco chunk walk extracts the frames
    * (an "mdat is sequential" shortcut misparses every arm-1 file).
    * Every d % 6 == 5 document additionally carries a STUB AUDIO trak
    * (hdlr 'soun', no sample table) BEFORE the video trak — a
    * first-trak shortcut lands on it and finds no stbl; only genuine
    * hdlr-based video-trak selection parses those files. */
  def encodeMp4(d: Long, remux: Boolean): Array[Byte] = {
    val nS = mp4SampleCount(d)
    val cpc = if (remux) 2 else 3
    val nC = (nS + cpc - 1) / cpc
    val nSync = (nS + 2) / 3
    val sizes = Array.tabulate(nS)(i => mp4SampleSize(d, i))
    val rem = nS - (nC - 1) * cpc
    val scRuns: Seq[(Int, Int)] =
      if (rem == cpc) Seq((1, cpc)) else Seq((1, cpc), (nC, rem))
    val sttsSz = 8 + 4 + 4 + 8 * 2
    // B-frame reality: composition times differ from decode times —
    // every d % 5 ∈ {1, 3} document carries a two-run ctts box
    val ctts = d % 5 == 1 || d % 5 == 3
    val cttsSz = if (ctts) 8 + 4 + 4 + 8 * 2 else 0
    val stszSz = 8 + 4 + 4 + 4 + 4 * nS
    val stscSz = 8 + 4 + 4 + 12 * scRuns.length
    // every d % 4 == 3 document stores chunk offsets as 64-bit co64 —
    // the form real >4 GiB files REQUIRE (stco's u32 cannot address
    // them); the walk must accept both
    val co64 = d % 4 == 3
    val stcoSz = 8 + 4 + 4 + (if (co64) 8 else 4) * nC
    val stssSz = 8 + 4 + 4 + 4 * nSync
    val hdlrSz = 33 // 8 hdr + ver/flags(4) + pre_defined(4) + handler(4) + reserved(12) + name NUL(1)
    val audioTrakSz = if (d % 6 == 5) 8 + 8 + hdlrSz else 0 // trak > mdia > hdlr('soun')
    val stblSz = 8 + sttsSz + cttsSz + stszSz + stscSz + stcoSz + stssSz
    val moovSz = 8 + audioTrakSz + 8 + (8 + hdlrSz + (8 + stblSz))
    val freeSz = if (remux) (9 + d % 7).toInt else 0
    val mdatStart = 20 + freeSz + moovSz + 8
    val chunkSamples = Array.tabulate(nC) { c =>
      val lo = c * cpc; lo until math.min(nS, lo + cpc)
    }
    val chunkBytes = chunkSamples.map(_.map(sizes).sum)
    val chunkPos = new Array[Long](nC)
    val fileOrder = if (remux) (nC - 1) to 0 by -1 else 0 until nC
    var acc = mdatStart.toLong
    for (c <- fileOrder) { chunkPos(c) = acc; acc += chunkBytes(c) }
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w32(v: Long): Unit = {
      w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt)
    }
    def wTag(t: String): Unit = t.foreach(c => w8(c.toInt))
    def wHdlr(handler: String): Unit = {
      w32(hdlrSz.toLong); wTag("hdlr"); w32(0); w32(0); wTag(handler)
      (0 until 12).foreach(_ => w8(0)); w8(0)
    }
    w32(20); wTag("ftyp"); wTag("isom"); w32(512); wTag("mp41")
    if (remux) {
      w32(freeSz.toLong); wTag("free")
      (0 until freeSz - 8).foreach(_ => w8(0x4a))
    }
    w32(moovSz.toLong); wTag("moov")
    if (audioTrakSz > 0) { // the decoy: sample-table-less audio trak first
      w32(audioTrakSz.toLong); wTag("trak")
      w32((audioTrakSz - 8).toLong); wTag("mdia")
      wHdlr("soun")
    }
    w32((8 + (8 + hdlrSz + (8 + stblSz))).toLong); wTag("trak")
    w32((8 + hdlrSz + (8 + stblSz)).toLong); wTag("mdia")
    wHdlr("vide")
    w32((8 + stblSz).toLong); wTag("minf")
    w32(stblSz.toLong); wTag("stbl")
    w32(sttsSz.toLong); wTag("stts"); w32(0); w32(2)
    w32(3); w32(mp4Delta(d, 0)); w32((nS - 3).toLong); w32(mp4Delta(d, 3))
    if (ctts) {
      w32(cttsSz.toLong); wTag("ctts"); w32(0); w32(2)
      w32(2); w32(mp4CttsOffset(d, 0)); w32((nS - 2).toLong); w32(mp4CttsOffset(d, 2))
    }
    w32(stszSz.toLong); wTag("stsz"); w32(0); w32(0); w32(nS.toLong)
    sizes.foreach(s => w32(s.toLong))
    w32(stscSz.toLong); wTag("stsc"); w32(0); w32(scRuns.length.toLong)
    scRuns.foreach { case (fc, per) => w32(fc.toLong); w32(per.toLong); w32(1) }
    w32(stcoSz.toLong); wTag(if (co64) "co64" else "stco"); w32(0); w32(nC.toLong)
    if (co64) chunkPos.foreach { o => w32(o >> 32); w32(o & 0xffffffffL) }
    else chunkPos.foreach(w32)
    w32(stssSz.toLong); wTag("stss"); w32(0); w32(nSync.toLong)
    (0 until nS).filter(_ % 3 == 0).foreach(i => w32((i + 1).toLong))
    w32((8L + sizes.sum)); wTag("mdat")
    for (c <- fileOrder; i <- chunkSamples(c); j <- 0 until sizes(i))
      w8(mp4SampleByte(d, i, j))
    out.toByteArray
  }
}
