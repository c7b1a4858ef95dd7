package graft.expressions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BYTE-level BPE with special tokens — the production tokenizer shape
  * ([[Bpe]] merges over characters of pre-normalized [a-z0-9] words;
  * real tokenizers merge over UTF-8 BYTES so *no input is ever OOV*):
  *
  *   - the base alphabet is the 256 byte values, rendered as 2-hex-char
  *     tokens (lowercase); every word of ANY input — emoji, CJK,
  *     control bytes, malformed fragments — starts as its exact UTF-8
  *     byte sequence, so encoding is total and losslessly decodable
  *     (concatenate a word's hex tokens, unhex). The zero-OOV property
  *     is structural, not a vocabulary promise;
  *   - merges learned by [[graft.operators.BpeTrain.trainBytes]] apply
  *     in rank order with the same leftmost-first fold (and the same
  *     rank-order == priority-loop proof) as [[Bpe]];
  *   - a RESERVED token table ([BOS], [EOS], [PAD], [UNK], …) is
  *     validated at table construction: reserved tokens must be
  *     non-empty, '|'-free (they ride the same joined encoding),
  *     pairwise distinct, and must NOT look like a merge output (an
  *     even-length lowercase-hex string) — so no learned merge can
  *     ever collide with or forge a special token. The encoder brackets
  *     every document with reserved(0)/reserved(1).
  *
  * Words are split on single spaces ONLY — byte-level tokenizers do
  * not normalize; tabs/newlines stay inside words as their bytes
  * (0x09, 0x0a), which is exactly how byte-level vocabularies encode
  * whitespace-adjacent text. */
object ByteBpe {

  /** Default reserved table: document bracket pair first (the encoder
    * emits them), then pad/unk ids a serving stack reserves. */
  val Reserved: Vector[String] = Vector("[BOS]", "[EOS]", "[PAD]", "[UNK]")

  private val HexShape = "^(?:[0-9a-f]{2})+$".r

  /** Compiled byte-level table: operands must be a single byte (2 hex
    * chars) or an earlier merge's output; reserved tokens validated as
    * documented above. */
  final class ByteTable(merges: Seq[(String, String)], val reserved: Seq[String])
      extends Serializable {
    locally {
      require(reserved.size >= 2, "byte bpe: need at least [BOS]/[EOS] reserved tokens")
      require(reserved.distinct.size == reserved.size,
        s"byte bpe: reserved tokens must be distinct: $reserved")
      for (t <- reserved) {
        require(t.nonEmpty && !t.contains("|"),
          s"byte bpe: reserved token '$t' must be non-empty and '|'-free")
        require(HexShape.findFirstIn(t).isEmpty,
          s"byte bpe: reserved token '$t' is hex-shaped — a learned merge could forge it")
      }
      val available = scala.collection.mutable.Set[String]()
      for (((x, y), i) <- merges.zipWithIndex) {
        def ok(s: String) =
          (s.length == 2 && HexShape.findFirstIn(s).isDefined) || available.contains(s)
        require(ok(x) && ok(y),
          s"byte bpe merges rank $i ($x,$y): operands must be single bytes or earlier outputs")
        available += (x + y)
      }
    }
    val mx: Array[String] = merges.map(_._1).toArray
    val my: Array[String] = merges.map(_._2).toArray
    val mxy: Array[String] = merges.map(p => p._1 + p._2).toArray
  }

  /** `byte_bpe_encode(text)` under a learned table: '|'-joined tokens,
    * bracketed by reserved(0)/reserved(1). NULL in, NULL out; empty
    * text encodes to just the bracket pair. */
  def encodeWith(text: Column, merges: Seq[(String, String)],
      reserved: Seq[String] = Reserved): Column =
    graftx.column(ByteBpeEncode(graftx.expr(text), merges, reserved))

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Codegen entry: split on ' ', each word → lowercase-hex byte
    * tokens → rank-order merge fold → '|' join, all inside the
    * reserved bracket pair. */
  def encodeBytesImpl(text: UTF8String, table: ByteTable): UTF8String = {
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length * 3 + 16)
    sb.append(table.reserved(0))
    var start = 0
    while (start <= s.length) {
      val sp = s.indexOf(' ', start)
      val end = if (sp < 0) s.length else sp
      if (end > start) {
        val bytes = s.substring(start, end).getBytes(StandardCharsets.UTF_8)
        val toks = new Array[String](bytes.length)
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          toks(i) = new String(Array(HexDigits(b >> 4), HexDigits(b & 0xf)))
          i += 1
        }
        var n = toks.length
        var m = 0
        while (m < table.mx.length && n > 1) {
          n = foldMerge(toks, n, table.mx(m), table.my(m), table.mxy(m))
          m += 1
        }
        var t = 0
        while (t < n) {
          sb.append('|').append(toks(t))
          t += 1
        }
      }
      start = end + 1
    }
    sb.append('|').append(table.reserved(1))
    UTF8String.fromString(sb.toString)
  }

  /** Same in-place leftmost-first fold as [[Bpe]] (duplicated locally:
    * the two kernels must stay independently evolvable). */
  private def foldMerge(toks: Array[String], n: Int, x: String, y: String,
      xy: String): Int = {
    var out = 0
    var r = 0
    while (r < n) {
      if (out > 0 && toks(out - 1) == x && toks(r) == y) toks(out - 1) = xy
      else { toks(out) = toks(r); out += 1 }
      r += 1
    }
    out
  }

  /** Decode the hex-token run of ONE word back to its string — the
    * zero-OOV/losslessness witness used by specs (reserved tokens are
    * not words; strip them first). */
  def decodeWord(tokens: Seq[String]): String = {
    val hexStr = tokens.mkString
    val bytes = new Array[Byte](hexStr.length / 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = Integer.parseInt(hexStr.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    new String(bytes, StandardCharsets.UTF_8)
  }
}

/** [[Bpe.BpeEncodeWith]]'s byte-level sibling: table compiles once per
  * plan (validation included) and rides into codegen as a reference. */
case class ByteBpeEncode(child: Expression, merges: Seq[(String, String)],
    reserved: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "byte_bpe_encode"

  @transient private lazy val table = new ByteBpe.ByteTable(merges, reserved)

  override protected def nullSafeEval(input: Any): Any =
    ByteBpe.encodeBytesImpl(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeTable", table,
      classOf[ByteBpe.ByteTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.expressions.ByteBpe.encodeBytesImpl($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteBpeEncode =
    copy(child = newChild)
}
