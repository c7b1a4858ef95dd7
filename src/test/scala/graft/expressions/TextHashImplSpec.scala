package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM tests for the fused text-hash kernels (no Spark needed). */
class TextHashImplSpec extends AnyFunSuite {

  private def utf8(s: String) = UTF8String.fromString(s)

  test("tokenize lowercases and splits on non-alphanumeric runs") {
    assert(TextHashImpl.tokenize("Hello, World!  42x") === Array("hello", "world", "42x"))
    assert(TextHashImpl.tokenize("") === Array.empty[String])
    assert(TextHashImpl.tokenize("!!!") === Array.empty[String])
  }

  test("shingleHashes is empty below n tokens and deterministic") {
    assert(TextHashImpl.shingleHashes("one two", 3).isEmpty)
    val a = TextHashImpl.shingleHashes("a b c d", 3)
    val b = TextHashImpl.shingleHashes("a b c d", 3)
    assert(a.length === 2) // "a b c", "b c d"
    assert(a.toSeq === b.toSeq)
  }

  test("shingle hashing is case/punctuation insensitive (normalized)") {
    val a = TextHashImpl.shingleHashes("The Quick Brown Fox", 2)
    val b = TextHashImpl.shingleHashes("the quick, brown... fox", 2)
    assert(a.toSeq === b.toSeq)
  }

  test("minHash returns NULL (not a sentinel) for docs with < n tokens") {
    assert(TextHashImpl.minHash(utf8("short doc"), 3, 16) === null)
    assert(TextHashImpl.minHash(utf8(""), 3, 16) === null)
    assert(TextHashImpl.minHashBands(utf8("x"), 3, 16, 4) === null)
  }

  test("minHash: identical docs agree fully, disjoint docs agree ~0") {
    val d1 = "the quick brown fox jumps over the lazy dog again and again"
    val d2 = "zz yy xx ww vv uu tt ss rr qq pp oo"
    val s1 = TextHashImpl.minHash(utf8(d1), 3, 64)
    val s1b = TextHashImpl.minHash(utf8(d1), 3, 64)
    val s2 = TextHashImpl.minHash(utf8(d2), 3, 64)
    assert(TextHashImpl.sigAgreement(s1, s1b) === 1.0)
    assert(TextHashImpl.sigAgreement(s1, s2) < 0.2)
  }

  test("minHash agreement tracks true Jaccard for a near-dup") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val edited = ((1 to 38).map(i => s"tok$i") ++ Seq("changed", "words")).mkString(" ")
    val trueJ = TextHashImpl.ngramJaccard(utf8(base), utf8(edited), 3)
    val est = TextHashImpl.sigAgreement(
      TextHashImpl.minHash(utf8(base), 3, 256),
      TextHashImpl.minHash(utf8(edited), 3, 256))
    assert(math.abs(trueJ - est) < 0.12, s"true=$trueJ est=$est")
  }

  test("minHashBands: k/rowsPerBand hashes; identical docs share all bands") {
    val d = utf8("a b c d e f g h")
    val bands = TextHashImpl.minHashBands(d, 3, 16, 4)
    assert(bands.numElements() === 4)
    assert(bands.toLongArray().toSeq ===
      TextHashImpl.minHashBands(d, 3, 16, 4).toLongArray().toSeq)
  }

  test("ngramJaccard: exact values on crafted shingle sets") {
    // "a b c d" → {abc, bcd}; "b c d e" → {bcd, cde}; inter=1 union=3
    val j = TextHashImpl.ngramJaccard(utf8("a b c d"), utf8("b c d e"), 3)
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
    assert(TextHashImpl.ngramJaccard(utf8("a b c"), utf8("a b c"), 3) === 1.0)
    // both empty → 0.0, and empty-vs-nonempty → 0.0
    assert(TextHashImpl.ngramJaccard(utf8(""), utf8(""), 3) === 0.0)
    assert(TextHashImpl.ngramJaccard(utf8(""), utf8("a b c"), 3) === 0.0)
  }

  test("simHash: deterministic, order-sensitive only through token multiset") {
    val h1 = TextHashImpl.simHash(utf8("alpha beta gamma delta"))
    val h2 = TextHashImpl.simHash(utf8("delta gamma beta alpha"))
    assert(h1 === h2) // bag-of-words: order must not matter
    val h3 = TextHashImpl.simHash(utf8("totally different content here"))
    assert(h1 !== h3)
  }

  test("simHash of near-identical docs has small hamming distance") {
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val nearDup = base + " extra"
    val far = (100 to 150).map(i => s"z$i").mkString(" ")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hBase = TextHashImpl.simHash(utf8(base))
    assert(hamming(hBase, TextHashImpl.simHash(utf8(nearDup))) < 8)
    assert(hamming(hBase, TextHashImpl.simHash(utf8(far))) > 16)
  }
}
