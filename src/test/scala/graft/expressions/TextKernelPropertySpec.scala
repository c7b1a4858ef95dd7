package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** Randomized parity of every one-pass text kernel against its
  * specification twin (the regex/HOF composition the kernel replaced, or
  * an independent test-side reimplementation) over adversarial inputs:
  * unicode one-to-many lowercasing (İ), combining marks, CJK, long
  * whitespace runs, punctuation storms, digits, empties. Seeded RNG —
  * deterministic across runs (repo property-test style, GngOpsSpec).
  *
  * `\x0B` (vertical tab) is deliberately EXCLUDED from generation: the
  * kernels follow RE2's `\s` (the DuckDB oracle is the spec), while the
  * Spark/Java regex twins used here classify it as whitespace — the one
  * intentional divergence, pinned by its own fixed case below.
  */
class TextKernelPropertySpec extends AnyFunSuite with SparkTestSupport {

  private val alphabet: Array[String] = (
    ('a' to 'z').map(_.toString) ++ ('A' to 'Z').map(_.toString) ++
      ('0' to '9').map(_.toString) ++
      Seq(" ", " ", " ", "\t", "\n", "\f", "\r", ".", ",", ";", "!", "?",
        "@", "#", "-", "_", "/", "'", "\"", "(", ")",
        "é", "ü", "ß", "İ", "ı", "中", "文", "नी", "🙂",
        "the ", "and ", "de ", "la ", "der ", "les ")
    ).toArray

  private def randomTexts(n: Int, seed: Long): Seq[String] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = rng.nextInt(40)
      (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    } ++ Seq("", " ", "\t\n", "a", "the the the", "123 456 123")
  }

  private lazy val df = {
    import spark.implicits._
    randomTexts(400, seed = 1234L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("normalizeText == trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))") {
    val rows = df.select(
      TextHash.normalizeText(col("text")),
      trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))).collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("wsTokenCount == size(regexp_extract_all(text, '\\S+')) on RE2-safe input") {
    val rows = df.select(
      TextHash.wsTokenCount(col("text")),
      size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))).collect()
    // Spark size() returns 0 for the empty match array; both are Int
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("vertical tab: kernel follows RE2 (counts \\x0B as non-whitespace), Java regex does not") {
    val rows = spark.sql("SELECT concat(chr(97), chr(11), chr(98)) AS text")
      .select(
        TextHash.wsTokenCount(col("text")),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))).head()
    assert(rows.getInt(0) === 1) // RE2: one token "ab"
    assert(rows.getInt(1) === 2) // Java \s contains \x0B: two tokens
  }

  test("langId == independent argmax reimplementation") {
    val got = df.select(col("text"), TextHash.langId(col("text"))).collect()
    val stop = graft.functions.TextFunctions.langStopwords
    got.foreach { r =>
      val toks = TextHashImpl.tokenize(r.getString(0))
      val hits = stop.map { case (_, ws) => toks.count(ws.contains) }
      val best = hits.zipWithIndex.foldLeft(("und", 0)) {
        case ((bl, bh), (h, i)) => if (h > bh) (stop(i)._1, h) else (bl, bh)
      }._1
      assert(r.getString(1) === best, s"text=${r.getString(0)}")
    }
  }

  test("rollingFingerprint == independent md5-fold reimplementation") {
    val got = df.select(col("text"), TextHash.rollingFingerprint(col("text"))).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { r =>
      val norm = TextHashImpl.normalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))).toString
      val expected = norm.split(" ", -1).foldLeft(0L) { (h, tok) =>
        md.reset()
        val d = md.digest(tok.getBytes("UTF-8"))
        val th = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        (h * 31L + th) % 2147483647L
      }
      assert(r.getLong(1) === expected)
    }
  }

  test("repetitionStats == independent naive reimplementation") {
    val got = df.select(col("text"), TextHash.repetitionStats(col("text"))).collect()
    got.foreach { r =>
      val toks = TextHashImpl.tokenize(r.getString(0))
      val (dup, top) =
        if (toks.isEmpty) (0.0, 0.0)
        else {
          val d = 1.0 - toks.distinct.length.toDouble / toks.length
          val t =
            if (toks.length < 2) 0.0
            else {
              val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
              bigrams.groupBy(identity).values.map(_.size).max.toDouble / (toks.length - 1)
            }
          (d, t)
        }
      val rep = r.getSeq[Double](1)
      assert(rep(0) === dup, s"dup for '${r.getString(0)}'")
      assert(rep(1) === top, s"top for '${r.getString(0)}'")
    }
  }

  test("bpeEncode == independent lowest-rank-first priority loop (canonical BPE)") {
    // the kernel applies merges in RANK ORDER, each exhaustively; this
    // twin runs the canonical priority algorithm real encoders use —
    // repeatedly find the LOWEST-RANK pair present, merge all its
    // occurrences leftmost-first. Equality over the adversarial corpus
    // is the empirical side of the well-formed-table equivalence proof
    // in Bpe's scaladoc.
    val rank = Bpe.Merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    def refWord(word: String): Seq[String] = {
      var toks = word.map(_.toString).toVector
      var done = false
      while (!done) {
        val present = toks.zip(toks.drop(1)).flatMap(p => rank.get(p))
        if (present.isEmpty) done = true
        else {
          val (x, y) = Bpe.Merges(present.min)
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
              out += (x + y); i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.toVector
        }
      }
      toks
    }
    val rows = df.select(col("text"), Bpe.encode(col("text"))).collect()
    rows.foreach { r =>
      val expected = TextHashImpl.normalize(
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
        .toString.split(' ').filter(_.nonEmpty).flatMap(refWord).mkString("|")
      assert(r.getString(1) === expected, s"text='${r.getString(0)}'")
    }
    // fixed anchors: multi-merge cascades and the repeated-pair fold
    val fixed = spark.sql(
      "SELECT 'the' a, 'this' b, 'another' c, '2000' d, 'aaa' e, 'interesting' f")
    val got = fixed.columns.map(c =>
      fixed.select(Bpe.encode(col(c))).head().getString(0))
    assert(got(0) === "the")
    assert(got(1) === "this") // th+is — both operands are merge outputs
    assert(got(2) === "an|o|the|r")
    assert(got(3) === "2|00|0") // leftmost-first on the repeated pair
    assert(got(4) === "a|a|a") // (a,a) is not in the table
    assert(got(5) === "in|t|er|es|t|ing")
  }

  test("qualityScore == regex-composition twin on RE2-safe input") {
    val chars = greatest(length(col("text")), lit(1)).cast("double")
    val punct = size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double")
    val toks = greatest(size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))), lit(1)).cast("double")
    val stopHits = TextHash.stopwordHits(col("text"), 0).cast("double")
    val twin = round(
      least(chars / 500.0, lit(1.0)) * 0.4 +
        (lit(1.0) - punct / chars) * 0.3 +
        least(stopHits * 10.0 / toks, lit(1.0)) * 0.3 + lit(1e-9), 4)
    val rows = df
      // the 🙂 code point: Spark length() counts code points, the
      // kernel counts them identically, but the regex twin's char class
      // operates per code point too — keep it in (parity must hold)
      .select(TextHash.qualityScore(col("text")), twin).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }
}
