package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestSupport
import graft.expressions.Bpe

/** [[BpeTrain]] — distributed BPE tokenizer training. Contracts:
  * hand-computable corpora learn exactly the hand-computed merges
  * (freq-weighted OVERLAPPING pair counts, deterministic tie-break),
  * training stops when no pair remains, learned tables are well-formed
  * and round-trip through [[Bpe.encodeWith]]. */
class BpeTrainSpec extends AnyFunSuite with SparkTestSupport {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.toDF("text")
  }

  test("hand corpus: learned merges, counts, and early exhaustion match the model") {
    // word types: abab×3, ab×2, ba×1
    //   round 1: (a,b) = 2·3 + 1·2 = 8 beats (b,a) = 3+1 = 4
    //   round 2: (ab,ab) = 3 beats (b,a) = 1
    //   round 3: (b,a) = 1 — last pair anywhere
    //   round 4: nothing adjacent → training stops at 3 of 5 merges
    val learned = BpeTrain.train(docs("abab abab ab", "abab ab ba"), col("text"), 5)
    assert(learned === Vector(
      BpeTrain.Merge(1, "a", "b", 8L),
      BpeTrain.Merge(2, "ab", "ab", 3L),
      BpeTrain.Merge(3, "b", "a", 1L)))
  }

  test("tie-break is lexicographic on (x, y) at equal counts") {
    // (a,b) and (c,d) both count 2 → (a,b) must win round 1
    val learned = BpeTrain.train(docs("ab cd", "ab cd"), col("text"), 2)
    assert(learned.map(m => (m.x, m.y)) === Vector(("a", "b"), ("c", "d")))
    assert(learned.map(_.cnt) === Vector(2L, 2L))
  }

  test("overlapping occurrences count (canonical get_stats); merge applies leftmost-first") {
    // 'aaa': (a,a) appears at two positions → cnt 2; the merge folds
    // leftmost-first to aa|a, and round 2 sees (aa,a) once
    val learned = BpeTrain.train(docs("aaa"), col("text"), 2)
    assert(learned === Vector(
      BpeTrain.Merge(1, "a", "a", 2L),
      BpeTrain.Merge(2, "aa", "a", 1L)))
  }

  test("normalization feeds training: case folds, punctuation splits words") {
    // "Ab-ab!" normalizes to "ab ab" — same table as plain "ab ab"
    val a = BpeTrain.train(docs("Ab-ab!"), col("text"), 3)
    val b = BpeTrain.train(docs("ab ab"), col("text"), 3)
    assert(a === b)
    assert(a.head === BpeTrain.Merge(1, "a", "b", 2L))
  }

  test("learned table is well-formed, round-trips through parquet, and serves through encodeWith") {
    val learned = BpeTrain.train(docs("abab abab ab", "abab ab ba"), col("text"), 5)
    // persist → restore: the shipped artifact must be the same table
    val dir = java.nio.file.Files.createTempDirectory("bpe-save").toString
    BpeTrain.save(spark, learned, dir)
    assert(BpeTrain.load(spark, dir) === learned)
    val merges = learned.map(m => (m.x, m.y))
    // well-formedness: MergeTable compiles (require passes) — every
    // operand is a char or an earlier output, by construction
    new Bpe.MergeTable(merges)
    // serve: training-corpus words re-encode to their final training
    // state; unseen words degrade gracefully (no applicable merge →
    // char sequence)
    val got = docs("abab ab ba aaa x")
      .select(Bpe.encodeWith(col("text"), merges))
      .head().getString(0)
    assert(got === "abab|ab|ba|a|a|a|x")
  }

  test("encodeWith against the static Merges table equals the static kernel") {
    // the parameterized path and the compiled-in path must be the SAME
    // kernel — run both over adversarial inputs
    val d = docs("The TH-E the", "this is interesting", "2000 a 19", "", "  --  ")
    val rows = d.select(
      Bpe.encode(col("text")),
      Bpe.encodeWith(col("text"), Bpe.Merges)).collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("fuzz: random corpora train identically to an independent driver-side reference") {
    // a THIRD implementation (beside the Spark loop and the DuckDB
    // replay): plain-Scala get_stats/argmax/merge over a word-freq map
    def reference(texts: Seq[String], nMerges: Int): Vector[BpeTrain.Merge] = {
      val wf = texts.flatMap(_.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
          .split(" ")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      var enc: Map[Vector[String], Long] =
        wf.groupBy { case (w, _) => w.map(_.toString).toVector }
          .view.mapValues(_.values.sum).toMap
      val out = Vector.newBuilder[BpeTrain.Merge]
      var rank = 1
      var done = false
      while (rank <= nMerges && !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((toks, f) <- enc; i <- 0 until toks.length - 1)
          counts((toks(i), toks(i + 1))) = counts.getOrElse((toks(i), toks(i + 1)), 0L) + f
        if (counts.isEmpty) done = true
        else {
          val ((x, y), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
          out += BpeTrain.Merge(rank, x, y, cnt)
          enc = enc.groupMapReduce { case (toks, _) =>
            val merged = Vector.newBuilder[String]
            var i = 0
            while (i < toks.length) {
              if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
                merged += x + y; i += 2
              } else { merged += toks(i); i += 1 }
            }
            merged.result()
          } { case (_, f) => f }(_ + _)
          rank += 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(23)
    val alphabet = "abcde"
    for (trial <- 1 to 3) {
      val words = Seq.fill(6 + rnd.nextInt(8))(
        (1 to 1 + rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val texts = Seq.fill(4)(Seq.fill(5 + rnd.nextInt(10))(
        words(rnd.nextInt(words.length))).mkString(" "))
      val got = BpeTrain.train(docs(texts: _*), col("text"), 8)
      val want = reference(texts, 8)
      assert(got === want, s"trial $trial: corpus=$texts")
    }
  }

  test("applyMergeImpl: single-token short-circuit, fold correctness, no-op identity") {
    def am(enc: String, x: String, y: String): String =
      Bpe.applyMergeImpl(UTF8String.fromString(enc), x, y).toString
    assert(am("a", "a", "b") === "a")
    assert(am("a|b|a|b", "a", "b") === "ab|ab")
    assert(am("a|a|a", "a", "a") === "aa|a") // leftmost-first, no overlap reuse
    assert(am("x|y|z", "a", "b") === "x|y|z")
    assert(am("ab|ab", "ab", "ab") === "abab")
  }
}
