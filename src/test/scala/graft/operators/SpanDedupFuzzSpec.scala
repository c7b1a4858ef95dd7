package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** Seeded randomized fuzz for the whole span family against an
  * independent driver-side model that compares gram STRINGS (not
  * hashes) with a naive interval merge — a different algorithm from
  * both the windowed hash plan and the DuckDB CTE replay, so agreement
  * is evidence, not self-confirmation. Corpora draw from a tiny vocab
  * so shared runs arise naturally; the full/incremental equality
  * claims are checked on random old/new splits. */
class SpanDedupFuzzSpec extends AnyFunSuite with SparkTestSupport {

  private val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")

  private def corpus(rnd: scala.util.Random, nDocs: Int): Seq[(Long, String)] =
    (1 to nDocs).map { i =>
      val len = rnd.nextInt(26)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }

  // ---- independent model ----

  private def toks(t: String): Array[String] =
    t.split(" ").filter(_.nonEmpty)

  private def gramsOf(docs: Seq[(Long, String)], k: Int): Seq[(Long, Int, String)] =
    docs.flatMap { case (id, t) =>
      val ts = toks(t)
      (0 to ts.length - k).map(s => (id, s, ts.slice(s, s + k).mkString(" ")))
    }

  private def mergeRuns(starts: Seq[Int], k: Int): Seq[(Long, Long, Long)] = {
    // maximal merged [start, start+k) windows; n_grams per run
    val sorted = starts.sorted
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    for (s <- sorted) {
      if (out.nonEmpty && s <= out.last._2) {
        val (a, b, n) = out.remove(out.length - 1)
        out += ((a, math.max(b, s + k), n + 1))
      } else out += ((s, s + k, 1))
    }
    out.map { case (a, b, n) => (a.toLong, b.toLong, n.toLong) }.toSeq
  }

  /** Model duplicateSpans: (id, span_start, span_end, n_grams). */
  private def modelSpans(docs: Seq[(Long, String)], k: Int,
      emit: Long => Boolean = _ => true): Seq[(Long, Long, Long, Long)] = {
    val g = gramsOf(docs, k)
    val crossDoc = g.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    g.filter(x => crossDoc(x._3) && emit(x._1))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (id, hs) =>
        mergeRuns(hs.map(_._2), k).map { case (a, b, n) => (id, a, b, n) }
      }
  }

  /** Model cut: canonical = min (priority, id, start); returns the
    * patch rows (id, n_spans_cut, n_before, n_after, clean_text). */
  private def modelCuts(docs: Seq[(Long, String)], k: Int,
      priority: Long => Int = _ => 0,
      emit: Long => Boolean = _ => true): Seq[(Long, Long, Long, Long, String)] = {
    val g = gramsOf(docs, k)
    val byGram = g.groupBy(_._3)
    val crossDoc = byGram.filter(_._2.map(_._1).distinct.size >= 2).keySet
    val canonical = byGram.view.mapValues(
      _.minBy { case (id, s, _) => (priority(id), id, s) }).toMap
    val cuts = g.filter { case (id, s, gr) =>
      crossDoc(gr) && emit(id) && {
        val (cid, cs, _) = canonical(gr); !(cid == id && cs == s)
      }
    }
    cuts.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, hs) =>
      val runs = mergeRuns(hs.map(_._2), k)
      val ts = toks(docs.find(_._1 == id).get._2)
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !runs.exists(r => i >= r._1 && i < r._2) => t
      }
      (id, runs.size.toLong, ts.length.toLong, kept.length.toLong, kept.mkString(" "))
    }
  }

  // ---- engine runners ----

  private def df(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    docs.toDF("id", "text")
  }

  private def spanRows(d: org.apache.spark.sql.DataFrame) =
    d.orderBy(col("id"), col("span_start")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  private def cutRows(d: org.apache.spark.sql.DataFrame) =
    d.orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq

  test("fuzz: duplicateSpans and cutDuplicateSpans equal the string-gram model on random corpora") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 3) {
      val k = 2 + rnd.nextInt(2)
      val docs = corpus(rnd, 5 + rnd.nextInt(5))
      val spans = spanRows(SpanDedup.duplicateSpans(df(docs), col("text"), col("id"), k))
      assert(spans === modelSpans(docs, k), s"trial $trial k=$k docs=$docs")
      val cuts = cutRows(SpanDedup.cutDuplicateSpans(df(docs), col("text"), col("id"), k))
      assert(cuts === modelCuts(docs, k), s"trial $trial k=$k docs=$docs")
    }
  }

  test("fuzz: incremental detection and cut against a random old/new split equal the model") {
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 3) {
      val k = 2 + rnd.nextInt(2)
      val docs = corpus(rnd, 6 + rnd.nextInt(5))
      // random split; ensure both sides non-empty
      val isNew = docs.map(d => d._1 -> (rnd.nextBoolean() || d._1 == docs.last._1)).toMap
      val old = docs.filter(d => !isNew(d._1))
      val neu = docs.filter(d => isNew(d._1))
      if (old.nonEmpty && neu.nonEmpty) {
        val index = SpanDedup.gramIndex(df(old), col("text"), col("id"), k)
        val inc = spanRows(
          SpanDedup.spansAgainstIndex(df(neu), col("text"), col("id"), index, k))
        assert(inc === modelSpans(docs, k, emit = isNew),
          s"trial $trial k=$k split=$isNew docs=$docs")
        val cut = cutRows(
          SpanDedup.cutSpansAgainstIndex(df(neu), col("text"), col("id"), index, k))
        // stored-corpus-wins: old docs take canonical priority
        assert(cut === modelCuts(docs, k,
            priority = id => if (isNew(id)) 1 else 0, emit = isNew),
          s"trial $trial k=$k split=$isNew docs=$docs")
      }
    }
  }

  test("fuzz: gram-index folds land on the rebuild for random slicings") {
    val rnd = new scala.util.Random(59)
    for (trial <- 1 to 3) {
      val docs = corpus(rnd, 6 + rnd.nextInt(6))
      val kSlices = 1 + rnd.nextInt(3)
      val slices = docs.zipWithIndex.groupMap(_._2 % kSlices)(_._1).values.toSeq
        .filter(_.nonEmpty)
      val folded = slices.map(s => SpanDedup.gramIndex(df(s), col("text"), col("id"), 3))
        .reduce(SpanDedup.mergeGramIndex)
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.orderBy(col("gh")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val rebuild = rows(SpanDedup.gramIndex(df(docs), col("text"), col("id"), 3))
      assert(rows(folded) === rebuild, s"trial $trial slices=${slices.map(_.map(_._1))}")
    }
  }
}
