package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** Inverted index: AND semantics, posting dedup, layout metadata, and
  * the bucket-pruned serving shape. */
class InvertedIndexSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark merge fast"),
    (2L, "spark spark merge merge"), // repeated terms → one posting each
    (3L, "merge only here"),
    (4L, "Spark MERGE!"), // normalization folds case/punct
    (5L, "nothing relevant")
  ).toDF("doc_id", "text")

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("inv-idx").toString + "/idx"
    InvertedIndex.build(docs, col("doc_id"), col("text"), nBuckets = 4, dir = d)
    d
  }

  private def hits(terms: String*): Set[Long] =
    InvertedIndex.lookupAll(spark, dir, terms).collect().map(_.getLong(0)).toSet

  test("AND query returns exactly the docs containing every term") {
    assert(hits("spark", "merge") === Set(1L, 2L, 4L))
    assert(hits("spark", "merge", "fast") === Set(1L))
    assert(hits("merge") === Set(1L, 2L, 3L, 4L))
  }

  test("repeated terms in a doc produce one posting (count IS the AND)") {
    // doc 2 has 'spark' and 'merge' twice each — a non-distinct build
    // would double-count and pass the nt==2 filter for single-term docs
    assert(hits("spark", "merge").contains(2L))
    assert(!hits("spark", "fast").contains(2L))
  }

  test("unknown term empties the conjunction; duplicate query terms collapse") {
    assert(hits("spark", "absentterm") === Set.empty)
    assert(hits("spark", "spark", "merge") === Set(1L, 2L, 4L))
  }

  test("serving prunes to the query terms' bucket partitions at listing time") {
    // inspect the UNEXECUTED plan: the bucket predicate is a literal IN,
    // so pruning is static — and post-collect() AQE leaves are
    // QueryStageExec wrappers that hide the scan from child traversal
    val df = InvertedIndex.lookupAll(spark, dir, Seq("spark"))
    // descend through the AQE wrapper (aggregation ⇒ AdaptiveSparkPlanExec)
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan).headOption
    assert(scan.nonEmpty)
    assert(scan.get.partitionFilters.exists(_.references.exists(_.name == "bucket")),
      s"bucket predicate must reach PartitionFilters:\n${scan.get.partitionFilters}")
  }

  test("a directory without _meta.json is refused (layout params travel with the layout)") {
    val bare = java.nio.file.Files.createTempDirectory("inv-bare").toString
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.lookupAll(spark, bare, Seq("x"))
    }
    assert(e.getMessage.contains("_meta.json"))
  }

  test("incremental append == one-shot rebuild, for every query") {
    val d2 = java.nio.file.Files.createTempDirectory("inv-inc").toString + "/idx"
    InvertedIndex.build(docs.filter($"doc_id" <= 2), col("doc_id"), col("text"),
      nBuckets = 4, dir = d2)
    InvertedIndex.append(docs.filter($"doc_id" > 2), col("doc_id"), col("text"), d2)
    for (q <- Seq(Seq("spark", "merge"), Seq("merge"), Seq("spark", "merge", "fast")))
      assert(
        InvertedIndex.lookupAll(spark, d2, q).collect().map(_.getLong(0)).toSet ===
          InvertedIndex.lookupAll(spark, dir, q).collect().map(_.getLong(0)).toSet,
        s"query $q")
  }

  test("delete tombstones == rebuild without the docs; compact clears them; delete is idempotent") {
    val d2 = java.nio.file.Files.createTempDirectory("inv-del").toString + "/idx"
    InvertedIndex.build(docs, col("doc_id"), col("text"), nBuckets = 4, dir = d2)
    InvertedIndex.delete(spark, d2, Seq(2L, 4L))
    InvertedIndex.delete(spark, d2, Seq(4L)) // re-delete: no effect
    val rebuilt = java.nio.file.Files.createTempDirectory("inv-reb").toString + "/idx"
    InvertedIndex.build(docs.filter(!$"doc_id".isin(2L, 4L)),
      col("doc_id"), col("text"), nBuckets = 4, dir = rebuilt)
    def ids(d: String, q: String*) =
      InvertedIndex.lookupAll(spark, d, q).collect().map(_.getLong(0)).toSet
    assert(ids(d2, "spark", "merge") === Set(1L))
    assert(ids(d2, "spark", "merge") === ids(rebuilt, "spark", "merge"))
    assert(ids(d2, "merge") === ids(rebuilt, "merge"))
    // compaction rewrites the postings live and drops the tombstones
    val compacted = java.nio.file.Files.createTempDirectory("inv-cmp").toString + "/idx"
    InvertedIndex.compact(spark, d2, compacted)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(compacted, "_deletes")))
    assert(ids(compacted, "merge") === ids(rebuilt, "merge"))
    assert(ids(compacted, "spark", "merge") === Set(1L))
  }

  test("appending a tombstoned doc id is refused loudly (postings would vanish at compact)") {
    val d2 = java.nio.file.Files.createTempDirectory("inv-tg").toString + "/idx"
    InvertedIndex.build(docs, col("doc_id"), col("text"), nBuckets = 4, dir = d2)
    InvertedIndex.delete(spark, d2, Seq(3L))
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.append(docs.filter($"doc_id" === 3L), col("doc_id"), col("text"), d2)
    }
    assert(e.getMessage.contains("tombstoned"))
    // non-tombstoned ids still append fine on the same index
    InvertedIndex.append(
      docs.filter($"doc_id" === 1L).select($"doc_id" + 100L as "doc_id", $"text"),
      col("doc_id"), col("text"), d2)
    assert(InvertedIndex.lookupAll(spark, d2, Seq("fast"))
      .collect().map(_.getLong(0)).toSet === Set(1L, 101L))
  }

  test("delete and append interleave: a re-added doc id serves again after compaction") {
    val d2 = java.nio.file.Files.createTempDirectory("inv-il").toString + "/idx"
    InvertedIndex.build(docs, col("doc_id"), col("text"), nBuckets = 4, dir = d2)
    InvertedIndex.delete(spark, d2, Seq(1L))
    assert(!InvertedIndex.lookupAll(spark, d2, Seq("fast"))
      .collect().map(_.getLong(0)).contains(1L))
    // takedown reversed: compact away the tombstone, then re-add
    val d3 = java.nio.file.Files.createTempDirectory("inv-il2").toString + "/idx"
    InvertedIndex.compact(spark, d2, d3)
    InvertedIndex.append(docs.filter($"doc_id" === 1L), col("doc_id"), col("text"), d3)
    assert(InvertedIndex.lookupAll(spark, d3, Seq("spark", "merge", "fast"))
      .collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("bm25 scores match the hand-computed Lucene formula; ranking on rounded score") {
    val got = InvertedIndex.bm25TopK(spark, dir, Seq("spark", "merge"), k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // reference: recompute from the fixture (normalized tokens)
    val toks = Map(
      1L -> Seq("spark", "merge", "fast"),
      2L -> Seq("spark", "spark", "merge", "merge"),
      3L -> Seq("merge", "only", "here"),
      4L -> Seq("spark", "merge"),
      5L -> Seq("nothing", "relevant"))
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    def df(t: String) = toks.values.count(_.contains(t)).toDouble
    def score(d: Long): Double = {
      val s = Seq("spark", "merge").map { t =>
        val tf = toks(d).count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * toks(d).size / avgdl))
      }.sum
      BigDecimal(s + 1e-9).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = Seq(1L, 2L, 3L, 4L).map(d => d -> score(d))
      .sortBy { case (d, sc) => (-sc, d) }.take(5)
    assert(got.toSeq === expected)
    // doc 2's repeated terms saturate, not double: tf=2 scores < 2x tf=1
    assert(got.toMap.apply(2L) < 2 * got.toMap.apply(4L))
  }

  test("bm25 over an incrementally-grown index == full rebuild (stats are additive)") {
    val inc = java.nio.file.Files.createTempDirectory("inv-bm-inc").toString + "/idx"
    InvertedIndex.build(docs.filter($"doc_id" <= 2), col("doc_id"), col("text"),
      nBuckets = 4, dir = inc)
    InvertedIndex.append(docs.filter($"doc_id" > 2), col("doc_id"), col("text"), inc)
    assert(InvertedIndex.readMeta(inc) === InvertedIndex.readMeta(dir))
    val a = InvertedIndex.bm25TopK(spark, inc, Seq("spark", "merge"), k = 5).collect().toSeq
    val b = InvertedIndex.bm25TopK(spark, dir, Seq("spark", "merge"), k = 5).collect().toSeq
    assert(a === b)
  }

  test("bm25 excludes tombstoned docs; compaction refreshes the corpus stats") {
    val d2 = java.nio.file.Files.createTempDirectory("inv-bm-del").toString + "/idx"
    InvertedIndex.build(docs, col("doc_id"), col("text"), nBuckets = 4, dir = d2)
    InvertedIndex.delete(spark, d2, Seq(2L))
    val served = InvertedIndex.bm25TopK(spark, d2, Seq("spark"), k = 5)
      .collect().map(_.getLong(0))
    assert(!served.contains(2L) && served.nonEmpty)
    // stats still count the tombstoned doc (documented staleness) ...
    assert(InvertedIndex.readMeta(d2).nDocs === 5L)
    // ... until compaction recomputes them over the survivors
    val cmp = java.nio.file.Files.createTempDirectory("inv-bm-cmp").toString + "/idx"
    InvertedIndex.compact(spark, d2, cmp)
    assert(InvertedIndex.readMeta(cmp).nDocs === 4L)
    val rebuilt = java.nio.file.Files.createTempDirectory("inv-bm-reb").toString + "/idx"
    InvertedIndex.build(docs.filter($"doc_id" =!= 2L), col("doc_id"), col("text"),
      nBuckets = 4, dir = rebuilt)
    assert(InvertedIndex.bm25TopK(spark, cmp, Seq("spark", "merge"), 5).collect().toSeq ===
      InvertedIndex.bm25TopK(spark, rebuilt, Seq("spark", "merge"), 5).collect().toSeq)
  }

  test("empty term list and non-positive bucket counts are refused") {
    intercept[IllegalArgumentException] { InvertedIndex.lookupAll(spark, dir, Nil) }
    intercept[IllegalArgumentException] {
      InvertedIndex.build(docs, col("doc_id"), col("text"), nBuckets = 0, dir = "/tmp/x")
    }
  }

  test("non-integral doc ids are refused at build time; int ids widen to BIGINT") {
    // string ids would work until delete()/append()'s Long-keyed
    // tombstone handling — refuse up front with a readable message
    val strIds = Seq(("a", "spark merge")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.build(strIds, col("doc_id"), col("text"), nBuckets = 2,
        dir = java.nio.file.Files.createTempDirectory("inv-str").toString + "/idx")
    }
    assert(e.getMessage.contains("integral"))
    // int ids are fine — widened so the stored index always carries
    // BIGINT and delete(Seq[Long]) round-trips
    val intIds = Seq((1, "spark merge"), (2, "merge only")).toDF("doc_id", "text")
    val d2 = java.nio.file.Files.createTempDirectory("inv-int").toString + "/idx"
    InvertedIndex.build(intIds, col("doc_id"), col("text"), nBuckets = 2, dir = d2)
    assert(InvertedIndex.lookupAll(spark, d2, Seq("merge"))
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    InvertedIndex.delete(spark, d2, Seq(1L))
    assert(InvertedIndex.lookupAll(spark, d2, Seq("merge"))
      .collect().map(_.getLong(0)).toSet === Set(2L))
  }
}
