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

  test("empty term list and non-positive bucket counts are refused") {
    intercept[IllegalArgumentException] { InvertedIndex.lookupAll(spark, dir, Nil) }
    intercept[IllegalArgumentException] {
      InvertedIndex.build(docs, col("doc_id"), col("text"), nBuckets = 0, dir = "/tmp/x")
    }
  }
}
