package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

class SkewSpec extends AnyFunSuite with SparkTestSupport {

  test("saltedCountSum equals direct groupBy on skewed data") {
    import spark.implicits._
    // key 1 holds 90% of rows (the hot key)
    val rows = (1 to 900).map(i => (1L, i * 0.5)) ++ (1 to 100).map(i => (i % 7 + 2L, 1.0))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedCountSum(df, col("k"), col("v"), saltBuckets = 4)
      .collect().map(r => r.getAs[Long]("key") ->
        (r.getAs[Long]("n"), math.round(r.getAs[Double]("total") * 100) / 100.0)).toMap
    val direct = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n"), math.round(r.getAs[Double]("total") * 100) / 100.0)).toMap
    assert(salted === direct)
  }

  test("salting actually spreads a hot key over multiple partial groups") {
    import spark.implicits._
    val df = (1 to 1000).map(_ => (42L, 1.0)).toDF("k", "v").repartition(8)
    val partials = df.select(col("k"), col("v"),
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(4)).as("salt"))
      .groupBy(col("k"), col("salt")).count()
    assert(partials.count() > 1) // the hot key split across salt buckets
  }

  test("saltedJoin equals the plain join; each hot key spreads across salt partitions") {
    import spark.implicits._
    // one EXTREMELY hot key (90%), two cool ones; ids give the salt
    val rows = (1 to 900).map(i => (i.toLong, "hot", i * 0.25)) ++
      Seq((901L, "cool_a", 1.0), (902L, "cool_b", 2.0), (903L, "cool_a", 3.0))
    val large = rows.toDF("id", "k", "v").repartition(8)
    val dim = Seq(("hot", 10.0), ("cool_a", 20.0), ("cool_b", 30.0), ("unused", 0.0))
      .toDF("dk", "w")
    val salted = Skew.saltedJoin(large, col("k"), col("id"), dim, col("dk"), buckets = 4)
    val got = salted.select(col("id"), col("k"), col("w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted.toSeq
    val plain = large.join(dim, col("k") === col("dk"))
      .select(col("id"), col("k"), col("w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted.toSeq
    assert(got === plain)
    assert(got.count(_._2 == "hot") === 900) // no rows lost or duplicated
    // the hot key's rows really occupy every salt bucket
    val spread = large.filter(col("k") === "hot")
      .select(pmod(col("id"), lit(4)).cast("int").as("salt"))
      .distinct().count()
    assert(spread === 4)
    // and the physical join partitions on (key, salt), never key alone
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__graft_salt"), s"salt must reach the join keys:\n$p")
    // a NULL saltSource must still join (bucket 0), preserving
    // row-identity with the plain join
    // Seq compare, not Set: a regression that DUPLICATES the row (e.g.
    // the null landing in several buckets) must fail, not dedup away
    val withNull = Seq((Some(1L), "hot"), (None: Option[Long], "cool_a"))
      .toDF("id", "k")
    val nulled = Skew.saltedJoin(withNull, col("k"), col("id"), dim, col("dk"), 4)
      .select(col("k"), col("w")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
    assert(nulled === Seq(("cool_a", 20.0), ("hot", 10.0)))
    // an input already carrying the internal salt column is refused
    // loudly — silently overwriting it on the probe side and dropping
    // it by name from BOTH sides would lose a caller's column
    val clash = large.withColumn("__graft_salt", lit(9))
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(clash, col("k"), col("id"), dim, col("dk"), 4)
    }
    assert(e.getMessage.contains("__graft_salt"))
  }

  // ---------------------------------------------------------------------
  // Adversarial skew for the banded LSH self-joins: a boilerplate-heavy
  // corpus (30% exact copies of ONE document) used to put m identical
  // rows in the same bucket of every band — m²·nBands candidate rows.
  // The exact-dup pre-collapse (Collapse.scala) must (a) keep every
  // intermediate bounded by DISTINCT inputs and (b) produce output
  // row-identical to the uncollapsed pipeline, asserted here against
  // inline uncollapsed twins.
  // ---------------------------------------------------------------------

  private val nDocs = 500
  private val nDups = 150 // 30% boilerplate copies (ids with last digit 0/1/2)

  private def skewedDocs = {
    import spark.implicits._
    val boiler = "subscribe to our newsletter accept all cookies terms of service apply"
    (0 until nDocs).map { i =>
      val text =
        if (i % 10 < 3) boiler
        else if (i % 7 == 0) s"the quick brown fox jumps over the lazy dog number $i and again $i"
        else s"document $i carries unique content body ${i * 31} with trailing words ${i * 17}"
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  private def skewedEmbs = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val hot = Array.fill(8)(rng.nextDouble() * 2 - 1)
    (0 until nDocs).map { i =>
      val v = if (i % 10 < 3) hot
              else Array.fill(8)(rng.nextDouble() * 2 - 1)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSet

  test("collapse: the boilerplate group folds to one representative") {
    val (members, reps) = Collapse.collapse(
      skewedDocs, graft.functions.TextFunctions.fingerprint(col("text")),
      col("doc_id"), col("text"))
    assert(reps.count() === (nDocs - nDups + 1).toLong)
    val hotRep = members.filter(col("id") === 140L).select("rep").head().getLong(0)
    assert(hotRep === 0L) // min id of the duplicated group
    assert(members.count() === nDocs.toLong)
  }

  test("minHashPairsVerified on skewed corpus == uncollapsed twin") {
    val docs = skewedDocs
    val got = collectPairs(Dedup.minHashPairsVerified(docs, col("text"), col("doc_id")))
    // the uncollapsed reference pipeline (the pre-round-7 shape)
    val cand = Dedup.minHashCandidatePairs(docs, col("text"), col("doc_id"),
      n = 3, k = 32, rowsPerBand = 2)
    val texts = docs.select(col("doc_id").as("id"), col("text"))
    val want = collectPairs(cand
      .join(texts.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(texts.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
      .withColumn("jaccard", round(Dedup.ngramJaccard(col("text_a"), col("text_b"), 3), 4))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard")))
    assert(got === want)
    // the full boilerplate clique is present: 150 choose 2 intra pairs
    assert(got.count(p => p._1 % 10 < 3 && p._2 % 10 < 3 && p._3 == "1.0")
      >= nDups * (nDups - 1) / 2)
  }

  test("minHashPairs (estimate) on skewed corpus == uncollapsed twin") {
    val docs = skewedDocs
    val got = collectPairs(Dedup.minHashPairs(docs, col("text"), col("doc_id")))
    val sigs = Dedup.minHashSignatures(docs, col("text"), col("doc_id"))
    val cand = Dedup.minHashCandidatePairs(docs, col("text"), col("doc_id"))
    val want = collectPairs(cand
      .join(sigs.select(col("id").as("id_a"), col("minhash").as("mh_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("minhash").as("mh_b")), "id_b")
      .withColumn("est_jaccard",
        round(graft.expressions.TextHash.sigAgreement(col("mh_a"), col("mh_b")), 4))
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("est_jaccard")))
    assert(got === want)
  }

  test("simHashPairs on skewed corpus == uncollapsed twin") {
    val docs = skewedDocs
    val got = collectPairs(Dedup.simHashPairs(docs, col("text"), col("doc_id")))
    val sigs = Dedup.simHashSignatures(docs, col("text"), col("doc_id"))
    val banded = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map { b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))
      }: _*)).as(Seq("band", "chunk")))
    val a = banded.as("a")
    val b = banded.as("b")
    val want = collectPairs(a.join(b,
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= 3)
      .select(col("id_a"), col("id_b"), col("hamming")))
    assert(got === want)
  }

  test("cosineNearDupPairs on skewed embeddings == uncollapsed twin (incl. centered)") {
    import graft.functions.VectorFunctions._
    val embs = skewedEmbs
    for (centered <- Seq(false, true)) {
      val got = collectPairs(Similarity.cosineNearDupPairs(
        embs, col("embedding"), col("vec_id"),
        threshold = 0.3, nBits = 3, nBands = 2, dim = 8, centered = centered))
      // uncollapsed twin: band ALL rows, bucket self-join, verify each pair
      val planes = Similarity.hyperplanes(6, 8)
      val offsets =
        if (!centered) Array.emptyDoubleArray
        else {
          val m = Similarity.meanVector(embs, col("embedding"), 8)
          planes.map(p => p.zip(m).map { case (x, y) => x * y }.sum)
        }
      val banded = embs.select(col("vec_id").as("id"),
        posexplode(graft.expressions.VectorOps.lshBandSignatures(
          asDouble(col("embedding")), planes, offsets, 3)).as(Seq("band", "sig")))
      val a = banded.as("a")
      val b = banded.as("b")
      val cand = a.join(b,
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      val e = embs.select(col("vec_id").as("id"), asDouble(col("embedding")).as("emb"))
      val want = collectPairs(cand
        .join(e.select(col("id").as("id_a"), col("emb").as("emb_a")), "id_a")
        .join(e.select(col("id").as("id_b"), col("emb").as("emb_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          round(cosineSimilarity(col("emb_a"), col("emb_b")), 4).as("cosine"))
        .filter(col("cosine") >= 0.3))
      assert(got === want, s"centered=$centered")
      // the 150-copy clique is fully present at cosine 1.0
      assert(got.count(p => p._1 % 10 < 3 && p._2 % 10 < 3 && p._3 == "1.0")
        >= nDups * (nDups - 1) / 2, s"centered=$centered")
    }
  }

  test("lshKnnBatch under query-side skew: identical hot queries all answer in full") {
    // the batch serving shape's skew case is on the QUERY side: many
    // queries sharing one signature concentrate the probe join on one
    // bucket. The per-query WindowGroupLimit bounds each query's
    // candidates map-side, so the plan stays safe; semantically every
    // clone must get the complete identical top-k.
    val embs = skewedEmbs
    val index = Similarity.lshBuckets(embs, col("embedding"), col("vec_id"),
      nBits = 3, dim = 8)
    // 30 clones of the hot vector (ids 0,10,20,... are all `hot`)
    val hotIds = (0 until 300 by 10).map(_.toLong)
    val queries = embs.filter(col("vec_id").isin(hotIds: _*))
    val rows = Similarity.lshKnnBatch(index, queries, col("embedding"),
        col("vec_id"), dim = 8, k = 5, nBits = 3)
      .collect()
      .map(r => (r.getAs[Long]("qid"), (r.getAs[Long]("id"), r.getAs[Double]("score"), r.getAs[Int]("rk"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._3).toSeq).toMap
    assert(rows.keySet === hotIds.toSet)
    assert(rows.values.forall(_.size == 5), "every clone gets its full k")
    // identical queries → identical answers
    assert(rows.values.toSet.size === 1)
  }

  test("knnJoin on skewed embeddings == uncollapsed twin") {
    import graft.functions.VectorFunctions._
    val embs = skewedEmbs
    val k = 5
    val got = Similarity.knnJoin(embs, col("embedding"), col("vec_id"),
        k = k, nBits = 3, nBands = 2, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val planes = Similarity.hyperplanes(6, 8)
    val banded = embs.select(col("vec_id").as("id"),
      posexplode(graft.expressions.VectorOps.lshBandSignatures(
        asDouble(col("embedding")), planes, Array.emptyDoubleArray, 3)).as(Seq("band", "sig")))
    val a = banded.as("a")
    val b = banded.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("nbr"))
      .distinct()
    val e = embs.select(col("vec_id").as("id"), asDouble(col("embedding")).as("emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("nbr"))
    val want = cand
      .join(e.select(col("id"), col("emb").as("emb_a")), "id")
      .join(e.select(col("id").as("nbr"), col("emb").as("emb_b")), "nbr")
      .select(col("id"), col("nbr"),
        round(cosineSimilarity(col("emb_a"), col("emb_b")), 4).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got === want)
    // every boilerplate member's top-5 is five co-members at score 1.0,
    // tie-broken to the smallest neighbor ids
    val hotTop = got.filter(_._1 == 140L)
    assert(hotTop.map(_._2) === Set(0L, 1L, 2L, 10L, 11L))
    assert(hotTop.forall(_._3 == 1.0))
  }
}
