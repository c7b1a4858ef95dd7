package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSupport

class BloomPruneSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private lazy val fact = (1L to 1000L).map(i => (i, i % 97, s"p$i"))
    .toDF("row_id", "k", "payload")
  private lazy val dim = Seq((3L, "a"), (11L, "b"), (42L, "c"))
    .toDF("dk", "attr")

  test("bloom-pruned join is row-identical to the plain join") {
    val plain = fact.join(dim, $"k" === $"dk")
      .select($"row_id", $"attr").orderBy($"row_id").collect().toSeq
    val pruned = BloomPrune.bloomJoin(fact, "k", dim, "dk", expectedNumItems = 10L)
      .select($"row_id", $"attr").orderBy($"row_id").collect().toSeq
    assert(pruned === plain)
    assert(plain.nonEmpty) // fixture sanity: the join must actually match
  }

  test("pruning shrinks the probe side (no false negatives, few false positives)") {
    val bloom = BloomPrune.keyBloom(dim, "dk", expectedNumItems = 10L, fpp = 0.001)
    val survivors = BloomPrune.prune(fact, $"k", bloom)
    val matching = fact.join(dim, $"k" === $"dk").count()
    val n = survivors.count()
    // every real match survives; at fpp=0.001 over 97 distinct keys the
    // expected false-positive count is << the 94 non-member keys
    assert(n >= matching)
    assert(n < fact.count() / 2, s"prune kept $n of ${fact.count()} rows")
    // and the survivors contain every matching row exactly
    val matchIds = fact.join(dim, $"k" === $"dk").select($"row_id")
      .as[Long].collect().toSet
    val survivorIds = survivors.select($"row_id").as[Long].collect().toSet
    assert(matchIds.subsetOf(survivorIds))
  }

  test("NULL probe keys drop, matching inner-join semantics") {
    val withNull = fact.union(Seq((9999L, Option.empty[Long], "n"))
      .toDF("row_id", "k", "payload"))
    val bloom = BloomPrune.keyBloom(dim, "dk", 10L)
    val ids = BloomPrune.prune(withNull, $"k", bloom)
      .select($"row_id").as[Long].collect().toSet
    assert(!ids.contains(9999L))
  }

  test("verified anti-join == plain anti-join at any fpp; NULL keys survive") {
    val rows = ((1 to 500).map(i => Some(s"k$i")) :+ Option.empty[String])
      .toDF("key")
    val block = (1 to 500 by 3).map(i => s"k$i").toDF("bk")
    val plain = rows.join(block, $"key" === $"bk", "left_anti")
      .select($"key").collect().map(r => Option(r.getString(0))).toSet
    // fpp deliberately TERRIBLE (saturated tiny filter): exactness must
    // not depend on the bloom being selective
    for (fpp <- Seq(0.0001, 0.5)) {
      val bloom = BloomPrune.keyBloomString(block, "bk", 10L, fpp)
      val got = BloomPrune.verifiedAntiJoinString(rows, "key", block, "bk", bloom)
        .select($"key").collect().map(r => Option(r.getString(0))).toSet
      assert(got === plain, s"fpp=$fpp diverged")
    }
    assert(plain.contains(None), "NULL key must survive the anti-join")
  }

  test("string bloom probe hashes like the distributed build (UTF-8 bytes)") {
    val block = Seq("plain", "uñïcodé-ключ", "", "a b\tc").toDF("bk")
    val bloom = BloomPrune.keyBloomString(block, "bk", 10L, 0.001)
    val probed = block.select($"bk",
      graft.expressions.BloomOps.bloomMightContainString($"bk", bloom).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probed.foreach { case (k, hit) => assert(hit, s"inserted key '$k' missed") }
  }

  test("underestimated expectedNumItems degrades fpp, never correctness") {
    val bigDim = (1L to 5000L by 7).toDF("dk")
    val bloom = BloomPrune.keyBloom(bigDim, "dk", expectedNumItems = 10L)
    val members = bigDim.as[Long].collect()
    // saturated filter: still zero false negatives
    members.foreach(k => assert(bloom.mightContainLong(k)))
  }
}
