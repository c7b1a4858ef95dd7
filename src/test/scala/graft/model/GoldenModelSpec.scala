package graft.model

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSupport
import graft.streaming.GStream

/** Golden-snapshot regression for the full GNG semantics, mirroring the
  * reference's committed DS1-200 goldens (SURVEY §5): a deterministic
  * 92×200 2-D stream trained with reference defaults must reproduce the
  * committed model — 56 nodes (the reference's DS1-200 run also ends at
  * 56), same graph, centroids/weights within float tolerance (combine
  * order varies ulps run-to-run, §7.4.2). Any change to the update
  * rule, cadences, growth, fading, or aggregation shows up here. */
class GoldenModelSpec extends AnyFunSuite with SparkTestSupport {

  test("deterministic DS1-like run reproduces the committed golden model") {
    import spark.implicits._
    val pts = spark.range(92 * 200).map { i =>
      val c = if (i % 2 == 0) (120.0, 200.0) else (240.0, 430.0)
      Point(Array(c._1 + 15 * math.sin(i * 0.37), c._2 + 15 * math.cos(i * 0.73)),
        (i % 2).toInt, i)
    }
    val m = GStream.fitChunked(pts, GngParams(), nChunks = 92)

    val lines = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_gng_ds1.txt")).getLines().toSeq
    val goldenNodes = lines.find(_.startsWith("nodes=")).get.drop(6).toInt
    assert(m.nodeCount === goldenNodes)

    val goldenCents = lines.filter(_.startsWith("c")).map { l =>
      val Array(x, y, w) = l.split("=")(1).split(",").map(_.toDouble)
      (x, y, w)
    }
    m.nodes.zipWithIndex.foreach { case (p, i) =>
      val (gx, gy, gw) = goldenCents(i)
      assert(math.abs(p.centroid(0) - gx) < 1e-4, s"node $i x")
      assert(math.abs(p.centroid(1) - gy) < 1e-4, s"node $i y")
      assert(math.abs(m.clusterWeights(i) - gw) < 1e-4, s"node $i weight")
    }

    val goldenEdges = lines.filter(_.startsWith("e=")).map { l =>
      val Array(a, b, age) = l.drop(2).split(",")
      (a.toInt, b.toInt, age.toDouble)
    }
    val edges = m.edgeList
    assert(edges.map(e => (e._1, e._2)) === goldenEdges.map(e => (e._1, e._2)))
    edges.zip(goldenEdges).foreach { case ((_, _, age), (_, _, gAge)) =>
      assert(math.abs(age - gAge) < 1e-3)
    }
  }
}
