package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

class VectorFunctionsSpec extends AnyFunSuite with SparkTestSupport {

  private def eval2(a: Seq[Double], b: Seq[Double],
      f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b")).as("v")).head().get(0)
  }

  test("vecAdd / vecSub / vecScale / vecAxpy elementwise") {
    assert(eval2(Seq(1.0, 2.0), Seq(3.0, 4.0), VectorFunctions.vecAdd) === Seq(4.0, 6.0))
    assert(eval2(Seq(1.0, 2.0), Seq(3.0, 4.0), VectorFunctions.vecSub) === Seq(-2.0, -2.0))
    assert(eval2(Seq(1.0, 2.0), Seq(3.0, 4.0),
      (a, b) => VectorFunctions.vecAxpy(lit(2.0), a, b)) === Seq(5.0, 8.0))
  }

  test("dot, norm2, squaredDistance, euclideanDistance") {
    assert(eval2(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), VectorFunctions.dot) === 32.0)
    assert(eval2(Seq(3.0, 4.0), Seq(0.0, 0.0), VectorFunctions.squaredDistance) === 25.0)
    assert(eval2(Seq(3.0, 4.0), Seq(0.0, 0.0), VectorFunctions.euclideanDistance) === 5.0)
  }

  test("cosineSimilarity: 1 for parallel, 0 for orthogonal, -1 for antipodal") {
    assert(math.abs(eval2(Seq(2.0, 0.0), Seq(5.0, 0.0), VectorFunctions.cosineSimilarity)
      .asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(eval2(Seq(1.0, 0.0), Seq(0.0, 1.0), VectorFunctions.cosineSimilarity)
      .asInstanceOf[Double]) < 1e-12)
    assert(math.abs(eval2(Seq(1.0, 0.0), Seq(-1.0, 0.0), VectorFunctions.cosineSimilarity)
      .asInstanceOf[Double] + 1.0) < 1e-12)
  }

  test("quasiEqual within epsilon") {
    assert(eval2(Seq(1.0, 2.0), Seq(1.0 + 1e-12, 2.0),
      (a, b) => VectorFunctions.quasiEqual(a, b, 1e-10)) === true)
    assert(eval2(Seq(1.0, 2.0), Seq(1.1, 2.0),
      (a, b) => VectorFunctions.quasiEqual(a, b, 1e-10)) === false)
  }

  test("kNeighborSom matches exp(-d²/T)") {
    val v = eval2(Seq(1.0, 0.0), Seq(0.0, 0.0),
      (a, b) => VectorFunctions.kNeighborSom(a, b, lit(0.3))).asInstanceOf[Double]
    assert(math.abs(v - math.exp(-1.0 / 0.3)) < 1e-12)
  }
}
