package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.VectorFunctions._
import graft.operators.{Pq, Similarity}
import graft.queries.Tables

/** Scratch parameter-tuning harness for the ANN ladder (round 14, not
  * part of the build). Measures recall@10 for candidate corpus-derived
  * parameter curves at sf0.01 and sf0.1.
  */
object AnnTune {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .appName("ann-tune").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, sf).cache()
      val n = emb.count()
      println(s"=== $sf n=$n ===")
      val vecs = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val qids = Seq(0L, 17L, 42L, 101L, 222L)

      def exactTop(q: Array[Double], k: Int): Set[Long] = {
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
          d / math.sqrt(na * nb)
        }
        vecs.toSeq.map { case (id, v) => (math.round(cos(v, q) * 10000) / 10000.0, id) }
          .sortBy { case (s, id) => (-s, id) }.take(k).map(_._2).toSet
      }

      // ---- LSH: budget curves x nBits -----------------------------------
      for (nBits <- Seq(4, 6, 8); coef <- Seq(4.0, 6.0, 8.0)) {
        val planes = Similarity.hyperplanes(nBits, 64)
        def sig(v: Array[Double]): Long =
          planes.zipWithIndex.map { case (p, i) =>
            val d = p.zip(v).map { case (a, b) => a * b }.sum
            if (d >= 0) 1L << i else 0L
          }.foldLeft(0L)(_ | _)
        val sigs = vecs.map { case (id, v) => id -> sig(v) }
        val k = 10
        val budget = math.min(n, math.max(3L * k,
          math.ceil(coef * math.sqrt(n.toDouble * k)).toLong))
        val recalls = qids.map { qid =>
          val q = vecs(qid); val qs = sigs(qid)
          val byR = sigs.values.groupBy(s => java.lang.Long.bitCount(s ^ qs)).view.mapValues(_.size).toMap
          val cum = (0 to nBits).scanLeft(0L)((c, r) => c + byR.getOrElse(r, 0)).tail
          val radius = cum.indexWhere(_ >= budget) match { case -1 => nBits; case r => r }
          val cand = sigs.collect { case (id, s) if java.lang.Long.bitCount(s ^ qs) <= radius => id }.toSet
          val truth = exactTop(q, k)
          ((truth & cand).size.toDouble / k, cand.size)
        }
        val avgR = recalls.map(_._1).sum / recalls.size
        val avgC = recalls.map(_._2).sum / recalls.size
        println(f"LSH nBits=$nBits coef=$coef budget=$budget avgCand=$avgC scanFrac=${avgC.toDouble/n}%.3f recall(q0)=${recalls.head._1}%.2f avgRecall=$avgR%.3f")
      }

      // ---- PQ: (m, codes) grid -----------------------------------------
      for ((m, codes) <- Seq((8, 16), (8, 64), (16, 16), (16, 32), (16, 64), (16, 128), (32, 16))) {
        val cb = Pq.train(emb, col("embedding"), col("vec_id"), m = m, k = codes)
        val sub = 64 / m
        def encode(v: Array[Double]): Array[Int] = Array.tabulate(m) { j =>
          var best = -1; var bd = Double.PositiveInfinity
          for (c <- cb(j).indices) {
            var d = 0.0
            for (t <- 0 until sub) { val x = v(j * sub + t) - cb(j)(c)(t); d += x * x }
            if (d < bd) { bd = d; best = c }
          }
          best
        }
        val codesMap = vecs.map { case (id, v) => id -> encode(v) }
        val recalls = qids.map { qid =>
          val q = vecs(qid)
          // ADC LUT
          val lut = Array.tabulate(m, codes) { (j, c) =>
            var d = 0.0
            for (t <- 0 until sub) { val x = q(j * sub + t) - cb(j)(c)(t); d += x * x }
            d
          }
          val ranked = codesMap.toSeq.map { case (id, cs) =>
            var d = 0.0; for (j <- 0 until m) d += lut(j)(cs(j))
            (math.round(d * 10000) / 10000.0, id)
          }.sortBy { case (d, id) => (d, id) }.take(10).map(_._2).toSet
          (exactTop(q, 10) & ranked).size.toDouble / 10
        }
        println(f"PQ m=$m codes=$codes bits=${m * (32 - Integer.numberOfLeadingZeros(codes - 1))} recall(q0)=${recalls.head}%.2f avgRecall=${recalls.sum / recalls.size}%.3f")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
