package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** CDC apply: netting, all three arms, feed-degradation cases, the
  * malformed-op refusal, and the batch-composition law s14 rides on. */
class CdcSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private lazy val snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "attr", "v")

  private def state(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Double)] =
    df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("carry / update / delete / insert arms, one pass") {
    val changes = Seq(
      (2L, "b2", 21.0, "U", 1L),
      (3L, "c", 30.0, "D", 2L),
      (5L, "e", 50.0, "I", 3L))
      .toDF("k", "attr", "v", "op", "seq")
    val out = state(Cdc.applyChanges(snap, changes, "k"))
    assert(out === Map(
      1L -> ("a", 10.0), // untouched
      2L -> ("b2", 21.0), // updated
      4L -> ("d", 40.0), // untouched
      5L -> ("e", 50.0))) // inserted; 3 deleted
  }

  test("netting: only each key's latest change applies") {
    val changes = Seq(
      (2L, "x1", 1.0, "U", 10L),
      (2L, "x2", 2.0, "U", 30L), // latest for key 2 → wins
      (2L, "x3", 3.0, "U", 20L),
      (3L, "c2", 31.0, "U", 11L),
      (3L, "c2", 31.0, "D", 12L)) // latest for key 3 → delete wins
      .toDF("k", "attr", "v", "op", "seq")
    val out = state(Cdc.applyChanges(snap, changes, "k"))
    assert(out(2L) === ("x2", 2.0))
    assert(!out.contains(3L))
  }

  test("feed degradation: I on an existing key and U on a missing key both upsert; D on a missing key is a no-op") {
    val changes = Seq(
      (1L, "a2", 11.0, "I", 1L), // I but key exists → replaces
      (9L, "z", 90.0, "U", 2L), // U but key missing → inserts
      (8L, "q", 0.0, "D", 3L)) // D on missing key → nothing
      .toDF("k", "attr", "v", "op", "seq")
    val out = state(Cdc.applyChanges(snap, changes, "k"))
    assert(out(1L) === ("a2", 11.0))
    assert(out(9L) === ("z", 90.0))
    assert(!out.contains(8L) && out.size === 5)
  }

  test("composition: folding seq-contiguous batches equals one big apply") {
    val log = Seq(
      (1L, "a1", 1.0, "U", 1L), (2L, "b1", 2.0, "U", 2L),
      (1L, "a2", 3.0, "D", 3L), (5L, "e", 5.0, "I", 4L),
      (1L, "a3", 6.0, "I", 5L), (5L, "e2", 7.0, "U", 6L),
      (2L, "b2", 8.0, "D", 7L))
      .toDF("k", "attr", "v", "op", "seq")
    val whole = state(Cdc.applyChanges(snap, log, "k"))
    for (cut1 <- Seq(2L, 3L, 5L); cut2 <- Seq(5L, 6L) if cut2 >= cut1) {
      val folded = Seq(
        log.filter($"seq" <= cut1),
        log.filter($"seq" > cut1 && $"seq" <= cut2),
        log.filter($"seq" > cut2))
        .foldLeft(snap)((st, batch) => Cdc.applyChanges(st, batch, "k"))
      assert(state(folded) === whole, s"cuts ($cut1, $cut2)")
    }
    // delete-then-reinsert nets to the reinsert; delete at the tail deletes
    assert(whole(1L) === ("a3", 6.0))
    assert(!whole.contains(2L))
    assert(whole(5L) === ("e2", 7.0))
  }

  test("randomized logs match an in-memory reference fold (seeded, 3 slicings)") {
    val rng = new scala.util.Random(29)
    val keys = (1L to 20L).toSeq
    val log = (1L to 120L).map { seq =>
      val k = keys(rng.nextInt(keys.size))
      val op = Seq("I", "U", "D")(rng.nextInt(3))
      (k, s"a$seq", rng.nextInt(1000).toDouble, op, seq)
    }
    // reference: replay the log row-by-row over a plain Map
    val ref = log.foldLeft(
      snap.collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap) {
      case (m, (k, attr, v, op, _)) =>
        if (op == "D") m - k else m.updated(k, (attr, v))
    }
    val logDf = log.toDF("k", "attr", "v", "op", "seq")
    assert(state(Cdc.applyChanges(snap, logDf, "k")) === ref)
    // and folding any seq-contiguous slicing leaves the same state
    for (cuts <- Seq(Seq(40L, 80L), Seq(1L, 119L), Seq(60L, 60L))) {
      val Seq(c1, c2) = cuts
      val folded = Seq(
        logDf.filter($"seq" <= c1),
        logDf.filter($"seq" > c1 && $"seq" <= c2),
        logDf.filter($"seq" > c2))
        .foldLeft(snap)((st, b) => if (b.isEmpty) st else Cdc.applyChanges(st, b, "k"))
      assert(state(folded) === ref, s"cuts $cuts")
    }
  }

  test("an op outside I/U/D fails the job loudly — including a NULL op") {
    val bad = Seq((2L, "b", 1.0, "X", 1L)).toDF("k", "attr", "v", "op", "seq")
    val e = intercept[Exception] {
      Cdc.applyChanges(snap, bad, "k").collect()
    }
    assert(e.getMessage.contains("unknown op") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown op")))
    val nul = Seq((2L, "b", 1.0, null.asInstanceOf[String], 1L))
      .toDF("k", "attr", "v", "op", "seq")
    val e2 = intercept[Exception] {
      Cdc.applyChanges(snap, nul, "k").collect()
    }
    val msg = e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("unknown op 'NULL'"), s"NULL op must keep a readable message: $msg")
  }

  test("a bad op SUPERSEDED by a later seq for the same key still fails") {
    // netting would drop the seq=1 row before any downstream filter
    // evaluated its op; the validated op rides the netting window's
    // sort order, so raise_error fires for every change row regardless
    val bad = Seq(
      (2L, "b1", 1.0, "X", 1L), // malformed, superseded…
      (2L, "b2", 2.0, "U", 2L)) // …by this valid later change
      .toDF("k", "attr", "v", "op", "seq")
    val e = intercept[Exception] {
      Cdc.applyChanges(snap, bad, "k").collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("unknown op"), s"superseded bad op must still fail: $msg")
  }

  test("broadcastTouched=false is row-identical (the huge-batch fallback)") {
    val changes = Seq(
      (2L, "b2", 21.0, "U", 1L), (3L, "c", 30.0, "D", 2L), (5L, "e", 50.0, "I", 3L))
      .toDF("k", "attr", "v", "op", "seq")
    assert(state(Cdc.applyChanges(snap, changes, "k", broadcastTouched = false))
      === state(Cdc.applyChanges(snap, changes, "k")))
  }

  test("schema contract: missing op/seq or key columns are refused up front") {
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(snap, snap, "k") // no op/seq
    }
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(snap.drop("k"),
        Seq((1L, "a", 1.0, "U", 1L)).toDF("k", "attr", "v", "op", "seq"), "k")
    }
  }

  test("snapshot payload stays out of the netting shuffle (anti join on bare keys)") {
    val changes = Seq((2L, "b2", 21.0, "U", 1L)).toDF("k", "attr", "v", "op", "seq")
    val plan = Cdc.applyChanges(snap, changes, "k")
      .queryExecution.optimizedPlan
    val anti = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType.sql == "LEFT ANTI" => j
    }
    assert(anti.nonEmpty, s"untouched rows must leave via LEFT ANTI:\n$plan")
    // the anti join's right side is the touched-key set — bare keys only
    assert(anti.head.right.output.map(_.name) === Seq("k"),
      "the key-set side must carry no payload")
  }
}
