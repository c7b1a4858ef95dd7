package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The corpus-derived ANN parameter curves, spec-pinned (the
  * KMeans.deriveK discipline): exact values at the committed data
  * scales, the clamps, and the scan-fraction decay that makes the
  * √n budget the right shape for 100 TB.
  */
class AnnParamsSpec extends AnyFunSuite {

  test("candidateBudget: min(n, max(3k, ceil(6*sqrt(n*k)))) — pinned points") {
    assert(AnnParams.candidateBudget(500, 10) === 425L)   // sf0.01 embeddings
    assert(AnnParams.candidateBudget(2000, 10) === 849L)  // sf0.1 embeddings
    assert(AnnParams.candidateBudget(1000000000L, 10) === 600000L)
    // tiny corpora clamp to n (served exactly), floor 3k in between
    assert(AnnParams.candidateBudget(20, 10) === 20L)
    assert(AnnParams.candidateBudget(31, 1) === 31L)
    assert(AnnParams.candidateBudget(40, 1) === 38L)
  }

  test("candidateBudget: scan FRACTION decays while recall-carrying count grows") {
    val fracs = Seq(500L, 5000L, 50000L, 5000000L, 500000000L)
      .map(n => AnnParams.candidateBudget(n, 10).toDouble / n)
    assert(fracs.zip(fracs.tail).forall { case (a, b) => b < a },
      s"scan fraction must shrink monotonically at 10x steps: $fracs")
    assert(fracs.last < 0.001, s"at 5e8 rows the exact-rank share must be <0.1%: ${fracs.last}")
  }

  test("nBits: ~32 rows/bucket, clamped to [4, 16]") {
    assert(AnnParams.nBits(500) === 4)
    assert(AnnParams.nBits(2000) === 6)
    assert(AnnParams.nBits(512) === 4)
    assert(AnnParams.nBits(513) === 5)
    assert(AnnParams.nBits(1) === 4)
    assert(AnnParams.nBits(1L << 40) === 16)
  }

  test("pqCodes: nearest power of two >= sqrt(n), clamped to [16, 256]; pqM fixes 4-dim subspaces") {
    assert(AnnParams.pqCodes(500) === 32)
    assert(AnnParams.pqCodes(2000) === 64)
    assert(AnnParams.pqCodes(100) === 16)
    assert(AnnParams.pqCodes(10000000) === 256)
    assert(AnnParams.pqM(64) === 16)
    assert(AnnParams.pqM(4) === 1)
  }

  test("nProbe: covers the candidate budget, clamped to [1, nLists]") {
    assert(AnnParams.nProbe(15, 500, 10) === 13)   // sf0.01: 425/500 of 15 lists
    assert(AnnParams.nProbe(1000, 1000000000L, 10) === 1)
    assert(AnnParams.nProbe(4, 1000000L, 10) === 1)
    assert(AnnParams.nProbe(7, 10, 10) === 7)      // budget == n: all lists
  }

  test("budgetSql is the IEEE twin of candidateBudget (DuckDB-evaluated in the oracle gate)") {
    // the Scala side of the twin claim: the formula's double arithmetic
    // (6.0 * sqrt(n*k), then ceil) is exactly what budgetSql spells;
    // both engines use IEEE-754 correctly-rounded sqrt, so equal inputs
    // give equal budgets. Pin the string so a drive-by edit can't
    // de-synchronize the two sides silently.
    assert(AnnParams.budgetSql(10) ===
      "least(greatest(30, ceil(6*sqrt(count(*) * 10))), count(*))")
  }
}
