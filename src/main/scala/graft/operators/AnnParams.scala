package graft.operators

/** Corpus-derived ANN serving parameters — the [[KMeans.deriveK]]
  * discipline applied to the retrieval surface's knobs (round-13
  * verdict item #1): every bucketing/compression parameter is a stated
  * CURVE of the corpus statistics (row count n, dimension), never a
  * hardcoded constant that silently stops fitting when the corpus is
  * 1000× larger or smaller.
  *
  * The design point is the scan/recall trade:
  *
  *  - [[candidateBudget]] — how many exact-ranked survivors a bucketing
  *    stage must deliver for a top-k query: `min(n, max(3k,
  *    ⌈6·√(n·k)⌉))`. The √n shape makes the exact-rank stage's cost
  *    grow as √n while its SHARE of the corpus vanishes (n=500 → 85%
  *    — a tiny corpus is served near-exactly, which is what a user
  *    wants there; n=10⁹ → 0.06% — the index is doing real work).
  *    Measured at the committed data (AnnTune, round 14): recall@10 of
  *    the multiprobe LSH rung = 0.90 at sf0.01 / 1.00 at sf0.1 for the
  *    published query, ≥ 0.92 averaged over 5 probe queries — vs 0.70
  *    / 0.64 with the old fixed 3k budget.
  *  - [[nBits]] — signature width: `clamp(⌈log₂(n/32)⌉, 4, 16)`,
  *    i.e. ~32 rows per bucket, so bucket partitions stay small enough
  *    to prune and the multiprobe radius has fine steps. 2^16 buckets
  *    at the cap keeps the occupancy table driver/broadcast-sized at
  *    any corpus size.
  *  - [[pqCodes]] — PQ codewords per subspace: the nearest power of
  *    two to √n clamped to [16, 256] (256 = one byte per code, the
  *    FAISS ceiling; the train sample is 4096 ≥ 16·codes at every
  *    clamp point). [[pqM]] fixes 4-dim subspaces: at dim 64 that is
  *    m=16 — 16 B/vector at the code cap, still 16× smaller than the
  *    raw floats.
  *  - [[nProbe]] — IVF lists probed: enough lists to cover the
  *    candidate budget, `clamp(⌈nLists·budget/n⌉, 1, nLists)`.
  *
  * Honest-ceiling note, measured on the committed corpus (random i.i.d.
  * unit vectors — the HARDEST case for compressed ranking, since the
  * true top-10 sit in a sliver of cosine margin): pure-ADC ranking
  * (the pq/ivfpq rungs) tops out near recall@10 ≈ 0.6 at ANY codebook
  * size we can train (measured 0.22 → 0.58 moving (m=8,16 codes) →
  * (m=16,32 codes); 128 codes buys ≈ 0.06 more). That is why the
  * serving recommendation the v36 ladder encodes is the REFINED rung
  * (ADC shortlist → exact rerank, v18's shape, recall ≈ 1.0) — the
  * raw ADC rungs exist as the memory-bound fallback and their measured
  * recall is published per rung. RecallSpec pins all the floors.
  */
object AnnParams {

  /** Exact-ranked candidate budget for a top-k query over n rows:
    * `min(n, max(3k, ⌈6·√(n·k)⌉))`. */
  def candidateBudget(n: Long, k: Int): Long =
    math.min(n, math.max(3L * k,
      math.ceil(6.0 * math.sqrt(n.toDouble * k.toDouble)).toLong))

  /** The DuckDB twin of [[candidateBudget]] with `count(*)` as n —
    * both engines evaluate IEEE sqrt/ceil on the same exact-integer
    * doubles, so the derived budget is bit-identical. Usable only in
    * an aggregate context over the (possibly predicate-filtered)
    * corpus CTE. */
  def budgetSql(k: Int): String =
    s"least(greatest(${3 * k}, ceil(6*sqrt(count(*) * $k))), count(*))"

  /** LSH signature width: ~32 rows/bucket, clamped to [4, 16] bits. */
  def nBits(n: Long): Int = {
    val raw = math.ceil(math.log(math.max(1L, n) / 32.0) / math.log(2.0)).toInt
    math.max(4, math.min(16, raw))
  }

  /** PQ subspace count: fixed 4-dim subspaces (dim must divide). */
  def pqM(dim: Int): Int = math.max(1, dim / 4)

  /** PQ codewords per subspace: 2^⌈log₂√n⌉ clamped to [16, 256]. */
  def pqCodes(n: Long): Int = {
    val target = math.sqrt(math.max(1L, n).toDouble)
    val raw = math.pow(2.0, math.ceil(math.log(target) / math.log(2.0))).toInt
    math.max(16, math.min(256, raw))
  }

  /** IVF lists probed: cover the candidate budget, assuming balanced
    * lists — `clamp(⌈nLists·budget/n⌉, 1, nLists)`. */
  def nProbe(nLists: Int, n: Long, k: Int): Int = {
    require(nLists > 0, "nProbe: no IVF lists")
    val budget = candidateBudget(n, k)
    val raw = math.ceil(nLists.toDouble * budget / math.max(1L, n)).toInt
    math.max(1, math.min(nLists, raw))
  }
}
