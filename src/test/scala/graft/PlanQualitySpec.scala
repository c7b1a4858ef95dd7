package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan regression gates: the properties that make these
  * queries scale are asserted, not just eyeballed — losing a pushdown,
  * a broadcast, or a take-ordered to a refactor fails the suite. */
class PlanQualitySpec extends AnyFunSuite with SparkTestSupport {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"))
    assert(p.contains("GreaterThanOrEqual(l_quantity,45.0)"))
    // pruned read schema — far fewer than lineitem's 16 columns
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(read.count(_ == ',') <= 5, s"expected <=5 commas (pruned): $read")
  }

  test("q05: all dimension joins broadcast; no sort-merge join") {
    val p = plan("q05_regional_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("v02: brute-force kNN is scan + TakeOrderedAndProject, no shuffle") {
    val p = plan("v02_knn_bruteforce")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange"), "top-k must not shuffle")
  }

  // formatted plans render every node twice (tree + detail section);
  // count detail headers "(n) NodeName" for exact node counts
  private def nodeCount(p: String, node: String): Int =
    s"""\\(\\d+\\) $node""".r.findAllIn(p).size

  test("a01: as-of join costs exactly one shuffle before the output sort") {
    val p = plan("a01_asof_signup")
    val exchanges = nodeCount(p, "Exchange")
    // one Exchange for the window (by key) + one for the final orderBy
    assert(exchanges <= 2, s"as-of join should shuffle once (+output sort), saw $exchanges:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,signup)]"))
  }

  test("a02/a03: forward and tolerance as-of keep a01's single-shuffle shape") {
    for (name <- Seq("a02_asof_next_signup", "a03_asof_signup_within")) {
      val p = plan(name)
      val exchanges = nodeCount(p, "Exchange")
      assert(exchanges <= 2, s"$name should shuffle once (+output sort), saw $exchanges:\n$p")
      assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,signup)]"),
        s"$name signup filter must reach the scan:\n$p")
    }
  }

  test("q01: aggregation is partial+final (two HashAggregates)") {
    val p = plan("q01_pricing_summary")
    assert(nodeCount(p, "HashAggregate") >= 2)
  }

  test("t02: native normalize keeps the text pipeline in one codegen stage") {
    val p = plan("t02_fingerprint")
    assert(p.contains("normalize_text") || p.contains("md5"))
    assert(!p.contains("BatchEvalPython"))
  }

  test("v06: IVF assignment is a codegen'd kernel, not a Scala UDF") {
    val p = plan("v06_knn_ivf")
    assert(!p.contains("ScalaUDF"), s"ivf assignment must not be a UDF:\n$p")
    assert(p.contains("nearest_centroid"))
  }

  test("t16: eval-set shingles broadcast; the corpus is never content-shuffled") {
    val p = plan("t16_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval shingles must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"))
    // exactly 3 shuffles: the EVAL side's distinct (tiny, keyed on sh),
    // the per-document re-aggregation (keyed on id), and the output
    // sort. A corpus-side shuffle keyed on shingle content (e.g. the
    // broadcast degrading to a shuffled join) would add a fourth.
    // (BroadcastExchange does not match the "Exchange" node pattern.)
    assert(nodeCount(p, "Exchange") == 3,
      s"expected eval-distinct + per-doc + sort shuffles only:\n$p")
    assert(p.contains("shingle_hashes"), "kernel expression must appear in the plan")
  }

  test("t17: lang_id evaluates once, below-md5-quota rows never reach the kernel") {
    val p = plan("t17_stratified_sample")
    // exactly one lang_id in the whole plan (r5 ran it twice per row:
    // once in the filter, once in the collapsed projection)
    val kernelCount = "lang_id".r.findAllIn(p).size
    assert(kernelCount == 1, s"expected exactly one lang_id, saw $kernelCount:\n$p")
    // the Generate barrier is present and the cheap md5-quota conjunct
    // filtered before it (a Filter mentioning md5 below the Generate)
    assert(p.contains("Generate"), s"expected the explode barrier:\n$p")
    assert(p.contains("md5"), s"md5 quota filter must survive:\n$p")
  }

  test("t19: training mix — kernels once, dims broadcast, never a content shuffle") {
    val p = plan("t19_training_mix")
    // each per-row kernel appears exactly once (the Generate barrier;
    // without it the collapsed filter+projection re-derived lang_id 3x
    // and quality_score 2x per corpus row)
    for (k <- Seq("quality_score", "repetition_stats", "ws_token_count"))
      assert(nodeFree(p, k) == 1, s"expected one $k in the plan:\n$p")
    assert(nodeFree(p, "lang_id") == 1, s"expected one lang_id:\n$p")
    // keeper + decontamination verdicts join broadcast; no sort-merge,
    // no cartesian anywhere in the mix
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("t80: data card — per-doc kernels consumed inside the one materialized pass, legs broadcast, no cartesian") {
    val p = plan("t80_source_data_card")
    // the narrow per-doc feature table is localCheckpoint-materialized
    // once; nothing downstream may re-derive a per-doc kernel
    for (k <- Seq("quality_score", "lang_id", "repetition_stats", "ws_token_count"))
      assert(nodeFree(p, k) == 0, s"per-doc kernel $k re-derived past the checkpoint:\n$p")
    // the ≤|sources|-row legs join broadcast; no cartesian anywhere
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast leg joins:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the card plan:\n$p")
  }

  test("m17/m18: sample-table walk is a row map; video near-dup joins on the fingerprint hash, never a loop") {
    // m17: build + mp4_samples walk + explode + sort — no join at all,
    // and exactly one exchange (the output sort)
    val p17 = plan("m17_video_frames")
    assert(!p17.contains("Join"), s"m17 grew a join:\n$p17")
    assert(p17.contains("mp4_samples"), s"kernel missing from m17 plan:\n$p17")
    // m18: one fingerprint aggregation per side, equi-JOIN on the
    // fingerprint (hash or sort-merge — both scale), never a nested
    // loop or cartesian
    val p18 = plan("m18_video_neardup")
    assert(p18.contains("BroadcastHashJoin") || p18.contains("SortMergeJoin"),
      s"m18 fingerprint join lost its hash strategy:\n$p18")
    assert(!p18.contains("BroadcastNestedLoopJoin") && !p18.contains("CartesianProduct"),
      s"m18 degenerated to a loop join:\n$p18")
  }

  // occurrences of an expression NAME in the detail section (each node
  // detail renders an expression once; the tree section has no exprs)
  private def nodeFree(p: String, expr: String): Int = {
    // formatted plans repeat expressions across Input/Output/Condition
    // lines; count distinct kernel CALLS via "expr(" in Project/Filter/
    // Generate "Output"/"Condition"/"Generator" lines only
    p.linesIterator
      .filter(l => l.trim.startsWith("Output") || l.trim.startsWith("Condition") ||
        l.trim.startsWith("Arguments") || l.trim.startsWith("Aggregate Attributes") ||
        l.trim.startsWith("Functions") || l.trim.startsWith("Keys"))
      .map(l => s"$expr\\(".r.findAllIn(l).size).sum
  }

  test("global sweep: no query plan contains a cartesian product or a UDF") {
    // streaming queries are excluded: building their DataFrame RUNS the
    // bounded stream (oneShot blocks), and their plans are execution
    // artifacts of the memory sink, not library-shaped plans. gng_*
    // build on the (cached) trained model — cheap at sf0.001.
    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("s0"))
    val offenders = names.flatMap { n =>
      val p = try plan(n) catch { case e: Throwable => s"BUILD FAILED: $e" }
      Seq(
        Option.when(p.contains("CartesianProduct"))(s"$n: CartesianProduct"),
        Option.when(p.contains("BatchEvalPython"))(s"$n: BatchEvalPython"),
        Option.when(p.contains("ScalaUDF"))(s"$n: ScalaUDF"),
        Option.when(p.startsWith("BUILD FAILED"))(s"$n: $p")).flatten
    }
    assert(offenders.isEmpty, s"plan regressions:\n${offenders.mkString("\n")}")
  }

  test("j02: range join is a hash join on the grid cell, not a nested loop") {
    val p = plan("j02_range_campaigns")
    // the whole point of the grid: the range predicate must ride an
    // equi join (hash), never BroadcastNestedLoopJoin's per-pair scan
    assert(p.contains("BroadcastHashJoin"), s"expected a hash join on __cell:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not fall back to a nested loop:\n$p")
  }

  test("v10: PQ kNN is a zero-shuffle codegen scan (encode + table lookups)") {
    val p = plan("v10_knn_pq")
    assert(p.contains("pq_encode") && p.contains("pq_adc"),
      s"both PQ kernels must appear in the plan:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange"), "PQ top-k must not shuffle")
    assert(!p.contains("ScalaUDF"))
  }

  test("v11: IVFADC is list-filter + codegen kernels, zero shuffle") {
    val p = plan("v11_knn_ivfpq")
    assert(p.contains("nearest_centroid") && p.contains("pq_encode") && p.contains("pq_adc"),
      s"coarse assignment and both PQ kernels must appear:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange"), "IVFADC top-k must not shuffle")
  }

  test("t23: per-source kernel aggregation computed once; verdicts broadcast") {
    val df = SparkEntry.queries("t23_source_quality")(spark, sf)
    df.collect()
    // the corpus-mean branch must REUSE the per-source shuffle, not
    // re-run the quality_score scan (both branches are bit-identical
    // subtrees because isNotNull(source) is stated at the source —
    // see the t23 comment in TextQueries)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"corpus mean must reuse the per-source kernel shuffle:\n$p")
    // the 20-row verdict table broadcasts onto the kernel-free scan
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("t24: mixture table broadcasts; corpus totals reuse the per-source shuffle") {
    val df = SparkEntry.queries("t24_mixture_repeats")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the budget/denominator branch must reuse the per-source kernel
    // aggregation's shuffle — one token-count pass over the corpus
    assert(p.contains("ReusedExchange"),
      s"corpus totals must reuse the per-source kernel shuffle:\n$p")
    // the 20-row mixture joins broadcast onto a kernel-free doc scan
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("v12: kNN join — collapsed banding, rep-pair dedup shuffle, rank limits") {
    val p = plan("v12_knn_join")
    assert(p.contains("lsh_bands"), s"fused signature kernel must appear:\n$p")
    // adversarial-skew defense: the banding kernel runs over the
    // exact-dup-collapsed rep table — materialized once (Scan
    // ExistingRDD, the lazy localCheckpoint in Collapse) so the 7
    // downstream references don't re-scan the source, and never the
    // raw rows: a boilerplate clique is one rep, not a hot bucket
    assert(nodeCount(p, "Scan ExistingRDD") >= 2 && nodeCount(p, "Scan parquet ") == 0,
      s"banding must consume the materialized collapse, not raw scans:\n$p")
    // the candidate-dedup shuffle carries BARE (ra, rb) rep pairs — the
    // embeddings attach to the deduped candidates afterwards, never
    // riding the banded self-join or the distinct
    assert("hashpartitioning\\(ra#\\d+L?, rb#".r.findFirstIn(p).nonEmpty,
      s"candidate dedup must shuffle bare rep pairs:\n$p")
    // all three rank limits (k+1-smallest member pool, rep-level pool
    // top-(k+1), final per-id top-k) push to partial+final
    // WindowGroupLimit around their shuffles: each map task keeps its
    // local top rows before the exchange — what bounds window input
    // (and the member expansion) at any SF
    assert(nodeCount(p, "WindowGroupLimit") == 6,
      s"expected 3 partial+final WindowGroupLimit pairs:\n$p")
  }

  test("v15: batched kNN — broadcast probes, partial+final rank limit, no corpus shuffle") {
    val p = plan("v15_knn_batch")
    // the bare (qid, bucket) probe set broadcasts into the index join
    // (qemb attaches via a second |Q|-row broadcast on qid);
    // the corpus side is a plain scan — it is never sort-merge joined
    // and never exchanged before ranking, so the only data that moves
    // is per-query candidates
    assert(p.contains("BroadcastHashJoin"), s"probes must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle for the join:\n$p")
    // the per-query top-k pushes to partial+final WindowGroupLimit
    // around the single by-qid shuffle — map tasks keep only their
    // local top-k candidates
    assert(nodeCount(p, "WindowGroupLimit") == 2,
      s"expected one partial+final WindowGroupLimit pair:\n$p")
    // the histogram/radius machinery rides the ≤2^nBits-row occupancy
    // table: its only cross joins are broadcast (occupancy × queries),
    // never a corpus-side cartesian
    assert(nodeCount(p, "CartesianProduct") == 0, s"no cartesian anywhere:\n$p")
  }

  test("v05/t09: near-dup banding consumes the exact-dup collapse materialization") {
    for (q <- Seq("v05_cosine_neardup", "t09_minhash_neardup_pairs")) {
      val p = plan(q)
      // the collapse (reps + members) is computed once and referenced
      // as materialized blocks — no raw re-scan anywhere downstream
      assert(nodeCount(p, "Scan ExistingRDD") >= 2,
        s"$q: banding must run over the materialized collapse:\n$p")
      // rep-pair candidate dedup shuffles bare rep ids only
      assert("hashpartitioning\\(ra#\\d+L?, rb#".r.findFirstIn(p).nonEmpty,
        s"$q: candidate dedup must shuffle bare rep pairs:\n$p")
    }
  }

  test("v13: semantic decontamination is one kernel scan — no join, no re-derive") {
    val p = plan("v13_semantic_decontam")
    // exactly one max_cosine: the threshold filter consumes the
    // projected column above the Generate barrier instead of
    // re-deriving the kernel below it (t17 precedent)
    assert(nodeFree(p, "max_cosine") == 1, s"kernel must evaluate once:\n$p")
    assert(p.contains("Generate"), s"expected the explode barrier:\n$p")
    // the eval matrix rides the plan as a reference object — any join
    // here means the corpus got shuffled against the eval set
    assert(!p.contains("Join"), s"eval matrix must not join:\n$p")
    assert(nodeCount(p, "Exchange") == 1, s"only the output sort may shuffle:\n$p")
  }

  test("q30: bucketed co-located join — no exchange or sort feeds the join") {
    val p = plan("q30_bucketed_join")
    assert(p.contains("SortMergeJoin"), s"merge hint must pin the co-located join:\n$p")
    assert(p.contains("Bucketed: true"), s"scans must report the bucket layout:\n$p")
    // the join merge-zips the pre-sorted bucket files directly: the only
    // exchanges are the aggregation's and the output sort's, and the
    // only Sort node IS the output sort
    assert(nodeCount(p, "Exchange") == 2,
      s"the join itself must not shuffle:\n$p")
    assert(nodeCount(p, "Sort\\b") == 1,
      s"in-bucket sort order must be reused, not re-sorted:\n$p")
  }

  test("t25: incremental dedup — text kernel on the NEW batch only, index from parquet") {
    val p = plan("t25_incremental_dedup")
    // exactly one minhash_sig and one band_hashes: the new batch's. The
    // existing corpus contributes parquet signature rows, never a
    // re-scan of its text
    assert(nodeFree(p, "minhash_sig") == 1,
      s"old-corpus text must never reach the kernel:\n$p")
    assert(nodeFree(p, "band_hashes") == 1,
      s"old-corpus bands come from the stored index:\n$p")
    // the candidate dedup shuffles bare (new_id, dup_of) pairs
    assert("hashpartitioning\\(new_id#\\d+L?, dup_of#".r.findFirstIn(p).nonEmpty,
      s"candidate dedup must shuffle bare id pairs:\n$p")
    // the new-batch quota filter reaches the documents scan
    assert(p.contains("PushedFilters: [IsNotNull(doc_id)") || p.contains("(doc_id % 5) = 0"),
      s"new-batch predicate must push down:\n$p")
  }

  test("v29: MaxSim late interaction keeps v02's scan + TakeOrdered shape") {
    val p = plan("v29_maxsim_retrieval")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange"), "token-level scoring must not shuffle")
    assert(nodeFree(p, "max_sim") == 1 && !p.contains("Generate"),
      s"one fused kernel, no token explode:\n$p")
  }

  test("v30: MaxSim rerank — shortlist broadcasts, corpus never shuffles") {
    val p = plan("v30_maxsim_rerank")
    assert(p.contains("BroadcastHashJoin LeftSemi"),
      s"shortlist ids must broadcast-semi-join the corpus:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("SortMergeJoin"), s"corpus must not shuffle:\n$p")
    assert(nodeFree(p, "max_sim") == 1, s"one rerank kernel evaluation:\n$p")
  }

  test("t39: BPE kernel evaluates once behind the Generate barrier") {
    val p = plan("t39_bpe_tokens")
    assert(nodeFree(p, "bpe_encode") == 1,
      s"n_bpe and bpe_fp must share ONE kernel evaluation:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("gng_stream_clusters: served plan is checkpointed state + render, no joins or hash shuffles") {
    val p = plan("gng_stream_clusters")
    // the incremental advances ran inside eager checkpoints at build
    // time (one narrow map per snapshot, prototype diffs as broadcast
    // constants); the served plan renders those blocks and sorts
    assert(nodeCount(p, "\\w*Join") == 0, s"no join anywhere in the serve plan:\n$p")
    assert(p.linesIterator.count(l =>
        l.trim.startsWith("Arguments: hashpartitioning")) == 0,
      s"only the output sort may exchange:\n$p")
    assert(!p.contains("Scan parquet"),
      s"the corpus must not re-scan at serve time (state is checkpointed):\n$p")
  }

  test("v31: batched MaxSim — corpus streams through broadcasts, per-qid top-k is a group limit") {
    val p = plan("v31_maxsim_batch")
    // the rerank kernel runs once, on shortlisted rows only
    assert(nodeFree(p, "max_sim_pair") == 1, s"one pairwise rerank kernel:\n$p")
    // the corpus reaches the kernel through broadcast joins (candidate
    // pairs + query-embedding attach) — it must never hash-shuffle or
    // sort-merge; the shortlist/window stages run over |Q|·50 rows
    assert(p.contains("BroadcastHashJoin"), s"shortlist must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$p")
    // per-query top-k plans as partial+final WindowGroupLimit, so map
    // tasks keep only their local top-k
    assert(p.contains("WindowGroupLimit"), s"per-qid top-k must be a group limit:\n$p")
  }

  test("t43: learned-table BPE serve keeps t39's one-kernel shape") {
    val p = plan("t43_bpe_learned_tokens")
    assert(nodeFree(p, "bpe_encode_with") == 1,
      s"n_bpe and bpe_fp must share ONE learned-table kernel evaluation:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
    // training ran in BpeTrain's bounded jobs at build time; the serve
    // plan is one corpus scan — no join, no shuffle before the sort
    assert(nodeCount(p, "\\w*Join") == 0, s"serve is scan + kernel + sort:\n$p")
  }

  test("t40: incremental clusters — stored table relabels via broadcast, never shuffles") {
    val p = plan("t40_incremental_clusters")
    // the increment pipeline (kernels, banding, star contraction) ran
    // inside eager checkpoints at build time; the SERVED merge plan
    // must contain no text kernel at all
    assert(nodeFree(p, "minhash_sig") == 0 && nodeFree(p, "band_hashes") == 0,
      s"merge must serve stored state, not re-run signature kernels:\n$p")
    // the corpus-sized stored table streams through broadcast hash
    // joins (relabel map is the build side); the only shuffle allowed
    // is the output sort's range partitioning
    assert(p.contains("BroadcastHashJoin"), s"relabel must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"stored side must not sort-merge:\n$p")
    // ≤2 hash exchanges, both on the BATCH-sized side (the increment's
    // endpoint-distinct agg); the stored parquet scan feeds its
    // broadcast join directly — corpus rows are never repartitioned
    assert(p.linesIterator.count(l =>
        l.trim.startsWith("Arguments: hashpartitioning")) <= 2,
      s"only the increment may shuffle at merge time:\n$p")
    val scanIdx = p.linesIterator.indexWhere(_.contains("Scan parquet"))
    val bhjIdx = p.linesIterator.indexWhere(_.contains("BroadcastHashJoin"))
    assert(bhjIdx >= 0 && bhjIdx < scanIdx,
      s"stored scan must be a direct child of the broadcast relabel join:\n$p")
  }

  test("t44: delete-aware index serving keeps t25's shape plus one broadcast anti tombstone join") {
    val p = plan("t44_incremental_dedup_deletes")
    // t25's discipline holds: one kernel pass (the new batch's), index
    // rows come from parquet
    assert(nodeFree(p, "minhash_sig") == 1 && nodeFree(p, "band_hashes") == 1,
      s"old-corpus text must never reach the kernel:\n$p")
    // the takedown set applies as a broadcast anti join on the
    // corpus-sized index stream — never a shuffle
    assert(p.contains("BroadcastHashJoin LeftAnti"),
      s"tombstones must anti-join via broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"the index must not sort-merge:\n$p")
  }

  test("t45: canonical selection over delete-maintained components — stored state broadcasts, no kernels re-run") {
    val p = plan("t45_canonical_after_deletes")
    // clustering state is prebuilt + maintained and the scored base is
    // eagerly checkpointed inside canonicalPerCluster (t27's one-pass
    // discipline) — the SERVED plan contains no text kernel at all
    assert(nodeFree(p, "minhash_sig") == 0 && nodeFree(p, "band_hashes") == 0,
      s"components must serve from maintained state:\n$p")
    assert(nodeFree(p, "quality_score") == 0,
      s"scoring ran once at build time, inside the checkpoint:\n$p")
    // the untouched-components branch of removeFromComponents is the
    // served broadcast anti join; the one sort-merge allowed is the
    // final corpus-sized docs ⟕ components attach (t31's shape — both
    // sides scale with the corpus, so broadcasting neither is right)
    assert(p.contains("BroadcastHashJoin LeftAnti"),
      s"untouched components pass through a broadcast anti join:\n$p")
    assert(nodeCount(p, "SortMergeJoin") <= 1,
      s"only the final id-keyed attach may sort-merge:\n$p")
  }

  test("t41: cluster deletes — stored/pair tables stream through broadcasts, star rounds ran on the induced subgraph only") {
    val p = plan("t41_cluster_deletes")
    // the touched-member lookup, induced-subgraph filter, and
    // re-clustering all ran inside eager checkpoints at build time;
    // the SERVED plan is the stored scan anti-joined against the
    // takedown-sized rep set, unioned with the re-clustered labels —
    // no text kernel anywhere
    assert(nodeFree(p, "minhash_sig") == 0 && nodeFree(p, "band_hashes") == 0,
      s"delete maintenance must serve persisted state, not re-run kernels:\n$p")
    assert(p.contains("BroadcastHashJoin LeftAnti"),
      s"untouched components must pass through a broadcast anti join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"stored side must not sort-merge:\n$p")
    // corpus rows are never repartitioned: the only exchange is the
    // output sort's range partitioning
    assert(p.linesIterator.count(l =>
        l.trim.startsWith("Arguments: hashpartitioning")) == 0,
      s"nothing may hash-shuffle at serve time:\n$p")
  }

  test("v28: prebuilt embedding clusters serve with zero kernels and zero joins") {
    val p = plan("v28_embedding_clusters_prebuilt")
    assert(nodeFree(p, "cosine") == 0 && nodeFree(p, "lsh_sig") == 0,
      s"serving a materialized clustering must not touch embeddings:\n$p")
    assert(nodeCount(p, "\\w*Join") == 0, s"serve is scan + window + sort:\n$p")
    assert(p.contains("Window"), s"cluster_size is the only computed column:\n$p")
  }

  test("v35: prebuilt SemDeDup verdicts serve with zero kernels and zero joins") {
    val p = plan("v35_semantic_dedup_prebuilt")
    assert(nodeFree(p, "cosine") == 0 && nodeFree(p, "nearest_centroid") == 0,
      s"serving a materialized verdict table must not touch embeddings:\n$p")
    assert(nodeCount(p, "\\w*Join") == 0, s"serve is scan + sort:\n$p")
  }

  test("q31: bucketed upsert — snapshot side joins in place, only the increment shuffles") {
    val p = plan("q31_bucketed_upsert")
    assert(p.contains("SortMergeJoin FullOuter"), s"upsert is one full-outer merge join:\n$p")
    assert(p.contains("Bucketed: true"), s"snapshot must come from the bucketed layout:\n$p")
    // exactly two Exchanges: the increment side's (into the snapshot's
    // bucket count) and the output sort's — the snapshot side has NONE
    assert(nodeCount(p, "Exchange") == 2,
      s"only the increment and the output sort may shuffle:\n$p")
    // and exactly two Sorts: the increment side's and the output's —
    // the snapshot side merge-zips its pre-sorted bucket files
    assert(nodeCount(p, "Sort\\b") == 2,
      s"snapshot bucket order must be reused, not re-sorted:\n$p")
  }

  test("t26: unigram surprisal — one corpus text pass via exchange reuse") {
    // static plans expand the shared tf subtree per consumer (vocab,
    // total, join); reuse only materializes in the EXECUTED plan
    // (t23 precedent)
    val df = SparkEntry.queries("t26_unigram_surprisal")(spark, sf)
    df.collect()
    // AQE's toString appends the pre-reuse "Initial Plan" — count in
    // the Final Plan section only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange"),
      s"vocab/total must reuse the tf aggregation's shuffle:\n$p")
    // after reuse the corpus text is tokenized exactly once
    assert("normalize_text".r.findAllIn(p).size == 1,
      s"corpus text must be tokenized exactly once:\n$p")
  }

  test("t55: bigram surprisal — the LM derives from the materialized count table and broadcasts") {
    val df = SparkEntry.queries("t55_bigram_surprisal")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the (doc, bigram, bf) table materialized ONCE at build (eager
    // localCheckpoint): the served plan re-reads rows — the tokenize
    // kernel and the corpus scan appear ZERO times here
    assert(!p.contains("normalize_text") && !p.contains("Scan parquet"),
      s"all consumers must ride the materialized bigram table:\n$p")
    // all three LM tables (bigram, context, target-unigram) broadcast
    // onto the per-doc side; nothing sort-merges
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"the Zipf-small LM tables must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("t58: contamination report — eval shingles broadcast; the corpus never content-shuffles") {
    val p = plan("t58_contamination_report")
    assert(nodeFree(p, "shingle_hashes") == 2,
      s"one kernel pass per side (corpus + eval):\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct") && !p.contains("ScalaUDF"))
    val shuffles = p.linesIterator.filter(_.trim.startsWith("Arguments: hashpartitioning")).toSeq
    assert(!shuffles.exists(_.contains("text")),
      s"document text must never shuffle:\n${shuffles.mkString("\n")}")
  }

  test("t57: incremental surprisal — only the increment's checkpointed counts and the stored LM serve") {
    val df = SparkEntry.queries("t57_incremental_surprisal")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the increment's kernel pass ran once at checkpoint build; the
    // old corpus's TEXT never appears — the only parquet reads are the
    // stored (g, c) LM index
    assert(!p.contains("normalize_text"),
      s"no tokenize kernel may run at serve:\n$p")
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.forall(r => !r.contains("text")),
      s"the old corpus's text must never be re-read:\n${reads.mkString("\n")}")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"the merged LM tables must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("t79: incremental KN — increment tokenizes once, old corpus enters only via the trigram parquet") {
    val df = SparkEntry.queries("t79_kneser_ney_incremental")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the served plan starts from the increment's CHECKPOINTED trigram
    // rows and the stored (lang, g, c) parquet — no tokenize kernel,
    // no document text read, LM tables broadcast back
    assert(!p.contains("normalize_text"),
      s"no tokenize kernel may run at serve:\n$p")
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.forall(r => !r.contains("text")),
      s"the old corpus's text must never be re-read:\n${reads.mkString("\n")}")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 5,
      s"the merged LM tables must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("m12: imageio decode — one decode pass feeds features and banding; no corpus shuffle of payloads") {
    val df = SparkEntry.queries("m12_imageio_decode")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // features come from the checkpointed decode (payload bytes never
    // shuffle); the caught-id side broadcasts back onto it
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"caught ids must broadcast onto the feature table:\n$p")
    assert(!p.contains("imageio_stats"),
      s"the decode must serve from the checkpoint, not re-run:\n$p")
  }

  test("v14: filtered ANN — the label pre-filter reaches the parquet scan") {
    val p = plan("v14_knn_filtered")
    assert(p.contains("GreaterThanOrEqual(label,5)"),
      s"metadata predicate must push into the scan:\n$p")
    assert(p.contains("lsh_bands"), s"signature kernel must appear:\n$p")
  }

  test("v07: served kNN ranking scan prunes to the probed buckets' partitions") {
    val df = SparkEntry.queries("v07_knn_served")(spark, sf)
    // the hamming-radius predicate references ONLY the partition column,
    // so it must land in PartitionFilters (listing-time pruning), never
    // a post-scan Filter over every bucket's files
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.nonEmpty, "served kNN must read the prebuilt parquet index")
    assert(scan.get.partitionFilters.exists(_.references.exists(_.name == "bucket")),
      s"hamming-radius filter must prune partitions:\n${scan.get.partitionFilters}")
    // and the pruning bites: fewer bucket directories scanned than exist
    // (nBits=4 over sf0.001's 500 vectors populates most of the 16
    // buckets; the histogram-chosen radius covers only a subset)
    val total = graft.queries.VectorQueries.servedIndex(spark, sf)
      .select("bucket").distinct().count()
    val scanned = scan.get.selectedPartitions.partitionCount
    assert(scanned < total,
      s"expected the radius scan to prune ($scanned scanned of $total buckets)")
    // served == online: byte-identical answer to the v03 path
    val online = SparkEntry.queries("v03_knn_lsh")(spark, sf)
    assert(df.collect().toSeq === online.collect().toSeq)
  }

  test("v16: served IVFADC prunes to the probed lists' partitions, reads codes only") {
    val df = SparkEntry.queries("v16_knn_ivfpq_served")(spark, sf)
    // the probe predicate references ONLY the `list` partition column →
    // file-listing-time pruning, never a post-scan Filter over every list
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.nonEmpty, "served IVFADC must read the prebuilt parquet index")
    assert(scan.get.partitionFilters.exists(_.references.exists(_.name == "list")),
      s"probe-set filter must prune partitions:\n${scan.get.partitionFilters}")
    // pruning bites: nProbe=2 of the trained model's lists
    val total = graft.queries.VectorQueries.servedIvfPqIndex(spark, sf)
      .select("list").distinct().count()
    val scanned = scan.get.selectedPartitions.partitionCount
    assert(scanned < total,
      s"expected the probe scan to prune ($scanned scanned of $total lists)")
    // the served scan reads stored codes, never raw embeddings, and the
    // encode kernel must be absent from the query-time plan
    val read = scan.get.schema.fieldNames.toSet
    assert(read.contains("codes") && !read.contains("emb"),
      s"served scan must read codes only: $read")
    assert(!df.queryExecution.executedPlan.toString.contains("pq_encode"),
      "encode kernel must not run at query time")
    // served == online: byte-identical answer to the v11 path
    val online = SparkEntry.queries("v11_knn_ivfpq")(spark, sf)
    assert(df.collect().toSeq === online.collect().toSeq)
  }

  /** Every file scan in the plan, descending through the AQE wrapper —
    * joins put the whole tree behind an AdaptiveSparkPlanExec whose
    * collectLeaves() sees no scans (v07/v16's join-free plans don't
    * hit this). */
  private def allFileScans(df: DataFrame): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    def go(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => go(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(go)
    }
    go(df.queryExecution.executedPlan)
  }

  test("v22: delete-aware IVFADC serving — BOTH index scans prune to the probed lists") {
    val df = SparkEntry.queries("v22_ivfpq_delete")(spark, sf)
    // the live view is resolved AFTER the probe filter, so the data
    // rows AND the tombstones descend from the same pruned subtree —
    // a LeftAnti join would not push the filter to its right side, so
    // ordering it wrong re-scans every list's tombstones per query
    val scans = allFileScans(df)
    assert(scans.nonEmpty, "delete-aware serving must read the parquet index")
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.references.exists(_.name == "list")),
        s"every index scan must prune to probed lists:\n${s.partitionFilters}")
    }
    val total = graft.queries.VectorQueries.servedIvfPqDeletedIndex(spark, sf)
      .select("list").distinct().count()
    scans.foreach(s => assert(s.selectedPartitions.partitionCount < total,
      s"pruning must bite (${s.selectedPartitions.partitionCount} of $total lists)"))
    // codes are STORED; neither kernel runs at query time
    assert(!df.queryExecution.executedPlan.toString.contains("pq_encode"),
      "encode kernel must not run at query time")
  }

  test("v23: delete-aware LSH serving — ranking scan prunes to the probed buckets") {
    val df = SparkEntry.queries("v23_knn_served_delete")(spark, sf)
    val scans = allFileScans(df)
    assert(scans.exists(_.partitionFilters.exists(_.references.exists(_.name == "bucket"))),
      s"radius filter must prune bucket partitions:\n${scans.map(_.partitionFilters)}")
    // the signature kernel never runs at query time — buckets are stored
    assert(!df.queryExecution.executedPlan.toString.contains("lsh_bands"),
      "signature kernel must not run at query time")
  }

  test("t27: canonical selection — scored base materialized once, no kernel re-run") {
    val p = plan("t27_canonical_docs")
    // the (id, score) base is localCheckpoint'ed: both consumers read
    // the materialized blocks (Scan ExistingRDD), so the quality
    // kernel never appears in the final plan — one text pass total,
    // not one per reference
    assert(!p.contains("quality_score"),
      s"quality kernel must run once in the checkpoint, not per reference:\n$p")
    assert(nodeCount(p, "Scan ExistingRDD") >= 2,
      s"verdict joins must consume the materialized base + components:\n$p")
    // the argmax window partitions by cluster rep — never a global sort
    assert("hashpartitioning\\(rep#".r.findFirstIn(p).nonEmpty,
      s"per-cluster rank must shuffle on rep:\n$p")
  }

  test("v18: rerank — shortlist broadcasts into one corpus scan, exact kernel, no corpus shuffle") {
    val p = plan("v18_knn_rerank")
    // the shortlist (bare qid, id) and the query vectors broadcast into
    // the raw-embedding scan; the corpus side never sort-merge joins
    assert(p.contains("vec_squared_distance"), s"exact re-rank kernel must appear:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"shortlist must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle for the re-rank:\n$p")
    // two rank stages (ADC shortlist + exact re-rank), each a
    // partial+final WindowGroupLimit pair
    assert(nodeCount(p, "WindowGroupLimit") == 4,
      s"expected two partial+final WindowGroupLimit pairs:\n$p")
  }

  test("v17: batched IVFADC — broadcast probes, direct ADC on stored codes, rank limit") {
    val p = plan("v17_knn_ivfpq_batch")
    // both kernels appear: per-query probe selection and LUT-free ADC;
    // the encode kernel must NOT (codes are stored)
    assert(p.contains("nearest_lists"), s"probe-selection kernel must appear:\n$p")
    assert(p.contains("pq_adc_direct"), s"direct ADC kernel must appear:\n$p")
    assert(!p.contains("pq_encode"), s"encode must not run at query time:\n$p")
    // the exploded (qid, qemb, list) probe set broadcasts into the
    // index equi-join; the index side never sort-merge joins
    assert(p.contains("BroadcastHashJoin"), s"probes must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"index must not shuffle for the join:\n$p")
    // per-query top-k pushes to partial+final WindowGroupLimit
    assert(nodeCount(p, "WindowGroupLimit") == 2,
      s"expected one partial+final WindowGroupLimit pair:\n$p")
  }

  test("q33: z-order cells — broadcast 1-row range, shift/mask in codegen, partial+final") {
    val p = plan("q33_zorder_cells")
    // the min/max range rides a broadcast of the 1-row aggregate — the
    // fact table never shuffles for it
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"range must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact table must not shuffle for the range:\n$p")
    assert(p.contains("shiftright"), s"interleave must be shift/mask arithmetic:\n$p")
    assert(nodeCount(p, "HashAggregate") >= 4,
      s"range and cell aggregations must both be partial+final:\n$p")
  }

  test("v19: k-means round — kernel assignment, partial+final update, one scan, no join") {
    val p = plan("v19_kmeans")
    assert(p.contains("nearest_centroid"),
      s"assignment must be the codegen kernel (centroids as plan constants):\n$p")
    assert(nodeCount(p, "Scan parquet") == 1, s"one corpus pass per round:\n$p")
    assert(!p.contains("Join"), s"assignment must not join a centroid table:\n$p")
    // vectors aggregate WHOLE through the vec_sum buffer: partial+final
    // ObjectHashAggregate keyed by cluster, so the shuffle carries one
    // (cluster, d-vector) buffer per map partition and the posexplode
    // runs on the k aggregated rows, never the corpus
    assert(nodeCount(p, "ObjectHashAggregate") >= 2,
      s"update must be a partial+final vector-buffer aggregate:\n$p")
    assert(p.indexOf("Generate") > p.indexOf("Exchange"),
      s"posexplode must run on the aggregated rows, after the shuffle:\n$p")
    // the inner agg keys by cluster alone, so the query's outer
    // groupBy(cluster) reuses that partitioning: exactly one hash
    // Exchange (the second Exchange is the final orderBy's range part.)
    assert(nodeCount(p, "Exchange") == 2,
      s"one by-cluster shuffle + the output sort, nothing else:\n$p")
  }

  test("q32: profiler — one pruned scan, all per-column stats in a single Expand pass") {
    val p = plan("q32_profile")
    assert(nodeCount(p, "Scan parquet") == 1,
      s"all columns must profile in ONE scan, not one per column:\n$p")
    assert(nodeCount(p, "Expand") == 1,
      s"multi-distinct must plan as a single Expand:\n$p")
    val read = p.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(read.contains("event_id") && read.contains("event_type")
      && read.contains("user_id") && !read.contains("props"),
      s"scan must prune to the profiled columns: $read")
  }

  test("t28: passage dedup — map-side-combined election, no text window, one text pass") {
    val p = plan("t28_passage_dedup")
    // first-occurrence election is partial+final min(struct) keyed by the
    // passage fingerprint — a boilerplate passage collapses map-side
    // instead of landing on one reducer under a row_number window
    assert(p.contains("partial_min"), s"election must map-side combine:\n$p")
    assert(!p.contains("Window "), s"no window over passage content (skew):\n$p")
    // the passage table materializes ONCE (lazy localCheckpoint): the
    // fingerprint stream and the keep-set join both read the same RDD,
    // and no text scan/kernel remains in the query-time plan
    assert(nodeCount(p, "Scan ExistingRDD") == 2,
      s"both branches must consume the materialized passage table:\n$p")
    assert(!p.contains("Scan parquet"), s"text must not be re-scanned at query time:\n$p")
    assert(!p.contains("normalize_text"), s"kernel must not re-run at query time:\n$p")
  }

  test("j03: salted join — both sides shuffle on (key, salt), no broadcast, no key-only exchange") {
    val p = plan("j03_salted_join")
    assert(p.contains("ShuffledHashJoin"),
      s"the salted build side must shuffle-hash, not broadcast (the demo's premise):\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"no broadcast:\n$p")
    // every join exchange must carry the salt — a key-only partitioning
    // would put the whole fact table back on 5 reducers
    val exchanges = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(_.contains("__graft_salt")),
      s"all hash exchanges must include the salt: $exchanges")
  }

  test("q38: window suite — the tie-broken sort serves both window specs") {
    val p = plan("q38_window_suite")
    assert(nodeCount(p, "Window") == 2, s"both window phases expected:\n$p")
    // w2's (price DESC, orderkey) ordering refines w1's, so ONE sort
    // (+ the output sort) serves both Window nodes
    assert(nodeCount(p, "Sort") == 2,
      s"rank metrics must reuse the nth_value window's sort:\n$p")
    assert(nodeCount(p, "Exchange") == 2,
      s"one by-customer shuffle + the output sort only:\n$p")
  }

  test("q34: sessionize — both windows share one sort, agg rides the window partitioning") {
    val p = plan("q34_sessionize")
    // lag-flag window and running-sum window both partition by user_id
    // with the same (ts, event_id) ordering → exactly one Sort feeds the
    // two Window nodes (plus the final orderBy's sort), and the
    // (user_id, session_no) aggregation reuses the by-user partitioning:
    // one hash Exchange total + the output range Exchange
    assert(nodeCount(p, "Window") == 2, s"expected both window phases:\n$p")
    assert(nodeCount(p, "Sort") == 2,
      s"both windows must share ONE sort (+output sort), saw:\n$p")
    assert(nodeCount(p, "Exchange") == 2,
      s"one by-user shuffle + the output sort, nothing else:\n$p")
    val read = p.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!read.contains("props") && !read.contains("event_type"),
      s"scan must prune to the session columns: $read")
  }

  test("q35: gap-fill — spine inputs ride the materialized hourly agg, one fact scan") {
    // the hour range, the event_type set, and the join side all read
    // the localCheckpoint'ed hourly aggregate; without it Catalyst
    // pushes min/max/distinct through the agg back to the base table
    // (three fact scans). Materialization shows in the executed plan.
    val df = SparkEntry.queries("q35_gapfill")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("FileScan parquet".r.findAllIn(p).size <= 1 &&
      !p.contains("Scan parquet "),
      s"the events table must be scanned at most once at query time:\n$p")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 3,
      s"range, type set, and join side must all consume the checkpoint:\n$p")
  }

  test("t30: source drift — one corpus scan, windows and PSI on dimension-sized rows") {
    val p = plan("t30_source_drift")
    assert(nodeCount(p, "Scan parquet") == 1,
      s"both snapshot halves must aggregate in ONE scan, not one per half:\n$p")
    // the only scan-sized work is the (source, lang) count-aggregate;
    // totals/PSI run on its output via windows — no self-join
    assert(!p.contains("Join"), s"per-source totals must be windows, not a self-join:\n$p")
    val read = p.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!read.contains("text"),
      s"drift stats must not read document text: $read")
  }

  test("v20: ANN recall — ground truth is one corpus scan with broadcast queries") {
    val p = plan("v20_ann_recall")
    // brute-force arm: corpus scan × broadcast 3-row query set — the
    // corpus must never shuffle for scoring (only the rank window's
    // by-qid exchange of the top candidates)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"query set must broadcast into the corpus scan:\n$p")
    assert(nodeCount(p, "WindowGroupLimit") >= 2,
      s"exact top-10 must prune partially before the by-qid shuffle:\n$p")
  }

  test("q37: incremental agg — history contributes only its state table, one increment scan") {
    val p = plan("q37_incremental_agg")
    // exactly two parquet scans: the stored per-type state (5-ish rows)
    // and the increment's half of events — the historical raw rows are
    // never re-read
    assert(nodeCount(p, "Scan parquet") == 2,
      s"history must be served from the snapshot state table alone:\n$p")
    val reads = p.linesIterator.filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(reads.exists(_.contains("cnt")) && reads.exists(_.contains("vmin")),
      s"one scan must read the mergeable state schema: $reads")
    assert(reads.exists(r => r.contains("event_id") && r.contains("value")),
      s"the other scan is the pruned increment: $reads")
    // the merge is a FULL OUTER over two STATE tables: the increment
    // aggregates partial+final BELOW the join (fact rows never reach
    // it), so both join sides are |keys|-sized at any SF — full outer
    // cannot broadcast in Spark, and here it never needs to
    assert(p.contains("SortMergeJoin FullOuter"), s"state merge must be full outer:\n$p")
    assert(nodeCount(p, "HashAggregate") == 2,
      s"the increment must reach the merge pre-aggregated (partial+final):\n$p")
  }

  test("q36: grouping sets — one Expand, partial+final agg, pruned scan") {
    val p = plan("q36_grouping_sets")
    assert(nodeCount(p, "Expand") == 1,
      s"all grouping sets must plan as ONE Expand over one scan:\n$p")
    assert(nodeCount(p, "Scan parquet") == 1,
      s"the fact table must not be re-scanned per grouping set:\n$p")
    assert(nodeCount(p, "HashAggregate") == 2,
      s"partial+final aggregation around the single shuffle:\n$p")
    val read = p.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(read.count(_ == ',') == 2,
      s"scan must prune to the 3 referenced columns: $read")
  }

  test("q40: bloom probe prunes the fact side BELOW the join's shuffle") {
    val p = plan("q40_bloom_join")
    // the probe is a Filter on the fact branch, not post-join
    assert(p.contains("bloom_might_contain"),
      s"fact side must carry the bloom membership filter:\n$p")
    assert(p.contains("SortMergeJoin"),
      s"merge hint models the too-big-to-broadcast dim:\n$p")
    // formatted detail sections: the Filter node that carries the bloom
    // probe must sit on the lineitem scan's branch — its input schema
    // still has l_extendedprice (pre-join fact columns), proving the
    // prune happens before the Exchange, not after the join
    val sections = p.split("\n\n")
    val bloomFilterSection = sections.find(s =>
      s.contains("Filter") && s.contains("bloom_might_contain"))
    assert(bloomFilterSection.exists(_.contains("l_suppkey")),
      s"bloom probe must test the fact key:\n$p")
    // the fact scan reads only the 3 referenced columns
    val reads = p.linesIterator.filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(reads.exists(r => r.contains("l_suppkey") && r.count(_ == ',') <= 2),
      s"fact scan must prune to the join key + measures: $reads")
  }

  test("t33: CMS probe is a plan constant; exact top-k is TakeOrdered, not a global sort") {
    val p = plan("t33_heavy_hitters")
    assert(p.contains("cms_estimate"),
      s"estimates must come from the plan-constant sketch probe:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a bounded TakeOrdered, never a full sort:\n$p")
    // the total-occurrences side rides in as a broadcast 1-row agg
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"n_tokens must broadcast:\n$p")
  }

  test("v25: SQ8 serving is a narrow codes scan + TakeOrdered, no shuffle") {
    val p = plan("v25_knn_sq8")
    assert(p.contains("sq_adc"), s"distance must be the plan-constant ADC kernel:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must be TakeOrdered:\n$p")
    assert(!p.contains("Exchange"), s"SQ8 ranking must not shuffle:\n$p")
  }

  test("q47: box query prunes the clustered table's cells at listing time") {
    val p = plan("q47_zorder_ingest")
    assert(p.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*zcell".r.findFirstIn(p).nonEmpty,
      s"the cell IN-list must prune partition directories:\n$p")
    // the exact box predicate also reaches the row filter
    assert(p.contains("GreaterThanOrEqual(l_partkey,100)"),
      s"exact re-filter must push down:\n$p")
    assert(nodeCount(p, "Exchange") <= 1, s"scan + output sort only:\n$p")
  }

  test("q46: SCD2 temporal lookup keeps the as-of single-shuffle shape") {
    val p = plan("q46_scd2_lookup")
    // the dim build shares the fact's user_id clustering; budget: the
    // shared hash exchange + (possibly) one for the union's window +
    // the output sort — NEVER an interval-join pair explosion
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"temporal lookup must never plan as an interval/nested-loop join:\n$p")
    assert(nodeCount(p, "Exchange") <= 3,
      s"lookup is the one-shuffle as-of family (+build+sort):\n$p")
  }

  test("q45: scan-local checks fuse; FKs are broadcast anti-joins") {
    val p = plan("q45_quality_checks")
    // 5 scan-local constraints + 2 FK probes + 2 dim key sets = 4 scans
    // of lineitem at most (1 fused agg + 2 FK probes) and NEVER one
    // scan per constraint
    assert(nodeCount(p, "Scan parquet") <= 5,
      s"constraints must not multiply scans:\n$p")
    assert("BroadcastHashJoin LeftAnti".r.findAllIn(p).size == 2,
      s"both FKs must be broadcast anti-joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"dimension key sets must never shuffle-join the fact:\n$p")
  }

  test("q41: SCD2 build is ONE hash shuffle — windows, version agg, chain all reuse it") {
    val p = plan("q41_scd2_history")
    assert(nodeCount(p, "Scan parquet") == 1, s"one pass over the log:\n$p")
    // Exchange 1 = the user_id hash the whole pipeline shares;
    // Exchange 2 = the output orderBy. The (key, version) aggregate and
    // the valid_to chain must NOT introduce their own.
    assert(nodeCount(p, "Exchange") == 2,
      s"flag/number/agg/chain must share the key clustering:\n$p")
    assert(nodeCount(p, "Window") == 3, s"lag + running-sum + lead:\n$p")
  }

  test("q42: SCD2 merge reads the STORED dim; all key-set joins broadcast") {
    val p = plan("q42_scd2_merge")
    // the dimension arrives as parquet state (valid_from in a read
    // schema), never re-derived from the log inside this plan
    val reads = p.linesIterator.filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(reads.exists(_.contains("valid_from")),
      s"dim must be served from its snapshot parquet: $reads")
    // touched-key semi/anti joins and the version-rebase join all
    // broadcast the small side — a 100 TB dim never sort-merges against
    // an increment-sized key set
    assert(p.contains("BroadcastHashJoin"), s"key-set joins must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoop"),
      s"no shuffle or nested-loop joins in the merge:\n$p")
    // increment-side time filter reaches the event scans
    assert(p.contains("GreaterThanOrEqual(ts,"),
      s"increment cutoff must push into the log scan:\n$p")
  }

  test("q48: unpivot is one scan + one narrow Expand; fan-out collapses before the shuffle") {
    val p = plan("q48_unpivot")
    assert(nodeCount(p, "Scan parquet") == 1, s"melt must not re-scan per measure:\n$p")
    assert(nodeCount(p, "Expand") == 1, s"unpivot plans as a single Expand:\n$p")
    // Exchange 1 = the group-by hash (AFTER the partial aggregate eats
    // the 4x fan-out), Exchange 2 = the output orderBy
    assert(nodeCount(p, "Exchange") == 2,
      s"partial agg must collapse the melt before the only data shuffle:\n$p")
    assert(!p.contains("Union"), s"melt is Expand, never a 4-branch union:\n$p")
  }

  test("q49: table diff hashes payloads below the join and prunes both scans") {
    val p = plan("q49_table_diff")
    // payload columns collapse to xxhash64 fingerprints pre-join
    assert(p.contains("xxhash64"), s"diff must compare fingerprints, not rows:\n$p")
    // every events scan prunes to key+compare columns — ts and props
    // (events' widest column) must never be read
    val reads = p.linesIterator.filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(reads.nonEmpty)
    assert(reads.forall(r => !r.contains("props") && !r.contains("ts")),
      s"unused payload columns must prune out of the scans: $reads")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q50: schema evolution serves from ONE merged scan, not a union of generations") {
    val p = plan("q50_schema_evolution")
    assert(nodeCount(p, "Scan parquet") == 1,
      s"mixed-schema files must read as one relation:\n$p")
    assert(!p.contains("Union"), s"no per-generation union:\n$p")
    val read = p.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(read.contains("quality"),
      s"merged schema must surface the evolved column: $read")
  }

  test("t34: inverted-index lookup prunes to the query terms' buckets; corpus joins broadcast") {
    val df = SparkEntry.queries("t34_inverted_index")(spark, sf)
    val scan = allFileScans(df).find(_.output.exists(_.name == "term"))
    assert(scan.nonEmpty, "lookup must read the prebuilt postings parquet")
    assert(scan.get.partitionFilters.exists(_.references.exists(_.name == "bucket")),
      s"term-bucket predicate must prune at listing time:\n${scan.get.partitionFilters}")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the term IN filter also pushes into the postings scan
    assert(p.contains("In(term"), s"term predicate must push down:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct"))
  }

  test("q52: the whole stats panel is one partial+final pass over one scan") {
    val p = plan("q52_stats_suite")
    assert(nodeCount(p, "Scan parquet") == 1, s"six stats must not re-scan:\n$p")
    assert(nodeCount(p, "HashAggregate") == 2, s"moments must merge partial+final:\n$p")
    assert(!p.contains("Window"), s"co-moment stats need no value buffers or sorts:\n$p")
    assert(nodeCount(p, "Exchange") == 2, s"one data shuffle + the output sort:\n$p")
  }

  test("t37: BM25 — pruned postings scan, broadcast df, TakeOrdered top-k") {
    val df = SparkEntry.queries("t37_bm25_search")(spark, sf)
    val scan = allFileScans(df).find(_.output.exists(_.name == "tf"))
    assert(scan.nonEmpty, "scoring must read the prebuilt postings parquet")
    assert(scan.get.partitionFilters.exists(_.references.exists(_.name == "bucket")),
      s"term-bucket predicate must prune at listing time:\n${scan.get.partitionFilters}")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not globally sort:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"the per-term df table must broadcast:\n$p")
  }

  test("t38: phrase search is one tokenize pass — window adjacency, no token self-join") {
    val p = plan("t38_phrase_search")
    assert(nodeCount(p, "Scan parquet") == 1, s"one corpus pass:\n$p")
    assert(nodeCount(p, "Generate") == 1, s"one posexplode:\n$p")
    assert(nodeCount(p, "Window") == 1, s"adjacency via one lead() window:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"no positional self-join:\n$p")
  }

  test("q55: incremental join view — stored view from parquet, all delta terms broadcast") {
    val p = plan("q55_incremental_join")
    // the view arrives as stored parquet (o_totalprice in a ReadSchema
    // alongside c_name — only the materialized view has both)
    assert(p.contains("BroadcastHashJoin"), s"delta sides must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no stored side may shuffle for an increment:\n$p")
  }

  test("j04: interval overlap is a hash join on the grid cell, not a nested loop") {
    val p = plan("j04_interval_overlap")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi join on __cell:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"overlap join must not fall back to a nested loop:\n$p")
    // the single-credit-cell filter replaces any dedup of shared cells
    assert(!p.contains("Deduplicate") && !p.contains("Distinct"),
      s"pair dedup must be free (credit cell), not a shuffle:\n$p")
  }

  test("q51: CDC apply — untouched snapshot rows leave via an anti join on bare keys") {
    val p = plan("q51_cdc_apply")
    // hinted explicitly in Cdc.applyChanges — a missing size estimate on
    // the post-window key set must never degrade this to a sort-merge
    // that shuffles the snapshot
    assert(p.contains("BroadcastHashJoin LeftAnti"),
      s"carry arm must be a BROADCAST anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    // the bare-keys guarantee (no payload through the anti join's build
    // side) is pinned structurally on the optimized plan in CdcSpec —
    // node counts here are unstable under AQE's tree duplication
  }

  test("v26: radius search carries no top-k state — no window, no pre-output sort") {
    val p = plan("v26_radius_search")
    assert(!p.contains("Window"), s"threshold search must not rank:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"probe set and query embeddings must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    // the only Sort is the deterministic output ordering
    assert(nodeCount(p, "Sort\\b") <= 1,
      s"matches must pipeline, not buffer through sorts:\n$p")
  }

  test("t48: NFC normalization is a per-row codegen map — no shuffle before the output sort, pruned scan") {
    val p = plan("t48_normalize_text")
    assert(!p.contains("ScalaUDF"), s"nfc must be the native expression:\n$p")
    assert(p.contains("nfc_normalize"), s"the kernel must appear in the plan:\n$p")
    // pure row map: the ONLY exchange is the deterministic output sort
    assert(nodeCount(p, "Exchange") <= 1,
      s"normalization must not shuffle:\n$p")
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("lang"), s"scan must prune to (doc_id, text): $read")
  }

  test("t49: duplicate spans scan the corpus once and shuffle hashes and ids only") {
    val p = plan("t49_duplicate_spans")
    // ONE kernel pass / one scan: cross-doc detection is a window over
    // the gram hash, not a groupBy joined back (which re-scans)
    assert(nodeFree(p, "shingle_hashes") == 1,
      s"one fused kernel pass over the corpus:\n$p")
    assert(nodeCount(p, "Scan parquet") == 1,
      s"the corpus parquet must be read once:\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"))
    // gram-hash window + doc window + output sort — nothing else moves
    assert(nodeCount(p, "Exchange") <= 3,
      s"expected gh-window, id-window, output-sort exchanges only:\n$p")
    // every shuffle carries (id, start0, gh)-shaped rows: no exchange
    // may reference the text column
    val shuffles = p.linesIterator.filter(_.trim.startsWith("Arguments: hashpartitioning")).toSeq
    assert(shuffles.nonEmpty, "expected hash exchanges for window/agg")
    assert(!shuffles.exists(_.contains("text")),
      s"document text must never shuffle:\n${shuffles.mkString("\n")}")
  }

  test("t50: span cut broadcasts the patch intervals; text rides a second scan, never an exchange") {
    val p = plan("t50_cut_spans")
    // gram pass on scan 1; the cut side runs normalize_text only
    assert(nodeFree(p, "shingle_hashes") == 1,
      s"one gram kernel pass:\n$p")
    assert(nodeCount(p, "Scan parquet") == 2,
      s"gram pass + cut pass = exactly two corpus scans:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"the per-doc interval lists must broadcast onto the text scan:\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"))
    // gh-window + id-window + output sort; the broadcast is not a
    // hashpartitioning exchange
    assert(nodeCount(p, "Exchange") <= 3,
      s"expected gh-window, id-window, output-sort exchanges only:\n$p")
    val shuffles = p.linesIterator.filter(_.trim.startsWith("Arguments: hashpartitioning")).toSeq
    assert(!shuffles.exists(_.contains("text")),
      s"document text must never shuffle:\n${shuffles.mkString("\n")}")
  }

  test("t51: incremental spans hash only the increment's text; the stored index serves bare gram hashes") {
    val p = plan("t51_incremental_spans")
    // ONE kernel pass — the increment; the old corpus's text is never
    // re-scanned (its parquet scan is the gh-only index)
    assert(nodeFree(p, "shingle_hashes") == 1,
      s"only the increment may run the gram kernel:\n$p")
    assert(nodeCount(p, "Scan parquet") == 2,
      s"increment scan + index scan, nothing else:\n$p")
    val reads = p.linesIterator.filter(_.startsWith("ReadSchema")).toSeq
    assert(reads.count(_.contains("text")) == 1,
      s"exactly one scan (the increment) may read text:\n${reads.mkString("\n")}")
    assert(reads.exists(r => r.contains("gh") && !r.contains("text")),
      s"the index scan must prune to the gram hash:\n${reads.mkString("\n")}")
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"))
    val shuffles = p.linesIterator.filter(_.trim.startsWith("Arguments: hashpartitioning")).toSeq
    assert(!shuffles.exists(_.contains("text")),
      s"document text must never shuffle:\n${shuffles.mkString("\n")}")
    // gh window (+ possibly the index join) + id window + output sort
    assert(nodeCount(p, "Exchange") <= 4,
      s"expected gh-side, id-window, output-sort exchanges only:\n$p")
  }

  test("t52: incremental cut runs the kernel on the increment only; the patch broadcasts onto its second scan") {
    val p = plan("t52_incremental_cut")
    assert(nodeFree(p, "shingle_hashes") == 1,
      s"only the increment may run the gram kernel:\n$p")
    // increment gram pass + index + increment cut pass — the stored
    // corpus's text is never touched
    assert(nodeCount(p, "Scan parquet") == 3,
      s"increment ×2 + index scans, nothing else:\n$p")
    val reads = p.linesIterator.filter(_.startsWith("ReadSchema")).toSeq
    assert(reads.count(_.contains("text")) == 2,
      s"exactly the two increment scans may read text:\n${reads.mkString("\n")}")
    assert(reads.exists(r => r.contains("gh") && !r.contains("text")),
      s"the index scan must prune to the gram hash:\n${reads.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin"),
      s"the per-doc interval lists must broadcast onto the text scan:\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"))
    val shuffles = p.linesIterator.filter(_.trim.startsWith("Arguments: hashpartitioning")).toSeq
    assert(!shuffles.exists(_.contains("text")),
      s"document text must never shuffle:\n${shuffles.mkString("\n")}")
  }

  test("t53: classifier scoring is fused codegen kernels over one scan — no UDF, no shuffle before the sort") {
    // building the query runs fit() (30 driver-coordinated aggregate
    // rounds); the returned plan is the SCORING pass under the learned
    // weights — a pure row map, the shape that serves at any scale
    val p = plan("t53_quality_classifier")
    assert(!p.contains("ScalaUDF"), s"features must be native kernels:\n$p")
    assert(p.contains("quality_stats") && p.contains("repetition_stats") &&
      p.contains("stopword_hits"), s"the fused kernels must appear:\n$p")
    assert(nodeCount(p, "Scan parquet") == 1,
      s"scoring reads the corpus once:\n$p")
    // a row map: the only exchange is the deterministic output sort
    assert(nodeCount(p, "Exchange") <= 1,
      s"scoring must not shuffle:\n$p")
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(!read.contains("lang") && !read.contains("source"),
      s"scan must prune to (doc_id, text, n_chars): $read")
  }

  test("t54: PR sweep aggregates the corpus once; the cumulative window runs on bin rows only") {
    val p = plan("t54_classifier_pr")
    assert(!p.contains("ScalaUDF"))
    assert(nodeCount(p, "Scan parquet") == 1,
      s"the scored corpus is read once:\n$p")
    // corpus → bins is partial+final; everything after is ≤51 rows
    assert(nodeCount(p, "HashAggregate") >= 2,
      s"binning must be partial+final:\n$p")
    // the ONLY corpus-sized shuffle is the bin aggregation; the window
    // and output sort move bin rows
    val shuffles = p.linesIterator.filter(_.trim.startsWith("Arguments: hashpartitioning")).toSeq
    assert(!shuffles.exists(_.contains("text")),
      s"text never shuffles:\n${shuffles.mkString("\n")}")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("t59: html extraction is ONE kernel pass per row, no UDF, no shuffle but the sort") {
    val p = plan("t59_html_extract")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"))
    // the kernel expression is computed in exactly one Project; the
    // three consumers (line count, length, md5) reference its attribute
    assert("html_extract\\(".r.findAllIn(p).size == 1,
      s"kernel must run once per row:\n$p")
    assert(nodeCount(p, "Scan parquet") == 1)
    assert(nodeCount(p, "Exchange") <= 1, s"row map + output sort only:\n$p")
  }

  test("t60: per-language LM tables broadcast; corpus text never shuffles") {
    val p = plan("t60_lang_surprisal")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"LM joins must broadcast:\n$p")
    assert(nodeCount(p, "BroadcastHashJoin") == 4,
      s"four LM-side broadcast joins (bi, ctx, uni, tot):\n$p")
    val shuffles = p.linesIterator.filter(_.trim.startsWith("Arguments: hashpartitioning")).toSeq
    assert(!shuffles.exists(_.contains("text")),
      s"text never shuffles:\n${shuffles.mkString("\n")}")
  }

  test("t62: hashed-classifier serving is a shuffle-free row map — z once, no join") {
    val p = plan("t62_hashed_classifier")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"))
    assert(nodeCount(p, "Scan parquet") == 1, s"one corpus scan:\n$p")
    // exactly ONE Generate: the z-fold barrier — softsign + grid-floor
    // reference z several times and HOFs don't codegen, so an inlined
    // z would re-run the whole interpreted fold per reference
    assert(nodeCount(p, "Generate") == 1, s"one z barrier:\n$p")
    assert("aggregate\\(".r.findAllIn(p).size <= 2, // tree + detail render
      s"the z fold must appear once:\n$p")
    assert(nodeCount(p, "BroadcastHashJoin") == 0 && !p.contains("SortMergeJoin"),
      s"weights are a plan literal, not a join:\n$p")
    assert(nodeCount(p, "Exchange") <= 1, s"row map + output sort only:\n$p")
  }

  test("t64: line dedup is a pure row map — no explode, no join, no shuffle but the sort") {
    val p = plan("t64_dedup_lines")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"))
    assert(nodeCount(p, "Generate") == 0, s"first-occurrence filter runs inside the row:\n$p")
    assert(nodeCount(p, "Scan parquet") == 1)
    assert(nodeCount(p, "Exchange") <= 1, s"row map + output sort only:\n$p")
  }

  test("t65: the crawl pipeline is one scan, per-row stages, gates behind the Generate barrier") {
    val p = plan("t65_crawl_pipeline")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"))
    assert(nodeCount(p, "Scan parquet") == 1, s"one corpus scan:\n$p")
    // extraction runs once; the gate kernels live behind ONE Generate
    // (explode of the verdict struct) so the quality/lang filter can't
    // re-derive them into the scan
    assert("html_extract\\(".r.findAllIn(p).size == 1, s"extraction once per row:\n$p")
    assert(nodeCount(p, "Generate") == 2, s"extraction + verdict barriers:\n$p")
    assert(nodeCount(p, "Exchange") <= 1, s"row map + output sort only:\n$p")
  }

  test("q60: range layout — footer stats pruned the file list, residual predicate pushed down") {
    val p = plan("q60_range_layout")
    // the scan's file index holds ONLY the footer-surviving files: the
    // query build already asserts filesRead < filesTotal (it throws
    // otherwise), so reaching a plan at all proves the pruning — here
    // we pin that the residual range predicate ALSO reaches the
    // parquet reader (row-group min/max skipping inside kept files)
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(ts"),
      s"ts range must reach the parquet reader:\n$p")
    assert(nodeCount(p, "Scan parquet") == 1, s"one scan over kept files:\n$p")
    assert(nodeCount(p, "HashAggregate") >= 2, s"partial+final aggregate:\n$p")
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(!read.contains("props") && !read.contains("user_id"),
      s"scan must prune to (event_id, ts, event_type, value): $read")
  }

  test("t72: DSIR scoring is a shuffle-free fold over the checkpointed features") {
    val p = plan("t72_dsir_selection")
    // the feature table is localCheckpoint'd (one hash-kernel pass
    // feeds fit AND scoring); the scoring side must stay a pure row
    // map: the z fold kernel, no join, no Generate, and only the
    // output sort's Exchange
    assert(p.contains("hashed_z"), s"scoring must run the fused fold kernel:\n$p")
    assert(nodeCount(p, "Exchange") <= 1, s"row map + output sort only:\n$p")
    assert(!p.contains("Join"), s"scoring must not join:\n$p")
  }

  test("t74: unigram serving is one scan, one stats kernel, no shuffle but the sort") {
    val p = plan("t74_unigram_tokens")
    assert(p.contains("unigram_stats"), s"serving must run the fused DP kernel:\n$p")
    assert(nodeCount(p, "Scan parquet") == 1, s"one corpus scan:\n$p")
    assert(nodeCount(p, "Exchange") <= 1, s"row map + output sort only:\n$p")
    assert(!p.contains("Join"), s"serving must not join:\n$p")
    // the DP kernel sits behind ONE Generate barrier so the n_words
    // filter cannot re-derive it per reference (t17 precedent)
    assert(nodeCount(p, "Generate") == 1, s"kernel barrier missing:\n$p")
    assert("unigram_stats".r.findAllIn(p).size <= 2,
      s"stats kernel must not be re-derived per consumer:\n$p")
  }

  test("m10: PCM decode is one scan, one kernel, no shuffle but the sort") {
    val p = plan("m10_audio_pcm")
    assert(p.contains("pcm_stats"), s"decode must run the fused kernel:\n$p")
    assert(nodeCount(p, "Scan parquet") == 1, s"one scan:\n$p")
    assert(nodeCount(p, "Exchange") <= 1, s"row map + output sort only:\n$p")
    assert(!p.contains("Join"), s"decode must not join:\n$p")
  }

  test("q62: bloom lookup pushes the exact IN predicate into the kept-file scan") {
    val p = plan("q62_bloom_lookup")
    // the build itself asserts filesRead < filesTotal (bloom pruning);
    // here we pin that the residual IN predicate reaches the parquet
    // reader so kept files row-group-skip too
    assert(p.contains("PushedFilters") && p.contains("In(event_id"),
      s"IN list must reach the parquet reader:\n$p")
    assert(nodeCount(p, "Scan parquet") == 1, s"one scan over kept files:\n$p")
    val read = p.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(!read.contains("props") && !read.contains("user_id"),
      s"scan must prune to (event_id, event_type, value): $read")
  }
}
