package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.TextHash
import graft.functions.TextFunctions

/** Document deduplication for training-data pipelines, at 100 TB scale:
  *
  *  - [[exact]]: hash-groupBy on a content fingerprint. One shuffle keyed
  *    by a 128-bit md5 — uniformly distributed, no skew, map-side
  *    partial agg keeps the shuffle tiny.
  *  - [[minHashSignatures]] / [[minHashCandidatePairs]]: MinHash + LSH
  *    banding. Candidate generation is a self-join on (band, bandHash)
  *    buckets — the classic near-dup pipeline that avoids the O(n²)
  *    cross join entirely; only bucket-mates are compared.
  *  - [[simHashSignatures]] via [[simHash64]]: 64-bit SimHash over tokens
  *    (Hamming-space near-dup key).
  *  - [[ngramJaccard]]: exact shingle-set Jaccard for verifying candidate
  *    pairs (the "verify" stage after LSH "block").
  *
  * Hashing runs in the native [[graft.expressions.TextHash]] Catalyst
  * expressions — one fused kernel pass per row inside whole-stage
  * codegen. Documents with fewer than n tokens have an empty shingle
  * set: their signature is NULL and they can never appear in a
  * candidate pair (Jaccard against an empty set is 0).
  *
  * Every step is a narrow map or a keyed shuffle; nothing is collected.
  */
object Dedup {

  /** Exact dedup: keep the minimum id per content fingerprint.
    * Returns (fingerprint, keep_id, dup_count). */
  def exact(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    df.select(TextFunctions.fingerprint(textCol).as("fingerprint"), idCol.as("id"))
      .groupBy($"fingerprint")
      .agg(min($"id").as("keep_id"), count(lit(1)).as("dup_count"))

  /** (id, minhash[k]) signatures; minhash is NULL for docs with < n
    * tokens. */
  def minHashSignatures(df: DataFrame, textCol: Column, idCol: Column,
      n: Int = 3, k: Int = 16): DataFrame =
    df.select(idCol.as("id"), TextHash.minHashSig(textCol, n, k).as("minhash"))

  /** LSH banding: hash each of the k/rowsPerBand signature bands, bucket
    * docs by (band index, band hash), and emit candidate pairs (a < b)
    * that share ≥1 bucket. Skew-safe: bucket sizes are bounded by true
    * near-dup group sizes, not data volume; NULL band arrays (short
    * docs) explode to zero rows. */
  def minHashCandidatePairs(df: DataFrame, textCol: Column, idCol: Column,
      n: Int = 3, k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val banded = df.select(
      idCol.as("id"),
      posexplode(TextHash.minHashBands(textCol, n, k, rowsPerBand))
        .as(Seq("band", "band_hash")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash near-dup pairs with estimated Jaccard ≥ threshold:
    * LSH candidates verified by signature agreement fraction.
    *
    * Adversarial-skew defense ([[Collapse]]): normalize-identical
    * documents (mass-duplicated boilerplate) collapse to one
    * representative before banding, so the bucket self-join, candidate
    * dedup, and agreement verify are bounded by DISTINCT documents (and
    * the signature kernel runs once per distinct doc); member pairs
    * re-expand with the rep-level estimate. Output is row-identical to
    * the uncollapsed pipeline (SkewSpec). */
  def minHashPairs(df: DataFrame, textCol: Column, idCol: Column,
      n: Int = 3, k: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val rows = df.select(idCol.as("id"), textCol.as("text"))
    val (members, reps0) = Collapse.collapse(
      rows, TextFunctions.fingerprint($"text"), $"id", $"text")
    val repSigs = reps0.select($"rep",
      TextHash.minHashSig($"payload", n, k).as("minhash"), $"cnt")
    val banded = repSigs.select($"rep",
      posexplode(TextHash.bandHashes($"minhash", rowsPerBand)).as(Seq("band", "band_hash")))
    val a = banded.as("a")
    val b = banded.as("b")
    val repCand = a.join(b,
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.rep") < col("b.rep"))
      .select(col("a.rep").as("ra"), col("b.rep").as("rb"))
      .distinct()
    val cross = repCand
      .join(repSigs.select($"rep".as("ra"), $"minhash".as("mh_a")), "ra")
      .join(repSigs.select($"rep".as("rb"), $"minhash".as("mh_b")), "rb")
      .select($"ra", $"rb", round(TextHash.sigAgreement($"mh_a", $"mh_b"), 4).as("est_jaccard"))
      .filter($"est_jaccard" >= threshold)
    // intra-group pairs: signature-less (short) docs never band, so
    // identical short docs must NOT pair — same as uncollapsed
    val self = repSigs.filter($"cnt" > 1 && $"minhash".isNotNull)
      .select($"rep".as("ra"),
        round(TextHash.sigAgreement($"minhash", $"minhash"), 4).as("est_jaccard"))
      .filter($"est_jaccard" >= threshold)
    Collapse.expandPairs(cross, self, members, "est_jaccard")
  }

  /** MinHash-blocked near-dup pairs verified by EXACT n-gram Jaccard —
    * the production block+verify shape: LSH banding bounds the candidate
    * set (never O(n²)); the exact shingle-set Jaccard of each candidate
    * decides. Emits (id_a, id_b, jaccard ≥ threshold).
    *
    * Unlike [[minHashPairs]] (estimate-only), the output is independent
    * of the signature kernel given sufficient banding recall: with
    * k=32/rowsPerBand=2 (16 bands), a true pair at Jaccard j is missed
    * with probability (1−j²)^16 — 3e-12 at j = 0.9, 1e-5 at j = 0.7 —
    * so the result equals the all-pairs exact answer on any corpus whose
    * near-dups sit above the threshold with a margin.
    *
    * Adversarial-skew defense ([[Collapse]]): normalize-identical
    * documents collapse to one representative before banding — the
    * bucket self-join and the exact-Jaccard verify run over DISTINCT
    * documents only (one shingle-kernel evaluation per distinct PAIR,
    * never per member pair); member pairs re-expand with the rep-level
    * jaccard, which is exact because members share the normalized
    * shingle set the kernel computes. Row-identical to the uncollapsed
    * pipeline (SkewSpec). */
  def minHashPairsVerified(df: DataFrame, textCol: Column, idCol: Column,
      n: Int = 3, k: Int = 32, rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val rows = df.select(idCol.as("id"), textCol.as("text"))
    val (members, reps0) = Collapse.collapse(
      rows, TextFunctions.fingerprint($"text"), $"id", $"text")
    val reps = reps0.select($"rep", $"payload".as("text"), $"cnt")
    val banded = reps.select($"rep",
      posexplode(TextHash.minHashBands($"text", n, k, rowsPerBand)).as(Seq("band", "band_hash")))
    val a = banded.as("a")
    val b = banded.as("b")
    val repCand = a.join(b,
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.rep") < col("b.rep"))
      .select(col("a.rep").as("ra"), col("b.rep").as("rb"))
      .distinct()
    val texts = reps.select($"rep", $"text")
    val cross = repCand
      .join(texts.select($"rep".as("ra"), $"text".as("text_a")), "ra")
      .join(texts.select($"rep".as("rb"), $"text".as("text_b")), "rb")
      .select($"ra", $"rb", round(ngramJaccard($"text_a", $"text_b", n), 4).as("jaccard"))
      .filter($"jaccard" >= threshold)
    // intra-group: shingle-less docs never band (NULL signature) in the
    // uncollapsed pipeline, so gate on banding eligibility; for the
    // rest, jaccard(text, text) is the kernel's own self-similarity
    val self = reps.filter($"cnt" > 1)
      .filter(TextHash.minHashSig($"text", n, k).isNotNull)
      .select($"rep".as("ra"), round(ngramJaccard($"text", $"text", n), 4).as("jaccard"))
      .filter($"jaccard" >= threshold)
    Collapse.expandPairs(cross, self, members, "jaccard")
  }

  /** Persistent MinHash signature index: (id, minhash, band, band_hash),
    * one row per (doc, band) — the table an incremental dedup pipeline
    * writes ONCE per corpus snapshot and joins every new crawl batch
    * against. The text kernel runs exactly once per doc; band hashes
    * derive from the signature array ([[graft.expressions.TextHash.bandHashes]]
    * ≡ the fused text-side banding, parity-tested). At scale, write it
    * bucketed by band_hash so only the (small) new batch ever shuffles. */
  def minHashIndex(df: DataFrame, textCol: Column, idCol: Column,
      n: Int = 3, k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    // version the index with its parameters: column metadata rides the
    // schema through select/alias AND a parquet write/read round-trip
    // (Spark persists field metadata in the footer schema), so
    // incrementalNearDups can refuse an index built under different
    // banding instead of silently matching nothing
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.minhash.n", n.toLong)
      .putLong("graft.minhash.k", k.toLong)
      .putLong("graft.minhash.rowsPerBand", rowsPerBand.toLong)
      .build()
    df
      // explode(array(...)) barrier: the isNotNull filter consumes the
      // projected column instead of re-deriving the kernel below it
      // (t17 precedent; short docs surface as a NULL element and drop)
      .select(idCol.as("id"),
        explode(array(TextHash.minHashSig(textCol, n, k))).as("minhash"))
      .filter($"minhash".isNotNull)
      .select($"id", $"minhash".as("minhash", meta),
        posexplode(TextHash.bandHashes($"minhash", rowsPerBand)).as(Seq("band", "band_hash")))
  }

  /** INCREMENTAL near-dup detection: match a new batch against an
    * EXISTING corpus's prebuilt [[minHashIndex]] without ever touching
    * the old corpus text — the daily-crawl-increment shape. The new
    * batch computes its own index rows (one kernel pass over the NEW
    * docs only), equi-joins the stored index on (band, band_hash), and
    * verifies the deduped candidates by STORED-signature agreement
    * (the MinHash Jaccard estimate) — so the old corpus contributes
    * only its signature table, never a re-scan.
    *
    * The NEW side's signature (the small side — a daily increment)
    * rides the candidate join, so the text kernel runs exactly once
    * over the new batch (plan-gated); the OLD side stays bare ids
    * through the join and dedup, re-attaching its stored signature
    * afterwards from the index's (id, minhash) projection (in a
    * serving deployment that projection IS the signature store table —
    * the dropDuplicates exists only because the banded index carries
    * minhash per band row for self-containment).
    *
    * The index MUST have been built with the same (n, k, rowsPerBand).
    * [[minHashIndex]] stamps its parameters into the `minhash` column's
    * metadata (which survives the parquet round-trip), and this method
    * fails fast on any mismatch. An unstamped index (built elsewhere)
    * is accepted as-is — then a differing k still fails in the
    * agreement kernel (signature width mismatch), but a differing n or
    * banding would silently yield disjoint buckets, so prefer stamped
    * indexes.
    *
    * Output: (new_id, dup_of, est_jaccard ≥ threshold). */
  def incrementalNearDups(newDocs: DataFrame, textCol: Column, idCol: Column,
      index: DataFrame, n: Int = 3, k: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val idxMeta = index.schema.find(_.name == "minhash").map(_.metadata)
      .getOrElse(org.apache.spark.sql.types.Metadata.empty)
    for ((param, value) <- Seq("n" -> n, "k" -> k, "rowsPerBand" -> rowsPerBand)) {
      val key = s"graft.minhash.$param"
      if (idxMeta.contains(key))
        require(idxMeta.getLong(key) == value.toLong,
          s"incrementalNearDups: index was built with $param=${idxMeta.getLong(key)} " +
            s"but $param=$value was requested — rebuild the index or match its parameters")
    }
    val newIdx = minHashIndex(newDocs, textCol, idCol, n, k, rowsPerBand)
    val cand = newIdx.as("n")
      .join(index.as("o"),
        col("n.band") === col("o.band") && col("n.band_hash") === col("o.band_hash"))
      .select(col("n.id").as("new_id"), col("o.id").as("dup_of"),
        col("n.minhash").as("mh_n"))
      .dropDuplicates("new_id", "dup_of")
    val sigsOld = index.select($"id".as("dup_of"), $"minhash".as("mh_o"))
      .dropDuplicates("dup_of")
    cand
      .join(sigsOld, "dup_of")
      .select($"new_id", $"dup_of",
        round(TextHash.sigAgreement($"mh_n", $"mh_o"), 4).as("est_jaccard"))
      .filter($"est_jaccard" >= threshold)
  }

  /** Delete-aware view of a [[minHashIndex]]: serve the index MINUS a
    * takedown set — the signature-store rung of the delete ladder
    * (t36 tombstones the inverted index, v22/v23 the ANN buckets,
    * [[removeFromComponents]] the cluster table; without this one, a
    * new crawl doc would still match a deleted doc and resurrect it
    * as `dup_of`). The corpus-sized index streams through ONE
    * broadcast anti join against the takedown-sized id set — never
    * shuffled, parameter-stamp metadata preserved — so
    * [[incrementalNearDups]] over the view is row-identical to an
    * index rebuilt from the surviving corpus (DedupSpec asserts it).
    * In a persisted deployment the deleted-id set IS the tombstone
    * table the InvertedIndex layout keeps beside its data files;
    * compaction (rewriting the surviving rows) is the same
    * write-back step it uses. */
  def indexWithoutDeleted(index: DataFrame, deletedIds: DataFrame): DataFrame =
    index.join(broadcast(deletedIds.select($"id")), Seq("id"), "left_anti")

  /** 64-bit SimHash of the normalized tokens (sign of per-bit ±1 votes
    * from each token's 64-bit hash). */
  def simHash64(textCol: Column): Column = TextHash.simHash64(textCol)

  /** (id, simhash) signatures. */
  def simHashSignatures(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    df.select(idCol.as("id"), simHash64(textCol).as("simhash"))

  /** SimHash near-dup pairs within `maxHamming` bits: band each 64-bit
    * signature into four 16-bit chunks — by pigeonhole, any pair within
    * hamming distance ≤ 3 agrees on at least one whole band — self-join
    * on (band, chunk) buckets, then verify with the exact popcount of
    * the XOR. Same block+verify shape as MinHash-LSH: candidates are
    * bucket-mates only, never the O(n²) cross join. */
  /** Adversarial-skew defense ([[Collapse]]): normalize-identical
    * documents collapse before banding (bounded bucket self-join over
    * distinct docs; simhash kernel once per distinct doc); intra-group
    * pairs carry hamming 0 (xor of identical signatures) and cross
    * pairs the rep-level popcount. Row-identical to the uncollapsed
    * pipeline (SkewSpec). */
  def simHashPairs(df: DataFrame, textCol: Column, idCol: Column,
      maxHamming: Int = 3): DataFrame = {
    val rows = df.select(idCol.as("id"), textCol.as("text"))
    val (members, reps0) = Collapse.collapse(
      rows, TextFunctions.fingerprint($"text"), $"id", $"text")
    val repSigs = reps0.select($"rep",
      TextHash.simHash64($"payload").as("simhash"), $"cnt")
    val banded = repSigs.select($"rep", $"simhash",
      posexplode(array((0 until 4).map { b =>
        shiftright($"simhash", b * 16).bitwiseAND(lit(0xFFFFL))
      }: _*)).as(Seq("band", "chunk")))
    val a = banded.as("a")
    val b = banded.as("b")
    val cross = a.join(b,
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.rep") < col("b.rep"))
      .select(col("a.rep").as("ra"), col("b.rep").as("rb"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter($"hamming" <= maxHamming)
      .select($"ra", $"rb", $"hamming")
    // identical docs ⇒ identical signatures ⇒ hamming 0, always ≤ max;
    // null-text docs have a null simhash, never band, never pair
    val self = repSigs.filter($"cnt" > 1 && $"simhash".isNotNull)
      .select($"rep".as("ra"), lit(0).as("hamming"))
    Collapse.expandPairs(cross, self, members, "hamming")
  }

  /** Generic banded near-dup pairs over ANY 64-bit signature column
    * (SimHash, perceptual dHash, …): band each signature into four
    * 16-bit chunks — by pigeonhole, any pair within hamming ≤ 3 agrees
    * on at least one whole band, so recall is EXACT at the default
    * threshold — self-join on (band, chunk), verify by popcount of the
    * XOR. The [[simHashPairs]] block+verify shape with the signature
    * supplied by the caller instead of derived from text (m09 feeds
    * decoded-pixel dHashes through it). Candidates are bucket-mates
    * only — never the O(n²) cross join. Input `sigs`: (idCol, sigCol);
    * null signatures never band, never pair. Output:
    * (id_a, id_b, hamming), id_a < id_b. */
  def hamming64Pairs(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16 banding guarantees recall only to hamming 3, got $maxHamming")
    val banded = sigs
      .filter(col(sigCol).isNotNull)
      .select(col(idCol).as("id"), col(sigCol).as("sig"),
        posexplode(array((0 until 4).map { b =>
          shiftright(col(sigCol), b * 16).bitwiseAND(lit(0xFFFFL))
        }: _*)).as(Seq("band", "chunk")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** INCREMENTAL [[hamming64Pairs]] — the 100 TB ingestion shape: the
    * pairs a NEW shard of signatures completes against the stored
    * signature table, WITHOUT re-pairing the stored corpus against
    * itself. Each unordered pair is discovered exactly once, in the
    * batch its later member arrives in: the band join probes
    * (stored ∪ new) × new, so old–old pairs can never re-emit, a
    * new–new pair canonicalizes to one row, and an old–new pair exists
    * only while the new side is new. Folding this over any slicing of
    * the corpus yields exactly the one-shot [[hamming64Pairs]] set
    * (AudioFingerprintSpec pins the invariance; s33 is the streaming
    * consumer). Same 4×16-band pigeonhole guarantee: complete recall
    * to hamming ≤ 3. */
  def hamming64PairsIncrement(stored: DataFrame, fresh: DataFrame,
      idCol: String, sigCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16 banding guarantees recall only to hamming 3, got $maxHamming")
    def banded(df: DataFrame) = df
      .filter(col(sigCol).isNotNull)
      .select(col(idCol).as("id"), col(sigCol).as("sig"),
        posexplode(array((0 until 4).map { b =>
          shiftright(col(sigCol), b * 16).bitwiseAND(lit(0xFFFFL))
        }: _*)).as(Seq("band", "chunk")))
    val a = banded(stored.select(col(idCol), col(sigCol))
      .unionByName(fresh.select(col(idCol), col(sigCol)))).as("a")
    val b = banded(fresh).as("b")
    // hamming computed BEFORE the distinct: a new–new pair surfaces in
    // both orientations with sig_a/sig_b swapped, and only the
    // symmetric (id_a, id_b, hamming) triple collapses them to one row
    a.join(b,
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity of two text columns (distinct
    * word-n-gram shingle sets; 0.0 when both sets are empty). */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column =
    TextHash.ngramJaccard(a, b, n)

  /** Benchmark decontamination: for every corpus document, how many of
    * its distinct word-n-gram shingles appear ANYWHERE in the eval set
    * (the union of the eval documents' shingles) — the standard
    * "n-gram overlap" test run before training on scraped data, so
    * benchmark answers leaking into the corpus are caught and dropped.
    *
    * Output: (id, n_shingles, n_shared, contamination) per corpus doc;
    * `contamination` = n_shared / n_shingles (0 for shingle-less docs).
    *
    * Scale shape: eval sets are small (benchmark suites are MBs), so
    * their distinct shingle hashes BROADCAST; the corpus side is one
    * narrow pass (shingle kernel + explode) feeding a map-side
    * broadcast join, then a single keyed shuffle to re-aggregate per
    * document. The 100 TB corpus is never shuffled on content. */
  /** EXACT containment similarity join via PREFIX FILTERING (Bayardo
    * et al., "Scaling Up All Pairs Similarity Search", WWW 2007) —
    * unlike the MinHash families (t09/t25: probabilistic recall), the
    * blocking here is LOSSLESS: containment(a→b) = |S(a)∩S(b)|/|S(a)|
    * ≥ τ implies |S(a)\S(b)| ≤ (1−τ)·|S(a)|, so by pigeonhole at least
    * one of a's ⌊(1−τ)·na⌋+1 smallest shingle hashes (GLOBAL hash
    * order) appears in S(b) — probing only those prefixes against the
    * full shingle index finds EVERY qualifying pair. Containment (not
    * Jaccard) is the asymmetric measure that catches a small document
    * quoted inside a much larger one, where Jaccard is near zero.
    *
    * Determinism: the verify threshold is pure integer arithmetic
    * (inter·q ≥ na·p for τ = p/q) — no float anywhere in the decision;
    * the emitted containment rounds to 4 dp. Orientation: pairs emit
    * small→big (na < nb, ties by id).
    *
    * Scale shape: one shingle-kernel pass into a narrow checkpointed
    * (id, ns, sorted-hashes) table; the probe side explodes ONLY
    * prefixes (≈(1−τ) of each doc's shingles), the index side is the
    * usual posting explode; candidates dedup on bare id pairs and the
    * verify joins sets back by id — text never shuffles, and the
    * candidate count is output-bounded plus prefix collisions, never
    * all-pairs. */
  def containmentJoin(docs: DataFrame, textCol: Column, idCol: Column,
      n: Int = 3, tauP: Int = 7, tauQ: Int = 10): DataFrame = {
    require(tauP > 0 && tauP <= tauQ, s"tau must be in (0,1]: $tauP/$tauQ")
    val base = containmentFeatures(docs, textCol, idCol, n).localCheckpoint()
    // prefix length ⌊(1−τ)·na⌋+1 in EXACT integer arithmetic:
    // ((q−p)·na) div q + 1 — a float ⌊0.3·na⌋ can round one short and
    // silently break the losslessness guarantee
    val prefix = base.select($"id".as("a"), $"ns".as("na"),
      explode(slice($"shs", lit(1), prefixLen($"ns", tauP, tauQ))).as("sh"))
    val index = base.select($"id".as("b"), $"ns".as("nb"), explode($"shs").as("sh"))
    val cands = prefix.join(index, Seq("sh"))
      .filter($"a" =!= $"b" && ($"na" < $"nb" || ($"na" === $"nb" && $"a" < $"b")))
      .select($"a", $"b").distinct()
    cands
      .join(base.select($"id".as("a"), $"ns".as("na"), $"shs".as("sa")), Seq("a"))
      .join(base.select($"id".as("b"), $"shs".as("sb")), Seq("b"))
      .select($"a", $"b", $"na", size(array_intersect($"sa", $"sb")).as("inter"))
      .filter($"inter" * tauQ >= $"na" * tauP)
      .select($"a".as("small_id"), $"b".as("big_id"),
        round($"inter".cast("double") / $"na" + 1e-9, 4).as("containment"))
  }

  /** Prefix length ⌊(1−p/q)·ns⌋+1 as GENUINE integer arithmetic: the
    * SQL `div` operator on a BIGINT product, not a double division
    * whose exactness would silently depend on (q−p)·ns < 2⁵². */
  private def prefixLen(ns: Column, tauP: Int, tauQ: Int): Column =
    (call_function("div",
      ns.cast("long") * lit((tauQ - tauP).toLong), lit(tauQ.toLong)) + lit(1L))
      .cast("int")

  /** The (id, ns, sorted-shingle-hashes) feature table
    * [[containmentJoin]] and its incremental form build on — ONE
    * kernel pass over the text; everything downstream is id/hash
    * arithmetic. */
  def containmentFeatures(docs: DataFrame, textCol: Column, idCol: Column,
      n: Int): DataFrame =
    docs
      .select(idCol.as("id"),
        sort_array(array_distinct(TextHash.shingleHashes(textCol, n))).as("shs"))
      .select($"id", size($"shs").as("ns"), $"shs")
      .filter($"ns" > 0)

  /** [[containmentJoin]] made INCREMENTAL: the new batch joins against
    * a STORED feature table (the t25/t51 stored-corpus-index idiom —
    * old text never re-scanned), emitting only pairs with exactly one
    * new side. Losslessness needs BOTH probe directions (containment
    * is asymmetric — the small side's prefix must do the probing, and
    * either side can be the small one): new-prefix ⋈ stored-postings
    * AND stored-prefix ⋈ new-postings. Old↔old pairs are never probed
    * (the stored side's prefixes only meet the batch's postings), so
    * per-batch cost scales with the batch, not the corpus. */
  def incrementalContainment(newDocs: DataFrame, textCol: Column, idCol: Column,
      stored: DataFrame, n: Int = 3, tauP: Int = 7, tauQ: Int = 10): DataFrame = {
    require(tauP > 0 && tauP <= tauQ, s"tau must be in (0,1]: $tauP/$tauQ")
    val nb = containmentFeatures(newDocs, textCol, idCol, n).localCheckpoint()
    def prefixOf(df: DataFrame) = df.select($"id".as("a"), $"ns".as("na"),
      explode(slice($"shs", lit(1), prefixLen($"ns", tauP, tauQ))).as("sh"))
    def postOf(df: DataFrame) = df.select($"id".as("b"), $"ns".as("nb"),
      explode($"shs").as("sh"))
    val cands = prefixOf(nb).join(postOf(stored), Seq("sh"))
      .select($"a", $"na", $"b", $"nb")
      .unionByName(prefixOf(stored).join(postOf(nb), Seq("sh"))
        .select($"a", $"na", $"b", $"nb"))
      .filter($"a" =!= $"b" && ($"na" < $"nb" || ($"na" === $"nb" && $"a" < $"b")))
      .select($"a", $"b").distinct()
    val all = nb.unionByName(stored.select($"id", $"ns", $"shs"))
    cands
      .join(all.select($"id".as("a"), $"ns".as("na"), $"shs".as("sa")), Seq("a"))
      .join(all.select($"id".as("b"), $"shs".as("sb")), Seq("b"))
      .select($"a", $"b", $"na", size(array_intersect($"sa", $"sb")).as("inter"))
      .filter($"inter" * tauQ >= $"na" * tauP)
      .select($"a".as("small_id"), $"b".as("big_id"),
        round($"inter".cast("double") / $"na" + 1e-9, 4).as("containment"))
  }

  def contamination(corpus: DataFrame, evalSet: DataFrame,
      textCol: Column, idCol: Column, n: Int = 8): DataFrame = {
    val shingles = array_distinct(TextHash.shingleHashes(textCol, n))
    val evalShingles = evalSet
      .select(explode(shingles).as("sh"))
      .distinct()
      .withColumn("hit", lit(1))
    corpus
      // two-step projection: size() and explode_outer() in ONE select
      // would each inline the shingle expression — the kernel would run
      // twice per row; materializing the array below the Generate runs
      // it once (CollapseProject does not merge through Generate)
      .select(idCol.as("id"), shingles.as("shs"))
      .select($"id", size($"shs").as("n_shingles"), explode_outer($"shs").as("sh"))
      .join(broadcast(evalShingles), Seq("sh"), "left")
      .groupBy($"id")
      .agg(
        first($"n_shingles").as("n_shingles"),
        sum(coalesce($"hit", lit(0))).as("n_shared"))
      .select($"id", $"n_shingles", $"n_shared",
        round($"n_shared".cast("double") / greatest($"n_shingles", lit(1)), 4)
          .as("contamination"))
  }

  /** Per-(eval item, corpus doc) contamination AUDIT — the reverse of
    * [[contamination]]'s removal verdict: which benchmark items leak
    * into which training documents, and how much of each ITEM is
    * covered (`overlap_frac` = shared / the eval item's shingle count
    * — the retraction-priority metric). Output: (eval_id, id,
    * n_shared, overlap_frac), only pairs sharing ≥1 n-gram. The eval
    * side is benchmark-sized and broadcasts its exploded shingles WITH
    * per-item sizes; the corpus runs one kernel pass, and the join
    * output carries bare id pairs — document text never shuffles. */
  def contaminationReport(corpus: DataFrame, evalSet: DataFrame,
      textCol: Column, idCol: Column, n: Int = 8): DataFrame =
    contaminationReportFromShingles(
      contaminationShingles(corpus, textCol, idCol, n),
      contaminationShingles(evalSet, textCol, idCol, n))

  /** The per-doc shingle stage of [[contaminationReport]], factored so
    * a streaming fold can pay the text kernel per arriving batch and
    * persist only these narrow (id, shs) rows as state (s35's
    * contamination leg — text dies inside the micro-batch). */
  def contaminationShingles(df: DataFrame, textCol: Column, idCol: Column,
      n: Int = 8): DataFrame =
    df.select(idCol.as("id"),
      array_distinct(TextHash.shingleHashes(textCol, n)).as("shs"))

  /** [[contaminationReport]]'s join stage over pre-computed
    * [[contaminationShingles]] rows. */
  def contaminationReportFromShingles(corpusSh: DataFrame,
      evalSh: DataFrame): DataFrame = {
    // explode_outer on BOTH sides: plain explode implies a
    // size(·) > 0 pre-condition that pushdown re-derives the kernel
    // into (the t17 gotcha); the outer variant has no such condition,
    // and its null rows drop in the equi-join for free
    val ev = evalSh
      .select($"id".as("eval_id"), size($"shs").as("eval_shingles"),
        explode_outer($"shs").as("sh"))
    corpusSh
      .select($"id", explode_outer($"shs").as("sh"))
      .join(broadcast(ev), "sh")
      .groupBy($"eval_id", $"id")
      .agg(first($"eval_shingles").as("eval_shingles"), count(lit(1)).as("shared"))
      .select($"eval_id", $"id", $"shared".cast("long").as("n_shared"),
        round($"shared".cast("double") / $"eval_shingles", 4).as("overlap_frac"))
  }

  /** Connected components over near-dup PAIRS — the step that turns
    * pairwise matches into DEDUP CLUSTERS with one representative each
    * (real pipelines drop all but one member per component, not one per
    * pair: pairs (a,b),(b,c) must collapse to ONE kept doc, which
    * pairwise keep-the-min gets wrong when a–c was never emitted).
    *
    * Input: (id_a, id_b) undirected edges. Output: (id, rep) for every
    * endpoint, rep = min id of its component.
    *
    * Algorithm: alternating large-star/small-star contraction (Kiveris
    * et al., "Connected Components in MapReduce and Beyond") — each
    * round re-points edges at local minima, roughly halving every path,
    * so convergence is O(log d) rounds for diameter d instead of the
    * O(d) of plain min-label propagation: a million-link chain settles
    * in ~20 rounds. Each phase is one keyed aggregation + one join —
    * no driver-side graph state; the driver loop only checks the
    * scalar changed-edge count. Edge tables persist across rounds and
    * unpersist as they are superseded (lineage would otherwise double
    * per round). The fixed point is a star forest: every node points
    * directly at its component's min id.
    *
    *  - large-star: for every node u with neighborhood N(u), connect
    *    each strictly-larger neighbor to m = min(N(u) ∪ u);
    *  - small-star: orient edges high→low, connect each neighbor
    *    (and u itself) to the minimum. */
  /** One large-star round over (src, dst) edges — package-private so
    * the ProfCC profiling tool drives the REAL implementation, not a
    * copy that could drift. */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select($"dst".as("src"), $"src".as("dst")))
    val mins = sym.groupBy($"src").agg(min($"dst").as("mn"))
      .select($"src", least($"mn", $"src").as("m"))
    sym.join(mins, "src")
      .filter($"dst" > $"src")
      .select($"dst".as("src"), $"m".as("dst"))
      .distinct()
  }

  /** One small-star round — see [[largeStar]]. */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest($"src", $"dst").as("src"), least($"src", $"dst").as("dst"))
      .filter($"src" =!= $"dst")
    val mins = dir.groupBy($"src").agg(min($"dst").as("m"))
    dir.join(mins, "src")
      .select($"dst".as("src"), $"m".as("dst"))
      .filter($"src" =!= $"dst")
      .union(mins.select($"src", $"m".as("dst")))
      .distinct()
  }

  /** A distinct (src, dst) edge set is a fixed point of the alternating
    * star contraction iff it is a low-rooted flat functional star
    * forest: every edge has src > dst (child above root — also rejects
    * self-edges), no node appears as src twice (each child has one
    * root), and no node is both a src and a dst (trees have height 1).
    *
    * Sufficiency proof (the direction the loop relies on): such a set
    * is a union of trees {(v_i, r)} with r < v_i, v_i distinct, r
    * never a src. largeStar: the symmetrized neighborhood of r is
    * {v_i} so m(r) = r, and N(v_i) = {r} with r < v_i so v_i emits
    * nothing — output {(v_i, r)}, unchanged. smallStar: every edge is
    * already high→low, each v_i's min neighbor is r — output
    * {(v_i, r)}, unchanged. Necessity is not assumed: a non-star
    * fixed point (impossible for star contraction, but the loop does
    * not lean on that theorem) would simply keep iterating unchanged
    * until maxRounds and throw loudly, never return wrong labels.
    *
    * Checking this is ONE narrow aggregation over the endpoints (a
    * single shuffle of (node, bit) rows) versus the full large+small
    * star round (~6 shuffles + an eager materialization) the round-13
    * loop spent to observe "nothing changed" — the confirmation round
    * every invocation paid exactly once, at the end. */
  private[graft] def isStarForest(e: DataFrame): Boolean =
    e.select($"src".as("n"), lit(1L).as("s"), lit(0L).as("d"),
        when($"src" <= $"dst", 1L).otherwise(0L).as("bad"))
      .union(e.select($"dst".as("n"), lit(0L).as("s"), lit(1L).as("d"), lit(0L).as("bad")))
      .groupBy($"n").agg(sum($"s").as("ns"), sum($"d").as("nd"), sum($"bad").as("nbad"))
      .filter($"nbad" > 0 || $"ns" > 1 || ($"ns" > 0 && $"nd" > 0))
      .isEmpty

  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    // Per-round lineage cut via EAGER localCheckpoint: each star phase
    // multiplies the logical plan (self-union + join re-reference the
    // round's tree ~10×), and Catalyst re-analyzes the WHOLE
    // accumulated tree every round BEFORE cache substitution can
    // truncate it — measured exponential per-round slowdown by round 3
    // under persist() alone. Checkpointing materializes each round
    // into RDD blocks and replaces its plan with a constant-size
    // LogicalRDD, so analysis cost stays flat; superseded rounds'
    // blocks are freed by the ContextCleaner once their DataFrame
    // reference drops (unlike persist(), which pins entries in the
    // session cache manager until unpersist).
    //
    // The input pair pipeline (often an expensive near-dup plan)
    // materializes exactly ONCE, at edges0; `nodes` (every endpoint
    // must surface even after the star contraction consumes its
    // edges — roots appear only as dst) reads those blocks instead of
    // re-running the pipeline. Self-pairs stay in edges0 so their
    // endpoints reach `nodes`; the star phases drop self-edges
    // internally (dst > src / src =!= dst).
    val edges0 = pairs.select($"id_a".as("src"), $"id_b".as("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = edges0.select($"src".as("id")).union(edges0.select($"dst".as("id")))
      .distinct()
    var edges = edges0
    var round = 0
    // Convergence = the edge set IS a star forest ([[isStarForest]]),
    // checked on each round's OUTPUT — detecting the fixed point the
    // round it is produced instead of running one more full round to
    // observe an unchanged edge set (the round-13 loop's count +
    // exceptAll confirmation). The round-0 check also lets an input
    // that is already a star forest (incremental maintenance folding
    // an already-contracted increment) skip contraction entirely.
    var converged = isStarForest(edges0)
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      converged = isStarForest(next)
      edges = next
      round += 1
    }
    // no silent caps: exiting unconverged would return a non-star
    // edge set whose targets are not component minima — wrong
    // clusters, silently. 50 rounds covers any graph representable
    // in 64-bit ids (O(log d)); hitting the cap means a logic error,
    // not a deep corpus.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxRounds star rounds — " +
        "this exceeds the O(log diameter) bound for any practical graph")
    // slf4j, not println: stdout belongs to the harness contracts
    // (Bench's last line must be the parseable JSON artifact) and
    // library operators must not write into it
    org.slf4j.LoggerFactory.getLogger(getClass)
      .info(s"connectedComponents: converged in $round large/small-star rounds")
    val labels = nodes
      .join(edges.select($"src".as("id"), $"dst".as("rep")), Seq("id"), "left")
      .select($"id", coalesce($"rep", $"id").as("rep"))
    labels.localCheckpoint(true)
  }

  /** INCREMENTAL connected-components maintenance: merge a new batch's
    * near-dup pairs into a STORED components table without re-clustering
    * the corpus — the missing rung between [[incrementalNearDups]]
    * (which finds a crawl increment's pairs against the stored
    * signature index) and [[connectedComponents]] (which would
    * otherwise re-run star contraction over every pair ever seen).
    *
    * Input:
    *  - `stored` — (id, rep) as produced by [[connectedComponents]]:
    *    a star forest whose rep is each component's MIN member id
    *    (every clustered doc has a row, including the rep itself).
    *    That minimality is the correctness precondition: it makes a
    *    component's label recoverable from its rep alone.
    *  - `newPairs` — (id_a, id_b) undirected edges from the increment:
    *    new–new pairs and new–old pairs (old–old edges are already
    *    folded into `stored`; passing extra ones is harmless).
    *
    * Output: (id, rep) over endpoints(stored) ∪ endpoints(newPairs),
    * row-identical to `connectedComponents(storedPairs ∪ newPairs)`
    * (IncrementalComponentsSpec asserts the equality, including the
    * bridge case where one new edge merges two stored clusters).
    *
    * Why it is equal: contracting each stored component to its rep
    * preserves connectivity, and because every rep is its component's
    * min id, the min node of a merged component in the contracted
    * graph IS the min member id of the merged component in the full
    * graph. So star contraction over the BATCH-SIZED contracted graph
    * yields exactly the labels a full recompute would.
    *
    * Scale shape — the whole point: the stored table (corpus-sized,
    * served from parquet) is never shuffled. It is scanned twice, both
    * times as the streamed side of a broadcast hash join against
    * batch-sized build sides: once to look up the touched endpoints'
    * stored reps, once to apply the rep→rep relabel map. The star
    * contraction runs only on the contracted increment graph —
    * O(batch) edges — regardless of corpus size. With daily crawls at
    * 100 TB this turns clustering from a full-corpus O(log d) shuffle
    * cascade per day into a per-increment cost. */
  /** The contracted-increment pieces shared by [[mergeComponents]] and
    * payload-bearing folds ([[SemDedup.foldStep]]): the increment's
    * touched endpoints, their stored reps, and the star contraction of
    * the CONTRACTED increment graph. One definition so the merge
    * algebra (and its broadcast-only scale shape) cannot drift between
    * the bare and payload-carrying folds. */
  private[graft] final case class ContractedMerge(
      touched: DataFrame, storedTouched: DataFrame, sub: DataFrame) {
    /** Relabel map keyed by stored rep. A contracted node is either a
      * stored rep or an id absent from stored entirely (never a
      * non-rep stored member — those were rewritten to their rep), so
      * joining on rep touches exactly the merged components. */
    def repMap: DataFrame =
      sub.select(col("id").as("rep"), col("rep").as("new_rep"))
  }

  private[graft] def contractedMerge(stored: DataFrame,
      newPairs: DataFrame): ContractedMerge = {
    // the increment's pair pipeline (typically incrementalNearDups +
    // a new-new banding pass) is expensive and referenced 3× below —
    // materialize once (Collapse's eager-checkpoint idiom)
    val p = newPairs.select($"id_a", $"id_b").distinct().localCheckpoint(true)
    val touched = p.select($"id_a".as("id")).union(p.select($"id_b".as("id")))
      .distinct()
    // stored reps of the touched endpoints: INNER broadcast join with
    // the batch-sized `touched` as the build side — the corpus-sized
    // stored table streams map-side, no shuffle. Endpoints absent from
    // stored (new docs, or old docs that were never clustered) simply
    // miss here and fall through coalesce() below as themselves.
    val storedTouched = stored.select($"id", $"rep")
      .join(broadcast(touched), "id")
      .localCheckpoint(true)
    // contract: rewrite each new edge onto stored reps (or the raw id
    // when unclustered) — both joins are small × small
    val ra = storedTouched.select($"id".as("id_a"), $"rep".as("rep_a"))
    val rb = storedTouched.select($"id".as("id_b"), $"rep".as("rep_b"))
    val contracted = p
      .join(ra, Seq("id_a"), "left")
      .join(rb, Seq("id_b"), "left")
      .select(coalesce($"rep_a", $"id_a").as("id_a"),
        coalesce($"rep_b", $"id_b").as("id_b"))
    // cluster the contracted increment graph: O(batch) nodes — the
    // only star contraction in the whole maintenance pass. Nodes are
    // touched stored reps ∪ unclustered endpoints; self-pairs survive
    // distinct() so isolated contracted nodes still surface.
    ContractedMerge(touched, storedTouched, connectedComponents(contracted))
  }

  def mergeComponents(stored: DataFrame, newPairs: DataFrame): DataFrame = {
    val cm = contractedMerge(stored, newPairs)
    val updated = stored.select($"id", $"rep")
      .join(broadcast(cm.repMap), Seq("rep"), "left")
      .select($"id", coalesce($"new_rep", $"rep").as("rep"))
    // endpoints not in stored gain their first label from `sub`; every
    // frame here is batch-sized, so both joins broadcast their build
    // side — the only shuffle in the whole merge is the increment's
    // endpoint-distinct aggregation
    val fresh = cm.touched
      .join(broadcast(cm.storedTouched.select($"id")), Seq("id"), "left_anti")
      .join(broadcast(cm.sub), Seq("id"))
      .select($"id", $"rep")
    updated.unionByName(fresh)
  }

  /** DELETE-aware connected-components maintenance — the inverse rung
    * of [[mergeComponents]]: removing documents (takedown requests,
    * robots retractions) from a STORED components table. Deletion is
    * strictly harder than insertion: dropping a doc can SPLIT its
    * component (it may be the only bridge between two halves), which
    * min-label merging cannot express — so the touched components are
    * re-clustered from their SURVIVING verified pairs, and only they.
    *
    * Input:
    *  - `stored` — (id, rep), a min-rep star forest that is EXACTLY
    *    `connectedComponents(pairs)` (same precondition family as
    *    [[mergeComponents]]; its own output qualifies, so deletes and
    *    merges fold in any order).
    *  - `deletedIds` — (id) documents to remove. Ids absent from
    *    `stored` are no-ops.
    *  - `pairs` — (id_a, id_b) the verified-pair log that built
    *    `stored` (the edge table a production pipeline persists
    *    alongside the components; extra already-folded edges are
    *    harmless, MISSING ones are not — connectivity is re-derived
    *    from this log).
    *
    * Output: (id, rep) row-identical to
    * `connectedComponents(pairs among surviving docs)` —
    * components containing no deleted doc pass through byte-for-byte;
    * touched components are re-clustered, and a survivor whose every
    * pair partner was deleted DROPS out (exactly as a from-scratch
    * rebuild would drop a doc that no longer appears in any pair).
    * IncrementalComponentsSpec asserts the equality, including the
    * cluster-split and rep-deletion cases.
    *
    * Why touched-only is sound: deleting a doc removes only edges
    * incident to it, and every such edge lies inside the doc's own
    * component — connectivity (and the min member) of every other
    * component is untouched.
    *
    * Scale shape: `deletedIds` is takedown-sized; the touched member
    * set is a small multiple of it. The corpus-sized `stored` table
    * streams through ONE broadcast anti join (drop touched components)
    * and the corpus-sized `pairs` log streams through TWO broadcast
    * semi joins (induce the surviving subgraph) — neither ever
    * shuffles, exactly the mergeComponents discipline. The star
    * contraction runs on the induced touched-component subgraph only.
    * A delete batch too large to broadcast (a mass purge, not a
    * takedown) is the signal to re-run [[connectedComponents]] from
    * the surviving pair log instead. The same caveat applies to the
    * TOUCHED-COMPONENT size, not just the delete batch: `surviving`
    * is bounded by the touched components' total membership, so
    * deleting one doc from a pathological mega-component (pervasive
    * boilerplate that [[Collapse]] didn't pre-fold) broadcasts that
    * whole component — if `surviving` exceeds the broadcast budget,
    * fall back to shuffle joins for this batch (drop the
    * `broadcast()` hints) or re-run [[connectedComponents]]. */
  def removeFromComponents(stored: DataFrame, deletedIds: DataFrame,
      pairs: DataFrame): DataFrame = {
    val del = deletedIds.select($"id").distinct().localCheckpoint(true)
    // reps of every component losing at least one member — the touched
    // set. INNER broadcast join: stored streams, del is the build side.
    val deletedReps = stored.join(broadcast(del), "id")
      .select($"rep").distinct().localCheckpoint(true)
    // surviving members of touched components (delete-proportional)
    val surviving = stored.join(broadcast(deletedReps), "rep")
      .select($"id")
      .join(broadcast(del), Seq("id"), "left_anti")
      .localCheckpoint(true)
    // induced subgraph: pairs with BOTH endpoints surviving members of
    // a touched component. The pair log streams map-side through two
    // broadcast semi joins — pairs between untouched docs fall out at
    // the first join (their components carry no deleted member, so
    // neither endpoint is in `surviving`).
    val induced = pairs.select($"id_a", $"id_b")
      .join(broadcast(surviving.select($"id".as("id_a"))), Seq("id_a"), "left_semi")
      .join(broadcast(surviving.select($"id".as("id_b"))), Seq("id_b"), "left_semi")
      .select($"id_a", $"id_b")
    // re-cluster ONLY the touched components' survivors; docs isolated
    // by the delete no longer appear in any pair and drop out here,
    // matching the full-recompute domain
    val sub = connectedComponents(induced)
    val untouched = stored
      .join(broadcast(deletedReps), Seq("rep"), "left_anti")
      .select($"id", $"rep")
    untouched.unionByName(sub.select($"id", $"rep"))
  }

  /** Canonical-document selection — the step every dedup pipeline ends
    * with: of each near-dup cluster, KEEP exactly the best-scoring
    * member (ties to the lowest id) and drop the rest; documents in no
    * cluster keep themselves. Pairwise keep-the-min is wrong here for
    * the same reason [[connectedComponents]] exists: (a,b),(b,c) must
    * keep ONE of {a,b,c}, and the kept one should be the best, not the
    * lowest-id (RefinedWeb/Dolma keep the longest/highest-quality
    * member, not an arbitrary one).
    *
    * Input: `scored` = (idCol, scoreCol) per document; `pairs` =
    * verified near-dup edges (id_a, id_b). Output: (id, cluster,
    * score, keep) for EVERY input document — cluster = component min
    * id (own id for singletons), keep = 1 on the kept member.
    *
    * Scale shape: the argmax window runs ONLY over the clustered
    * subset (components ⨝ scores — proportional to the duplicate
    * fraction, not the corpus); singletons take the keep=1 branch via
    * a left anti-ish join and never shuffle into a window. The final
    * joins are keyed on id/cluster — narrow rows, no content. */
  def canonicalPerCluster(scored: DataFrame, idCol: Column, scoreCol: Column,
      pairs: DataFrame): DataFrame =
    canonicalPerClusterOnComponents(scored, idCol, scoreCol, connectedComponents(pairs))

  /** [[canonicalPerCluster]] over a PREBUILT components frame
    * ([[connectedComponents]]'s (id, rep) output) — the production
    * shape when several consumers (canonical selection, leakage-safe
    * splits, cluster stats) share one clustering: compute the
    * components ONCE, reuse the materialized table, instead of each
    * consumer re-running the star-contraction loop. */
  def canonicalPerClusterOnComponents(scored: DataFrame, idCol: Column,
      scoreCol: Column, components: DataFrame): DataFrame = {
    // eager localCheckpoint (Collapse's idiom): the scored base is
    // consumed twice (the clustered-subset argmax AND the final
    // verdict join); as a plain plan each reference re-scans the
    // corpus and re-runs the score kernel — at 100 TB that is two
    // full text passes where one narrow (id, score) materialization
    // suffices.
    val base = scored.select(idCol.as("id"), scoreCol.as("score"))
      .localCheckpoint(true)
    val comp = components
    val clustered = comp.join(base, "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"rep").orderBy($"score".desc, $"id")
    val best = clustered
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"rep", $"id".as("best_id"))
    base
      .join(comp, Seq("id"), "left")
      .join(best, Seq("rep"), "left")
      .select($"id", coalesce($"rep", $"id").as("cluster"), $"score",
        when($"rep".isNull || $"id" === $"best_id", 1).otherwise(0)
          .cast("int").as("keep"))
  }

  /** Passage-level dedup (the CCNet/Dolma line-dedup discipline applied
    * to token windows): each document splits into NON-overlapping
    * `passageTokens`-token passages; across the whole corpus only the
    * FIRST occurrence of each distinct passage (minimum (id, p_idx))
    * survives, and every document is re-assembled from its surviving
    * passages in order. Output: one row per document —
    * (id, n_passages INT, n_kept INT, clean STRING) where `clean` is
    * the re-assembled text ('' when every passage was seen earlier).
    *
    * Scale shape (the reason this is NOT a window over passage text):
    *  - first-occurrence election is a partial+final `min(struct(id,
    *    p_idx))` keyed by the 128-bit passage fingerprint — map-side
    *    combine collapses a mass-duplicated boilerplate passage to one
    *    row per map task, so a 10M-copy passage costs 10M rows in a
    *    single reducer under `row_number() OVER (PARTITION BY passage)`
    *    but only ~one row per task here; no skew, and the shuffle
    *    carries (fp, id, p_idx) — never text.
    *  - document text moves exactly ONCE: the keep-index sets (tiny int
    *    arrays) join back by id against the un-exploded document rows,
    *    and re-assembly is an index-filter HOF inside the same stage —
    *    passages are never exploded on the text path at all.
    */
  def passageDedup(df: DataFrame, textCol: Column, idCol: Column,
      passageTokens: Int = 10): DataFrame = {
    val P = passageTokens
    require(P > 0, s"passageTokens must be positive: $P")
    val toks = TextFunctions.tokens(textCol)
    val np = greatest(ceil(size(toks).cast("double") / P).cast("int"), lit(1))
    val passages = transform(sequence(lit(0), np - 1),
      i => array_join(slice(toks, i * P + 1, lit(P)), " "))
    // One kernel pass per document; both branches below (the narrow
    // fingerprint stream AND the keep-set join) consume this. As a
    // plain plan each branch would re-scan the source and re-run the
    // normalize+split kernel — at 100 TB that is two full text passes
    // where one materialization suffices (eager localCheckpoint, the
    // Collapse idiom).
    val docs = df.select(idCol.as("id"), passages.as("passages"))
      .localCheckpoint(true)
    // Narrow fingerprint stream: (id, p_idx, fp) — no text beyond here.
    val fps = docs.select($"id",
      posexplode(transform($"passages", p => md5(p.cast("binary"))))
        .as(Seq("p_idx", "fp")))
    val keepers = fps.groupBy($"fp")
      .agg(min(struct($"id", $"p_idx")).as("first"))
      .select($"first.id".as("id"), $"first.p_idx".as("p_idx"))
    val keepSets = keepers.groupBy($"id")
      .agg(collect_list($"p_idx").as("keep_idx"))
    docs.join(keepSets, Seq("id"), "left")
      .select($"id", $"passages",
        coalesce($"keep_idx", array().cast("array<int>")).as("ki"))
      .select($"id",
        size($"passages").cast("int").as("n_passages"),
        size($"ki").cast("int").as("n_kept"),
        array_join(filter($"passages", (_, i) => array_contains($"ki", i)), " ")
          .as("clean"))
  }

  /** Leakage-safe train/val/test split: assignment is keyed on the
    * near-dup CLUSTER (connected component of verified MinHash pairs),
    * not the document — every member of a near-dup family lands in the
    * same split, so a validation document can never have a near-copy in
    * train (the contamination a doc-keyed random split silently
    * creates). Singletons are their own cluster. The assignment is the
    * md5-bucket primitive (t17/q25): first hex char of md5(cluster) —
    * '0' → val, '1' → test, else train (6.25% / 6.25% / 87.5%) —
    * deterministic across runs, engines, and partitionings; no RNG, no
    * shuffle beyond the clustering itself. Output: (id, cluster, split)
    * for every input document. */
  def leakageSafeSplit(df: DataFrame, textCol: Column, idCol: Column,
      threshold: Double = 0.5): DataFrame = {
    val pairs = minHashPairsVerified(df, textCol, idCol, threshold = threshold)
    leakageSafeSplitOnComponents(df, idCol,
      connectedComponents(pairs.select($"id_a", $"id_b")))
  }

  /** [[leakageSafeSplit]] over a PREBUILT components frame — see
    * [[canonicalPerClusterOnComponents]]: one clustering, many
    * consumers. */
  def leakageSafeSplitOnComponents(df: DataFrame, idCol: Column,
      components: DataFrame): DataFrame =
    df.select(idCol.as("id"))
      .join(components, Seq("id"), "left")
      .select($"id", coalesce($"rep", $"id").as("cluster"))
      .withColumn("h", substring(md5($"cluster".cast("string").cast("binary")), 1, 1))
      .select($"id", $"cluster",
        when($"h" === "0", "val").when($"h" === "1", "test")
          .otherwise("train").as("split"))

  private implicit class Str(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
