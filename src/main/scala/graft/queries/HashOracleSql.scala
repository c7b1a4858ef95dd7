package graft.queries

/** DuckDB twins of the splitmix64-based signature kernels
  * ([[graft.expressions.TextHashImpl]], [[graft.expressions.BinaryFeaturesImpl]]):
  * generated SQL that reproduces the exact 64-bit two's-complement
  * arithmetic in DuckDB, so the formerly "trust-me" signature columns
  * (MinHash, SimHash, byte-sketch features) hash-match a genuinely
  * independent implementation.
  *
  * Port strategy — Java wraps 64-bit arithmetic silently; DuckDB raises
  * on BIGINT overflow. All hash state is therefore carried as an
  * UNSIGNED value in [0, 2^64) inside a 128-bit HUGEINT:
  *   - add / small-constant multiply: compute in HUGEINT, `% 2^64`;
  *   - full 64×64 multiply (splitmix64's two mix constants): 32-bit
  *     limb decomposition — `lo(a)*lo(c) + ((lo(a)*hi(c) + hi(a)*lo(c))
  *     % 2^32) << 32`, all partial products < 2^96 so nothing overflows
  *     HUGEINT;
  *   - `x >>> s`: on the unsigned value, `x // 2^s`;
  *   - `x ^ y`: both sides fit UBIGINT → `xor(CAST AS UBIGINT)`;
  *   - back to Java's signed view only at the very end
  *     (`u - 2^64` when `u >= 2^63`), where results are compared/printed.
  *
  * Each mix64 application is a chain of 6 tiny CTE stages so every
  * intermediate is referenced by NAME — inlining would blow the
  * expression tree up exponentially (each stage reads its input twice).
  */
object HashOracleSql {

  private val M = "18446744073709551616" // 2^64
  private val HalfM = "9223372036854775808" // 2^63

  /** splitmix64's three constants, as unsigned decimal strings. */
  private val Golden = java.lang.Long.toUnsignedString(0x9e3779b97f4a7c15L)
  private val MixC1 = BigInt(java.lang.Long.toUnsignedString(0xbf58476d1ce4e5b9L))
  private val MixC2 = BigInt(java.lang.Long.toUnsignedString(0x94d049bb133111ebL))
  /** Per-family MinHash seed multiplier (TextHashImpl.minHash). */
  private val SeedC = java.lang.Long.toUnsignedString(0xc2b2ae3d27d4eb4fL)

  /** `(v * c) % 2^64` for unsigned HUGEINT column `v` and 64-bit
    * constant `c`, via 32-bit limb decomposition. */
  private def mulMod(v: String, c: BigInt): String = {
    val c1 = c >> 32
    val c0 = c & 0xFFFFFFFFL
    s"(($v % 4294967296) * $c0 + ((($v % 4294967296) * $c1 + ($v // 4294967296) * $c0) % 4294967296) * 4294967296) % $M"
  }

  /** `v ^ (v >>> sh)` on the unsigned HUGEINT column `v`. */
  private def xorShift(v: String, sh: Int): String =
    s"CAST(xor(CAST($v AS UBIGINT), CAST(($v // ${1L << sh}) AS UBIGINT)) AS HUGEINT)"

  /** CTE stages computing `out` = mix64(`incol`) from CTE `src`
    * (carries all of `src`'s columns along via `SELECT *`). `pfx`
    * namespaces the intermediates so several chains can coexist. */
  private def mix64Stages(src: String, incol: String, out: String, pfx: String): Seq[String] = Seq(
    s"${pfx}1 AS (SELECT *, ($incol + $Golden) % $M AS ${pfx}z0 FROM $src)",
    s"${pfx}2 AS (SELECT *, ${xorShift(s"${pfx}z0", 30)} AS ${pfx}x0 FROM ${pfx}1)",
    s"${pfx}3 AS (SELECT *, ${mulMod(s"${pfx}x0", MixC1)} AS ${pfx}z1 FROM ${pfx}2)",
    s"${pfx}4 AS (SELECT *, ${xorShift(s"${pfx}z1", 27)} AS ${pfx}x1 FROM ${pfx}3)",
    s"${pfx}5 AS (SELECT *, ${mulMod(s"${pfx}x1", MixC2)} AS ${pfx}z2 FROM ${pfx}4)",
    s"${pfx}6 AS (SELECT *, ${xorShift(s"${pfx}z2", 31)} AS $out FROM ${pfx}5)")

  /** Unsigned → Java signed 64-bit view. */
  private def toSigned(u: String): String =
    s"CASE WHEN $u >= $HalfM THEN $u - $M ELSE $u END"

  /** Token list of the normalized text — same semantics as
    * [[graft.expressions.TextHashImpl.tokenize]] (and the regex twin the
    * t01-t07 oracles already hash-match). */
  private val tokensList =
    "list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), t -> t <> '')"

  /** Java `h = h*31 + s.charAt(i)` polynomial over the token's chars
    * (all [a-z0-9] post-normalization, so `unicode()` == `charAt`),
    * seeded with 1125899906842597, as an unsigned HUGEINT. */
  private val tokenPoly =
    "list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), " +
      "list_transform(range(1, length(tok)+1), i -> CAST(unicode(substr(tok, i, 1)) AS HUGEINT))), " +
      s"(h, c) -> (h * 31 + c) % $M)"

  /** Per-token mix64 hashes as CTE chain ending in `m6(doc_id[, pos], th)`. */
  private def tokenHashCtes(withPos: Boolean): Seq[String] = {
    val head =
      if (withPos)
        Seq(s"tl AS (SELECT doc_id, $tokensList AS ts FROM documents)",
          "tok AS (SELECT doc_id, unnest(ts) AS tok, unnest(range(1, len(ts)+1)) AS pos FROM tl)",
          s"h0 AS (SELECT doc_id, pos, $tokenPoly AS p FROM tok)")
      else
        Seq(s"tok AS (SELECT doc_id, unnest($tokensList) AS tok FROM documents)",
          s"h0 AS (SELECT doc_id, $tokenPoly AS p FROM tok)")
    head ++ mix64Stages("h0", "p", "th", "m")
  }

  /** CTEs ending in `sigs(doc_id, j, mv)` — every document's k-wide
    * MinHash signature as signed BIGINT lane minima (docs with fewer
    * than n tokens produce no rows, matching the kernel's NULL). */
  private def minHashSigCtes(n: Int, k: Int): Seq[String] = {
    require(n == 3, "oracle generated for the registered n=3 shingles")
    tokenHashCtes(withPos = true) ++
      Seq(
        // rolling n-token window via lag: row at pos i carries tokens
        // (i-2, i-1, i) — the shingle starting at i-2
        "lagd AS (SELECT doc_id, pos, th, lag(th, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS th2, " +
          "lag(th, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS th1 FROM m6)",
        s"sh0 AS (SELECT doc_id, ((((1125899906842597 * 31 + th2) % $M) * 31 + th1) % $M * 31 + th) % $M AS sp " +
          s"FROM lagd WHERE pos >= $n)") ++
      mix64Stages("sh0", "sp", "sh", "s") ++
      Seq(
        s"fam AS (SELECT doc_id, sh, unnest(range(0, $k)) AS j FROM s6)",
        s"fx AS (SELECT doc_id, j, CAST(xor(CAST(sh AS UBIGINT), CAST((j * $SeedC) % $M AS UBIGINT)) AS HUGEINT) AS fh FROM fam)") ++
      mix64Stages("fx", "fh", "mh", "f") ++
      // Java compares signatures as SIGNED longs (min vs Long.MaxValue)
      Seq(s"sigs AS (SELECT doc_id, j, min(CAST(${toSigned("mh")} AS BIGINT)) AS mv FROM f6 GROUP BY doc_id, j)")
  }

  /** t08: k-wide MinHash signatures over word n-gram shingles, rendered
    * as the same comma-joined signed-decimal CSV the Spark side emits;
    * NULL for docs with fewer than n tokens (TextHashImpl.minHash). */
  def minHashSignatures(n: Int, k: Int): String = {
    val ctes = minHashSigCtes(n, k) :+
      "csv AS (SELECT doc_id, string_agg(CAST(mv AS VARCHAR), ',' ORDER BY j) AS c FROM sigs GROUP BY doc_id)"
    "WITH " + ctes.mkString(",\n") +
      "\nSELECT d.doc_id AS id, csv.c AS minhash_csv FROM documents d LEFT JOIN csv USING (doc_id) ORDER BY id"
  }

  /** t25: incremental near-dup — the FULL pipeline twin of
    * [[graft.operators.Dedup.incrementalNearDups]]: per-band hashes
    * re-derived from the signature lanes with the kernel's exact fold
    * (h·31 + lane, unsigned mod-2⁶⁴, then splitmix64), candidates =
    * new×old band-bucket mates, verify = lane-agreement fraction (all
    * m/k values are dyadic rationals, so 4-dp rounding is bit-portable).
    * No banding-recall assumption anywhere — bucket mismatches fail the
    * hash compare. */
  def incrementalNearDups(n: Int, k: Int, rowsPerBand: Int,
      threshold: Double, newPred: String, oldPred: String = "TRUE"): String =
    "WITH " + incrementalPairCtes(n, k, rowsPerBand, newPred, oldPred).mkString(",\n") +
      s"\nSELECT new_id, dup_of, est_jaccard FROM agr WHERE est_jaccard >= $threshold ORDER BY new_id, dup_of"

  /** CTEs ending in `agr(new_id, dup_of, est_jaccard)` — the t25
    * incremental pipeline's pair set, reused verbatim by the t40
    * closure oracle so both queries replay the identical banding. */
  private def incrementalPairCtes(n: Int, k: Int, rowsPerBand: Int,
      newPred: String, oldPred: String = "TRUE"): Seq[String] =
    minHashSigCtes(n, k) ++
      Seq(
        s"bl AS (SELECT doc_id, CAST(j // $rowsPerBand AS INT) AS band, " +
          s"list(CASE WHEN mv < 0 THEN CAST(mv AS HUGEINT) + $M ELSE CAST(mv AS HUGEINT) END ORDER BY j) AS lanes " +
          "FROM sigs GROUP BY doc_id, band)",
        "bh0 AS (SELECT doc_id, band, list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), lanes), " +
          s"(h, c) -> (h * 31 + c) % $M) AS bp FROM bl)") ++
      mix64Stages("bh0", "bp", "bh", "b") ++
      Seq(
        s"newb AS (SELECT doc_id, band, bh FROM b6 WHERE $newPred)",
        s"oldb AS (SELECT doc_id, band, bh FROM b6 WHERE NOT ($newPred) AND ($oldPred))",
        "cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS dup_of " +
          "FROM newb n JOIN oldb o ON n.band = o.band AND n.bh = o.bh)",
        "agr AS (SELECT c.new_id, c.dup_of, " +
          s"round(sum(CASE WHEN sa.mv = sb.mv THEN 1 ELSE 0 END) / CAST($k AS DOUBLE), 4) AS est_jaccard " +
          "FROM cand c JOIN sigs sa ON sa.doc_id = c.new_id " +
          "JOIN sigs sb ON sb.doc_id = c.dup_of AND sb.j = sa.j " +
          "GROUP BY c.new_id, c.dup_of)")

  /** t40: incremental components maintenance — the full-recompute
    * equality oracle for [[graft.operators.Dedup.mergeComponents]].
    * The pair universe is exactly what the Spark side folds together:
    * old–old and new–new exact-Jaccard pairs (the t21/t09 exhaustive
    * twin of the verified-banding pipeline) plus the t25 incremental
    * new–old pairs (stored-signature agreement, replayed bit-exactly
    * by [[incrementalPairCtes]]). The recursive CTE closes that union
    * transitively and takes each node's min reachable id — which the
    * incremental merge must reproduce row-for-row despite never
    * re-clustering the old corpus. */
  def incrementalComponents(n: Int, k: Int, rowsPerBand: Int,
      threshold: Double, exactThreshold: Double, newPred: String): String = {
    import graft.functions.TextFunctions.{Sql => T}
    val ctes = incrementalPairCtes(n, k, rowsPerBand, newPred) ++ Seq(
      s"shs AS (SELECT doc_id, ${T.shingleSet("text", 3)} AS s FROM documents)",
      s"oldsh AS (SELECT doc_id, s FROM shs WHERE NOT ($newPred))",
      s"newsh AS (SELECT doc_id, s FROM shs WHERE $newPred)",
      "pold AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM oldsh a " +
        s"JOIN oldsh b ON a.doc_id < b.doc_id WHERE ${T.listJaccard("a.s", "b.s")} >= $exactThreshold)",
      "pnew AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM newsh a " +
        s"JOIN newsh b ON a.doc_id < b.doc_id WHERE ${T.listJaccard("a.s", "b.s")} >= $exactThreshold)",
      s"incr AS (SELECT new_id AS id_a, dup_of AS id_b FROM agr WHERE est_jaccard >= $threshold)",
      "allp AS (SELECT id_a, id_b FROM pold UNION SELECT id_a, id_b FROM pnew " +
        "UNION SELECT id_a, id_b FROM incr)",
      "e(src, dst) AS (SELECT id_a, id_b FROM allp UNION ALL SELECT id_b, id_a FROM allp)",
      """reach(a, b) AS (
        |  SELECT DISTINCT src, src FROM e
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src)""".stripMargin)
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT a AS doc_id, CAST(min(b) AS BIGINT) AS rep_id FROM reach GROUP BY a ORDER BY doc_id"
  }

  /** The DuckDB twin of one LEARNED-merge application over a
    * '|'-encoded token string: the kernel's leftmost-first fold, with
    * the merge operands coming from the round's argmax row `m` (a
    * LEFT JOIN ON TRUE single row) instead of a compile-time constant
    * — NULL operands (an exhausted round) leave the encoding
    * unchanged because `tk = NULL` is never true. */
  private def applyLearnedMergeSql(enc: String): String =
    s"""CASE WHEN $enc NOT LIKE '%|%' THEN $enc ELSE
       |list_reduce(string_split($enc, '|'), (acc, tk) ->
       |  CASE WHEN tk = m.y AND regexp_extract(acc, '[^|]*${"$"}') = m.x
       |       THEN left(acc, length(acc) - length(m.x)) || m.x || m.y
       |       ELSE acc || '|' || tk END) END""".stripMargin

  /** CTEs replaying BPE TRAINING ([[graft.operators.BpeTrain.train]])
    * in DuckDB, fully independently — DuckDB computes its OWN
    * freq-weighted pair counts and argmax each round, so a hash match
    * verifies the whole learning loop, not just an inlined result.
    * Produces `wf` (word types), `enc0..encK` (per-round word
    * encodings) and `m1..mK` (each round's winning merge (x, y, cnt),
    * tie-break count DESC then lexicographic). */
  private def bpeTrainCtes(k: Int): Seq[String] = {
    import graft.functions.TextFunctions.{Sql => T}
    val base = Seq(
      s"btl AS (SELECT string_split(${T.normalizeText("text")}, ' ') AS ws FROM documents)",
      "bw AS (SELECT unnest(ws) AS word FROM btl)",
      "wf AS (SELECT word, count(*) AS freq FROM bw WHERE word <> '' GROUP BY word)",
      "enc0 AS (SELECT word, freq, array_to_string(list_transform(" +
        "range(1, length(word)+1), i -> substr(word, i, 1)), '|') AS enc FROM wf)")
    val rounds = (1 to k).flatMap { r =>
      Seq(
        // overlapping adjacent pairs, freq-weighted (canonical
        // get_stats); single-token words contribute no positions
        s"pr$r AS (SELECT t[CAST(i AS INT)] AS x, t[CAST(i AS INT)+1] AS y, sum(freq) AS cnt " +
          "FROM (SELECT freq, t, unnest(range(1, len(t))) AS i " +
          s"FROM (SELECT freq, string_split(enc, '|') AS t FROM enc${r - 1})) GROUP BY 1, 2)",
        s"m$r AS (SELECT x, y, cnt FROM pr$r ORDER BY cnt DESC, x, y LIMIT 1)",
        s"enc$r AS (SELECT word, freq, ${applyLearnedMergeSql("e.enc")} AS enc " +
          s"FROM enc${r - 1} e LEFT JOIN m$r m ON TRUE)")
    }
    base ++ rounds
  }

  /** t42: the learned merges table (merge_rank, x, y, cnt). */
  def bpeTrain(k: Int): String = {
    val legs = (1 to k).map(r => s"SELECT $r AS merge_rank, x, y, CAST(cnt AS BIGINT) AS cnt FROM m$r")
    "WITH " + bpeTrainCtes(k).mkString(",\n") +
      "\nSELECT merge_rank, x, y, cnt FROM (" + legs.mkString(" UNION ALL ") +
      ") ORDER BY merge_rank"
  }

  /** t43: every document re-encoded under the LEARNED table — the
    * training replay above feeding t39's encode-stage shape, so one
    * static SQL verifies learn-then-serve end to end. */
  def bpeLearnedTokens(k: Int): String = {
    import graft.functions.TextFunctions.{Sql => T}
    val docBase = Seq(
      s"dtl AS (SELECT doc_id, string_split(${T.normalizeText("text")}, ' ') AS ws FROM documents)",
      "dw AS (SELECT doc_id, unnest(ws) AS word, unnest(range(1, len(ws)+1)) AS widx FROM dtl)",
      "d0 AS (SELECT doc_id, widx, array_to_string(list_transform(" +
        "range(1, length(word)+1), i -> substr(word, i, 1)), '|') AS enc " +
        "FROM dw WHERE word <> '')")
    val docRounds = (1 to k).map { r =>
      s"d$r AS (SELECT doc_id, widx, ${applyLearnedMergeSql("e.enc")} AS enc " +
        s"FROM d${r - 1} e LEFT JOIN m$r m ON TRUE)"
    }
    val tail =
      s"agg AS (SELECT d.doc_id, coalesce(string_agg(e.enc, '|' ORDER BY e.widx), '') AS enc " +
        s"FROM documents d LEFT JOIN d$k e USING (doc_id) GROUP BY d.doc_id)"
    "WITH " + (bpeTrainCtes(k) ++ docBase ++ docRounds :+ tail).mkString(",\n") +
      """
        |SELECT doc_id,
        |  CAST(CASE WHEN enc = '' THEN 0 ELSE len(string_split(enc, '|')) END AS INT) AS n_bpe,
        |  md5(enc) AS bpe_fp
        |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** t46: per-language tokenizer-quality metrics under the LEARNED
    * table — fertility (BPE tokens per word) and single-char-fragment
    * fraction, from the same training-replay + per-word encode stages
    * as t43, classified and aggregated in SQL. All counts are exact
    * integers, so the ratios are deterministic; the 1e-9 nudge is the
    * house belt-and-braces. */
  def bpeFertility(k: Int): String = {
    import graft.functions.TextFunctions.{Sql => T}
    val docBase = Seq(
      s"dtl AS (SELECT doc_id, string_split(${T.normalizeText("text")}, ' ') AS ws FROM documents)",
      "dw AS (SELECT doc_id, unnest(ws) AS word, unnest(range(1, len(ws)+1)) AS widx FROM dtl)",
      "d0 AS (SELECT doc_id, widx, array_to_string(list_transform(" +
        "range(1, length(word)+1), i -> substr(word, i, 1)), '|') AS enc " +
        "FROM dw WHERE word <> '')")
    val docRounds = (1 to k).map { r =>
      s"d$r AS (SELECT doc_id, widx, ${applyLearnedMergeSql("e.enc")} AS enc " +
        s"FROM d${r - 1} e LEFT JOIN m$r m ON TRUE)"
    }
    val tail =
      s"stats AS (SELECT d.doc_id, d.lang, count(e.enc) AS n_words, " +
        "coalesce(sum(len(string_split(e.enc, '|'))), 0) AS n_bpe, " +
        "coalesce(sum(len(list_filter(string_split(e.enc, '|'), t -> length(t) = 1))), 0) AS n_single " +
        s"FROM documents d LEFT JOIN d$k e USING (doc_id) GROUP BY d.doc_id, d.lang)"
    "WITH " + (bpeTrainCtes(k) ++ docBase ++ docRounds :+ tail).mkString(",\n") +
      """
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(CAST(sum(n_bpe) AS DOUBLE) / sum(n_words) + 1e-9, 4) AS fertility,
        |  round(CAST(sum(n_single) AS DOUBLE) / sum(n_bpe) + 1e-9, 4) AS single_frac
        |FROM stats GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** [[bpeTrainCtes]]'s BYTE-level twin ([[graft.operators.BpeTrain
    * .trainBytes]]): words split on raw single spaces (NO
    * normalization — zero-OOV starts at training), round-0 encodings
    * the words' UTF-8 bytes as '|'-joined lowercase-hex pairs
    * (`lower(hex(encode(word)))` sliced in twos), then the identical
    * independent pair-count/argmax/re-encode replay per round. */
  private def byteTrainCtes(k: Int): Seq[String] = {
    val base = Seq(
      "btl AS (SELECT string_split(text, ' ') AS ws FROM documents)",
      "bw AS (SELECT unnest(ws) AS word FROM btl)",
      "wf AS (SELECT word, count(*) AS freq FROM bw WHERE word <> '' GROUP BY word)",
      "enc0 AS (SELECT word, freq, array_to_string(list_transform(" +
        "range(1, length(lower(hex(encode(word))))//2 + 1), " +
        "i -> substr(lower(hex(encode(word))), 2*i-1, 2)), '|') AS enc FROM wf)")
    val rounds = (1 to k).flatMap { r =>
      Seq(
        s"pr$r AS (SELECT t[CAST(i AS INT)] AS x, t[CAST(i AS INT)+1] AS y, sum(freq) AS cnt " +
          "FROM (SELECT freq, t, unnest(range(1, len(t))) AS i " +
          s"FROM (SELECT freq, string_split(enc, '|') AS t FROM enc${r - 1})) GROUP BY 1, 2)",
        s"m$r AS (SELECT x, y, cnt FROM pr$r ORDER BY cnt DESC, x, y LIMIT 1)",
        s"enc$r AS (SELECT word, freq, ${applyLearnedMergeSql("e.enc")} AS enc " +
          s"FROM enc${r - 1} e LEFT JOIN m$r m ON TRUE)")
    }
    base ++ rounds
  }

  /** Per-document byte-level word stages d0..dk under the byte
    * training replay (shared by [[byteBpeTokens]]/[[byteFertility]]). */
  private def byteDocStages(k: Int): Seq[String] = {
    val docBase = Seq(
      "dtl AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)",
      "dw AS (SELECT doc_id, unnest(ws) AS word, unnest(range(1, len(ws)+1)) AS widx FROM dtl)",
      "d0 AS (SELECT doc_id, widx, array_to_string(list_transform(" +
        "range(1, length(lower(hex(encode(word))))//2 + 1), " +
        "i -> substr(lower(hex(encode(word))), 2*i-1, 2)), '|') AS enc " +
        "FROM dw WHERE word <> '')")
    val docRounds = (1 to k).map { r =>
      s"d$r AS (SELECT doc_id, widx, ${applyLearnedMergeSql("e.enc")} AS enc " +
        s"FROM d${r - 1} e LEFT JOIN m$r m ON TRUE)"
    }
    docBase ++ docRounds
  }

  /** t61: every document encoded under the LEARNED byte table,
    * bracketed by the [BOS]/[EOS] reserved pair exactly as the kernel
    * emits them — '[BOS]' + ('|' + token)* + '|[EOS]'. Token count
    * includes the specials (they are tokens the LM consumer pays for). */
  def byteBpeTokens(k: Int): String = {
    val tail =
      "agg AS (SELECT d.doc_id, " +
        "'[BOS]' || coalesce('|' || string_agg(e.enc, '|' ORDER BY e.widx), '') || '|[EOS]' AS enc " +
        s"FROM documents d LEFT JOIN d$k e USING (doc_id) GROUP BY d.doc_id)"
    "WITH " + (byteTrainCtes(k) ++ byteDocStages(k) :+ tail).mkString(",\n") +
      """
        |SELECT doc_id,
        |  CAST(len(string_split(enc, '|')) AS INT) AS n_tokens,
        |  md5(enc) AS bpe_fp
        |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** t63: per-language fertility under the byte table — tokens per
    * word and single-BYTE-fragment fraction (length 2 = one hex pair),
    * [[bpeFertility]] re-measured at the byte level. */
  def byteFertility(k: Int): String = {
    val tail =
      s"stats AS (SELECT d.doc_id, d.lang, count(e.enc) AS n_words, " +
        "coalesce(sum(len(string_split(e.enc, '|'))), 0) AS n_bpe, " +
        "coalesce(sum(len(list_filter(string_split(e.enc, '|'), t -> length(t) = 2))), 0) AS n_single " +
        s"FROM documents d LEFT JOIN d$k e USING (doc_id) GROUP BY d.doc_id, d.lang)"
    "WITH " + (byteTrainCtes(k) ++ byteDocStages(k) :+ tail).mkString(",\n") +
      """
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(CAST(sum(n_bpe) AS DOUBLE) / sum(n_words) + 1e-9, 4) AS fertility,
        |  round(CAST(sum(n_single) AS DOUBLE) / sum(n_bpe) + 1e-9, 4) AS single_frac
        |FROM stats GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** CTEs ending in `allsims(doc_id, u)`: the unsigned 64-bit SimHash of
    * every document (0 for docs with no tokens, as in the kernel). */
  private def simHashCtes: Seq[String] =
    tokenHashCtes(withPos = false) ++ Seq(
      "bits AS (SELECT doc_id, th, unnest(range(0, 64)) AS bit FROM m6)",
      "votes AS (SELECT doc_id, bit, sum(CASE WHEN (CAST(th AS UBIGINT) >> CAST(bit AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v " +
        "FROM bits GROUP BY doc_id, bit)",
      "sims AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN CAST(CAST(1 AS UBIGINT) << CAST(bit AS INT) AS HUGEINT) ELSE 0 END) AS usim " +
        "FROM votes GROUP BY doc_id)",
      "allsims AS (SELECT d.doc_id, CAST(coalesce(usim, 0) AS UBIGINT) AS u FROM documents d LEFT JOIN sims USING (doc_id))")

  /** t10: 64-bit SimHash per document, signed view. */
  def simHash: String =
    "WITH " + simHashCtes.mkString(",\n") +
      s"\nSELECT doc_id, CAST(${toSigned("CAST(u AS HUGEINT)")} AS BIGINT) AS simhash FROM allsims ORDER BY doc_id"

  /** t12: SimHash near-dup pairs within `maxHamming` bits. The oracle is
    * the EXHAUSTIVE all-pairs hamming filter — the Spark side's
    * pigeonhole banding provably returns the identical set for
    * maxHamming ≤ 3 with 4 bands (RecallSpec asserts banding ==
    * brute-force), so hash-matching against brute force verifies both
    * the signature kernel and the banding. */
  def simHashPairs(maxHamming: Int): String =
    "WITH " + simHashCtes.mkString(",\n") +
      s"""
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.u, b.u)) AS INT) AS hamming
         |FROM allsims a JOIN allsims b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.u, b.u)) <= $maxHamming
         |ORDER BY id_a, id_b""".stripMargin

  /** CTEs ending in `feats(doc_id, dim, f)` — the byteFeatures sketch
    * as DOUBLE values (floor(x·1e6 + 0.5)/1e6 reproduces the kernel's
    * Math.round-to-6dp in both engines bit-identically: the scaled
    * value is an exact integer and /1e6 is the same IEEE division). */
  private def featureCtes(payloadSql: String, dim: Int): Seq[String] = {
    def hexDigit(e: String) = s"(strpos('0123456789ABCDEF', $e) - 1)"
    def byteAt(off: Int) =
      s"(${hexDigit(s"substr(h, i*2 + ${2 * off + 1}, 1)")} * 16 + ${hexDigit(s"substr(h, i*2 + ${2 * off + 2}, 1)")})"
    val window = s"(CAST(${byteAt(0)} AS HUGEINT) * 16777216 + ${byteAt(1)} * 65536 + ${byteAt(2)} * 256 + ${byteAt(3)})"
    Seq(
      s"b AS (SELECT doc_id, $payloadSql AS payload FROM documents WHERE octet_length($payloadSql) > 0)",
      "hx AS (SELECT doc_id, hex(payload) AS h, octet_length(payload) AS n FROM b)",
      "win AS (SELECT doc_id, h, unnest(range(0, n - 3)) AS i FROM hx WHERE n >= 4)",
      s"w0 AS (SELECT doc_id, $window AS wv FROM win)") ++
      mix64Stages("w0", "wv", "u", "m") ++ Seq(
      s"bsum AS (SELECT doc_id, CAST((u // 2) % $dim AS INT) AS bucket, " +
        "sum(CASE WHEN u % 2 = 0 THEN 1 ELSE -1 END) AS s FROM m6 GROUP BY doc_id, bucket)",
      s"grid AS (SELECT doc_id, unnest(range(0, $dim)) AS bucket FROM hx WHERE n >= 4)",
      "fs AS (SELECT g.doc_id, g.bucket, CAST(coalesce(s, 0) AS DOUBLE) AS s FROM grid g LEFT JOIN bsum USING (doc_id, bucket))",
      "nrm AS (SELECT doc_id, bucket, s, sum(s * s) OVER (PARTITION BY doc_id) AS norm2 FROM fs)",
      "feats AS (SELECT doc_id, bucket + 1 AS dim, " +
        "CAST(floor(s * (CASE WHEN norm2 = 0 THEN 0.0 ELSE 1.0 / sqrt(norm2) END) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS f FROM nrm)")
  }

  /** m05: the full centered multi-band LSH near-dup pipeline
    * ([[graft.operators.Similarity.cosineNearDupPairs]] over
    * byteFeatures) as its exact DuckDB twin — the same planes, offsets,
    * banding, and verify, so the hash-match holds with NO recall
    * assumption (a brute-force oracle would fail the round whenever the
    * banding misses a borderline pair; this one cannot).
    *
    * The hyperplanes are `java.util.Random(seed)` draws, and the JDK
    * spec fixes that generator exactly: a recursive CTE replays the
    * 48-bit LCG (seed' = (seed·0x5DEECE66D + 0xB) mod 2^48) and
    * reassembles each nextDouble from two draws ((hi26 << 27 + lo27) /
    * 2^53 — exact power-of-two scaling), so the plane table is
    * bit-identical to [[graft.operators.Similarity.hyperplanes]]
    * without inlining 10k constants. Group-by float sums (mean,
    * offsets, dots) can differ from the kernel's sequential order by
    * ulps, which only matters within ~1e-15 of a signature sign
    * boundary — vanishingly unlikely and checked by the hash-match
    * itself. */
  def cosineNearDupPairs(payloadSql: String, dim: Int, nBits: Int,
      nBands: Int, seed: Long, threshold: Double): String = {
    val s0 = (seed ^ 0x5DEECE66DL) & ((1L << 48) - 1)
    val nPlanes = nBits * nBands
    val nSteps = 2L * nPlanes * dim
    val ctes = Seq(
      s"""seeds(n, s) AS (
         |  SELECT 0, CAST($s0 AS HUGEINT)
         |  UNION ALL SELECT n + 1, (s * 25214903917 + 11) % 281474976710656 FROM seeds WHERE n < $nSteps)""".stripMargin,
      s"""planes AS (
         |  SELECT (a.n // 2) // $dim AS plane, (a.n // 2) % $dim + 1 AS dim,
         |    CAST((a.s // 4194304) * 134217728 + (b.s // 2097152) AS DOUBLE) / 9007199254740992 * 2 - 1 AS w
         |  FROM seeds a JOIN seeds b ON b.n = a.n + 1 WHERE a.n % 2 = 1)""".stripMargin) ++
      featureCtes(payloadSql, dim) ++ Seq(
      "mean AS (SELECT dim, avg(f) AS mv FROM feats GROUP BY dim)",
      "offs AS (SELECT plane, sum(w * mv) AS off FROM planes JOIN mean USING (dim) GROUP BY plane)",
      "dots AS (SELECT doc_id, plane, sum(f * w) AS d FROM feats JOIN planes USING (dim) GROUP BY doc_id, plane)",
      s"""sigs AS (
         |  SELECT doc_id, plane // $nBits AS band,
         |    sum(CASE WHEN d >= off THEN CAST(1 AS BIGINT) << CAST(plane % $nBits AS INT) ELSE 0 END) AS sig
         |  FROM dots JOIN offs USING (plane) GROUP BY doc_id, plane // $nBits)""".stripMargin,
      "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM sigs a " +
        "JOIN sigs b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)",
      "vecs AS (SELECT doc_id, array_agg(f ORDER BY dim) AS arr FROM feats GROUP BY doc_id)")
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      s"""
         |SELECT id_a, id_b, cosine FROM (
         |  SELECT c.id_a, c.id_b, round(list_cosine_similarity(va.arr, vb.arr), 4) AS cosine
         |  FROM cand c JOIN vecs va ON va.doc_id = c.id_a JOIN vecs vb ON vb.doc_id = c.id_b)
         |WHERE cosine >= $threshold ORDER BY id_a, id_b""".stripMargin
  }

  /** m04: the [[graft.expressions.BinaryFeaturesImpl.byteFeatures]]
    * signed random-projection sketch over payload byte 4-grams, emitted
    * as 1e6-scaled integers (both engines `floor(x + 0.5)` — Java
    * `Math.round` semantics — so the CSV is format-neutral). Assumes
    * every non-empty payload is ≥ 4 bytes (magic + ≥48-char text at
    * every SF); a shorter payload would take the kernel's degenerate
    * whole-payload branch and surface here as a visible mismatch, not a
    * silent pass. */
  def binaryFeatures(payloadSql: String, dim: Int): String =
    // f = m/1e6 with integer m, so floor(f·1e6 + 0.5) recovers m exactly
    "WITH " + (featureCtes(payloadSql, dim) :+
      "fi AS (SELECT doc_id, dim, CAST(floor(f * 1000000.0 + 0.5) AS BIGINT) AS v FROM feats)").mkString(",\n") +
      "\nSELECT doc_id, string_agg(CAST(v AS VARCHAR), ',' ORDER BY dim) AS features_csv FROM fi GROUP BY doc_id ORDER BY doc_id"

  /** t49: cross-document duplicated k-gram spans — the bit-exact twin
    * of [[graft.operators.SpanDedup.duplicateSpans]]. Gram hashes
    * replay the kernel's exact math (per-token mix64(poly), k-wide
    * poly over the token hashes via lag columns, mix64 — the
    * [[minHashSigCtes]] shingle chain generalized from n=3 to any k),
    * so a 64-bit hash collision would diverge BOTH engines identically
    * and the span sets compare hash-exact. Cross-document test is the
    * same min≠max trick; the interval merge is the same
    * max-over-preceding run split (`>` so abutting windows merge). */
  def duplicateSpans(k: Int, emitPred: Option[String] = None): String = {
    // emitPred restricts which documents' spans EMIT (t51/s22's
    // incremental claim: spans of the new docs computed against the
    // stored index == this full-corpus recompute filtered to them);
    // gram qualification always sees the whole corpus, and the run
    // merge is per-doc, so filtering hits == filtering output
    val emit = emitPred.map(p => s" WHERE $p").getOrElse("")
    val ctes = gramCtes(k) ++ Seq(
      "dups AS (SELECT gh FROM grams GROUP BY gh HAVING min(doc_id) <> max(doc_id))",
      s"hits AS (SELECT doc_id, start0 FROM grams JOIN dups USING (gh)$emit)") ++
      runCtes("hits", k)
    "WITH " + ctes.mkString(",\n") +
      s"""
         |SELECT doc_id, CAST(min(start0) AS BIGINT) AS span_start,
         |  CAST(max(start0) + $k AS BIGINT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_grams
         |FROM runs GROUP BY doc_id, run ORDER BY doc_id, span_start""".stripMargin
  }

  /** CTEs ending in `grams(doc_id, start0, gh)` — position-ordered
    * k-gram hashes, the [[duplicateSpans]]/[[cutSpans]] shared head.
    * Also leaves `tl(doc_id, ts)` and `tok(doc_id, tok, pos)` in scope
    * for token-level reconstruction. */
  private def gramCtes(k: Int): Seq[String] = {
    val lagCols = (1 until k).map(j => s"lag(th, $j) OVER w AS t$j").mkString(", ")
    // kernel fold order is oldest token first: seed, t(k-1), ..., t1, th
    val fold = (k - 1 to 1 by -1)
      .map(j => s"t$j")
      .foldLeft("CAST(1125899906842597 AS HUGEINT)")((acc, t) => s"(($acc) * 31 + $t) % $M")
    tokenHashCtes(withPos = true) ++ Seq(
      s"lagd AS (SELECT doc_id, pos, th, $lagCols FROM m6 " +
        "WINDOW w AS (PARTITION BY doc_id ORDER BY pos))",
      // pos is the window's LAST token (1-based) → start0 is 0-based
      s"g0 AS (SELECT doc_id, pos - $k AS start0, (($fold) * 31 + th) % $M AS gp " +
        s"FROM lagd WHERE pos >= $k)") ++
      mix64Stages("g0", "gp", "gh", "g") :+
      "grams AS (SELECT doc_id, start0, gh FROM g6)"
  }

  /** Interval-merge CTEs over a `(doc_id, start0)` hit CTE — the
    * max-over-preceding run split (`>` so abutting windows merge),
    * ending in `runs(doc_id, start0, run)`. */
  private def runCtes(src: String, k: Int): Seq[String] = Seq(
    s"pm AS (SELECT doc_id, start0, max(start0) OVER (PARTITION BY doc_id ORDER BY start0 " +
      s"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax FROM $src)",
    s"brk AS (SELECT doc_id, start0, CASE WHEN prevmax IS NULL OR start0 > prevmax + $k " +
      "THEN 1 ELSE 0 END AS b FROM pm)",
    "runs AS (SELECT doc_id, start0, sum(b) OVER (PARTITION BY doc_id ORDER BY start0) AS run FROM brk)")

  /** t69/t70: the CHARACTER-granularity twin of
    * [[graft.operators.SpanDedup.duplicateCharSpans]] — a genuine
    * SUBSTRING oracle: DuckDB compares the actual L-char windows of
    * the normalized text (substring(), 1-based → 0-based start0), no
    * hash arithmetic replayed at all, so the oracle is strictly
    * stronger than the kernel (a 64-bit rolling-hash collision in the
    * engine would FAIL the gate, not hide). Qualification (min ≠ max
    * doc over the gram group, optionally restricted to an emit
    * predicate for the incremental claim) and the run merge are the
    * [[duplicateSpans]] shapes verbatim. */
  def duplicateCharSpans(L: Int, emitPred: Option[String] = None): String = {
    val emit = emitPred.map(p => s" WHERE $p").getOrElse("")
    val nt = graft.functions.TextFunctions.Sql.normalizeText("text")
    val ctes = Seq(
      s"t AS (SELECT doc_id, $nt AS nt FROM documents)",
      s"grams AS (SELECT doc_id, i - 1 AS start0, substring(nt, i, $L) AS gh " +
        s"FROM t, LATERAL unnest(generate_series(1, len(nt) - $L + 1)) AS u(i))",
      "dups AS (SELECT gh FROM grams GROUP BY gh HAVING min(doc_id) <> max(doc_id))",
      s"hits AS (SELECT doc_id, start0 FROM grams JOIN dups USING (gh)$emit)") ++
      runCtes("hits", L)
    "WITH " + ctes.mkString(",\n") +
      s"""
         |SELECT doc_id, CAST(min(start0) AS BIGINT) AS span_start,
         |  CAST(max(start0) + $L AS BIGINT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_grams
         |FROM runs GROUP BY doc_id, run ORDER BY doc_id, span_start""".stripMargin
  }

  /** t71: the cut twin of
    * [[graft.operators.SpanDedup.cutDuplicateCharSpans]] — [[cutSpans]]'
    * canonical-occurrence + run-merge shapes at CHARACTER granularity,
    * over actual substrings (no hash arithmetic), with the cleaned
    * text rebuilt char-by-char (string_agg over uncovered positions —
    * position-identical to the engine's gap-concatenation fold). */
  def cutCharSpans(L: Int): String = {
    val nt = graft.functions.TextFunctions.Sql.normalizeText("text")
    val ctes = Seq(
      s"t AS (SELECT doc_id, $nt AS nt FROM documents)",
      s"grams AS (SELECT doc_id, i - 1 AS start0, substring(nt, i, $L) AS gh " +
        s"FROM t, LATERAL unnest(generate_series(1, len(nt) - $L + 1)) AS u(i))",
      "firsts AS (SELECT doc_id, start0, " +
        "min(doc_id) OVER wg AS d0, max(doc_id) OVER wg AS d1, " +
        "first_value(doc_id) OVER wo AS cdoc, first_value(start0) OVER wo AS cstart " +
        "FROM grams WINDOW wg AS (PARTITION BY gh), " +
        "wo AS (PARTITION BY gh ORDER BY doc_id, start0))",
      "cuts AS (SELECT doc_id, start0 FROM firsts " +
        "WHERE d0 <> d1 AND NOT (doc_id = cdoc AND start0 = cstart))") ++
      runCtes("cuts", L) ++ Seq(
        s"spans AS (SELECT doc_id, run, min(start0) AS s, max(start0) + $L AS e " +
          "FROM runs GROUP BY doc_id, run)",
        "sc AS (SELECT doc_id, count(*) AS n_spans_cut FROM spans GROUP BY doc_id)",
        "chars AS (SELECT t.doc_id, i AS pos, substring(t.nt, i, 1) AS ch " +
          "FROM t, LATERAL unnest(generate_series(1, len(t.nt))) AS u(i) " +
          "WHERE t.doc_id IN (SELECT doc_id FROM sc))",
        "keptc AS (SELECT c.doc_id, c.pos, c.ch FROM chars c WHERE NOT EXISTS (" +
          "SELECT 1 FROM spans s WHERE s.doc_id = c.doc_id " +
          "AND c.pos - 1 >= s.s AND c.pos - 1 < s.e))",
        "agg AS (SELECT doc_id, count(*) AS n_after, " +
          "string_agg(ch, '' ORDER BY pos) AS clean_text FROM keptc GROUP BY doc_id)")
    "WITH " + ctes.mkString(",\n") +
      s"""
         |SELECT sc.doc_id, CAST(sc.n_spans_cut AS BIGINT) AS n_spans_cut,
         |  CAST(len(t.nt) AS BIGINT) AS n_chars_before,
         |  CAST(coalesce(agg.n_after, 0) AS BIGINT) AS n_chars_after,
         |  coalesce(agg.clean_text, '') AS clean_text
         |FROM sc JOIN t ON sc.doc_id = t.doc_id
         |LEFT JOIN agg ON sc.doc_id = agg.doc_id
         |ORDER BY sc.doc_id""".stripMargin
  }

  /** t50: the cut twin of [[graft.operators.SpanDedup.cutDuplicateSpans]].
    * Canonical occurrence = lexicographic-first (doc_id, start0) in the
    * gram group via first_value windows; every other occurrence of a
    * cross-document gram is a cut window, merged by the same run split,
    * and the cleaned text is rebuilt from the `tok` CTE's (token, pos)
    * rows minus the covered positions (pos is 1-based, spans 0-based).
    * Patch semantics: only documents with ≥1 cut emit. */
  def cutSpans(k: Int, canonicalPriority: Option[String] = None,
      emitPred: Option[String] = None): String = {
    // canonicalPriority prepends a sort key to the canonical-occurrence
    // ordering (t52's stored-corpus-wins claim: old docs sort first, so
    // the published copy always survives); emitPred restricts which
    // documents' patches EMIT — cut membership of an occurrence only
    // affects its own document's spans, so filtering cuts == filtering
    // output (the t51 argument, applied to the cut side)
    val pri = canonicalPriority.map(p => s"$p, ").getOrElse("")
    val emit = emitPred.map(p => s" AND ($p)").getOrElse("")
    val ctes = gramCtes(k) ++ Seq(
      "firsts AS (SELECT doc_id, start0, " +
        "min(doc_id) OVER wg AS d0, max(doc_id) OVER wg AS d1, " +
        "first_value(doc_id) OVER wo AS cdoc, first_value(start0) OVER wo AS cstart " +
        "FROM grams WINDOW wg AS (PARTITION BY gh), " +
        s"wo AS (PARTITION BY gh ORDER BY ${pri}doc_id, start0))",
      "cuts AS (SELECT doc_id, start0 FROM firsts " +
        s"WHERE d0 <> d1 AND NOT (doc_id = cdoc AND start0 = cstart)$emit)") ++
      runCtes("cuts", k) ++ Seq(
        s"spans AS (SELECT doc_id, run, min(start0) AS span_start, max(start0) + $k AS span_end " +
          "FROM runs GROUP BY doc_id, run)",
        "sc AS (SELECT doc_id, count(*) AS n_spans_cut FROM spans GROUP BY doc_id)",
        "keptt AS (SELECT t.doc_id, t.tok, t.pos FROM tok t WHERE NOT EXISTS (" +
          "SELECT 1 FROM spans s WHERE s.doc_id = t.doc_id " +
          "AND t.pos - 1 >= s.span_start AND t.pos - 1 < s.span_end))",
        "agg AS (SELECT doc_id, count(*) AS n_after, " +
          "string_agg(tok, ' ' ORDER BY pos) AS clean_text FROM keptt GROUP BY doc_id)")
    "WITH " + ctes.mkString(",\n") +
      s"""
         |SELECT sc.doc_id, CAST(sc.n_spans_cut AS BIGINT) AS n_spans_cut,
         |  CAST(len(tl.ts) AS BIGINT) AS n_tokens_before,
         |  CAST(coalesce(agg.n_after, 0) AS BIGINT) AS n_tokens_after,
         |  coalesce(agg.clean_text, '') AS clean_text
         |FROM sc JOIN tl ON sc.doc_id = tl.doc_id
         |LEFT JOIN agg ON sc.doc_id = agg.doc_id
         |ORDER BY sc.doc_id""".stripMargin
  }
}
