package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression surface for the training-data pipeline:
  * normalization, tokenization, fingerprinting, language ID, quality
  * scoring. Everything is built from codegen'd built-ins (no UDFs), so
  * the operators distribute trivially and survive column pruning.
  *
  * Each operator has an ANSI-SQL twin in [[TextFunctions.Sql]] used by
  * the DuckDB oracle — the two definitions are kept textually adjacent
  * so the semantics cannot drift apart.
  */
object TextFunctions {

  /** Canonical text normalization: lowercase, collapse every run of
    * non-alphanumerics to a single space, trim. Runs as a single-pass
    * native kernel ([[graft.expressions.TextHash.normalizeText]]) with
    * semantics identical to
    * `trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))` — the form
    * the DuckDB oracle still uses, so every oracled query verifies the
    * equivalence. */
  def normalizeText(text: Column): Column =
    graft.expressions.TextHash.normalizeText(text)

  /** Whitespace token count (runs of non-space) — one-pass kernel;
    * the `\S+` regex stays the DuckDB oracle twin. */
  def tokenCount(text: Column): Column =
    graft.expressions.TextHash.wsTokenCount(text)

  /** Tokens of the normalized text. */
  def tokens(text: Column): Column =
    split(normalizeText(text), " ")

  /** Content fingerprint: md5 of the normalized text — the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(normalizeText(text))

  /** Prefix fingerprint: md5 of the first `n` normalized chars — a cheap
    * near-dup blocking key (documents sharing a long prefix collide). */
  def prefixFingerprint(text: Column, n: Int): Column =
    md5(substring(normalizeText(text), 1, n))

  /** Stopword lists per language for the language-ID heuristic — the
    * canonical table lives next to the kernel
    * ([[graft.expressions.TextHashImpl.langStopwords]]); re-exported
    * here for API stability. Counting is TOKEN membership (one fused
    * pass), equal to the former `\b(w1|w2|…)\b` regex count on
    * alphanumeric tokens but ~50× cheaper and with no per-engine regex
    * semantics in the contract. */
  val langStopwords: Seq[(String, Seq[String])] =
    graft.expressions.TextHashImpl.langStopwords

  /** Number of stopword hits for one language (index into
    * [[langStopwords]]) — native one-pass kernel. */
  def stopwordHits(text: Column, langIdx: Int): Column =
    graft.expressions.TextHash.stopwordHits(text, langIdx)

  /** Heuristic language ID: argmax of per-language stopword hit counts,
    * ties broken by list order in [[langStopwords]]; "und" when no
    * hits. One tokenize pass over the text (native kernel) — the old
    * form ran one alternation regex per language per row, and at two
    * evaluations per row (filter + project, as in t17) the duplicated
    * when-chains dominated whole queries. */
  def langId(text: Column): Column =
    // coalesce: NULL text is "und" (no hits), as in the old when-fold
    // and the DuckDB twin's CASE (NULL > 0 is false at every step)
    coalesce(graft.expressions.TextHash.langId(text), lit("und"))

  /** Quality score in [0,1]:
    *   0.4·min(1, chars/500) + 0.3·(1 − punct/chars) + 0.3·min(1, 10·stop/tokens)
    * rounded to 4 decimals. Guards against zero-length via greatest(·,1).
    * The +1e-9 nudge before rounding pushes knife's-edge values (x.xxxx5
    * exactly, e.g. 0.86445) off the half-way boundary the same way in
    * both engines — Spark rounds the exact binary value (BigDecimal
    * HALF_UP) while DuckDB scales-then-rounds, and they disagree only
    * within ~1e-12 of the boundary. */
  def qualityScore(text: Column): Column =
    // fused one-pass kernel (chars/punct/tokens in a single scan +
    // stopword token count) with the identical left-assoc double math
    // and Spark round semantics; the regex composition survives as the
    // DuckDB oracle twin below
    graft.expressions.TextHash.qualityScore(text)

  /** Intra-document repetition signals (Gopher/C4-style quality
    * filters) as one fused pass: array<double>
    * [dup_token_frac, top_bigram_frac] where
    *   dup_token_frac  = 1 − distinct_tokens / tokens   (0 when empty)
    *   top_bigram_frac = modal-bigram count / (tokens−1) (0 when < 2).
    * High values flag boilerplate/spam documents that survive
    * per-character quality scoring. Consume both elements from ONE
    * select — project-level common-subexpression elimination runs the
    * kernel once per row. */
  def repetitionStats(text: Column): Column =
    graft.expressions.TextHash.repetitionStats(text)

  /** Rolling polynomial fingerprint over normalized tokens:
    * fold(h, tok) = (h*31 + tokHash) mod 2^31-1, where tokHash is the
    * first 32 bits of md5(token) — md5 is standardized, so the fold is
    * bit-identical across engines and the DuckDB oracle reproduces it
    * exactly (crc32/murmur are not available/portable there). */
  def rollingFingerprint(text: Column): Column =
    // one-pass kernel (thread-cached MessageDigest); the HOF aggregate
    // it replaces walked an interpreted md5 expression tree per token.
    // The SQL twin below remains the fold's specification.
    graft.expressions.TextHash.rollingFingerprint(text)

  /** Redaction patterns for pre-training cleanup: plain character-class
    * regexes with identical semantics in Java (Spark) and RE2 (DuckDB).
    * Applied in order; each match is replaced by its tag. */
  val redactionPatterns: Seq[(String, String)] = Seq(
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+" -> "<EMAIL>",
    "https?://[^ \\t\\n]+" -> "<URL>",
    "[0-9][0-9 .-]{7,}[0-9]" -> "<NUM>")

  /** Redact emails / URLs / long number runs (phone-like) — the
    * standard PII scrub before text enters a training corpus. */
  def redact(text: Column): Column =
    redactionPatterns.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Count of redactions a pattern would make. */
  def redactionCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** DuckDB-dialect twins of every operator above. Used to build
    * `SparkEntry.oracleSql`; kept here so a change to a Spark definition
    * forces the reviewer past its SQL twin. */
  object Sql {
    def normalizeText(c: String): String =
      s"trim(regexp_replace(lower($c), '[^a-z0-9]+', ' ', 'g'))"

    def tokenCount(c: String): String =
      s"CAST(len(regexp_extract_all($c, '\\S+')) AS INT)"

    def fingerprint(c: String): String = s"md5(${normalizeText(c)})"

    def prefixFingerprint(c: String, n: Int): String =
      s"md5(substr(${normalizeText(c)}, 1, $n))"

    def stopwordHits(c: String, words: Seq[String]): String = {
      val inList = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(string_split(${normalizeText(c)}, ' '), t -> list_contains($inList, t))) AS INT)"
    }

    def langId(c: String): String = {
      val hitExprs = langStopwords.map { case (lang, words) =>
        lang -> stopwordHits(c, words)
      }
      // same left-fold strict-max semantics as the Column version
      val init = ("'und'", "0")
      val (bestLang, _) = hitExprs.foldLeft(init) { case ((bl, bh), (lang, h)) =>
        (s"(CASE WHEN $h > $bh THEN '$lang' ELSE $bl END)",
          s"(CASE WHEN $h > $bh THEN $h ELSE $bh END)")
      }
      bestLang
    }

    /** Distinct word-n-gram shingle set of the normalized text as a
      * DuckDB list — the twin of [[graft.expressions.TextHashImpl.shingleHashes]]
      * semantics (the Spark side compares 64-bit shingle hashes; equal
      * strings hash equal, distinct strings collide with negligible
      * probability, so set sizes agree). */
    def shingleSet(c: String, n: Int): String = {
      val toks = s"string_split(${normalizeText(c)}, ' ')"
      val gram = (0 until n).map(j => s"t[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
      s"(SELECT list_distinct(list_transform(generate_series(1, greatest(len(t) - ${n - 1}, 0)), i -> $gram)) FROM (SELECT $toks AS t) _sh)"
    }

    /** Jaccard of two DuckDB lists (already distinct), 4 dp; 0.0 when
      * both are empty. */
    def listJaccard(a: String, b: String): String =
      s"""CASE WHEN len(list_distinct(list_concat($a, $b))) = 0 THEN 0.0
         |     ELSE round(CAST(len(list_distinct(list_intersect($a, $b))) AS DOUBLE)
         |                / len(list_distinct(list_concat($a, $b))), 4) END""".stripMargin

    /** DuckDB twin of [[TextFunctions.redact]] (regexp_replace with the
      * 'g' flag — Spark's regexp_replace is global by default). DuckDB
      * string literals keep backslashes verbatim, so the Java-side
      * pattern strings pass through unchanged. */
    def redact(c: String): String =
      redactionPatterns.foldLeft(c) { case (e, (pat, tag)) =>
        s"regexp_replace($e, '$pat', '$tag', 'g')"
      }

    def redactionCount(c: String, pattern: String): String =
      s"CAST(len(regexp_extract_all($c, '$pattern')) AS INT)"

    /** DuckDB twin of [[TextFunctions.rollingFingerprint]]. */
    def rollingFingerprint(c: String): String = {
      val toks = s"string_split(${normalizeText(c)}, ' ')"
      val hashes = s"list_transform($toks, t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT))"
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $hashes), (h, x) -> (h * 31 + x) % 2147483647)"
    }

    /** DuckDB twins of [[TextFunctions.repetitionStats]] — identical
      * IEEE expression shape (CAST to DOUBLE before the division, same
      * CASE guards), counting literal token/bigram strings like the
      * kernel does. */
    def dupTokenFrac(c: String): String = {
      val toks = s"string_split(${normalizeText(c)}, ' ')"
      s"""(CASE WHEN ${normalizeText(c)} = '' THEN 0.0
         |  ELSE 1.0 - CAST(len(list_distinct($toks)) AS DOUBLE) / len($toks) END)""".stripMargin
    }

    def topBigramFrac(c: String): String = {
      val toks = s"string_split(${normalizeText(c)}, ' ')"
      val bigrams = s"list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])"
      // modal bigram count via per-distinct-bigram recount (documents
      // are dozens of tokens; the oracle runs at verification scale)
      s"""(SELECT CASE WHEN len(t) < 2 THEN 0.0
         |  ELSE CAST(list_max(list_transform(list_distinct(b),
         |         x -> len(list_filter(b, y -> y = x)))) AS DOUBLE) / (len(t) - 1) END
         |FROM (SELECT t, $bigrams AS b FROM (SELECT $toks AS t) _t0) _t1)""".stripMargin
    }

    def qualityScore(c: String): String = {
      val chars = s"CAST(greatest(length($c), 1) AS DOUBLE)"
      val punct = s"CAST(len(regexp_extract_all($c, '[^a-zA-Z0-9\\s]')) AS DOUBLE)"
      val toks = s"CAST(greatest(${tokenCount(c)}, 1) AS DOUBLE)"
      val stop = s"CAST(${stopwordHits(c, langStopwords.head._2)} AS DOUBLE)" // token-membership twin of the kernel
      s"round(least($chars / 500.0, 1.0) * 0.4 + (1.0 - $punct / $chars) * 0.3 + least($stop * 10.0 / $toks, 1.0) * 0.3 + 1e-9, 4)"
    }
  }
}
