package graft.expressions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-hashing kernels backing the native Catalyst expressions
  * in [[TextHash]]. Each method makes a single scan over the
  * input string — tokenization, shingling, and all k hash families are
  * fused — replacing chains of interpreted higher-order-function
  * expressions that re-derived the token/shingle arrays per hash family.
  *
  * All hashing is splitmix64-style (deterministic, seed-free), so results
  * are identical across executors, runs, and partitionings. Methods are
  * exposed on the companion class via static forwarders so generated
  * (janino) code can call them directly.
  */
object TextHashImpl {

  /** splitmix64 finalizer — strong 64-bit mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Tokens of the normalized text (lowercase, alnum runs), identical in
    * semantics to `TextFunctions.tokens`: lowercase → collapse non-alnum
    * runs → split. Lowercasing uses the full-string mapping (same
    * one-to-many behavior as SQL `lower()`: e.g. U+0130 'İ' → "i" +
    * combining dot, not a bare 'i'), so the kernel and the regex/oracle
    * twin agree beyond ASCII too. Locale.ROOT pins the mapping: under
    * tr/az default locales 'I' would lowercase to dotless 'ı' and be
    * dropped, silently diverging from the locale-independent oracle. */
  def tokenize(s: String): Array[String] = {
    val str = s.toLowerCase(java.util.Locale.ROOT)
    val out = Array.newBuilder[String]
    val sb = new java.lang.StringBuilder()
    var i = 0
    val len = str.length
    while (i < len) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.result()
  }

  /** Canonical normalization: lowercase, collapse non-alphanumeric runs
    * to single spaces, trim — byte-for-byte the semantics of
    * `trim(regexp_replace(lower(s), "[^a-z0-9]+", " "))` in one pass
    * over the lowercased string (full-string mapping and Locale.ROOT
    * pinning, see [[tokenize]]). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(str.length)
    var pendingSpace = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** 64-bit hashes of the word n-gram shingles of `s` (rolling window of
    * per-token hashes combined polynomially, then mixed). Empty when the
    * text has fewer than n tokens. */
  def shingleHashes(s: String, n: Int): Array[Long] = {
    val toks = tokenize(s)
    if (toks.length < n) return Array.emptyLongArray
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { th(i) = mix64(hashString(toks(i))); i += 1 }
    val out = new Array[Long](toks.length - n + 1)
    i = 0
    while (i + n <= toks.length) {
      var h = 1125899906842597L
      var j = 0
      while (j < n) { h = h * 31 + th(i + j); j += 1 }
      out(i) = mix64(h)
      i += 1
    }
    out
  }

  /** [[shingleHashes]] boxed for the Catalyst expression layer. */
  def shingleHashesData(s: UTF8String, n: Int): ArrayData =
    new GenericArrayData(shingleHashes(s.toString, n))

  /** 64-bit hashes of EVERY L-char window (stride 1) of `s` — the
    * character-granularity twin of [[shingleHashes]], for
    * exact-substring dedup below the token-k-gram grid (Lee et al.'s
    * suffix-array ExactSubstr target: any shared substring of length
    * ≥ L contains a shared L-char window, so window hits + interval
    * merge recover every MAXIMAL shared substring, byte-precise).
    * Positions are Java char offsets; callers feed NORMALIZED text
    * ([a-z0-9 ] ASCII), where char == code point == what DuckDB's
    * substring() counts — the oracle replays positions exactly.
    * O(len) via a polynomial ROLLING hash mod 2^64 (h·31 + c in, the
    * leading c·31^(L−1) term subtracted out), each window mixed
    * through [[mix64]] at emit so raw-polynomial adjacency never
    * correlates bucket keys. Empty for text shorter than L. */
  def charShingleHashes(s: String, L: Int): Array[Long] = {
    val len = s.length
    if (len < L) return Array.emptyLongArray
    var pow = 1L // 31^(L-1) mod 2^64
    var j = 1
    while (j < L) { pow *= 31L; j += 1 }
    val out = new Array[Long](len - L + 1)
    var h = 0L
    var i = 0
    while (i < L) { h = h * 31L + s.charAt(i); i += 1 }
    out(0) = mix64(h)
    while (i < len) {
      h = (h - s.charAt(i - L) * pow) * 31L + s.charAt(i)
      out(i - L + 1) = mix64(h)
      i += 1
    }
    out
  }

  /** [[charShingleHashes]] boxed for the Catalyst expression layer. */
  def charShingleHashesData(s: UTF8String, L: Int): ArrayData =
    new GenericArrayData(charShingleHashes(s.toString, L))

  /** Stopword lists per language for the language-ID heuristic — the
    * canonical table (TextFunctions re-exports it; the DuckDB oracle
    * twin inlines the same lists). Deliberately tiny and fixed: the
    * operator contract is the heuristic, not linguistic accuracy.
    * Counting is TOKEN membership over [[tokenize]] — one pass, no
    * regex; for alphanumeric tokens this is exactly the old
    * `\b(w1|w2|…)\b` match count, without per-engine regex semantics
    * in the contract. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por", "con"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "les", "des", "est", "une", "dans", "pour", "qui"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta", "men")
  )

  /** token → indexes of every language whose list contains it (words
    * overlap across languages: "de" is Spanish AND the Chinese pinyin
    * list, "le" French and pinyin). */
  private val tokenLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    for (((_, words), li) <- langStopwords.zipWithIndex; w <- words) {
      val prev = Option(m.get(w)).getOrElse(Array.emptyIntArray)
      m.put(w, prev :+ li)
    }
    m
  }

  private val langCodes: Array[String] = langStopwords.map(_._1).toArray
  private val perLangSets: Array[java.util.HashSet[String]] =
    langStopwords.map { case (_, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray

  /** Per-language stopword hit counts in one tokenize pass. */
  private def langHits(s: String): Array[Int] = {
    val toks = tokenize(s)
    val hits = new Array[Int](langCodes.length)
    var i = 0
    while (i < toks.length) {
      val ls = tokenLangs.get(toks(i))
      if (ls != null) {
        var j = 0
        while (j < ls.length) { hits(ls(j)) += 1; j += 1 }
      }
      i += 1
    }
    hits
  }

  /** Heuristic language ID: argmax of per-language stopword hits, ties
    * to the earlier list entry; "und" when no hits. */
  def langId(s: UTF8String): UTF8String = {
    val hits = langHits(s.toString)
    var best = -1
    var bh = 0
    var i = 0
    while (i < hits.length) {
      if (hits(i) > bh) { bh = hits(i); best = i }
      i += 1
    }
    UTF8String.fromString(if (best < 0) "und" else langCodes(best))
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Rolling polynomial fingerprint over normalized tokens —
    * fold(h, tok) = (h·31 + tokHash) mod (2^31 − 1), tokHash = first 32
    * bits of md5(token). One pass with a thread-cached digest; the
    * higher-order-function composition it replaces walked an
    * interpreted md5 expression tree per token (Spark's `aggregate`
    * lambda is CodegenFallback). md5 stays the per-token hash so the
    * DuckDB twin reproduces the fold bit-identically. */
  def rollingFingerprint(s: UTF8String): Long = {
    // normalize → split(" ", -1): empty text folds one empty token,
    // exactly like split(normalize_text, ' ') in the Column/SQL twins
    val parts = normalize(s).toString.split(" ", -1)
    val md = md5Digest.get()
    var h = 0L
    var i = 0
    while (i < parts.length) {
      md.reset()
      val d = md.digest(parts(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars == the top 4 digest bytes, big-endian unsigned
      val tokHash = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      h = (h * 31L + tokHash) % 2147483647L
      i += 1
    }
    h
  }

  /** RE2's `\s` set — `[\t\n\f\r ]`, WITHOUT vertical tab. The DuckDB
    * (RE2) regex twins are the oracle spec, so the kernel follows RE2;
    * Java's `\s` additionally contains `\x0B`, which therefore counts
    * as a (non-whitespace) punctuation character here, exactly as the
    * `[^a-zA-Z0-9\s]` twin classifies it. */
  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r'

  @inline private def isAlnum(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9')

  /** Whitespace-run token count — one pass, equal to
    * `len(regexp_extract_all(text, '\S+'))`. Counts code points like
    * SQL `length()` does. */
  def wsTokenCount(s: UTF8String): Int = {
    val str = s.toString
    var i = 0
    var count = 0
    var inTok = false
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (isWs(cp)) inTok = false
      else if (!inTok) { count += 1; inTok = true }
      i += Character.charCount(cp)
    }
    count
  }

  /** The [[qualityScore]] scan's raw counts exposed individually —
    * array<double> [chars, punct, toks] (exact small integers, so the
    * double carriage is lossless) for consumers that LEARN the
    * weighting instead of using the fixed heuristic (the t53 trained
    * classifier). Same code-point / RE2-`\s` / alnum classification as
    * [[qualityScore]], whose regex twins remain the oracle spec. */
  def qualityStats(s: UTF8String): ArrayData = {
    val str = s.toString
    var i = 0
    var nChars = 0
    var punct = 0
    var toks = 0
    var inTok = false
    while (i < str.length) {
      val cp = str.codePointAt(i)
      nChars += 1
      if (isWs(cp)) inTok = false
      else {
        if (!inTok) { toks += 1; inTok = true }
        if (!isAlnum(cp)) punct += 1
      }
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array(nChars.toDouble, punct.toDouble, toks.toDouble))
  }

  /** [[graft.functions.TextFunctions.qualityScore]] fused into one text
    * pass: chars / punctuation / \S+-token counts in a single scan plus
    * the stopword-token count, combined with EXACTLY the same
    * left-associated double arithmetic and Spark `round` semantics
    * (BigDecimal HALF_UP on the exact binary value) as the Column
    * composition it replaces — the DuckDB regex twin stays the oracle. */
  def qualityScore(s: UTF8String): Double = {
    val str = s.toString
    var i = 0
    var nChars = 0
    var punct = 0
    var toks = 0
    var inTok = false
    while (i < str.length) {
      val cp = str.codePointAt(i)
      nChars += 1
      if (isWs(cp)) inTok = false
      else {
        if (!inTok) { toks += 1; inTok = true }
        if (!isAlnum(cp)) punct += 1
      }
      i += Character.charCount(cp)
    }
    val chars = math.max(nChars, 1).toDouble
    val nToks = math.max(toks, 1).toDouble
    val stop = stopwordHits(s, 0).toDouble
    val v = math.min(chars / 500.0, 1.0) * 0.4 +
      (1.0 - punct / chars) * 0.3 +
      math.min(stop * 10.0 / nToks, 1.0) * 0.3 + 1e-9
    new java.math.BigDecimal(v).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Stopword hit count for one language (index into [[langStopwords]]). */
  def stopwordHits(s: UTF8String, langIdx: Int): Int = {
    val set = perLangSets(langIdx)
    val toks = tokenize(s.toString)
    var c = 0
    var i = 0
    while (i < toks.length) {
      if (set.contains(toks(i))) c += 1
      i += 1
    }
    c
  }

  /** Intra-document repetition signals (the Gopher/C4-style quality
    * filters): one tokenize pass yields
    *   [0] dup_token_frac  = 1 − distinct_tokens / tokens   (0 when empty)
    *   [1] top_bigram_frac = max bigram count / (tokens − 1) (0 when < 2)
    * Raw (unrounded) fractions — the query layer rounds with the
    * engine-portable +1e-9 nudge. Counting uses per-call hash maps over
    * the document's own tokens (bounded by document size, never corpus
    * size); bigram keys are the literal adjacent-token strings, exactly
    * what the DuckDB twin counts — no hashing in the contract. */
  def repetitionStats(s: UTF8String): ArrayData = {
    val toks = tokenize(s.toString)
    if (toks.length == 0) return new GenericArrayData(Array(0.0, 0.0))
    // distinct COUNT is all dupFrac needs — a set, not a count map
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) { seen.add(toks(i)); i += 1 }
    val dupFrac = 1.0 - seen.size.toDouble / toks.length
    var topBigram = 0
    if (toks.length >= 2) {
      val big = new java.util.HashMap[String, Integer]()
      i = 0
      while (i + 1 < toks.length) {
        val key = toks(i) + " " + toks(i + 1)
        val prev = big.get(key)
        val c = if (prev == null) 1 else prev + 1
        big.put(key, c)
        if (c > topBigram) topBigram = c
        i += 1
      }
    }
    val topFrac =
      if (toks.length < 2) 0.0 else topBigram.toDouble / (toks.length - 1)
    new GenericArrayData(Array(dupFrac, topFrac))
  }

  @inline private def hashString(t: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < t.length) { h = h * 31 + t.charAt(i); i += 1 }
    h
  }

  /** k-wide MinHash signature over the n-gram shingle set: family j is
    * the splitmix64 mix of (shingleHash ^ seed_j). Docs with < n tokens
    * have an empty shingle set and get a NULL signature — never a
    * sentinel that would collide all short docs into every LSH bucket
    * (Jaccard with an empty set is 0, so they match nothing). */
  def minHash(s: UTF8String, n: Int, k: Int): ArrayData = {
    val hs = shingleHashes(s.toString, n)
    if (hs.isEmpty) return null
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < k) {
        val m = mix64(h ^ (j * 0xc2b2ae3d27d4eb4fL))
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Per-band hashes of the MinHash signature (LSH banding), fused with
    * the signature computation so one expression eval produces the
    * explode-ready band array. Contract: `rowsPerBand` must divide `k`
    * evenly — ragged widths throw IllegalArgumentException (via
    * [[bandHashes]]) rather than silently dropping trailing signature
    * lanes, which would quietly degrade banding recall. */
  def minHashBands(s: UTF8String, n: Int, k: Int, rowsPerBand: Int): ArrayData = {
    val sigData = minHash(s, n, k)
    if (sigData == null) return null
    bandHashes(sigData, rowsPerBand)
  }

  /** Band hashes from an ALREADY-COMPUTED signature — the stored-index
    * path (incremental dedup): [[minHashBands]] ≡ this ∘ [[minHash]]
    * (asserted in CodegenParitySpec), so bands derived from a persisted
    * signature table land in the same buckets the text kernel would. */
  def bandHashes(sigData: ArrayData, rowsPerBand: Int): ArrayData = {
    val sig = sigData.toLongArray()
    if (sig.length % rowsPerBand != 0)
      throw new IllegalArgumentException(
        s"band_hashes: signature width ${sig.length} not divisible by rowsPerBand=$rowsPerBand")
    val nBands = sig.length / rowsPerBand
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 1125899906842597L
      var j = 0
      while (j < rowsPerBand) { h = h * 31 + sig(b * rowsPerBand + j); j += 1 }
      out(b) = mix64(h)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Fraction of agreeing positions between two equal-width signatures —
    * the unbiased MinHash estimate of Jaccard similarity. Unequal widths
    * are an error (an UnsafeArrayData shorter `b` would otherwise be
    * read out of bounds — silently wrong, not a crash). */
  def sigAgreement(a: ArrayData, b: ArrayData): Double = {
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"minhash_agreement: signature width mismatch (${a.numElements()} vs ${b.numElements()})")
    val k = a.numElements()
    var agree = 0
    var i = 0
    while (i < k) {
      if (a.getLong(i) == b.getLong(i)) agree += 1
      i += 1
    }
    agree.toDouble / k
  }

  /** Exact Jaccard similarity of the two texts' distinct n-gram shingle
    * sets (hash-set based; collisions at 64 bits are negligible). */
  def ngramJaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    val ha = shingleHashes(a.toString, n)
    val hb = shingleHashes(b.toString, n)
    val sa = new java.util.HashSet[Long]()
    var i = 0
    while (i < ha.length) { sa.add(ha(i)); i += 1 }
    val sb = new java.util.HashSet[Long]()
    i = 0
    while (i < hb.length) { sb.add(hb(i)); i += 1 }
    if (sa.isEmpty && sb.isEmpty) return 0.0
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) { if (sa.contains(it.next())) inter += 1 }
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** 64-bit SimHash over the tokens: bit i of the result is the sign of
    * the sum over tokens of ±1 votes from bit i of the token's hash. */
  def simHash(s: UTF8String): Long = {
    val toks = tokenize(s.toString)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = mix64(hashString(toks(i)))
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}
