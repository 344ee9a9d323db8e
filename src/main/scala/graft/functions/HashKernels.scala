package graft.functions

import java.nio.charset.StandardCharsets
import java.util.Locale

/** Tight JVM kernels behind the text-hash Catalyst expressions.
  *
  * Every hash is md5-derived exactly like the column-expression
  * formulation they replace (`conv(substr(md5(s),1,15),16,10)` — the
  * top 60 bits of the digest), so the DuckDB oracles reproduce each
  * stage bit-for-bit; these kernels only change HOW the same numbers
  * are computed (one tight loop instead of 16 interpreted
  * higher-order-function passes per row). */
object HashKernels {

  val P: Long = 1000000007L

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(s) = `('0x'||substring(md5(s),1,15))::BIGINT`. */
  def md5_60(s: String): Long = {
    val d = md.get(); d.reset()
    val b = d.digest(s.getBytes(StandardCharsets.UTF_8))
    val top =
      ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8)  |  (b(7) & 0xffL)
    top >>> 4
  }

  /** `string_split(lower(s), ' ')` — single-space split KEEPING empty
    * tokens (Java's default split drops trailing empties; -1 keeps
    * them, matching Spark's split() and DuckDB's string_split). */
  def tokens(s: String): Array[String] =
    s.toLowerCase(Locale.ROOT).split(" ", -1)

  /** Hashes of the distinct tokens (first-occurrence order). */
  def tokensDistinct60(s: String): Array[Long] = {
    val tk = tokens(s)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < tk.length) { seen.add(tk(i)); i += 1 }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = md5_60Memo(it.next()); j += 1 }
    out
  }

  /** Bounded per-thread token→hash memo: token streams are Zipf, so
    * almost every md5 after warm-up is a recompute of a head token.
    * The memo is pure caching (the hash is a deterministic function of
    * the token), capped at 32k entries (~1.5 MB/thread) and cleared on
    * overflow — worst case it degrades to plain md5, never to
    * unbounded state. */
  private val tokenMemo = ThreadLocal.withInitial[
    java.util.HashMap[String, java.lang.Long]](() =>
    new java.util.HashMap[String, java.lang.Long](1 << 16))
  private final val TokenMemoCap = 1 << 15

  private def md5_60Memo(s: String): Long = {
    val m = tokenMemo.get()
    val hit = m.get(s)
    if (hit != null) return hit.longValue()
    val h = md5_60(s)
    if (m.size() >= TokenMemoCap) m.clear()
    m.put(s, h)
    h
  }

  /** Hash of EVERY token in order (duplicates kept) — the positional
    * twin of `tokensDistinct60`, for n-gram models where position
    * matters. */
  def tokensAll60(s: String): Array[Long] = {
    val tk = tokens(s)
    val out = new Array[Long](tk.length)
    var i = 0
    while (i < tk.length) { out(i) = md5_60Memo(tk(i)); i += 1 }
    out
  }

  /** Hash of the n-gram shingle at EVERY position (duplicates kept,
    * optional hash-domain prefix); < n tokens → empty. The positional
    * twin of `shingles60`, for substring-dedup/winnowing kernels
    * where each occurrence (not each distinct gram) is a row. */
  def shinglesPos60(s: String, n: Int, prefix: String): Array[Long] = {
    val tk = tokens(s)
    if (tk.length < n) return Array.emptyLongArray
    // unigrams are the Zipf-memoizable case (multi-token grams are
    // mostly corpus-unique, not worth the map)
    if (n == 1 && prefix.isEmpty) {
      val out = new Array[Long](tk.length)
      var i = 0
      while (i < tk.length) { out(i) = md5_60Memo(tk(i)); i += 1 }
      return out
    }
    val out = new Array[Long](tk.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= tk.length - n) {
      sb.setLength(0)
      sb.append(prefix)
      var o = 0
      while (o < n) {
        if (o > 0) sb.append(' ')
        sb.append(tk(i + o)); o += 1
      }
      out(i) = md5_60(sb.toString); i += 1
    }
    out
  }

  /** Hashes of the distinct word n-gram shingles; < n tokens → empty. */
  def shingles60(s: String, n: Int): Array[Long] = {
    val tk = tokens(s)
    if (tk.length < n) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= tk.length - n) {
      sb.setLength(0)
      var o = 0
      while (o < n) {
        if (o > 0) sb.append(' ')
        sb.append(tk(i + o)); o += 1
      }
      seen.add(sb.toString); i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = md5_60(it.next()); j += 1 }
    out
  }

  /** Distinct word n-gram shingles as STRINGS (first-occurrence
    * order); < n tokens → empty. Same loop as `shingles60` without the
    * hashing — for n-gram counting, where the gram itself is the key. */
  def shingleStrings(s: String, n: Int): Array[String] = {
    val tk = tokens(s)
    if (tk.length < n) return Array.empty[String]
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= tk.length - n) {
      sb.setLength(0)
      var o = 0
      while (o < n) {
        if (o > 0) sb.append(' ')
        sb.append(tk(i + o)); o += 1
      }
      seen.add(sb.toString); i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** MinHash signature over pre-hashed values: for permutation j,
    * min over h of (A_j·(h mod P) + B_j) mod P — one pass for all
    * permutations. Empty input → all-P sentinel (never matches a real
    * signature, and callers filter empty shingle sets anyway). */
  def minhashSig(hs: Array[Long], permA: Array[Long], permB: Array[Long]): Array[Long] = {
    val k = permA.length
    val out = Array.fill(k)(P)
    var i = 0
    while (i < hs.length) {
      val hm = hs(i) % P
      var j = 0
      while (j < k) {
        val v = (permA(j) * hm + permB(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    out
  }

  /** SimHash over pre-hashed values: bit i set when more than half the
    * hashes have bit i set. */
  def simhash(hs: Array[Long], nBits: Int): Long = {
    val counts = new Array[Int](nBits)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var b = 0
      while (b < nBits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < nBits) {
      if (2 * counts(b) > hs.length) out |= (1L << b)
      b += 1
    }
    out
  }

  /** One-pass token statistics: (nTokens, nDistinct, sumLen, nStop).
    * Same numbers as the split/distinct/filter column chain in
    * TextAnalysis.stats, one traversal. */
  def tokenStats(s: String, stopwords: java.util.Set[String]): (Int, Int, Long, Int) = {
    val tk = tokens(s)
    val seen = new java.util.HashSet[String]()
    var sumLen = 0L
    var nStop = 0
    var i = 0
    while (i < tk.length) {
      val t = tk(i)
      seen.add(t)
      sumLen += t.length
      if (stopwords.contains(t)) nStop += 1
      i += 1
    }
    (tk.length, seen.size, sumLen, nStop)
  }

  /** One-pass marker-word language ID: hit count per profile over the
    * token stream, deterministic argmax with profile-order ties. */
  def langId(s: String, profiles: Array[(String, java.util.Set[String])]): String = {
    val tk = tokens(s)
    val scores = new Array[Int](profiles.length)
    var i = 0
    while (i < tk.length) {
      var j = 0
      while (j < profiles.length) {
        if (profiles(j)._2.contains(tk(i))) scores(j) += 1
        j += 1
      }
      i += 1
    }
    var best = 0
    var bestJ = -1
    var j = 0
    while (j < profiles.length) {
      if (scores(j) > best) { best = scores(j); bestJ = j }
      j += 1
    }
    if (bestJ < 0) "und" else profiles(bestJ)._1
  }

  /** md5 hex of the sorted distinct token set — the canonical
    * bag-of-words fingerprint
    * (`md5(concat_ws(' ', array_sort(array_distinct(split(lower(t), ' ')))))`
    * fused into one pass). */
  def bowMd5(s: String): String = {
    val tk = tokens(s)
    val seen = new java.util.TreeSet[String]()
    var i = 0
    while (i < tk.length) { seen.add(tk(i)); i += 1 }
    val sb = new java.lang.StringBuilder()
    val it = seen.iterator()
    while (it.hasNext) {
      if (sb.length > 0) sb.append(' ')
      sb.append(it.next())
    }
    val d = md.get(); d.reset()
    val bytes = d.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = Character.forDigit((bytes(j) >> 4) & 0xf, 16)
      hex(2 * j + 1) = Character.forDigit(bytes(j) & 0xf, 16)
      j += 1
    }
    new String(hex)
  }

  /** BPE-ish token COUNT without materializing the match array:
    * maximal `[a-z]+` runs, maximal `[0-9]+` runs, and every other
    * non-space code point each count one — the same matches
    * `regexp_extract_all(lower(s), '[a-z]+|[0-9]+|[^a-z0-9 ]')` finds,
    * counted in a single scan. */
  def bpeTokenCount(s: String): Int = {
    val lc = s.toLowerCase(Locale.ROOT)
    var count = 0
    var i = 0
    var run = 0 // 0 = none, 1 = letter run, 2 = digit run
    while (i < lc.length) {
      val cp = lc.codePointAt(i)
      if (cp >= 'a' && cp <= 'z') {
        if (run != 1) { count += 1; run = 1 }
      } else if (cp >= '0' && cp <= '9') {
        if (run != 2) { count += 1; run = 2 }
      } else {
        if (cp != ' ') count += 1
        run = 0
      }
      i += Character.charCount(cp)
    }
    count
  }

  /** Polynomial rolling hash over code points:
    * h = (h·31 + codepoint) mod P — matches
    * `list_reduce(... ascii(c) ...)` in the DuckDB oracle. */
  def rollingHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Deflate compression ratio (compressed/raw bytes of the UTF-8
    * text, level 6) — the RefinedWeb/Gopher-style redundancy signal:
    * boilerplate and template spam compress far below natural prose.
    * Deterministic for a fixed JVM zlib; the engine-side laws
    * (repetitive < natural < incompressible, bounds) are spec-pinned
    * rather than oracle-checked since no SQL engine deflates. */
  def compressionRatio(s: String): Double = {
    val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length
    } finally d.end()
  }

  /** Character-level Shannon entropy (bits/char) over code points, made
    * hash-reproducible across engines: each per-character term
    * log10(cnt/n) (log10 because Spark's Log10 already hash-matches
    * DuckDB's in `text_unigram_logprob`) is rounded HALF_UP to 9
    * decimals (DuckDB `round` semantics) and carried as exact integer
    * nano-units, so the sum is order-insensitive; the final double
    * −(Σ(cnt·term)/1e9/n)/log10(2) is then bit-identical to the
    * oracle's decimal-sum spelling. |log10 p|·1e9 ≤ ~2e10 and cnt ≤ n,
    * so cnt·term fits a Long for docs < ~10^8 chars. One pass per
    * row — no shuffle, no explode. */
  def charEntropy(s: String): Double = {
    val counts = new java.util.HashMap[Integer, Long]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0.0
    var sumNanos = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val cnt = it.next()
      val term = java.math.BigDecimal
        .valueOf(Math.log10(cnt.toDouble / n))
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      sumNanos += cnt * term
    }
    // correctly-rounded decimal->double (what Spark's Decimal.toDouble
    // and DuckDB's ::DOUBLE both do), NOT toDouble/1e9 (one ulp off)
    val sum = java.math.BigDecimal.valueOf(sumNanos, 9).doubleValue()
    -(sum / n) / Math.log10(2.0)
  }
}
