package graft.engine.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot numeric loops.
  *
  * The declarative formulations (`aggregate(zip_with(...))` for dot
  * products, per-character lambda folds for hashes) are interpreted —
  * one boxed lambda invocation per element. For a 64-dim dot product
  * evaluated a million times per pairwise query, that interpretation
  * overhead dominates the runtime (~10× the arithmetic). These
  * expressions evaluate in one tight primitive-array loop and stay
  * inside whole-stage codegen via a static call, exactly the
  * "custom Expression beats UDF" tier of the design guidelines.
  *
  * Semantics are bit-identical to the declarative forms (same
  * left-to-right IEEE fold order, same modulus), so the DuckDB oracle
  * SQL — which mirrors the declarative form — is unchanged.
  */
object VectorOps {
  /** Left-fold dot product: Σ a(i)·b(i) in index order (IEEE order
    * matches `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, +)`).
    *
    * CONTRACT: equal-length arrays of non-null doubles (every engine
    * embedding column is fixed-dimension, non-null). Ragged inputs
    * fold to min-length — unlike the declarative form, which nulls out
    * (zip_with pads) — so don't point this at data that can be ragged
    * without normalizing first. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  /** Left-fold squared L2 distance: Σ (a(i)−b(i))² in index order
    * (IEEE order matches
    * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, +)`).
    * Same equal-length contract as [[dot]]. */
  def l2(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { val d = x(i) - y(i); s += d * d; i += 1 }
    s
  }

  /** 31-base polynomial rolling hash over code points, mod 1e9+7 —
    * matches `aggregate(split(s, ''), 0L, (h, c) -> (h*31 + ascii(c)) % p)`
    * and the DuckDB list_reduce twin. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31 + cp) % 1000000007L
    }
    h
  }

  /** Maximal `[a-z0-9]+` runs of the lower-cased text — byte-for-byte
    * the result of `regexp_extract_all(lower(text), '[a-z0-9]+')`,
    * without the java.util.regex machinery (the tokenizer is the hot
    * inner loop of the whole text family). Equivalence argument: after
    * [[UTF8String.toLowerCase]] (the same call Spark's `lower()`
    * makes), the pattern's alphabet is pure ASCII, and in UTF-8 every
    * non-ASCII code point consists solely of bytes ≥ 0x80 — so a
    * maximal run of matching CODE POINTS is exactly a maximal run of
    * matching BYTES, and a byte scan needs no decoding. TokensSpec
    * fuzzes the equivalence against the regexp spelling on random
    * unicode strings; the DuckDB oracles keep the regexp form. */
  def tokens(text: UTF8String): ArrayData = {
    val b = text.toLowerCase.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        while (i < n && {
          val d = b(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, i))
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  private val ShingleSep = UTF8String.fromString(" ")

  /** Distinct 3-token shingles of a token array, first-occurrence
    * order — the closed form of the transform-over-sequence spelling
    * (`array_distinct(transform(sequence(1, n-2), i ->
    * concat(t[i], ' ', t[i+1], ' ', t[i+2])))`, ShinglesSpec fuzzes
    * the equivalence; the DuckDB oracles keep the declarative form).
    * The HOF spelling runs an interpreted lambda per window with three
    * boxed element_at calls plus a separate array_distinct pass; this
    * is one scan with a LinkedHashSet (UTF8String equality is byte
    * equality — exactly Spark's default-collation string equality).
    * Fewer than 3 tokens → empty set, matching the guarded CASE.
    * A window containing a NULL token folds to a null element —
    * exactly what the replaced spelling's `concat` does (null-in →
    * null-out, then array_distinct keeps one null); the session
    * registers this as SQL, so user arrays with null elements must not
    * NPE (they did until round 15). */
  def shingles(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= n - 3) {
      if (toks.isNullAt(i) || toks.isNullAt(i + 1) || toks.isNullAt(i + 2))
        seen.add(null)
      else seen.add(UTF8String.concatWs(ShingleSep,
        toks.getUTF8String(i), toks.getUTF8String(i + 1),
        toks.getUTF8String(i + 2)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Per-element [[polyHash]] of a token array — the closed form of
    * `transform(toks, t -> graft_polyhash(t))`, whose outer lambda runs
    * interpreted per token even though the hash itself is native
    * (the simhash fingerprint queries' hottest map stage after
    * tokenization). ShinglesSpec fuzzes the equivalence. NULL tokens
    * propagate to null elements — what the replaced lambda does
    * (graft_polyhash is null-intolerant per element), and the NPE
    * guard for user SQL arrays (see [[shingles]]).
    *
    * The common path — the engine's own tokenizer never emits null
    * tokens — returns a PRIMITIVE long array (UnsafeArrayData, no
    * boxing); the boxed Array[Any] is the fallback reached only when a
    * null-bit prescan actually finds a null (round-16 advice: the
    * round-15 NPE fix had boxed every hash to serve the rare case). */
  def tokHashes(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) { hasNull = toks.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) { out(i) = polyHash(toks.getUTF8String(i)); i += 1 }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) = if (toks.isNullAt(i)) null else polyHash(toks.getUTF8String(i))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  private val Md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HllPrefix = "hll:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** One-pass HLL register extraction — the closed form of the
    * declarative `md5(concat('hll:', k))` → `conv(substr(hx, 1, 8),
    * 16, 10) % m` / `conv(substr(hx, 9, 8), 16, 10) % 2^30` → rho
    * chain (which allocates the concat, a 32-char hex string and two
    * substring copies per row). Identical register values: the first
    * 8 hex chars ARE digest bytes 0–3 big-endian unsigned, the next 8
    * are bytes 4–7, and `31 − length(bin(h))` for h > 0 is
    * `31 − (64 − nlz(h))`. The DuckDB oracle keeps the md5 spelling;
    * HllRegSpec fuzzes the equivalence. Returns struct(b, rho). */
  def hllReg(k: UTF8String, m: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val md = Md5Digest.get()
    md.update(HllPrefix)
    md.update(k.getBytes)
    val dg = md.digest() // digest() resets the instance
    val u1 = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
      ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
    val u2 = ((dg(4) & 0xffL) << 24) | ((dg(5) & 0xffL) << 16) |
      ((dg(6) & 0xffL) << 8) | (dg(7) & 0xffL)
    val h = u2 % 1073741824L
    val rho =
      if (h == 0L) 31
      else 31 - (64 - java.lang.Long.numberOfLeadingZeros(h))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](u1 % m, rho))
  }

  /** Non-overlapping occurrence count of `g` in `s`, scanning left to
    * right — the same match set java.util.regex `replaceAll` (and the
    * oracle's `replace`) removes, so it equals the
    * `(length(s) − length(replace(s, g, ''))) / length(g)` spelling
    * exactly, without materializing a copy of the document per needle.
    * Byte-level compare is sound on UTF-8: the encoding is
    * self-synchronizing, so an encoded needle can only match at
    * code-point boundaries. Empty needle → 0 (the length-diff spelling
    * divides by zero there; no caller passes one). */
  def countSub(s: UTF8String, g: UTF8String): Int = {
    val hay = s.getBytes
    val nee = g.getBytes
    if (nee.length == 0) return 0
    var i = 0
    var c = 0
    val last = hay.length - nee.length
    while (i <= last) {
      var j = 0
      while (j < nee.length && hay(i + j) == nee(j)) j += 1
      if (j == nee.length) { c += 1; i += nee.length } else i += 1
    }
    c
  }

  /** Count code points of `s` that are members of the ASCII set
    * `set` — equal to `length(regexp_replace(s, "[^<set>]", ""))`
    * because in UTF-8 every non-ASCII code point consists solely of
    * bytes ≥ 0x80, so a byte-membership scan over an all-ASCII set
    * counts exactly the matching code points, without the regex
    * engine building a stripped copy of the document. `set` must be
    * pure ASCII (callers pass literals). */
  def countIn(s: UTF8String, set: UTF8String): Int = {
    val hay = s.getBytes
    val sb = set.getBytes
    var member = 0L // bitset over bytes 0..127 in two longs
    var member2 = 0L
    var i = 0
    while (i < sb.length) {
      val b = sb(i)
      if (b >= 64) member2 |= 1L << (b - 64) else member |= 1L << b
      i += 1
    }
    var c = 0
    i = 0
    while (i < hay.length) {
      val b = hay(i)
      if (b >= 0) {
        if (b >= 64) { if (((member2 >> (b - 64)) & 1L) == 1L) c += 1 }
        else if (((member >> b) & 1L) == 1L) c += 1
      }
      i += 1
    }
    c
  }

  /** One-pass per-document code-point histogram statistics:
    * (distinct code points, Σ count², total code points) — the
    * closed form of `explode(split(text, '')) → two grouped
    * aggregates` that text_char_diversity otherwise pays a corpus
    * ×|doc| row multiplication for. Iterates CODE POINTS (surrogate
    * pairs stay whole), exactly the units the split spelling and the
    * DuckDB oracle count. */
  def charStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val hist = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val prev = hist.get(cp)
      hist.put(cp, if (prev == null) 1L else prev + 1L)
    }
    var s2 = 0L
    val it = hist.values().iterator()
    while (it.hasNext) { val c = it.next(); s2 += c * c }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hist.size.toLong, s2, n))
  }

  /** One-pass (n_ws, n_bpe) token counts — the closed form of
    * text_token_count's two regexp_extract_all passes:
    * n_ws = maximal runs of non-`\s` (Java `\s` = ASCII
    * `[ \t\n\f\r]`), n_bpe = matches of
    * `[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 \t\r\n]` (letter runs count 1, each
    * digit 1, every other code point 1 unless space/tab/CR/LF — NB
    * ``/`\f` DO count there). Byte scan: continuation bytes
    * (0b10xxxxxx) extend the non-\s run but are not code points;
    * a multi-byte lead byte is a non-letter code point. */
  def tokenCounts(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    var i = 0
    var nws = 0
    var nbpe = 0
    var inWord = false   // inside a non-\s run
    var inLetters = false // inside an ASCII letter run
    while (i < b.length) {
      val by = b(i)
      val asciiWs = by == ' ' || by == '\t' || by == '\n' ||
        by == 0x0B || by == '\f' || by == '\r'
      if (asciiWs) inWord = false
      else if (!inWord) { nws += 1; inWord = true }
      if ((by & 0xC0) != 0x80) { // a code point starts here
        val letter = (by >= 'a' && by <= 'z') || (by >= 'A' && by <= 'Z')
        if (letter) { if (!inLetters) { nbpe += 1; inLetters = true } }
        else {
          inLetters = false
          val digit = by >= '0' && by <= '9'
          val bpeWs = by == ' ' || by == '\t' || by == '\r' || by == '\n'
          if (digit || !bpeWs) nbpe += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nws, nbpe))
  }

  /** One-pass (max bigram count, total bigrams) over a token array —
    * the closed form of text_repetition's
    * `explode(adjacent-pair transform) → two grouped aggregates`,
    * which multiplies the corpus by |doc| rows (and runs the pair
    * transform as an interpreted lambda) to produce two numbers per
    * document. Pair identity is the (tok_i, ' ', tok_i+1) concat the
    * declarative spelling groups by. */
  def bigramStats(toks: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = toks.numElements()
    if (n < 2)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L))
    val m = new java.util.HashMap[String, Long]()
    var mx = 0L
    var i = 0
    while (i < n - 1) {
      val k = toks.getUTF8String(i).toString + " " +
        toks.getUTF8String(i + 1).toString
      val prev = m.get(k)
      val c = (if (prev == null) 0L else prev) + 1L
      m.put(k, c)
      if (c > mx) mx = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](mx, (n - 1).toLong))
  }

  /** One-pass (non-empty line count, distinct non-empty line count)
    * over text split on literal '\n' — the closed form of
    * `filter(split(text, '\n'), ...)` + `array_distinct` (interpreted
    * lambda + array materialization per document). */
  def lineStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val seen = new java.util.HashSet[String]()
    var nLines = 0
    var start = 0
    var i = 0
    while (i <= str.length) {
      if (i == str.length || str.charAt(i) == '\n') {
        if (i > start) { nLines += 1; seen.add(str.substring(start, i)) }
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nLines, seen.size))
  }

  /** One-pass Gopher-rule counters over a token array:
    * (Σ token length, tokens containing an ASCII letter, tokens in the
    * stopword list — occurrence count, duplicates included, exactly
    * what `size(filter(toks, x IN (...)))` counts). The declarative
    * spelling ran three interpreted higher-order lambdas per document,
    * one of them a regex (`rlike '[a-z]'`) per TOKEN. */
  def gopherCounts(toks: ArrayData,
      stops: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val stopSet = new java.util.HashSet[String]()
    var i = 0
    while (i < stops.numElements()) {
      stopSet.add(stops.getUTF8String(i).toString)
      i += 1
    }
    var sumLen = 0L
    var nAlpha = 0L
    var nStop = 0L
    i = 0
    while (i < toks.numElements()) {
      val t = toks.getUTF8String(i)
      sumLen += t.numChars()
      val b = t.getBytes
      var j = 0
      var alpha = false
      while (!alpha && j < b.length) {
        val c = b(j)
        if (c >= 'a' && c <= 'z') alpha = true
        j += 1
      }
      if (alpha) nAlpha += 1
      if (stopSet.contains(t.toString)) nStop += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sumLen, nAlpha, nStop))
  }

  /** One-pass lexical-diversity statistics over a token array:
    * (total tokens, distinct tokens, hapax legomena) — the closed form
    * of text_ttr's `explode(tokens) → (doc, token) counts → per-doc
    * rollup` corpus × |doc| row multiplication. */
  def ttrStats(toks: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val m = new java.util.HashMap[String, Long]()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val k = toks.getUTF8String(i).toString
      val prev = m.get(k)
      m.put(k, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    var hapax = 0L
    val it = m.values().iterator()
    while (it.hasNext) if (it.next() == 1L) hapax += 1
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, m.size.toLong, hapax))
  }

  /** `size(tokens(text))` without materializing the token array —
    * identical run structure to [[tokens]] (same
    * `UTF8String.toLowerCase` first, so locale edge cases like İ →
    * i+combining-dot split runs identically), counting maximal
    * `[a-z0-9]+` byte runs in one pass. Nine queries need only the
    * per-document token COUNT; building (and garbage-collecting) a
    * few-hundred-element string array per document to take its size
    * was the mixture planners' hottest allocation. */
  def tokenCount(text: UTF8String): Int = {
    val b = text.toLowerCase.getBytes
    var i = 0
    var c = 0
    var in = false
    while (i < b.length) {
      val d = b(i)
      val ok = (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
      if (ok) { if (!in) { c += 1; in = true } } else in = false
      i += 1
    }
    c
  }

  // the MinHash permutation tables (DedupOps.A / DedupOps.B) — any
  // change must update the simhash DuckDB oracle twins in DedupOps
  private val SimA = Array(7L, 13, 31, 43, 59, 61, 73, 97, 101, 127,
    131, 151, 163, 181, 197, 199)
  private val SimB = Array(3L, 17, 29, 41, 53, 71, 89, 103, 113, 139,
    149, 167, 179, 191, 211, 223)

  /** 32-bit SimHash over an array of token hashes: bit j is the sign
    * of Σ_tokens votes, where a token votes +1 iff the INDEPENDENT
    * affine re-hash `(x·a_j + b_j) mod P` lands in the upper half of
    * [0, P) (P = 1e9+7; unbiased to 1/P per bit, unlike raw hash bits
    * which are constant above bit 29). Compiled twin of the
    * declarative nested-lambda spelling, which runs interpreted and
    * measured ~1000× slower (2.9 s for 5,000 docs at sf0.1). Empty
    * array → all 32 votes are 0 ≥ 0 → the all-ones fingerprint, same
    * as the lambda form. */
  def simHash(th: ArrayData): Long = {
    val n = th.numElements()
    var res = 0L
    var j = 0
    while (j < 32) {
      val a = SimA(j % 16)
      val b = SimB((j * 3 + j / 16) % 16)
      var vote = 0L
      var i = 0
      while (i < n) {
        if (((th.getLong(i) * a + b) % 1000000007L) * 2 >= 1000000007L) vote += 1
        else vote -= 1
        i += 1
      }
      if (vote >= 0) res |= 1L << j
      j += 1
    }
    res
  }

  /** 16-bit Morton (Z-order) interleave of two keys' low bits —
    * matches the declarative
    * `aggregate(sequence(0,15), 0L, (a,i) -> a + shiftleft((pk>>i)&1, 2i)
    * + shiftleft((sk>>i)&1, 2i+1))` fold and the DuckDB list_reduce
    * twin bit for bit. */
  def morton16(pk: Long, sk: Long): Long = {
    var m = 0L
    var i = 0
    while (i < 16) {
      m |= ((pk >> i) & 1L) << (2 * i)
      m |= ((sk >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    m
  }

  /** Integer matrix–vector multiply: `rows` output elements, each
    * `out(k) = Σ_j m(k·dim + j) · v(j)` with `dim = v.length` — the
    * row-major flattened matrix times the vector, in index order.
    * Matches `transform(sequence(0, rows-1), k -> aggregate(
    * sequence(0, dim-1), 0L, (acc, j) -> acc + m[k·dim+j] · v[j]))`.
    * CONTRACT: non-null long arrays, m.length == rows·v.length. */
  def matvec(v: ArrayData, m: ArrayData, rows: Int): ArrayData = {
    val x = v.toLongArray()
    val w = m.toLongArray()
    val dim = x.length
    // fail loudly on a contract violation: a ragged/short vector would
    // otherwise misalign every matrix row and return silently wrong
    // projections (the declarative element_at spelling nulls/errors)
    require(w.length == rows * dim,
      s"graft_matvec: matrix has ${w.length} elements, expected " +
        s"rows×dim = $rows×$dim = ${rows * dim}")
    val out = new Array[Long](rows)
    var k = 0
    while (k < rows) {
      var s = 0L
      var j = 0
      val base = k * dim
      while (j < dim) { s += w(base + j) * x(j); j += 1 }
      out(k) = s
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** IVF assignment encodings: for each of the C centroids in the
    * row-major flattened matrix `m` (C·dim doubles, dim = v.length),
    * the sortable-BIGINT rank key
    * `(round(dot(v, m_k)·1e6) + 4e9)·1e5 + (C−1−k)`, returned SORTED
    * ascending — bit-identical to the columnar spelling
    * `array_sort(array(round(graft_dot(v, cent_k)·1e6, 0).cast(long)
    * + 4e9)·1e5 + (C−1−k), …))` that it replaces (IvfEncsSpec proves
    * equality by fuzz at C ≥ 1000). The columnar form builds C literal
    * columns: plan- and codegen-hostile once C reaches the thousands
    * (analyzer cost per column; the generated consume() method passes
    * the 64 KB JIT limit → interpreted fallback). Here the whole
    * matrix is ONE literal and the loop is a single static call that
    * stays inside whole-stage codegen at any C up to the encoding's
    * 10⁵ cap.
    *
    * Rounding matches Spark's `round(x, 0)` on DoubleType exactly for
    * FINITE dots: BigDecimal.valueOf(x).setScale(0, HALF_UP), then the
    * double→long cast truncation. CONTRACT: non-null double arrays,
    * m.length == C·v.length, finite dot products — all violations fail
    * loudly, like matvec. A non-finite dot (a zero-norm centroid
    * normalized to NaN, an Inf input) is rejected with a named error
    * rather than mirroring the columnar form's behavior there (Spark's
    * round passes NaN/Inf through and the ANSI long cast then throws
    * its own classified error; non-ANSI would silently encode 0 — a
    * wrong centroid id — which is exactly what this guard refuses to
    * reproduce). */
  def ivfEncs(v: ArrayData, m: ArrayData): ArrayData = {
    val x = v.toDoubleArray()
    val w = m.toDoubleArray()
    val dim = x.length
    require(dim > 0 && w.length % dim == 0,
      s"graft_ivf_encs: matrix has ${w.length} elements, not a " +
        s"multiple of dim = $dim")
    val c = w.length / dim
    val out = new Array[Long](c)
    var k = 0
    while (k < c) {
      var s = 0.0
      var j = 0
      val base = k * dim
      while (j < dim) { s += x(j) * w(base + j); j += 1 }
      if (java.lang.Double.isNaN(s) || java.lang.Double.isInfinite(s))
        throw new IllegalArgumentException(
          s"graft_ivf_encs: non-finite dot product at centroid $k " +
            "(zero-norm centroid or non-finite input vector)")
      val r = java.math.BigDecimal.valueOf(s * 1000000d)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      // finite but past the encoding's bias bound: (r + 4e9)·1e5 must
      // stay a valid non-negative long, i.e. |dot| < ~4000 (|r| < 4e9).
      // The columnar spelling this kernel claims bit-parity with would
      // raise an ANSI cast error here; a silent toLong saturation (or
      // multiply wrap) would instead encode a WRONG centroid id — fail
      // as loudly as the non-finite case.
      if (r <= -4000000000L || r >= 4000000000L)
        throw new IllegalArgumentException(
          s"graft_ivf_encs: dot product $s at centroid $k exceeds the " +
            "|dot| < 4000 encoding bound (scaled |r| >= 4e9)")
      out(k) = (r + 4000000000L) * 100000L + (c - 1 - k).toLong
      k += 1
    }
    java.util.Arrays.sort(out)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Sliding-window token hashes: for each position i in 0..n−k, the
    * [[polyHash]] of `toks(i..i+k−1)` joined with a single space —
    * value-identical to
    * `transform(sequence(1, n−k+1), i -> polyhash(concat_ws(' ',
    * slice(toks, i, k))))` (and the oracle's array_to_string twin),
    * without allocating the joined string per window. Empty result
    * when n < k. CONTRACT: non-null string elements. */
  def winHash(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val strs = new Array[String](n)
    var t = 0
    while (t < n) { strs(t) = toks.getUTF8String(t).toString; t += 1 }
    val P = 1000000007L
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var h = 0L
      var w = 0
      while (w < k) {
        if (w > 0) h = (h * 31 + ' '.toInt) % P
        val s = strs(i + w)
        var ci = 0
        while (ci < s.length) {
          val cp = s.codePointAt(ci)
          ci += Character.charCount(cp)
          h = (h * 31 + cp) % P
        }
        w += 1
      }
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Register the expressions as SQL functions (idempotent, session
    * scoped) so `expr("graft_dot(a, b)")` works everywhere. A session
    * built with [[GraftExtensions]] already has them injected — detect
    * that and skip, so per-query safety-net calls don't churn the
    * registry (each createOrReplaceTempFunction logs a "replaced a
    * previously registered function" warning). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val names = Seq("graft_dot", "graft_polyhash", "graft_l2",
      "graft_morton", "graft_matvec", "graft_winhash", "graft_simhash",
      "graft_tokens", "graft_bloom_agg", "graft_might_contain",
      "graft_ivf_encs", "graft_count_sub", "graft_count_in",
      "graft_char_stats", "graft_token_counts", "graft_bigram_stats",
      "graft_line_stats", "graft_gopher_counts", "graft_ttr_stats",
      "graft_token_count", "graft_shingles", "graft_tok_hashes",
      "graft_hll_reg")
    if (names.forall(n => registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)))) return
    registry.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_polyhash",
      exprs => PolyHash(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_l2",
      exprs => L2Distance(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_morton",
      exprs => MortonInterleave(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_matvec",
      exprs => IntMatVec(exprs(0), exprs(1), exprs(2)), "built-in")
    registry.createOrReplaceTempFunction("graft_winhash",
      exprs => WindowHash(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_simhash",
      exprs => SimHash32(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_tokens",
      exprs => Tokenize(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_ivf_encs",
      exprs => IvfEncs(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_count_sub",
      exprs => CountSubstr(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_count_in",
      exprs => CountInSet(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_char_stats",
      exprs => CharStats(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_token_counts",
      exprs => TokenCounts(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_bigram_stats",
      exprs => BigramStats(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_line_stats",
      exprs => LineStats(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_gopher_counts",
      exprs => GopherCounts(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_ttr_stats",
      exprs => TtrStats(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_token_count",
      exprs => TokenRunCount(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_shingles",
      exprs => ShingleSet(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_tok_hashes",
      exprs => TokenHashes(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("graft_hll_reg",
      exprs => HllRegister(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_bloom_agg",
      exprs => VectorOps.bloomAgg(exprs), "built-in")
    registry.createOrReplaceTempFunction("graft_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }

  /** Spark's internal runtime-filter bloom aggregate (the engine
    * behind AQE's InjectRuntimeFilter), surfaced as a callable
    * function: `graft_bloom_agg(xxhash64(key)[, estItems, numBits])`
    * → binary sketch consumed by `graft_might_contain(bloom,
    * xxhash64(key))`. Exposing it lets a query hand-place the
    * semi-join reduction (build a bloom over a selective dim's keys,
    * prune the fact scan before its shuffle) where the cost-based
    * injection declines — the big-join pre-filter pattern at 100 TB. */
  def bloomAgg(exprs: Seq[Expression])
      : org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    exprs match {
      case Seq(c) =>
        new BloomFilterAggregate(c, Literal(1000000L), Literal(8388608L), 0, 0)
      case Seq(c, n, b) => new BloomFilterAggregate(c, n, b, 0, 0)
      case _ => throw new IllegalArgumentException(
        "graft_bloom_agg(hash[, estItems, numBits])")
    }
  }
}

/** Config-level registration (`spark.sql.extensions=graft.engine.functions.GraftExtensions`):
  * injects the engine's native functions into every session built with
  * the extension, so SQL like `SELECT graft_dot(a, b)` works without a
  * programmatic [[VectorOps.register]] call. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_l2"),
      new ExpressionInfo(classOf[L2Distance].getName, "graft_l2"),
      (exprs: Seq[Expression]) => L2Distance(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_morton"),
      new ExpressionInfo(classOf[MortonInterleave].getName, "graft_morton"),
      (exprs: Seq[Expression]) => MortonInterleave(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_matvec"),
      new ExpressionInfo(classOf[IntMatVec].getName, "graft_matvec"),
      (exprs: Seq[Expression]) => IntMatVec(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("graft_winhash"),
      new ExpressionInfo(classOf[WindowHash].getName, "graft_winhash"),
      (exprs: Seq[Expression]) => WindowHash(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => SimHash32(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[Tokenize].getName, "graft_tokens"),
      (exprs: Seq[Expression]) => Tokenize(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_ivf_encs"),
      new ExpressionInfo(classOf[IvfEncs].getName, "graft_ivf_encs"),
      (exprs: Seq[Expression]) => IvfEncs(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_count_sub"),
      new ExpressionInfo(classOf[CountSubstr].getName, "graft_count_sub"),
      (exprs: Seq[Expression]) => CountSubstr(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_count_in"),
      new ExpressionInfo(classOf[CountInSet].getName, "graft_count_in"),
      (exprs: Seq[Expression]) => CountInSet(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_char_stats"),
      new ExpressionInfo(classOf[CharStats].getName, "graft_char_stats"),
      (exprs: Seq[Expression]) => CharStats(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "graft_token_counts"),
      (exprs: Seq[Expression]) => TokenCounts(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_bigram_stats"),
      new ExpressionInfo(classOf[BigramStats].getName, "graft_bigram_stats"),
      (exprs: Seq[Expression]) => BigramStats(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_line_stats"),
      new ExpressionInfo(classOf[LineStats].getName, "graft_line_stats"),
      (exprs: Seq[Expression]) => LineStats(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_gopher_counts"),
      new ExpressionInfo(classOf[GopherCounts].getName, "graft_gopher_counts"),
      (exprs: Seq[Expression]) => GopherCounts(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_ttr_stats"),
      new ExpressionInfo(classOf[TtrStats].getName, "graft_ttr_stats"),
      (exprs: Seq[Expression]) => TtrStats(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(classOf[TokenRunCount].getName, "graft_token_count"),
      (exprs: Seq[Expression]) => TokenRunCount(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => ShingleSet(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_tok_hashes"),
      new ExpressionInfo(classOf[TokenHashes].getName, "graft_tok_hashes"),
      (exprs: Seq[Expression]) => TokenHashes(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_hll_reg"),
      new ExpressionInfo(classOf[HllRegister].getName, "graft_hll_reg"),
      (exprs: Seq[Expression]) => HllRegister(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[Expression]) => VectorOps.bloomAgg(exprs)))
    ext.injectFunction((FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1))))
    // abs(x−y) <= c interval joins → bucketed equi-joins (see
    // graft.engine.plans.BandJoinRule): plan-level, no call-site changes
    ext.injectOptimizerRule(_ => graft.engine.plans.BandJoinRule)
    // physical planning for the native as-of join operator
    ext.injectPlannerStrategy(_ => graft.engine.plans.AsOfJoinStrategy)
  }
}

/** Codegen'd dot product over two array<double> columns. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.engine.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared L2 distance over two array<double> columns. */
case class L2Distance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.engine.functions.VectorOps.l2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd 16-bit Morton interleave over two long keys (the Z-order
  * clustering code — `data_zorder`'s hot loop: the declarative
  * aggregate-over-sequence fold runs one boxed lambda per bit per row). */
case class MortonInterleave(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.morton16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.engine.functions.VectorOps.morton16($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd integer matrix–vector multiply (`embed_rp`'s hot loop:
  * the nested transform/aggregate spelling runs rows·dim boxed lambda
  * invocations per input row — 1024 for the 16×64 JL projection). */
case class IntMatVec(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any, m: Any, rows: Any): Any =
    VectorOps.matvec(v.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData],
      rows.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, m, r) =>
      s"graft.engine.functions.VectorOps.matvec($v, $m, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): IntMatVec =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Codegen'd sliding-window token hash (`dedup_substring`'s hot loop:
  * the transform-over-sequence spelling allocates a joined string and
  * runs an interpreted lambda per window). */
case class WindowHash(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(toks: Any, k: Any): Any =
    VectorOps.winHash(toks.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.engine.functions.VectorOps.winHash($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowHash =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd IVF assignment encoding ([[VectorOps.ivfEncs]]): the whole
  * centroid matrix rides as one literal, so the N·C assignment pass is
  * a single codegen'd static call per row regardless of C. */
case class IvfEncs(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any, m: Any): Any =
    VectorOps.ivfEncs(v.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, m) =>
      s"graft.engine.functions.VectorOps.ivfEncs($v, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfEncs =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd polynomial rolling string hash (engine-stable fingerprint). */
case class PolyHash(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    VectorOps.polyHash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.engine.functions.VectorOps.polyHash($s)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Codegen'd `[a-z0-9]+` tokenizer of lower-cased text ([[VectorOps.tokens]]). */
case class Tokenize(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    VectorOps.tokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.engine.functions.VectorOps.tokens($s)")

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

/** Codegen'd distinct 3-token shingle set ([[VectorOps.shingles]]) —
  * the shingle feature pass shared by the n-gram dedup family. */
case class ShingleSet(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))

  // element nullability rides the input's: a null token folds its
  // windows to null shingles (matching the replaced concat spelling),
  // so engine pipelines — whose tokenizer emits containsNull=false —
  // keep a non-null schema while user SQL over nullable arrays is typed
  // honestly instead of NPE-ing
  override def dataType: DataType = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(_, cn) =>
      org.apache.spark.sql.types.ArrayType(StringType, containsNull = cn)
    case _ =>
      org.apache.spark.sql.types.ArrayType(StringType, containsNull = true)
  }
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(toks: Any): Any =
    VectorOps.shingles(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.engine.functions.VectorOps.shingles($t)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** Codegen'd per-element polyhash of a token array
  * ([[VectorOps.tokHashes]]) — the simhash pipelines' token-hash stage
  * without an interpreted outer lambda. */
case class TokenHashes(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))

  // element nullability rides the input's (see [[ShingleSet.dataType]])
  override def dataType: DataType = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(_, cn) =>
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = cn)
    case _ =>
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = true)
  }
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(toks: Any): Any =
    VectorOps.tokHashes(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.engine.functions.VectorOps.tokHashes($t)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

/** Codegen'd HLL register extraction ([[VectorOps.hllReg]]):
  * struct(b, rho) from a key string and a literal register count. */
case class HllRegister(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  // analysis-time type check: nullSafeEval casts straight to
  // (UTF8String, Int), and the function is session-registered SQL —
  // without declared inputTypes a `graft_hll_reg(k, 64L)` call fails
  // deep in codegen (ClassCastException / janino error) instead of a
  // clean AnalysisException naming the argument
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("b", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rho",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(k: Any, m: Any): Any =
    VectorOps.hllReg(k.asInstanceOf[UTF8String], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, m) =>
      s"graft.engine.functions.VectorOps.hllReg($k, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllRegister =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd non-overlapping substring occurrence count
  * ([[VectorOps.countSub]]) — the n-gram profile scorer's inner loop,
  * replacing a regexp_replace-per-needle spelling that built a copy of
  * the document for every profile gram. */
case class CountSubstr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any, g: Any): Any =
    VectorOps.countSub(s.asInstanceOf[UTF8String], g.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, g) =>
      s"graft.engine.functions.VectorOps.countSub($s, $g)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountSubstr =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd ASCII-set code-point counter ([[VectorOps.countIn]]) —
  * the char-class ratio features' inner loop, replacing a
  * regexp_replace-then-length spelling that stripped a copy of the
  * document per feature. */
case class CountInSet(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any, set: Any): Any =
    VectorOps.countIn(s.asInstanceOf[UTF8String], set.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, set) =>
      s"graft.engine.functions.VectorOps.countIn($s, $set)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountInSet =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd one-pass token counts ([[VectorOps.tokenCounts]]):
  * struct(n_ws, n_bpe). */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("n_ws",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_bpe",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    VectorOps.tokenCounts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.engine.functions.VectorOps.tokenCounts($s)")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

/** Codegen'd one-pass bigram repetition statistics
  * ([[VectorOps.bigramStats]]): struct(mx, tot). */
case class BigramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("mx", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("tot", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(toks: Any): Any =
    VectorOps.bigramStats(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.engine.functions.VectorOps.bigramStats($t)")

  override protected def withNewChildInternal(newChild: Expression): BigramStats =
    copy(child = newChild)
}

/** Codegen'd one-pass line statistics ([[VectorOps.lineStats]]):
  * struct(n, nd) over non-empty '\n'-split lines. */
case class LineStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("nd",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    VectorOps.lineStats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.engine.functions.VectorOps.lineStats($s)")

  override protected def withNewChildInternal(newChild: Expression): LineStats =
    copy(child = newChild)
}

/** Codegen'd one-pass Gopher-rule counters
  * ([[VectorOps.gopherCounts]]): struct(sum_len, n_alpha, n_stop). */
case class GopherCounts(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("sum_len", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_alpha", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_stop", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(toks: Any, stops: Any): Any =
    VectorOps.gopherCounts(toks.asInstanceOf[ArrayData],
      stops.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, st) =>
      s"graft.engine.functions.VectorOps.gopherCounts($t, $st)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GopherCounts =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd one-pass lexical-diversity statistics
  * ([[VectorOps.ttrStats]]): struct(n_tokens, n_types, n_hapax). */
case class TtrStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_types", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_hapax", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(toks: Any): Any =
    VectorOps.ttrStats(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.engine.functions.VectorOps.ttrStats($t)")

  override protected def withNewChildInternal(newChild: Expression): TtrStats =
    copy(child = newChild)
}

/** Codegen'd token-run count ([[VectorOps.tokenCount]]) —
  * `size(graft_tokens(text))` with no array materialization. */
case class TokenRunCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    VectorOps.tokenCount(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.engine.functions.VectorOps.tokenCount($s)")

  override protected def withNewChildInternal(newChild: Expression): TokenRunCount =
    copy(child = newChild)
}

/** Codegen'd per-document code-point histogram statistics
  * ([[VectorOps.charStats]]): struct(n_distinct, s2, n). */
case class CharStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("n_distinct", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("s2", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    VectorOps.charStats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.engine.functions.VectorOps.charStats($s)")

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

/** Codegen'd 32-bit SimHash of a token-hash array ([[VectorOps.simHash]]). */
case class SimHash32(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(th: Any): Any =
    VectorOps.simHash(th.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, th =>
      s"graft.engine.functions.VectorOps.simHash($th)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}
