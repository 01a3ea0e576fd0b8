package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling (Rabin-Karp) window hashes as a native Catalyst expression.
  *
  * `Dedup.dupSpans` needs the hash of EVERY length-L character window
  * of every document. Doing that with `substr` + md5 materializes one
  * L-char string per window — O(len x L) bytes of allocation per doc,
  * and the substring+digest chain measured 2.5 s of d15's 3.3 s at
  * sf0.1. This kernel walks the document ONCE: code points are
  * extracted to one int[] per doc, the first window is a polynomial
  * fold, and each subsequent hash is a subtract-leading/multiply/add
  * update — O(len) multiplies total, no per-window strings.
  *
  * Hash: h(i) = sum_j cp[i+j] * B^(L-1-j) mod M, with B = 1000003 and
  * M = 2^61 - 1 (Mersenne: 128-bit products reduce with shifts, no
  * division). The DuckDB oracle recomputes the same polynomial per
  * window arithmetically in HUGEINT (OracleFragments.rollingHashSql) —
  * same value, different association, exact match. Collision class is
  * the same as the house 60-bit md5 hash (~2^-61 per pair).
  *
  * Code points, not UTF-16 units or UTF-8 bytes: positions must agree
  * with Spark's and DuckDB's character-based `length`/`substr`, which
  * both count code points.
  */
object TextHashOps {
  val M: Long = (1L << 61) - 1
  val B: Long = 1000003L

  /** (a * b) mod M for a, b in [0, M). hi*2^64 + lo reduces via
    * 2^61 === 1 (mod M): 2^64 === 8, lo === (lo >>> 61) + (lo & M).
    */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = 8L * hi + (lo >>> 61) + (lo & M)
    while (r >= M) r -= M
    r
  }

  private def addmod(a: Long, b: Long): Long = {
    val r = a + b
    if (r >= M) r - M else r
  }

  /** B^(L-1-j) mod M for j = 0..L-1 (the oracle embeds these). */
  def powers(winLen: Int): Array[Long] = {
    val out = new Array[Long](winLen)
    out(winLen - 1) = 1L
    var j = winLen - 2
    while (j >= 0) { out(j) = mulmod(out(j + 1), B); j -= 1 }
    out
  }

  /** All window hashes of `s`, in position order; empty when the text
    * has fewer than `winLen` code points.
    */
  def rollingHashes(s: UTF8String, winLen: Int): ArrayData = {
    val str = s.toString
    val cps = new Array[Int](str.codePointCount(0, str.length))
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    val n = cps.length
    if (n < winLen) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    var lead = 1L // B^(L-1)
    var j = 0
    while (j < winLen - 1) { lead = mulmod(lead, B); j += 1 }
    val out = new Array[Long](n - winLen + 1)
    var h = 0L
    j = 0
    while (j < winLen) { h = addmod(mulmod(h, B), cps(j).toLong); j += 1 }
    out(0) = h
    var p = 1
    while (p <= n - winLen) {
      h = addmod(h, M - mulmod(cps(p - 1).toLong, lead))
      h = mulmod(h, B)
      h = addmod(h, cps(p + winLen - 1).toLong)
      out(p) = h
      p += 1
    }
    // fromPrimitiveArray, NOT GenericArrayData: the latter's long[]
    // constructor boxes every element (one java.lang.Long per hash) --
    // at 8M grams/SF that allocation was measurable GC pressure
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Word n-gram 60-bit hashes as a native Catalyst kernel.
  *
  * `Dedup.gramRows` (r15 shape) assembled word n-grams by exploding
  * tokens and `lead`-joining them back with a window over the doc
  * partition — an Exchange + per-partition Sort of every TOKEN row
  * before a single gram existed. At sf3 that corpus-wide sort was the
  * d14 GC bimodality (18-84 s across identical plans, SCALE.md r15):
  * the sort buffers and gram strings churned the old gen. This kernel
  * walks each document ONCE: token boundaries are found by byte scan
  * (separators after `TextAnalysis.normalize` are single ASCII
  * spaces), each gram is digested in place (md5 over the token byte
  * ranges joined by a space byte — exactly the md5 of the
  * `concat_ws(" ", toks)` gram string, since UTF-8 concatenation is
  * byte concatenation), and the emitted long is `Dedup.hash60` of the
  * gram: the first 60 md5 bits. No token row, no gram string, no hex
  * round-trip, no window — the per-doc cost is one md5 per gram, the
  * plan stays map-shaped until the consumer's own aggregation
  * exchange.
  *
  * Semantics match `Dedup.shingleTablePos` exactly, INCLUDING the
  * small-doc rule: a document with fewer than `n` tokens contributes
  * one gram — the whole (normalized) input string — at position 0.
  * Oracles are unchanged: every DuckDB replay already computes
  * `('0x' || substr(md5(gram), 1, 15))::BIGINT`, and this kernel
  * produces byte-identical digests.
  *
  * `Dedup.baseHash` (the minhash base, first 32 md5 bits mod P) is
  * derivable from these values as `(h >>> 28) % P` — hex digits 1-8
  * are bits 59..28 of the 60-bit value — so one long per gram serves
  * the whole dedup family (see `Dedup.baseHashFromH60`).
  *
  * Memory bound, stated honestly: the kernel materializes one long
  * per gram PER DOCUMENT (8 bytes/token), where the r15 explode
  * streamed gram rows. For LLM-pipeline corpora documents are
  * chunk-bounded (a 10 MB doc is a 12 MB array — fine; the exchange
  * and sort this replaced buffered far more), but a pathological
  * single-document input (a 1 GB "doc") would allocate ~1.2 GB in one
  * task; such inputs must be pre-chunked (the x17 chunking stage)
  * before the dedup family — the same requirement every per-doc
  * signature algorithm (minhash, simhash) already imposes.
  */
object TokenGramOps {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Java-regex `\s` is ASCII-only (no UNICODE_CHARACTER_CLASS), so a
    * byte-level scan agrees with `wsTokens`' split on any input: UTF-8
    * continuation/lead bytes are >= 0x80 and never match.
    */
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def h60(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h >>> 4 // 15 hex digits = first 60 bits
  }

  /** Sorted-distinct view of a long array: sort (primitive, in place)
    * + linear dedup. The per-DOC distinct that makes a (id, gram-hash)
    * posting stream globally DISTINCT on (id, h) without any
    * exchange — the id is already part of the key, so doc-local dedup
    * IS the distinct every set-shape consumer needs. Order is not part
    * of the contract (consumers aggregate).
    */
  def sortedDistinct(a: Array[Long]): Array[Long] = {
    if (a.length <= 1) return a
    java.util.Arrays.sort(a)
    var w = 1
    var i = 1
    while (i < a.length) {
      if (a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    if (w == a.length) a else java.util.Arrays.copyOf(a, w)
  }

  /** hash60 of every word n-gram of `s` in position order; a single
    * hash60(s) element when s has fewer than n tokens.
    */
  def tokenGramHash60s(s: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(tokenGramHash60Array(s, n))

  /** The DISTINCT set of [[tokenGramHash60s]] values (sorted) — the
    * per-doc dedup baked into the kernel so set-shape consumers never
    * pay a distinct Exchange for it.
    */
  def tokenGramHash60sDistinct(s: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(sortedDistinct(tokenGramHash60Array(s, n)))

  /** Per-TOKEN seeded hashes: `Dedup.seededHash` (hash60 of
    * "seed:token") for every whitespace token of the (normalized)
    * input, in position order; empty array when the input has no
    * tokens (simhash's semantics — a token-less doc contributes no
    * hash rows, with NO whole-text fallback). One digest per token
    * over the seed-prefix bytes plus the token's byte range in place —
    * replaces a per-token concat + md5-hex + conv expression chain.
    */
  def tokenSeededHash60s(s: UTF8String, seed: Int): ArrayData = {
    val b = s.getBytes
    val md = md5Local.get()
    val digest = new Array[Byte](16)
    val prefix = (seed.toString + ":").getBytes("UTF-8")
    var nToks = 0
    var i = 0
    while (i < b.length) {
      if (!isWs(b(i))) {
        nToks += 1
        while (i < b.length && !isWs(b(i))) i += 1
      } else i += 1
    }
    if (nToks == 0)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](nToks)
    var k = 0
    i = 0
    while (i < b.length) {
      if (!isWs(b(i))) {
        val start = i
        while (i < b.length && !isWs(b(i))) i += 1
        md.reset()
        md.update(prefix)
        md.update(b, start, i - start)
        md.digest(digest, 0, 16)
        out(k) = h60(digest)
        k += 1
      } else i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Hashing-trick classifier stats in one pass: [n_tokens, sum of
    * per-token integer milli-weights], where a token's weight is
    * `h60(md5("clsw:" || (h60(md5(token)) % dim))) % 2001 - 1000` —
    * byte-for-byte the TextAnalysis.classifierScore expression chain
    * (md5 of the token's UTF-8 bytes, bucket id rendered in decimal).
    * The expression form paid two md5-hex round-trips, a string
    * concat and a base-16 `conv` PARSE per token inside an
    * interpreted `aggregate` lambda; here it is two digests over
    * reused buffers. Same values, so the DuckDB oracles that replay
    * the chain are untouched.
    */
  def classifierStatsMilli(s: UTF8String, dim: Int): ArrayData = {
    val b = s.getBytes
    val md = md5Local.get()
    val digest = new Array[Byte](16)
    val prefix = "clsw:".getBytes("UTF-8")
    var nToks = 0L
    var sum = 0L
    var i = 0
    while (i < b.length) {
      if (!isWs(b(i))) {
        val start = i
        while (i < b.length && !isWs(b(i))) i += 1
        nToks += 1
        md.reset()
        md.update(b, start, i - start)
        md.digest(digest, 0, 16)
        val bucket = h60(digest) % dim
        md.reset()
        md.update(prefix)
        md.update(java.lang.Long.toString(bucket).getBytes("UTF-8"))
        md.digest(digest, 0, 16)
        sum += h60(digest) % 2001 - 1000
      } else i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(nToks, sum))
  }

  private def tokenGramHash60Array(s: UTF8String, n: Int): Array[Long] = {
    val b = s.getBytes
    val md = md5Local.get()
    val digest = new Array[Byte](16)
    // token runs [start, end)
    var nToks = 0
    var i = 0
    while (i < b.length) {
      if (!isWs(b(i))) {
        nToks += 1
        while (i < b.length && !isWs(b(i))) i += 1
      } else i += 1
    }
    if (nToks < n) {
      md.reset()
      md.update(b)
      md.digest(digest, 0, 16)
      return Array(h60(digest))
    }
    val starts = new Array[Int](nToks)
    val ends = new Array[Int](nToks)
    var k = 0
    i = 0
    while (i < b.length) {
      if (!isWs(b(i))) {
        starts(k) = i
        while (i < b.length && !isWs(b(i))) i += 1
        ends(k) = i
        k += 1
      } else i += 1
    }
    val m = nToks - n + 1
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      md.reset()
      // normalized input: tokens g..g+n-1 are contiguous with single
      // spaces, but digesting per-token keeps the gram == the
      // concat_ws(" ", ...) string for ANY input
      var j = g
      while (j < g + n) {
        if (j > g) md.update(' '.toByte)
        md.update(b, starts(j), ends(j) - starts(j))
        j += 1
      }
      md.digest(digest, 0, 16)
      out(g) = h60(digest)
      g += 1
    }
    out
  }
}

/** token_gram_hash60s(text, n) -> array<long>, one 60-bit md5 hash per
  * word n-gram position (explode for gram rows, posexplode when the
  * position matters). With `distinct = true` the array is the per-doc
  * SORTED SET of gram hashes instead — exploding it yields rows that
  * are already globally distinct on (id, h), so set-shape consumers
  * skip the dedup Exchange entirely (position is meaningless then).
  */
case class TokenGramHash60s(child: Expression, n: Int,
    distinct: Boolean = false)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_gram_hash60s needs a string column, got ${child.dataType}")
  }
  private def call(v: UTF8String): ArrayData =
    if (distinct) TokenGramOps.tokenGramHash60sDistinct(v, n)
    else TokenGramOps.tokenGramHash60s(v, n)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else call(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val fn = if (distinct) "tokenGramHash60sDistinct" else "tokenGramHash60s"
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.TokenGramOps.$fn(
          ${c.value}, $n);
      }
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

/** token_seeded_hash60s(text, seed) -> array<long>: one
  * `Dedup.seededHash`-compatible 60-bit hash per whitespace token
  * (explode for token-hash rows; empty array for token-less docs).
  */
case class TokenSeededHash60s(child: Expression, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_seeded_hash60s needs a string column, got ${child.dataType}")
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else TokenGramOps.tokenSeededHash60s(v.asInstanceOf[UTF8String], seed)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.TokenGramOps.tokenSeededHash60s(
          ${c.value}, $seed);
      }
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

/** sliding_window_mins(arr, w) -> array<long>: the minimum of every
  * COMPLETE length-w window of arr in position order, or a single
  * min of all elements when len(arr) < w — the winnowing selection
  * rule (Schleimer/Wilkerson/Aiken) applied array-side, so fingerprint
  * selection composes with [[TokenGramHash60s]] into one map-shaped
  * pass: no per-row window, no Exchange, no Sort. Monotonic-deque
  * scan, O(len) comparisons for any w.
  */
case class SlidingWindowMins(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"w must be >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sliding_window_mins needs array<bigint>, got $other")
    }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else SlidingWindowMins.mins(v.asInstanceOf[ArrayData], w)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.SlidingWindowMins.mins(${c.value}, $w);
      }
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object SlidingWindowMins {
  def mins(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    if (n < w) {
      var m = arr.getLong(0)
      var i = 1
      while (i < n) { val v = arr.getLong(i); if (v < m) m = v; i += 1 }
      return UnsafeArrayData.fromPrimitiveArray(Array(m))
    }
    val out = new Array[Long](n - w + 1)
    // deque of candidate indices, values strictly increasing
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = arr.getLong(dq(head))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** rolling_window_hashes(text, winLen) -> array<long>, one hash per
  * window position (posexplode for 0-based (pos, hash) rows).
  */
case class RollingWindowHashes(child: Expression, winLen: Int)
    extends UnaryExpression {
  require(winLen >= 2, s"winLen must be >= 2, got $winLen")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_window_hashes needs a string column, got ${child.dataType}")
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else TextHashOps.rollingHashes(v.asInstanceOf[UTF8String], winLen)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.TextHashOps.rollingHashes(
          ${c.value}, $winLen);
      }
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

/** classifier_stats_milli(text, dim) -> array<long> of
  * [n_tokens, sum_milli] — [[TokenGramOps.classifierStatsMilli]] as a
  * codegen'd kernel (whitespace tokens of the already-normalized
  * input; one element pair per DOCUMENT, so the downstream projection
  * is two cheap element_at's on an attribute).
  */
case class ClassifierStatsMilli(child: Expression, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"classifier_stats_milli needs a string column, got ${child.dataType}")
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else TokenGramOps.classifierStatsMilli(v.asInstanceOf[UTF8String], dim)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.TokenGramOps.classifierStatsMilli(
          ${c.value}, $dim);
      }
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object TextHashExpressions {
  import org.apache.spark.sql.GraftShims.{column, expression}

  def rollingWindowHashes(text: Column, winLen: Int): Column =
    column(RollingWindowHashes(expression(text), winLen))

  def tokenGramHash60s(text: Column, n: Int): Column =
    column(TokenGramHash60s(expression(text), n))

  def tokenGramHash60sDistinct(text: Column, n: Int): Column =
    column(TokenGramHash60s(expression(text), n, distinct = true))

  def slidingWindowMins(arr: Column, w: Int): Column =
    column(SlidingWindowMins(expression(arr), w))

  def tokenSeededHash60s(text: Column, seed: Int): Column =
    column(TokenSeededHash60s(expression(text), seed))

  def classifierStatsMilli(text: Column, dim: Int): Column =
    column(ClassifierStatsMilli(expression(text), dim))
}
