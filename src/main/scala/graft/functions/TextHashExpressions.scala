package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
    if (n < winLen) return new GenericArrayData(Array.emptyLongArray)
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
    new GenericArrayData(out)
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

object TextHashExpressions {
  import org.apache.spark.sql.GraftShims.{column, expression}

  def rollingWindowHashes(text: Column, winLen: Int): Column =
    column(RollingWindowHashes(expression(text), winLen))
}
