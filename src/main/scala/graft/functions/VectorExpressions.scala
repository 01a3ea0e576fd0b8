package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense-vector kernels as native Catalyst expressions.
  *
  * Embedding math (dot / normalize / LSH signatures) is a pure per-row
  * map — it must NOT cost a shuffle, and it must stay inside
  * whole-stage codegen. Interpreted HOF folds (`aggregate(zip_with(...))`)
  * work but each fold is an interpreted pass, and stacking 32 of them
  * (multi-table LSH) ballooned both plan size and cold codegen time
  * (sf0.1 s2_ann_lsh: 30 s cold / 6 s warm for 2 000 rows). Each
  * expression here generates one static call into [[VectorOps]], which
  * the JIT compiles once.
  *
  * Accumulation order is strictly left-to-right over the array (index
  * 0..n-1), matching the HOF fold and the DuckDB list_* oracles —
  * required for the driver's exact hash compare.
  */
object VectorOps {

  /** 2^59 as a double: scales a 60-bit hash into [0, 2) (shared with
    * the DuckDB oracle so the plane math is single-sourced).
    */
  val planeScale: Double = 5.764607523034235e17

  /** Deterministic pseudo-random hyperplane component in [-1, 1) for
    * plane p, dimension i (md5 of "hp<p>:<i>"), identical across runs
    * and engines. Matches the round-1 literal-shipping scheme.
    */
  def planeComponent(p: Int, i: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp$p:$i".getBytes("UTF-8"))
    val hex = digest.take(8).map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16).toDouble / planeScale) - 1.0
  }

  val maxDims = 256

  // flat [nPlanes * maxDims] plane matrix, computed once per plane count
  private val planeCache = new ConcurrentHashMap[Integer, Array[Double]]()
  def planes(nPlanes: Int): Array[Double] =
    planeCache.computeIfAbsent(nPlanes, n =>
      Array.tabulate(n * maxDims)(j => planeComponent(j / maxDims, j % maxDims)))

  private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  private def hasNullElement(v: ArrayData): Boolean = {
    var i = 0
    val n = v.numElements()
    while (i < n) { if (v.isNullAt(i)) return true; i += 1 }
    false
  }

  /** Left-to-right dot product; null when lengths differ or either
    * array contains a null element (the HOF-fold semantics these
    * kernels replaced: a null poisons the whole fold).
    */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    if (hasNullElement(a) || hasNullElement(b)) return null
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { acc += elem(a, i, aFloat) * elem(b, i, bFloat); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  /** Left-to-right sum of squared differences; null when lengths
    * differ or a null element appears (mirrors [[dot]]).
    */
  def sqDist(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    if (hasNullElement(a) || hasNullElement(b)) return null
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val d = elem(a, i, aFloat) - elem(b, i, bFloat)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Unit-normalized copy (all-zero unchanged), double output; null
    * when the input contains a null element.
    */
  def normalize(v: ArrayData, isFloat: Boolean): ArrayData = {
    if (hasNullElement(v)) return null
    val n = v.numElements()
    val out = new Array[Double](n)
    var i = 0
    var acc = 0.0
    while (i < n) { val x = elem(v, i, isFloat); out(i) = x; acc += x * x; i += 1 }
    val norm = math.sqrt(acc)
    if (norm > 0.0) { i = 0; while (i < n) { out(i) /= norm; i += 1 } }
    new GenericArrayData(out)
  }

  /** ADC score: sum over subspaces j of luts[j][codes[j]] —
    * left-to-right, matching the interpreted `aggregate(zip_with(...))`
    * fold this kernel replaced and DuckDB's
    * `list_sum(list_transform(...))` replay. Null when lengths differ,
    * a code is out of its LUT's range, or any touched entry is null
    * (fold-poisoning semantics like [[dot]]).
    */
  def adcScore(codes: ArrayData, luts: ArrayData): java.lang.Double = {
    val n = codes.numElements()
    if (n != luts.numElements()) return null
    var acc = 0.0
    var j = 0
    while (j < n) {
      if (codes.isNullAt(j) || luts.isNullAt(j)) return null
      val lut = luts.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= lut.numElements() || lut.isNullAt(c)) return null
      acc += lut.getDouble(c)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Per-vector symmetric int8 quantization: scale = max|x| / 127,
    * q_i = floor(x_i / scale + 0.5) (explicit half-up — `floor(+0.5)`
    * is the same IEEE op sequence in the DuckDB oracle, unlike
    * rint/round whose half-even vs half-up semantics differ across
    * engines). All-zero vectors quantize to all zeros. 4x smaller than
    * float32 — at corpus scale the quantized vectors are what a
    * cluster can hold resident for candidate scoring.
    */
  def quantize8(v: ArrayData, isFloat: Boolean): ArrayData = {
    if (hasNullElement(v)) return null
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(elem(v, i, isFloat)); if (a > maxAbs) maxAbs = a; i += 1
    }
    val scale = maxAbs / 127.0
    val out = new Array[Byte](n)
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(elem(v, i, isFloat) / scale + 0.5).toByte; i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** The dequantization factor matching [[quantize8]]: max|x| / 127. */
  def quantScale(v: ArrayData, isFloat: Boolean): java.lang.Double = {
    if (hasNullElement(v)) return null
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(elem(v, i, isFloat)); if (a > maxAbs) maxAbs = a; i += 1
    }
    java.lang.Double.valueOf(maxAbs / 127.0)
  }

  /** Exact integer dot product of two int8 vectors (null on length
    * mismatch / null elements, mirroring [[dot]]). Never overflows:
    * |sum| <= n * 127^2.
    */
  def dotInt8(a: ArrayData, b: ArrayData): java.lang.Long = {
    if (a.numElements() != b.numElements()) return null
    if (hasNullElement(a) || hasNullElement(b)) return null
    var acc = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) { acc += a.getByte(i).toLong * b.getByte(i).toLong; i += 1 }
    java.lang.Long.valueOf(acc)
  }

  /** Binary search in a SORTED long array (membership test against a
    * broadcast-small sorted set — e.g. the boilerplate line-hash set in
    * line dedup). O(log n) per probe where `array_contains` is O(n);
    * at a 10^4-entry set that is the difference between 14 and 10^4
    * comparisons per line.
    */
  def sortedContains(sorted: ArrayData, x: Long): Boolean = {
    var lo = 0
    var hi = sorted.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = sorted.getLong(mid)
      if (v == x) return true
      else if (v < x) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  /** Per-table sign-bit LSH buckets: bucket[t] has bit p set iff
    * dot(vec, plane_{t*planesPerTable+p}) > 0. One kernel call replaces
    * numTables*planesPerTable interpreted folds. Vectors longer than
    * [[maxDims]] are projected on their first maxDims dimensions
    * (documented clamp — never index into the next plane's row); null
    * elements yield a null bucket array.
    */
  def lshBuckets(
      v: ArrayData, isFloat: Boolean,
      planesPerTable: Int, numTables: Int): ArrayData = {
    if (hasNullElement(v)) return null
    val nPlanes = planesPerTable * numTables
    val pl = planes(nPlanes)
    val dims = math.min(v.numElements(), maxDims)
    val buckets = new Array[Long](numTables)
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var i = 0
      val base = p * maxDims
      while (i < dims) { acc += elem(v, i, isFloat) * pl(base + i); i += 1 }
      if (acc > 0.0) buckets(p / planesPerTable) |= (1L << (p % planesPerTable))
      p += 1
    }
    new GenericArrayData(buckets)
  }

  /** Argmin over k centroids held as one flat row-major matrix:
    * returns (dist, cid) with the exact semantics of
    * `array_min(array(struct(sqDist(v, c_k), cid_k)...))` — ascending
    * (dist, cid) order, left-to-right accumulation per distance. One
    * compiled loop instead of k literal expression subtrees: at
    * k=625×64 dims the literal form was a plan-size/codegen pathology
    * (40k expression nodes), this is O(k·d) flops per row flat.
    * Null when the vector is null, has a null element, or its length
    * differs from the centroid dims (the literal form's per-struct
    * null edge is unreachable for a homogeneous corpus; spec-pinned
    * equivalence).
    */
  def nearestCentroid(
      v: ArrayData, isFloat: Boolean,
      flat: Array[Double], cids: Array[Int], dims: Int): InternalRow = {
    if (v == null || v.numElements() != dims || hasNullElement(v)) return null
    var bestD = 0.0
    var bestC = -1
    var k = 0
    while (k < cids.length) {
      var acc = 0.0
      var i = 0
      val base = k * dims
      while (i < dims) {
        val d = elem(v, i, isFloat) - flat(base + i)
        acc += d * d
        i += 1
      }
      if (bestC == -1 || acc < bestD || (acc == bestD && cids(k) < bestC)) {
        bestD = acc
        bestC = cids(k)
      }
      k += 1
    }
    if (bestC == -1) null
    else new GenericInternalRow(Array[Any](bestD, bestC))
  }

  /** Nearest AND second-nearest centroid in one pass over the same
    * flattened matrix — (dist, cid)-lexicographic like
    * [[nearestCentroid]], so it reproduces exactly the first two
    * elements of a sorted (dist, cid) struct array (the e3 shape)
    * without materializing or sorting k structs per row. Null when the
    * matrix has fewer than two centroids.
    */
  def nearestTwoCentroids(
      v: ArrayData, isFloat: Boolean,
      flat: Array[Double], cids: Array[Int], dims: Int): InternalRow = {
    if (v == null || v.numElements() != dims || hasNullElement(v)) return null
    if (cids.length < 2) return null
    var d1 = 0.0; var c1 = -1
    var d2 = 0.0; var c2 = -1
    var k = 0
    while (k < cids.length) {
      var acc = 0.0
      var i = 0
      val base = k * dims
      while (i < dims) {
        val d = elem(v, i, isFloat) - flat(base + i)
        acc += d * d
        i += 1
      }
      val c = cids(k)
      if (c1 == -1 || acc < d1 || (acc == d1 && c < c1)) {
        d2 = d1; c2 = c1
        d1 = acc; c1 = c
      } else if (c2 == -1 || acc < d2 || (acc == d2 && c < c2)) {
        d2 = acc; c2 = c
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](d1, c1, d2, c2))
  }

  /** Spark's (dist, cid) struct sort order as a strict less-than:
    * dist ascending with NaN largest (and NaN == NaN), cid breaking
    * ties — exactly the ordering `array_sort(array(struct(dist, cid)
    * ...))` applies, so [[topCentroids]] is value-identical to the
    * sorted-literal form it replaces.
    */
  private def distCidLess(d1: Double, c1: Int, d2: Double, c2: Int): Boolean = {
    val cmp =
      if (d1 < d2) -1
      else if (d1 > d2) 1
      else if (d1 == d2) 0
      else { // at least one NaN: NaN sorts largest, two NaNs tie
        val n1 = java.lang.Double.isNaN(d1)
        val n2 = java.lang.Double.isNaN(d2)
        if (n1 && n2) 0 else if (n1) 1 else -1
      }
    cmp < 0 || (cmp == 0 && c1 < c2)
  }

  /** The `nprobe` nearest centroids as an ascending (dist, cid) struct
    * array — the probe-cell selection of every IVF-family query, value-
    * identical to `slice(array_sort(array(struct(sqDist(v,c),cid)...)),
    * 1, nprobe)` (min(nprobe, k) entries, (dist, cid)-lexicographic,
    * left-to-right distance accumulation). Bounded insertion into an
    * nprobe-sized buffer: O(k·(dims + nprobe)) per row with NO k-sized
    * allocation or sort, and — the actual point — O(1) plan size in k
    * (the literal form planned k struct subtrees per probe query,
    * ~1 s of codegen at k = 174 and a Janino wall at corpus-scaled k).
    * Null exactly when [[nearestCentroid]] is null.
    */
  def topCentroids(
      v: ArrayData, isFloat: Boolean,
      flat: Array[Double], cids: Array[Int], dims: Int, nprobe: Int): ArrayData = {
    if (v == null || v.numElements() != dims || hasNullElement(v)) return null
    val cap = math.min(nprobe, cids.length)
    val dist = new Array[Double](cap)
    val cid = new Array[Int](cap)
    var size = 0
    var k = 0
    while (k < cids.length) {
      var acc = 0.0
      var i = 0
      val base = k * dims
      while (i < dims) {
        val d = elem(v, i, isFloat) - flat(base + i)
        acc += d * d
        i += 1
      }
      val c = cids(k)
      if (size < cap || distCidLess(acc, c, dist(size - 1), cid(size - 1))) {
        var pos = if (size < cap) size else cap - 1
        while (pos > 0 && distCidLess(acc, c, dist(pos - 1), cid(pos - 1))) {
          dist(pos) = dist(pos - 1)
          cid(pos) = cid(pos - 1)
          pos -= 1
        }
        dist(pos) = acc
        cid(pos) = c
        if (size < cap) size += 1
      }
      k += 1
    }
    val out = new Array[Any](size)
    var j = 0
    while (j < size) {
      out(j) = new GenericInternalRow(Array[Any](dist(j), cid(j)))
      j += 1
    }
    new GenericArrayData(out)
  }
}

private[graft] trait VectorExpr extends Expression {
  override def nullable: Boolean = true

  /** Reject non-numeric-array inputs at ANALYSIS time: without this, a
    * mistyped column (e.g. array<int>) surfaced as an executor-side
    * IllegalArgumentException from [[isFloatArray]] mid-job instead of
    * an AnalysisException before any task ran.
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    children.map(_.dataType).find {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => false
      case _ => true
    } match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float> or array<double> arguments, got ${bad.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  protected def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }
}

/** vector_dot(a, b) -> double (left-to-right accumulation). */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with VectorExpr {
  override def dataType: DataType = DoubleType
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else VectorOps.dot(
      a.asInstanceOf[ArrayData], isFloatArray(left),
      b.asInstanceOf[ArrayData], isFloatArray(right))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (la, lb) = (left.genCode(ctx), right.genCode(ctx))
    val tmp = ctx.freshName("dotBoxed")
    ev.copy(code = code"""
      ${la.code}
      ${lb.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!(${la.isNull} || ${lb.isNull})) {
        java.lang.Double $tmp = graft.functions.VectorOps.dot(
          ${la.value}, ${isFloatArray(left)}, ${lb.value}, ${isFloatArray(right)});
        if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = $tmp.doubleValue(); }
      }
    """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

/** adc_score(codes, luts) -> double: sum over j of luts[j][codes[j]].
  * The PQ asymmetric-distance hot path — one table lookup per subspace
  * per corpus row, so it must stay a single static call inside
  * whole-stage codegen (the interpreted aggregate(zip_with(...)) fold
  * it replaced allocated a zipped array per row and ran both lambdas
  * interpreted).
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_score expects (array<int>, array<array<double>>), got (${l.catalogString}, ${r.catalogString})")
    }
  }
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else VectorOps.adcScore(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (la, lb) = (left.genCode(ctx), right.genCode(ctx))
    val tmp = ctx.freshName("adcBoxed")
    ev.copy(code = code"""
      ${la.code}
      ${lb.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!(${la.isNull} || ${lb.isNull})) {
        java.lang.Double $tmp = graft.functions.VectorOps.adcScore(
          ${la.value}, ${lb.value});
        if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = $tmp.doubleValue(); }
      }
    """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

/** vector_sq_dist(a, b) -> double squared L2 (left-to-right accumulation). */
case class VectorSqDist(left: Expression, right: Expression)
    extends BinaryExpression with VectorExpr {
  override def dataType: DataType = DoubleType
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else VectorOps.sqDist(
      a.asInstanceOf[ArrayData], isFloatArray(left),
      b.asInstanceOf[ArrayData], isFloatArray(right))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (la, lb) = (left.genCode(ctx), right.genCode(ctx))
    val tmp = ctx.freshName("sqDistBoxed")
    ev.copy(code = code"""
      ${la.code}
      ${lb.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!(${la.isNull} || ${lb.isNull})) {
        java.lang.Double $tmp = graft.functions.VectorOps.sqDist(
          ${la.value}, ${isFloatArray(left)}, ${lb.value}, ${isFloatArray(right)});
        if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = $tmp.doubleValue(); }
      }
    """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

/** vector_normalize(v) -> array<double> unit vector (zero stays zero). */
case class VectorNormalize(child: Expression)
    extends UnaryExpression with VectorExpr {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else VectorOps.normalize(v.asInstanceOf[ArrayData], isFloatArray(child))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.VectorOps.normalize(
          ${c.value}, ${isFloatArray(child)});
      }
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

/** lsh_buckets(v, planesPerTable, numTables) -> array<long>, one
  * sign-bit bucket per hash table (posexplode for (table, bucket) rows).
  */
case class LshBuckets(child: Expression, planesPerTable: Int, numTables: Int)
    extends UnaryExpression with VectorExpr {
  require(planesPerTable >= 1 && planesPerTable <= 62, "1..62 planes per table")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else VectorOps.lshBuckets(
      v.asInstanceOf[ArrayData], isFloatArray(child), planesPerTable, numTables)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.VectorOps.lshBuckets(
          ${c.value}, ${isFloatArray(child)}, $planesPerTable, $numTables);
      }
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

/** vector_quantize8(v) -> array<tinyint> (per-vector max-abs scale). */
case class VectorQuantize(child: Expression)
    extends UnaryExpression with VectorExpr {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else VectorOps.quantize8(v.asInstanceOf[ArrayData], isFloatArray(child))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.VectorOps.quantize8(
          ${c.value}, ${isFloatArray(child)});
      }
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

/** vector_quant_scale(v) -> double, the max|x|/127 dequantization factor. */
case class VectorQuantScale(child: Expression)
    extends UnaryExpression with VectorExpr {
  override def dataType: DataType = DoubleType
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else VectorOps.quantScale(v.asInstanceOf[ArrayData], isFloatArray(child))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val tmp = ctx.freshName("qsBoxed")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${c.isNull}) {
        java.lang.Double $tmp = graft.functions.VectorOps.quantScale(
          ${c.value}, ${isFloatArray(child)});
        if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = $tmp.doubleValue(); }
      }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

/** vector_dot_int8(a, b) -> bigint over array<tinyint> inputs. */
case class VectorDotInt8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    children.map(_.dataType).find {
      case ArrayType(ByteType, _) => false
      case _ => true
    } match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<tinyint> arguments, got ${bad.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else VectorOps.dotInt8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (la, lb) = (left.genCode(ctx), right.genCode(ctx))
    val tmp = ctx.freshName("dot8Boxed")
    ev.copy(code = code"""
      ${la.code}
      ${lb.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!(${la.isNull} || ${lb.isNull})) {
        java.lang.Long $tmp = graft.functions.VectorOps.dotInt8(${la.value}, ${lb.value});
        if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = $tmp.longValue(); }
      }
    """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

/** sorted_contains(sorted_array<long>, x) -> boolean (binary search). */
case class SortedContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, bigint), got (${l.catalogString}, ${r.catalogString})")
    }
  }
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else java.lang.Boolean.valueOf(
      VectorOps.sortedContains(a.asInstanceOf[ArrayData], b.asInstanceOf[Long]))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (la, lb) = (left.genCode(ctx), right.genCode(ctx))
    ev.copy(code = code"""
      ${la.code}
      ${lb.code}
      boolean ${ev.isNull} = (${la.isNull} || ${lb.isNull});
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.VectorOps.sortedContains(${la.value}, ${lb.value});
      }
    """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

/** vector_nearest_centroid(v) -> struct(dist, cid): compiled argmin
  * over a driver-side centroid matrix (k × dims, flat row-major),
  * value-identical to `array_min(array(struct(sqDist(v,c),cid)...))`.
  * The matrix rides the expression as data (codegen reference object),
  * not as k literal subtrees — plan size and codegen stay O(1) in k,
  * which is what lets n_cells scale with the corpus (SemDeDup/IVF at
  * 100 TB wants thousands of cells; 625 literal structs of 64-double
  * literals each already broke whole-stage codegen).
  */
case class VectorNearestCentroid(
    child: Expression, cids: Seq[Int], flat: Seq[Double], dims: Int)
    extends UnaryExpression with VectorExpr {
  require(dims > 0 && cids.nonEmpty && flat.size == cids.size * dims,
    "centroid matrix must be k x dims")
  override def dataType: DataType = StructType(Seq(
    StructField("dist", DoubleType), StructField("cid", IntegerType)))

  // materialized once per executor/expression instance, shared by codegen
  @transient lazy val flatArr: Array[Double] = flat.toArray
  @transient lazy val cidArr: Array[Int] = cids.toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else VectorOps.nearestCentroid(
      v.asInstanceOf[ArrayData], isFloatArray(child), flatArr, cidArr, dims)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val self = ctx.addReferenceObj("nearestCentroidExpr", this,
      "graft.functions.VectorNearestCentroid")
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.VectorOps.nearestCentroid(
          ${c.value}, ${isFloatArray(child)}, $self.flatArr(), $self.cidArr(), $dims);
      }
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** struct(d1, cid1, d2, cid2) of the nearest and second-nearest
  * centroid — the per-cell separation diagnostic's shape (e3), one
  * kernel pass instead of building + sorting k literal structs per row
  * (which is also O(k) literal subtrees in the plan — the codegen wall
  * the [[VectorNearestCentroid]] scaladoc documents).
  */
case class VectorNearestTwoCentroids(
    child: Expression, cids: Seq[Int], flat: Seq[Double], dims: Int)
    extends UnaryExpression with VectorExpr {
  require(dims > 0 && cids.size >= 2 && flat.size == cids.size * dims,
    "centroid matrix must be k x dims with k >= 2")
  override def dataType: DataType = StructType(Seq(
    StructField("d1", DoubleType), StructField("cid1", IntegerType),
    StructField("d2", DoubleType), StructField("cid2", IntegerType)))

  @transient lazy val flatArr: Array[Double] = flat.toArray
  @transient lazy val cidArr: Array[Int] = cids.toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else VectorOps.nearestTwoCentroids(
      v.asInstanceOf[ArrayData], isFloatArray(child), flatArr, cidArr, dims)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val self = ctx.addReferenceObj("nearestTwoExpr", this,
      "graft.functions.VectorNearestTwoCentroids")
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.VectorOps.nearestTwoCentroids(
          ${c.value}, ${isFloatArray(child)}, $self.flatArr(), $self.cidArr(), $dims);
      }
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<struct(dist, cid)> of the `nprobe` nearest centroids in
  * ascending (dist, cid) order — the probe-cell selection kernel. One
  * compiled matrix pass whose centroid matrix rides as a codegen
  * reference object, replacing the `slice(array_sort(array(struct(...)
  * ...)), 1, nprobe)` literal form that planned k struct subtrees per
  * probe query (the last √n-growth plan shape after
  * [[VectorNearestCentroid]] killed it on the assignment side).
  */
case class VectorTopCentroids(
    child: Expression, cids: Seq[Int], flat: Seq[Double], dims: Int,
    nprobe: Int)
    extends UnaryExpression with VectorExpr {
  require(dims > 0 && cids.nonEmpty && flat.size == cids.size * dims,
    "centroid matrix must be k x dims")
  require(nprobe >= 1, "nprobe must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType), StructField("cid", IntegerType))),
    containsNull = false)

  @transient lazy val flatArr: Array[Double] = flat.toArray
  @transient lazy val cidArr: Array[Int] = cids.toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else VectorOps.topCentroids(
      v.asInstanceOf[ArrayData], isFloatArray(child), flatArr, cidArr, dims,
      nprobe)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val self = ctx.addReferenceObj("topCentroidsExpr", this,
      "graft.functions.VectorTopCentroids")
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.VectorOps.topCentroids(
          ${c.value}, ${isFloatArray(child)}, $self.flatArr(), $self.cidArr(),
          $dims, $nprobe);
      }
      boolean ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftShims.{column, expression}

  def vectorDot(a: Column, b: Column): Column =
    column(VectorDot(expression(a), expression(b)))

  def vectorSqDist(a: Column, b: Column): Column =
    column(VectorSqDist(expression(a), expression(b)))

  def vectorNormalize(v: Column): Column =
    column(VectorNormalize(expression(v)))

  def lshBuckets(v: Column, planesPerTable: Int, numTables: Int): Column =
    column(LshBuckets(expression(v), planesPerTable, numTables))

  def vectorQuantize(v: Column): Column =
    column(VectorQuantize(expression(v)))

  def vectorQuantScale(v: Column): Column =
    column(VectorQuantScale(expression(v)))

  def vectorDotInt8(a: Column, b: Column): Column =
    column(VectorDotInt8(expression(a), expression(b)))

  def adcScore(codes: Column, luts: Column): Column =
    column(AdcScore(expression(codes), expression(luts)))

  def sortedContains(sortedArr: Column, x: Column): Column =
    column(SortedContains(expression(sortedArr), expression(x)))

  /** struct(d1, cid1, d2, cid2) of the two nearest centroids; see
    * [[VectorNearestTwoCentroids]].
    */
  def nearestTwoCentroidsStruct(
      vec: Column, centroids: Seq[(Int, Array[Double])]): Column = {
    val dims = centroids.head._2.length
    column(VectorNearestTwoCentroids(
      expression(vec),
      centroids.map(_._1),
      centroids.flatMap(_._2.toSeq),
      dims))
  }

  /** array<struct(dist, cid)> of the nprobe nearest centroids,
    * ascending (dist, cid); see [[VectorTopCentroids]].
    */
  def topCentroidsStruct(
      vec: Column, centroids: Seq[(Int, Array[Double])], nprobe: Int): Column = {
    val dims = centroids.head._2.length
    column(VectorTopCentroids(
      expression(vec),
      centroids.map(_._1),
      centroids.flatMap(_._2.toSeq),
      dims, nprobe))
  }

  /** struct(dist, cid) of the nearest centroid; see
    * [[VectorNearestCentroid]].
    */
  def nearestCentroidStruct(
      vec: Column, centroids: Seq[(Int, Array[Double])]): Column = {
    val dims = centroids.head._2.length
    column(VectorNearestCentroid(
      expression(vec),
      centroids.map(_._1),
      centroids.flatMap(_._2.toSeq),
      dims))
  }
}
