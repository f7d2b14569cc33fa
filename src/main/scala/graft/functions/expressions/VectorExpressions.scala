package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two double-array columns as ONE fused loop.
  *
  * Bit-identical to the composed-builtin formulation
  * `aggregate(zip_with(x, y, (a,b) -> a*b), 0.0D, (acc,p) -> acc+p)` —
  * the repo-wide dot-product convention every cosine mirror contract is
  * written against — on the full semantic surface, not just the happy
  * path ([[graft.ShingleExpressionsSpec]] pins all of it):
  *  - equal-length arrays: the SAME left-to-right IEEE sequence
  *    (acc += x(i)*y(i) from a 0.0 seed — no reassociation, no FMA), so
  *    every cosine, rank and oracle hash is unchanged;
  *  - unequal lengths: null (zip_with null-pads the shorter side, the
  *    null product nullifies the builtin sum);
  *  - a null element on either side: null (same propagation);
  *  - two empty arrays: 0.0 (the fold's seed).
  *
  * Why it exists: the builtin higher-order functions are CodegenFallback
  * — every candidate pair pays two lambda dispatches PER ELEMENT plus an
  * intermediate product array. This is the single hottest scalar kernel
  * in the engine (every ANN scan, every norm projection, the kNN-graph
  * build's in-cell pair scoring), so it gets the ShingleHash60 treatment:
  * a custom Expression with `doGenCode` emitting a reference-object call
  * into [[compute]], staying inside whole-stage codegen (SURVEY §7.1
  * preference case (b)).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // non-null children can still yield null (length mismatch / null element)
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  /** Boxed so the length-mismatch / null-element cases can return null —
    * one box per PAIR (not per element) is noise next to the interpreted
    * per-element dispatch it replaces. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecDot", this, classOf[VecDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = $ref.compute($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Integer dot product of two int-array columns (the int8-quantized ANN
  * path): ONE fused loop, identical to
  * `aggregate(zip_with(x, y, (a,b) -> CAST(a*b AS BIGINT)), 0L, (acc,p) -> acc+p)`
  * on the non-overflowing-product domain (null on length mismatch / null
  * element, 0 on empty arrays, exact integer sums otherwise) — which is
  * the builtin's ENTIRE value domain under the session's ANSI mode (an
  * int-overflowing a*b throws there; legacy mode would wrap where this
  * kernel computes the exact wide product). The int8 path's products are
  * bounded by ±127², far inside the shared domain.
  * Same rationale as [[VecDot]]: the builtin pair is CodegenFallback.
  */
case class VecDotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      // exact wide product: equals the builtin everywhere the builtin
      // yields a value (ANSI throws on int-overflowing products)
      acc += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecDotLong", this, classOf[VecDotLong].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = $ref.compute($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.longValue();
      }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Squared L2 distance of two double-array columns as ONE fused loop —
  * the cell-assignment kernel of the kNN-graph build's distributed
  * coarse-to-fine scan ([[graft.pipeline.KnnGraph.build]]): every
  * (vector, probed fine centroid) pair scores through this inside the
  * seed-keyed equi-join, so like [[VecDot]] it must stay inside
  * whole-stage codegen.
  *
  * Bit-identical on the full semantic surface
  * ([[graft.ShingleExpressionsSpec]] pins it, codegen fallback disabled)
  * to the composed-builtin formulation
  * `aggregate(zip_with(x, y, (a,b) -> (a-b)*(a-b)), 0.0D, (acc,p) -> acc+p)`
  * AND to the driver-side widening loop's `acc += d*d` left fold
  * ([[graft.pipeline.KMeans.nearestK]]'s arithmetic): same
  * left-to-right IEEE sequence from a 0.0 seed (no reassociation, no
  * FMA), null on length mismatch or a null element, 0.0 on two empty
  * arrays — so distributed fine-cell ranking orders exactly as the
  * driver loop it replaced would have.
  */
case class VecL2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecL2Sq", this, classOf[VecL2Sq].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = $ref.compute($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Asymmetric-distance (ADC) lookup score for product-quantized vectors:
  * `left` is the stored code array (int, one entry per subspace), `right`
  * the query's flattened lookup table (double, subspaces × subK entries,
  * subspace-major). Score = Σ_s table[s·subK + codes[s]] — the PQ
  * approximation of dot(query, vector) as S table reads instead of a
  * dim-length multiply-accumulate, the kernel the whole PQ memory story
  * rests on. subK derives per row as table.length / codes.length, so the
  * expression needs no constant plumbing.
  *
  * Bit-identical ([[graft.ShingleExpressionsSpec]] pins it, codegen
  * fallback disabled) to the composed-builtin formulation
  * `aggregate(zip_with(codes, sequence(0, S-1), (c, s) ->
  * element_at(tbl, s*subK + c + 1)), 0.0D, (acc, x) -> acc + x)`:
  * same left-to-right IEEE accumulation from a 0.0 seed, null on null
  * elements, null when the table length is not a positive multiple of the
  * code count or a code falls outside [0, subK) (where the builtin's
  * element_at would raise or null out), 0.0 on an empty code array.
  * Same rationale as [[VecDot]]: the builtin pair is CodegenFallback and
  * this runs once per (query, candidate) pair on the ADC scan.
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  def compute(codes: ArrayData, table: ArrayData): java.lang.Double = {
    val s = codes.numElements()
    if (s == 0) return java.lang.Double.valueOf(0.0)
    val t = table.numElements()
    if (t % s != 0 || t == 0) return null
    val subK = t / s
    var acc = 0.0
    var i = 0
    while (i < s) {
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      if (c < 0 || c >= subK) return null
      val idx = i * subK + c
      if (table.isNullAt(idx)) return null
      acc += table.getDouble(idx)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = $ref.compute($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** The engine-wide dot-product kernel; see [[VecDot]]. */
  def vecDot(x: Column, y: Column): Column =
    GraftSqlShim.column(VecDot(GraftSqlShim.expression(x), GraftSqlShim.expression(y)))

  /** Integer twin for the int8-quantized path; see [[VecDotLong]]. */
  def vecDotLong(x: Column, y: Column): Column =
    GraftSqlShim.column(VecDotLong(GraftSqlShim.expression(x), GraftSqlShim.expression(y)))

  /** Squared-L2 assignment kernel; see [[VecL2Sq]]. */
  def vecL2Sq(x: Column, y: Column): Column =
    GraftSqlShim.column(VecL2Sq(GraftSqlShim.expression(x), GraftSqlShim.expression(y)))

  /** PQ asymmetric-distance lookup; see [[PqAdc]]. */
  def pqAdc(codes: Column, table: Column): Column =
    GraftSqlShim.column(PqAdc(GraftSqlShim.expression(codes), GraftSqlShim.expression(table)))
}
