package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 60-bit hashes of all character n-grams of a string.
  *
  * Semantically identical to
  * `array_distinct(transform(charShingles(text, n), g -> conv(substr(md5(g),1,15),16,10)))`
  * but runs as ONE tight JVM loop per row: no per-gram String, no hex
  * encoding, no BigInteger parse, no four interpreted higher-order passes.
  * The 60-bit value is the first 15 hex digits of the gram's MD5 — i.e. the
  * first 8 digest bytes as an unsigned value shifted right by 4 — matching
  * the DuckDB oracle's `CAST('0x' || substr(md5(g),1,15) AS BIGINT)` bit
  * for bit. This is the preference-order case (b) from SURVEY §7.1: a
  * custom Expression where built-ins exist but measurably can't keep up
  * (the shingling stage dominates dedup at corpus scale).
  *
  * Codegen: `doGenCode` emits a direct call into [[compute]] (via a
  * reference object), so the expression stays inside whole-stage codegen —
  * no per-row virtual `eval` dispatch, no fallback-induced pipeline break.
  */
case class ShingleHash60(child: Expression, n: Int) extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else compute(v.asInstanceOf[UTF8String])
  }

  def compute(s: UTF8String): ArrayData = {
    // zero-allocation hot loop: the digest writes into a reused 16-byte
    // buffer (MessageDigest.digest(buf,...) resets the digest, so no
    // per-gram array), and hashes collect into a primitive long[] that is
    // sorted then deduped in place — no boxed Longs, no hash-set build
    // (set semantics are order-free and the output is sorted anyway)
    val md = ShingleHash60.digest.get()
    val buf = ShingleHash60.digestBuf.get()
    val hashes: Array[Long] =
      if (s.numBytes == s.numChars) {
        // ASCII fast path: grams are byte slices
        val bytes = s.getBytes
        val cnt = bytes.length - n + 1
        if (cnt <= 0) Array.emptyLongArray
        else {
          val all = new Array[Long](cnt)
          var i = 0
          while (i < cnt) {
            md.update(bytes, i, n)
            md.digest(buf, 0, 16)
            all(i) = prefix60(buf)
            i += 1
          }
          all
        }
      } else {
        // multi-byte path: gram boundaries count CODE POINTS, matching
        // Spark's substr and DuckDB's substr (UTF-16 code units would split
        // surrogate pairs and diverge from the pinned oracle semantics)
        val str = s.toString
        val cpStarts = new Array[Int](str.codePointCount(0, str.length) + 1)
        var ci = 0; var off = 0
        while (off < str.length) {
          cpStarts(ci) = off
          off += Character.charCount(str.codePointAt(off))
          ci += 1
        }
        cpStarts(ci) = str.length
        val cnt = ci - n + 1
        if (cnt <= 0) Array.emptyLongArray
        else {
          val all = new Array[Long](cnt)
          var i = 0
          while (i < cnt) {
            md.update(str.substring(cpStarts(i), cpStarts(i + n))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            md.digest(buf, 0, 16)
            all(i) = prefix60(buf)
            i += 1
          }
          all
        }
      }
    // sorted output: downstream intersections become O(n+m) merges
    // (SortedLongIntersectCount); dedup is a linear sweep after the sort
    java.util.Arrays.sort(hashes)
    var j = 0
    var i = 1
    while (i < hashes.length) {
      if (hashes(i) != hashes(j)) { j += 1; hashes(j) = hashes(i) }
      i += 1
    }
    val size = if (hashes.isEmpty) 0 else j + 1
    new GenericArrayData(
      if (size == hashes.length) hashes else java.util.Arrays.copyOf(hashes, size))
  }

  /** First 15 hex digits of the digest as a number = first 8 bytes as an
    * unsigned 64-bit value, logically shifted right by 4. */
  private def prefix60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHash60", this, classOf[ShingleHash60].getName)
    val childGen = child.genCode(ctx)
    val arrayCls = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      $arrayCls ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = $ref.compute(${childGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object ShingleHash60 {
  // MessageDigest is stateful and not thread-safe; one per executor thread,
  // plus a reused 16-byte output buffer so the hot loop never allocates
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val digestBuf: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](16))
}

/** MinHash signature over a long-array column in a single pass: for each of
  * `numPerms` affine permutations over the Mersenne field 2^31-1, the
  * minimum permuted value. Replaces numPerms × (transform + array_min)
  * interpreted passes with one loop. Constants must match
  * graft.pipeline.TextOps.minhashA/B (shared with the DuckDB oracle).
  * Codegen'd via a reference-object call, same as [[ShingleHash60]]. */
case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long], p: Long)
    extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null for empty shingle sets

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else computeSig(v.asInstanceOf[ArrayData])
  }

  def computeSig(arr: ArrayData): ArrayData = {
    // no shingles -> no signature (callers must pre-filter short texts;
    // returning sentinel minima would bucket all empty docs together)
    if (arr.numElements() == 0) return null
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val hm = arr.getLong(i) % p
      var j = 0
      while (j < k) {
        val x = (as(j) * hm + bs(j)) % p
        if (x < mins(j)) mins(j) = x
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    val childGen = child.genCode(ctx)
    val arrayCls = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      $arrayCls ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = $ref.computeSig(${childGen.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** |a ∩ b| for two SORTED long arrays as a single merge scan — O(n+m) with
  * zero allocation, vs array_intersect's per-call hash set build. Both
  * inputs must be sorted ascending and duplicate-free (ShingleHash60's
  * output contract). Codegen'd: the merge runs as a direct call inside the
  * enclosing whole-stage-generated method. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    computeCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  def computeCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedIntersect", this,
      classOf[SortedLongIntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.computeCount($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Sign-bit sketch of a double-array slice: elements [start, start+len)
  * fold as bit = x > 0 into one long, MSB-first (acc·2 + bit — exactly the
  * `aggregate(slice(v, start+1, len), 0L, (acc, x) -> acc*2 + if(x>0,1,0))`
  * builtin formulation, which [[graft.ShingleExpressionsSpec]] pins bit for
  * bit). The builtin higher-order functions are CodegenFallback — every
  * corpus row pays interpreted lambda dispatch per element — where this
  * runs as one tight loop inside whole-stage codegen; the sketch pack is
  * the per-row hot path of the binary-Hamming ANN scans (qs11/qs13).
  * `len` ≤ 63 keeps the fold free of sign-bit overflow. */
case class SignSketch(child: Expression, start: Int, len: Int) extends Expression {
  require(start >= 0 && len >= 0 && len <= 63, s"bad slice [$start, +$len)")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else computeSketch(v.asInstanceOf[ArrayData])
  }

  def computeSketch(arr: ArrayData): Long = {
    val end = math.min(start + len, arr.numElements())
    var acc = 0L
    var i = start
    while (i < end) {
      acc = acc * 2 + (if (arr.getDouble(i) > 0) 1L else 0L)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signSketch", this, classOf[SignSketch].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${ev.value} = $ref.computeSketch(${childGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** SimHash bit-pack over a token-hash array in ONE pass: per bit j, the
  * sign of the vote Σ over hashes of (2·bit_j(h) − 1); set bits OR into the
  * result. Bit-identical to the composed per-bit formulation in
  * [[graft.pipeline.TextOps.simhash]] —
  * `Σ_j when(aggregate(hashes, 0L, (acc,h) -> acc + ((h>>j)&1)*2-1) > 0, 2^j, 0)`
  * — on the full surface (pure integer arithmetic, so equality is exact):
  * a null array or any null element zeroes EVERY vote's `when` branch in
  * the composed form (null comparison → otherwise(0)), so both yield 0L;
  * empty arrays vote 0 everywhere → 0L. The composed form runs `bits`
  * interpreted CodegenFallback folds per document, each a full pass over
  * the hash array with two lambda dispatches per element; this is one
  * fused pass inside whole-stage codegen. */
case class SimHashPack(child: Expression, bits: Int) extends Expression {
  require(bits > 0 && bits <= 62, s"simhash bits must be in [1, 62], got $bits")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  // the composed form yields 0L (never null) on null input — see above
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else computePack(v.asInstanceOf[ArrayData])
  }

  def computePack(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Long](bits)
    var i = 0
    while (i < n) {
      // one null hash nullifies every per-bit vote in the composed form
      if (arr.isNullAt(i)) return 0L
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) { votes(j) += ((h >> j) & 1L) * 2 - 1; j += 1 }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < bits) { if (votes(j) > 0) acc += 1L << j; j += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHashPack", this, classOf[SimHashPack].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = false;
      long ${ev.value} = 0L;
      if (!${childGen.isNull}) {
        ${ev.value} = $ref.computePack(${childGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object ShingleExpressions {
  import graft.pipeline.TextOps
  import org.apache.spark.sql.GraftSqlShim

  def shingleHash60(text: Column, n: Int): Column =
    GraftSqlShim.column(ShingleHash60(GraftSqlShim.expression(text), n))

  def signSketch(v: Column, start: Int, len: Int): Column =
    GraftSqlShim.column(SignSketch(GraftSqlShim.expression(v), start, len))

  def minhashSig(hashes: Column, numPerms: Int): Column =
    GraftSqlShim.column(MinHashSig(GraftSqlShim.expression(hashes),
      (0 until numPerms).map(TextOps.minhashA).toArray,
      (0 until numPerms).map(TextOps.minhashB).toArray,
      TextOps.MinhashP))

  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlShim.column(SortedLongIntersectCount(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  def simHashPack(hashes: Column, bits: Int): Column =
    GraftSqlShim.column(SimHashPack(GraftSqlShim.expression(hashes), bits))
}
