package graft.functions.expressions

import graft.functions.Bloom
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Handle to a Bloom filter's word array: broadcast-backed at scale (the
  * 100 TB probe side ships one broadcast handle per task, not m/8 bytes of
  * plan), or a plain local array for the SQL-literal registration path. */
sealed trait BloomBitsRef extends Serializable { def words: Array[Long] }
case class BroadcastBloomBits(bc: Broadcast[Array[Long]]) extends BloomBitsRef {
  override def words: Array[Long] = bc.value
}
case class LocalBloomBits(w: Array[Long]) extends BloomBitsRef {
  override def words: Array[Long] = w
}

/** Codegen'd Bloom-filter membership probe over a 60-bit-hash column —
  * `graft.functions.Bloom.mightContain` as a Catalyst expression.
  *
  * This sits on qd10's full train-corpus scan, the textbook per-row-hot
  * position: a Scala UDF there boxes every hash into a `java.lang.Long`,
  * crosses the interpreted-eval boundary per row, and blocks expression
  * pipelining — the exact failure mode the repo's other hot-path
  * expressions (ShingleHash60, NfcNormalize) exist to avoid. `doGenCode`
  * emits a direct call into [[probe]] through a reference object, so the
  * probe inlines into the enclosing whole-stage-generated method
  * (`ShingleExpressionsSpec`-style fallback-off coverage in
  * `BloomExpressionSpec`; `PlanQualitySpec` pins the absence of ScalaUDF
  * on qd10's probe stage). Deterministic: a pure function of
  * (filter words, h, k), same as the UDF it replaces. */
case class BloomMightContain(child: Expression, filter: BloomBitsRef, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  // resolve the broadcast once per task, not once per row
  @transient private lazy val words: Array[Long] = filter.words

  def probe(h: Long): Boolean = Bloom.mightContain(words, h, k)

  override protected def nullSafeEval(h: Any): Any = probe(h.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.probe($h);")
  }

  override def prettyName: String = "bloom_might_contain"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomExpressions {
  import org.apache.spark.sql.GraftSqlShim

  /** Probe a broadcast filter: `bloomMightContain(col("h"), bcBits, k)`. */
  def bloomMightContain(h: Column, bits: Broadcast[Array[Long]], k: Int): Column =
    GraftSqlShim.column(
      BloomMightContain(GraftSqlShim.expression(h), BroadcastBloomBits(bits), k))
}
