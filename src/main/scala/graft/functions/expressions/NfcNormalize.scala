package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition step every text
  * pipeline runs before hashing/dedup (decomposed "e" + U+0301 and
  * precomposed "é" must hash identically or near-dup detection silently
  * misses pairs). Spark has no builtin; this wraps `java.text.Normalizer`
  * (the JDK's implementation of Unicode NFC, the same normal form DuckDB's
  * `nfc_normalize` implements, which is what makes the oracle exact).
  *
  * Fast path: NFC-normality is checked first (`Normalizer.isNormalized`),
  * so ASCII and already-composed text — the overwhelming majority of a
  * real corpus — returns the input UTF8String unchanged with zero
  * allocation. Codegen'd via a reference-object call like the shingle
  * expressions, so it pipelines inside whole-stage codegen.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(s: UTF8String): UTF8String = {
    // pure-ASCII bytes are always NFC; skip the String round trip entirely
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this, classOf[NfcNormalize].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object NfcNormalize {
  import org.apache.spark.sql.GraftSqlShim
  def nfc(text: Column): Column =
    GraftSqlShim.column(NfcNormalize(GraftSqlShim.expression(text)))
}
