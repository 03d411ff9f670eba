package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization of a string column
  * as a native Catalyst expression — the text-cleaning primitive Spark
  * lacks (combining sequences like `a` + U+0301 compose to `á`, so
  * hashing/dedup/equality see ONE canonical byte form per text; web
  * corpora mix composed and decomposed producers freely).
  *
  * Stays inside whole-stage codegen: the generated code calls the static
  * [[NfcNormalize.nfc]] helper (ICU-grade composition via
  * `java.text.Normalizer`, JDK-only). The fast path is the
  * `Normalizer.isNormalized` check — for ASCII/already-composed text
  * (the overwhelming majority of a real corpus) it's a single scan with
  * no allocation, and the input UTF8String is returned as-is.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.NfcNormalize.nfc($a)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** NFC-normalize, returning the input object untouched when already
    * normalized (no re-encode, no allocation on the common path).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
