/* Lives under org.apache.spark.sql because Catalyst's expression SPI
 * (AbstractDataType, ExpectsInputTypes) is private[sql] — the standard
 * packaging for third-party native expressions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static call target for generated code ([[NfcNormalize.doGenCode]]):
  * Scala objects compile with static forwarders, so the generated Java
  * can invoke `TextNormStatics.nfc(...)` directly. */
object TextNormStatics {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: Normalizer.isNormalized is a cheap scan and true for
    // all-ASCII text, skipping the allocate-and-rebuild entirely — at
    // corpus scale most documents are already NFC.
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen'd Unicode NFC normalization (canonical composition) — the
  * first step of a training-corpus text-normalization pipeline: "é" as
  * U+0065 U+0301 (decomposed) and U+00E9 (precomposed) must fingerprint
  * identically or exact-dedup silently misses visually identical
  * documents. Oracle-replicable: DuckDB's `nfc_normalize(s)` implements
  * the same Unicode canonical composition. Null in → null out. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    TextNormStatics.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.TextNormStatics.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
