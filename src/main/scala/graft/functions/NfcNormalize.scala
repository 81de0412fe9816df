package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `graft_nfc(text)`: Unicode NFC normalization
  * (canonical decomposition followed by canonical composition — the W3C/
  * WHATWG interchange form). The dedup-family fix for the most common
  * real-corpus miss: an NFD spelling ("e" + U+0301) and its NFC composite
  * ("é", U+00E9) render identically but md5 to different fingerprints, so
  * exact dedup, shingle hashing, and fingerprint diffs all treat them as
  * distinct documents unless a normalization pass runs first
  * ([[graft.operators.TextAnalysis.normalizeText]] is the operator-surface
  * wrapper; DuckDB's `nfc_normalize` is the oracle, q107).
  *
  * Why custom: Spark has no normalization builtin, and the alternative — a
  * Scala UDF — would break whole-stage codegen in exactly the hot map-side
  * pass (fingerprints are computed corpus-wide before every dedup
  * exchange). The ASCII fast path matters at scale: `Normalizer.isNormalized`
  * is O(n) with no allocation for the overwhelmingly-ASCII web corpus,
  * reserving the allocating normalize call for rows that need it.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Called from generated code. Returns the INPUT object unchanged when
    * already NFC. The ASCII check runs on the UTF-8 BYTES first — ASCII is
    * closed under NFC, so an all-ASCII row (the overwhelming web-corpus
    * case) returns with genuinely zero allocation; `toString` (a full
    * String copy) is paid only by rows carrying non-ASCII bytes.
    */
  def compute(text: UTF8String): UTF8String = {
    var i = 0
    val n = text.numBytes()
    var ascii = true
    while (ascii && i < n) {
      if ((text.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return text
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  def ensureRegistered(spark: SparkSession): Unit =
    GraftExtensions.ensureRegistered(spark, "graft_nfc")
}
