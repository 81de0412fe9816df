package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `graft_rollfp(text, w, stride)`: the
  * winnowing-style rolling fingerprint — minimum md5 (as 32-char lowercase
  * hex) over the text's character w-grams sampled every `stride` positions;
  * texts shorter than w hash whole. Identical to the composable form in
  * [[graft.operators.TextAnalysis.rollingFingerprint]]
  * (`array_min(transform(sequence(1, hi, stride), i => md5(substr(text, i, w))))`),
  * which q14 showed is the dominant per-document cost of the text-stats
  * pass: the HOF `transform` is `CodegenFallback`, every window allocates a
  * substring Column result plus a 32-char hex string, and `array_min`
  * compares those strings after materializing all of them.
  *
  * The fused pass keeps ONE running minimum digest (compared byte-wise —
  * unsigned byte order over md5 digests equals lexicographic order over
  * their hex encodings, because hex is an order-preserving byte encoding)
  * and converts to hex once at the end. Windows are `substringSQL` slices,
  * the same character (not byte) semantics as Spark's `substr`.
  */
case class RollingFingerprint(first: Expression, second: Expression,
                              third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_rollfp expects (string, foldable int, foldable int), got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = first.nullable

  override def nullSafeEval(t: Any, w: Any, s: Any): Any =
    RollingFingerprint.compute(t.asInstanceOf[UTF8String],
      w.asInstanceOf[Int], s.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, w, s) => s"graft.functions.RollingFingerprint.compute($t, $w, $s)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RollingFingerprint =
    copy(first = f, second = s, third = t)
}

object RollingFingerprint {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Called from generated code; thread-safe (per-thread digest). */
  def compute(text: UTF8String, w: Int, stride: Int): UTF8String = {
    // fail fast like the composable form's sequence(1, hi, step) did — a
    // non-positive stride would otherwise spin the window loop forever
    require(w >= 1 && stride >= 1, s"need w >= 1 and stride >= 1, got w=$w stride=$stride")
    val md = digests.get()
    val hi = text.numChars() - (w - 1)
    var best: Array[Byte] = null
    if (hi >= 1) {
      var i = 1
      while (i <= hi) {
        md.reset()
        val d = md.digest(text.substringSQL(i, w).getBytes)
        if (best == null || unsignedLess(d, best)) best = d
        i += stride
      }
    } else {
      md.reset()
      best = md.digest(text.getBytes)
    }
    val hex = new Array[Char](32)
    var k = 0
    while (k < 16) {
      hex(2 * k) = HexChars((best(k) >> 4) & 0xf)
      hex(2 * k + 1) = HexChars(best(k) & 0xf)
      k += 1
    }
    UTF8String.fromString(new String(hex))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def ensureRegistered(spark: SparkSession): Unit =
    GraftExtensions.ensureRegistered(spark, "graft_rollfp")
}
