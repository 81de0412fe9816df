package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `graft_simhash(text, bits)`: the
  * `bits`-wide (≤ 32) SimHash signature — every non-empty space-token
  * votes ±1 on each of the low `bits` bits of its 32-bit hash (first 8 md5
  * hex digits), the signature sets bit b iff the bit-b vote sum is
  * positive. Bit-identical to the composable explode + vote-sums plan in
  * [[graft.operators.Dedup.simHash]] (the DuckDB oracle evaluates the same
  * rule in SQL), property-tested in DedupSpec.
  *
  * Why custom: like the MinHash signature, SimHash is a PER-ROW
  * computation the composable form could only express as an `explode`
  * (×|tokens| rows) plus a vote-sum aggregation through an exchange. The
  * fused pass is one loop per document inside whole-stage codegen, and the
  * signature frame plans with zero exchanges. A document with no non-empty
  * token returns null (the aggregate form emits no row — callers filter
  * either way).
  */
case class SimHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects (string, foldable int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any, b: Any): Any =
    SimHashSig.compute(t.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val box = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, (t, b) => s"""
       |java.lang.Long $box = graft.functions.SimHashSig.compute($t, $b);
       |if ($box == null) { ${ev.isNull} = true; } else { ${ev.value} = $box; }
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashSig =
    copy(left = newLeft, right = newRight)
}

object SimHashSig {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Called from generated code; null (not 0 — a legal signature) when the
    * text has no non-empty token.
    */
  def compute(text: UTF8String, bits: Int): java.lang.Long = {
    require(bits >= 1 && bits <= 32, s"need 1 <= bits <= 32, got $bits")
    val md = digests.get()
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](bits)
    var any = false
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      if (!w.isEmpty) {
        any = true
        md.reset()
        val d = md.digest(w.getBytes(StandardCharsets.UTF_8))
        // first 8 hex digits = first 4 bytes, big-endian unsigned
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
                ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  def ensureRegistered(spark: SparkSession): Unit =
    GraftExtensions.ensureRegistered(spark, "graft_simhash")
}
