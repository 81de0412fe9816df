package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Native Catalyst expression: the per-vector int8-quantization REPORT of
  * [[graft.operators.Similarity.quantReport]] — scale, quantized checksums
  * and dequantization-error integers — fused into one codegen'd kernel.
  *
  * Why custom: the composable form is three higher-order-function passes
  * per vector (`array_max∘transform` for the scale, `transform` for q,
  * `zip_with` for the error) plus two `aggregate` folds — HOFs are
  * `CodegenFallback`, so every element pays interpreted lambda dispatch
  * and each pass allocates an intermediate array. This kernel is two tight
  * loops in generated Java (scale needs the max before quantizing), no
  * intermediate arrays, fully inside whole-stage codegen — the same
  * reasoning as [[MatVecDots]] applied to the quantization audit.
  *
  * Numeric contract — for FINITE, NON-EMPTY vectors with |x| ≲ 770 (i.e.
  * |err|·1e9 within `multiplyExact` range), bit-compatible with the
  * composable form, asserted in QuantizeSpec, so swapping representations
  * cannot move the q71 hash:
  *  - `scale = max(|x_i|) / 127.0`; `q_i = ⌊x_i/scale + 0.5⌋` (Spark's
  *    `floor(double)→long`); `err_i = x_i − q_i·scale`; a zero scale
  *    quantizes to 0 with `err_i = x_i` — all IEEE ops in identical order;
  *  - `*_nano = ⌊|·|·1e9 + 0.5⌋` exactly as the column form;
  *  - accumulation is left-to-right element order;
  *  - `sse_nano` accumulates via `multiplyExact`/`addExact`, so an
  *    error magnitude the nano-integers cannot hold (|err| ≳ 3.03, i.e.
  *    max|x| ≳ 770 — far outside embedding range) RAISES, matching the
  *    DuckDB oracle's BIGINT-overflow error instead of Spark's silent
  *    non-ANSI wrap (pinned in QuantizeSpec).
  *
  * Edge inputs OUTSIDE that contract diverge from the HOF form by design
  * (pinned in QuantizeSpec so neither drifts silently):
  *  - EMPTY vector: this kernel nulls the whole row; the HOF form emits
  *    (n_dims=0, q_sum=0, scale_nano NULL, …) because only its
  *    `array_max(empty)`-derived columns null-poison.
  *  - NaN elements: this kernel's `a > maxAbs` loop skips NaN in the
  *    scale; Spark's `array_max` (and DuckDB's `list_max`) order NaN
  *    greatest, so the HOF scale becomes NaN. Quantization inputs are
  *    validated upstream ([[graft.operators.Similarity]] docs); NaN here
  *    means the embedding pipeline is already broken.
  *
  * Output struct: (n_dims, scale_nano, q_sum, q_min, q_max, max_err_nano,
  * sse_nano), all LONG — the whole report is exact integers.
  */
case class Quant8Report(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quant8_report expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = Quant8Report.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0) return null
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = Math.abs(v.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    var qSum = 0L
    var qMin = Long.MaxValue
    var qMax = Long.MinValue
    var maxErrNano = 0L
    var sseNano = 0L
    i = 0
    while (i < n) {
      val x = v.getDouble(i)
      var q = 0L
      var err = x
      if (scale != 0.0) {
        q = Math.floor(x / scale + 0.5).toLong
        err = x - q * scale
      }
      val en = Math.floor(Math.abs(err) * 1e9 + 0.5).toLong
      qSum += q
      if (q < qMin) qMin = q
      if (q > qMax) qMax = q
      if (en > maxErrNano) maxErrNano = en
      // exact: raises on overflow like the oracle's BIGINT multiply,
      // instead of Spark's silent non-ANSI Long wrap
      sseNano = Math.addExact(sseNano, Math.multiplyExact(en, en))
      i += 1
    }
    val scaleNano = Math.floor(scale * 1e9 + 0.5).toLong
    new GenericInternalRow(Array[Any](
      n.toLong, scaleNano, qSum, qMin, qMax, maxErrNano, sseNano))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs")
      val scale = ctx.freshName("scale")
      val qSum = ctx.freshName("qSum")
      val qMin = ctx.freshName("qMin")
      val qMax = ctx.freshName("qMax")
      val maxErrNano = ctx.freshName("maxErrNano")
      val sseNano = ctx.freshName("sseNano")
      val x = ctx.freshName("x")
      val q = ctx.freshName("q")
      val err = ctx.freshName("err")
      val en = ctx.freshName("en")
      val a = ctx.freshName("a")
      s"""
         |int $n = $v.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $maxAbs = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $a = Math.abs($v.getDouble($i));
         |    if ($a > $maxAbs) $maxAbs = $a;
         |  }
         |  double $scale = $maxAbs / 127.0;
         |  long $qSum = 0L;
         |  long $qMin = 9223372036854775807L;
         |  long $qMax = -9223372036854775807L - 1L;
         |  long $maxErrNano = 0L;
         |  long $sseNano = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $v.getDouble($i);
         |    long $q = 0L;
         |    double $err = $x;
         |    if ($scale != 0.0) {
         |      $q = (long) Math.floor($x / $scale + 0.5);
         |      $err = $x - $q * $scale;
         |    }
         |    long $en = (long) Math.floor(Math.abs($err) * 1e9 + 0.5);
         |    $qSum += $q;
         |    if ($q < $qMin) $qMin = $q;
         |    if ($q > $qMax) $qMax = $q;
         |    if ($en > $maxErrNano) $maxErrNano = $en;
         |    $sseNano = java.lang.Math.addExact($sseNano,
         |      java.lang.Math.multiplyExact($en, $en));
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] {
         |      java.lang.Long.valueOf((long) $n),
         |      java.lang.Long.valueOf((long) Math.floor($scale * 1e9 + 0.5)),
         |      java.lang.Long.valueOf($qSum),
         |      java.lang.Long.valueOf($qMin),
         |      java.lang.Long.valueOf($qMax),
         |      java.lang.Long.valueOf($maxErrNano),
         |      java.lang.Long.valueOf($sseNano) });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Quant8Report =
    copy(child = newChild)
}

object Quant8Report {
  val schema: StructType = StructType(Seq(
    StructField("n_dims", LongType, nullable = false),
    StructField("scale_nano", LongType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_min", LongType, nullable = false),
    StructField("q_max", LongType, nullable = false),
    StructField("max_err_nano", LongType, nullable = false),
    StructField("sse_nano", LongType, nullable = false)))

  def ensureRegistered(spark: SparkSession): Unit =
    GraftExtensions.ensureRegistered(spark, "graft_quant8_report")
}
