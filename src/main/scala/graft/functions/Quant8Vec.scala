package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, StructField, StructType}

/** Native Catalyst expression: the int8-quantization ARTIFACT of
  * [[graft.operators.Similarity.quantizeInt8]] — `(scale, q)` with
  * `scale = max(|x_i|)/127` and `q_i = ⌊x_i/scale + 0.5⌋` as a packed
  * `array<tinyint>` — in one codegen'd kernel. The storage-write sibling
  * of [[Quant8Report]]: same arithmetic contract (identical IEEE op
  * order, bit-compatible with the composable `array_max∘transform` +
  * `transform` form, asserted in QuantizeSpec), but returning the
  * quantized vector itself, built as a primitive byte[] (no per-element
  * boxing, no intermediate arrays, no `CodegenFallback` lambda dispatch).
  *
  * A zero vector (scale 0) quantizes to zeros; an EMPTY vector returns
  * null (the composable form's `array_max(empty)` is null the same way);
  * a null vector returns null.
  */
case class Quant8Vec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quant8 expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = Quant8Vec.schema
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
    val q = new Array[Byte](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        q(i) = Math.floor(v.getDouble(i) / scale + 0.5).toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale, UnsafeArrayData.fromPrimitiveArray(q)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs")
      val scale = ctx.freshName("scale")
      val q = ctx.freshName("q")
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
         |  byte[] $q = new byte[$n];
         |  if ($scale != 0.0) {
         |    for (int $i = 0; $i < $n; $i++) {
         |      $q[$i] = (byte) Math.floor($v.getDouble($i) / $scale + 0.5);
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] {
         |      java.lang.Double.valueOf($scale),
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($q) });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Quant8Vec =
    copy(child = newChild)
}

object Quant8Vec {
  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))

  def ensureRegistered(spark: SparkSession): Unit =
    GraftExtensions.ensureRegistered(spark, "graft_quant8")
}
