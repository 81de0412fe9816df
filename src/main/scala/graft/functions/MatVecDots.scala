package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: a vector's dot product against every row of
  * a plane matrix, each divided by a constant scale —
  * `[dot(v, M[0])/s, …, dot(v, M[m-1])/s]` in one fused codegen'd pass over
  * a matrix passed as DATA (`array<array<double>>`), not as syntax.
  *
  * Why custom: the composable per-plane form
  * (`aggregate(zip_with(v, lit-array_p, *), 0.0, +) / s` once per plane)
  * embeds the matrix as m × dim literal expression NODES and evaluates
  * 2 × m interpreted lambda expressions per row — higher-order functions
  * never enter whole-stage codegen, and at 16 planes × 64 dims the plan
  * carries ~1k literal nodes that every analyze/optimize/compile pass
  * walks. Here the matrix is ONE literal (`typedLit`, a single `ArrayData`
  * reference object in generated code) and the product is a two-level loop
  * in generated Java — plan size O(1) in the number of planes, fully
  * codegen'd. The [[ArgMaxCosine]] treatment applied to projection.
  *
  * Numeric + null contract (bit-compatible with the composable form, so
  * swapping representations cannot change any oracle-gated result):
  *  - each dot is the same LEFT-TO-RIGHT double sum starting at 0.0 as
  *    `aggregate(zip_with(…), 0.0d, +)`; the division by `scale` happens
  *    after the sum completes, exactly like `dot(…) / lit(s)`;
  *  - a matrix row that is null or whose length differs from the vector's
  *    yields a NULL element (zip_with pads the shorter side with nulls,
  *    which poisons the fold to null);
  *  - a null vector or null matrix yields a null result (null-safe).
  */
case class MatVecDots(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okMat = second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val okScale = third.dataType == DoubleType
    if (okVec && okMat && okScale) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_matvec_dots expects (array<double>, array<array<double>>, double), " +
        s"got (${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, m: Any, s: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val mat = m.asInstanceOf[ArrayData]
    val scale = s.asInstanceOf[Double]
    val n = v.numElements()
    val rows = mat.numElements()
    val out = new Array[Any](rows)
    var p = 0
    while (p < rows) {
      if (!mat.isNullAt(p)) {
        val w = mat.getArray(p)
        if (w.numElements() == n) {
          var acc = 0.0
          var i = 0
          while (i < n) {
            acc += v.getDouble(i) * w.getDouble(i)
            i += 1
          }
          out(p) = acc / scale
        }
      }
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mat, scale) => {
      val n = ctx.freshName("n")
      val rows = ctx.freshName("rows")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |int $rows = $mat.numElements();
         |Object[] $out = new Object[$rows];
         |for (int $p = 0; $p < $rows; $p++) {
         |  if ($mat.isNullAt($p)) continue;
         |  org.apache.spark.sql.catalyst.util.ArrayData $w = $mat.getArray($p);
         |  if ($w.numElements() != $n) continue;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $v.getDouble($i) * $w.getDouble($i);
         |  }
         |  $out[$p] = java.lang.Double.valueOf($acc / $scale);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MatVecDots =
    copy(first = newFirst, second = newSecond, third = newThird)
}
