package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: the 0-based index of the codebook row with
  * the highest cosine similarity to a vector — `argmax_c cos(v, C[c])` in
  * one fused codegen'd pass over a codebook passed as DATA
  * (`array<array<double>>`), not as syntax.
  *
  * Why custom: the composable IVF cell assignment
  * (`array(cos(v, lit-array_0), …, cos(v, lit-array_{m-1}))` followed by
  * `array_position(arr, array_max(arr))`) embeds the codebook as m × dim
  * literal expression NODES — ~262k nodes at the documented 4096-centroid ×
  * 64-dim cap, which breaks whole-stage codegen (Janino method/constant
  * limits) and makes every analyze/optimize pass walk the whole codebook.
  * Here the codebook is ONE literal (`typedLit`, a single `ArrayData`
  * reference object in generated code), and the scan is a two-level loop in
  * generated Java — plan size O(1) in the number of centroids.
  *
  * Numeric + ordering contract (bit-compatible with the composable form, so
  * swapping representations cannot change any oracle-gated result):
  *  - per-centroid cosine is the same three independent left-to-right
  *    double sums as [[CosineSim]];
  *  - the winner is the FIRST index attaining the maximum (ties break
  *    toward the lower index, like `array_position`'s first match);
  *  - NaN cosines (zero-norm vectors) order GREATEST and equal to each
  *    other, matching Spark's double ordering in `array_max` — the first
  *    NaN centroid wins if any cosine is NaN;
  *  - a codebook row whose length differs from the vector's yields a null
  *    cosine in the composable form, which `array_max` ignores — here the
  *    row is skipped; if EVERY row is skipped the result is null (the
  *    composable form's null-max → null-position).
  */
case class ArgMaxCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okBook = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (okVec && okBook) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_argmax_cosine expects (array<double>, array<array<double>>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val book = r.asInstanceOf[ArrayData]
    val n = v.numElements()
    val m = book.numElements()
    var best = -1
    var bestCos = 0.0
    var bestNaN = false
    var c = 0
    while (c < m) {
      if (!book.isNullAt(c)) {
        val cv = book.getArray(c)
        if (cv.numElements() == n) {
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < n) {
            val x = v.getDouble(i); val y = cv.getDouble(i)
            dot += x * y; na += x * x; nb += y * y
            i += 1
          }
          val cos = dot / (math.sqrt(na) * math.sqrt(nb))
          val isNaN = java.lang.Double.isNaN(cos)
          if (best < 0 || (isNaN && !bestNaN) || (!isNaN && !bestNaN && cos > bestCos)) {
            best = c; bestCos = cos; bestNaN = isNaN
          }
        }
      }
      c += 1
    }
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, book) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cv = ctx.freshName("cv")
      val best = ctx.freshName("best")
      val bestCos = ctx.freshName("bestCos")
      val bestNaN = ctx.freshName("bestNaN")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val cos = ctx.freshName("cos")
      val isNaN = ctx.freshName("isNaN")
      s"""
         |int $n = $v.numElements();
         |int $m = $book.numElements();
         |int $best = -1;
         |double $bestCos = 0.0;
         |boolean $bestNaN = false;
         |for (int $c = 0; $c < $m; $c++) {
         |  if ($book.isNullAt($c)) continue;
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $book.getArray($c);
         |  if ($cv.numElements() != $n) continue;
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $v.getDouble($i);
         |    double $y = $cv.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $cos = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  boolean $isNaN = java.lang.Double.isNaN($cos);
         |  if ($best < 0 || ($isNaN && !$bestNaN) || (!$isNaN && !$bestNaN && $cos > $bestCos)) {
         |    $best = $c; $bestCos = $cos; $bestNaN = $isNaN;
         |  }
         |}
         |if ($best < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMaxCosine =
    copy(left = newLeft, right = newRight)
}
