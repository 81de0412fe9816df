package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two `array<double>`
  * columns in a single fused pass, with whole-stage codegen (`doGenCode`).
  *
  * Why custom (SURVEY §7.4 — "the one likely custom-expression site"):
  * the composable form `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` uses
  * three `aggregate(zip_with(...))` higher-order folds, which Catalyst
  * evaluates INTERPRETED (lambda per element, boxed) and which walk each
  * array three times. This expression walks both arrays once, unboxed,
  * inside generated code — the hot inner loop of every kNN / ANN / near-dup
  * operator, where at 100 TB the scan is dominated by exactly this loop.
  *
  * Numeric contract: the three accumulators are independent left-to-right
  * double sums — bit-identical to the three separate folds (and to the
  * DuckDB oracle's `list_dot_product`), so swapping implementations cannot
  * change any oracle-gated result.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType (the ImplicitCastInputTypes vocabulary) is private[sql],
  // so type expectations are enforced here instead; callers cast to
  // array<double> explicitly (Similarity.* all do).
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // Mismatched lengths return NULL — the same answer the composable
  // `aggregate(zip_with(...))` form gives (zip_with pads with null, the sum
  // becomes null). Truncating instead would turn a dimension bug in input
  // data into a plausible-looking number.
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Register `graft_cosine` in a session's function registry so the
    * expression is callable via `call_function` / SQL from any plan. Done
    * lazily by the operators that need it — robust for sessions not built
    * by [[graft.GraftSession]]. (A production deployment would instead
    * inject it once via `SparkSessionExtensions.injectFunction`.)
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val ident = FunctionIdentifier("graft_cosine")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
        (exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1)))
    }
  }
}
