package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: |A ∩ B| for two SORTED arrays (both
  * `array<string>` or both `array<long>`) via a two-pointer merge, with
  * whole-stage codegen.
  *
  * Why custom: `size(array_intersect(a, b))` builds a hash set PER ROW in
  * interpreted code — the dominant cost of similarity-join verification,
  * where hundreds of thousands of candidate pairs each intersect ~100-element
  * shingle arrays (measured: the verification stage, not candidate
  * generation, was 80% of the prefix-join query). The sorted-merge form does
  * zero allocation and runs inside the codegen'd stage; callers sort the
  * arrays once per document upstream (vectorized), not once per pair.
  * The long overload exists for hashed-shingle frames (8-byte fixed-width
  * keys): one `lcmp` per step instead of a byte-wise UTF8String compare.
  *
  * PRECONDITION: both arrays sorted ascending with no duplicates (what
  * `array_sort(array_distinct(...))` produces). Unsorted input gives an
  * undercount, not an error — the expression is internal to the dedup
  * operators, which all sort upstream.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOf(t: DataType): Option[DataType] = t match {
    case ArrayType(e @ (StringType | LongType), _) => Some(e)
    case _ => None
  }
  private lazy val elemType: DataType =
    elemOf(left.dataType).get

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOf(left.dataType), elemOf(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_common expects matching (array<string>|array<long>) inputs, " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    if (elemType == LongType) {
      while (i < a.numElements() && j < b.numElements()) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < a.numElements() && j < b.numElements()) {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      val cmpExpr =
        if (elemType == LongType) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def ensureRegistered(spark: SparkSession): Unit =
    GraftExtensions.ensureRegistered(spark, "graft_common")
}
