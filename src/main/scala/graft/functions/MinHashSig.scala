package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression `graft_minhash(sh, k)`: the k-slot MinHash
  * signature of a hashed-shingle array (`graft_shingles64` output) — slot i
  * is `min over shingles of (a_i·(h >>> 32) + b_i) mod P`, the same
  * universal-hash family as [[graft.operators.Dedup.hashConsts]] (the
  * constants are derived from the identical md5 seeds, so the DuckDB oracle
  * reproduces every slot bit-for-bit).
  *
  * Why custom: a MinHash signature is a PER-ROW computation, but the
  * composable form had to `explode` the shingle array and run k `min`
  * aggregates through a groupBy — at scale that multiplies the row count by
  * the shingle count and pays a shuffle (partial-aggregated, but still an
  * exchange) for values a map-side loop can produce. The fused form is one
  * pass over the array inside whole-stage codegen: the signature frame
  * never shuffles at all, which is the plan you'd want at 100 TB — the
  * MinHash pipeline's only exchange becomes the band-bucket join itself.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // containsNull must be false: compute() reads primitive getLong, so a
      // null slot would silently hash as 0 ([[HashedShingles]] output — the
      // intended input — is null-free by construction)
      case (ArrayType(LongType, false), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects (array<long> without nulls, foldable int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(sh: Any, k: Any): Any =
    MinHashSig.compute(sh.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (sh, k) => s"graft.functions.MinHashSig.compute($sh, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}

object MinHashSig {

  // (a_i, b_i) pairs per k, derived once from the shared md5 seeds
  private val constCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def constsFor(k: Int): (Array[Long], Array[Long]) =
    constCache.computeIfAbsent(k, k => {
      val cs = graft.operators.Dedup.hashConsts(k)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    })

  /** Called from generated code; empty input yields an all-MaxValue
    * signature (callers filter empty shingle sets upstream).
    */
  def compute(sh: ArrayData, k: Int): ArrayData = {
    val (as, bs) = constsFor(k)
    val out = Array.fill(k)(Long.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      // top 28 bits of the 60-bit shingle hash — ≡ parsing the first 7 md5
      // hex digits, the rule the oracle evaluates in SQL
      val h = sh.getLong(i) >>> 32
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % graft.operators.Dedup.HashP
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def ensureRegistered(spark: SparkSession): Unit =
    GraftExtensions.ensureRegistered(spark, "graft_minhash")
}
