package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `graft_shingles64(text, n)`: the document's
  * distinct word n-gram shingles, each hashed to a 60-bit long (first 15 md5
  * hex digits — [[graft.operators.TextAnalysis.fingerprint64]]'s rule),
  * sorted ascending. One fused pass per document, inside whole-stage codegen.
  *
  * Why custom: the composable form —
  * `array_sort(transform(array_distinct(transform(sequence(...),
  * i => array_join(slice(split(text), i, n), "_"))), s => conv(substring(
  * md5(s),1,15),16,10)))` — chains five higher-order functions, and HOFs are
  * `CodegenFallback` in Spark: every document pays interpreted lambda
  * dispatch plus an allocation per shingle string, per pipeline stage. This
  * is the dominant map-side cost of ALL four similarity-join queries
  * (inverted-index, prefix-filtered, MinHash-LSH, dedup-groups). The fused
  * form tokenizes once, reuses one digest and one StringBuilder per thread,
  * and emits a primitive `UnsafeArrayData` — no per-element boxing.
  *
  * Semantics contract (what the DuckDB oracle reproduces):
  *  - tokens = regex-split on a single space, trailing empties kept
  *    (Spark `split(text, ' ')` ≡ Java `split(" ", -1)`);
  *  - shingle i = tokens[i..i+n) joined with '_', for i in [0, #tokens-n];
  *  - fewer than n tokens → empty array;
  *  - hash = first 15 hex digits of md5(shingle) as a base-16 long
  *    (= big-endian first 8 digest bytes >>> 4);
  *  - result sorted ascending, duplicates removed.
  * Divergence from the composable chain: dedup happens on the HASHED longs,
  * not the shingle strings first — distinguishable only when two distinct
  * shingles of one document collide in 60 bits (p ≈ |S|²/2⁶¹ per document).
  */
case class HashedShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles64 expects (string, foldable int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(t: Any, n: Any): Any =
    HashedShingles.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.HashedShingles.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashedShingles =
    copy(left = newLeft, right = newRight)
}

object HashedShingles {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Fused tokenize → shingle → md5 → 60-bit → sort → dedupe. Called from
    * generated code; must stay thread-safe (per-thread digest, local state).
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val m = toks.length - (n - 1)
    if (m < 1) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val md = digests.get()
    val sb = new java.lang.StringBuilder
    val arr = new Array[Long](m)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append('_')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first 15 hex digits = big-endian first 8 bytes, low nibble dropped
      val top =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      arr(i) = top >>> 4
      i += 1
    }
    java.util.Arrays.sort(arr)
    var w = 1
    i = 1
    while (i < m) {
      if (arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == m) arr else java.util.Arrays.copyOf(arr, w))
  }

  def ensureRegistered(spark: SparkSession): Unit =
    GraftExtensions.ensureRegistered(spark, "graft_shingles64")
}
