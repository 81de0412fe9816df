package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSim
import graft.operators.Similarity

/** The native codegen'd cosine expression must be bit-identical to the
  * composed higher-order-function form — the invariant that lets the
  * operators swap implementations without touching any oracle.
  */
class CosineSimSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private def vecs(seed: Int, n: Int, dim: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong,
      Array.fill(dim)(rnd.nextDouble() * 2 - 1)))
  }

  test("native cosine equals composed-builtin cosine bit-for-bit") {
    CosineSim.ensureRegistered(spark)
    val df = vecs(42, 200, 64).toDF("id", "v")
      .crossJoin(vecs(7, 5, 64).toDF("id2", "w"))
    val out = df.select(
      Similarity.cosine(col("v"), col("w")).as("hof"),
      Similarity.cosineFast(col("v"), col("w")).as("native"))
      .collect()
    assert(out.length == 1000)
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("expression participates in whole-stage codegen") {
    CosineSim.ensureRegistered(spark)
    // a range source keeps the projection in a WholeStageCodegen stage
    // (a local Seq would collapse to LocalTableScan at optimization time)
    val df = spark.range(1, 11)
      .select(transform(sequence(lit(0), lit(7)),
        i => (col("id") + i).cast("double")).as("v"))
      .select(Similarity.cosineFast(col("v"), col("v")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage; our projection must
    // carry it (the transform() feeder stays interpreted — HOFs don't codegen)
    assert("""\*\(\d+\) Project \[cosinesim""".r.findFirstIn(plan).isDefined, plan)
    // self-cosine is exactly 1 up to the final division's rounding
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("mismatched array lengths yield NULL, same as the composed form") {
    CosineSim.ensureRegistered(spark)
    // codegen path: range source keeps the projection compiled
    val df = spark.range(1, 4)
      .select(
        transform(sequence(lit(0), lit(7)), i => (col("id") + i).cast("double")).as("v"),
        transform(sequence(lit(0), lit(5)), i => (col("id") + i).cast("double")).as("w"))
      .select(
        Similarity.cosine(col("v"), col("w")).as("hof"),
        Similarity.cosineFast(col("v"), col("w")).as("native"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0), "composed cosine should be null on length mismatch")
      assert(r.isNullAt(1), "native cosine should be null on length mismatch")
    }
  }

  test("interpreted eval path (nullSafeEval) matches as well") {
    val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0, 2.0, 3.0))
    val b = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(3.0, 2.0, 1.0))
    val e = CosineSim(
      org.apache.spark.sql.catalyst.expressions.Literal(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal(b,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val expect = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(e.eval(null).asInstanceOf[Double] == expect)
  }
}
