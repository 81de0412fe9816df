package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives an N×-scale fixture from an existing TESTDATA directory for
  * SCALING runs (`Bench` at 10× the usual size) — the driver's generator
  * only materializes up to sf0.1, and `/root/testdata` is read-only.
  *
  * Each table is unioned N times with per-copy key shifts, and the
  * similarity-bearing columns are deterministically PERTURBED per copy so
  * workload character scales the way a real 10×-bigger corpus would:
  *
  *  - `documents.text`: copy c > 0 prefixes every word with `c<c>_`, making
  *    each copy's vocabulary disjoint — cross-copy shingle/minhash matches
  *    would otherwise turn every dedup query's OUTPUT superlinear (10
  *    exact copies of each doc → 45× the duplicate pairs), measuring
  *    output explosion instead of engine scaling. Within-copy duplicate
  *    structure is preserved exactly, so dedup output scales ×N.
  *  - `embeddings.embedding`: copy c rotates the vector by c dimensions —
  *    norms and within-copy cosines are preserved bit-for-bit, cross-copy
  *    vectors decorrelate, so ANN/near-dup output also scales ×N.
  *  - `events` / `orders` / `lineitem`: key shifts only (`user_id`,
  *    `event_id`, `o_orderkey`/`l_orderkey`) — N× the users and orders
  *    with identical per-key history, the usual shape of corpus growth.
  *  - dimension tables (`region nation customer supplier part`) copy
  *    through unchanged (so each customer simply has N× the orders).
  *
  * Usage: `runMain graft.ScaleFixture <srcDir> <outDir> <copies>`.
  * The output is a throwaway measurement artifact (write it under /tmp),
  * not a gate input — correctness stays on the driver's own fixtures.
  */
object ScaleFixture {

  private val Shift = 100000000L // > any fixture key; keeps copies disjoint

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, copiesStr) = args
    val copies = copiesStr.toInt
    require(copies >= 1, s"copies must be >= 1: $copies")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      "graft-scale-fixture")
    try build(spark, srcDir, outDir, copies) finally spark.stop()
  }

  def build(spark: SparkSession, srcDir: String, outDir: String, copies: Int): Unit = {
    def read(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    def replicate(t: String)(perCopy: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      write((0 until copies).map(c => perCopy(base, c)).reduce(_.unionAll(_)), t)
    }

    // dimensions: unchanged
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      if (new java.io.File(s"$srcDir/$t.parquet").exists()) write(read(t), t)
    }

    replicate("orders") { (df, c) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(c * Shift))
    }
    replicate("lineitem") { (df, c) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(c * Shift))
    }
    replicate("events") { (df, c) =>
      df.withColumn("event_id", col("event_id") + lit(c * Shift))
        .withColumn("user_id", col("user_id") + lit(c * Shift))
    }
    replicate("documents") { (df, c) =>
      val text =
        if (c == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          w => when(w === "", w).otherwise(concat(lit(s"c${c}_"), w))), " ")
      df.withColumn("doc_id", col("doc_id") + lit(c * Shift))
        .withColumn("text", text)
        .withColumn("n_chars", length(text).cast("long"))
    }
    replicate("embeddings") { (df, c) =>
      val dim = 64
      val rot = c % dim
      val emb =
        if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, dim - rot),
          slice(col("embedding"), 1, rot))
      df.withColumn("vec_id", col("vec_id") + lit(c * Shift))
        .withColumn("embedding", emb)
    }
  }
}
