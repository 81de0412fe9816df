package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Similarity}

/** A5 scale-hardening variants and the embedding near-dup join. */
class CappedDistinctSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private val rows = Seq(
    ("h1", "r3"), ("h1", "r1"), ("h1", "r2"), ("h1", "r1"),
    ("h2", "r9"),
  ).toDF("host", "route")

  test("countAndDistinctCapped: exact counts, capped sorted sample") {
    val out = Relational.countAndDistinctCapped(rows, "host", "route", cap = 2)
      .orderBy("host").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      ("h1", 4L, 3L, "r1,r2"),    // 4 rows, 3 distinct, first 2 sorted
      ("h2", 1L, 1L, "r9")))
  }

  test("approxDistinctPerKey is within rsd of exact on a spread of cardinalities") {
    val df = (0 until 10).flatMap { k =>
      (0 until (k + 1) * 100).map(i => (s"k$k", s"item${i % ((k + 1) * 37)}"))
    }.toDF("k", "item")
    val exact = df.groupBy("k").agg(countDistinct(col("item")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Relational.approxDistinctPerKey(df, "k", "item", rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    exact.foreach { case (k, d) =>
      assert(math.abs(approx(k) - d) <= math.max(3, (d * 0.15).toLong),
        s"key $k: approx ${approx(k)} vs exact $d")
    }
  }

  test("salted distinct-collect equals the unsalted aggregation exactly") {
    val rnd = new scala.util.Random(7)
    val big = (0 until 5000).map { _ =>
      (s"h${rnd.nextInt(3)}", s"r${rnd.nextInt(40)}")   // hot keys, few items
    }.toDF("host", "route")
    val plain = Relational.countAndDistinct(big, "host", "route")
      .orderBy("host").collect().map(_.toSeq)
    val salted = Relational.countAndDistinctSalted(big, "host", "route", salts = 8)
      .orderBy("host").collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
  }

  test("nearDupPairs finds same-bucket high-cosine pairs, excludes low-cosine") {
    // two near-identical vectors + one orthogonal
    val vecs = Seq(
      (0L, Array(1.0f, 0.01f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.02f, 0.0f, 0.0f)),   // cos(0,1) ≈ 0.9999
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val out = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.9, planes = 4, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 1L)))
  }

  test("nearDupPairs never emits a pair below the threshold") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.44f)),  // cos ≈ 0.898
    ).toDF("vec_id", "embedding")
    val out = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.99, planes = 2, dim = 2)
    assert(out.count() == 0)
  }
}
