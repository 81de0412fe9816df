package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The scaling-fixture derivation must preserve the invariants SCALE.md's
  * measured-scaling section leans on: row counts scale ×N, copies are
  * key-disjoint, document vocabularies are copy-disjoint (so dedup output
  * scales ×N instead of ×N²-ish), and embedding rotation preserves
  * within-copy cosines bit-for-bit (so ANN work scales, not its answers).
  */
class ScaleFixtureSpec extends SparkTestBase {

  private lazy val out: String = {
    val dir = Files.createTempDirectory("scale-fixture").toString
    ScaleFixture.build(spark, "/root/testdata/sf0.001", dir, 2)
    dir
  }

  test("row counts scale by the copy factor; keys are copy-disjoint") {
    for (t <- Seq("documents", "embeddings", "events", "orders", "lineitem")) {
      val base = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").count()
      val scaled = spark.read.parquet(s"$out/$t.parquet").count()
      assert(scaled == 2 * base, s"$t: $scaled != 2 * $base")
    }
    val ids = spark.read.parquet(s"$out/documents.parquet").select("doc_id")
    assert(ids.distinct().count() == ids.count(), "doc ids must stay unique")
  }

  test("copy vocabularies are disjoint — dedup output scales xN, not cross-copy") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("w")).filter(col("w") =!= "")
    val shared = tok.filter(col("doc_id") < 100000000L).select("w").distinct()
      .join(tok.filter(col("doc_id") >= 100000000L).select("w").distinct(), "w")
    assert(shared.count() == 0, "copies must not share vocabulary")
  }

  test("embedding rotation preserves within-copy cosines exactly") {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = spark.read.parquet(s"$out/embeddings.parquet")
      .filter(col("vec_id").isin(0L, 1L, 100000000L, 100000001L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs.size == 4)
    // same pair, both copies: rotation is norm- and angle-preserving
    assert(cos(vecs(0L), vecs(1L)) == cos(vecs(100000000L), vecs(100000001L)))
    // but the rotated copy is NOT the same vector (copies decorrelate)
    assert(vecs(0L) != vecs(100000000L))
  }
}
