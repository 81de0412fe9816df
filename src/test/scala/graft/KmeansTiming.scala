package graft

import org.apache.spark.sql.functions._

/** Dev measurement for the k-means iteration-cost claim (SCALE.md): with
  * the one-literal codebook, per-iteration wall time must stay flat as
  * `iters` grows (the old per-centroid literal form re-analyzed an
  * O(centroids × dim)-node plan every iteration, so later iterations paid
  * ever-larger planning costs on top).
  *
  * `runMain graft.KmeansTiming <sfDir>` → one line per iteration count
  * with total and per-iteration seconds. Disable the early-stop tolerance
  * comparison by construction: the fixture doesn't converge in ≤ 8 rounds
  * with centStep=10, so every requested iteration actually runs.
  */
object KmeansTiming {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val s = GraftSession.local(16, "kmeans-timing")
    try {
      val e = Tables(s, dir).embeddings
      // warmup: JIT + codegen caches
      graft.operators.Similarity.kmeans(e, "vec_id", "embedding", iters = 1, centStep = 10)
      Seq(1, 2, 4, 8).foreach { iters =>
        val t0 = System.nanoTime()
        val cb = graft.operators.Similarity.kmeans(e, "vec_id", "embedding",
          iters = iters, centStep = 10)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"kmeans iters=$iters%d total=$sec%.2f s per-iter=${sec / iters}%.2f s codebook=${cb.size}")
      }
    } finally s.stop()
  }
}
