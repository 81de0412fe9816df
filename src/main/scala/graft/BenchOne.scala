package graft

/** Single-query bench harness: `runMain graft.BenchOne <queryName> [sfDir]`.
  *
  * Same protocol as [[Bench]] (untimed warmup, noop sink, untimed teardown
  * between runs) but for ONE declared query — the tool for separating a real
  * plan regression from full-bench interference: 68 queries × 3 runs in one
  * JVM accumulate heap/GC state that can inflate a single query's medians
  * ~3× over its isolated cost.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(GraftSession.envCores, "graft-bench-one")
    def runOnce(): Unit =
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      SparkEntry.cleanupStreamArtifacts(spark)
    }
    runOnce(); cleanup() // untimed warmup
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      runOnce()
      println(f"[benchone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      cleanup()
    }
    spark.stop()
  }
}
