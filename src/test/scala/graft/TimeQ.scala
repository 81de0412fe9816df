package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(32, "timeq")
    val dir = args(1)
    val parts = if (args.length > 2) args(2).toInt else -1
    if (parts > 0) s.conf.set("spark.sql.shuffle.partitions", parts)
    args(0).split(",").foreach { q =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(s, dir).write.format("noop").mode("overwrite").save()
        println(f"$q run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
        s.catalog.clearCache(); SparkEntry.cleanupStreamArtifacts(s)
      }
    }
    s.stop()
  }
}
