package graft

/** Scratch main for plan audits (test scope — not shipped). */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(8, "explain")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    args(0).split(",").foreach { q =>
      println(s"===== $q =====")
      SparkEntry.queries(q)(s, dir).explain("formatted")
      s.catalog.clearCache()
    }
    s.stop()
  }
}
