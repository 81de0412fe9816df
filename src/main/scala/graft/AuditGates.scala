package graft

/** QA sweep: run [[graft.operators.PlanAudit]] over every gate's returned
  * frame and print the ERROR/WARN hazards — the linter pointed at its own
  * engine. Planning-only per frame, but building a gate's frame may
  * execute its store-lifecycle side effects, so this runs at the smallest
  * fixture (`args(0)`, default sf0.001).
  *
  * Expected output is a SHORT list: the deliberate pair-join baselines
  * (brute-force kNN exists precisely as the quadratic reference point)
  * and the documented bounded global windows. Anything new in this list
  * is a finding.
  */
object AuditGates {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(GraftSession.envCores, "graft-audit")
    val rows = scala.collection.mutable.ArrayBuffer[(String, String)]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val hs = graft.operators.PlanAudit.hazards(fn(spark, sfDir))
        hs.filter(h => h.severity == "ERROR" || h.severity == "WARN")
          .foreach { h =>
            rows += name -> s"${h.severity} ${h.hazard}"
            println(s"[audit] $name: ${h.severity} ${h.hazard} (${h.node})")
          }
      } catch { case e: Throwable =>
        rows += name -> s"BUILD-FAIL ${e.getMessage}"
        println(s"[audit] $name: frame build failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      SparkEntry.cleanupStreamArtifacts(spark)
    }
    println(s"[audit] total flagged: ${rows.size} across " +
      s"${rows.map(_._1).distinct.size} gates (of ${SparkEntry.queries.size})")
    spark.stop()
  }
}
