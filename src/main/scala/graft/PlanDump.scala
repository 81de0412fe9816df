package graft

/** Dump a declared query's physical plan: `runMain graft.PlanDump
  * <queryName> <outFile> [sfDir]` writes `df.explain("formatted")` output
  * (the optimization-round evidence artifact: plans/r15/<q>_before.txt /
  * _after.txt).
  *
  * Building a gate's frame may execute its store-lifecycle side effects
  * (the [[AuditGates]] caveat), so this defaults to the smallest fixture;
  * plan SHAPE (join strategy, exchange count, pushed filters) is what the
  * artifact documents, and that is fixture-independent for these gates —
  * auto-broadcast thresholds aside, which is why the sfDir argument is
  * still accepted for spot checks at sf0.1.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val out = args(1)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(GraftSession.envCores, "graft-plandump")
    val df = SparkEntry.queries(name)(spark, dir)
    val text = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[plandump] $name -> $out (${text.length} chars)")
    spark.stop()
  }
}
