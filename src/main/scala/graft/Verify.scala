package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional 3rd arg (dev only; the driver passes 2): comma-separated
    // query names to dump — spot-check one query without the full sweep
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = GraftSession.local(GraftSession.envCores, "graft-verify")
    new java.io.File(outDir).mkdirs()
    // oracle_sql.json FIRST (it depends on nothing computed below): if the
    // sweep is killed at a window boundary, the driver's DuckDB compare can
    // still score every per-query dir written so far — partial rows instead
    // of an empty artifact (the r14 failure mode).
    writeOracleJson(outDir)
    val todo = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }.toSeq
    var done = 0
    var failed = 0
    todo.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      done += 1
      // per-query progress on stdout (the Bench r14 lesson applied here
      // too): a bounded tail capture of a killed run names the query that
      // was running and how far through the sweep it got
      println(f"""{"metric":"vq","i":$done,"n":${todo.size},"name":"$name","secs":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      // operators that persist (Dedup/Similarity) can't unpersist their own
      // lazy frames; drop them here so 20+ queries don't accumulate caches,
      // and drain streaming leftovers (q23's memory sink + checkpoint dir)
      spark.catalog.clearCache()
      SparkEntry.cleanupStreamArtifacts(spark)
    }
    println(s"""{"metric":"verify","n":$done,"failed":$failed}""")
    spark.stop()
  }

  private def writeOracleJson(outDir: String): Unit = {
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
