package graft

/** Benchmark main — runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line `{"metric":"total","value":N,"unit":"sec",...}`.
  *
  * Each query is forced through a `noop`-format write: unlike `.count()`,
  * which lets Catalyst prune unreferenced aggregate expressions, the noop
  * sink evaluates every output column of every row (full pipeline cost) and
  * discards the bytes — the closest local analog of writing to a real sink.
  * A query that throws is reported in an `"errors"` map, NOT as a timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(GraftSession.envCores, "graft-bench")

    // Untimed warmup: run EVERY query once at the smallest fixture so each
    // measured run is steady-state — otherwise the alphabetically-first
    // query absorbs all JVM/codegen/class-load cost and its timing is
    // mostly warmup, not work (observed: 16.7s first run vs 4.6s warm for
    // the same query).
    try {
      spark.range(1000).selectExpr("sum(id) as s")
        .write.format("noop").mode("overwrite").save()
      SparkEntry.queries.values.foreach { fn =>
        fn(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
      }
    } catch { case _: Throwable => () }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = timings.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"failed":${errors.size},"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
