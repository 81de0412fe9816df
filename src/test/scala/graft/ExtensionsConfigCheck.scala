package graft

import org.apache.spark.sql.SparkSession

/** Executes the LITERAL cluster deployment path for the native functions —
  * `spark.sql.extensions=graft.functions.GraftExtensions` as a config
  * string on a fresh session, no programmatic inject anywhere — and
  * resolves every registered `graft_*` function from SQL text.
  *
  * This cannot live in the shared-JVM test suite (`spark.sql.extensions`
  * is a STATIC conf, fixed by the first session the JVM creates —
  * `ExtensionsSpec` documents that and tests the reflective class
  * contract instead), so it is a standalone main:
  * `sbt "Test/runMain graft.ExtensionsConfigCheck"` — prints one OK line
  * and exits 0, or throws.
  */
object ExtensionsConfigCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-config-check")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    try {
      val row = spark.sql("""
        SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D))          AS cos,
               graft_argmax_cosine(array(1.0D, 0.0D),
                 array(array(0.0D, 1.0D), array(1.0D, 0.0D)))              AS cell,
               graft_common(array(1L, 2L, 3L), array(2L, 3L, 4L))          AS common,
               size(graft_shingles64('a b c d', 3))                        AS n_sh,
               graft_rollfp('abcdefghijklmnopqrstuvwxyz', 16, 4)           AS rfp,
               size(graft_minhash(graft_shingles64('a b c d', 3), 12))     AS n_mh,
               graft_simhash('a b c', 32)                                  AS sim,
               graft_might_contain(
                 (SELECT graft_bloom_agg(xxhash64(id), 64L, 512L)
                  FROM range(4)),
                 xxhash64(2L))                                             AS bloom_hit,
               graft_matvec_dots(array(1.0D, 2.0D),
                 array(array(1.0D, 0.0D), array(0.0D, 1.0D)), 1.0D)        AS mv,
               graft_quant8_report(array(1.0D, -0.5D)).q_max               AS q_max,
               (SELECT graft_heavy_hitters(t, 4)[0].term
                FROM VALUES ('a'), ('b'), ('a') v(t))                      AS hh_top
      """).head()
      assert(row.getDouble(0) == 1.0, "graft_cosine")
      assert(row.getInt(1) == 1, "graft_argmax_cosine first-max index")
      assert(row.getInt(2) == 2, "graft_common")
      assert(row.getInt(3) == 2, "graft_shingles64")
      assert(row.getString(4).length == 32, "graft_rollfp")
      assert(row.getInt(5) == 12, "graft_minhash")
      assert(!row.isNullAt(6), "graft_simhash")
      assert(row.getBoolean(7), "graft_bloom_agg/might_contain no-false-negative")
      assert(row.getSeq[Double](8) == Seq(1.0, 2.0), "graft_matvec_dots")
      assert(row.getLong(9) == 127L, "graft_quant8_report")
      assert(row.getString(10) == "a", "graft_heavy_hitters modal term")
      println(s"spark.sql.extensions config path OK: $row")
    } finally spark.stop()
  }
}
