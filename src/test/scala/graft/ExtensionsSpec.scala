package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster deployment path for the native functions is
  * `spark.sql.extensions=graft.functions.GraftExtensions`: Spark
  * reflectively instantiates the zero-arg class and applies it as a
  * `SparkSessionExtensions => Unit`. Every other suite goes through
  * `GraftSession`'s programmatic inject, so the CLASS contract (public
  * zero-arg ctor, Function1 apply, all functions registered) would
  * otherwise ship untested. The literal config string can't be exercised
  * here — `spark.sql.extensions` is a STATIC conf, fixed by the first
  * session of the shared test JVM — so the test applies the same
  * reflectively-constructed instance the config path would. The literal
  * config string IS executed by the standalone
  * [[graft.ExtensionsConfigCheck]] main (fresh JVM, fresh session, every
  * graft_* function resolved from SQL text).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("the deployable extensions class registers every graft function") {
    TestSpark.spark // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val cls = Class.forName("graft.functions.GraftExtensions")
      val instance = cls.getDeclaredConstructor().newInstance()
        .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
      val spark = SparkSession.builder()
        .withExtensions(instance)
        .getOrCreate()
      val row = spark.sql("""
        SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D))      AS cos,
               graft_common(array(1L, 2L, 3L), array(2L, 3L, 4L))      AS common,
               size(graft_shingles64('a b c d', 3))                    AS n_sh,
               graft_rollfp('abcdefghijklmnopqrstuvwxyz', 16, 4)       AS rfp,
               size(graft_minhash(graft_shingles64('a b c d', 3), 12)) AS n_mh,
               graft_simhash('a b c', 32)                              AS sim,
               graft_might_contain(
                 (SELECT graft_bloom_agg(xxhash64(id), 64L, 512L)
                  FROM range(4)),
                 xxhash64(2L))                                         AS bloom_hit,
               graft_quant8_report(array(1.0D, -0.5D)).q_max           AS q_max,
               (SELECT graft_heavy_hitters(t, 4)[0].term
                FROM VALUES ('a'), ('b'), ('a') v(t))                  AS hh_top
      """).head()
      assert(row.getDouble(0) == 1.0)
      assert(row.getInt(1) == 2)
      assert(row.getInt(2) == 2)   // shingles a_b_c, b_c_d
      assert(row.getString(3).length == 32)
      assert(row.getInt(4) == 12)
      assert(!row.isNullAt(5))
      assert(row.getBoolean(6))    // bloom: inserted key must be admitted
      assert(row.getLong(7) == 127L)  // quant8: max element pins 127
      assert(row.getString(8) == "a") // heavy hitters: modal term first
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
