package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's SQL front door — the analog of the reference's command-string
  * entry point (`client.go:72-80` → `Nimbus.go:600-625`, where a user types a
  * topology name and the server wires it up). Here the "command string" is
  * ANSI SQL: register the corpus tables once, then any pipeline the Scala API
  * expresses is equally writable as `spark.sql(text)` — including the native
  * `graft_*` functions, which resolve through the session's function registry
  * whether the session was built programmatically
  * ([[graft.GraftSession]]) or purely by config
  * (`spark.sql.extensions=graft.functions.GraftExtensions`, no code).
  *
  * Scale note: the SQL text plans through the SAME Catalyst pipeline as the
  * DataFrame API — identical pushdown, pruning, join strategies, and
  * whole-stage codegen. There is no second engine and no interpretation
  * penalty; `sql` vs DataFrame is purely a surface choice.
  */
object SqlFrontDoor {

  /** Every driver fixture table (TESTDATA.md). */
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register each fixture parquet under `dir` as a temp view named after
    * the table, so SQL text can reference `documents`, `events`, … directly.
    * Views are lazy — registration reads only parquet footers, never data —
    * and re-registration just repoints the name, so this is idempotent and
    * safe to call per query.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    TableNames.foreach { t =>
      val p = s"$dir/$t.parquet"
      if (new java.io.File(p).exists()) {
        spark.read.parquet(p).createOrReplaceTempView(t)
      }
    }

  /** One-call form: views registered, then the query text planned and
    * returned (still lazy — nothing executes until an action). The graft
    * TABLE functions (index-store search — [[graft.functions
    * .GraftTableFunctions]]) register here too, idempotently, so a pure
    * SQL user reaches the persisted indexes through the same door.
    */
  def sql(spark: SparkSession, dir: String, text: String): DataFrame = {
    registerViews(spark, dir)
    graft.functions.GraftTableFunctions.ensureRegistered(spark)
    spark.sql(text)
  }
}
