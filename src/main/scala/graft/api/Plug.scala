package graft.api

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The pluggable operator API (SURVEY §2.10) — the contracts the reference
  * prototyped but never wired in (`Apps/WordCountSpout.go:18-44`'s
  * `Init/Open/NextTuple` source iterator, `Apps/WordCountBolt.go:17-37`'s
  * `Execute(tuple) → tuple`), done Spark-native:
  *
  *  - a source is anything that yields a DataFrame ([[Spout]]);
  *  - a 1→1 bolt is a column expression ([[ScalarBolt]]) — codegen'd, no UDF;
  *  - a 1→N bolt is an array-producing expression exploded by the runner
  *    ([[GeneratorBolt]]) — the reference has no N>1 analog short of the
  *    wordcount tokenizer, which is exactly this shape;
  *  - a stateful terminal bolt is a typed [[Aggregator]] ([[foldBolt]]) —
  *    partial/final merge split handled by Spark, mirroring the reference's
  *    boltc pre-count / boltl merge without the hand-rolled protocol.
  *
  * A pipeline is then `spout → bolts.foldLeft(df)((d, b) => b(d))`
  * ([[Pipeline.run]]) — the role-assignment string protocol
  * (`Nimbus.go:628-648`) collapses into function composition, and the
  * planner/scheduler is Catalyst.
  */
object Plug {

  /** Source contract: `Open()`+`NextTuple()` becomes "produce a frame". */
  trait Spout {
    def open(spark: SparkSession): DataFrame
  }

  /** A bolt is a whole-frame transform — the common shape every concrete
    * bolt below reduces to, and what [[Pipeline]] composes.
    */
  trait Bolt extends (DataFrame => DataFrame)

  /** 1→1 tuple transform as named column expressions: each output column is
    * an expression over the input row (the `Execute(map) → map` contract,
    * minus the stringly typing). Stays inside whole-stage codegen.
    */
  final case class ScalarBolt(outputs: (String, Column)*) extends Bolt {
    def apply(df: DataFrame): DataFrame =
      df.select(outputs.map { case (n, c) => c.as(n) }: _*)
  }

  /** Row filter bolt (the reference folds filters into Execute by returning
    * nil; we keep the predicate declarative so it pushes down).
    */
  final case class FilterBolt(predicate: Column) extends Bolt {
    def apply(df: DataFrame): DataFrame = df.filter(predicate)
  }

  /** 1→N generator bolt: `gen` maps a row to an array; the runner explodes
    * it to one output row per element, carrying `keep` columns through.
    */
  final case class GeneratorBolt(gen: Column, as: String, keep: Seq[String] = Nil)
      extends Bolt {
    def apply(df: DataFrame): DataFrame =
      df.select(keep.map(col) :+ explode(gen).as(as): _*)
  }

  /** Stateful per-key terminal bolt from a typed [[Aggregator]]: groupByKey +
    * agg — Spark plans the partial/final split (boltc pre-aggregate, boltl
    * merge, `bolt/bolt.go:544-583`) and spills state, which the reference's
    * mutex-guarded in-memory maps (`bolt/bolt.go:28-34`) cannot.
    */
  def foldBolt[T, K: Encoder, B, O](ds: Dataset[T], key: T => K,
                                    agg: Aggregator[T, B, O]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key).agg(agg.toColumn.name("agg")).toDF("key", "agg")
  }

  /** A linear topology: source then bolt chain — the reference's
    * `spout → boltc* → boltl` shape with Catalyst as the scheduler.
    */
  final case class Pipeline(spout: Spout, bolts: Bolt*) {
    def run(spark: SparkSession): DataFrame =
      bolts.foldLeft(spout.open(spark))((df, b) => b(df))
  }

  /** Example Aggregator: sum of a numeric field — the merge-associative
    * shape every reference boltl implements by hand.
    */
  final case class LongSum[T](f: T => Long) extends Aggregator[T, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: T): Long = b + f(a)
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
    def outputEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
  }
}
