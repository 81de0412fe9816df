package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S2 CSV file source + S4 CSV column projection.
  *
  * The reference's reddit spout reads a headerless CSV record-at-a-time and
  * projects columns 2,3,4,5,10,11,12 into named tuple fields
  * (`spout/spout.go:91-92`, `:266-295`). Spark-native form: a schema'd
  * `spark.read.csv` (distributed scan, column pruning reaches the reader) and
  * a named projection; plus a `from_csv` variant for parsing CSV records that
  * are already a string column (in-flight CSV, sockets, Kafka values).
  */
object CsvSource {

  /** The 13-column reddit submissions schema (all strings at the source,
    * exactly as the reference sees them; casts happen at use sites like F2).
    * Only the 7 projected columns get real names; the rest keep positional
    * names so a schema'd read stays possible on the full file.
    */
  val redditRaw: StructType = StructType(
    (0 until 13).map {
      case 2  => StructField("rawtime", StringType)
      case 3  => StructField("title", StringType)
      case 4  => StructField("total_votes", StringType)
      case 5  => StructField("reddit_id", StringType)
      case 10 => StructField("score", StringType)
      case 11 => StructField("number_of_comments", StringType)
      case 12 => StructField("username", StringType)
      case i  => StructField(s"_c$i", StringType)
    })

  /** S4: the reference's 7-field projection (`spout/spout.go:278-286`). */
  val redditFields: Seq[String] =
    Seq("rawtime", "title", "total_votes", "reddit_id", "score",
      "number_of_comments", "username")

  /** S2+S4: headerless CSV file → the named 7-column frame. Column pruning
    * pushes the projection into the CSV reader.
    */
  def reddit(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(redditRaw).csv(path)
      .select(redditFields.map(col): _*)

  /** Parse CSV records held in a string column (schema'd, codegen'd —
    * `from_csv` is a Catalyst expression, not a UDF).
    */
  def parseCsvColumn(df: DataFrame, csvCol: String, schema: StructType): DataFrame =
    df.select(from_csv(col(csvCol), schema, Map.empty[String, String]).as("r"))
      .select(col("r.*"))
}
