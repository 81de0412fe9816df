package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines source — the third raw-text format a modern ingest pipeline
  * meets (the reference stops at text + CSV; every LLM-training corpus
  * drop — Common-Crawl derivatives, chat logs, API exports — arrives as
  * JSONL). Spark-native: a schema'd `spark.read.json` (schema supplied, so
  * no sampling inference pass over 100 TB; column pruning reaches the
  * reader) plus a `from_json` variant for JSON already in a string column
  * (Kafka values, nested exports). Both are Catalyst expressions, not
  * UDFs — parsing stays inside whole-stage codegen.
  *
  * Malformed-row policy (F4's JSON analog): PERMISSIVE mode yields nulls
  * for unparseable records; [[jsonl]] exposes them via the standard
  * `_corrupt_record` column when `keepCorrupt` is set, else drops them —
  * the same explicit malformed-row contract as `LogLines.isWellFormed`.
  */
object JsonSource {

  /** Schema'd JSONL file read. `keepCorrupt = false` (default) drops rows
    * that failed to parse (all-null struct fields); true keeps the raw
    * line in `_corrupt_record` for quarantine sinks.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType,
            keepCorrupt: Boolean = false): DataFrame = {
    if (keepCorrupt) {
      // Spark forbids referencing _corrupt_record straight off a raw JSON
      // file scan (the parser only fills it when a data column is also
      // requested), so the quarantine form parses explicitly: text lines →
      // from_json with a corrupt-record sidecar. Same codegen'd parser,
      // no restriction on downstream filters.
      val withCorrupt = schema.add("_corrupt_record", "string")
      spark.read.text(path)
        .select(from_json(col("value"), withCorrupt,
          Map("columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
        .select(col("r.*"))
    } else {
      val cols = schema.fieldNames
      spark.read.schema(schema).json(path)
        // a malformed line parses to all-null fields in PERMISSIVE mode
        .filter(cols.map(c => col(c).isNotNull).reduce(_ || _))
    }
  }

  /** Parse JSON records held in a string column (schema'd `from_json`). */
  def parseJsonColumn(df: DataFrame, jsonCol: String,
                      schema: StructType): DataFrame =
    df.select(from_json(col(jsonCol), schema, Map.empty[String, String]).as("r"))
      .select(col("r.*"))
}
