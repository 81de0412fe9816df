package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable log-line parsing column library — the Spark-native form of the
  * reference's nasalog spout parser.
  *
  * Reference semantics (`spout/spout.go:186-198`): split the raw line on
  * whitespace; drop lines with fewer than 9 fields; emit fields
  * 0→host, 3→date (chars [1:3] of `[DD/Mon/...`, i.e. day-of-month),
  * 5→request (leading `"` stripped), 6→url, 8→status.
  *
  * Everything is a single-pass column expression pipeline: the split happens
  * once, field extraction is `element_at` on the resulting array, so the whole
  * parse stays inside whole-stage codegen with no UDFs.
  */
object LogLines {

  /** Tokenized line (whitespace-split), mirroring Go's `strings.Fields`
    * (which collapses runs of whitespace — hence the `\\s+` regex).
    */
  def tokens(line: Column): Column = split(trim(line), "\\s+")

  /** `spout/spout.go:190-192`: malformed rows (<9 fields) are dropped. */
  def isWellFormed(line: Column, minFields: Int = 9): Column =
    size(tokens(line)) >= minFields

  /** Parse a Common-Log-Format line into the reference's five-field schema.
    * Input column `lineCol` must be a string; output columns:
    * host, date (day-of-month chars), request (method sans quote), url,
    * status — all strings, exactly as the reference emits them.
    */
  def parseClf(df: DataFrame, lineCol: String): DataFrame = {
    val t = tokens(col(lineCol))
    df.filter(isWellFormed(col(lineCol)))
      .select(
        element_at(t, 1).as("host"),
        // `spout/spout.go:194`: arr[3][1:3] — substring is 1-based in SQL,
        // Go's [1:3] = chars 2..3.
        substring(element_at(t, 4), 2, 2).as("date"),
        // `spout/spout.go:195`: arr[5][1:] strips the leading `"`.
        substring(element_at(t, 6), 2, Int.MaxValue).as("request"),
        element_at(t, 7).as("url"),
        element_at(t, 9).as("status"))
  }
}
