package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Partitioned table layout: writing a corpus partitioned by a low-
  * cardinality routing column (source, lang, date) lets per-partition
  * queries skip unrelated data entirely — at 100 TB, a `source = x`
  * filter over a source-partitioned corpus reads that source's files and
  * NOTHING else. The complement to BucketingSpec (join co-location): this
  * is scan elimination.
  */
class PartitionedLayoutSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  test("a filter on the partition column prunes to matching directories only") {
    val dir = Files.createTempDirectory("graft-partitioned").toString
    val docs = (0L until 300L).map(i => (i, s"doc $i body", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    docs.write.partitionBy("source").mode("overwrite").parquet(dir)

    val filtered = spark.read.parquet(dir).filter(col("source") === "src1")
    // the partition predicate must land in PartitionFilters (directory
    // pruning), not PushedFilters (row-group skipping within read files)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(source"), scan)
    assert(filtered.count() == 100)
    assert(filtered.select("doc_id").as[Long].collect().forall(_ % 3 == 1))

    // physical check: only src1's directory is listed by the pruned scan
    val files = filtered.select(input_file_name()).distinct()
      .as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains("source=src1")), files.mkString(","))
  }
}
