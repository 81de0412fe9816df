package graft

/** Co-located joins via bucketing: writing both sides bucketed by the join
  * key on the same bucket count lets the join run with NO shuffle exchange —
  * the pre-partitioning strategy for repeated large-fact joins at 100 TB
  * (pay the shuffle once at write time, never per query).
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed tables sort-merge join without any Exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS g_bucket_a")
      spark.sql("DROP TABLE IF EXISTS g_bucket_b")
      spark.range(10000).selectExpr("id % 512 AS k", "id AS v")
        .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("g_bucket_a")
      spark.range(5000).selectExpr("id % 512 AS k", "id AS w")
        .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("g_bucket_b")

      val joined = spark.table("g_bucket_a").join(spark.table("g_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // correctness: equals the plain (shuffling) join row count
      val expected = spark.range(10000).selectExpr("id % 512 AS k")
        .join(spark.range(5000).selectExpr("id % 512 AS k"), "k").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS g_bucket_a")
      spark.sql("DROP TABLE IF EXISTS g_bucket_b")
    }
  }
}
