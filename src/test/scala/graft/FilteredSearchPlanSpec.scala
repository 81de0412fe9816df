package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextAnalysis}

/** The r13 verdict's one scale hazard, closed: all three filtered-search
  * paths used to FORCE-broadcast the caller's eligibility set, which is
  * unbounded by contract ("language = en" selects half a corpus) — a
  * forced hint overrides autoBroadcastJoinThreshold and AQE, so a huge
  * allowed set was a guaranteed OOM at 100 TB. These specs prove the
  * plan, not the clock: with auto-broadcast disabled (simulating an
  * allowed set above the threshold), the eligibility semi-join must plan
  * as a shuffle join (SortMergeJoin/ShuffledHashJoin), while the
  * store-bounded sides (centroids, probes, dfreq, stats) keep their
  * explicit hints and still broadcast.
  */
class FilteredSearchPlanSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Run the frame with auto-broadcast OFF (a too-big allowed set never
    * auto-broadcasts) and return the FINAL adaptive plan string.
    */
  private def finalPlanNoAutoBroadcast(df: => org.apache.spark.sql.DataFrame)
      : String = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val d = df
      d.collect()
      d.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** Every LeftSemi join in the plan must be a shuffle join — a
    * broadcast LeftSemi means a forced hint survived on the eligibility
    * set (fresh stores carry no tombstones, so the allow join is the
    * only LeftSemi in these plans).
    */
  private def assertSemiJoinNotBroadcast(plan: String): Unit = {
    val semiLines = plan.linesIterator.filter(_.contains("LeftSemi")).toSeq
    assert(semiLines.nonEmpty, s"expected a LeftSemi eligibility join:\n$plan")
    semiLines.foreach { l =>
      assert(!l.contains("Broadcast"),
        s"eligibility semi-join still broadcasts: $l\n$plan")
    }
  }

  private lazy val vecs = (0L until 200L)
    .map(i => (i, Array.tabulate(8)(j => ((i * 7 + j * 3) % 13).toFloat)))
    .toDF("vec_id", "embedding")

  test("searchIvfIndexFiltered: a too-big-to-broadcast allowed set plans a shuffle semi-join") {
    val root = tmp("graft-filt-plan-ivf")
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding", root)
    val plan = finalPlanNoAutoBroadcast {
      Similarity.searchIvfIndexFiltered(spark, root,
        vecs.filter(col("vec_id") < 3), "vec_id", "embedding",
        vecs.filter(col("vec_id") % 2 === 0).select("vec_id"), k = 3)
    }
    assertSemiJoinNotBroadcast(plan)
    // the store-bounded sides keep their hints: probes/centroids still
    // broadcast even with the threshold off
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("searchIvfPqIndexFiltered: eligibility join is AQE-sized, not forced") {
    val root = tmp("graft-filt-plan-pq")
    Similarity.buildIvfPqIndex(vecs, "vec_id", "embedding", root)
    val plan = finalPlanNoAutoBroadcast {
      Similarity.searchIvfPqIndexFiltered(spark, root,
        vecs.filter(col("vec_id") < 3), "vec_id", "embedding",
        vecs.filter(col("vec_id") % 2 === 0).select("vec_id"), k = 3)
    }
    assertSemiJoinNotBroadcast(plan)
  }

  test("searchTextIndexFiltered: eligibility join is AQE-sized, not forced") {
    val docs = (0L until 120L)
      .map(i => (i, s"spark window hash doc$i " + ("filler " * (i % 5).toInt)))
      .toDF("doc_id", "text")
    val root = tmp("graft-filt-plan-txt")
    TextAnalysis.buildTextIndex(docs, "doc_id", "text", root)
    val plan = finalPlanNoAutoBroadcast {
      TextAnalysis.searchTextIndexFiltered(spark, root,
        Seq("spark", "window"),
        docs.filter(col("doc_id") % 2 === 0).select("doc_id"), k = 10)
    }
    assertSemiJoinNotBroadcast(plan)
  }

  test("filtered searches refuse a multi-column allowed frame (silent wrong-column filtering)") {
    val root = tmp("graft-filt-plan-req")
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding", root)
    intercept[IllegalArgumentException] {
      Similarity.searchIvfIndexFiltered(spark, root, vecs, "vec_id",
        "embedding", vecs.select("embedding", "vec_id"), k = 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.searchIvfPqIndexFiltered(spark, root, vecs, "vec_id",
        "embedding", vecs.select("embedding", "vec_id"), k = 3)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.searchTextIndexFiltered(spark, root, Seq("spark"),
        vecs.select("embedding", "vec_id"), k = 3)
    }
  }
}
