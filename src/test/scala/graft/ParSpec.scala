package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.operators.Par

/** [[Par]] backs the overlapped component writes inside the store
  * lifecycle verbs (build/append/delete/compact/vacuum, delta writes,
  * export legs) — its contract is what keeps those verbs' failure
  * semantics identical to the old sequential form: every task runs to
  * completion (no half-cancelled store writes), and the first failure in
  * task order is rethrown after all have finished.
  */
class ParSpec extends SparkTestBase {

  test("runs every task, including the 0- and 1-task degenerate forms") {
    val n = new AtomicInteger(0)
    Par.run()
    Par.run(() => n.incrementAndGet())
    assert(n.get() == 1)
    Par.run(Seq.fill(7)(() => { n.incrementAndGet(); () }): _*)
    assert(n.get() == 8)
  }

  test("a failing task does not cancel its siblings; the FIRST failure " +
      "in task order is rethrown after all complete") {
    val done = new AtomicInteger(0)
    val e = intercept[Exception] {
      Par.run(
        () => { Thread.sleep(50); done.incrementAndGet() },
        () => throw new IllegalArgumentException("first failing task"),
        () => throw new IllegalStateException("second failing task"),
        () => { Thread.sleep(20); done.incrementAndGet() })
    }
    // both non-failing siblings ran to completion despite the failures
    assert(done.get() == 2)
    // the rethrown failure is the first FAILING task by task order
    assert(e.isInstanceOf[IllegalArgumentException])
    assert(e.getMessage == "first failing task")
  }

  test("first failure by task order is the one rethrown") {
    val e = intercept[RuntimeException] {
      Par.run(
        () => { Thread.sleep(60); throw new RuntimeException("task-0") },
        () => throw new RuntimeException("task-1"))
    }
    assert(e.getMessage == "task-0")
  }

  test("concurrent Spark actions from Par produce the same store as " +
      "sequential ones (smoke: two parquet writes)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-par").toString
    val df = (1 to 100).toDF("x")
    Par.run(
      () => df.write.parquet(s"$dir/a"),
      () => df.selectExpr("x * 2 as y").write.parquet(s"$dir/b"))
    assert(spark.read.parquet(s"$dir/a").count() == 100)
    assert(spark.read.parquet(s"$dir/b").agg(Map("y" -> "max"))
      .head().getInt(0) == 200)
  }
}
