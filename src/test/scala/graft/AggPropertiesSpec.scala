package graft

import scala.util.Random
import graft.operators.Relational

/** Property layer (SURVEY §5.3): the partial/final aggregate split the
  * reference hand-codes as boltc/boltl is only correct if the merge is
  * associative+commutative and partition-layout-independent. Seeded random
  * inputs (no scalatestplus bridge in the offline cache, so generators are
  * hand-rolled) compare results across repartitionings and against an
  * in-memory reference computation.
  */
class AggPropertiesSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private val words = Vector("a", "b", "cc", "ddd", "http", "2008", "httpverylong1", "20081231xx")
  private def randomLines(rnd: Random, n: Int): List[String] =
    List.fill(n)(List.fill(rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" "))

  private def referenceWordCount(lines: Seq[String]): Map[String, Long] =
    lines
      .filter { l =>
        val t = l.split(" ", -1).headOption.getOrElse("")
        !(t.length > 8 && (t.startsWith("http") || t.startsWith("2008")))
      }
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("wordCount: any partitioning equals single-partition run (10 seeded trials)") {
    val rnd = new Random(42)
    (1 to 10).foreach { _ =>
      val lines = randomLines(rnd, 30)
      val df = lines.toDF("line")
      val one = Relational.wordCount(df.repartition(1), "line")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val many = Relational.wordCount(df.repartition(1 + rnd.nextInt(8)), "line")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(one == many, s"partitioning changed wordCount for input $lines")
    }
  }

  test("wordCount equals in-memory reference computation (10 seeded trials)") {
    val rnd = new Random(7)
    (1 to 10).foreach { _ =>
      val lines = randomLines(rnd, 20)
      val got = Relational.wordCount(lines.toDF("line"), "line")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == referenceWordCount(lines), s"mismatch for input $lines")
    }
  }

  test("topK is stable under input permutation and repartitioning") {
    val rnd = new Random(99)
    (1 to 10).foreach { _ =>
      val pairs = List.fill(25)((s"u${rnd.nextInt(10)}${rnd.nextInt(10)}", rnd.nextInt(5).toLong))
        .distinctBy(_._1)
      val a = Relational.topK(pairs.toDF("k", "cnt"), 5, "cnt", "k").collect().toSeq
      val b = Relational.topK(rnd.shuffle(pairs).toDF("k", "cnt").repartition(3), 5, "cnt", "k")
        .collect().toSeq
      assert(a == b)
    }
  }

  test("countAndDistinct merge is layout-independent (10 seeded trials)") {
    val rnd = new Random(5)
    (1 to 10).foreach { _ =>
      val rows = List.fill(60)((s"h${rnd.nextInt(4)}", s"r${rnd.nextInt(9)}"))
      val a = Relational.countAndDistinct(rows.toDF("k", "item").repartition(1), "k", "item")
        .orderBy("k").collect().toSeq
      val b = Relational.countAndDistinct(
        rnd.shuffle(rows).toDF("k", "item").repartition(1 + rnd.nextInt(7)), "k", "item")
        .orderBy("k").collect().toSeq
      assert(a == b)
    }
  }
}
