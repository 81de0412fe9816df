package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** The distributed BPE trainer is gated against an INDEPENDENT single-node
  * reference implementation (the textbook dict-of-words algorithm below):
  * identical merge lists, identical segmentations, repartition-invariant.
  */
class BpeSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  // ---- reference implementation: plain Scala over a word-freq map ----
  private def refSymbols(w: String): List[String] =
    w.map(_.toString).toList :+ "</w>"

  private def refMergeWord(syms: List[String], a: String, b: String): List[String] =
    syms.foldLeft(List.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b)
        acc.init :+ (a + b)
      else acc :+ x
    }

  private def refBpe(words: Map[String, Long], numMerges: Int, minFreq: Long)
      : (List[(String, String, Long)], Map[String, List[String]]) = {
    var segs = words.map { case (w, _) => w -> refSymbols(w) }
    val merges = List.newBuilder[(String, String, Long)]
    var stop = false
    for (_ <- 0 until numMerges if !stop) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- segs; Seq(a, b) <- syms.sliding(2) if syms.length >= 2)
        pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + words(w)
      val best = pairCounts.toSeq
        .sortBy { case ((a, b), f) => (-f, a, b) }.headOption
      best match {
        case Some(((a, b), f)) if f >= minFreq =>
          merges += ((a, b, f))
          segs = segs.map { case (w, syms) => w -> refMergeWord(syms, a, b) }
        case _ => stop = true
      }
    }
    (merges.result(), segs)
  }

  private val corpus = Seq(
    (0L, "low low low low low lower lower newest newest"),
    (1L, "newest newest newest newest widest widest widest"),
    (2L, "low lower newest widest aaaa aaaa aaaa"),
  ).toDF("doc_id", "text")

  private def localWordFreq: Map[String, Long] =
    corpus.collect().flatMap(_.getString(1).split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("trainMerges equals the single-node reference, merge for merge") {
    val (refMerges, _) = refBpe(localWordFreq, numMerges = 12, minFreq = 2)
    val got = Bpe.trainMerges(corpus, "text", numMerges = 12)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toList
    assert(got == refMerges)
    assert(refMerges.nonEmpty && refMerges.length <= 12)
  }

  test("segment equals the reference segmentation; fold never re-merges") {
    val (_, refSegs) = refBpe(localWordFreq, numMerges = 8, minFreq = 2)
    val got = Bpe.segment(corpus, "text", numMerges = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(got == refSegs)
    // 'aaaa' exercises leftmost non-overlapping: (a,a) merges to
    // [aa, aa, </w>] (fold), never [a, aa, a, ...]
    val aaaa = got("aaaa")
    assert(!aaaa.contains("a") || aaaa.count(_ == "a") < 4, aaaa.toString)
  }

  test("merges are repartition-invariant") {
    val a = Bpe.trainMerges(corpus, "text", numMerges = 6)
      .orderBy("rank").collect().toSeq
    val b = Bpe.trainMerges(corpus.repartition(7), "text", numMerges = 6)
      .orderBy("rank").collect().toSeq
    assert(a == b)
  }

  test("minFreq stops the loop; zero merges allowed") {
    val few = Seq((0L, "x y z")).toDF("doc_id", "text")
    // every pair occurs once -> below default minFreq=2 -> no merges
    assert(Bpe.trainMerges(few, "text", numMerges = 5).count() == 0)
    assert(Bpe.trainMerges(corpus, "text", numMerges = 0).count() == 0)
  }

  test("tokenizeCorpus equals the reference segmentation summed per doc; OOV falls back to chars") {
    val (_, refSegs) = refBpe(localWordFreq, numMerges = 8, minFreq = 2)
    val vocab = Bpe.segment(corpus, "text", numMerges = 8)
    val got = Bpe.tokenizeCorpus(corpus, "doc_id", "text", vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = corpus.collect().map { r =>
      val words = r.getString(1).split(" ").filter(_.nonEmpty)
      (r.getLong(0), words.length.toLong,
        words.map(w => refSegs(w).length.toLong).sum)
    }.sortBy(_._1)
    assert(got.toSeq == expect.toSeq)
    // OOV document against the same vocab: every word segments to
    // characters + marker
    val oov = Seq((9L, "zz qqq")).toDF("doc_id", "text")
    val o = Bpe.tokenizeCorpus(oov, "doc_id", "text", vocab).collect().head
    assert(o.getLong(1) == 2L && o.getLong(2) == (3L + 4L))
  }
}
