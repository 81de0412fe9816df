package graft

import graft.operators.Dedup

/** Randomized (seeded) equivalence properties for the dedup family: the
  * distributed operators vs an in-memory Scala reference computation on
  * generated corpora — the merge-correctness evidence unit examples can't
  * give.
  */
class DedupPropertiesSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private def corpus(seed: Int, docs: Int, vocab: Int, len: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until docs).map { i =>
      val base = (0 until len).map(_ => s"w${rnd.nextInt(vocab)}").mkString(" ")
      (i.toLong, base)
    }
  }

  private def shinglesOf(text: String, n: Int): Set[String] =
    text.split(" ").sliding(n).filter(_.length == n).map(_.mkString("_")).toSet

  private def bruteJaccard(docs: Seq[(Long, String)], n: Int, t: Double): Set[(Long, Long)] = {
    val sh = docs.map { case (id, s) => id -> shinglesOf(s, n) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = (sa intersect sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= t
    } yield (a, b)).toSet
  }

  test("jaccardPairs equals the in-memory reference on random corpora (5 seeded trials)") {
    for (seed <- 1 to 5) {
      val docs = corpus(seed, docs = 60, vocab = 12, len = 15)
      val expect = bruteJaccard(docs, n = 3, t = 0.2)
      val got = Dedup.jaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, threshold = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect, s"seed $seed: got ${got.size}, expected ${expect.size}")
    }
  }

  test("prefix-filtered jaccard equals unfiltered jaccard exactly (lossless pruning)") {
    for (seed <- 1 to 5) {
      val docs = corpus(seed, docs = 60, vocab = 12, len = 15)
      val full = Dedup.jaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, threshold = 0.25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pruned = Dedup.jaccardPairsPrefix(docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, threshold = 0.25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pruned == full, s"seed $seed: prefix filter changed the output")
    }
  }

  test("minHashDedup output is a subset of exact pairs and catches all exact duplicates") {
    for (seed <- 1 to 3) {
      val base = corpus(seed, docs = 40, vocab = 10, len = 20)
      // plant exact duplicates: ids 1000+ are copies of the first 5 docs
      val docs = base ++ base.take(5).map { case (id, s) => (id + 1000, s) }
      val exact = bruteJaccard(docs, n = 3, t = 0.3)
      val lsh = Dedup.minHashDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, k = 12, rowsPerBand = 3, threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(lsh.subsetOf(exact), s"seed $seed: LSH produced a non-exact pair")
      base.take(5).foreach { case (id, _) =>
        assert(lsh.contains((id, id + 1000)),
          s"seed $seed: exact duplicate ($id,${id + 1000}) missed — identical docs always band-collide")
      }
    }
  }

  test("canonicalIds equals in-memory union-find on random graphs (5 seeded trials)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 120
      val edges = (0 until 90).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // in-memory union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expect = nodes.map(v => v -> find(v.toInt).toLong).toMap
      // both execution paths must agree with the reference: the driver
      // union-find fast path (default cap) and the distributed
      // pointer-jumping loop (cap 0 forces it)
      val fast = Dedup.canonicalIds(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == expect, s"seed $seed: fast-path components differ")
      val loop = Dedup.canonicalIds(edges.toDF("doc_a", "doc_b"),
          driverEdgeCap = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(loop == expect, s"seed $seed: loop-path components differ")
    }
  }

  test("canonicalIds resolves a long chain (pointer jumping, not O(diameter))") {
    // a 200-link path through the DISTRIBUTED loop (cap 0): one-hop-only
    // propagation would need 200 rounds and hit the 50-round cap; pointer
    // jumping must converge well within it
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = Dedup.canonicalIds(chain.toDF("doc_a", "doc_b"), driverEdgeCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 201 && got.forall(_._2 == 0L),
      "every node of the chain must resolve to the minimum id")
  }

  test("canonicalIds reliable-checkpoint path: same answer, files under the dir") {
    // the cluster form: pass a checkpointDir and the per-round lineage cut
    // becomes a reliable checkpoint (survives executor loss) instead of
    // localCheckpoint — results must be identical and the directory must
    // actually receive RDD checkpoint data
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    try {
      val chain = (0L until 60L).map(i => (i, i + 1))
      val got = Dedup.canonicalIds(chain.toDF("doc_a", "doc_b"),
          driverEdgeCap = 0, checkpointDir = Some(dir.getPath))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == 61 && got.forall(_._2 == 0L))
      def anyFile(f: java.io.File): Boolean = {
        val kids = Option(f.listFiles()).getOrElse(Array.empty)
        kids.exists(k => k.isFile || anyFile(k))
      }
      assert(anyFile(dir), "reliable checkpoint wrote nothing under the dir")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("simhash of near-identical docs is closer in hamming distance than random docs") {
    val rnd = new scala.util.Random(11)
    val a = (0 until 60).map(_ => s"w${rnd.nextInt(15)}").mkString(" ")
    val nearA = a.split(" ").updated(3, "CHANGED").mkString(" ")  // 1 of 60 tokens
    val other = (0 until 60).map(_ => s"x${rnd.nextInt(15)}").mkString(" ")
    val sigs = Dedup.simHash(
      Seq((0L, a), (1L, nearA), (2L, other)).toDF("doc_id", "text"),
      "doc_id", "text")
      .orderBy("id").collect().map(_.getLong(1))
    def hamming(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    assert(hamming(sigs(0), sigs(1)) < hamming(sigs(0), sigs(2)),
      s"near-dup hamming ${hamming(sigs(0), sigs(1))} !< unrelated ${hamming(sigs(0), sigs(2))}")
  }

  test("cdcChunks partitions and reconstructs every random document exactly (5 seeded trials)") {
    import graft.operators.TextAnalysis
    for (seed <- 1 to 5) {
      val docs = corpus(seed, docs = 40, vocab = 8, len = 30 + seed * 7)
      val out = TextAnalysis.cdcChunks(docs.toDF("doc_id", "text"),
          "doc_id", "text", width = 3, divisor = 4 + seed)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val chunks = out(id).sortBy(_._2)
        // partition: contiguous indices, positions stitch, sizes conserve
        assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong))
        assert(chunks.map(_._4).sum == toks.length.toLong, s"doc $id")
        chunks.foldLeft(1L) { case (expectStart, (_, _, start, n)) =>
          assert(start == expectStart, s"doc $id gap at $start")
          start + n
        }
      }
    }
  }

  test("cdcDedup self-diff invariants on random corpora: unique corpus survives whole") {
    import graft.operators.TextAnalysis
    // distinct-vocabulary docs (doc i's tokens are prefixed) — no cross-doc
    // or cross-position chunk can collide, so EVERYTHING must survive
    val docs = (0L until 30L)
      .map(i => (i, (1 to 40).map(j => s"d${i}w$j").mkString(" ")))
    val out = TextAnalysis.cdcDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text", width = 3, divisor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 30)
    out.foreach { case (id, nChunks, nKept, keptToks) =>
      assert(nChunks == nKept, s"doc $id dropped chunks without duplicates")
      assert(keptToks == 40L, s"doc $id token count changed")
    }
  }
}
