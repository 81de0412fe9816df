package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, TextAnalysis}

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

  private def refBpe(words: Map[String, Long], numMerges: Int, minFreq: Long,
                     symbols: String => List[String] = refSymbols)
      : (List[(String, String, Long)], Map[String, List[String]]) = {
    var segs = words.map { case (w, _) => w -> symbols(w) }
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

  test("trainMerges equals the single-node reference, merge for merge (both paths)") {
    val (refMerges, _) = refBpe(localWordFreq, numMerges = 12, minFreq = 2)
    // default cap → driver fast path; cap 0 → forced distributed loop
    for (cap <- Seq(Bpe.DefaultDriverVocabCap, 0L)) {
      val got = Bpe.trainMerges(corpus, "text", numMerges = 12,
          driverVocabCap = cap)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toList
      assert(got == refMerges, s"cap=$cap")
    }
    assert(refMerges.nonEmpty && refMerges.length <= 12)
  }

  test("driver fast path and distributed loop agree on segmentation") {
    val local = Bpe.segment(corpus, "text", numMerges = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    val dist = Bpe.segment(corpus, "text", numMerges = 8, driverVocabCap = 0L)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(local == dist)
  }

  test("driver fast path trains 200+ merges, flat per-merge cost") {
    // 400 word types × freq 2 sustains hundreds of distinct merges at
    // minFreq=2; per-merge cost is a driver hash-map pass over the vocab
    // (zero Spark jobs), so 200 merges run in milliseconds where the
    // distributed loop would schedule 200 sequential jobs.
    val words = (0 until 400).map(i => f"w${i}%03d${"abcdefgh".drop(i % 4)}")
    val text = (words ++ words).mkString(" ")
    val big = Seq((0L, text)).toDF("doc_id", "text")
    val freq = words.groupBy(identity).view.mapValues(_ => 2L).toMap
    val (refMerges, _) = refBpe(freq, numMerges = 200, minFreq = 2)
    assert(refMerges.length == 200, s"fixture too small: ${refMerges.length}")
    val t0 = System.nanoTime()
    val got = Bpe.trainMerges(big, "text", numMerges = 200)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toList
    val sec = (System.nanoTime() - t0) / 1e9
    assert(got == refMerges)
    // generous bound: one Spark agg + collect + the local loop; the point
    // is it does NOT scale with numMerges × job-latency (which alone would
    // be ~200 × 50ms = 10s here)
    assert(sec < 10.0, f"200 merges took $sec%.1f s — fast path not taken?")
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

  test("distributed loop with reliable checkpointDir: identical merges") {
    val (refMerges, _) = refBpe(localWordFreq, numMerges = 12, minFreq = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-ckpt").toFile
    try {
      // cap 0 forces the distributed loop; ≥8 merges crosses the
      // CheckpointEvery boundary so the reliable cut actually runs
      val got = Bpe.trainMerges(corpus, "text", numMerges = 12,
          driverVocabCap = 0L, checkpointDir = Some(dir.getPath))
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toList
      assert(got == refMerges)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(dir)
    }
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

  test("encode emits the reference segmentation as dense ids; counts agree with tokenizeCorpus") {
    val (_, refSegs) = refBpe(localWordFreq, numMerges = 8, minFreq = 2)
    val vocab = Bpe.segment(corpus, "text", numMerges = 8)
    // expected id table: distinct symbols in binary order, dense from 0
    val symbols = refSegs.values.flatten.toSet.toSeq.sorted
    val id = symbols.zipWithIndex.toMap
    val gotIds = Bpe.vocabIds(vocab).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(gotIds == id)
    val enc = Bpe.encode(corpus, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1).toList, r.getLong(2))).toMap
    val expect = corpus.collect().map { r =>
      val words = r.getString(1).split(" ").filter(_.nonEmpty)
      val idsSeq = words.flatMap(w => refSegs(w)).map(id).toList
      r.getLong(0) -> ((idsSeq, idsSeq.length.toLong))
    }.toMap
    assert(enc == expect)
    // n_bpe_tokens must equal tokenizeCorpus's count for every doc
    val counts = Bpe.tokenizeCorpus(corpus, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(enc.view.mapValues(_._2).toMap == counts)
  }

  // ---- GPT-2-style regex pre-tokenizer (TextAnalysis.preTokens) ----

  /** JVM mirror of the engine's pre-tokenization: the same pattern
    * compiled by java.util.regex (exactly what Spark's regexp_extract_all
    * runs), applied by repeated find — so the reference word-freq table is
    * segmented by the identical rule.
    */
  private def regexTokens(s: String): Seq[String] = {
    val m = java.util.regex.Pattern
      .compile(TextAnalysis.PreTokenPattern).matcher(s)
    val buf = Seq.newBuilder[String]
    while (m.find()) buf += m.group()
    buf.result()
  }

  private val punctCorpus = Seq(
    (0L, "low, low low! don't don't lower... newest"),
    (1L, "newest; newest newest (newest) widest widest's widest"),
    (2L, "low lower, newest widest don't aaaa aaaa, aaaa 1984 1984."),
  ).toDF("doc_id", "text")

  test("pre-tokenizer: trainMerges equals the reference over regex pre-tokens (both paths)") {
    val freq = punctCorpus.collect()
      .flatMap(r => regexTokens(r.getString(1))).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // the rule actually does its job on this fixture: punctuation splits
    // off ("low," never trains as a type), contractions split ("'t"),
    // digit runs are their own tokens
    assert(freq.contains("low") && freq.contains(",") && !freq.contains("low,"))
    assert(freq.contains("'t") && freq.contains("don") && !freq.contains("don't"))
    assert(freq.contains("1984") && !freq.contains("1984."))
    val (refMerges, _) = refBpe(freq, numMerges = 10, minFreq = 2)
    assert(refMerges.nonEmpty)
    for (cap <- Seq(Bpe.DefaultDriverVocabCap, 0L)) {
      val got = Bpe.trainMerges(punctCorpus, "text", numMerges = 10,
          driverVocabCap = cap, tokenizer = TextAnalysis.preTokens)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toList
      assert(got == refMerges, s"cap=$cap")
    }
  }

  test("pre-tokenizer: encode/detokenize round-trips to the pre-token stream") {
    val vocab = Bpe.segment(punctCorpus, "text", numMerges = 8,
      tokenizer = TextAnalysis.preTokens)
    val enc = Bpe.encode(punctCorpus, "doc_id", "text", vocab,
      tokenizer = TextAnalysis.preTokens)
    val back = Bpe.detokenize(enc, vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // lossless up to the pre-tokenizer (the documented contract): the
    // round trip returns the pre-token stream joined by single spaces
    val expect = punctCorpus.collect().map { r =>
      r.getLong(0) -> regexTokens(r.getString(1)).filter(_.nonEmpty).mkString(" ")
    }.toMap
    assert(back == expect)
  }

  test("detokenize round-trips encode; OOV characters render as UNK") {
    val vocab = Bpe.segment(corpus, "text", numMerges = 8)
    val enc = Bpe.encode(corpus, "doc_id", "text", vocab)
    val back = Bpe.detokenize(enc, vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = corpus.collect().map { r =>
      r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).mkString(" ")
    }.toMap
    assert(back == expect)
    // a document with characters absent from the vocab: unknown symbols
    // encode as -1 and detokenize drops them (documented lossy UNK)
    val oov = Seq((9L, "low zQz")).toDF("doc_id", "text")
    val encOov = Bpe.encode(oov, "doc_id", "text", vocab)
    val ids = encOov.collect().head.getSeq[Int](1)
    assert(ids.contains(-1))
    val backOov = Bpe.detokenize(encOov, vocab)
      .collect().map(r => r.getString(1)).head
    // "low" survives; of "zQz" only in-vocab chars survive ("Q" is OOV)
    assert(backOov.startsWith("low"))
    assert(!backOov.contains("Q"))
  }

  // ---- byte-level mode: independent re-derivation of the GPT-2 proxy
  // table (Radford et al. 2019 bytes_to_unicode) pins the engine's ----
  private val refProxy: Array[String] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var next = 256
    (0 until 256).map { b =>
      if (printable(b)) b.toChar.toString
      else { val c = next.toChar.toString; next += 1; c }
    }.toArray
  }

  private def refByteSymbols(w: String): List[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => refProxy(b & 0xFF)).toList :+ "\u2581"

  // non-ASCII heavy: multi-byte UTF-8 everywhere, plus control bytes —
  // what a crawl actually contains
  private val byteCorpus = Seq(
    (0L, "caf\u00e9 caf\u00e9 caf\u00e9 na\u00efve na\u00efve, low low low"),
    (1L, "\u00fcber \u00fcber caf\u00e9 low \u0007bell \u0007bell"),
    (2L, "low lower na\u00efve \u00fcber 1984 1984."),
  ).toDF("doc_id", "text")

  test("byte-level: trainMerges equals the reference over byte proxies (both paths)") {
    val freq = byteCorpus.collect()
      .flatMap(r => regexTokens(r.getString(1))).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (refMerges, refSegs) = refBpe(freq, numMerges = 12, minFreq = 2,
      symbols = refByteSymbols)
    assert(refMerges.nonEmpty)
    // the alphabet is bytes: caf\u00e9's \u00e9 starts as TWO proxy symbols
    assert(refSegs.keySet.contains("caf\u00e9") &&
      refByteSymbols("caf\u00e9").length == 6) // c a f 0xC3 0xA9 marker
    for (cap <- Seq(Bpe.DefaultDriverVocabCap, 0L)) {
      val got = Bpe.trainMerges(byteCorpus, "text", numMerges = 12,
          driverVocabCap = cap, tokenizer = TextAnalysis.preTokens,
          byteLevel = true)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toList
      assert(got == refMerges, s"cap=$cap")
    }
    val segDf = Bpe.segment(byteCorpus, "text", numMerges = 12,
        tokenizer = TextAnalysis.preTokens, byteLevel = true)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(segDf == refSegs)
  }

  test("byte-level: zero UNK on unseen bytes; detokenizeBytes round-trips byte-exactly") {
    val vocab = Bpe.segment(byteCorpus, "text", numMerges = 10,
      tokenizer = TextAnalysis.preTokens, byteLevel = true)
    // a document FULL of content training never saw: 4-byte emoji,
    // CJK, control chars, Latin-1 oddities — byte fallback must encode
    // all of it with not a single UNK id
    val alien = Seq(
      (7L, "\ud83e\udd80 crab \u00e7a va \u4e16\u754c \u0001ctl low"),
      (8L, "\u00e9\u00e8\u00ea mixed\u00df text")).toDF("doc_id", "text")
    val enc = Bpe.encode(alien, "doc_id", "text", vocab,
      tokenizer = TextAnalysis.preTokens, byteLevel = true)
    val ids = enc.collect().flatMap(_.getSeq[Int](1))
    assert(ids.nonEmpty && !ids.contains(-1)) // the no-OOV guarantee
    val back = Bpe.detokenizeBytes(enc, vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = alien.collect().map { r =>
      r.getLong(0) -> regexTokens(r.getString(1)).filter(_.nonEmpty).mkString(" ")
    }.toMap
    assert(back == expect) // byte-exact up to the pre-tokenizer
    // char-level on the same input, for contrast: UNK everywhere
    val encChar = Bpe.encode(alien, "doc_id", "text",
      Bpe.segment(byteCorpus, "text", 10, tokenizer = TextAnalysis.preTokens),
      tokenizer = TextAnalysis.preTokens)
    assert(encChar.collect().flatMap(_.getSeq[Int](1)).contains(-1))
  }

  test("tokenizer store: loaded model reproduces the in-memory model exactly") {
    val docs = corpus // the suite's shared fixture
    val dir = java.nio.file.Files.createTempDirectory("bpe-store").toString
    Bpe.saveTokenizer(docs, "text", dir, numMerges = 6)
    // merges round-trip rank-for-rank
    val mem = Bpe.trainMerges(docs, "text", numMerges = 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val disk = Bpe.loadMerges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(disk.toSeq == mem.toSeq)
    // meta self-describes the build
    assert(Bpe.loadTokenizerMeta(spark, dir) == ((6, false)))
    // tokenizeCorpus under the LOADED vocab ≡ under the in-memory vocab
    val memCounts = Bpe.tokenizeCorpus(docs, "doc_id", "text",
        Bpe.segment(docs, "text", numMerges = 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val diskCounts = Bpe.tokenizeCorpus(docs, "doc_id", "text",
        Bpe.loadVocab(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(diskCounts.toSeq == memCounts.toSeq)
  }
}
