package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Unit tests for the dedup family on tiny in-memory corpora with
  * hand-computable expectations.
  */
class DedupSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private val corpus = Seq(
    (0L, "a b c d e"),
    (1L, "a b c d e"),          // exact duplicate of 0
    (2L, "a b c d x"),          // near-dup of 0: shares shingles a_b_c, b_c_d
    (3L, "z y x w v"),          // unrelated
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val out = Dedup.exact(corpus, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("exact dedup normalizes case and surrounding whitespace") {
    val df = Seq((0L, "A b C"), (1L, "  a b c "), (2L, "a  b c")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text").collect()
    // 0 and 1 merge (lower+trim); 2 differs (inner double space survives)
    assert(out.length == 2)
    assert(out.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L))
  }

  test("NFC normalization makes NFD/NFC spellings dedup together (opt-in)") {
    // "café" composed (U+00E9) vs decomposed ("e" + U+0301): identical
    // rendered text, different bytes — raw exact dedup keeps both
    val df = Seq((0L, "café au lait"), (1L, "café au lait"))
      .toDF("doc_id", "text")
    val raw = Dedup.exact(df, "doc_id", "text").collect()
    assert(raw.length == 2, "NFD/NFC must differ WITHOUT normalization")
    // the opt-in step: normalize before dedup — the pair collapses
    val out = Dedup.exact(
        df.withColumn("text",
          TextAnalysis.normalizeText(TestSpark.spark, col("text"), caseFold = false)),
        "doc_id", "text")
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 0L && out.head.getLong(2) == 2L)
    // ASCII fast path is the identity (same object semantics are an
    // implementation detail; value equality is the contract)
    val same = df.select(
      TextAnalysis.normalizeText(TestSpark.spark, lit("plain ascii"), caseFold = false))
      .collect().head.getString(0)
    assert(same == "plain ascii")
    // caseFold composes: NFC then lower
    val folded = df.select(
      TextAnalysis.normalizeText(TestSpark.spark, lit("CAFÉ"), caseFold = true))
      .collect().head.getString(0)
    assert(folded == "café")
  }

  test("jaccard pairs finds exact and near duplicates, never self-pairs") {
    val out = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.3)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // docs 0,1: identical shingle sets -> jaccard 1.0
    // docs 0,2 and 1,2: 2 common of 3+3-2=4 -> 0.5
    assert(out.toSeq == Seq((0L, 1L, 1.0), (0L, 2L, 0.5), (1L, 2L, 0.5)))
  }

  test("jaccard respects the threshold") {
    val out = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 1L)))
  }

  test("minhash signature is identical for identical shingle sets") {
    val sig = Dedup.minHashSignature(corpus, "doc_id", "text", n = 3, k = 12)
      .orderBy("id").collect()
    val s0 = sig(0).toSeq.drop(1)
    val s1 = sig(1).toSeq.drop(1)
    assert(s0 == s1)                       // identical docs -> identical sigs
    assert(sig(0).toSeq.drop(1) != sig(3).toSeq.drop(1))
  }

  test("minhash-LSH recovers exact duplicates and filters by verified jaccard") {
    val out = Dedup.minHashDedup(corpus, "doc_id", "text",
      n = 3, k = 12, rowsPerBand = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // identical docs always collide on every band; 0.9 threshold drops the 0.5 pairs
    assert(out.toSeq == Seq((0L, 1L)))
  }

  test("minHashAgainst flags batch docs duplicating the corpus, nothing else") {
    // corpus rows 0,1,3 stay; the "batch" plants one dup of 0 and one fresh doc
    val base = corpus.filter(col("doc_id") =!= 2)
    val batch = Seq((10L, "a b c d e"),      // duplicate of corpus doc 0
                    (11L, "m n o p q r s")   // novel
      ).toDF("doc_id", "text")
    val out = Dedup.minHashAgainst(base, batch, "doc_id", "text",
        n = 3, k = 12, rowsPerBand = 3, threshold = 0.9)
      .orderBy("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the planted dup hits BOTH identical corpus copies; the novel doc none
    assert(out.toSeq == Seq((10L, 0L, 1.0), (10L, 1L, 1.0)))
  }

  test("minHashAgainst equals the self-join dedup restricted to cross pairs") {
    val all = Seq(
      (0L, "a b c d e"), (1L, "a b c d x"), (2L, "z y x w v u"),
      (3L, "a b c d e"), (4L, "z y x w v u"), (5L, "f g h i j k"),
    ).toDF("doc_id", "text")
    val even = all.filter(col("doc_id") % 2 === 0)
    val odd = all.filter(col("doc_id") % 2 === 1)
    val cross = Dedup.minHashAgainst(even, odd, "doc_id", "text", threshold = 0.3)
      .collect().map(r => {
        val (b, c) = (r.getLong(0), r.getLong(1))
        (math.min(b, c), math.max(b, c), r.getDouble(2))
      }).toSet
    val self = Dedup.minHashDedup(all, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 2) != (b % 2) }.toSet
    assert(cross == self, s"cross=$cross self=$self")
  }

  test("simhash: identical docs equal, token order irrelevant, signature in 32 bits") {
    val df = Seq((0L, "a b c"), (1L, "c b a"), (2L, "q r s t u v")).toDF("doc_id", "text")
    val out = Dedup.simHash(df, "doc_id", "text").orderBy("id").collect()
      .map(_.getLong(1))
    assert(out(0) == out(1))               // bag-of-words: order-insensitive
    assert(out(0) != out(2))
    assert(out.forall(v => v >= 0 && v <= 0xFFFFFFFFL))
  }

  test("shingles guard: docs shorter than n yield empty array, not a crash") {
    val df = Seq((0L, "a b"), (1L, "a b c")).toDF("doc_id", "text")
    val sh = df.select(TextAnalysis.shingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).isEmpty && sh(1) == Seq("a_b_c"))
  }

  test("fused simhash equals the explode + 32-vote-sum aggregation on fixture docs") {
    val spark = TestSpark.spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(200)
      .union(Seq((99991L, "   "), (99992L, "one token")).toDF("doc_id", "text"))
    val fused = Dedup.simHash(docs, "doc_id", "text")
    // the pre-fusion reference plan, kept verbatim
    val words = docs
      .select(col("doc_id").as("id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .select(col("id"), conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long").as("h"))
    val votes = (0 until 32).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b"))
    val sums = words.groupBy("id").agg(votes.head, votes.tail: _*)
    val sig = (0 until 32)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val ref = sums.select(col("id"), sig.as("simhash"))
    assert(fused.count() == ref.count()) // all-space doc dropped by BOTH
    assert(fused.as("f").join(ref.as("r"),
      col("f.id") === col("r.id") && col("f.simhash") === col("r.simhash"))
      .count() == ref.count())
    // per-row kernel: no exchange in the signature plan
    val plan = Dedup.simHash(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // narrower widths stay supported: a 8-bit signature fits in 8 bits and
    // is the low byte's votes only
    val narrow = Dedup.simHash(corpus, "doc_id", "text", bits = 8)
      .collect().map(_.getLong(1))
    assert(narrow.forall(s => s >= 0 && s < 256))
  }

  test("fused minhash signature equals the explode + k-min aggregation on fixture docs") {
    val spark = TestSpark.spark
    val k = 12
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    val fused = Dedup.minHashSignature(docs, "doc_id", "text", n = 3, k = k)
    // the pre-fusion reference plan, kept verbatim: hashed shingles via the
    // composable chain, explode, k universal-hash minima through a groupBy
    val shRef = docs.select(col("doc_id").as("id"),
        array_sort(transform(TextAnalysis.shingles(col("text"), 3),
          s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))).as("sh"))
      .filter(size(col("sh")) > 0)
    val inv = shRef.select(col("id"), explode(col("sh")).as("h64"))
      .select(col("id"), shiftright(col("h64"), 32).as("h"))
    val mins = Dedup.hashConsts(k).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % Dedup.HashP).as(s"h$i")
    }
    val ref = inv.groupBy("id").agg(mins.head, mins.tail: _*)
    val joined = fused.as("f").join(ref.as("r"), col("f.id") === col("r.id"))
    assert(joined.count() == shRef.count())
    val mismatched = (0 until k).map(i =>
        joined.filter(col(s"f.h$i") =!= col(s"r.h$i")).count()).sum
    assert(mismatched == 0)
    // and the fused signature frame plans with NO exchange: per-row map
    // only (asserted without the test's limit — GlobalLimit adds its own
    // SinglePartition exchange)
    val plan = Dedup.minHashSignature(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text", n = 3, k = k)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("hot-shingle guard: blocked routing leaves the output bit-identical") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // a 12-token boilerplate sentence in 50% of docs (its 10 shingles are
    // hot) plus short unique tails: boilerplate pairs share ~10 of ~18
    // shingles (J ≈ 0.38), driven entirely by the HOT shingles
    val boiler = "all rights reserved contact us for details terms apply see legal page"
    val docs = (0 until 60).map { i =>
      val tail = (0 until 8).map(_ => s"w${rnd.nextInt(400)}").mkString(" ")
      (i.toLong, if (i % 2 == 0) s"$boiler $tail" else tail)
    }.toDF("doc_id", "text")
    val guarded = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.3, hotDf = 5, hotBlocks = 4, hotSampleFraction = 1.0)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val unguarded = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.3, hotDf = Long.MaxValue)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(guarded == unguarded)
    assert(guarded.nonEmpty, "boilerplate-heavy docs should pair up")
  }

  test("hot-shingle guard: pairs sharing ONLY hot shingles still surface") {
    val spark = TestSpark.spark
    import spark.implicits._
    // identical boilerplate documents + one unique token each: every shared
    // shingle exceeds the df cap, so the cold index alone would MISS every
    // pair — the blocked hot join must find them, exactly
    val docs = (0 until 20).map(i =>
      (i.toLong, s"this exact template repeats in every single document u$i"))
      .toDF("doc_id", "text")
    val guarded = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, hotDf = 3, hotBlocks = 4, hotSampleFraction = 1.0)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val unguarded = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, hotDf = Long.MaxValue)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(guarded == unguarded)
    assert(guarded.size == 20 * 19 / 2, "all template pairs must be found")
  }

  test("withShingleCache releases operator caches on scope exit, keeps others") {
    val spark = TestSpark.spark
    spark.catalog.clearCache()
    // all comparisons are RELATIVE to this baseline: a previous suite's
    // async unpersist landing mid-test must not flake the counts
    val before = spark.sparkContext.getPersistentRDDs.keySet
    def newIds = spark.sparkContext.getPersistentRDDs.keySet -- before
    // an UNRELATED cache the scope must not evict (clearCache would)
    val unrelated = corpus.persist()
    unrelated.count()
    val unrelatedIds = newIds
    assert(unrelatedIds.size == 1, unrelatedIds.toString)
    try {
      val nPairs = Dedup.withShingleCache {
        val n = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3,
          threshold = 0.3).count()
        // inside the scope: the operator's shingle frame is materialized
        assert(newIds.size >= 2)
        n
      }
      assert(nPairs == 3)
      // after the scope: only the unrelated cache remains (exit unpersists
      // blocking, so the release is immediately observable)
      assert(newIds == unrelatedIds, newIds.toString)
      // nesting: the inner scope's minHashDedup persists the SAME canonical
      // shingle plan the outer jaccardPairs cached — CacheManager shares
      // one entry, so the inner exit must NOT evict it out from under the
      // outer scope (the refcount-by-plan rule); the outer exit releases it
      Dedup.withShingleCache {
        Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.3).count()
        Dedup.withShingleCache {
          Dedup.minHashDedup(corpus, "doc_id", "text").count()
        }
        assert((newIds -- unrelatedIds).size == 1, newIds.toString)
      }
      assert(newIds == unrelatedIds, newIds.toString)
    } finally unrelated.unpersist(true)
  }

  // 13 tokens — exactly one 13-gram of its own, present wherever planted
  private val plantedPara =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike"

  test("decontamination catches a planted eval paragraph and only that") {
    val corpus = Seq(
      (0L, s"some leading words $plantedPara and then a trailing sentence"),
      (1L, "a long unrelated document containing thirteen plus tokens but " +
        "none of them forming any overlapping gram with the evaluation set"),
    ).toDF("doc_id", "text")
    val eval = Seq((100L, s"question intro $plantedPara answer outro"))
      .toDF("eval_id", "text")
    val out = Dedup.contaminatedDocs(corpus, "doc_id", "text", eval, "text",
      n = 13).collect()
    // doc 0 is flagged (the planted paragraph yields shared 13-grams:
    // every window spanning it within both texts); doc 1 is clean
    assert(out.map(_.getLong(0)).toSeq == Seq(0L))
    assert(out.head.getLong(1) >= 1L)
  }

  test("decontamination shuffle fallback equals the broadcast form") {
    val corpus = Seq(
      (0L, s"x y $plantedPara z w"),
      (1L, s"$plantedPara tail words here"),
      (2L, "nothing shared with the eval set in this document at all really"),
    ).toDF("doc_id", "text")
    val eval = Seq((0L, plantedPara)).toDF("eid", "text")
    val b = Dedup.contaminatedDocs(corpus, "doc_id", "text", eval, "text",
      n = 13, broadcastEval = true).orderBy("doc_id").collect().toSeq
    val s = Dedup.contaminatedDocs(corpus, "doc_id", "text", eval, "text",
      n = 13, broadcastEval = false).orderBy("doc_id").collect().toSeq
    assert(b == s)
    assert(b.map(_.getLong(0)) == Seq(0L, 1L))
    // the eval paragraph alone has exactly one 13-gram; each corpus doc
    // shares exactly that one
    assert(b.map(_.getLong(1)) == Seq(1L, 1L))
  }

  test("contaminatedDocsBloom: identical answer to the broadcast-exact form") {
    val planted = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    val corpus = Seq(
      (0L, s"prefix words then $planted and a suffix"),
      (1L, s"$planted tail words here"),
      (2L, "nothing shared with the eval set in this document at all really"),
    ).toDF("doc_id", "text")
    val eval = Seq((0L, planted)).toDF("eid", "text")
    val exact = Dedup.contaminatedDocs(corpus, "doc_id", "text", eval, "text",
      n = 13).orderBy("doc_id").collect().toSeq
    val viaBloom = Dedup.contaminatedDocsBloom(corpus, "doc_id", "text",
      eval, "text", n = 13, expectedGrams = 1024, numBits = 8192)
    assert(viaBloom.orderBy("doc_id").collect().toSeq == exact)
    // the prefilter is really in the plan: a bloom scalar subquery feeding
    // might_contain on the corpus-gram side
    val plan = viaBloom.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(plan.contains("bloom_filter_agg"), plan)

    // an UNDERSIZED filter (high FPR) stays correct — the exact join
    // removes every false positive
    val tiny = Dedup.contaminatedDocsBloom(corpus, "doc_id", "text",
      eval, "text", n = 13, expectedGrams = 2, numBits = 64)
      .orderBy("doc_id").collect().toSeq
    assert(tiny == exact)
  }

  test("paragraphDedup keeps first occurrence and reassembles byte-exact") {
    // window = 2 tokens: doc 0 = [a b][c d], doc 1 = [c d][e f] (its first
    // paragraph repeats doc 0's second), doc 2 = [a b][c d] (all repeated)
    val df = Seq(
      (0L, "a b c d"),
      (1L, "c d e f"),
      (2L, "a b c d"),
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(df, "doc_id", "text", window = 2)
      .orderBy("doc_id").collect()
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // (doc_id, n_paras, n_kept, kept_toks, kept_fp)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ==
      Seq((0L, 2L, 2L, 4L), (1L, 2L, 1L, 2L), (2L, 2L, 0L, 0L)))
    assert(out(0).getString(4) == md5Hex("a b c d"))
    assert(out(1).getString(4) == md5Hex("e f")) // survivor stitched alone
    assert(out(2).getString(4) == md5Hex(""))    // fully-deduped doc kept
  }

  test("paragraphDedup within-doc repeats keep only the earliest position") {
    val df = Seq((7L, "x y x y x y")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(df, "doc_id", "text", window = 2).collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((3L, 1L, 2L)))
  }

  test("paragraphDedup short tail paragraph dedups independently") {
    // window 3: doc 0 = [a b c][d], doc 1 = [d] [?] — doc 1's whole text is
    // the 1-token paragraph "d", equal to doc 0's TAIL chunk
    val df = Seq((0L, "a b c d"), (1L, "d")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(df, "doc_id", "text", window = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((0L, 2L), (1L, 0L)))
  }

  test("contaminationReport: fraction ranks severity; full containment = 1e6 ppm") {
    val eval = Seq((100L, (1 to 20).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "text")
    val full = (1 to 20).map(i => s"e$i").mkString(" ")
    val part = ((1 to 16).map(i => s"e$i") ++ (1 to 20).map(i => s"x$i"))
      .mkString(" ")
    val clean = (1 to 30).map(i => s"c$i").mkString(" ")
    val corpus = Seq((1L, full), (2L, part), (3L, clean))
      .toDF("doc_id", "text")
    val rep = Dedup.contaminationReport(corpus, "doc_id", "text",
        eval, "text", n = 13)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rep(1L)._3 == 1000000L)                     // identical doc
    // 36 tokens -> 24 grams, 4 inside the eval prefix -> 4/24
    assert(rep(2L) == ((4L, 24L, 166666L)), rep(2L).toString)
    assert(!rep.contains(3L))                          // clean doc absent
  }

  test("resolveByScore keeps the highest-quality member per group, tie -> lowest id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val scores = Seq((1L, 50L), (2L, 90L), (3L, 90L), (10L, 5L), (11L, 5L),
      (99L, 77L) /* not in any pair — must not appear */)
      .toDF("doc_id", "s")
    val out = Dedup.resolveByScore(pairs, scores, "doc_id", "s")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // {1,2,3}: 2 and 3 tie at 90 -> keep 2 (lowest id among maxima);
    // {10,11}: all tie -> keep 10; 99 is a singleton, absent (q25 contract)
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (3L, 1L, 2L, false),
      (10L, 10L, 10L, true), (11L, 10L, 10L, false)))
  }

  test("minHashAccuracy: identical docs estimate 1.0 exactly; estimate stays in [0,1]") {
    val df = Seq(
      (0L, "a b c d e f g"), (1L, "a b c d e f g"),   // identical
      (2L, "a b c d e f x"),                          // near-dup of 0/1
      (3L, "z y x w v u t")                           // unrelated
    ).toDF("doc_id", "text")
    val out = Dedup.minHashAccuracy(df, "doc_id", "text", n = 3, k = 12, rowsPerBand = 3)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val exactPair = out.find(t => t._1 == 0L && t._2 == 1L)
    assert(exactPair.isDefined, s"identical docs must band-collide: ${out.toSeq}")
    assert(exactPair.get._3 == 12L && exactPair.get._4 == 1000000L && exactPair.get._5 == 1.0)
    out.foreach { case (_, _, nMatch, ppm, jac) =>
      assert(nMatch >= 0L && nMatch <= 12L)
      assert(ppm == nMatch * 1000000L / 12L)
      assert(jac >= 0.0 && jac <= 1.0)
    }
  }

  test("minHashAccuracy reports the candidates minHashDedup would cut (no threshold)") {
    // two docs sharing ~half their shingles: banded candidates at some
    // bands, but true jaccard may fall below a high dedup threshold — the
    // accuracy report must still show the pair (the estimator's miss is
    // the datum)
    val df = Seq(
      (0L, "a b c d e f g h"), (1L, "a b c d m n o p")
    ).toDF("doc_id", "text")
    val acc = Dedup.minHashAccuracy(df, "doc_id", "text").collect()
    val strict = Dedup.minHashDedup(df, "doc_id", "text", threshold = 0.9).collect()
    if (acc.nonEmpty) {
      assert(strict.isEmpty)                     // the 0.9 cut drops the pair...
      assert(acc.head.getDouble(4) < 0.9)        // ...which the report keeps, with truth
    }
  }

  test("decontaminate drops exactly the paragraph containing the eval n-gram, stitches the rest") {
    // doc 0: three 5-token paragraphs; the middle one quotes the eval doc
    val corpus = Seq(
      (0L, "a1 a2 a3 a4 a5 q1 q2 q3 q4 q5 b1 b2 b3 b4 b5"),
      (1L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")  // clean
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, "x0 q1 q2 q3 q4 q5 x1")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, "doc_id", "text", eval_, "text",
        n = 5, window = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out(0)._2 == 3L && out(0)._3 == 2L && out(0)._4 == 10L)
    // reassembly is byte-exact: survivors in order, single-space joined
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s2: String) = md.digest(s2.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(out(0)._5 == h("a1 a2 a3 a4 a5 b1 b2 b3 b4 b5"))
    assert(out(1)._2 == 2L && out(1)._3 == 2L)          // clean doc untouched
    assert(out(1)._5 == h("c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"))
  }

  test("decontaminate: paragraphs shorter than n are never dropped") {
    val corpus = Seq((0L, "q1 q2 q3")).toDF("doc_id", "text")   // 3 < n=5
    val eval_ = Seq((1L, "q1 q2 q3 q4 q5")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, "doc_id", "text", eval_, "text",
        n = 5, window = 5).collect()
    assert(out.head.getLong(2) == 1L)   // kept — no full 5-gram to match
  }

  test("dupRateByGroup: planted duplicates land in the right group's ppm") {
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon", "dirty"),
      (1L, "alpha beta gamma delta epsilon", "dirty"),   // exact dup of 0
      (2L, "one two three four five six", "dirty"),      // clean
      (3L, "seven eight nine ten eleven", "clean"),
      (4L, "twelve thirteen fourteen fifteen sixteen", "clean"),
    ).toDF("doc_id", "text", "source")
    val out = Dedup.dupRateByGroup(df, "doc_id", "text", "source",
        threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("clean", 2L, 0L, 0L),
      ("dirty", 3L, 2L, 2L * 1000000L / 3L)))
  }

  test("decontaminationMatrix: full grid with exact-zero cells, ppm exact") {
    def words(tag: String) = (1 to 13).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      (0L, words("a"), "web"),    // contaminated vs benchmark A only
      (1L, words("x"), "web"),    // clean
      (2L, words("b"), "books"),  // contaminated vs benchmark B only
    ).toDF("doc_id", "text", "source")
    val benchA = Seq(Tuple1(words("a"))).toDF("text")
    val benchB = Seq(Tuple1(words("b"))).toDF("text")
    val out = Dedup.decontaminationMatrix(corpus, "doc_id", "text", "source",
        Seq("A" -> benchA, "B" -> benchB), "text", n = 13)
      .orderBy("source", "benchmark")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("books", "A", 1L, 0L, 0L),
      ("books", "B", 1L, 1L, 1000000L),
      ("web", "A", 2L, 1L, 500000L),
      ("web", "B", 2L, 0L, 0L)))
  }

  test("kmvSketch is the k smallest distinct 48-bit hashes (recomputed)") {
    val texts = (0 until 300).map(i => s"document number $i")
    val got = Dedup.kmvSketch(texts.toDF("text"), "text", k = 50)
      .collect().map(_.getLong(0)).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = texts.map { t =>
      val d = md.digest(t.toLowerCase.trim.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
        ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
    }.distinct.sorted.take(50)
    assert(got == expect)
  }

  test("kmvOverlapReport: identical corpora estimate Jaccard 1; estimator is exact-integer") {
    val texts = (0 until 400).map(i => s"doc $i").toDF("text")
    val r = Dedup.kmvOverlapReport(texts, texts, "text", k = 64).head
    val (k, kthA, estA) = (r.getAs[Long]("k"), r.getAs[Long]("kth_a"),
      r.getAs[Long]("est_a"))
    assert(k == 64L && estA == (63L * (1L << 48)) / kthA)
    assert(r.getAs[Long]("n_union") == 64L)
    assert(r.getAs[Long]("matches") == 64L)
    assert(r.getAs[Long]("jaccard_ppm") == 1000000L)
    assert(r.getAs[Long]("est_intersection") == r.getAs[Long]("est_union"))
    // the estimate should be in the right ballpark for 400 distinct
    assert(estA > 150L && estA < 1200L, s"est_a=$estA")
  }

  test("kmvOverlapReport: under-filled sketch reports EXACT counts, divides by actual size") {
    // corpus a has only 20 distinct values — far under k=64: the sketch IS
    // the complete distinct set, so est_a must be exactly 20, and the
    // Jaccard divisor must be the merged size, not the nominal k
    val a = (0 until 20).map(i => s"tiny $i").toDF("text")
    val r = Dedup.kmvOverlapReport(a, a, "text", k = 64).head
    assert(r.getAs[Long]("n_a") == 20L && r.getAs[Long]("est_a") == 20L)
    assert(r.getAs[Long]("n_union") == 20L && r.getAs[Long]("est_union") == 20L)
    assert(r.getAs[Long]("matches") == 20L)
    // matches/n_union = 1 exactly; the old matches/k rule would read 312500
    assert(r.getAs[Long]("jaccard_ppm") == 1000000L)
    assert(r.getAs[Long]("est_intersection") == 20L)
  }

  test("kmvOverlapMatrix: pairwise cells track true overlap structure") {
    // three sources: a and b share half their docs; c is disjoint
    val docs =
      (0 until 100).map(i => (s"shared $i", "a")) ++
      (0 until 100).map(i => (s"only-a $i", "a")) ++
      (0 until 100).map(i => (s"shared $i", "b")) ++
      (0 until 100).map(i => (s"only-b $i", "b")) ++
      (0 until 200).map(i => (s"only-c $i", "c"))
    val df = docs.toDF("text", "source")
    val rows = Dedup.kmvOverlapMatrix(df, "source", "text", k = 32)
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("jaccard_ppm")))
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val byPair = rows.map(t => (t._1, t._2) -> t._3).toMap
    // a-b truly overlap (J = 1/3); c is disjoint from both
    assert(byPair(("a", "c")) == 0L && byPair(("b", "c")) == 0L)
    assert(byPair(("a", "b")) > 100000L && byPair(("a", "b")) < 700000L,
      s"a-b jaccard_ppm = ${byPair(("a", "b"))}")
  }

  test("kmvOverlapMatrix: under-filled group gets exact counts; matrix equals the pairwise report") {
    val docs =
      (0 until 100).map(i => (s"shared $i", "a")) ++
      (0 until 100).map(i => (s"shared $i", "b")) ++
      (0 until 10).map(i => (s"shared $i", "tiny"))   // 10 < k = 32
    val df = docs.toDF("text", "source")
    val byPair = Dedup.kmvOverlapMatrix(df, "source", "text", k = 32)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val at = byPair(("a", "tiny"))
    assert(at.getAs[Long]("n_b") == 10L && at.getAs[Long]("est_b") == 10L)
    // tiny ⊂ a, so every merged-sketch hash present in tiny is a match;
    // the union sketch is a's bottom-32 ∪ tiny = still 32 of a's hashes
    assert(at.getAs[Long]("n_union") == 32L)
    // and the under-filled pair cell agrees with the two-corpus report
    val rep = Dedup.kmvOverlapReport(
      df.filter(col("source") === "a").select("text"),
      df.filter(col("source") === "tiny").select("text"), "text", k = 32).head
    assert(at.getAs[Long]("matches") == rep.getAs[Long]("matches"))
    assert(at.getAs[Long]("jaccard_ppm") == rep.getAs[Long]("jaccard_ppm"))
  }

  test("kmvOverlapMatrix: the per-group cut is two-stage (no one-task-per-source funnel)") {
    val df = (0 until 200).map(i => (s"doc $i", s"s${i % 3}")).toDF("text", "source")
    val plan = Dedup.kmvOverlapMatrix(df, "source", "text", k = 8)
      .queryExecution.executedPlan.toString
    // the pre-cut window partitions by (grp, scan_pid): every window over
    // the corpus-sized distinct-hash table carries the scan-partition key,
    // so no task ever holds more than its own partition's rows for a group
    assert(plan.contains("scan_pid"), plan)
  }

  test("kmvOverlapReport: disjoint corpora estimate Jaccard 0") {
    val a = (0 until 300).map(i => s"alpha $i").toDF("text")
    val b = (0 until 300).map(i => s"beta $i").toDF("text")
    val r = Dedup.kmvOverlapReport(a, b, "text", k = 50).head
    assert(r.getAs[Long]("matches") == 0L &&
      r.getAs[Long]("jaccard_ppm") == 0L &&
      r.getAs[Long]("est_intersection") == 0L)
  }
}
