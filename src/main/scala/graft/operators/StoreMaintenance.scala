package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** THRESHOLD-DRIVEN maintenance for the persisted stores — the policy
  * loop an operator schedules instead of babysitting compaction by hand
  * (every LSM store ships one; this is the lakehouse-side equivalent of
  * auto-compaction). One call inspects the store's cheap health signals
  * and applies the SMALLEST sufficient verb:
  *
  *  - **live directory legs > `maxSegments`** → VACUUM (major
  *    compaction): every append since the first manifest added a segment,
  *    and a search plan unions one scan per live leg — fine at tens,
  *    pointless at thousands ([[StoreSegments.vacuum]]'s contract);
  *  - **else tombstoned ids > `maxTombstones`** → COMPACT (minor): drain
  *    the delete queue by rewriting only the affected partitions;
  *  - **else** → NONE. Maintenance that isn't due costs two driver-side
  *    manifest reads and one scan of the churn-bounded tombstone dir —
  *    nothing touches a data path, so the PROBE is as cheap at 100 TB as
  *    on a fixture. Only the verb it decides to run pays data costs, and
  *    those are the verbs' own documented bills.
  *
  * Vacuum subsumes compact (the compound vacuum verbs drain tombstones
  * first), so when both thresholds trip one vacuum settles both.
  *
  * Returns a one-row receipt `(store, action, n_tombstones, n_live_legs)`
  * — the decision and the signals it was made from. The verbs themselves
  * run under the store write lock; the probe is advisory (the caller IS
  * the single writer by the lock discipline).
  *
  * Reference scope note: the reference's SDFS has no compaction to
  * schedule (append-only replicas, `Nimbus.go` placement); this policy
  * exists for the stores this library adds on top.
  */
object StoreMaintenance {

  private def tombstoneCount(spark: SparkSession, dir: String,
                             idCol: String): Long =
    StoreFs.tombstoneIds(spark, s"$dir/tombstones", idCol)
      .map(_.count()).getOrElse(0L)

  /** Max live directory legs across the store's segmented components —
    * the union-width a reader's plan pays. Classic layout = one leg.
    */
  private def liveLegs(spark: SparkSession, dir: String,
                       comps: Seq[String]): Long =
    comps.map { c =>
      StoreSegments.entries(spark, dir, c)
        .map(_.count(!_.dropAll).toLong).getOrElse(1L)
    }.max

  private def receipt(spark: SparkSession, store: String, action: String,
                      nTomb: Long, nLegs: Long): DataFrame = {
    val sp = spark
    import sp.implicits._
    Seq((store, action, nTomb, nLegs))
      .toDF("store", "action", "n_tombstones", "n_live_legs")
  }

  private def decide(nLegs: Long, maxSegments: Int, nTomb: Long,
                     maxTombstones: Long): String =
    if (nLegs > maxSegments) "vacuum"
    else if (nTomb > maxTombstones) "compact"
    else "none"

  /** Maintain a [[Similarity.buildIvfIndex]] store (raw or PQ — shared
    * postings layout). Defaults: any tombstone is worth a (cell-scoped)
    * drain; more than 8 live legs is worth a consolidation.
    */
  def maintainIvfIndex(spark: SparkSession, dir: String,
                       maxSegments: Int = 8,
                       maxTombstones: Long = 0): DataFrame = {
    val nTomb = tombstoneCount(spark, dir, "id")
    val nLegs = liveLegs(spark, dir, Seq("postings"))
    val action = decide(nLegs, maxSegments, nTomb, maxTombstones)
    action match {
      case "vacuum" => Similarity.vacuumIvfIndex(spark, dir)
      case "compact" => Similarity.compactIvfIndex(spark, dir)
      case _ => ()
    }
    receipt(spark, dir, action, nTomb, nLegs)
  }

  /** [[maintainIvfIndex]] for the compressed store — same postings
    * contract, same verbs ([[Similarity.vacuumIvfPqIndex]] delegates).
    */
  def maintainIvfPqIndex(spark: SparkSession, dir: String,
                         maxSegments: Int = 8,
                         maxTombstones: Long = 0): DataFrame =
    maintainIvfIndex(spark, dir, maxSegments, maxTombstones)

  /** Maintain the DELTA-CHAIN snapshot store: when the chain above the
    * newest full snapshot has grown past `maxChain` deltas, write a
    * COMPACTION-POINT full (the reconstruction at the newest version,
    * materialized as `version = newest + 1` — exactly the manual move
    * q213's lifecycle makes), so every later read folds a short chain
    * again. The probe is a directory listing; the verb it may run costs
    * one reconstruction + one full write — reconstruction cost is WHY
    * the policy exists (it grows with chain length, and this bounds it).
    *
    * Receipt: `(store, action ∈ compact|none, n_tombstones = chain
    * length, n_live_legs = chain + 1 base)` — the same shape as the
    * index stores' receipts so one dashboard reads all five.
    */
  def maintainSnapshotStore(spark: SparkSession, rootDir: String,
                            idCol: String,
                            maxChain: Int = 8): DataFrame =
      // Probe + write under ONE write-lock acquisition (r14 advice): two
      // scheduled firings could otherwise both probe the same chain, both
      // decide 'compact', and the loser abort on writeSnapshot's
      // errorifexists instead of the idempotent no-op the cron pitch
      // promises. With the chain length re-read inside the lock, the
      // second firing sees the winner's fresh compaction point and
      // cleanly decides 'none'.
      StoreLock.withWriteLock(rootDir) {
    val fulls = Curation.snapshotVersions(rootDir)
    require(fulls.nonEmpty, s"no full snapshot under $rootDir — write first")
    val newestFull = fulls.max
    val deltas = Curation.deltaVersions(rootDir).filter(_ > newestFull)
    val newest = (newestFull +: deltas).max
    val chain = deltas.size.toLong
    val action = if (chain > maxChain) "compact" else "none"
    if (action == "compact")
      Curation.writeSnapshotUnlocked(
        Curation.readSnapshotAt(spark, rootDir, newest, idCol),
        rootDir, version = newest + 1)
    receipt(spark, rootDir, action, chain, chain + 1)
  }

  /** Maintain a [[TextAnalysis.buildTextIndex]] store. `buckets` is the
    * store's layout constant (the compact/vacuum verbs need it, exactly
    * as at build time).
    */
  def maintainTextIndex(spark: SparkSession, dir: String,
                        buckets: Int = 64, maxSegments: Int = 8,
                        maxTombstones: Long = 0): DataFrame = {
    val nTomb = tombstoneCount(spark, dir, "doc_id")
    val comps = Seq("postings", "terms", "docs", "stats") ++
      (if (StoreFs.exists(spark, s"$dir/positions")) Seq("positions")
       else Nil)
    val nLegs = liveLegs(spark, dir, comps)
    val action = decide(nLegs, maxSegments, nTomb, maxTombstones)
    action match {
      case "vacuum" => TextAnalysis.vacuumTextIndex(spark, dir, buckets)
      case "compact" => TextAnalysis.compactTextIndex(spark, dir, buckets)
      case _ => ()
    }
    receipt(spark, dir, action, nTomb, nLegs)
  }
}
