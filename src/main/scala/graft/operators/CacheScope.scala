package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped lifecycle for the caches the similarity/dedup operators create
  * internally ([[Dedup.jaccardPairs]]/[[Dedup.jaccardPairsPrefix]]/
  * [[Dedup.minHashDedup]] persist their hashed-shingle frame;
  * [[TextAnalysis.tfidfTopTerms]] its (doc, term) counts). Those operators
  * return LAZY frames, so they cannot unpersist before the caller's action
  * — and a long-lived session composing many pipelines would accumulate
  * MEMORY_AND_DISK entries until a global `spark.catalog.clearCache()`,
  * which also evicts every UNRELATED cache in the session.
  *
  * [[withCaches]] is the precise alternative: operator-internal persists
  * entered inside the scope are unpersisted (blocking, so the release is
  * observable) when the scope exits — nothing else in the session is
  * touched. Run the pipeline's ACTIONS inside the scope; a frame escaping
  * the scope lazily re-computes its shingles without the cache (correct,
  * just slower). Scopes nest (inner registrations release at the inner
  * exit) and are thread-confined: a pipeline built on another thread
  * belongs to that thread's scope.
  */
/** Lineage truncation for iterative operators ([[Dedup.canonicalIds]],
  * [[Bpe]]'s distributed merge loop): `localCheckpoint` by default — fast,
  * but stored on executors, so executor loss mid-iteration recomputes from
  * scratch — or a RELIABLE `checkpoint` to a fault-tolerant directory
  * (HDFS/object store) when the caller passes one, which is what a
  * long-running cluster job should do. ([[Similarity.kmeans]] needs
  * neither: its per-iteration state is the driver-side codebook, and every
  * iteration plans fresh from the input frame — no lineage ever chains.)
  */
private[operators] object Checkpoints {

  /** Truncate `df`'s lineage: reliable `checkpoint` under `dir` if set
    * (the SparkContext checkpoint dir is set on first use and left alone
    * if the caller already configured one elsewhere), else
    * `localCheckpoint`. `eager = false` defers materialization to the
    * caller's next action, the iterative-loop pattern.
    */
  def cut(df: DataFrame, dir: Option[String], eager: Boolean): DataFrame =
    dir match {
      case Some(d) =>
        val sc = df.sparkSession.sparkContext
        if (!sc.getCheckpointDir.contains(d)) sc.setCheckpointDir(d)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
}

object CacheScope {

  // stack of scopes, head = innermost
  private val active = new ThreadLocal[List[ArrayBuffer[DataFrame]]]

  /** Persist `df` (MEMORY_AND_DISK — similarity frames feed 2-3 plan
    * branches and can exceed memory at scale), registering it with the
    * innermost enclosing [[withCaches]] scope, if any.
    */
  private[graft] def persisted(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    val stack = active.get()
    if (stack != null && stack.nonEmpty) stack.head += p
    p
  }

  /** Run `body`; every operator-internal persist created inside (on this
    * thread) is unpersisted when it returns or throws.
    *
    * Same-plan subtlety: Spark's CacheManager keys entries by CANONICAL
    * PLAN, not by DataFrame — two operators shingling the same input
    * produce one shared entry, and unpersisting either reference drops it
    * for both. So a scope's exit skips any frame whose plan an ENCLOSING
    * scope also registered: the inner scope releases only what the outer
    * doesn't still need, and the outer exit performs the real release.
    */
  def withCaches[T](body: => T): T = {
    val outer = Option(active.get()).getOrElse(Nil)
    val mine = ArrayBuffer.empty[DataFrame]
    active.set(mine :: outer)
    try body
    finally {
      if (outer.isEmpty) active.remove() else active.set(outer)
      val enclosing = outer.flatten
      mine.foreach { df =>
        val plan = df.queryExecution.analyzed
        val sharedWithOuter =
          enclosing.exists(_.queryExecution.analyzed.sameResult(plan))
        if (!sharedWithOuter) df.unpersist(blocking = true)
      }
    }
  }
}
