package graft.operators

import org.apache.spark.sql.SparkSession

/** Filesystem plumbing shared by the persisted stores (IVF index,
  * inverted text index, snapshot store): existence probes for optional
  * components (tombstones), and the delete/replace verbs compaction's
  * partition swaps are built from. Hadoop `FileSystem`, never
  * `java.io.File` — the stores' pitch is the production path, and these
  * must work against an HDFS/S3 root exactly like the writes themselves
  * (same rule as [[Curation.snapshotVersions]]).
  */
private[graft] object StoreFs {

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p)
  }

  def delete(spark: SparkSession, path: String): Unit = {
    val (f, p) = fs(spark, path)
    if (f.exists(p)) f.delete(p, true)
  }

  def mkdirs(spark: SparkSession, path: String): Unit = {
    val (f, p) = fs(spark, path)
    f.mkdirs(p)
  }

  /** Atomically-enough swap: drop `dst` if present, then move `src` into
    * its place. A compacted bucket with NO surviving rows produces no
    * `src` directory — the delete alone is the correct result (the
    * bucket ceases to exist, exactly like a from-scratch build without
    * those rows).
    */
  def replace(spark: SparkSession, src: String, dst: String): Unit = {
    val (f, s) = fs(spark, src)
    val d = new org.apache.hadoop.fs.Path(dst)
    if (f.exists(d)) f.delete(d, true)
    if (f.exists(s)) {
      val parent = d.getParent
      if (parent != null && !f.exists(parent)) f.mkdirs(parent)
      require(f.rename(s, d), s"rename $src -> $dst failed")
    }
  }
}
