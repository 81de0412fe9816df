package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's `SparkSessionExtensions` hook — the injection point for
  * native functions (and, if ever needed, custom rules/strategies). Usable
  * two ways:
  *
  *  - programmatically: `SparkSession.builder().withExtensions(GraftExtensions.inject)`
  *    (what [[graft.GraftSession]] does);
  *  - by config: `spark.sql.extensions=graft.functions.GraftExtensions` on
  *    any cluster, no code changes — the standard deployment path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftExtensions.inject(e)
}

object GraftExtensions {
  def inject(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_common"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_common"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_shingles64"),
      new ExpressionInfo(classOf[HashedShingles].getName, "graft_shingles64"),
      (exprs: Seq[Expression]) => HashedShingles(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_rollfp"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_rollfp"),
      (exprs: Seq[Expression]) => RollingFingerprint(exprs.head, exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashSig].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => SimHashSig(exprs.head)))
  }
}
