package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's `SparkSessionExtensions` hook — the injection point for
  * native functions (and, if ever needed, custom rules/strategies). Usable
  * two ways:
  *
  *  - programmatically: `SparkSession.builder().withExtensions(GraftExtensions.inject)`
  *    (what [[graft.GraftSession]] does);
  *  - by config: `spark.sql.extensions=graft.functions.GraftExtensions` on
  *    any cluster, no code changes — the standard deployment path
  *    (`ExtensionsSpec` exercises the reflective class contract).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftExtensions.inject(e)
}

object GraftExtensions {

  /** The single registration table: both the extensions inject and the
    * per-operator lazy registration (for foreign sessions) read it, so a
    * new function is added in exactly one place.
    */
  private val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", classOf[CosineSim],
      e => CosineSim(e.head, e(1))),
    ("graft_common", classOf[SortedIntersectCount],
      e => SortedIntersectCount(e.head, e(1))),
    ("graft_shingles64", classOf[HashedShingles],
      e => HashedShingles(e.head, e(1))),
    ("graft_rollfp", classOf[RollingFingerprint],
      e => RollingFingerprint(e.head, e(1), e(2))),
    ("graft_minhash", classOf[MinHashSig],
      e => MinHashSig(e.head, e(1))),
    ("graft_simhash", classOf[SimHashSig],
      e => SimHashSig(e.head, e(1))),
    ("graft_argmax_cosine", classOf[ArgMaxCosine],
      e => ArgMaxCosine(e.head, e(1))),
    ("graft_matvec_dots", classOf[MatVecDots],
      e => MatVecDots(e.head, e(1), e(2))),
    ("graft_quant8_report", classOf[Quant8Report],
      e => Quant8Report(e.head)),
    ("graft_quant8", classOf[Quant8Vec],
      e => Quant8Vec(e.head)),
    ("graft_heavy_hitters", classOf[HeavyHitters],
      e => HeavyHitters(e.head, e(1))),
    ("graft_cms", classOf[CountMinSketch],
      e => CountMinSketch(e.head, e(1), e(2))),
    ("graft_hll", classOf[HyperLogLogSketch],
      e => HyperLogLogSketch(e.head, e(1))),
    ("graft_nfc", classOf[NfcNormalize],
      e => NfcNormalize(e.head)),
    // Spark's own runtime-filter primitives, exposed to the text surface
    // (they exist in catalyst but are not SQL-registered): build a Bloom
    // filter over xxhash64 values / probe it. The probe's Bloom argument
    // must be foldable or a scalar subquery — the natural SQL form is
    //   might_contain((SELECT graft_bloom_agg(xxhash64(x), items, bits)
    //                  FROM ...), xxhash64(y)).
    // `Dedup.contaminatedDocsBloom` is the operator-library user.
    ("graft_bloom_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
      e => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        e.head, e(1), e(2))),
    ("graft_might_contain",
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain],
      e => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        e.head, e(1))),
  )

  def inject(e: SparkSessionExtensions): Unit =
    functions.foreach { case (name, cls, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), builder))
    }

  /** Idempotent per-session registration of one table entry — operators
    * call this so sessions NOT built with the extensions (e.g. a driver's
    * own) still resolve the function lazily.
    */
  def ensureRegistered(spark: SparkSession, name: String): Unit = {
    val ident = FunctionIdentifier(name)
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      val (_, cls, builder) = functions.find(_._1 == name).getOrElse(
        throw new IllegalArgumentException(s"unknown graft function: $name"))
      registry.registerFunction(ident,
        new ExpressionInfo(cls.getName, name), builder)
    }
  }
}
