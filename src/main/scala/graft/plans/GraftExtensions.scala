package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{AdcDistance, BandBuckets, HilbertIndex, HllCard, HllInit, HllMaxAgg, SignedProjection, LongArrayAgreement, MatVecCenter, MinHashSignature, OuterProduct, RepetitionStats, SignBuckets, SimHash64, TokenStats, VectorDot, Winnow, WordNgrams, WordShingles}

/** Session extensions registering graft's native expressions as SQL
  * functions. Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (see Verify/Bench/test session builders), then call via `expr(...)`:
  *
  *  - `graft_minhash(shingles, k)` → array<bigint> signature
  *  - `graft_simhash(tokens)` → bigint
  *  - `graft_signbuckets(embedding, bands, bitsPerBand)` → array<bigint>
  *  - `graft_dot(a, b)` → double
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def dblLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) =>
        MinHashSignature(children.head, intLit(children(1), "numHashes"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_signbuckets"),
      new ExpressionInfo(classOf[SignBuckets].getName, "graft_signbuckets"),
      (children: Seq[Expression]) => SignBuckets(children.head,
        intLit(children(1), "bands"), intLit(children(2), "bitsPerBand"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) =>
        WordShingles(children.head, intLit(children(1), "n"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_ngrams"),
      (children: Seq[Expression]) =>
        WordNgrams(children.head, intLit(children(1), "n"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bandbuckets"),
      new ExpressionInfo(classOf[BandBuckets].getName, "graft_bandbuckets"),
      (children: Seq[Expression]) =>
        BandBuckets(children.head, intLit(children(1), "bands"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
      (children: Seq[Expression]) =>
        HilbertIndex(children.head, children(1),
          intLit(children(2), "bits"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_eqfrac"),
      new ExpressionInfo(classOf[LongArrayAgreement].getName, "graft_eqfrac"),
      (children: Seq[Expression]) =>
        LongArrayAgreement(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_repstats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "graft_repstats"),
      (children: Seq[Expression]) =>
        RepetitionStats(children.head, intLit(children(1), "n"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_tokstats"),
      new ExpressionInfo(classOf[TokenStats].getName, "graft_tokstats"),
      (children: Seq[Expression]) =>
        TokenStats(children.head, strLit(children(1), "stopCsv"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
      (children: Seq[Expression]) => Winnow(children.head,
        intLit(children(1), "k"), intLit(children(2), "w"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_adc"),
      new ExpressionInfo(classOf[AdcDistance].getName, "graft_adc"),
      (children: Seq[Expression]) =>
        AdcDistance(children.head, children(1), intLit(children(2), "ksub"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "graft_dot"),
      (children: Seq[Expression]) => VectorDot(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_outerprod"),
      new ExpressionInfo(classOf[OuterProduct].getName, "graft_outerprod"),
      (children: Seq[Expression]) =>
        OuterProduct(children.head, dblLit(children(1), "scale"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_matveccenter"),
      new ExpressionInfo(classOf[MatVecCenter].getName, "graft_matveccenter"),
      (children: Seq[Expression]) =>
        MatVecCenter(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_rproject"),
      new ExpressionInfo(classOf[SignedProjection].getName, "graft_rproject"),
      (children: Seq[Expression]) =>
        SignedProjection(children.head, intLit(children(1), "dOut"))))
    // packed HLL register vectors (HyperANF propagation shape):
    // init one contribution, max-merge as a partial-aggregable
    // aggregate, read the exact estimate precursors back out
    ext.injectFunction((
      new FunctionIdentifier("graft_hllinit"),
      new ExpressionInfo(classOf[HllInit].getName, "graft_hllinit"),
      (children: Seq[Expression]) =>
        HllInit(children.head, children(1), intLit(children(2), "m"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_hllmax"),
      new ExpressionInfo(classOf[HllMaxAgg].getName, "graft_hllmax"),
      (children: Seq[Expression]) => HllMaxAgg(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_hllcard"),
      new ExpressionInfo(classOf[HllCard].getName, "graft_hllcard"),
      (children: Seq[Expression]) => HllCard(children.head)))
  }
}
