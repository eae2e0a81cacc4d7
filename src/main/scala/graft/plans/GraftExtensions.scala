package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayDotProduct, HllAgg, HllEstimate, MinhashSignature, Mix64, PolyHash64, QhistAgg, QhistQuantile, QhistQuantileUb, SimHash64}

/** `SparkSessionExtensions` injection point — makes the engine's native
  * Catalyst expressions first-class SQL functions, so plan text (static
  * `.plan(…)` or dynamic control-plane plans) can call them without any
  * DataFrame-side helper:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT array_dot(embedding, embedding) FROM embeddings")
  * }}}
  *
  * Spark's own extension mechanism (the reference has no analogue — its
  * extensions are Siddhi `FunctionExecutor`s registered per runtime,
  * SiddhiCEP.java:201-206; ours land in the Catalyst function registry
  * and participate in codegen like built-ins).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    // whole-operator integration: the MATCH_RECOGNIZE planner strategy
    // (the MatchRecognize builder also self-registers on first use via
    // experimental.extraStrategies for sessions built without extensions)
    ext.injectPlannerStrategy(_ => MatchRecognizeStrategy)
    // `spark.sql("pattern: …")` — the CEP dialect as a first-class
    // statement (same text as env.plan and the control plane)
    ext.injectParser((session, delegate) =>
      new GraftSqlParser(delegate, session))
  }
}

object GraftExtensions {

  /** `array_dot(a, b)` — codegen'd sequential-fold dot product. */
  val arrayDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "array_dot takes exactly 2 arguments")
      ArrayDotProduct(children.head, children(1))
    })

  /** `graft_simhash(text)` — 64-bit SimHash fingerprint. */
  val simhash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_simhash takes exactly 1 argument")
      SimHash64(children.head)
    })

  /** `graft_fingerprint(text)` — polynomial rolling hash. */
  val fingerprint: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_fingerprint"),
    new ExpressionInfo(classOf[PolyHash64].getName, "graft_fingerprint"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_fingerprint takes exactly 1 argument")
      PolyHash64(children.head)
    })

  /** `graft_minhash(text, shingleK, numHashes)` — MinHash signature
    * (k and n must be integer literals: they shape the output array).
    */
  val minhash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "graft_minhash takes (text, shingleK, numHashes)")
      def intLit(e: Expression, what: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_minhash: $what must be an integer literal, got $other")
      }
      MinhashSignature(children.head, intLit(children(1), "shingleK"),
        intLit(children(2), "numHashes"))
    })

  /** `graft_qhist(longCol)` — mergeable quantile histogram aggregate. */
  val qhist: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_qhist"),
    new ExpressionInfo(classOf[QhistAgg].getName, "graft_qhist"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_qhist takes exactly 1 argument")
      QhistAgg(children.head).toAggregateExpression()
    })

  /** `graft_qhist_quantile(hist, q)` — quantile lower bound. */
  val qhistQuantile: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_qhist_quantile"),
    new ExpressionInfo(classOf[QhistQuantile].getName, "graft_qhist_quantile"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "graft_qhist_quantile takes (hist, q)")
      QhistQuantile(children.head, children(1))
    })

  /** `graft_qhist_quantile_ub(hist, q)` — EXCLUSIVE quantile-bucket
    * upper bound (band-gate cut; see `Quantiles.quantileUbEval`).
    */
  val qhistQuantileUb: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_qhist_quantile_ub"),
    new ExpressionInfo(classOf[QhistQuantileUb].getName,
      "graft_qhist_quantile_ub"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "graft_qhist_quantile_ub takes (hist, q)")
      QhistQuantileUb(children.head, children(1))
    })

  /** `graft_hll(longCol[, p])` — mergeable HLL distinct sketch. */
  val hll: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hll"),
    new ExpressionInfo(classOf[HllAgg].getName, "graft_hll"),
    (children: Seq[Expression]) => {
      require(children.length == 1 || children.length == 2,
        "graft_hll takes (value[, p])")
      val p = children.lift(1).map {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_hll: p must be an integer literal, got $other")
      }.getOrElse(graft.functions.Hll.DefaultP)
      HllAgg(children.head, p).toAggregateExpression()
    })

  /** `graft_hll_estimate(regs)` — rounded cardinality estimate. */
  val hllEstimate: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hll_estimate"),
    new ExpressionInfo(classOf[HllEstimate].getName, "graft_hll_estimate"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_hll_estimate takes exactly 1 argument")
      HllEstimate(children.head)
    })

  private def intLitOr(e: Option[Expression], what: String, dflt: Int): Int =
    e.map {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }.getOrElse(dflt)

  /** `graft_cm(value[, depth, width])` — mergeable Count-Min sketch. */
  val cm: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cm"),
    new ExpressionInfo(classOf[graft.functions.CountMinAgg].getName, "graft_cm"),
    (children: Seq[Expression]) => {
      require(children.length >= 1 && children.length <= 3,
        "graft_cm takes (value[, depth, width])")
      graft.functions.CountMinAgg(children.head,
        intLitOr(children.lift(1), "graft_cm: depth",
          graft.functions.CountMin.DefaultDepth),
        intLitOr(children.lift(2), "graft_cm: width",
          graft.functions.CountMin.DefaultWidth)).toAggregateExpression()
    })

  /** `graft_cm_estimate(counts, value[, depth])` — frequency estimate. */
  val cmEstimate: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cm_estimate"),
    new ExpressionInfo(classOf[graft.functions.CmEstimate].getName,
      "graft_cm_estimate"),
    (children: Seq[Expression]) => {
      require(children.length == 2 || children.length == 3,
        "graft_cm_estimate takes (counts, value[, depth])")
      graft.functions.CmEstimate(children.head, children(1),
        intLitOr(children.lift(2), "graft_cm_estimate: depth",
          graft.functions.CountMin.DefaultDepth))
    })

  /** `graft_bloom(value[, mBits, k])` — mergeable bloom filter. */
  val bloom: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom"),
    new ExpressionInfo(classOf[graft.functions.BloomAgg].getName, "graft_bloom"),
    (children: Seq[Expression]) => {
      require(children.length >= 1 && children.length <= 3,
        "graft_bloom takes (value[, mBits, k])")
      graft.functions.BloomAgg(children.head,
        intLitOr(children.lift(1), "graft_bloom: mBits",
          graft.functions.Bloom.DefaultBits),
        intLitOr(children.lift(2), "graft_bloom: k",
          graft.functions.Bloom.DefaultK)).toAggregateExpression()
    })

  /** `graft_bloom_contains(bits, value[, k])` — membership probe. */
  val bloomContains: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_contains"),
    new ExpressionInfo(classOf[graft.functions.BloomMightContain].getName,
      "graft_bloom_contains"),
    (children: Seq[Expression]) => {
      require(children.length == 2 || children.length == 3,
        "graft_bloom_contains takes (bits, value[, k])")
      graft.functions.BloomMightContain(children.head, children(1),
        intLitOr(children.lift(2), "graft_bloom_contains: k",
          graft.functions.Bloom.DefaultK))
    })

  /** `graft_mix64(longCol)` — splitmix64 avalanche finalizer: the hash
    * stream behind every deterministic sampling / splitting predicate
    * (`WHERE (graft_mix64(id + salt) >> 12) % 1000 < rate`). Salt per
    * use-site so composed predicates stay decorrelated.
    */
  val mix64: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_mix64"),
    new ExpressionInfo(classOf[Mix64].getName, "graft_mix64"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_mix64 takes exactly 1 argument")
      Mix64(children.head)
    })

  /** `graft_nearest_centroid(x, codebook)` — codegen'd argmin over an
    * `array<struct<cid, cv>>` codebook (the k-means/PQ assignment
    * kernel), fixed-order distance, smaller-cid tie-break.
    */
  val nearestCentroid: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nearest_centroid"),
    new ExpressionInfo(classOf[graft.functions.NearestCentroid].getName,
      "graft_nearest_centroid"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "graft_nearest_centroid takes (x, codebook)")
      graft.functions.NearestCentroid(children.head, children(1))
    })

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(arrayDot, simhash, fingerprint, minhash, qhist, qhistQuantile,
      qhistQuantileUb, hll, hllEstimate, cm, cmEstimate, bloom,
      bloomContains, mix64, nearestCentroid)

  /** Register on an existing session's registry (tests, REPL). */
  def registerAll(registry: FunctionRegistry): Unit =
    all.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
}
