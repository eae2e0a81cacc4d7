package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Pure-data pattern element specs for the MATCH_RECOGNIZE logical plan —
  * the structural half of [[graft.cep.PatternDef]] with the predicates
  * lifted out as Catalyst [[Expression]]s (held in the plan node's flat
  * `predicates` list so the analyzer/optimizer see and resolve them).
  * Element i consumes `arity` predicates, in order.
  */
sealed trait MatchElemSpec extends Serializable {
  def names: Seq[String]
  def arity: Int
}
final case class StepSpec(name: String, min: Int = 1, max: Int = 1,
    strict: Boolean = false) extends MatchElemSpec {
  def names: Seq[String] = Seq(name); def arity = 1
}
final case class LogicalSpec(leftName: String, rightName: String,
    isAnd: Boolean) extends MatchElemSpec {
  def names: Seq[String] = Seq(leftName, rightName); def arity = 2
}
final case class AbsenceSpec(name: String, forTs: Long) extends MatchElemSpec {
  def names: Seq[String] = Seq(name); def arity = 1
}

/** MATCH_RECOGNIZE-style logical operator: per `keys` group, events
  * ordered by (`ts`, `tie`) run through the CEP NFA; each completed match
  * emits one row `keys ++ (match_start, match_end) ++ one array<struct>
  * column per step name` (all events bound to that step, in bind order —
  * SQL-standard MATCH_RECOGNIZE measures are projections over these).
  *
  * This is the whole-operator Catalyst integration path (SURVEY §2 A5 as
  * a first-class plan node): the physical strategy declares hash
  * distribution + sort requirements, so Catalyst plans the shuffle/sort —
  * and elides them when the child is already co-partitioned/sorted —
  * instead of the Dataset-API `groupByKey` encoding round-trip.
  *
  * Reference anchor: the pattern queries flink-siddhi forwards to its
  * embedded engine (SiddhiCEPITCase.java:343-348, :370-374); the row
  * shape mirrors Siddhi's `e1[0].name`-style indexed access.
  */
case class MatchRecognizeNode(
    keys: Seq[Attribute],
    ts: Expression,
    tie: Expression,
    predicates: Seq[Expression],
    elems: Seq[MatchElemSpec],
    withinTs: Option[Long],
    every: Boolean,
    maxPartials: Int,
    outAttrs: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = keys ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  // match arrays carry FULL child rows, so every child column is
  // semantically referenced — this blocks column pruning underneath
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): MatchRecognizeNode =
    copy(child = newChild)
}

/** User-facing builder: Column predicates, resolved eagerly against the
  * input frame; registers the planner strategy on the session on first
  * use (idempotent), so no session-construction ceremony is needed.
  */
object MatchRecognize {

  sealed trait Elem
  /** One pattern step; `min`/`max` are the `<m:n>` quantifier bounds
    * (`+` = (1, MaxValue), `?` = (0, 1)), `strict` = sequence semantics
    * (the immediately-next event must qualify).
    */
  final case class EStep(name: String, pred: Column, min: Int = 1,
      max: Int = 1, strict: Boolean = false) extends Elem
  /** `left and right`: both sides must bind, either arrival order. */
  final case class EAnd(leftName: String, leftPred: Column,
      rightName: String, rightPred: Column) extends Elem
  /** `left or right`: first event matching either side completes. */
  final case class EOr(leftName: String, leftPred: Column,
      rightName: String, rightPred: Column) extends Elem
  /** `not pred for forTs`: absence window in `ts` units. */
  final case class ENotFor(name: String, pred: Column, forTs: Long)
      extends Elem

  /** @param tsCol    event-time column (LongType, any unit — `withinTs` /
    *                 `ENotFor.forTs` are in the same unit)
    * @param tieCol   total-order tie-break within equal timestamps
    */
  def apply(df: DataFrame, partitionKeys: Seq[String], tsCol: String,
      tieCol: String, pattern: Seq[Elem], withinTs: Option[Long] = None,
      every: Boolean = true, maxPartials: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(MatchRecognizeStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ MatchRecognizeStrategy

    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      child.output.find(a => spark.sessionState.analyzer.resolver(a.name, n))
        .getOrElse(throw new IllegalArgumentException(
          s"column '$n' not in [${child.output.map(_.name).mkString(", ")}]"))
    def resolve(c: Column): Expression =
      GraftSqlBridge.sessionExpression(spark, c).transformUp {
        case u: UnresolvedAttribute => attr(u.name)
      }

    val tsA = attr(tsCol)
    require(tsA.dataType == LongType,
      s"ts column '$tsCol' must be LongType, got ${tsA.dataType}")
    val (specs, preds) = pattern.map {
      case EStep(n, p, mn, mx, st) =>
        (StepSpec(n, mn, mx, st), Seq(resolve(p)))
      case EAnd(ln, lp, rn, rp) =>
        (LogicalSpec(ln, rn, isAnd = true), Seq(resolve(lp), resolve(rp)))
      case EOr(ln, lp, rn, rp) =>
        (LogicalSpec(ln, rn, isAnd = false), Seq(resolve(lp), resolve(rp)))
      case ENotFor(n, p, f) =>
        (AbsenceSpec(n, f), Seq(resolve(p)))
    }.unzip

    val rowType = StructType(
      child.output.map(a => StructField(a.name, a.dataType, a.nullable)))
    val outAttrs =
      AttributeReference("match_start", LongType, nullable = false)() +:
      AttributeReference("match_end", LongType, nullable = false)() +:
      specs.flatMap(_.names).map(n =>
        AttributeReference(n, ArrayType(rowType, containsNull = false),
          nullable = false)())

    GraftSqlBridge.ofRows(spark, MatchRecognizeNode(
      partitionKeys.map(attr), tsA, attr(tieCol), preds.flatten, specs,
      withinTs, every, maxPartials, outAttrs, child))
  }
}
