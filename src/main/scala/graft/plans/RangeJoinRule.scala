package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a pure range join into a banded equi-join.
  *
  * `points JOIN intervals ON lo <= pt AND pt <= hi` has no equi-join keys,
  * so Spark can only plan a nested-loop join — O(|points|·|intervals|)
  * interpreted comparisons, and a full broadcast of one side regardless of
  * size. This rule gives both sides an integer bin key (`value div W`; an
  * interval explodes over every bin it touches), turning the join into a
  * hash-partitionable EQUI join on the bin with the exact range predicate
  * kept as a residual — the same plan
  * [[graft.operators.EventJoins.intervalJoin]] builds by hand, applied
  * transparently so `df.join(iv, pt >= lo && pt <= hi)` and the SQL
  * equivalent get the scale path for free.
  *
  * Truncating division is monotonic, so `lo <= pt <= hi` implies
  * `lo div W <= pt div W <= hi div W` — every true match shares a bin and
  * no result can be lost; false bin-mates are removed by the residual.
  *
  * Fires only when `spark.graft.rangeJoin.binWidth` is a positive long
  * and the join is Inner with long-typed bounds and NO existing equi
  * predicate between the sides (if it has one, hash strategies already
  * apply — and the rewrite adding a bin-equality also makes the rule
  * self-terminating under fixed-point execution). Registered via
  * [[graft.GraftExtensions]]; per-session:
  * `spark.experimental.extraOptimizations`.
  */
case class RangeJoinRule(binWidthConf: () => Long)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidthConf()
    if (w <= 0) plan
    else plan.transform {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, splitConjunctivePredicates(cond), w).getOrElse(j)
    }
  }

  /** `a <= b` facts from the conjuncts, normalized. */
  private def lessEqs(conjuncts: Seq[Expression]): Seq[(Expression, Expression)] =
    conjuncts.collect {
      case LessThanOrEqual(a, b) => (a, b)
      case GreaterThanOrEqual(a, b) => (b, a)
    }

  private def rewrite(j: Join, conjuncts: Seq[Expression],
                      w: Long): Option[LogicalPlan] = {
    val sides = Seq(j.left, j.right)
    def sideOf(e: Expression): Option[Int] =
      sides.indexWhere(s => e.references.nonEmpty &&
        e.references.subsetOf(s.outputSet)) match {
        case -1 => None
        case i => Some(i)
      }
    // an existing cross-side equi predicate means hash join already applies
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEqui) return None

    val les = lessEqs(conjuncts)
    // find pt with lo <= pt and pt <= hi, pt one side, lo/hi the other
    val candidates = for {
      (lo, pt1) <- les
      (pt2, hi) <- les
      if pt1.semanticEquals(pt2) && pt1.dataType == LongType &&
        lo.dataType == LongType && hi.dataType == LongType
      ptSide <- sideOf(pt1)
      loSide <- sideOf(lo)
      hiSide <- sideOf(hi)
      if loSide == hiSide && loSide != ptSide && pt1.deterministic &&
        lo.deterministic && hi.deterministic
    } yield (pt1, lo, hi, ptSide)
    candidates.headOption.map { case (pt, lo, hi, ptSide) =>
      val (ptPlan, ivPlan) =
        if (ptSide == 0) (j.left, j.right) else (j.right, j.left)
      val wLit = Literal(w, LongType)
      val ptBinAlias = Alias(IntegralDivide(pt, wLit), "_rj_bin_pt")()
      val ptProj = Project(ptPlan.output :+ ptBinAlias, ptPlan)
      // Sequence is TimeZoneAwareExpression: it stays UNRESOLVED until a
      // timeZoneId is set, even for long inputs — and an optimizer rule
      // must hand back a resolved plan.
      val seq = new Sequence(IntegralDivide(lo, wLit), IntegralDivide(hi, wLit),
        Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))
      // A malformed interval (lo > hi, dirty data) must DROP, matching the
      // nested-loop plan this rule replaces — an unguarded descending
      // Sequence would instead throw at runtime, so the rewrite may not
      // change failure behavior.
      val guarded = CaseWhen(
        Seq((LessThanOrEqual(lo, hi), seq)),
        Some(Literal.create(Array.empty[Long],
          org.apache.spark.sql.types.ArrayType(LongType, containsNull = false))))
      val ivBinAttr = AttributeReference("_rj_bin_iv", LongType,
        nullable = false)()
      val ivGen = Generate(Explode(guarded), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(ivBinAttr),
        child = ivPlan)
      val newCond = And(EqualTo(ptBinAlias.toAttribute, ivBinAttr),
        j.condition.get)
      val (newLeft, newRight) =
        if (ptSide == 0) (ptProj, ivGen) else (ivGen, ptProj)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
