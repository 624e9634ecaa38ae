package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule (SURVEY.md §3 path (c), the Rule[LogicalPlan] leg):
  * recognize the raw bounded-lookback join
  *
  * {{{
  *   left.join(right, key === key' && rt <= lt && rt >= lt - W)
  * }}}
  *
  * and rewrite it into the binned range-join shape
  * ([[graft.operators.Relational.rangeJoin]]): the anchor side explodes
  * into its two adjacent W-sized time bins, the bounded side projects
  * its single bin, and the join gains a bin equi-key with the original
  * range predicates kept as residual. Catalyst plans the raw form as a
  * hash join on the bare key with the range as a post-join filter —
  * per-key work is O(left_k x right_k) over ALL time, so one bot/power
  * key degenerates quadratically (the exact shape round 11 flagged in
  * attribution_linear). After the rewrite the candidate space is
  * (key, bin)-bounded: cost tracks true matches at any skew.
  *
  * Correctness: trunc-division bins satisfy bin(rt) ∈ {bin(lt)-1,
  * bin(lt)} for every rt ∈ [lt-W, lt] (also for negative timestamps:
  * trunc((s-W)/W) ≥ trunc(s/W)-1 holds for all integers), the two
  * probe bins are always distinct so no pair duplicates, and NULL
  * timestamps produce NULL bins that the equi-key rejects — exactly the
  * raw predicate's NULL semantics. Strict bounds (>, <) survive in the
  * residual. Fires only on INNER joins that already carry a cross-side
  * equi-key; a second fire is prevented by the bin-key guard.
  */
object RangeJoinRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BinA = "_graft_bin_a"
  private val BinB = "_graft_bin_b"

  private def litLong(l: Literal): Option[Long] = l match {
    case Literal(v: Long, LongType)    => Some(v)
    case Literal(v: Int, IntegerType)  => Some(v.toLong)
    case _                             => None
  }

  /** b >= a - w: (bounded attr, anchor attr, window) — BACKWARD window
    * [a-w, a]; the anchor probes bins {bin(a)-1, bin(a)}. */
  private def lowerBound(e: Expression): Option[(Attribute, Attribute, Long)] =
    e match {
      case GreaterThanOrEqual(b: Attribute, Subtract(a: Attribute, l: Literal, _)) =>
        litLong(l).map((b, a, _))
      case GreaterThan(b: Attribute, Subtract(a: Attribute, l: Literal, _)) =>
        litLong(l).map((b, a, _))
      case LessThanOrEqual(Subtract(a: Attribute, l: Literal, _), b: Attribute) =>
        litLong(l).map((b, a, _))
      case LessThan(Subtract(a: Attribute, l: Literal, _), b: Attribute) =>
        litLong(l).map((b, a, _))
      case _ => None
    }

  /** b <= a + w: (bounded attr, anchor attr, window) — FORWARD window
    * [a, a+w]; the anchor probes bins {bin(a), bin(a)+1}. */
  private def fwdUpperBound(e: Expression): Option[(Attribute, Attribute, Long)] =
    e match {
      case LessThanOrEqual(b: Attribute, Add(a: Attribute, l: Literal, _)) =>
        litLong(l).map((b, a, _))
      case LessThan(b: Attribute, Add(a: Attribute, l: Literal, _)) =>
        litLong(l).map((b, a, _))
      case LessThanOrEqual(b: Attribute, Add(l: Literal, a: Attribute, _)) =>
        litLong(l).map((b, a, _))
      case GreaterThanOrEqual(Add(a: Attribute, l: Literal, _), b: Attribute) =>
        litLong(l).map((b, a, _))
      case GreaterThan(Add(a: Attribute, l: Literal, _), b: Attribute) =>
        litLong(l).map((b, a, _))
      case _ => None
    }

  /** b <= a: (bounded attr, anchor attr). */
  private def upperBound(e: Expression): Option[(Attribute, Attribute)] =
    e match {
      case LessThanOrEqual(b: Attribute, a: Attribute)    => Some((b, a))
      case LessThan(b: Attribute, a: Attribute)           => Some((b, a))
      case GreaterThanOrEqual(a: Attribute, b: Attribute) => Some((b, a))
      case GreaterThan(a: Attribute, b: Attribute)        => Some((b, a))
      case _ => None
    }

  /** b >= a: (bounded attr, anchor attr). */
  private def fwdLowerBound(e: Expression): Option[(Attribute, Attribute)] =
    e match {
      case GreaterThanOrEqual(b: Attribute, a: Attribute) => Some((b, a))
      case GreaterThan(b: Attribute, a: Attribute)        => Some((b, a))
      case LessThanOrEqual(a: Attribute, b: Attribute)    => Some((b, a))
      case LessThan(a: Attribute, b: Attribute)           => Some((b, a))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val alreadyBinned = conjuncts.exists {
        case EqualTo(x: Attribute, y: Attribute) =>
          Seq(x, y).exists(a => a.name == "_bin" || a.name.startsWith("_graft_bin"))
        case _ => false
      }
      val hasEquiKey = conjuncts.exists {
        case EqualTo(x: Attribute, y: Attribute) =>
          (left.outputSet.contains(x) && right.outputSet.contains(y)) ||
            (left.outputSet.contains(y) && right.outputSet.contains(x))
        case _ => false
      }
      // backward window [a-w, a] probes bins {bin-1, bin}; forward
      // window [a, a+w] probes {bin, bin+1}
      def directed(wBounds: Seq[(Attribute, Attribute, Long)],
                   other: Seq[(Attribute, Attribute)],
                   dir: Long): Option[(Attribute, Attribute, Long, Long)] =
        wBounds.collectFirst {
          case (b, a, w) if w > 0 && b.dataType == LongType &&
            a.dataType == LongType && other.exists {
              case (b2, a2) => b2.semanticEquals(b) && a2.semanticEquals(a)
            } => (b, a, w, dir)
        }
      val window: Option[(Attribute, Attribute, Long, Long)] =
        if (alreadyBinned || !hasEquiKey) None
        else directed(conjuncts.flatMap(lowerBound),
            conjuncts.flatMap(upperBound), -1L)
          .orElse(directed(conjuncts.flatMap(fwdUpperBound),
            conjuncts.flatMap(fwdLowerBound), 1L))
      window match {
        case None => j
        case Some((bAttr, aAttr, w, dir)) =>
          val anchorOnLeft = left.outputSet.contains(aAttr) &&
            right.outputSet.contains(bAttr)
          val anchorOnRight = right.outputSet.contains(aAttr) &&
            left.outputSet.contains(bAttr)
          if (!anchorOnLeft && !anchorOnRight) j
          else {
            def bin(e: Expression) = IntegralDivide(e, Literal(w))
            val binA = AttributeReference(BinA, LongType)()
            val probeBins: Seq[Expression] =
              if (dir < 0) Seq(Subtract(bin(aAttr), Literal(1L)), bin(aAttr))
              else Seq(bin(aAttr), Add(bin(aAttr), Literal(1L)))
            def explodeAnchor(p: LogicalPlan): LogicalPlan =
              Generate(Explode(CreateArray(probeBins)),
                Nil, outer = false, None, Seq(binA), p)
            val binBAlias = Alias(bin(bAttr), BinB)()
            def projectOther(p: LogicalPlan): LogicalPlan =
              Project(p.output :+ binBAlias, p)
            val (nl, nr) =
              if (anchorOnLeft) (explodeAnchor(left), projectOther(right))
              else (projectOther(left), explodeAnchor(right))
            val newCond = And(cond, EqualTo(binA, binBAlias.toAttribute))
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          }
      }
  }
}

object RangeJoinRewrite {
  /** Imperative registration (the extensions path is GraftExtensions). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewriteRule
}
