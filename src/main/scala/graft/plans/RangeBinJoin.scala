package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Automatic range-join binning — a Catalyst optimizer rule.
  *
  * Spark plans a join whose condition has no equi-conjunct as
  * BroadcastNestedLoopJoin (if one side is small) or as a cartesian
  * product — both O(|L|·|R|) row comparisons, the canonical 100 TB
  * scale-killer for point-in-interval joins (`p.x BETWEEN i.lo AND
  * i.hi`). The manual fix is bin-and-equi-join (see
  * `Queries.qIntervalOverlapJoin`); this rule performs that rewrite
  * automatically inside the optimizer, so any declarative range join
  * in the session gets the scalable plan without the query author
  * hand-rolling bins:
  *
  *   - point side gains one projected column `floor(x / binSize)`;
  *   - interval side is exploded onto every bin the interval spans
  *     (`explode(sequence(floor(lo/binSize), floor(hi/binSize)))`);
  *   - the join becomes an EQUI-join on the bin column with the
  *     original range predicate retained as the residual condition,
  *     so Catalyst picks SortMergeJoin/ShuffledHashJoin and both
  *     sides shuffle-partition on the bin key.
  *
  * Correctness: a point falls in exactly one bin, and any interval
  * containing the point spans that bin (floor is monotone, also
  * under the double cast), so each qualifying (point, interval) pair
  * meets exactly once and the residual predicate removes bin-only
  * collisions — the rewrite is result-identical to the nested-loop
  * plan, duplicate-free by construction. Null points/bounds produce
  * null bins (never equal) or an empty sequence (row dropped), which
  * an inner join with the original predicate would drop anyway.
  *
  * Scale shape: the interval side grows by the average
  * bins-per-interval (≈ interval width / binSize + 1), so `binSize`
  * should be of the order of the typical interval width. The rule is
  * opt-in per session (`spark.graft.rangeJoin.binSize` > 0) because
  * binning an effectively unbounded interval (e.g. an open upper
  * band encoded as 1e9) would explode it onto millions of bins —
  * callers scope it via `RangeBinJoin.sessionWith(...)`.
  *
  * Reference analog: the reference engine has no join optimizer at
  * all (per-message Python loop, `firebase/app/artifacts.py`); this
  * is the Spark-first replacement for its "check every message
  * against every rule" shape, generalized to data-data joins.
  */
object RangeBinJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeConf = "spark.graft.rangeJoin.binSize"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binSize = conf.getConfString(BinSizeConf, "0").toDouble
    if (binSize <= 0) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, binSize).getOrElse(j)
    }
  }

  /** Which join side an expression is computed from, if exactly one. */
  private def sideOf(e: Expression, j: Join): Option[Char] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(j.left.outputSet)) Some('L')
    else if (e.references.subsetOf(j.right.outputSet)) Some('R')
    else None

  /** (point, bound, pointIsLowerBounded) candidates from one comparison:
    * a >= b means a is lower-bounded by b AND b is upper-bounded by a. */
  private def bounds(c: Expression): Seq[(Expression, Expression, Boolean)] = c match {
    case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
    case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
    case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
    case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
    case _                        => Seq.empty
  }

  private def rewrite(j: Join, binSize: Double): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conjuncts = splitConjunctivePredicates(cond)

    // Already has a cross-side equi-conjunct: Spark plans a hash/merge
    // join with the range as residual — nothing to fix (and this is
    // what makes the rule a fixed point over its own output).
    val hasEqui = conjuncts.exists {
      case Equality(a, b) =>
        (sideOf(a, j), sideOf(b, j)) match {
          case (Some(x), Some(y)) => x != y
          case _                  => false
        }
      case _ => false
    }
    if (hasEqui) return None

    // Find a numeric point expression from one side with a lower AND an
    // upper bound from the other side.
    val cands = conjuncts.flatMap(bounds).flatMap { case (p, b, isLower) =>
      (sideOf(p, j), sideOf(b, j)) match {
        case (Some(ps), Some(bs))
            if ps != bs && p.dataType.isInstanceOf[NumericType] &&
              b.dataType.isInstanceOf[NumericType] =>
          Some((p, b, isLower, ps))
        case _ => None
      }
    }
    val hit = cands.collectFirst {
      case (p, lo, true, ps) if cands.exists {
            case (p2, _, false, _) => p2.semanticEquals(p)
            case _                 => false
          } =>
        val hi = cands.collectFirst {
          case (p2, b2, false, _) if p2.semanticEquals(p) => b2
        }.get
        (p, lo, hi, ps)
    }
    hit.map { case (point, lo, hi, pointSide) =>
      def bin(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), Literal(binSize)))

      val (pointPlan, intervalPlan) =
        if (pointSide == 'L') (j.left, j.right) else (j.right, j.left)

      val pointBin = Alias(bin(point), "__graft_bin_p")()
      val newPoint = Project(pointPlan.output :+ pointBin, pointPlan)

      // Sequence is TimeZoneAwareExpression: unresolved until the
      // timezone is bound, even for integral args.
      val seq = new Sequence(bin(lo), bin(hi), None, Some(conf.sessionLocalTimeZone))
      val binAttr = AttributeReference("__graft_bin_i", LongType,
        nullable = seq.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)()
      val newInterval = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(binAttr),
        child = intervalPlan)

      val (newLeft, newRight) =
        if (pointSide == 'L') (newPoint, newInterval) else (newInterval, newPoint)
      val newCond = And(EqualTo(pointBin.toAttribute, binAttr), cond)
      val binned = Join(newLeft, newRight, Inner, Some(newCond), j.hint)
      Project(j.output, binned)
    }
  }
}

object RangeBinJoin {

  /** An isolated child session (shared SparkContext, private
    * SessionState) with the binning rule registered and `binSize`
    * set. Isolation is deliberate: the rule rewrites EVERY
    * equi-free inner range join in its session, and a catalog query
    * that encodes an open band as `hi = 1e9` must not get exploded
    * onto 40M bins behind its back. */
  def sessionWith(s: SparkSession, binSize: Double): SparkSession = {
    val child = s.newSession()
    if (!child.experimental.extraOptimizations.exists(_ eq RangeBinJoinRule))
      child.experimental.extraOptimizations =
        child.experimental.extraOptimizations :+ RangeBinJoinRule
    child.conf.set(RangeBinJoinRule.BinSizeConf, binSize.toString)
    child
  }
}
