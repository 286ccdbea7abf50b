package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, DoubleType, IntegerType, LongType, StringType}

import graft.operators.Sketches

/** Opt-in COUNT(DISTINCT) → HyperLogLog rewrite — a Catalyst
  * optimizer rule.
  *
  * An exact distinct count of a high-cardinality column is one of the
  * most expensive aggregations Spark runs at 100 TB: the aggregation
  * pipeline's intermediate state is ONE ROW PER DISTINCT VALUE per
  * group — memory and shuffle volume scale with the answer. Dashboards
  * and profiling queries that only need "roughly how many users" pay
  * the exact price anyway. This rule lets a session opt in to the
  * classic trade: any grouped single-call `count(DISTINCT x)`
  * aggregate is rewritten in the OPTIMIZER to the engine-deterministic
  * HLL estimator proven by q_approx_distinct_hll — bounded 256-counter
  * state per group, constant-width shuffle rows, identical answers on
  * every engine (md5-derived hash, CASE-ladder ρ, literal linear-
  * counting table — no libm anywhere).
  *
  * The replacement sub-plan is built from raw catalyst nodes spelling
  * the IDENTICAL formulas [[graft.operators.Sketches.hllDistinct]]
  * uses (the Column API cannot be used inside an optimizer rule —
  * Spark 4 functions build lazily-resolved column nodes, and the
  * optimizer requires fully resolved trees); ApproxDistinctSpec pins
  * result equality against the standalone operator so the two
  * constructions cannot drift.
  *
  * Scope guards (a non-match just keeps the exact plan):
  *   - grouping expressions must be plain attributes;
  *   - exactly ONE single-argument unfiltered `Count(...)` with
  *     isDistinct, emitted bare (no arithmetic around it);
  *   - every OTHER aggregate call must be a re-aggregable companion —
  *     an unfiltered non-distinct Sum/Count/Min/Max, also emitted
  *     bare. Companions ride the two-level pipeline as per-bucket
  *     PARTIALS re-aggregated at the keys level (sum→sum-of-sums,
  *     count→sum-of-counts, min/max compose — MaterializedViewRule's
  *     algebra), so the common "count(distinct user), sum(revenue),
  *     count(*)" dashboard shape rewrites whole. avg and everything
  *     else refuse;
  *   - grouped aggregates only: a GLOBAL count(distinct) over an
  *     empty relation must return 0, while the rewritten pipeline's
  *     empty-input row would carry NULL — rather than special-case
  *     it, global aggregates keep the exact plan;
  *   - emits `floor(est)` as BIGINT (both engines floor doubles
  *     identically; a raw double→int cast rounds in DuckDB but
  *     truncates in Spark).
  *
  * Session scoping: like every experimental rule in this repo,
  * opt-in on an ISOLATED child session ([[ApproxDistinct.sessionWith]])
  * — approximate answers must never leak into a session that asked
  * for exact ones. Fixed-point safe: the replacement contains only
  * non-distinct aggregates, which this rule never matches.
  */
object ApproxDistinctRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }

  private val M = Sketches.HllM
  private val Bits = 32 - Sketches.HllP

  /** md5-derived 32-bit hash — the raw-catalyst spelling of
    * [[Sketches.hash32]]: first 8 md5 hex digits as a BIGINT. */
  private def hash32(arg: Expression): Expression =
    Cast(
      Conv(
        Substring(Md5(Cast(Cast(arg, StringType), BinaryType)),
          Literal(1), Literal(8)),
        Literal(16), Literal(10)),
      LongType)

  /** ρ(v) CASE ladder — branch for branch [[Sketches.hllRho]]. */
  private def rho(v: Expression): Expression = {
    val branches = (1 to Bits).map { r =>
      (GreaterThanOrEqual(v, Literal(1L << (Bits - r))), Literal(r))
    }
    CaseWhen(branches, Some(Literal(Bits + 1)))
  }

  /** A companion (non-distinct, unfiltered) aggregate call that can
    * ride the two-level pipeline: its per-(keys, bucket) PARTIAL is
    * re-aggregated at the keys level — sum→sum-of-sums,
    * count→sum-of-counts, min/max→min/max of partials, the same
    * re-aggregability algebra MaterializedViewRule uses. avg and
    * everything else refuse the rewrite (avg is only
    * partial-derivable in exact decimal — out of scope here). */
  private final case class Companion(out: Alias, ae: AggregateExpression,
      fn: String, arg: Expression)

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    // grouped, attribute-keyed aggregates only
    if (agg.groupingExpressions.isEmpty) return None
    val groupAttrs: Seq[AttributeReference] = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    // classify outputs: group passthroughs, exactly ONE bare DISTINCT
    // count, and re-aggregable companion calls (also emitted bare)
    var distinctOut: Option[(Alias, Expression)] = None
    val companions = scala.collection.mutable.ArrayBuffer[Companion]()
    agg.aggregateExpressions.foreach {
      case a: AttributeReference =>
        if (!groupAttrs.exists(_.exprId == a.exprId)) return None
      case al @ Alias(ae: AggregateExpression, _) =>
        if (ae.filter.nonEmpty) return None
        ae.aggregateFunction match {
          case Count(Seq(e)) if ae.isDistinct =>
            if (distinctOut.isDefined) return None // one sketch per agg
            distinctOut = Some((al, e))
          case _ if ae.isDistinct => return None
          case Sum(e, _) => companions += Companion(al, ae, "sum", e)
          case Count(Seq(e)) => companions += Companion(al, ae, "count", e)
          case Min(e) => companions += Companion(al, ae, "min", e)
          case Max(e) => companions += Companion(al, ae, "max", e)
          case _ => return None
        }
      case _ => return None
    }
    val (countOut, countArg) = distinctOut.getOrElse(return None)

    // level 1: keys + 32-bit hash + each companion's argument
    val hAlias = Alias(hash32(countArg), "_h")()
    val argAliases = companions.zipWithIndex.map { case (c, i) =>
      Alias(c.arg, s"_arg$i")()
    }.toSeq
    val p1 = Project((groupAttrs :+ hAlias) ++ argAliases, agg.child)
    val hAttr = hAlias.toAttribute
    val argAttrs = argAliases.map(_.toAttribute)

    // level 2: bucket (top p bits) + rho (ladder on the remainder)
    val bucketAlias = Alias(ShiftRight(hAttr, Literal(Bits)), "_bucket")()
    val rhoAlias = Alias(
      rho(BitwiseAnd(hAttr, Literal((1L << Bits) - 1))), "_rho")()
    val p2 = Project(
      ((groupAttrs :+ bucketAlias) :+ rhoAlias) ++ argAttrs, p1)

    // level 3: per-(keys, bucket) max rho + companion PARTIALS — all
    // combine map-side, so the first shuffle carries one row per
    // touched bucket per group, never one per distinct value
    val maxAlias = Alias(
      AggregateExpression(Max(rhoAlias.toAttribute), Complete, isDistinct = false),
      "_maxrho")()
    val partialAliases = companions.toSeq.zip(argAttrs).zipWithIndex.map {
      case ((c, a), i) =>
        val f = c.fn match {
          case "sum"   => Sum(a)
          case "count" => Count(Seq(a))
          case "min"   => Min(a)
          case "max"   => Max(a)
        }
        Alias(AggregateExpression(f, Complete, isDistinct = false), s"_part$i")()
    }
    val agg1 = Aggregate(
      groupAttrs :+ bucketAlias.toAttribute,
      ((groupAttrs: Seq[NamedExpression]) ++
        Seq(bucketAlias.toAttribute, maxAlias)) ++ partialAliases,
      p2)

    // level 4: per-keys bucket-hit count + harmonic sum (every addend
    // an exact power of two, so addition order cannot change the
    // double sum) + companion RE-AGGREGATION aliased straight onto
    // the original output exprIds
    val hitAlias = Alias(
      AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false),
      "_nhit")()
    val inv = Divide(Literal(1.0),
      Cast(ShiftLeft(Literal(1L), maxAlias.toAttribute), DoubleType))
    val sumAlias = Alias(
      AggregateExpression(Sum(inv), Complete, isDistinct = false), "_sumhit")()
    val reaggAliases = companions.toSeq.zip(partialAliases.map(_.toAttribute)).map {
      case (c, p) =>
        val f = c.fn match {
          case "sum" | "count" => Sum(p)
          case "min"           => Min(p)
          case "max"           => Max(p)
        }
        val re = AggregateExpression(f, Complete, isDistinct = false)
        val typed =
          if (c.fn == "count")
            // count over partials = sum of partial counts; Count's
            // never-null contract holds because every (keys, bucket)
            // group descends from at least one input row
            Coalesce(Seq(Cast(re, c.ae.dataType), Literal(0L)))
          else if (re.dataType == c.ae.dataType) re
          else Cast(re, c.ae.dataType)
        Alias(typed, c.out.name)(exprId = c.out.exprId)
    }
    val agg2 = Aggregate(
      groupAttrs,
      ((groupAttrs: Seq[NamedExpression]) ++
        Seq(hitAlias, sumAlias)) ++ reaggAliases,
      agg1)

    // final: raw estimator with the literal linear-counting switch,
    // floored to a BIGINT in place of the exact count
    val nhit = hitAlias.toAttribute
    val sh = sumAlias.toAttribute
    val raw = Divide(Literal(Sketches.HllNumerator),
      Add(sh, Cast(Subtract(Literal(M.toLong), nhit), DoubleType)))
    val est = CaseWhen(
      Seq((And(LessThanOrEqual(raw, Literal(2.5 * M)),
            LessThan(nhit, Literal(M.toLong))),
        ElementAt(
          CreateArray(Sketches.HllLinearTable.map(Literal(_))),
          Cast(Subtract(Literal(M.toLong), nhit), IntegerType)))),
      Some(raw))
    val reaggByExprId = reaggAliases.map(a => a.exprId -> a.toAttribute).toMap
    val outs: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      if (ne eq countOut) Alias(Floor(est), ne.name)(exprId = ne.exprId)
      else reaggByExprId.get(ne.exprId) match {
        case Some(attr) => attr
        case None       => ne // grouping passthrough
      }
    }
    Some(Project(outs, agg2))
  }
}

object ApproxDistinct {

  /** An isolated child session (shared SparkContext, private
    * SessionState) with the rewrite registered — approximate
    * distinct counts apply ONLY to queries run through this session.
    */
  def sessionWith(s: SparkSession): SparkSession = {
    val child = s.newSession()
    if (!child.experimental.extraOptimizations.exists(_ eq ApproxDistinctRule))
      child.experimental.extraOptimizations =
        child.experimental.extraOptimizations :+ ApproxDistinctRule
    child
  }
}
