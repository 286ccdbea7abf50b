package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Materialized-view rewrite — a Catalyst optimizer rule.
  *
  * At 100 TB the dominant cost of a repeated dashboard/rollup query is
  * re-scanning the fact table for an aggregate whose answer is already
  * sitting in a (orders-of-magnitude smaller) summary table. Warehouse
  * engines solve this with transparent MV rewrite: the user keeps
  * writing the logical aggregate; the optimizer substitutes the
  * materialized summary when one matches. This rule implements the
  * exact-match base case of that rewrite for Spark:
  *
  *   - `register(session, name, definition, path)` materializes the
  *     definition once as parquet at `path` and records the
  *     definition's OPTIMIZED, CANONICALIZED plan;
  *   - the rule replaces any optimized `Aggregate` subtree whose
  *     canonical form equals a registered definition with a scan of
  *     the materialized parquet, aliased back to the original output
  *     attributes (same exprIds, so every parent operator stays
  *     resolved — the RangeBinJoinRule lesson);
  *   - anything above the aggregate (sort, filter-on-results, joins
  *     against other tables) is untouched and now feeds from the
  *     summary scan.
  *
  * Exact-match only, by design: canonical-plan equality is sound (no
  * false rewrites — `plan.canonicalized` normalizes exprIds/aliases
  * and nothing else), and partial matching (aggregate roll-up,
  * predicate subsumption) layers on top of the same machinery later.
  * Correctness therefore never depends on the matcher being clever:
  * a non-match just runs the original plan.
  *
  * Session scoping: like every experimental rule in this repo, opt-in
  * on an ISOLATED child session (`sessionWith`), so the catalog's
  * other queries never see surprise rewrites. The registry is keyed
  * per-session (weak keys — a dropped session unregisters its MVs).
  * Fixed-point safe: the rewrite output is a Project over a scan —
  * contains no Aggregate — so the rule cannot re-fire on its result.
  *
  * Reference analog: the reference consumer recomputes every
  * subscription's full read path per message (`firebase/app/
  * artifacts.py:319-380`); a summary reused across queries is the
  * set-oriented replacement for that per-message recompute.
  */
object MaterializedViewRule extends Rule[LogicalPlan] {

  final case class Mv(name: String, canonical: LogicalPlan, relation: LogicalRelation)

  private val registry =
    new java.util.WeakHashMap[SparkSession, List[Mv]]()

  private[plans] def mvsFor(s: SparkSession): List[Mv] = registry.synchronized {
    Option(registry.get(s)).getOrElse(Nil)
  }

  private[plans] def add(s: SparkSession, mv: Mv): Unit = registry.synchronized {
    registry.put(s, mv :: mvsFor(s))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val session = SparkSession.getActiveSession.orNull
    if (session == null) return plan
    val mvs = mvsFor(session)
    if (mvs.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate =>
        mvs.find(_.canonical == agg.canonicalized) match {
          case Some(mv) if mv.relation.output.length == agg.output.length =>
            // fresh exprIds per use so one MV can appear twice in a plan
            val rel = mv.relation.newInstance()
            val cols: Seq[NamedExpression] = agg.output.zip(rel.output).map {
              case (o, m) =>
                val e = if (m.dataType == o.dataType) m
                        else Cast(m, o.dataType, Some(conf.sessionLocalTimeZone))
                Alias(e, o.name)(exprId = o.exprId)
            }
            Project(cols, rel)
          case _ => agg
        }
    }
  }
}

object MaterializedView {

  /** Child session with the rewrite enabled; MVs registered on it are
    * invisible to the parent session. */
  def sessionWith(s: SparkSession): SparkSession = {
    val child = s.newSession()
    if (!child.experimental.extraOptimizations.exists(_ eq MaterializedViewRule))
      child.experimental.extraOptimizations =
        child.experimental.extraOptimizations :+ MaterializedViewRule
    child
  }

  /** Materialize `definition` at `path` (overwrite) and register it
    * for rewrite on `session`. The canonical form is computed from the
    * definition's optimized plan — the same form the rule sees for an
    * incoming query — BEFORE registration, so registering can never
    * self-match. */
  def register(session: SparkSession, name: String,
      definition: DataFrame, path: String): Unit = {
    val canonical = definition.queryExecution.optimizedPlan.canonicalized
    definition.write.mode("overwrite").parquet(path)
    val rel = session.read.parquet(path).queryExecution.analyzed.collectFirst {
      case r: LogicalRelation => r
    }.getOrElse(throw new IllegalStateException(
      s"materialized view $name at $path did not read back as a file relation"))
    MaterializedViewRule.add(session, MaterializedViewRule.Mv(name, canonical, rel))
  }
}
