package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BoundReference, Cast, Coalesce, Divide, EvalMode, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.types.DecimalType
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
  * materialized summary when one matches. This rule implements the two
  * foundational match levels for Spark:
  *
  *   1. EXACT match — the query's optimized `Aggregate` subtree is
  *      canonically equal to a registered definition: replace it with
  *      a scan of the materialized parquet, aliased back to the
  *      original output attributes (same exprIds, so every parent
  *      operator stays resolved — the RangeBinJoinRule lesson).
  *   2. ROLL-UP match — the query aggregates the SAME child but
  *      groups by a SUBSET of the MV's grouping expressions with
  *      re-aggregable functions: `sum(e)` → `sum(mv.sum_e)`,
  *      `count(*)`/`count(lit)` → `coalesce(sum(mv.n), 0)`,
  *      `min(e)` → `min(mv.min_e)`, `max(e)` → `max(mv.max_e)`.
  *      The aggregate then runs over the summary instead of the fact
  *      table — the decisive case in practice, since dashboards
  *      slice one fine-grained cube many coarse ways. `avg(e)` is
  *      DERIVABLE when the MV carries both `sum(e)` and `count(e)`
  *      (or `count(*)` for a non-nullable e) — rewritten to
  *      `sum(mv.sum_e) / sum(mv.n)` — but ONLY for DECIMAL(p,2)
  *      inputs: double sums are partition-order sensitive (the
  *      repo's correctness rule), and scale-2 is the shape whose
  *      quotient scale (6) equals Average's own result scale, so the
  *      division rounds exactly once, exactly where Average rounds.
  *      DISTINCT aggregates, other-scale/double avg, and FILTER
  *      clauses are NOT re-aggregable from partials and correctly
  *      fall through to the base plan.
  *
  * Matching is cross-plan-safe: expressions are compared after
  * rebinding their attribute references to ordinals of the (already
  * canonically-equal) child, so differing exprIds between the two
  * constructions of the same logical query never defeat the match.
  * Soundness never depends on the matcher being clever: a non-match
  * just runs the original plan.
  *
  * Session scoping: like every experimental rule in this repo, opt-in
  * on an ISOLATED child session (`sessionWith`), so the catalog's
  * other queries never see surprise rewrites. The registry is keyed
  * per-session (weak keys — a dropped session unregisters its MVs).
  * Fixed-point safe: the exact rewrite emits no Aggregate, and the
  * roll-up rewrite emits an Aggregate whose child is the SUMMARY
  * relation — a different file relation (path + schema) from any
  * registered definition's child, so neither match can fire on it
  * again.
  *
  * Reference analog: the reference consumer recomputes every
  * subscription's full read path per message (`firebase/app/
  * artifacts.py:319-380`); a summary reused across queries is the
  * set-oriented replacement for that per-message recompute.
  */
object MaterializedViewRule extends Rule[LogicalPlan] {

  /** A registered MV: the full definition's canonical plan (exact
    * match), its canonical child + per-output-column meaning (roll-up
    * match), the summary relation to substitute, and the current
    * storage generation (refresh writes a new one). */
  final case class Mv(
      name: String,
      canonical: LogicalPlan,
      childCanonical: Option[LogicalPlan],
      // definition output position -> meaning: Left(normalized group
      // expr) or Right(normalized re-aggregable function)
      outMeaning: Seq[Either[Expression, Expression]],
      relation: LogicalRelation,
      path: String,
      /** Registration-time path: generation suffixes derive from this
        * stored base, never by regex-stripping the current path — a
        * user-supplied base that itself ends in a version-like suffix
        * must not be mangled into overwriting its own directory. */
      basePath: String,
      version: Int = 0,
      lastBatchId: Option[Long] = None)

  /** Per-session MV lists. NOTE on lifecycle: weak KEYS alone cannot
    * free an entry here, because the value's plans (canonical
    * definition + summary relation) strongly reference the owning
    * session — the textbook WeakHashMap value→key cycle. Sessions
    * created per-query (the catalog demos) bound their own growth;
    * long-lived services must call [[MaterializedView.unregister]] /
    * [[MaterializedView.dropAll]] when done with an MV or session. */
  private val registry =
    new java.util.WeakHashMap[SparkSession, List[Mv]]()

  private[plans] def mvsFor(s: SparkSession): List[Mv] = registry.synchronized {
    Option(registry.get(s)).getOrElse(Nil)
  }

  private[plans] def add(s: SparkSession, mv: Mv): Unit = registry.synchronized {
    registry.put(s, mv :: mvsFor(s).filterNot(_.name == mv.name))
  }

  private[plans] def remove(s: SparkSession, name: String): Unit =
    registry.synchronized {
      mvsFor(s).filterNot(_.name == name) match {
        case Nil  => registry.remove(s): Unit
        case rest => registry.put(s, rest): Unit
      }
    }

  private[plans] def removeAll(s: SparkSession): Unit = registry.synchronized {
    registry.remove(s): Unit
  }

  private[plans] def registrySize: Int = registry.synchronized { registry.size }

  private[plans] def clearRegistry(): Unit =
    registry.synchronized { registry.clear() }

  /** Column pruning gives every query a differently-shaped pure
    * Project over the shared scan (the coarser roll-up reads fewer
    * columns), which would defeat child equality. Attribute-only
    * Projects change nothing an aggregate can observe — peel them
    * before comparing. Attribute exprIds flow through such Projects
    * unchanged, so normalization against the peeled child's output
    * still binds. */
  private[plans] def stripPruning(p: LogicalPlan): LogicalPlan = p match {
    case Project(cols, child) if cols.forall(_.isInstanceOf[AttributeReference]) =>
      stripPruning(child)
    case other => other
  }

  /** Rebind `e`'s attribute references to ordinals of `child.output`
    * and canonicalize — a cross-plan-comparable form. None if any
    * reference escapes the child (should not happen post-analysis). */
  private[plans] def normalize(e: Expression, child: LogicalPlan): Option[Expression] = {
    var ok = true
    val bound = e.transform {
      case a: AttributeReference =>
        val i = child.output.indexWhere(_.exprId == a.exprId)
        if (i < 0) { ok = false; a }
        else BoundReference(i, a.dataType, nullable = true)
    }
    if (ok) Some(bound.canonicalized) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val session = SparkSession.getActiveSession.orNull
    if (session == null) return plan
    val mvs = mvsFor(session)
    if (mvs.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate =>
        val exact = mvs.collectFirst {
          case mv if mv.canonical == agg.canonicalized &&
            mv.relation.output.length == agg.output.length => exactRewrite(agg, mv)
        }
        exact.orElse(mvs.view.flatMap(rollupRewrite(agg, _)).headOption)
          .getOrElse(agg)
    }
  }

  private def exactRewrite(agg: Aggregate, mv: Mv): LogicalPlan = {
    // fresh exprIds per use so one MV can appear twice in a plan
    val rel = mv.relation.newInstance()
    val cols: Seq[NamedExpression] = agg.output.zip(rel.output).map {
      case (o, m) =>
        val e = if (m.dataType == o.dataType) m
                else Cast(m, o.dataType, Some(conf.sessionLocalTimeZone))
        Alias(e, o.name)(exprId = o.exprId)
    }
    Project(cols, rel)
  }

  /** Try the roll-up rewrite of `agg` over `mv`'s summary. */
  private def rollupRewrite(agg: Aggregate, mv: Mv): Option[LogicalPlan] = {
    val mvChild = mv.childCanonical.getOrElse(return None)
    val base = stripPruning(agg.child)
    if (base.canonicalized != mvChild) return None
    val rel = mv.relation.newInstance()

    def groupCol(e: Expression): Option[Expression] =
      normalize(e, base).flatMap { n =>
        mv.outMeaning.indexWhere(_ == Left(n)) match {
          case -1 => None
          case i  => Some(rel.output(i))
        }
      }
    def aggCol(n: Expression): Option[Expression] =
      mv.outMeaning.indexWhere(_ == Right(n)) match {
        case -1 => None
        case i  => Some(rel.output(i))
      }

    // every query grouping expression must be one of the MV's
    val newGroups: Seq[Expression] = agg.groupingExpressions.map { g =>
      groupCol(g).getOrElse(return None)
    }

    val tz = Some(conf.sessionLocalTimeZone)

    /** Rewrite one aggregate call over the fact table into the
      * equivalent re-aggregation of MV partials; None = not derivable. */
    def rewriteAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      ae.aggregateFunction match {
        case Sum(e, _) =>
          normalize(ae, base).flatMap(aggCol).map { src =>
            val s = ae.copy(aggregateFunction = Sum(src),
              resultId = NamedExpression.newExprId)
            if (s.dataType == ae.dataType) s else Cast(s, ae.dataType, tz)
          }
        case Count(_) =>
          normalize(ae, base).flatMap(aggCol).map { src =>
            // count over partials = sum of partial counts; empty scan
            // must still read 0, matching Count's never-null contract
            Coalesce(Seq(Cast(ae.copy(aggregateFunction = Sum(src),
              resultId = NamedExpression.newExprId), ae.dataType, tz),
              Literal(0L)))
          }
        case Min(e) =>
          normalize(ae, base).flatMap(aggCol).map(src =>
            ae.copy(aggregateFunction = Min(src),
              resultId = NamedExpression.newExprId))
        case Max(e) =>
          normalize(ae, base).flatMap(aggCol).map(src =>
            ae.copy(aggregateFunction = Max(src),
              resultId = NamedExpression.newExprId))
        case Average(e, _) =>
          // avg is derivable from (sum, count) partials ONLY in exact
          // arithmetic: a double sum is partition-order sensitive.
          // Decimal only. Rounding parity with native Average is
          // load-bearing and PINNED EMPIRICALLY: on a quotient within
          // 5e-13 BELOW a half-microunit (0.50 over 1000001 rows of
          // decimal(18,2)), native Average yields the SINGLE-rounded
          // value (0.000000) — i.e. it does not expose a rounded
          // scale-12 intermediate — and the (38,2)/(38,2) divide
          // below resolves to adjusted scale 6 (= Average's s+4
          // result scale for s=2) and rounds once at that same
          // scale, agreeing bit-for-bit. A chain that first rounds
          // at an intermediate scale 12 and then casts to scale 6
          // double-rounds UP (0.000001) and was measured to DIVERGE
          // from native — MaterializedViewSpec's half-boundary case
          // catches exactly that.
          e.dataType match {
            case d: DecimalType if d.scale == 2 && d.precision + 4 <= 38 =>
            case _ => return None
          }
          def partial(fn: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction) =
            normalize(ae.copy(aggregateFunction = fn), base).flatMap(aggCol)
          for {
            sumSrc <- partial(Sum(e))
            // count(e) is the null-correct divisor; count(*) partials
            // are acceptable only when e can never be null
            cntSrc <- partial(Count(Seq(e))).orElse(
              if (e.nullable) None else partial(Count(Seq(Literal(1)))))
          } yield {
            val wide = DecimalType(38, 2)
            val totalSum = Cast(ae.copy(aggregateFunction = Sum(sumSrc),
              resultId = NamedExpression.newExprId), wide, tz)
            val totalCnt = Cast(ae.copy(aggregateFunction = Sum(cntSrc),
              resultId = NamedExpression.newExprId), wide, tz)
            // LEGACY eval: null (not error) on the impossible count=0,
            // matching Average's own divide
            Cast(Divide(totalSum, totalCnt, EvalMode.LEGACY), ae.dataType, tz)
          }
        case _ => None // not re-aggregable from partials
      }
    }

    /** Rewrite an arbitrary output expression: aggregate calls map to
      * partial re-aggregations, bare attributes to MV grouping columns,
      * and any surrounding scalar arithmetic (e.g. a CollapseProject-
      * inlined unit conversion over an avg) is rebuilt over the
      * rewritten children. */
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => rewriteAgg(ae)
      case a: AttributeReference   => groupCol(a)
      case leaf if leaf.children.isEmpty => Some(leaf)
      case other =>
        val kids = other.children.map(rewriteExpr)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

    val newOut: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference => // grouping column in the output
        Alias(groupCol(a).getOrElse(return None), a.name)(exprId = a.exprId)
      case al: Alias =>
        Alias(rewriteExpr(al.child).getOrElse(return None), al.name)(exprId = al.exprId)
      case _ => return None
    }
    Some(Aggregate(newGroups, newOut, rel))
  }
}

object MaterializedView {

  /** Current storage path of a registered MV (advances on refresh). */
  def currentPath(session: SparkSession, name: String): Option[String] =
    MaterializedViewRule.mvsFor(session).find(_.name == name).map(_.path)

  /** Number of sessions currently holding registry entries — the
    * observable for leak specs; not part of the public contract. */
  private[graft] def registrySessionCount: Int =
    MaterializedViewRule.registrySize

  /** Test-teardown sweep: drop EVERY session's registrations (does
    * not touch on-disk MV data). Not part of the public contract —
    * services use [[unregister]]/[[dropAll]], which also clean up
    * refresh generations. */
  private[graft] def clearAllRegistrations(): Unit =
    MaterializedViewRule.clearRegistry()

  /** Child session with the rewrite enabled; MVs registered on it are
    * invisible to the parent session.
    *
    * Lifecycle contract for LONG-LIVED services: registry entries
    * cannot be freed by the weak session key alone (the MV's plans
    * strongly reference the owning session), so a service that
    * registers and retires MVs over time must pair every [[register]]
    * with [[unregister]] (or drop the whole session's set with
    * [[dropAll]]) — e.g.
    * {{{
    *   val mvs = MaterializedView.sessionWith(spark)
    *   MaterializedView.register(mvs, "daily_rollup", defn, path)
    *   try runQueries(mvs)
    *   finally MaterializedView.dropAll(mvs)   // frees registry + generations
    * }}}
    * MaterializedViewSpec drives a 100-iteration register/drop loop
    * against [[registrySessionCount]] to pin that this contract
    * actually bounds registry growth. */
  def sessionWith(s: SparkSession): SparkSession = {
    val child = s.newSession()
    if (!child.experimental.extraOptimizations.exists(_ eq MaterializedViewRule))
      child.experimental.extraOptimizations =
        child.experimental.extraOptimizations :+ MaterializedViewRule
    child
  }

  /** Materialize `definition` at `path` (overwrite) and register it
    * for rewrite on `session`. The canonical forms are computed from
    * the definition's optimized plan — the same form the rule sees for
    * an incoming query — BEFORE registration, so registering can never
    * self-match. If the optimized definition is a single Aggregate its
    * per-column meaning is recorded to enable roll-up matching;
    * otherwise only exact matching applies. */
  def register(session: SparkSession, name: String,
      definition: DataFrame, path: String): Unit = {
    import MaterializedViewRule.{Mv, normalize, stripPruning}
    val optimized = definition.queryExecution.optimizedPlan
    val canonical = optimized.canonicalized
    val (childCanon, meaning) = optimized match {
      case agg: Aggregate =>
        val base = stripPruning(agg.child)
        val groupNorms = agg.groupingExpressions
          .flatMap(g => normalize(g, base)).toSet
        val m: Seq[Either[Expression, Expression]] = agg.aggregateExpressions.map {
          case a: AttributeReference =>
            normalize(a, base).filter(groupNorms) match {
              case Some(n) => Left(n)
              case None    => return registerExactOnly(session, name, definition, path, canonical)
            }
          case Alias(ae: AggregateExpression, _)
              if !ae.isDistinct && ae.filter.isEmpty &&
                (ae.aggregateFunction match {
                  case _: Sum | _: Count | _: Min | _: Max => true
                  case _ => false
                }) =>
            normalize(ae, base) match {
              case Some(n) => Right(n)
              case None    => return registerExactOnly(session, name, definition, path, canonical)
            }
          case _ => return registerExactOnly(session, name, definition, path, canonical)
        }
        (Some(base.canonicalized), m)
      case _ => (None, Seq.empty[Either[Expression, Expression]])
    }
    definition.write.mode("overwrite").parquet(path)
    MaterializedViewRule.add(session,
      Mv(name, canonical, childCanon, meaning, readRelation(session, name, path),
        path, basePath = path))
  }

  private def registerExactOnly(session: SparkSession, name: String,
      definition: DataFrame, path: String, canonical: LogicalPlan): Unit = {
    definition.write.mode("overwrite").parquet(path)
    MaterializedViewRule.add(session,
      MaterializedViewRule.Mv(name, canonical, None, Seq.empty,
        readRelation(session, name, path), path, basePath = path))
  }

  /** Drop one MV registration: the rewrite stops firing for it, and
    * any refresh-created generation directories (never the original
    * registration path — the caller owns that) are deleted. Part of
    * the registry's lifecycle contract: weak session keys alone cannot
    * free entries (an MV's plans reference the owning session), so
    * long-lived services drop explicitly. */
  def unregister(session: SparkSession, name: String): Unit = {
    MaterializedViewRule.mvsFor(session).find(_.name == name).foreach { mv =>
      MaterializedViewRule.remove(session, name)
      if (mv.path != mv.basePath) deleteDir(session, mv.path)
    }
  }

  /** Drop every MV registered on `session` (see [[unregister]]). */
  def dropAll(session: SparkSession): Unit = {
    MaterializedViewRule.mvsFor(session).foreach { mv =>
      if (mv.path != mv.basePath) deleteDir(session, mv.path)
    }
    MaterializedViewRule.removeAll(session)
  }

  private def deleteDir(session: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(session.sessionState.newHadoopConf())
    fs.delete(p, true): Unit
  }

  /** Incremental refresh: merge `deltaSummary` — the SAME aggregate
    * computed over ONLY the fact rows that arrived since the last
    * (re)registration/refresh — into the stored summary, without
    * touching historical fact data. This is what keeps an MV honest
    * under append-only ingest at 100 TB: the merge cost is
    * O(|summary| + |delta summary|), independent of fact size,
    * because every recorded aggregate composes over partials
    * (sum/count → sum of partials, min/max → min/max of partials —
    * the same algebra `q_incremental_agg` proves equal to recompute).
    * Null-skipping semantics compose too: an all-null partial
    * contributes a null that the merge aggregate skips, exactly as a
    * recompute would.
    *
    * The merged generation is written to `<basePath>_v<n>` (a parquet
    * dir cannot be overwritten while being read) and the registry
    * entry swaps to it atomically; matching metadata (canonical forms,
    * column meanings) is unchanged, so rewrites keep firing. The
    * suffix derives from the STORED registration path — never by
    * pattern-stripping the current one, which would mangle a user
    * path that happens to end version-like. After the swap the
    * PREVIOUS refresh-created generation is deleted (the original
    * registration dir is the caller's and is kept), so a long-running
    * maintained stream holds at most base + previous-swap + current —
    * bounded storage, not one summary copy per micro-batch. Only
    * roll-up-capable MVs (single-Aggregate definitions) can refresh —
    * exact-only registrations throw, since their column algebra is
    * unknown. */
  def refresh(session: SparkSession, name: String,
      deltaSummary: DataFrame, batchId: Option[Long] = None): Unit = {
    import org.apache.spark.sql.functions.{col, max => fmax, min => fmin, sum => fsum}
    val mv = MaterializedViewRule.mvsFor(session).find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no MV named $name"))
    if (mv.childCanonical.isEmpty) throw new IllegalArgumentException(
      s"MV $name was registered exact-only; its columns cannot be merged")
    // at-least-once guard: foreachBatch replays the last uncommitted
    // batch after a restart; merging partials is NOT idempotent, so a
    // replayed batch id must be a no-op rather than a double count
    if (batchId.exists(b => mv.lastBatchId.exists(_ >= b))) return
    val schema = mv.relation.schema
    require(deltaSummary.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"delta summary schema must match MV $name schema exactly")
    val cur = session.read.parquet(mv.path)
    val names = schema.fieldNames
    val groupCols = names.zip(mv.outMeaning).collect { case (n, Left(_)) => col(n) }
    val aggCols = names.zip(mv.outMeaning).collect { case (n, Right(norm)) =>
      val fn = norm match {
        case ae: AggregateExpression => ae.aggregateFunction
        case other => other
      }
      (fn match {
        case _: Sum | _: Count => fsum(col(n)).cast(schema(n).dataType)
        case _: Min            => fmin(col(n))
        case _: Max            => fmax(col(n))
        case other => throw new IllegalStateException(s"unmergeable $other")
      }).as(n)
    }
    val merged =
      if (aggCols.isEmpty) cur.unionByName(deltaSummary).distinct()
      else cur.unionByName(deltaSummary)
        .groupBy(groupCols: _*).agg(aggCols.head, aggCols.tail: _*)
        .select(names.map(col): _*)
    val next = s"${mv.basePath.stripSuffix("/")}_v${mv.version + 1}"
    merged.write.mode("overwrite").parquet(next)
    MaterializedViewRule.add(session, mv.copy(
      relation = readRelation(session, name, next),
      path = next, version = mv.version + 1,
      lastBatchId = batchId.orElse(mv.lastBatchId)))
    // bounded storage: the superseded refresh-created generation is
    // dead once the registry points at `next`; the original
    // registration dir stays (the caller owns it)
    if (mv.path != mv.basePath && mv.path != next) deleteDir(session, mv.path)
  }

  private def readRelation(session: SparkSession, name: String,
      path: String): LogicalRelation =
    session.read.parquet(path).queryExecution.analyzed.collectFirst {
      case r: LogicalRelation => r
    }.getOrElse(throw new IllegalStateException(
      s"materialized view $name at $path did not read back as a file relation"))
}
