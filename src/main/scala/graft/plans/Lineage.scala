package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Generate, LeafNode, LogicalPlan, Project, Union, Window}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage — which SOURCE TABLE COLUMNS each output
  * column of a query derives from, extracted by walking the analyzed
  * logical plan. At 100 TB this is governance infrastructure: masking
  * policies (operators/Masking) and PII audits need "does any output
  * of this pipeline depend on column X?" answered from the PLAN, not
  * from documentation — the plan cannot drift from the code.
  *
  * Provenance propagates bottom-up by expression reference:
  *   - a file relation's columns are their own provenance (table name
  *     = parquet file/dir basename);
  *   - Project/Aggregate/Window aliases take the union of the
  *     provenance of every attribute their expression references
  *     (conservative: a CASE branch counts even if never taken);
  *   - Union merges provenance positionally across children;
  *   - Generate (explode) output derives from the generator's inputs;
  *   - every other operator passes its children's map through
  *     (joins/filters add no named outputs).
  *
  * Literal-only outputs (count(*), lit constants) correctly report
  * EMPTY provenance. The walk is O(plan size) on the driver — plans,
  * not data.
  *
  * Fail-closed contract (the governance requirement): an audit
  * primitive must never FALSELY clear a column. Two cases that would
  * otherwise slip through are handled explicitly:
  *   - SUBQUERY expressions (scalar/EXISTS/IN) carry whole plans
  *     inside an expression, invisible to `references`; `refs` walks
  *     them and counts every source column the subquery reads
  *     anywhere (filters and join keys included — an EXISTS outcome
  *     depends on its filter columns, not just its projection).
  *   - an operator this walk does not model that MINTS new output
  *     attributes maps them to the [[Unknown]] sentinel, which
  *     [[dependsOn]] treats as depends-on-everything. */
object Lineage {

  final case class SourceCol(table: String, column: String) {
    override def toString = s"$table.$column"
  }

  /** Sentinel provenance for outputs of unmodeled operators: treated
    * as depends-on-everything by [[dependsOn]] (fail closed). */
  val Unknown: SourceCol = SourceCol("*unknown*", "*")

  /** Output column name → source columns it derives from. */
  def of(df: DataFrame): Map[String, Set[SourceCol]] = {
    val plan = df.queryExecution.analyzed
    val m = prov(plan)
    plan.output.map(o => o.name -> m.getOrElse(o.exprId, Set.empty[SourceCol])).toMap
  }

  /** True iff any output of `df` depends on `table.column` — the
    * policy-audit primitive. An output with [[Unknown]] provenance
    * (unmodeled operator in its derivation) answers TRUE for every
    * column: the walk refuses to clear what it cannot trace. */
  def dependsOn(df: DataFrame, table: String, column: String): Boolean =
    of(df).values.exists(s =>
      s.contains(SourceCol(table, column)) || s.contains(Unknown))

  private def tableName(r: LogicalRelation): String = r.relation match {
    case f: HadoopFsRelation if f.location.rootPaths.nonEmpty =>
      val base = f.location.rootPaths.head.getName
      if (base.contains('.')) base.substring(0, base.lastIndexOf('.')) else base
    case other => other.getClass.getSimpleName
  }

  private def prov(plan: LogicalPlan): Map[ExprId, Set[SourceCol]] = plan match {
    case r: LogicalRelation =>
      val t = tableName(r)
      r.output.map(a => a.exprId -> Set(SourceCol(t, a.name))).toMap
    case l: LeafNode =>
      l.output.map(a => a.exprId -> Set(SourceCol(l.nodeName, a.name))).toMap
    case _ =>
      val childMap: Map[ExprId, Set[SourceCol]] =
        plan.children.map(prov).foldLeft(Map.empty[ExprId, Set[SourceCol]])(_ ++ _)
      def refs(e: Expression): Set[SourceCol] = {
        val direct = e.references.iterator
          .flatMap(a => childMap.getOrElse(a.exprId, Set.empty)).toSet
        val sub = e.collect { case s: SubqueryExpression => s.plan }
          .iterator.flatMap(p => subqueryDeps(p, childMap)).toSet
        direct ++ sub
      }
      def named(nes: Seq[Expression]): Map[ExprId, Set[SourceCol]] = nes.collect {
        case a: Alias     => a.exprId -> refs(a.child)
        case at: Attribute => at.exprId -> childMap.getOrElse(at.exprId, Set.empty[SourceCol])
      }.toMap
      val own: Map[ExprId, Set[SourceCol]] = plan match {
        case p: Project   => named(p.projectList)
        case a: Aggregate => named(a.aggregateExpressions)
        case w: Window    => named(w.windowExpressions)
        case g: Generate  =>
          g.generatorOutput.map(o => o.exprId -> refs(g.generator)).toMap
        case e: Expand    => // grouping sets/cube: output i unions its
          // slot across every projection row
          e.output.zipWithIndex.map { case (o, i) =>
            o.exprId -> e.projections.iterator.flatMap(p => refs(p(i))).toSet
          }.toMap
        case u: Union     =>
          u.output.zipWithIndex.map { case (o, i) =>
            o.exprId -> u.children.iterator
              .flatMap(c => childMap.getOrElse(c.output(i).exprId, Set.empty))
              .toSet
          }.toMap
        case other =>
          // fail closed, twice over. (1) a SUBQUERY in a Filter/Join
          // condition is control dependence carrying a whole hidden
          // plan (EXISTS decides which rows survive): taint every
          // output this node passes through with the subquery's reads.
          // (Plain-column filter conditions stay out of scope — the
          // documented data-flow contract — but a subquery's interior
          // is invisible to `references` and must not be cleared.)
          val taint = other.expressions.iterator
            .flatMap(_.collect { case s: SubqueryExpression => s.plan })
            .flatMap(p => subqueryDeps(p, childMap)).toSet
          // (2) an unmodeled operator that MINTS attributes (not passed
          // through from a child) gets Unknown provenance — dependsOn
          // then refuses to clear anything derived from it
          val minted = other.output
            .filterNot(a => childMap.contains(a.exprId))
            .map(a => a.exprId -> Set(Unknown)).toMap
          if (taint.isEmpty) minted
          else other.output.map(a => a.exprId ->
            (childMap.getOrElse(a.exprId, Set.empty) ++
              minted.getOrElse(a.exprId, Set.empty) ++ taint)).toMap
      }
      childMap ++ own
  }

  /** Every source column a subquery READS anywhere — projections,
    * filters, join keys, and nested subqueries — resolved against the
    * subquery's own provenance first, then the OUTER scope (correlated
    * references). Conservative by design: an EXISTS result depends on
    * the columns that decide which rows exist. */
  private def subqueryDeps(p: LogicalPlan,
      outer: Map[ExprId, Set[SourceCol]]): Set[SourceCol] = {
    val pm = prov(p)
    def resolve(id: ExprId): Set[SourceCol] =
      pm.getOrElse(id, outer.getOrElse(id, Set(Unknown)))
    val exprs = p.collect { case n => n.expressions }.flatten
    val direct = exprs.iterator
      .flatMap(_.references.iterator.map(_.exprId)).flatMap(resolve).toSet
    val nested = exprs.iterator
      .flatMap(_.collect { case s: SubqueryExpression => s.plan })
      .flatMap(p2 => subqueryDeps(p2, pm ++ outer)).toSet
    val outputs = p.output.iterator.flatMap(a => resolve(a.exprId)).toSet
    direct ++ nested ++ outputs
  }
}
