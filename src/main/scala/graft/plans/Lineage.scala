package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, LeafNode, LogicalPlan, Project, Union, Window}
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
  * not data. */
object Lineage {

  final case class SourceCol(table: String, column: String) {
    override def toString = s"$table.$column"
  }

  /** Output column name → source columns it derives from. */
  def of(df: DataFrame): Map[String, Set[SourceCol]] = {
    val plan = df.queryExecution.analyzed
    val m = prov(plan)
    plan.output.map(o => o.name -> m.getOrElse(o.exprId, Set.empty[SourceCol])).toMap
  }

  /** True iff any output of `df` depends on `table.column` — the
    * policy-audit primitive. */
  def dependsOn(df: DataFrame, table: String, column: String): Boolean =
    of(df).values.exists(_.contains(SourceCol(table, column)))

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
      def refs(e: Expression): Set[SourceCol] =
        e.references.iterator.flatMap(a => childMap.getOrElse(a.exprId, Set.empty)).toSet
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
        case u: Union     =>
          u.output.zipWithIndex.map { case (o, i) =>
            o.exprId -> u.children.iterator
              .flatMap(c => childMap.getOrElse(c.output(i).exprId, Set.empty))
              .toSet
          }.toMap
        case _ => Map.empty
      }
      childMap ++ own
  }
}
