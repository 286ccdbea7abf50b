package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MaterializedViewSpec extends AnyFunSuite with SparkTestBase {
  import graft.plans.MaterializedView

  private def rollup(ss: SparkSession): DataFrame =
    Tables.lineitem(ss, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("n"))

  private def relationPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          f.location.rootPaths.map(_.toString).mkString(",")
        case other => other.toString
      }
    }

  test("exact-match aggregate is rewritten to scan the MV, values unchanged") {
    val mvs = MaterializedView.sessionWith(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    MaterializedView.register(mvs, "mv_rollup", rollup(mvs), path)

    val q = rollup(mvs).orderBy(col("l_returnflag"), col("l_linestatus"))
    val optimized = q.queryExecution.optimizedPlan
    assert(optimized.collect { case a: Aggregate => a }.isEmpty,
      s"aggregate survived the rewrite:\n$optimized")
    assert(relationPaths(q).exists(_.contains(path)),
      s"plan does not scan the MV at $path:\n$optimized")

    val viaMv = q.collect()
    val base = rollup(spark).orderBy(col("l_returnflag"), col("l_linestatus")).collect()
    assert(viaMv.toSeq == base.toSeq)
  }

  test("operators above the aggregate keep working over the substituted scan") {
    val mvs = MaterializedView.sessionWith(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    MaterializedView.register(mvs, "mv_rollup", rollup(mvs), path)

    val filtered = rollup(mvs).filter(col("n") > 100).orderBy(col("sq"))
    assert(relationPaths(filtered).exists(_.contains(path)))
    val expected = rollup(spark).filter(col("n") > 100).orderBy(col("sq")).collect()
    assert(filtered.collect().toSeq == expected.toSeq)
  }

  test("a different aggregate is not rewritten; parent session never rewrites") {
    val mvs = MaterializedView.sessionWith(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    MaterializedView.register(mvs, "mv_rollup", rollup(mvs), path)

    // different grouping: must keep its Aggregate and scan the fact table
    val other = Tables.lineitem(mvs, sf)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    assert(other.queryExecution.optimizedPlan
      .collect { case a: Aggregate => a }.nonEmpty)
    assert(!relationPaths(other).exists(_.contains(path)))

    // the parent session has no rule registered: same query, no rewrite
    val parent = rollup(spark)
    assert(parent.queryExecution.optimizedPlan
      .collect { case a: Aggregate => a }.nonEmpty)
    assert(!relationPaths(parent).exists(_.contains(path)))
  }
}
