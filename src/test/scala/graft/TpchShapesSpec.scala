package graft

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the TPC-H decorrelation catalog entries
  * (SURVEY Table B, filters/joins rows): each query must plan as the
  * DECORRELATED join form — aggregate-join / semi / anti / outer —
  * never a per-outer-row rescan. Value correctness against the
  * correlated SQL is the oracle's job (CORRECTNESS gate); this spec
  * pins the plan so a regression to nested-loop or duplicated-scan
  * shapes fails the build (the q_lateral_topk precedent).
  */
class TpchShapesSpec extends AnyFunSuite with SparkTestBase {

  private def phys(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Number of parquet scans of `table` in the optimized logical plan
    * (subqueries included) — the decorrelated forms read a table a
    * FIXED number of times, independent of outer cardinality. */
  private def scansOf(name: String, table: String): Int =
    SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      .collectWithSubqueries {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation if h.location.rootPaths
            .exists(_.toString.contains(s"$table.parquet")) => 1
          case _ => 0
        }
      }.sum

  test("q_tpch_q4: EXISTS plans as ONE semi join with residual condition") {
    val p = phys("q_tpch_q4")
    assert(p.contains("LeftSemi"), "expected a LeftSemi join in:\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(scansOf("q_tpch_q4", "lineitem") == 1)
  }

  test("q_tpch_q21: EXISTS + NOT EXISTS plan as one semi + one anti join") {
    val p = phys("q_tpch_q21")
    assert(p.contains("LeftSemi"), "expected a LeftSemi join in:\n" + p)
    assert(p.contains("LeftAnti"), "expected a LeftAnti join in:\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_tpch_q13: orders predicate stays on the outer join's inner side") {
    val p = phys("q_tpch_q13")
    assert(p.contains("Outer"), "expected an outer join in:\n" + p)
    // the census must cover EVERY customer — if the orders predicate
    // were pushed wrongly and the join flipped inner, zero-order
    // customers would drop and the total would fall short
    val rows = SparkEntry.queries("q_tpch_q13")(spark, sf).collect()
    val nCust = Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nCust, "census lost customers")
  }

  test("q_tpch_q13: zero-order customers survive as a c_count = 0 census row") {
    // sf0.001 happens to have no zero-order customer, so synthesize
    // one: same tables with every order of one customer stripped —
    // an inner-flipped join loses that customer; the outer join must
    // report it at c_count = 0
    import org.apache.spark.sql.functions.{col, min}
    val dir = java.nio.file.Files.createTempDirectory("graft-q13").toString
    val c = Tables.customer(spark, sf)
    c.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val victim = c.agg(min(col("c_custkey"))).head().getLong(0)
    Tables.orders(spark, sf).filter(col("o_custkey") =!= victim)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("q_tpch_q13")(spark, dir).collect()
    assert(rows.exists(_.getLong(0) == 0L),
      "zero-order customer lost — the outer join degenerated to inner")
  }

  test("q_tpch_q17 and q_tpch_q2: correlated aggregate = two scans, not per-row") {
    assert(scansOf("q_tpch_q17", "lineitem") <= 2)
    assert(scansOf("q_tpch_q2", "lineitem") <= 2)
    for (n <- Seq("q_tpch_q17", "q_tpch_q2", "q_tpch_q18")) {
      val p = phys(n)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$n plans a rescan shape")
    }
  }

  test("q_tpch_q19: three OR-brackets stay ONE hash join on partkey") {
    val p = phys("q_tpch_q19")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "expected a single hash/merge join in:\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "DNF brackets degenerated to a non-equi join:\n" + p)
    assert(scansOf("q_tpch_q19", "lineitem") == 1 &&
      scansOf("q_tpch_q19", "part") == 1,
      "OR-brackets must not fan out into a union of scans")
  }

  test("q_tpch_q20: nested correlated IN = two aggregates + semi join, bounded scans") {
    val p = phys("q_tpch_q20")
    assert(p.contains("LeftSemi"), "expected a LeftSemi join in:\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(scansOf("q_tpch_q20", "lineitem") <= 2,
      "per-part total must come from ONE extra aggregate, not per-row rescans")
  }

  test("q_tpch_q16: NOT IN plans as an anti join, q_tpch_q22 as anti + 1-row cross") {
    val p16 = phys("q_tpch_q16")
    assert(p16.contains("LeftAnti"), "expected a LeftAnti join in:\n" + p16)
    val p22 = phys("q_tpch_q22")
    assert(p22.contains("LeftAnti"), "expected a LeftAnti join in:\n" + p22)
    // the only nested-loop allowed in q22 is the 1-row stats cross
    // (whitelisted in PlanGuardSpec); orders must join hash-anti
    assert(scansOf("q_tpch_q22", "orders") == 1)
  }

  test("q_tpch_q15: scalar max joins back as a broadcast equi join, fixed scans") {
    val p = phys("q_tpch_q15")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "max-revenue selection must be an equi join on the value:\n" + p)
    assert(scansOf("q_tpch_q15", "lineitem") <= 2)
  }
}
