package graft

import org.scalatest.funsuite.AnyFunSuite

class QueriesSpec extends AnyFunSuite with SparkTestBase {

  test("q1_agg returns grouped pricing summary with exact decimal sums") {
    val rows = Queries.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty)
    // one row per (returnflag, linestatus) combination, sorted
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
    assert(keys.sorted.sameElements(keys))
    // counts sum to total lineitem rows
    val total = rows.map(_.getLong(5)).sum
    assert(total == Tables.lineitem(spark, sf).count())
    rows.foreach { r =>
      assert(r.getDouble(2) > 0) // sum_qty
      assert(r.getDouble(3) > 0) // sum_base_price
    }
  }

  test("every query has a name and every oracle refers to a query") {
    assert(SparkEntry.queries.nonEmpty)
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("grouped top-k plans as WindowGroupLimit, not a full window sort") {
    val df = Queries.qTopkGrouped(spark, sf)
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter did not push a group limit:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // exactly <= 5 per group, ranks dense from 1
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length.toLong))
    }
  }
}
