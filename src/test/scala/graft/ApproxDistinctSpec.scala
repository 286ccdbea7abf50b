package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ApproxDistinct

class ApproxDistinctSpec extends AnyFunSuite with SparkTestBase {

  private def hasDistinctAgg(plan: LogicalPlan): Boolean =
    plan.collect { case n => n }.exists(_.expressions.exists(_.collect {
      case ae: AggregateExpression if ae.isDistinct => ae
    }.nonEmpty))

  test("rewrite fires: no distinct aggregate survives, values = floor(HLL)") {
    val df = Queries.qApproxRewrite(spark, sf)
    assert(!hasDistinctAgg(df.queryExecution.optimizedPlan),
      "count(DISTINCT) should have been rewritten to the sketch")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // referee: the standalone operator the rule is defined to equal
    val ref = operators.Sketches
      .hllDistinct(Tables.orders(spark, sf), Seq("o_orderstatus"), col("o_custkey"))
      .collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        math.floor(r.getAs[Double]("hll_est")).toLong)
      .toMap
    assert(got == ref)
    // the estimate is within the ~6.5% HLL band of the exact answer
    val exact = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (k, est) =>
      val e = exact(k).toDouble
      assert(math.abs(est - e) / e < 0.2, s"$k: est $est vs exact $e")
    }
  }

  test("a plain session keeps the exact plan and the exact answer") {
    val df = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"))
    assert(hasDistinctAgg(df.queryExecution.optimizedPlan))
  }

  test("guards: multi-aggregate, global, and expression-key queries keep exact plans") {
    val as = ApproxDistinct.sessionWith(spark)
    val orders = Tables.orders(as, sf)
    // a second aggregate call alongside the distinct count
    val multi = orders.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"), sum(col("o_totalprice")).as("s"))
    assert(hasDistinctAgg(multi.queryExecution.optimizedPlan))
    // global (ungrouped) distinct count: empty-input 0 contract
    val global = orders.agg(countDistinct(col("o_custkey")).as("n"))
    assert(hasDistinctAgg(global.queryExecution.optimizedPlan))
    assert(global.collect().head.getLong(0) > 0)
    // non-attribute grouping key
    val exprKey = orders.groupBy((col("o_orderkey") % 7).as("b"))
      .agg(countDistinct(col("o_custkey")).as("n"))
    assert(hasDistinctAgg(exprKey.queryExecution.optimizedPlan))
    // and the rewritten session still answers correctly elsewhere: the
    // simple grouped shape rewrites and floors to the sketch value
    val simple = orders.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"))
    assert(!hasDistinctAgg(simple.queryExecution.optimizedPlan))
  }

  test("rewrite handles multiple grouping attributes") {
    val as = ApproxDistinct.sessionWith(spark)
    val df = Tables.orders(as, sf)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n"))
    assert(!hasDistinctAgg(df.queryExecution.optimizedPlan))
    val ref = operators.Sketches
      .hllDistinct(Tables.orders(spark, sf),
        Seq("o_orderstatus", "o_orderpriority"), col("o_custkey"))
      .collect()
      .map(r => (r.getAs[String]("o_orderstatus"),
        r.getAs[String]("o_orderpriority")) ->
        math.floor(r.getAs[Double]("hll_est")).toLong)
      .toMap
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == ref)
  }

  test("rewrite composes with a filter below and a sort above") {
    val as = ApproxDistinct.sessionWith(spark)
    val df = Tables.orders(as, sf)
      .filter(col("o_totalprice") > 1000.0)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .orderBy(col("o_orderstatus"))
    assert(!hasDistinctAgg(df.queryExecution.optimizedPlan))
    val ref = operators.Sketches
      .hllDistinct(Tables.orders(spark, sf).filter(col("o_totalprice") > 1000.0),
        Seq("o_orderstatus"), col("o_custkey"))
      .collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        math.floor(r.getAs[Double]("hll_est")).toLong)
      .toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }
}
