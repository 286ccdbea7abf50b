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

  test("companion aggregates rewrite alongside the sketch with EXACT values") {
    val as = ApproxDistinct.sessionWith(spark)
    val df = Tables.orders(as, sf)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("nd"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"),
        count(lit(1)).as("n_orders"),
        max(col("o_totalprice")).as("max_price"))
    assert(!hasDistinctAgg(df.queryExecution.optimizedPlan),
      "mixed distinct+companion aggregate should rewrite whole")
    val got = df.collect().map(r => r.getAs[String]("o_orderstatus") -> r).toMap
    // companions must be EXACT (only the distinct count is sketched)
    val exact = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"),
        count(lit(1)).as("n_orders"),
        max(col("o_totalprice")).as("max_price"))
      .collect().map(r => r.getString(0) -> r).toMap
    val hll = operators.Sketches
      .hllDistinct(Tables.orders(spark, sf), Seq("o_orderstatus"), col("o_custkey"))
      .collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        math.floor(r.getAs[Double]("hll_est")).toLong).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (k, r) =>
      assert(r.getAs[java.math.BigDecimal]("rev") ==
        exact(k).getAs[java.math.BigDecimal]("rev"), s"$k revenue drifted")
      assert(r.getAs[Long]("n_orders") == exact(k).getAs[Long]("n_orders"))
      assert(r.getAs[Double]("max_price") == exact(k).getAs[Double]("max_price"))
      assert(r.getAs[Long]("nd") == hll(k), s"$k sketch value drifted")
    }
  }

  test("guards: global, expression-key, avg-companion queries keep exact plans") {
    val as = ApproxDistinct.sessionWith(spark)
    val orders = Tables.orders(as, sf)
    // global (ungrouped) distinct count: empty-input 0 contract
    val global = orders.agg(countDistinct(col("o_custkey")).as("n"))
    assert(hasDistinctAgg(global.queryExecution.optimizedPlan))
    assert(global.collect().head.getLong(0) > 0)
    // non-attribute grouping key
    val exprKey = orders.groupBy((col("o_orderkey") % 7).as("b"))
      .agg(countDistinct(col("o_custkey")).as("n"))
    assert(hasDistinctAgg(exprKey.queryExecution.optimizedPlan))
    // avg is not re-aggregable from partials in double — refuse
    val withAvg = orders.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"), avg(col("o_totalprice")).as("a"))
    assert(hasDistinctAgg(withAvg.queryExecution.optimizedPlan))
    // two distinct counts — refused by this rule (Spark's own
    // RewriteDistinctAggregates expands them into Expand form before
    // user rules run, so the isDistinct flag is gone from the
    // optimized plan either way; exact VALUES prove no sketch fired)
    val twoDistinct = orders.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n1"),
        countDistinct(col("o_orderpriority")).as("n2"))
    val tdExact = Tables.orders(spark, sf).groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n1"),
        countDistinct(col("o_orderpriority")).as("n2"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    twoDistinct.collect().foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == tdExact(r.getString(0)),
        "multi-distinct values must stay exact")
    }
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
