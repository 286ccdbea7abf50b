package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{RangeBinJoin, RangeBinJoinRule}

/** The automatic range-join binning rule: result parity with the
  * nested-loop plan, the rewritten plan shape, and its guard rails. */
class RangeBinJoinSpec extends AnyFunSuite with SparkTestBase {

  private def pointsAndIntervals(s: org.apache.spark.sql.SparkSession) = {
    val ev = Tables.events(s, sf)
    val points = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("value").as("v"))
    val ivals = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("value").as("lo"),
              (col("value") + lit(25.0)).as("hi"))
    (points, ivals)
  }

  test("binned rewrite is result-identical to the nested-loop range join") {
    val (p0, i0) = pointsAndIntervals(spark)
    val plain = p0.join(i0, col("v") >= col("lo") && col("v") < col("hi"))
      .select("c_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val s2 = RangeBinJoin.sessionWith(spark, binSize = 32.0)
    val (p1, i1) = pointsAndIntervals(s2)
    val binned = p1.join(i1, col("v") >= col("lo") && col("v") < col("hi"))
      .select("c_id", "p_id")
    val got = binned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got === plain)
    assert(plain.nonEmpty, "fixture produced no in-window pairs — test is vacuous")
  }

  test("rewritten plan is an equi-join on the bin key, not a nested loop") {
    val s2 = RangeBinJoin.sessionWith(spark, binSize = 32.0)
    val (p, i) = pointsAndIntervals(s2)
    val df = p.join(i, col("v") >= col("lo") && col("v") < col("hi"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("__graft_bin"),
      s"rule did not fire:\n$optimized")
    val physical = df.queryExecution.sparkPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
           !physical.contains("CartesianProduct"),
      s"still a nested-loop plan:\n$physical")
  }

  test("rule leaves equi-joins and unconfigured sessions alone") {
    // no binSize conf -> rule disabled even when registered
    val bare = spark.newSession()
    bare.experimental.extraOptimizations =
      bare.experimental.extraOptimizations :+ RangeBinJoinRule
    val (p0, i0) = pointsAndIntervals(bare)
    val off = p0.join(i0, col("v") >= col("lo") && col("v") < col("hi"))
    assert(!off.queryExecution.optimizedPlan.toString.contains("__graft_bin"))

    // join already has a cross-side equi-conjunct -> no rewrite
    val s2 = RangeBinJoin.sessionWith(spark, binSize = 32.0)
    val ev = Tables.events(s2, sf)
    val a = ev.select(col("event_id").as("aid"), col("user_id").as("au"),
                      col("value").as("av"))
    val b = ev.select(col("event_id").as("bid"), col("user_id").as("bu"),
                      col("value").as("bv"))
    val equi = a.join(b, col("au") === col("bu") &&
      col("av") >= col("bv") && col("av") < col("bv") + lit(5.0))
    assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
  }

  test("catalog query q_range_autobin returns rows and fires the rule") {
    val df = Queries.qRangeAutobin(spark, sf)
    assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    assert(df.count() > 0)
  }
}
