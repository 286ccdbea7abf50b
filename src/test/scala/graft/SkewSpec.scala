package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salting operators: result salt-invariance (the oracle property)
  * and the plan shape that actually spreads a hot key. */
class SkewSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("salted aggregation equals unsalted for any bucket count") {
    val li = Tables.lineitem(spark, sf)
    val plain = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(1, 3, 8).foreach { b =>
      val got = Skew.saltedAgg(li, Seq("l_returnflag"),
          Skew.saltCol($"l_orderkey", b), b,
          Seq("n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == plain, s"buckets=$b")
    }
  }

  test("salted aggregation partials shuffle on (key, salt)") {
    val df = Skew.saltedAgg(Tables.lineitem(spark, sf), Seq("l_returnflag"),
      Skew.saltCol($"l_orderkey", 8), 8,
      Seq("n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), "partial aggregate must group by the salt")
  }

  test("salted join equals plain join; small side replicated across buckets") {
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
    val ord = Tables.orders(spark, sf)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    val plain = li.join(ord, "l_orderkey").count()
    val salted = Skew.saltedJoin(li, ord, Seq("l_orderkey"),
      Skew.saltCol($"l_quantity", 8), 8)
    assert(salted.count() == plain)
    // replication really happened: the explode survives to the plan
    assert(salted.queryExecution.optimizedPlan.toString.toLowerCase.contains("explode"))
  }
}
