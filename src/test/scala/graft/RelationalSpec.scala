package graft

import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite with SparkTestBase {

  test("semi + anti joins partition orders") {
    // semi(q>45) and anti(q>45) complement each other
    val orders = Tables.orders(spark, sf).count()
    val semi = Queries.qJoinSemi(spark, sf).count()
    val anti = Tables.orders(spark, sf).join(
      Tables.lineitem(spark, sf).filter(org.apache.spark.sql.functions.col("l_quantity") > 45),
      org.apache.spark.sql.functions.col("o_orderkey") ===
        org.apache.spark.sql.functions.col("l_orderkey"), "left_anti").count()
    assert(semi + anti == orders)
  }

  test("topk returns 10 rows in descending price order") {
    val rows = Queries.qTopK(spark, sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("rollup emits grand total row equal to customer count") {
    val rows = Queries.qRollup(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getLong(2) == Tables.customer(spark, sf).count())
  }

  test("window running sum is monotone non-trivial per user") {
    val rows = Queries.qWindowFuncs(spark, sf).limit(100).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.isNullAt(4)))
  }

  test("event window buckets cover all events") {
    val total = Queries.qEventWindow(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("window ranks: quartiles balanced, rank ratios in [0,1], top has prank 0") {
    val rows = Queries.qWindowRanks(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQuartile = rows.groupBy(_.getLong(3)).view.mapValues(_.length).toMap
    assert(byQuartile.keySet == Set(1L, 2L, 3L, 4L))
    assert(byQuartile.values.max - byQuartile.values.min <= 5) // 5 partitions × ±1
    assert(rows.forall { r =>
      val p = r.getDouble(4); val c = r.getDouble(5)
      p >= 0.0 && p <= 1.0 && c > 0.0 && c <= 1.0
    })
    assert(rows.filter(_.getDouble(4) == 0.0).length >= 5) // one rank-1 per partition
  }

  test("binned interval join equals the direct inequality join") {
    import org.apache.spark.sql.functions._
    val hourUs = 3600L * 1000 * 1000
    val ev = Tables.events(spark, sf).withColumn("t_us", expr("ts div 1000"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("t_us").as("p_lo"), (col("t_us") + hourUs).as("p_hi"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
        col("t_us").as("v_lo"), (col("t_us") + hourUs / 2).as("v_hi"))
    // direct (quadratic-per-user) reference join
    val direct = p.join(v, col("user_id") === col("v_user") &&
        col("p_lo") < col("v_hi") && col("v_lo") < col("p_hi"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_overlaps"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val binned = Queries.qIntervalOverlapJoin(spark, sf)
      .select("user_id", "n_overlaps")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(binned == direct)
  }

  test("gap fill: spans are dense per user and observed counts are preserved") {
    import org.apache.spark.sql.functions._
    val filled = Queries.qGapFill(spark, sf)
    val perUser = filled.groupBy("user_id")
      .agg(count(lit(1)).as("rows"), (max("hr") - min("hr") + 1).as("span"),
           sum("n").as("events"))
      .collect()
    perUser.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"user ${r.get(0)}: rows != span")
    }
    val observed = Tables.events(spark, sf)
      .filter(col("user_id") < 50).count()
    assert(perUser.map(_.getLong(3)).sum == observed)
  }

  test("array higher-order functions compute exact integer lambdas") {
    val rows = Queries.qArrayFns(spark, sf).limit(500).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) % 2 == 0, "doubled sum must be even")
      assert(r.getLong(3) >= 1, "min quantity positive")
    }
  }

  test("grouping sets: per-set counts reconcile with the grand total") {
    val rows = Queries.qGroupingSets(spark, sf).collect()
    val grand = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(grand.length == 1)
    val total = grand.head.getLong(4)
    val perNation = rows.filter(r => r.getLong(2) == 0 && r.getLong(3) == 1)
    val perBoth = rows.filter(r => r.getLong(2) == 0 && r.getLong(3) == 0)
    assert(perNation.map(_.getLong(4)).sum == total)
    assert(perBoth.map(_.getLong(4)).sum == total)
  }
}
