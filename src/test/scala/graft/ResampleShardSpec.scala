package graft

import org.scalatest.funsuite.AnyFunSuite

/** Permutation inference, item-lift recommendations, and the
  * consistent-hash rebalance audit. */
class ResampleShardSpec extends AnyFunSuite with SparkTestBase {

  test("q_perm_test: single row, p in (0,1], counts partition the sample") {
    val rows = Queries.qPermTest(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val base = Tables.customer(spark, sf)
      .filter(org.apache.spark.sql.functions.col("c_mktsegment")
        .isin("BUILDING", "MACHINERY")).count()
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") == base)
    assert(r.getAs[Long]("n_ge") >= 0 && r.getAs[Long]("n_ge") <= 64)
    val p = r.getAs[Long]("p_ppm")
    // p = (1 + n_ge)/65: minimum 1/65 ppm, maximum 1
    assert(p >= 1000000L / 65 && p <= 1000000L)
    // deterministic resampling: identical on re-run
    assert(Queries.qPermTest(spark, sf).collect().head.toString == r.toString)
  }

  test("q_item_lift: top-3 per item, support floor, symmetric base pairs") {
    val rows = Queries.qItemLift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("a")).foreach { case (_, rs) =>
      val rks = rs.map(_.getAs[Long]("rk")).sorted
      assert(rks.length <= 3 && rks.sameElements(1L to rks.length))
      // ranks follow descending lift with id tiebreak
      val byRank = rs.sortBy(_.getAs[Long]("rk"))
      val lifts = byRank.map(_.getAs[Long]("lift_ppm"))
      assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y })
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("c_ab") >= 2)
      assert(r.getAs[Long]("lift_ppm") > 0)
    }
    // the directed relation is symmetric before ranking: if (a,b) is
    // a's top pick with lift L, then (b,a) carries the same lift when
    // b keeps it in ITS top-3
    val asMap = rows.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
      r.getAs[Long]("lift_ppm")).toMap
    asMap.foreach { case ((a, b), l) =>
      asMap.get((b, a)).foreach(l2 => assert(l2 == l)) }
  }

  test("q_consistent_shard: ring moves far fewer keys than mod") {
    val rows = Queries.qConsistentShard(spark, sf).collect()
    assert(rows.map(_.getAs[String]("scheme")).toSeq == Seq("mod", "ring"))
    val Array(modR, ringR) = rows
    val n = modR.getAs[Long]("n_keys")
    assert(n == Tables.documents(spark, sf).count())
    assert(ringR.getAs[Long]("n_keys") == n)
    // mod-hash rebalance moves ~8/9 of keys; the ring moves ~1/9.
    // Assert the qualitative separation, not the exact fractions.
    assert(modR.getAs[Long]("moved_ppm") > 700000L,
      s"mod moved only ${modR.getAs[Long]("moved_ppm")} ppm")
    assert(ringR.getAs[Long]("moved_ppm") < 400000L,
      s"ring moved ${ringR.getAs[Long]("moved_ppm")} ppm")
    assert(ringR.getAs[Long]("moved_ppm") < modR.getAs[Long]("moved_ppm"))
  }
}
