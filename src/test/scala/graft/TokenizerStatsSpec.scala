package graft

import org.scalatest.funsuite.AnyFunSuite

/** Iterative BPE training, EB shrinkage, ordered-set aggregates. */
class TokenizerStatsSpec extends AnyFunSuite with SparkTestBase {

  test("q_bpe_merges: five rounds, non-increasing counts, merged pairs compose") {
    val rows = Queries.qBpeMerges(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("step")).toSeq == (1L to 5L))
    rows.foreach { r =>
      val p = r.getAs[String]("pair")
      assert(p.split(" ").length == 2, s"pair must be two symbols: $p")
      assert(r.getAs[Long]("n_merged") >= 1)
    }
    // a later round may merge a symbol built by an earlier one, but a
    // round's count can never exceed round 1's (the global max)
    val counts = rows.map(_.getAs[Long]("n_merged"))
    assert(counts.tail.forall(_ <= counts.head))
    // deterministic training run
    val again = Queries.qBpeMerges(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q_eb_shrinkage: shrinkage pulls rates toward the prior") {
    val rows = Queries.qEbShrinkage(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n"), r.getAs[Long]("k"))
      assert(k <= n)
      val raw = r.getAs[Long]("raw_ppm")
      val shrunk = r.getAs[Long]("shrunk_ppm")
      assert(raw == k * 1000000L / n)
      // shrunk rate sits between the raw rate and the prior (within
      // 1 ppm of integer truncation on each side)
      assert(shrunk <= math.max(raw, 1000000L) + 1)
      assert(shrunk >= 0)
    }
    val shr = rows.map(_.getAs[Long]("shrunk_ppm"))
    assert(shr.zip(shr.tail).forall { case (a, b) => a >= b })
  }

  test("q_mode_disc: modal segment really is the max, median is a data value") {
    val rows = Queries.qModeDisc(spark, sf).collect()
    assert(rows.nonEmpty)
    val segCounts = Tables.customer(spark, sf)
      .groupBy("c_nationkey", "c_mktsegment").count().collect()
      .map(r => (r.getInt(0).toLong, r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val nation = r.getAs[Long]("nation")
      val modeN = r.getAs[Long]("mode_n")
      val natCounts = segCounts.collect { case ((n, s), c) if n == nation => (s, c) }
      assert(modeN == natCounts.map(_._2).max,
        s"mode_n must be the max segment count for nation $nation")
      assert(natCounts.map(_._2).sum == r.getAs[Long]("n"))
      // discrete median must be an actual cents value of that nation
      val cents = Tables.customer(spark, sf)
        .filter(org.apache.spark.sql.functions.col("c_nationkey") === nation)
        .selectExpr("CAST(floor(c_acctbal * 100) AS BIGINT)")
        .collect().map(_.getLong(0)).toSet
      assert(cents.contains(r.getAs[Long]("median_cents")))
    }
  }
}
