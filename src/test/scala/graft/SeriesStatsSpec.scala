package graft

import org.scalatest.funsuite.AnyFunSuite

/** Time-series & statistical-test queries added in round 13: lagged
  * cross-correlation, dense-grid peak detection, Flesch readability,
  * Welch t², Nelson–Aalen hazard. */
class SeriesStatsSpec extends AnyFunSuite with SparkTestBase {

  test("q_crosscorr: one row per lag, shrinking n, r2 bounded") {
    val rows = Queries.qCrossCorr(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("lag_h")).toSeq == (0L to 6L).toSeq)
    val ns = rows.map(_.getAs[Long]("n"))
    // dense-grid alignment: each extra lag hour drops exactly one pair
    assert(ns.zip(ns.tail).forall { case (a, b) => b == a - 1 })
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("r_sign")) <= 1)
      val r2 = r.getAs[java.lang.Long]("r2_ppm")
      if (r2 != null) assert(r2 >= 0 && r2 <= 1000000L,
        s"r2 out of [0,1] ppm: $r2")
    }
  }

  test("q_peak_detect: every peak strictly dominates its 4 dense neighbors") {
    import org.apache.spark.sql.functions._
    val rows = Queries.qPeakDetect(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute the dense hourly series per type and re-check each peak
    val ev = Tables.events(spark, sf)
      .select(expr("ts div 3600000000000").as("h"), col("event_type"))
    val cnt = ev.groupBy(col("event_type"), col("h")).count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val (t, h, c) = (r.getAs[String]("event_type"), r.getAs[Long]("h"),
        r.getAs[Long]("c"))
      def at(dh: Long) = cnt.getOrElse((t, h + dh), 0L)
      assert(c == at(0))
      assert(c > at(-1) && c > at(-2) && c > at(1) && c > at(2),
        s"non-peak emitted at ($t,$h)")
      assert(c * 10 >= r.getAs[Long]("sum5") * 3)
    }
  }

  test("q_readability: per-source stats bracket the average") {
    val rows = Queries.qReadability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Long]("min_flesch_milli") <=
        r.getAs[Long]("avg_flesch_milli"))
      assert(r.getAs[Long]("avg_flesch_milli") <=
        r.getAs[Long]("max_flesch_milli"))
    }
  }

  test("q_welch_ttest: t2 non-negative, mean-difference magnitude sane") {
    val rows = Queries.qWelchTtest(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n1") >= 2 && r.getAs[Long]("n2") >= 2)
      assert(math.abs(r.getAs[Long]("d_sign")) <= 1)
      assert(r.getAs[Long]("md_milli") >= 0)
      val t2 = r.getAs[java.lang.Long]("t2_milli")
      if (t2 != null) assert(t2 >= 0)
    }
  }

  test("q_activity_streaks: runs are genuinely consecutive and maximal") {
    val rows = Queries.qActivityStreaks(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val lens = rows.map(_.getAs[Long]("len"))
    assert(lens.zip(lens.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      // a run's length equals its day span (consecutive by the idiom)
      assert(r.getAs[Long]("end_day") - r.getAs[Long]("start_day") + 1 ==
        r.getAs[Long]("len"))
      assert(r.getAs[Long]("len") >= 1 && r.getAs[Long]("len") <= 31)
    }
  }

  test("q_hazard_km: risk sets non-increasing, cumulative hazard non-decreasing") {
    val rows = Queries.qHazardKm(spark, sf).collect()
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("n_risk") <= users)
    val risks = rows.map(_.getAs[Long]("n_risk"))
    assert(risks.zip(risks.tail).forall { case (a, b) => b <= a },
      "risk set must shrink over time")
    val ch = rows.map(_.getAs[Long]("ch_ppm"))
    assert(ch.zip(ch.tail).forall { case (a, b) => b >= a })
    rows.foreach { r =>
      assert(r.getAs[Long]("d_ev") > 0)
      assert(r.getAs[Long]("d_ev") <= r.getAs[Long]("n_risk"))
      assert(r.getAs[Long]("h_ppm") <= 1000000L)
    }
  }
}
