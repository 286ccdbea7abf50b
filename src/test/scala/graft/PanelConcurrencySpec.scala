package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dedup ensemble agreement and peak session concurrency. */
class PanelConcurrencySpec extends AnyFunSuite with SparkTestBase {

  test("q_dedup_panel: histogram partitions the candidate set, methods bounded") {
    val rows = Queries.qDedupPanel(spark, sf).collect()
    assert(rows.nonEmpty)
    val m = rows.map(r => r.getAs[String]("metric") -> r.getAs[Long]("n")).toMap
    val histTotal = m.collect { case (k, v) if k.startsWith("votes_") => v }.sum
    // every method's positive count is bounded by the candidate count
    Seq("m_exact", "m_minhash", "m_simhash", "m_edit").foreach { k =>
      assert(m.contains(k))
      assert(m(k) >= 0 && m(k) <= histTotal, s"$k out of range")
    }
    // vote-weighted histogram mass equals the sum of method positives
    val weighted = m.collect { case (k, v) if k.startsWith("votes_") =>
      k.stripPrefix("votes_").toLong * v }.sum
    assert(weighted == Seq("m_exact", "m_minhash", "m_simhash", "m_edit")
      .map(m).sum, "votes histogram and method counts must reconcile")
  }

  test("q_peak_concurrency: peak bounded by sessions and by users") {
    val rows = Queries.qPeakConcurrency(spark, sf).collect()
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    rows.foreach { r =>
      val peak = r.getAs[Long]("peak")
      assert(peak >= 1)
      assert(peak <= r.getAs[Long]("n_sessions"))
      // one session per (user, type) can be active at once
      assert(peak <= users)
      assert(r.getAs[Long]("peak_at") > 0)
    }
  }
}
