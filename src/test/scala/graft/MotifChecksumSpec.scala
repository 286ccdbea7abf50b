package graft

import org.scalatest.funsuite.AnyFunSuite

/** SAX motif mining, heavy-change detection, and table fingerprints. */
class MotifChecksumSpec extends AnyFunSuite with SparkTestBase {

  test("q_sax_motifs: top-5 per type, motifs over the 4-letter alphabet") {
    val rows = Queries.qSaxMotifs(spark, sf).collect()
    assert(rows.nonEmpty)
    val motifRe = "^[0-3]-[0-3]-[0-3]$".r
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val rks = rs.map(_.getAs[Long]("rk")).sorted
      assert(rks.length <= 5 && rks.sameElements(1L to rks.length))
      val counts = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("n_days"))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    }
    rows.foreach { r =>
      assert(motifRe.findFirstIn(r.getAs[String]("motif")).isDefined)
      assert(r.getAs[Long]("hour") >= 0 && r.getAs[Long]("hour") <= 21,
        "a 3-gram motif can start no later than hour 21")
      assert(r.getAs[Long]("n_days") >= 1)
    }
  }

  test("q_heavy_change: 10 risers + 10 fallers, ratio consistent with counts") {
    val rows = Queries.qHeavyChange(spark, sf).collect()
    val byRole = rows.groupBy(_.getAs[String]("role"))
    assert(byRole("riser").length == 10 && byRole("faller").length == 10)
    rows.foreach { r =>
      val (c1, c2) = (r.getAs[Long]("c1"), r.getAs[Long]("c2"))
      assert(r.getAs[Long]("ratio_ppm") == (c2 + 1) * 1000000L / (c1 + 1))
    }
    // with >= 20 distinct users the two TakeOrdered legs select
    // disjoint users, so the riser ratios must dominate the fallers';
    // below that the legs overlap and dominance is not an invariant
    val users = Tables.events(spark, sf).select("user_id")
      .distinct().count()
    if (users >= 20) {
      val rMin = byRole("riser").map(_.getAs[Long]("ratio_ppm")).min
      val fMax = byRole("faller").map(_.getAs[Long]("ratio_ppm")).max
      assert(rMin >= fMax, "riser set must dominate faller set")
    }
  }

  test("q_table_checksum: stable fingerprint, changes when a row changes") {
    val rows = Queries.qTableChecksum(spark, sf).collect()
    assert(rows.map(_.getAs[String]("tbl")).toSeq ==
      Seq("customer", "nation", "region"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") > 0)
      val cs = r.getAs[Long]("checksum")
      assert(cs >= 0 && cs < 1000000007L)
    }
    // row-order independence: identical on re-run (plans reshuffle)
    val again = Queries.qTableChecksum(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
