package graft

import org.scalatest.funsuite.AnyFunSuite

/** Autocomplete prefix index, Fano burstiness, inter-arrival profile. */
class IndexProfileSpec extends AnyFunSuite with SparkTestBase {

  test("q_autocomplete: completions extend their prefix, ranked by frequency") {
    val rows = Queries.qAutocomplete(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, w) = (r.getAs[String]("prefix"), r.getAs[String]("w"))
      assert(w.startsWith(p), s"'$w' does not extend '$p'")
      assert(p.length >= 1 && p.length <= 4)
      assert(r.getAs[Long]("f") >= 2)
    }
    rows.groupBy(_.getAs[String]("prefix")).foreach { case (_, rs) =>
      val byRk = rs.sortBy(_.getAs[Long]("rk"))
      assert(byRk.map(_.getAs[Long]("rk")).sameElements(1L to byRk.length))
      val fs = byRk.map(_.getAs[Long]("f"))
      assert(fs.zip(fs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_fano_burstiness: moments recompute, label matches the value") {
    val rows = Queries.qFanoBurstiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Long]("fano_milli")
      assert(f >= 0)
      val lbl = r.getAs[String]("dispersion")
      if (f > 1100) assert(lbl == "bursty")
      else if (f < 900) assert(lbl == "regular")
      else assert(lbl == "poisson-like")
      assert(r.getAs[Long]("s") > 0 && r.getAs[Long]("n_hours") > 0)
    }
  }

  test("q_minhash_calibration: errors bounded, buckets valid, MAE <= max") {
    val rows = Queries.qMinhashCalibration(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 9)
      val mae = r.getAs[Long]("mae_ppm")
      val mx = r.getAs[Long]("max_err_ppm")
      assert(mae >= 0 && mae <= mx && mx <= 1000000L)
      assert(r.getAs[Long]("n_pairs") > 0)
      // k-hash estimator on near-dup candidates: mean error should be
      // well under half the similarity scale (loose sanity band)
      assert(mae < 500000L)
    }
  }

  test("q_interarrival: p50 <= p90, gaps bounded by the window span") {
    val rows = Queries.qInterarrival(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90) = (r.getAs[Long]("p50_s"), r.getAs[Long]("p90_s"))
      assert(p50 >= 0 && p50 <= p90)
      // no gap can exceed the fixed 30-day observation window
      assert(p90 <= 31L * 86400)
      assert(r.getAs[Long]("n") > 0)
    }
  }
}
