package graft

import org.scalatest.funsuite.AnyFunSuite

/** Double-sweep diameter and HLL sketch-union algebra. */
class DiameterHllSpec extends AnyFunSuite with SparkTestBase {

  test("q_diameter_2sweep: second sweep never shrinks the eccentricity") {
    val rows = Queries.qDiameter2Sweep(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    // the double-sweep guarantee: ecc(far) >= ecc(seed)
    assert(r.getAs[Long]("diameter_lb") >= r.getAs[Long]("ecc_seed"))
    assert(r.getAs[Long]("ecc_seed") >= 1)
    assert(r.getAs[Long]("n_reached") >= 1)
    // bipartite construction: customer nodes even, supplier nodes odd
    assert(r.getAs[Long]("seed") % 2 == 0)
  }

  test("q_hll_union: ALL row merges the per-source registers") {
    val rows = Queries.qHllUnion(spark, sf).collect()
    val bySrc = rows.map(r => r.getAs[String]("source") -> r).toMap
    assert(bySrc.contains("ALL"))
    val all = bySrc("ALL")
    val perSrc = rows.filter(_.getAs[String]("source") != "ALL")
    assert(perSrc.nonEmpty)
    // merged register count dominates every component's
    perSrc.foreach { r =>
      assert(all.getAs[Long]("n_buckets_hit") >= r.getAs[Long]("n_buckets_hit"))
      assert(all.getAs[Long]("exact_distinct") >= r.getAs[Long]("exact_distinct"))
    }
    // union cardinality is bounded by the sum of the parts
    assert(all.getAs[Long]("exact_distinct") <=
      perSrc.map(_.getAs[Long]("exact_distinct")).sum)
    // estimator honesty: every error within 25% at these cardinalities
    rows.foreach(r => assert(r.getAs[Long]("err_ppm") <= 250000L,
      s"${r.getAs[String]("source")} err ${r.getAs[Long]("err_ppm")}"))
  }
}
