package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL-style approximate aggregates: engine-internal sketches are not
  * cross-engine deterministic, so these are spec-checked against exact
  * counts rather than oracle-hashed. */
class ApproxAggSpec extends AnyFunSuite with SparkTestBase {

  test("approx_count_distinct within 5% of exact on events.user_id") {
    val ev = Tables.events(spark, sf)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("KMV distinct estimate is within ~3 std errors of exact; exact below k") {
    import graft.operators.Sketches
    val ev = Tables.events(spark, sf)
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Queries.qApproxDistinctKmv(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    est.foreach { case (et, e) =>
      val x = exact(et).toDouble
      // KMV relative std error ≈ 1/sqrt(k-2) ≈ 6.3% at k=256
      assert(math.abs(e - x) / x < 0.20, s"$et est=$e exact=$x")
    }
    // a low-cardinality column stays exact (fewer than k distinct)
    val small = Sketches.kmvDistinct(ev, Seq.empty[String].:+("event_type"),
      col("event_type"), 256)
    // grouped by event_type, counting distinct event_type per group = 1
    small.collect().foreach(r => assert(r.getDouble(1) == 1.0))
  }

  test("hash sampling is partition-invariant and near the target rate") {
    import graft.operators.Sketches
    val docs = Tables.documents(spark, sf).select(col("doc_id"))
    val thresh = (0.10 * 4294967296.0).toLong
    def sampleIds(parts: Int): Set[Long] =
      docs.repartition(parts)
        .filter(Sketches.hash32(col("doc_id")) < thresh)
        .collect().map(_.getLong(0)).toSet
    val a = sampleIds(1); val b = sampleIds(7)
    assert(a == b, "hash sample must not depend on partitioning")
    val rate = a.size.toDouble / docs.count()
    assert(rate > 0.05 && rate < 0.15, s"rate=$rate") // ~10% of 500 docs
  }

  test("approx_percentile brackets the exact median") {
    val ev = Tables.events(spark, sf)
    val apx = ev.select(percentile_approx(col("value"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    val sorted = ev.select(col("value")).orderBy(col("value"))
      .collect().map(_.getDouble(0))
    val lo = sorted((sorted.length * 0.45).toInt)
    val hi = sorted((sorted.length * 0.55).toInt)
    assert(apx >= lo && apx <= hi, s"approx median $apx outside [$lo,$hi]")
  }
}
