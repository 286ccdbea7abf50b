package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Spatial

/** Hand-computed fixtures for the spatial family: grid neighbor join
  * (incl. cell-boundary pairs the blocking must not miss) and the
  * deterministic DBSCAN role/cluster assignment. */
class SpatialSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def pts(rows: (Long, Long, Long)*) =
    rows.toDF("pid", "xi", "yi")

  test("gridNeighborPairs: exact pairs incl. cross-cell boundary pair") {
    // eps2 = 100 (eps = 10, cellW = 11). Points 1–2 are 6 apart on x
    // (same cell); 3–4 straddle a cell boundary at distance 2;
    // 5 is isolated (distance 50+ from everything).
    val p = pts((1L, 100L, 100L), (2L, 106L, 100L),
      (3L, 10L, 200L), (4L, 12L, 200L), (5L, 500L, 500L))
    val got = Spatial.gridNeighborPairs(p, 100L)
      .orderBy(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 36L), (3L, 4L, 4L)))
  }

  test("gridNeighborPairs: pair at exactly eps is kept, eps+1 dropped") {
    val p = pts((1L, 0L, 0L), (2L, 10L, 0L), (3L, 0L, 30L), (4L, 0L, 41L))
    val got = Spatial.gridNeighborPairs(p, 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L))) // d2(3,4)=121 > 100 dropped
  }

  test("dbscan: core/border/noise roles and min-rep border assignment") {
    // eps2 = 100, minPts = 2.
    // Chain 1-2-3 spaced 8 apart: 2 has deg 2 (core); 1 and 3 have
    // deg 1 (border of cluster rep=2 — the only core).
    // Pair 10-11: both deg 1 -> no core -> both noise.
    // 20 isolated -> noise.
    val p = pts((1L, 0L, 0L), (2L, 8L, 0L), (3L, 16L, 0L),
      (10L, 1000L, 0L), (11L, 1008L, 0L), (20L, 5000L, 5000L))
    val got = Spatial.dbscan(p, 100L, 2L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set((2L, "core", 2L), (1L, "border", 2L),
      (3L, "border", 2L)))
  }

  test("dbscan: isolated core forms a singleton cluster; border joins min rep") {
    // eps2 = 100, minPts = 2.
    // Stars: core 1 with sats 2,3 (deg 1 each); core 7 with sats 8,9.
    // Bridge point 5 is within eps of BOTH cores (via y axis),
    // giving cores deg 3, bridge deg 2 -> bridge is CORE and merges
    // the two stars into one cluster rep=1.
    // Separately: core 30 with sats 31,32 stays its own cluster.
    val p = pts(
      (1L, 0L, 0L), (2L, 8L, 0L), (3L, 0L, 8L),
      (5L, 0L, 9L), // d2(1,5)=81, d2(3,5)=1, d2(7,5)=81 via (0,18)
      (7L, 0L, 18L), (8L, 8L, 18L), (9L, 0L, 26L),
      (30L, 2000L, 0L), (31L, 2008L, 0L), (32L, 2000L, 8L))
    val out = Spatial.dbscan(p, 100L, 2L)
    val byPid = out.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byPid(1L) === (("core", 1L)))
    assert(byPid(5L)._2 === 1L) // bridge merged both stars under rep 1
    assert(byPid(7L) === (("core", 1L)))
    assert(byPid(30L) === (("core", 30L)))
    assert(byPid(31L) === (("border", 30L)))
    assert(byPid.size === 10) // every point here is core or border
  }

  test("gridNeighborPairs matches naive O(n²) on a pseudo-random set") {
    // 120 hash-placed points in a 1000×1000 box, eps2 = 2500
    val p = spark.range(120).select(col("id").as("pid"),
      operators.Sketches.hash32(col("id") * 2 + 1).mod(1000L).as("xi"),
      operators.Sketches.hash32(col("id") * 2).mod(1000L).as("yi"))
    val naive = p.alias("a").crossJoin(p.alias("b"))
      .filter(col("a.pid") < col("b.pid"))
      .withColumn("d2",
        (col("a.xi") - col("b.xi")) * (col("a.xi") - col("b.xi")) +
          (col("a.yi") - col("b.yi")) * (col("a.yi") - col("b.yi")))
      .filter(col("d2") <= 2500L)
      .select(col("a.pid").as("id_a"), col("b.pid").as("id_b"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val grid = Spatial.gridNeighborPairs(p, 2500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty && grid === naive)
  }
}
