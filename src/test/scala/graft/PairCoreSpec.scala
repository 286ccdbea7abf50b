package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary battery for the candidate-first pair-support core behind
  * q_itemset_pairs / q_item_lift (`SparkEntry.supportedPairs`). The
  * core routes baskets by size (≤256 → per-basket self-join; >256 →
  * containment joins), so every support-2 pair class must be proven
  * against a brute-force reference at the routing boundary itself —
  * the driver testdata never manufactures a big basket at test SF, so
  * without this fixture the big path would only ever run in the sf1
  * skew sweeps.
  *
  * Classes covered: small×small, small(at exactly 256)×small,
  * small×big (cross-class sum), big×big (intersection candidates),
  * big-only support-1 (must be excluded), and the 256/257 threshold
  * routing itself.
  */
class PairCoreSpec extends AnyFunSuite with SparkTestBase {

  /** (orderkey → basket parts). Baskets:
    *  b1/b2: plain small, share {1,2}            → (1,2) support 2
    *  b3: EXACTLY 256 items (2000..2255)         → still small-path
    *  b6: {2000, 2001}                           → (2000,2001) support 2
    *  b4: 259 items (3000..3256 ∪ {2254,2255})   → big-path
    *      (2254,2255) also ⊂ b3                  → small+big = 2
    *  b5: 300 items (3250..3256 ∪ 4000..4292)    → big-path
    *      b4∩b5 = {3250..3256}                   → C(7,2)=21 pairs, 2 each
    *  every other b4/b5-only pair has support 1  → excluded
    */
  private val baskets: Map[Long, Seq[Long]] = Map(
    1L -> Seq(1L, 2L, 3L),
    2L -> Seq(1L, 2L, 4L),
    3L -> (2000L to 2255L),
    4L -> ((3000L to 3256L) ++ Seq(2254L, 2255L)),
    5L -> ((3250L to 3256L) ++ (4000L to 4292L)),
    6L -> Seq(2000L, 2001L)
  )

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-paircore").toString
    baskets.toSeq.flatMap { case (ok, pks) => pks.map(pk => (ok, pk)) }
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  /** Brute-force support counts from the basket definitions (driver
    * side, tiny): every unordered pair within every basket. */
  private lazy val expected: Map[(Long, Long), Long] = {
    val counts = scala.collection.mutable.Map[(Long, Long), Long]()
    for {
      pks <- baskets.values
      sorted = pks.distinct.sorted
      i <- sorted.indices
      j <- (i + 1) until sorted.length
    } counts((sorted(i), sorted(j))) =
      counts.getOrElse((sorted(i), sorted(j)), 0L) + 1L
    counts.filter(_._2 >= 2L).toMap
  }

  test("expected fixture pair classes are all present") {
    // the fixture must actually manufacture every class it claims
    assert(expected((1L, 2L)) == 2L)          // small×small
    assert(expected((2000L, 2001L)) == 2L)    // threshold-small × small
    assert(expected((2254L, 2255L)) == 2L)    // small×big cross-class
    assert(expected.count { case ((a, b), _) =>
      a >= 3250L && b <= 3256L } == 21)       // big×big intersection
    assert(expected.size == 24)
    assert(!expected.contains((3000L, 3001L))) // big-only support 1
  }

  test("q_itemset_pairs matches brute force over every routing boundary") {
    val got = SparkEntry.queries("q_itemset_pairs")(spark, fixtureDir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(got == expected)
  }

  test("q_item_lift emits both directions of each supported pair with exact lift") {
    val rows = SparkEntry.queries("q_item_lift")(spark, fixtureDir).collect()
    val directed = rows.map(r =>
      (r.getLong(r.fieldIndex("a")), r.getLong(r.fieldIndex("b")))).toSet
    // (1,2) support 2: margins c_1 = c_2 = 2, N = 6 orders
    // lift_ppm = 2*6*1e6 div (2*2) = 3_000_000, and both directions rank
    assert(directed.contains((1L, 2L)) && directed.contains((2L, 1L)))
    val lift12 = rows.find(r => r.getLong(r.fieldIndex("a")) == 1L &&
      r.getLong(r.fieldIndex("b")) == 2L).get
    assert(lift12.getLong(lift12.fieldIndex("c_ab")) == 2L)
    assert(lift12.getLong(lift12.fieldIndex("lift_ppm")) == 3000000L)
  }
}
