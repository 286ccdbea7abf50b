package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The q_regression bug class: a sum whose PER-ROW terms fit a long
  * but whose ACCUMULATED total does not silently wraps when the
  * aggregation buffer is LongType. These specs drive the two widest
  * accumulators in the catalog at synthetic 10⁸-row-scale magnitudes
  * (sums past Long.Max) and assert exactness against driver-side
  * BigInt arithmetic — the 100 TB failure reproduced at test size. */
class AccumulatorWidthSpec extends AnyFunSuite with SparkTestBase {

  test("regression sufficient statistics stay exact past Long.Max") {
    // 200k rows with y ≈ 1e7 cents: Σy² ≈ 2e19 > Long.Max (9.2e18) —
    // the same magnitude the real query hits at sf0.1
    val n = 200000
    val tmp = Files.createTempDirectory("graft-acc").toString
    spark.range(n).select(
        (col("id") % 50 + 1).cast("double").as("l_quantity"),
        ((lit(9999999L) - col("id") % 1000).cast("double") / 100)
          .as("l_extendedprice"))
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val row = Queries.qRegression(spark, tmp).head()

    // driver-side exact reference: BigInt sufficient statistics, then
    // the identical truncating integer-division chain the query
    // performs (BigInt '/' and Spark 'div' both truncate toward zero)
    var (sx, sy, sxy, sxx, syy) =
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))
    (0 until n).foreach { i =>
      val x = BigInt(i % 50 + 1); val y = BigInt(9999999L - i % 1000)
      sx += x; sy += y; sxy += x * y; sxx += x * x; syy += y * y
    }
    assert(syy > BigInt(Long.MaxValue), "test must exceed Long range")
    val bn = BigInt(n)
    val a = bn * sxy - sx * sy
    val b = bn * sxx - sx * sx
    val c = bn * syy - sy * sy
    val slopeMicro = (a * 1000000) / b
    val interceptMicro = (sy * 1000000 - slopeMicro * sx) / bn
    // r² referee is the EXACT rational floor ⌊a²·10⁹/(b·c)⌋ — no
    // intermediate truncation at all, so this asserts the query's
    // pre-scaled n²-normalized chain (whose worst-case truncation is
    // sized < 1 ppb) lands on the true value, not merely on a chain
    // that mirrors the query's own roundoff. On this data the exact
    // value is 2499002.499… ppb ⇒ floor 2499002.
    val r2Ppb = (a * a * 1000000000) / (b * c)
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == slopeMicro.toLong,
      s"slope_micro ${row.getLong(1)} != $slopeMicro")
    assert(row.getLong(2) == interceptMicro.toLong,
      s"intercept ${row.getLong(2)} != $interceptMicro")
    assert(row.getLong(3) == r2Ppb.toLong,
      s"r2_ppb ${row.getLong(3)} != $r2Ppb")
  }

  test("r2 chain lands on the exact rational floor across randomized datasets") {
    // The r2 derivation has regressed twice (r7: BIGINT-quotient wrap;
    // r8: an unscaled var(y)-sized truncation, +6.5 ppb) — both times
    // with the mirrored oracle green, because engine parity cannot see
    // shared roundoff. This property test is the independent referee
    // across data shapes: for each seeded dataset, the query's
    // pre-scaled integer chain must land within 1 of
    // ⌊a²·10⁹/(b·c)⌋ computed in exact BigInt rationals (the chain's
    // truncation budget is < 1 ppb, so only an exact value within
    // 1 ppb of an integer boundary may floor one unit differently).
    val rng = new scala.util.Random(20260813L)
    for (trial <- 1 to 5) {
      val n = 5000 + rng.nextInt(20000)
      // quantities 1..50 like lineitem; prices span cents magnitudes
      // from 10³ to 10⁷ with a quantity-correlated component so r²
      // sweeps from near-0 to substantial across trials
      val slope = rng.nextInt(200000)
      val base = 1000 + rng.nextInt(9999000)
      val noise = 1 + rng.nextInt(2000000)
      val rows = (0 until n).map { _ =>
        val x = 1 + rng.nextInt(50)
        val y = base.toLong + slope.toLong * x + rng.nextInt(noise)
        (x.toDouble, y / 100.0)
      }
      val tmp = Files.createTempDirectory(s"graft-r2-$trial").toString
      import spark.implicits._
      rows.toDF("l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
      val got = Queries.qRegression(spark, tmp).head().getLong(3)
      var (sx, sy, sxy, sxx, syy) =
        (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))
      rows.foreach { case (xd, yd) =>
        val x = BigInt(xd.toLong); val y = BigInt(math.round(yd * 100))
        sx += x; sy += y; sxy += x * y; sxx += x * x; syy += y * y
      }
      val bn = BigInt(n)
      val (a, b, c) = (bn * sxy - sx * sy, bn * sxx - sx * sx, bn * syy - sy * sy)
      val exact = (a * a * 1000000000) / (b * c)
      assert((BigInt(got) - exact).abs <= 1,
        s"trial $trial (n=$n slope=$slope): r2_ppb $got vs exact $exact")
    }
  }

  test("sim-join pair-volume gate stays exact past Long.Max and handles empty input") {
    import spark.implicits._
    // one hot token across 3.1e9 docs: its df² alone exceeds Long.Max
    val dfs = Seq(3100000000L, 2900000000L, 7L)
    val dfreq = dfs.toDF("df").select(lit("t").as("tok"), col("df"))
    val expected = dfs.map(d => BigInt(d) * BigInt(d)).sum
    assert(expected > BigInt(Long.MaxValue))
    assert(BigInt(Dedup.pairVolume(dfreq).toBigInteger) == expected)
    // empty relation: NULL sum must coalesce to zero, not NPE
    val empty = Seq.empty[Long].toDF("df").select(lit("t").as("tok"), col("df"))
    assert(Dedup.pairVolume(empty).signum() == 0)
  }
}
