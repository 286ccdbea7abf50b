package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BitmapOps

/** [[graft.functions.PackedAndPopcountExpr]] against the per-word SQL
  * form it replaces — codegen path (DataFrame exec) and interpreted
  * eval must both agree with Σ bit_count(a_i & b_i). */
class BitmapOpsSpec extends AnyFunSuite with SparkTestBase {

  test("packed AND-popcount equals the per-word bit_count sum (codegen + eval)") {
    import spark.implicits._
    val words = 7 // odd on purpose: loop bound ≠ power of two
    val rnd = new scala.util.Random(42)
    val rows = (1 to 64).map { i =>
      (i.toLong, Seq.fill(words)(rnd.nextLong()), Seq.fill(words)(rnd.nextLong()))
    }
    val df = rows.toDF("id", "aw", "bw")
      .select(col("id"),
        BitmapOps.pack_longs((0 until words).map(w => expr(s"aw[$w]"))).as("a"),
        BitmapOps.pack_longs((0 until words).map(w => expr(s"bw[$w]"))).as("b"),
        (0 until words)
          .map(w => expr(s"CAST(bit_count(aw[$w] & bw[$w]) AS BIGINT)"))
          .reduce(_ + _).as("expected"))
      .withColumn("got", BitmapOps.packed_and_popcount(col("a"), col("b")))
    val bad = df.filter(col("got") =!= col("expected")).count()
    assert(bad == 0L, s"$bad rows disagree with the per-word form")
    // interpreted eval path (no codegen): same arithmetic
    rows.take(8).foreach { case (_, aw, bw) =>
      val pack = (ws: Seq[Long]) => {
        val bb = java.nio.ByteBuffer.allocate(ws.size * 8)
        ws.foreach(bb.putLong)
        bb.array()
      }
      val e = graft.functions.PackedAndPopcountExpr(
        org.apache.spark.sql.catalyst.expressions.Literal(pack(aw)),
        org.apache.spark.sql.catalyst.expressions.Literal(pack(bw)))
      val expected = aw.zip(bw)
        .map { case (x, y) => java.lang.Long.bitCount(x & y).toLong }.sum
      assert(e.eval(null) == expected)
    }
    // null propagation + empty bitmaps
    assert(graft.functions.PackedAndPopcountExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(Array.empty[Byte]),
      org.apache.spark.sql.catalyst.expressions.Literal(Array.empty[Byte]))
      .eval(null) == 0L)
  }
}
