package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Property test: on random token corpora, BOTH adaptive plans of the
  * set-similarity joins must equal a driver-side brute force — ground
  * truth, not just plan-vs-plan agreement. Random sets over a small
  * token universe maximize collision/boundary cases (empty sets,
  * exact-threshold intersections, duplicate sets). Deterministic
  * seeds; Gen is driven directly (no scalatest-plus bridge in the
  * offline cache). */
class ContainmentPropertySpec extends AnyFunSuite with SparkTestBase {

  // a corpus: ~18 docs, token sets of 0..10 draws from a 25-token
  // universe (dense enough that many pairs sit exactly AT threshold)
  private val docGen: Gen[Set[String]] =
    Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 24).map(i => s"t$i")).map(_.toSet))
  private def corpus(seed: Long): Seq[(Long, Set[String])] =
    (0 until 18).map { i =>
      i.toLong -> docGen(Gen.Parameters.default, Seed(seed * 131 + i)).getOrElse(Set.empty)
    }

  private def toTokens(c: Seq[(Long, Set[String])]) = {
    import spark.implicits._
    c.flatMap { case (id, ts) => ts.map(id -> _) }.toDF("doc_id", "tok")
  }

  test("containmentJoin ≡ brute force on random corpora, both gate sides") {
    val (tN, tD) = (1, 2)
    for (seed <- 0L until 4L) {
      val c = corpus(seed)
      val truth = (for {
        (a, as) <- c; (b, bs) <- c
        if a != b && as.nonEmpty
        inter = (as & bs).size
        if tD * inter >= tN * as.size
      } yield (a, b, inter.toLong, as.size.toLong)).toSet
      val tok = toTokens(c)
      for (maxDirect <- Seq(Long.MaxValue, 0L)) {
        val got = Dedup.containmentJoin(tok, "doc_id", tN, tD, maxDirect)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(got == truth,
          s"seed=$seed maxDirect=$maxDirect missing=${truth -- got} extra=${got -- truth}")
      }
    }
  }

  test("exactSimJoin ≡ brute force on random corpora, both gate sides") {
    val (tN, tD) = (1, 2)
    for (seed <- 10L until 13L) {
      val c = corpus(seed)
      val truth = (for {
        (a, as) <- c; (b, bs) <- c
        if a < b && as.nonEmpty && bs.nonEmpty
        inter = (as & bs).size
        union = (as | bs).size
        if (tN + tD) * inter >= tN * (as.size + bs.size)
      } yield (a, b, inter.toLong, union.toLong)).toSet
      val tok = toTokens(c)
      for (maxDirect <- Seq(Long.MaxValue, 0L)) {
        val got = Dedup.exactSimJoin(tok, "doc_id", tN, tD, maxDirect)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(got == truth,
          s"seed=$seed maxDirect=$maxDirect missing=${truth -- got} extra=${got -- truth}")
      }
    }
  }
}
