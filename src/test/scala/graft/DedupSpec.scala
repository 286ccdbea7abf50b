package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.functions.SimHash

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("exact dedup groups synthesized duplicates under min-id keeper") {
    val rows = Queries.qDedupExact(spark, sf).collect()
    val dupGroups = rows.filter(_.getLong(1) == 2)
    assert(dupGroups.length == 100) // the 100 shifted copies
    assert(dupGroups.forall(_.getLong(0) < 100)) // keeper is the original
  }

  test("minhash candidates include all high-jaccard pairs found by ngram verify") {
    val cand = Queries.qDedupMinhash(spark, sf).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val verified = Queries.qDedupNgram(spark, sf).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(verified.nonEmpty)
    assert(verified.subsetOf(cand)) // ngram runs on LSH candidates by construction
    // near-identical docs must estimate high similarity
    val ests = Queries.qDedupMinhash(spark, sf).select("sim_est").as[Double].collect()
    assert(ests.exists(_ >= 0.9))
  }

  test("simhash of identical token sets is identical; hamming pairs are symmetric-free") {
    val df = Seq((1L, Seq("a", "b", "c")), (2L, Seq("a", "b", "c")), (3L, Seq("x", "y", "z")))
      .toDF("id", "toks").select($"id", SimHash.simhash($"toks").as("h"))
    val hs = df.as[(Long, Long)].collect().toMap
    assert(hs(1L) == hs(2L))
    assert(hs(1L) != hs(3L))
    val pairs = Queries.qDedupSimhash(spark, sf).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }

  test("embedding near-dup cosine is within [-1,1] and above threshold") {
    val sims = Queries.qDedupEmbedding(spark, sf).select("cos_sim").as[Double].collect()
    assert(sims.nonEmpty)
    assert(sims.forall(s => s > 0.25 && s <= 1.0))
  }

  test("jaccard of disjoint and identical sets") {
    val df = Seq((Seq("a", "b"), Seq("a", "b")), (Seq("a"), Seq("b")))
      .toDF("x", "y").select(Dedup.jaccard($"x", $"y").as("j"))
    assert(df.as[Double].collect().toSeq == Seq(1.0, 0.0))
  }
}
