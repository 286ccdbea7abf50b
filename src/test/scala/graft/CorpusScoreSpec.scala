package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the bigram-LM familiarity score and the
  * duplicated-span detector (hash-exactness vs DuckDB is covered by
  * the Verify oracle; these pin the internal math). */
class CorpusScoreSpec extends AnyFunSuite with SparkTestBase {

  test("ngram LM: familiarity ppm bounded, n_bigrams = tokens - 1") {
    val rows = Queries.qNgramLmScore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getLong(2)
      assert(ppm >= 0 && ppm <= 1000000L, s"ppm out of range: $r")
    }
    // n_bigrams equals the doc's (nonempty-token count - 1)
    val tokCounts = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= "")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == tokCounts(r.getLong(0)) - 1L, s"bigram count off: $r")
    }
  }

  test("ngram LM: a unique bigram scores lower than a repeated one") {
    // conditional ppm of a bigram seen once under a prefix seen twice
    // is 500000; under a prefix seen once it is 1000000 — docs made
    // entirely of corpus-unique bigrams with unique prefixes score
    // exactly 1e6, so anything below 1e6 indicates shared structure.
    val rows = Queries.qNgramLmScore(spark, sf).collect()
    assert(rows.exists(_.getLong(2) < 1000000L),
      "corpus has shared bigram structure; expected some ppm < 1e6")
  }

  test("dup spans: counts consistent and ppm is the integer ratio") {
    val rows = Queries.qDupSpans(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nd, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nd >= 0 && nd <= nw, s"dup count out of range: $r")
      assert(ppm == nd * 1000000L / nw, s"ppm not the integer ratio: $r")
    }
  }

  test("pagerank: mass conserved up to floor-division loss, ranks positive") {
    val rows = Queries.qPagerank(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    // floor division sheds <1 ppb per node per division; three damped
    // iterations keep ≥ ~95% of the 1e9 mass on any real graph
    assert(total <= 1000000000L && total >= 900000000L, s"mass off: $total")
    rows.foreach(r => assert(r.getLong(1) > 0, s"non-positive rank: $r"))
    // suppliers (odd node ids = 2k+1) are high-degree hubs of the
    // bipartite graph: the top rank must be a supplier node
    val top = rows.maxBy(_.getLong(1))
    assert(top.getLong(0) % 2 == 1, s"expected supplier hub on top: $top")
  }

  test("dup spans: a shared window is flagged in both docs (sf0.01)") {
    // the synthetic corpus carries near-duplicate docs at sf0.01; any
    // 8-token window shared across docs must be counted on BOTH sides
    val rows = Queries.qDupSpans(spark, "/root/testdata/sf0.01").collect()
    val dupDocs = rows.filter(_.getLong(2) > 0)
    assert(dupDocs.length >= 2,
      s"expected >=2 docs with duplicated spans, got ${dupDocs.length}")
  }
}
