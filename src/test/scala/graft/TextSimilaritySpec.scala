package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Similarity}

class TextSimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("language id picks profile with most marker hits, lexicographic ties") {
    val rows = Queries.qTextLangid(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val scores = Map("general" -> r.getDouble(2), "query" -> r.getDouble(3),
        "stream" -> r.getDouble(4))
      val max = scores.values.max
      val expected = scores.filter(_._2 == max).keys.min
      assert(r.getString(1) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("quality score is bounded and monotone pieces are in range") {
    val rows = Queries.qTextQuality(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1) // stopword_ratio
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1) // quality_score
    }
  }

  test("token counts: regex tokens equal whitespace tokens on clean corpus") {
    val rows = Queries.qTextTokens(spark, sf).collect()
    rows.foreach { r => assert(r.getLong(1) == r.getLong(2)) }
  }

  test("brute-force topk: 5 neighbors per query, descending cosine, no self") {
    val rows = Queries.qAnnBruteforce(spark, sf).collect()
    assert(rows.length == 50) // 10 queries × 5
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length == 5)
      assert(rs.forall(_.getLong(1) != q))
      val sims = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lsh banded join only pairs same-band vectors; ranks dense per query") {
    val lsh = Queries.qAnnLsh(spark, sf).collect()
    assert(lsh.nonEmpty)
    // neighbors share a band with the query by construction (join
    // key); ranks are 1..k per query with k <= 3
    lsh.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getLong(2)).sorted.sameElements(1L to rs.length))
    }
  }

  test("band_keys expressions over equal plane matrices canonicalize equal") {
    // Catalyst CSE/plan-cache lookups compare expressions structurally;
    // two band_keys built from the same (rebuilt) plane Seq must be
    // equal, not reference-distinct.
    import graft.functions.VectorOps
    import org.apache.spark.sql.graft.ColumnBridge
    val planes = graft.operators.Similarity.hyperplanes(24, 8)
    val again = graft.operators.Similarity.hyperplanes(24, 8)
    // share the child column: Spark 4 ColumnNodes embed their call-site
    // origin, which is not what this test is about — the regression
    // guarded here is the plane payload comparing by reference
    val qv = col("qv")
    val a = ColumnBridge.expression(VectorOps.band_keys(qv, planes, 12))
    val b = ColumnBridge.expression(VectorOps.band_keys(qv, again, 12))
    assert(a == b)
    assert(a.semanticEquals(b))
  }

  test("hyperplanes are ±1 and deterministic") {
    val p1 = Similarity.hyperplanes(4, 64)
    val p2 = Similarity.hyperplanes(4, 64)
    assert(p1 == p2)
    assert(p1.flatten.forall(v => v == 1 || v == -1))
  }

  test("multimodal features: histogram bins sum to byte length") {
    val rows = Queries.qMultimodalFeatures(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val binSum = r.getLong(3) + r.getLong(4) + r.getLong(5) + r.getLong(6)
      assert(binSum == r.getLong(1))
    }
  }

  test("frame sampling covers every 2nd frame with correct lengths") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val frames = Multimodal.sampleFrames(media, 64, 2)
    val byDoc = frames.groupBy("media_id").count()
      .join(Tables.documents(spark, sf).withColumnRenamed("doc_id", "media_id"), "media_id")
      .select($"count", $"n_chars").as[(Long, Long)].collect()
    byDoc.foreach { case (n, chars) =>
      val totalFrames = (chars - 1) / 64 + 1
      assert(n == (totalFrames + 1) / 2)
    }
  }
}
