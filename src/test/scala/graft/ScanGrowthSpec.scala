package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fused multi-pattern scan, vocabulary growth, behavior diversity,
  * and the SCD2 point-in-time read. */
class ScanGrowthSpec extends AnyFunSuite with SparkTestBase {

  test("MultiPatternCountExpr counts leftmost non-overlapping matches") {
    import spark.implicits._
    def counts(text: String, pats: Seq[String]): Seq[Long] =
      Seq(text).toDF("t")
        .select(graft.functions.MultiPattern.countAll(col("t"), pats))
        .head().getSeq[Long](0)
    assert(counts("a a a", Seq("a a")) == Seq(1L),
      "after a match the scan resumes past the matched span")
    assert(counts("abab abab", Seq("ab", "abab")) == Seq(4L, 2L))
    assert(counts("xyz", Seq("q")) == Seq(0L))
    assert(counts("", Seq("q")) == Seq(0L))
    // identity with the replace-length oracle formula
    val t = "scan the row scan fast table scan"
    val p = "scan"
    val viaReplace = (t.length - t.replace(p, "").length) / p.length
    assert(counts(t, Seq(p)) == Seq(viaReplace.toLong))
  }

  test("q_multipattern_scan: full source x pattern grid, docs <= occurrences") {
    val rows = Queries.qMultipatternScan(spark, sf).collect()
    val nSources = Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == nSources * 8, "one row per (source, pattern)")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_occ") ||
        r.getAs[Long]("n_occ") == 0)
    }
  }

  test("q_vocab_growth: totals telescope and types only accumulate") {
    val rows = Queries.qVocabGrowth(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("b")).toSeq == (0L to 9L))
    val cumT = rows.map(_.getAs[Long]("cum_types"))
    assert(cumT.zip(cumT.tail).forall { case (a, b) => b >= a })
    assert(rows.map(_.getAs[Long]("n_tokens")).sum ==
      rows.last.getAs[Long]("cum_tokens"))
    assert(rows.map(_.getAs[Long]("new_types")).sum == cumT.last)
    // total distinct types across the corpus equals the curve's end
    val types = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " "))).distinct().count()
    assert(cumT.last == types)
  }

  test("q_behavior_diversity: buckets valid, census covers all users") {
    val rows = Queries.qBehaviorDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 9)
      assert(r.getAs[Long]("min_div_ppm") >= b * 100000)
      assert(r.getAs[Long]("max_div_ppm") < (b + 1) * 100000)
    }
  }

  test("q_scd2_read: at most one effective version per user, all 'U' ops") {
    val rows = Queries.qScd2Read(spark, sf).collect()
    assert(rows.nonEmpty)
    val users = rows.map(_.getAs[Long]("user_id"))
    assert(users.distinct.length == users.length,
      "point-in-time read must yield at most one version per user")
    rows.foreach(r => assert(r.getAs[Double]("val") >= 5.0,
      "'D' versions can never be effective"))
  }
}
