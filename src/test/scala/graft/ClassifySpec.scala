package graft

import org.scalatest.funsuite.AnyFunSuite

/** Classical-ML audit queries: decision stump, nearest-centroid
  * (Rocchio) confusion matrix, leave-one-out 3-NN label agreement. */
class ClassifySpec extends AnyFunSuite with SparkTestBase {

  test("q_decision_stump: one best split per source, counts partition the group") {
    val rows = Queries.qDecisionStump(spark, sf).collect()
    assert(rows.nonEmpty)
    val perSource = Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val seen = rows.map(_.getAs[String]("source"))
    assert(seen.distinct.length == seen.length, "one stump per source")
    rows.foreach { r =>
      val n = perSource(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == n,
        "split sides must partition the source's docs")
      assert(r.getAs[Long]("n_left") > 0 && r.getAs[Long]("n_right") > 0)
      val g = r.getAs[Long]("gini_ppm")
      // weighted binary Gini is in [0, 0.5] (ppm)
      assert(g >= 0 && g <= 500000L, s"gini out of range: $g")
      assert(r.getAs[Long]("split_bin") >= 0 && r.getAs[Long]("split_bin") < 32)
    }
  }

  test("q_rocchio_classify: confusion matrix conserves doc counts") {
    val rows = Queries.qRocchioClassify(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total,
      "every doc appears exactly once in the confusion matrix")
    // actuals marginal matches the language distribution
    val actuals = rows.groupBy(_.getAs[String]("actual"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n")).sum }
    val langs = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(actuals == langs)
    // deterministic
    val again = Queries.qRocchioClassify(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q_knn_label: coverage bounded by total, accuracy in range") {
    val rows = Queries.qKnnLabel(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_total")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_eval") <= r.getAs[Long]("n_total"))
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_eval"))
      val acc = r.getAs[Long]("acc_ppm")
      assert(acc >= 0 && acc <= 1000000L)
    }
    // the wider 3-NN radius must reach most points (coverage gate —
    // if the radius formula regresses, this catches it)
    val eval = rows.map(_.getAs[Long]("n_eval")).sum
    assert(eval * 10 >= total * 8, s"3-NN coverage too low: $eval/$total")
  }
}
