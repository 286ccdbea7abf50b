package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantiles

/** Degenerate-input battery for the catalog's driver-scalar queries
  * (r15 verdict #3): any query that pulls an aggregate scalar onto the
  * driver (`agg(...).head()`, quantile bounds, corpus max) must survive
  * the empty and fully-collapsed corpus — the defect class q_bpe_merges
  * exhibited (fixed r15) and q_dedup_editdist still had (NPE on
  * max-over-zero-rows, fixed this round).
  */
class DegenerateInputSpec extends AnyFunSuite with SparkTestBase {

  /** All driver tables, schema-faithful (copied from sf0.001 footers),
    * zero rows. */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-degen").toString
    for (t <- Seq("documents", "lineitem", "events"))
      Tables.table(spark, sf, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  test("q_dedup_editdist: empty corpus returns empty, no NPE") {
    val out = SparkEntry.queries("q_dedup_editdist")(spark, emptyDir)
    assert(out.collect().isEmpty)
  }

  test("q_dedup_editdist: fully-collapsed corpus (identical texts) verifies all pairs at sim 1.0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-degen-dup").toString
    val text = "the quick brown fox jumps over the lazy dog again and again"
    Seq(1L, 2L, 3L)
      .map(i => (i, text, "en", "web", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_dedup_editdist")(spark, dir).collect()
    assert(rows.length == 3) // C(3,2) ordered pairs
    assert(rows.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 1.0))
  }

  test("q_curriculum: empty corpus returns zero stages") {
    val out = SparkEntry.queries("q_curriculum")(spark, emptyDir)
    assert(out.collect().isEmpty)
  }

  test("q_quantile_global / q_weighted_quantiles: empty lineitem returns no rows") {
    assert(SparkEntry.queries("q_quantile_global")(spark, emptyDir)
      .collect().isEmpty)
    assert(SparkEntry.queries("q_weighted_quantiles")(spark, emptyDir)
      .collect().isEmpty)
  }

  test("q_winsorized: empty lineitem emits the degenerate single-row aggregate") {
    val rows = SparkEntry.queries("q_winsorized")(spark, emptyDir).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(rows(0).fieldIndex("n")) == 0L)
  }

  test("q_rfm_scores: empty events returns no segments") {
    val out = SparkEntry.queries("q_rfm_scores")(spark, emptyDir)
    assert(out.collect().isEmpty)
  }

  test("Quantiles.quantiles: all-null input yields empty result") {
    import spark.implicits._
    val df = Seq[Option[Double]](None, None).toDF("v")
    assert(Quantiles.quantiles(df, "v", Seq(0.5)).collect().isEmpty)
  }

  test("Quantiles.weightedQuantiles: zero total weight yields empty result") {
    import spark.implicits._
    val df = Seq((1.0, 0L), (2.0, 0L)).toDF("v", "wt")
    assert(Quantiles.weightedQuantiles(df, "v", "wt", Seq(0.5))
      .collect().isEmpty)
  }
}
