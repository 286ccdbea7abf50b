package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the 100 TB strategy for repeated large-large joins —
  * pre-shuffle both tables into the same bucket layout once, then
  * every subsequent equi-join on the bucket key runs with NO exchange
  * on either side. Verified here by comparing physical plans. */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val s = spark
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      // external bucketed tables (path option ⇒ no warehouse involved)
      Tables.lineitem(s, sf).write.format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li_b").saveAsTable("li_b")
      Tables.orders(s, sf).write.format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/o_b").saveAsTable("o_b")

      val joined = s.table("li_b").join(s.table("o_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      // same join without bucketing must shuffle both sides
      val unbucketed = Tables.lineitem(s, sf).join(Tables.orders(s, sf),
        col("l_orderkey") === col("o_orderkey"))
      val plan2 = unbucketed.queryExecution.executedPlan.toString
      assert(plan2.contains("Exchange hashpartitioning"))

      // results identical
      assert(joined.count() == unbucketed.count())

      // read-side bucket PRUNING: an equality predicate on the bucket
      // key scans 1 of the 8 buckets, not the whole table — the scan
      // reports its selected-bucket count in the plan. The
      // auto-bucketed-scan planner disables bucketed reading for a
      // bare point filter (no join/agg needs the distribution), which
      // also disables pruning — turn it off for this sub-case so the
      // scan stays bucketed and prunes.
      val prevAuto =
        s.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val key = s.table("o_b").select(col("o_orderkey")).head().getLong(0)
        val pruned = s.table("o_b").filter(col("o_orderkey") === key)
        val prunedPlan = pruned.queryExecution.executedPlan.toString
        assert(prunedPlan.contains("SelectedBucketsCount: 1 out of 8"),
          s"bucket filter did not prune the scan:\n$prunedPlan")
        assert(pruned.count() >= 1)
      } finally {
        s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
      }
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS li_b")
      s.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
