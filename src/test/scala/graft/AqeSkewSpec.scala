package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime skew handling — the OTHER half of the skew story next
  * to the manual salting operators (`operators/Skew.scala`): when a
  * shuffle join's post-shuffle partition is measured oversized at
  * runtime, AQE's OptimizeSkewedJoin splits it into chunks (and
  * replicates the matching partition on the other side) WITHOUT any
  * query rewrite. At 100 TB this is the safety net for skew nobody
  * predicted; this spec pins that the mechanism actually engages on
  * this build rather than trusting the config flag. */
class AqeSkewSpec extends AnyFunSuite with SparkTestBase {

  test("AQE splits a measured-skewed join partition at runtime") {
    val s = spark
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> s.conf.get(k)).toMap
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // tiny thresholds so the hot key's partition counts as skewed
      // at test size (defaults target 256 MB partitions)
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      import s.implicits._
      // one hot key carrying ~97% of the left side
      val left = s.range(300000)
        .select(when(col("id") % 32 === 0, col("id") % 1000 + 1)
          .otherwise(lit(0L)).as("k"), col("id").as("v"))
      val right = s.range(1001).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = left.join(right, "k")
      // execute THIS dataset's own query execution: AdaptiveSparkPlanExec
      // finalizes in place, so the same instance's executedPlan then
      // shows the runtime decision (count() would build a separate QE)
      assert(joined.collect().length == 300000)
      val plan = joined.queryExecution.executedPlan.toString
      // the hot side's shuffle read reports the runtime skew split
      assert(plan.contains("AQEShuffleRead skewed"),
        s"OptimizeSkewedJoin did not split the hot partition:\n$plan")
    } finally keep.foreach { case (k, v) => s.conf.set(k, v) }
  }
}
