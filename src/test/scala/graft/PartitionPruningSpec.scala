package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning: the 100 TB strategy for selective scans —
  * directory-partition the fact table on its routing/filter column so
  * a predicate on it eliminates whole directories at PLANNING time
  * (the scan's PartitionFilters), rather than reading and discarding
  * rows. Together with BucketingSpec (co-located joins) and the
  * PushedFilters assertions in RelationalSpec, this pins down the
  * three scan-hygiene behaviors the engine relies on at scale. */
class PartitionPruningSpec extends AnyFunSuite with SparkTestBase {

  test("partitioned layout prunes directories at plan time; results identical") {
    val root = s"${Files.createTempDirectory("graft-part")}/events"
    val ev = Tables.events(spark, sf)
    ev.write.partitionBy("event_type").parquet(root)

    val part = spark.read.parquet(root).filter(col("event_type") === "purchase")
    val scan = part.queryExecution.executedPlan.toString

    // the predicate must land in PartitionFilters (directory pruning),
    // not survive as a post-scan Filter over all partitions
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"),
      s"event_type predicate should prune partitions:\n$scan")

    // pruning reads strictly fewer files than the full table
    val prunedFiles = part.select(input_file_name()).distinct().count()
    val allFiles = spark.read.parquet(root).select(input_file_name()).distinct().count()
    assert(prunedFiles < allFiles, s"pruned=$prunedFiles all=$allFiles")

    // semantics unchanged vs the unpartitioned source
    val expected = ev.filter(col("event_type") === "purchase").count()
    assert(part.count() == expected)
  }
}
