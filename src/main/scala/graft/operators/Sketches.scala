package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable, ENGINE-DETERMINISTIC sketches.
  *
  * Spark's built-in approximate aggregates (HLL++, KLL) are
  * engine-internal: their estimates can't be reproduced by another
  * engine, so they can only be band-tested (see ApproxAggSpec). The
  * sketches here are defined purely in terms of md5 hashes and
  * order statistics, so an independent engine (the DuckDB oracle)
  * computes bit-identical results — and they keep the properties that
  * matter at 100 TB: bounded state (k values), one shuffle, and
  * lossless mergeability across partitions (the union of per-partition
  * k-minima contains the global k-minima).
  */
object Sketches {

  /** Uniform-ish 32-bit hash of a value's string form: the first 8 md5
    * hex digits as a BIGINT in [0, 2^32). Cross-engine idiom: DuckDB
    * `('0x'||substr(md5(v),1,8))::BIGINT`. */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")

  /** KMV (k-minimum-values) distinct-count estimate of `c` grouped by
    * `keys`: with h(k) the k-th smallest DISTINCT normalized hash,
    * estimate = (k-1) / (h(k)/2^32); exact when the group has fewer
    * than k distinct values. Plan shape: hash-distinct, then a
    * windowed rank keeps only each group's k minima (spill-safe sort,
    * never a collected set), then a plain aggregate over ≤ k rows per
    * group — bounded state at any cardinality, both shuffles on the
    * grouping keys. */
  def kmvDistinct(df: DataFrame, keys: Seq[String], c: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = df.select((keys.map(col) :+ hash32(c).as("_h")): _*).distinct()
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_h"))
    val minima = hashed.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
    minima.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"), max(col("_h")).as("_kth"))
      .withColumn("n_distinct_est",
        when(col("_n") < k, col("_n").cast("double"))
          .otherwise(lit((k - 1).toDouble) / (col("_kth").cast("double") / lit(4294967296.0))))
      .drop("_n", "_kth")
  }
}
