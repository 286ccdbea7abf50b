package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact global quantiles WITHOUT a global sort.
  *
  * At 100 TB a `percentile`/`orderBy` global quantile is a full
  * range-partitioned sort of the dataset — the single most expensive
  * shuffle Spark can run. The exact rank-k element can instead be
  * found by histogram refinement: bucket-count the value range (one
  * map-side-combined aggregation, 1024 longs per partition), locate
  * the bucket holding rank k from the driver-side cumulative sum,
  * and recurse into just that bucket. The candidate set shrinks
  * ~1000× per pass, so 100 TB resolves in 2-3 scans of geometrically
  * shrinking subsets, after which the remainder is driver-sortable.
  *
  * Deterministic: bucket assignment is fixed double arithmetic, the
  * refinement filter reuses the identical bucket expression (no
  * boundary float mismatch), and the returned value is the rank-k
  * element of the sorted multiset — unique regardless of tie order.
  * Exactness does not depend on the bucket geometry; buckets only
  * narrow where rank k lives.
  */
object Quantiles {

  /** The rank-k (1-based, ascending) element of `valueCol`, nulls
    * ignored. Falls back to a distributed sort of the narrowed
    * subset if refinement stalls (mass concentrated on one double). */
  def rankElement(df: DataFrame, valueCol: String, k: Long,
      buckets: Int = 1024, collectLimit: Long = 100000L): Double = {
    require(k >= 1, s"rank must be >= 1, got $k")
    var cur = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull).cache()
    var rank = k
    var iters = 0
    try {
      while (iters < 20) {
        val head = cur.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
        val n = head.getLong(0)
        require(rank <= n, s"rank $rank exceeds non-null count $n")
        val (lo, hi) = (head.getDouble(1), head.getDouble(2))
        if (lo == hi) return lo // all remaining values identical
        if (n <= collectLimit) {
          val arr = cur.select(col("v")).collect().map(_.getDouble(0))
          java.util.Arrays.sort(arr)
          return arr((rank - 1).toInt)
        }
        val width = (hi - lo) / buckets
        val bucketExpr = least(
          floor((col("v") - lit(lo)) / lit(width)).cast("int"), lit(buckets - 1))
        val counts = cur.groupBy(bucketExpr.as("b")).agg(count(lit(1)).as("c"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        var cum = 0L
        var chosen = -1
        var below = 0L
        var i = 0
        while (i < buckets && chosen < 0) {
          val c = counts.getOrElse(i, 0L)
          if (cum + c >= rank && c > 0) { chosen = i; below = cum }
          cum += c
          i += 1
        }
        require(chosen >= 0, s"rank $rank not covered by bucket counts (total $cum)")
        rank -= below
        val next = cur.filter(bucketExpr === chosen).cache()
        cur.unpersist()
        cur = next
        iters += 1
      }
      // refinement stalled (adversarial double distribution): exact
      // distributed sort of the narrowed subset, still never the
      // full dataset
      import org.apache.spark.sql.expressions.Window
      cur.select(col("v"),
          row_number().over(Window.orderBy(col("v"))).as("rn"))
        .filter(col("rn") === rank).head().getDouble(0)
    } finally cur.unpersist()
  }

  /** (quantile, value) rows for each q: rank = ceil(q·n), the
    * lower-discrete quantile — same rank rule the oracle SQL spells
    * out with ROW_NUMBER. */
  def quantiles(df: DataFrame, valueCol: String, qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull).cache()
    try {
      val n = base.count()
      qs.map { q =>
        val k = math.ceil(q * n).toLong
        (q, rankElement(base, "v", k))
      }.toDF("q", "v")
    } finally base.unpersist()
  }
}
