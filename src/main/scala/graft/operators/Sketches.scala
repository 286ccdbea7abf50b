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

  // ---- HyperLogLog (engine-deterministic) --------------------------------

  /** HLL precision: 2^8 = 256 buckets (~6.5% standard error). */
  val HllP: Int = 8
  val HllM: Int = 1 << HllP
  /** α_m·m² for the raw HLL estimator, computed ONCE so the Spark plan
    * and the generated oracle SQL inline the identical double literal
    * (JDK Double.toString round-trips; DuckDB parses correctly
    * rounded). */
  val HllNumerator: Double = 0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM

  /** Small-range (linear counting) correction table: m·ln(m/V) for
    * V = 1..m empty buckets. `ln` itself is NOT cross-engine
    * bit-stable, so the 256 possible values are precomputed HERE and
    * inlined as literals into both the Spark plan and the oracle SQL —
    * the engines index the same table instead of each calling their
    * own libm. */
  val HllLinearTable: IndexedSeq[Double] =
    (1 to HllM).map(v => HllM.toDouble * math.log(HllM.toDouble / v))

  /** ρ(v): 1 + leading zeros of the hash remainder in its
    * (32 - p)-bit space; v = 0 ⇒ 25. A chained CASE ladder (not
    * floor(log2): float log is not bit-stable at powers of two) that
    * [[hllRhoSql]] mirrors branch for branch. */
  private[operators] def hllRho(v: Column): Column = {
    val bits = 32 - HllP
    val first = when(v >= lit(1L << (bits - 1)), lit(1))
    (2 to bits).foldLeft(first) { (acc, r) =>
      acc.when(v >= lit(1L << (bits - r)), lit(r))
    }.otherwise(lit(bits + 1))
  }

  /** The DuckDB mirror of [[hllRho]] over a column reference. */
  def hllRhoSql(v: String): String = {
    val bits = 32 - HllP
    val branches = (1 to bits)
      .map(r => s"WHEN $v >= ${1L << (bits - r)} THEN $r").mkString(" ")
    s"CASE $branches ELSE ${bits + 1} END"
  }

  /** HyperLogLog distinct-count estimate of `c` grouped by `keys`,
    * reproducible bit-for-bit by an independent engine: md5-derived
    * 32-bit hash, top p bits = bucket, ρ of the remainder via the
    * CASE ladder, and the raw estimator α_m·m²/Σ2^(−maxρ) built from
    * exact powers of two (1/(1<<ρ), every partial sum exact in 53
    * mantissa bits) — so addition order cannot matter. State is m=256
    * counters per group, two shuffles (bucket max, then group agg);
    * per-partition partial maxima combine map-side. The standard
    * small-range regime (raw ≤ 2.5m with empty buckets) switches to
    * linear counting via the shared [[HllLinearTable]] literals. */
  def hllDistinct(df: DataFrame, keys: Seq[String], c: Column): DataFrame = {
    val h = hash32(c)
    val prepared = df.select((keys.map(col) :+ h.as("_h")): _*)
      .withColumn("_bucket", shiftright(col("_h"), 32 - HllP))
      .withColumn("_rho", hllRho(col("_h").bitwiseAND(lit((1L << (32 - HllP)) - 1))))
    val perBucket = prepared.groupBy((keys.map(col) :+ col("_bucket")): _*)
      .agg(max(col("_rho")).as("_maxrho"))
    perBucket.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_buckets_hit"),
        sum(expr("1.0 / cast(shiftleft(cast(1 as bigint), _maxrho) as double)")).as("_sum_hit"))
      .withColumn("_raw",
        lit(HllNumerator) /
          (col("_sum_hit") + (lit(HllM) - col("n_buckets_hit")).cast("double")))
      .withColumn("hll_est",
        when(col("_raw") <= lit(2.5 * HllM) && col("n_buckets_hit") < HllM,
          element_at(array(HllLinearTable.map(lit): _*),
            (lit(HllM) - col("n_buckets_hit")).cast("int")))
          .otherwise(col("_raw")))
      .drop("_sum_hit", "_raw")
  }

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

  // ---- Count-min sketch (engine-deterministic) ---------------------------

  /** CMS geometry: d independent hash rows × w cells. ε ≈ e/w (relative
    * overcount · stream length), δ ≈ e^−d. Row hashes are seeded by
    * prefixing the row index to the item before the shared md5-derived
    * [[hash32]] — the same literal recipe the oracle reproduces. */
  val CmsD: Int = 4
  val CmsW: Int = 1024

  /** Row hash: the row index is prefixed to the item's string form
    * before the shared md5 hash. */
  private def cmsCell(rowIdx: Column, item: Column): Column =
    pmod(hash32(concat(rowIdx.cast("string"), lit(":"), item.cast("string"))),
      lit(CmsW.toLong))

  /** The d×w counter table of an item column: one row per touched
    * (row_idx, cell) with its count. ONE aggregation keyed by the cell
    * coordinates (map-side combine collapses the stream to ≤ d·w rows
    * per partition before the shuffle); the result is bounded state —
    * 4096 cells regardless of stream length — and mergeable by cell-
    * wise addition across shards or micro-batches. */
  def cmsCounters(items: DataFrame, itemCol: String): DataFrame =
    items
      .select(explode(array((0 until CmsD).map(lit): _*)).as("row_idx"),
        col(itemCol).as("_it"))
      .select(col("row_idx"), cmsCell(col("row_idx"), col("_it")).as("cell"))
      .groupBy(col("row_idx"), col("cell")).agg(count(lit(1)).as("cnt"))

  /** Same sketch built from pre-aggregated (item, count) rows: each
    * cell sums the counts of the items hashing into it — bit-identical
    * to feeding the raw multiset through [[cmsCounters]], but the
    * explode×d runs over DISTINCT items (typically 100-1000× fewer
    * rows than the stream). Use when an exact per-item aggregate
    * already exists in the plan. */
  def cmsCountersWeighted(itemCounts: DataFrame, itemCol: String,
      countCol: String): DataFrame =
    itemCounts
      .select(explode(array((0 until CmsD).map(lit): _*)).as("row_idx"),
        col(itemCol).as("_it"), col(countCol).as("_w"))
      .select(col("row_idx"), cmsCell(col("row_idx"), col("_it")).as("cell"),
        col("_w"))
      .groupBy(col("row_idx"), col("cell")).agg(sum(col("_w")).as("cnt"))

  /** Point-query the sketch for every row of `candidates`: the
    * estimate is the MIN over the d row counters — an upper bound on
    * the true count (never under), within ε·N with probability 1−δ.
    * The counter table is ≤ d·w rows (KBs) and broadcasts: frequency
    * estimation touches the stream once with NO corpus-keyed shuffle —
    * the reason to accept the overcount at 100 TB instead of an exact
    * `groupBy(item)`. */
  def cmsEstimate(candidates: DataFrame, itemCol: String,
      counters: DataFrame): DataFrame =
    candidates
      .select(col("*"), explode(array((0 until CmsD).map(lit): _*)).as("row_idx"))
      .withColumn("cell", cmsCell(col("row_idx"), col(itemCol)))
      .join(broadcast(counters), Seq("row_idx", "cell"))
      .groupBy(col(itemCol))
      .agg(min(col("cnt")).as("cms_est"))
}
