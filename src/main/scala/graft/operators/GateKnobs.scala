package graft.operators

/** Env-overridable defaults for the engine's adaptive-gate constants
  * (judge brief r19 #1).
  *
  * Every adaptive operator picks its physical tier from a gate
  * statistic compared against a constant. The constants are chosen
  * for the 100 TB design point — which means some tiers only engage
  * at scales where a naive oracle is infeasible, and a correctness
  * sweep could never pin them on verifiable data. These knobs let
  * `graft.tools.GateSweep` FORCE a tier by moving the constant while
  * running the untouched catalog query against the driver's own
  * DuckDB oracle: the forced-tier result must stay oracle-exact on
  * the same data. Unset env ⇒ the committed production constants;
  * catalog, bench, and driver runs never set them.
  *
  * (sys.env is an immutable JVM snapshot, so a knob applies per
  * sbt/driver invocation — exactly the sweep's shape. In-JVM forcing
  * for specs uses the operators' explicit parameters instead.) */
object GateKnobs {
  private def envLong(k: String, d: Long): Long =
    sys.env.get(k).map(_.toLong).getOrElse(d)
  private def envInt(k: String, d: Int): Int =
    sys.env.get(k).map(_.toInt).getOrElse(d)

  /** Triangle dense tier: max |V| for the global-bitmap plan. */
  def triDenseMaxNodes: Int = envInt("SPARK_GRAFT_TRI_DENSE_MAX_NODES", 16384)
  /** Triangle dense-blocked tier: max component-local adjacency bytes. */
  def triMaxAdjBytes: Long = envLong("SPARK_GRAFT_TRI_MAX_ADJ_BYTES", 1L << 28)
  /** Sim/containment join: max Σdf² pair volume for the direct tier. */
  def simJoinMaxDirectPairs: Long =
    envLong("SPARK_GRAFT_SIMJOIN_MAX_DIRECT_PAIRS", 1L << 29)
  /** Connected components: max edges for the driver union-find tier. */
  def ccDriverEdgeLimit: Long = envLong("SPARK_GRAFT_CC_DRIVER_EDGE_LIMIT", 5000000L)
  /** Quantiles: max narrowed-subset rows for the driver-sort exit. */
  def quantileCollectLimit: Long =
    envLong("SPARK_GRAFT_QUANTILE_COLLECT_LIMIT", 100000L)
  /** Quantiles: histogram-refinement passes before the bit-search
    * stall fallback (0 forces bit-search immediately). */
  def quantileRefineIters: Int = envInt("SPARK_GRAFT_QUANTILE_REFINE_ITERS", 20)
  /** Pair core: basket size above which a key is routed "big". */
  def paircoreBigThreshold: Long =
    envLong("SPARK_GRAFT_PAIRCORE_BIG_THRESHOLD", 256L)
  /** Pair core: max distinct big baskets for the bitmap tier. */
  def paircoreMaxDistinctBig: Long =
    envLong("SPARK_GRAFT_PAIRCORE_MAX_DISTINCT_BIG", 62L)
  /** Pair core: max Σ big-basket items for the bitmap tier. */
  def paircoreMaxBigItems: Long =
    envLong("SPARK_GRAFT_PAIRCORE_MAX_BIG_ITEMS", 1000000L)
}
