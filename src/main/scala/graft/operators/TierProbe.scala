package graft.operators

/** Registry of ADAPTIVE-TIER selections (judge brief r19 #1).
  *
  * Several operators pick a physical strategy from driver-side gate
  * statistics (triangle dense/dense-blocked/sparse, pair-core
  * bitmap/zero-big/join, sim-join direct/prefix, CC
  * union-find/star-contraction, quantile collect/bit-search). A
  * scale sweep that claims "tier X is exact at SF Y" must PIN that
  * tier X was in fact the one selected at SF Y — inferring it from
  * gate arithmetic re-derives the very logic under test. Every gate
  * records its choice here at selection time; `graft.tools.GateSweep`
  * reads the record after materializing each query.
  *
  * Always on: the cost is one short string append per OPERATOR
  * INVOCATION (driver-side, not per row), so unlike
  * [[PlanProbe]] — which pins whole QueryExecution trees — there is
  * nothing to opt out of. Entries are (op, tier) in call order;
  * operators that decide per rank-call (Quantiles) contribute one
  * entry per decision. */
object TierProbe {
  private val log = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]

  def record(op: String, tier: String): Unit = { log.add((op, tier)); () }

  /** All selections since the last clear, in call order. */
  def selections: Seq[(String, String)] = {
    val it = log.iterator()
    val b = Seq.newBuilder[(String, String)]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Distinct tiers chosen per op since the last clear. */
  def byOp: Map[String, Seq[String]] =
    selections.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }

  def clear(): Unit = log.clear()
}
