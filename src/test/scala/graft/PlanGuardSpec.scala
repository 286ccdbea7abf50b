package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan regression gate.
  *
  * The per-round perf audit reads the top cost centers by hand; this
  * spec mechanizes the two anti-patterns that have no legitimate
  * large-side use anywhere in the catalog and FAILS the build if one
  * ever appears:
  *
  *   - CartesianProduct: never acceptable — every pair-producing
  *     operator in the catalog blocks/bins/buckets first.
  *   - BroadcastNestedLoopJoin: acceptable ONLY where the broadcast
  *     side is a provably bounded relation (a 1-row totals/stats
  *     aggregate or a k-row constant), enumerated in the whitelist
  *     below WITH the reason. A BNLJ against an unbounded side is the
  *     O(n·m) scale-killer the range-binning rule exists to prevent.
  *
  * Construction note: building some DataFrames executes bounded
  * driver work (quantile refinement, k-means seeding), so this spec
  * runs at the test SF like every other spec — the assertions are on
  * the PLAN, the work is incidental.
  */
class PlanGuardSpec extends AnyFunSuite with SparkTestBase {

  /** query -> why its BroadcastNestedLoopJoin is bounded. EXACT set:
    * a query here without a BNLJ in its plan fails too (stale entries
    * would quietly widen the gate). */
  private val bnljWhitelist: Map[String, String] = Map(
    "q_pmi_collocations" -> "1-row corpus totals broadcast (n_w, n_bg)",
    "q_source_ablation" -> "1-row corpus totals broadcast (t_docs, t_words)",
    "q_ann_bruteforce" -> "bounded query-vector set broadcast (exact baseline)",
    "q_ann_ivf" -> "bounded centroid set broadcast",
    "q_kmeans_embed" -> "bounded centroid set broadcast (k rows/iteration)",
    "q_semdedup" -> "bounded centroid set broadcast (cells stay O(k))",
    "q_tfidf_topk" -> "1-row document-count broadcast for the IDF term",
    "q_dq_checks" -> "1-row metrics relation crossed with the check table",
    "q_histogram" -> "1-row data-derived bounds broadcast to the fill pass",
    "q_join_range" -> ("small interval side broadcast by design — the " +
      "scalable form of this join is q_range_autobin's binned equi-join")
  )

  test("no catalog query plans a CartesianProduct; BNLJ only where bounded") {
    val cart = scala.collection.mutable.ArrayBuffer[String]()
    val bnlj = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) cart += name
      if (plan.contains("BroadcastNestedLoopJoin")) bnlj += name
    }
    assert(cart.isEmpty, s"CartesianProduct found in: ${cart.mkString(", ")}")
    val unlisted = bnlj.filterNot(bnljWhitelist.contains)
    val stale = bnljWhitelist.keys.toSeq.sorted.filterNot(bnlj.contains)
    assert(unlisted.isEmpty,
      s"un-whitelisted BroadcastNestedLoopJoin in: ${unlisted.mkString(", ")}")
    assert(stale.isEmpty,
      s"stale whitelist entries (no BNLJ in plan): ${stale.mkString(", ")}")
  }
}
