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
    "q_cluster_purity" -> ("inherits q_kmeans_embed's bounded centroid " +
      "broadcast (purity reads the same assignment relation)"),
    "q_tfidf_topk" -> "1-row document-count broadcast for the IDF term",
    "q_dq_checks" -> "1-row metrics relation crossed with the check table",
    "q_histogram" -> "1-row data-derived bounds broadcast to the fill pass",
    "q_join_range" -> ("small interval side broadcast by design — the " +
      "scalable form of this join is q_range_autobin's binned equi-join"),
    "q_vocab_coverage" -> ("1-row covered-sum aggregate broadcast " +
      "crossed with the 1-row totals aggregate"),
    "q_group_split" -> ("1-row leaked-user-count aggregate crossed " +
      "onto the 3-row per-split census"),
    "q_phrase_search" -> ("1-row top-bigram relation crossed onto the " +
      "per-doc occurrence counts for labeling"),
    "q_benford_audit" -> "1-row observed-total aggregate broadcast",
    "q_cascade_delete" -> ("1-row removed-count aggregate crossed onto " +
      "each table's 1-row total (3 report rows)"),
    "q_ind_discovery" -> ("1-row distinct-count aggregate crossed onto " +
      "each candidate's 1-row missing-count aggregate (7 pairs)"),
    "q_quantile_normalize" -> ("1-row global-count aggregate broadcast " +
      "onto the ranked relation for the target-position formula"),
    "q_hybrid_rrf" -> ("1-row corpus totals broadcast into the BM25 " +
      "leg (the qBm25Topk shape)"),
    "q_bm25_topk" -> "1-row corpus totals broadcast (tl, nd)",
    "q_chisq_domain" -> "1-row contingency total broadcast (t)",
    "q_skipgram_pmi" -> "1-row pair-total broadcast (t)",
    "q_decay_popularity" -> "1-row max-timestamp broadcast (tmax)",
    "q_tpch_q22" -> ("1-row positive-balance (sum, count) aggregate " +
      "crossed onto the customer scan for the cross-multiplied " +
      "above-average compare"),
    "q_ann_recall" -> ("inherits q_ann_bruteforce/q_ann_lsh's bounded " +
      "query-vector broadcasts (both independently whitelisted)"),
    // q_hits / q_diameter_2sweep: their bounded 1-row broadcasts run
    // during the eager final-result materialization (the cache-release
    // contract, CatalogReleaseSpec) — the RETURNED plan is a
    // LogicalRDD scan, so they no longer appear in planFacts.
    "q_rocchio_classify" -> ("bounded per-language centroid relation " +
      "(one row per lang) broadcast to the doc scan"),
    "q_peak_detect" -> ("bounded hour-grid broadcast (<=720 rows, fixed " +
      "30-day window) crossed with the <=5-row event-type domain"),
    "q_perm_test" -> ("1-row observed-statistic relation crossed onto " +
      "the 64-row permutation-statistic relation (both bounded)"),
    "q_consistent_shard" -> ("36-row vnode ring broadcast crossed onto " +
      "the key scan (constant-size by construction)"),
    "q_heavy_change" -> ("1-row min-day broadcast anchoring the split " +
      "(the q_decay_popularity idiom)"),
    "q_eb_shrinkage" -> "1-row global-prior broadcast for the shrinkage",
    "q_fano_burstiness" -> ("bounded hour-grid broadcast crossed with " +
      "the event-type domain (the q_peak_detect densify idiom)"),
    "q_vocab_growth" -> ("1-row doc-id extent broadcast for the decile " +
      "bucketing"),
    "q_scd2_read" -> "1-row as-of timestamp broadcast onto the versions",
  )

  /** query -> why its empty-partition-spec (single-partition) window
    * is bounded. A global window moves ALL rows of its input to one
    * partition — legitimate ONLY when that input is a provably
    * bounded relation (a per-domain allocation, a gated sliver, a
    * k-row vocabulary). EXACT set, enforced both ways like the BNLJ
    * whitelist. */
  private val globalWindowWhitelist: Map[String, String] = Map(
    // q_triangle_count / q_local_clustering: the dense-path id ranking
    // now executes behind triangleCounts' self-releasing eager
    // checkpoint — guarded via the PlanProbe helper entries
    // (helper:graph.denseTriangles allowance) in the eager-finals test.
    "q_kmeans_embed" -> ("seed ranking over vec ids: runs once on the " +
      "bounded candidate-seed relation (k-scaled, not data-scaled)"),
    "q_semdedup" -> "same k-means seed ranking (bounded seed relation)",
    "q_cluster_purity" -> ("same k-means seed ranking via the shared " +
      "assignment relation; the purity windows themselves partition " +
      "by cluster"),
    "q_hybrid_rrf" -> ("rank window over the 50-row TakeOrdered BM25 " +
      "top-k relation; both fusion legs are bounded top-k"),
    "q_domain_mix" -> ("largest-remainder allocation windows on the " +
      "one-row-per-domain aggregate (|domains| rows)"),
    "q_mix_materialize" -> ("same allocation windows, one row per " +
      "domain, feeding the per-domain quota join"),
    "q_quantile_normalize" -> ("the q_dense_ids partition-offset " +
      "prefix sum (shuffle-partition-count rows) for global positions; " +
      "per-row ranks are partitioned by pid/type"),
    // q_encoding_advisor left the whitelist in r19: the deterministic-
    // bucket rewrite partitions the seam-repair lag by col_name, so no
    // global window remains in its plan.
    "q_dense_ids" -> ("partition-offset prefix sum over the pid-count " +
      "relation (shuffle-partition-count rows), broadcast back; the " +
      "per-row ranking itself is partitioned"),
    "q_skyline_2d" -> ("stage-2 frontier window runs on the bucket-" +
      "local skyline sliver; its size is the query's own output " +
      "(the exact frontier), not the input"),
    "q_sample_weighted" -> ("systematic-sampler shard-offset prefix " +
      "sum, one row per shard"),
    "q_hazard_km" -> ("risk-set and cumulative-hazard windows on the " +
      "duration-day relation, bounded by the fixed 30-day events " +
      "observation window (<=31 rows at every SF)"),
    "q_vocab_growth" -> ("cumulative windows on the 10-row decile " +
      "bucket relation")
  )

  /** True iff the PHYSICAL plan contains an empty-partition window
    * operator, recursing through AQE wrappers and cached-relation
    * boundaries (a `.cache()` in the query body otherwise hides its
    * subtree's windows behind an InMemoryTableScan leaf). */
  private def physHasGlobalWindow(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    p.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty => true
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => true
      case a: AdaptiveSparkPlanExec if physHasGlobalWindow(a.executedPlan) => true
      case s: InMemoryTableScanExec
          if physHasGlobalWindow(s.relation.cachedPlan) => true
    }.nonEmpty
  }

  /** Per-query plan facts, built ONCE for the whole catalog (plan
    * construction is the expensive part — some queries run bounded
    * driver work while building). Note: driver-side work executed
    * DURING query construction (k-means seeding/iterations, quantile
    * refinement) never appears in the returned plan and is guarded by
    * its operator's own bounds + specs, not here. */
  private lazy val planFacts: Seq[(String, String, Boolean)] =
    SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val qe = SparkEntry.queries(name)(spark, sf).queryExecution
      val logical = qe.optimizedPlan.collectWithSubqueries {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }.nonEmpty
      val global = logical || physHasGlobalWindow(qe.executedPlan)
      (name, qe.executedPlan.toString, global)
    }

  test("no catalog query plans a CartesianProduct; BNLJ only where bounded") {
    val cart = scala.collection.mutable.ArrayBuffer[String]()
    val bnlj = scala.collection.mutable.ArrayBuffer[String]()
    planFacts.foreach { case (name, plan, _) =>
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

  /** The eager-materialized sites (cache-release contract) hand back
    * bare LogicalRDDs, so the returned plans can't show their REAL
    * join/window shapes — every such site records the plan it executes
    * in [[graft.operators.PlanProbe]] (catalog names via
    * materializeFinal; `helper:` keys for operator internals). Run a
    * triggering set, then guard EVERY captured plan: Cartesian never;
    * BNLJ only for the documented bounded 1-row crosses; global
    * windows only for the dense triangle tiers' gate-bounded id
    * ranking (n ≤ denseMaxNodes by dispatch). */
  test("eager-materialized finals: captured internal plans stay guarded") {
    // (q_item_lift left this whitelist in r20: its 1-row basket-count
    // broadcast became a literal folded from the pair core's gate
    // aggregate, so no BNLJ remains in its plan)
    val allowedBnlj = Set("q_hits", "q_diameter_2sweep")
    val allowedGlobalWindow =
      Set("helper:graph.denseTriangles", "helper:graph.componentDenseTriangles")
    val trigger = Seq("q_pagerank", "q_ppr", "q_hits", "q_rfm_scores",
      "q_diameter_2sweep", "q_triangle_count", "q_dbscan", "q_dedup_ngram",
      "q_dedup_clusters", "q_item_lift", "q_itemset_pairs")
    // recording is opt-in (driver-memory lifecycle, ADVICE r15) and the
    // map is cleared first, so the guarded set is exactly what THIS
    // test triggered — no coupling to whatever ran earlier in the JVM
    operators.PlanProbe.enabled = true
    operators.PlanProbe.clear()
    val captured =
      try {
        trigger.foreach { n =>
          spark.catalog.clearCache()
          SparkEntry.queries(n)(spark, sf).count()
        }
        operators.PlanProbe.plans.toMap
      } finally {
        operators.PlanProbe.enabled = false
        operators.PlanProbe.clear()
      }
    trigger.filterNot(n => n.startsWith("q_dedup") || n == "q_dbscan" ||
        n == "q_triangle_count")
      .foreach(n => assert(captured.contains(n),
        s"$n did not record its final plan via materializeFinal"))
    captured.foreach { case (key, plan) =>
      val p = plan.toString
      assert(!p.contains("CartesianProduct"),
        s"$key's internal plan has a CartesianProduct:\n$p")
      if (!allowedBnlj(key))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$key's internal plan has an un-whitelisted BNLJ:\n$p")
      if (!allowedGlobalWindow(key))
        assert(!physHasGlobalWindow(plan),
          s"$key's internal plan has an un-whitelisted global window:\n$p")
    }
    spark.catalog.clearCache()
  }

  test("single-partition windows only on whitelisted bounded relations") {
    val global = planFacts.collect { case (name, _, true) => name }
    val unlisted = global.filterNot(globalWindowWhitelist.contains)
    val stale = globalWindowWhitelist.keys.toSeq.sorted
      .filterNot(global.contains)
    assert(unlisted.isEmpty,
      "un-whitelisted empty-partition Window in: " + unlisted.mkString(", ") +
        " - a global window single-partitions its whole input; prove the " +
        "input bounded and whitelist it, or partition the window")
    assert(stale.isEmpty,
      s"stale global-window whitelist entries: ${stale.mkString(", ")}")
  }
}
