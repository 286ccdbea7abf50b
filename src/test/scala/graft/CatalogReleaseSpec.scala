package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide cache-release contract (VERDICT r13/r14 finding): a
  * catalog query that caches or locally checkpoints intermediates
  * must free them before returning. After the result is materialized,
  * at most ONE persisted RDD may remain registered with the block
  * manager — the eagerly-materialized final result (or final
  * iterative round), which the ContextCleaner reclaims once the
  * caller drops the reference (the [[operators.Rounds]] contract).
  * Anything more is a leak: a `.cache()` that the session cache holds
  * until someone calls `clearCache()`, or a locally-checkpointed
  * round whose `Dataset.unpersist` was a silent no-op — rounds× block
  * copies of executor storage at cluster scale.
  *
  * Covers every catalog query that carries a `.cache()` or a
  * multi-round `localCheckpoint` chain.
  */
class CatalogReleaseSpec extends AnyFunSuite with SparkTestBase {

  private val covered = Seq(
    "q_pagerank",        // sym/deg/edges caches, eager final
    "q_ppr",             // sym/deg/edges caches, eager top-30
    "q_hits",            // edge cache, eager top-30
    "q_diameter_2sweep", // edge cache + two bfsHops final rounds
    "q_sssp_bounded",    // delta rounds; final dist stays (allowance)
    "q_label_prop",      // delta rounds; final labels stay (allowance)
    "q_bpe_merges",      // 6 checkpointed vocab rounds, all released
    "q_rfm_scores",      // per-user cache, eager ≤125-row final
    // round-15 CacheAudit offenders, all fixed to the same contract:
    "q_bfs_hops",        // edge cache + BFS final round, eager ordered final
    "q_triangle_count",  // dense-tier eb/adj/edge caches self-release
    "q_local_clustering",// inherits triangleCounts' self-release
    "q_dbscan",          // pair cache + CC round released, eager final
    "q_dedup_ngram",     // shared minhash-signature cache released
    "q_dedup_minhash",   // same sig-cache release
    "q_dedup_editdist",  // same sig-cache release
    "q_dedup_panel",     // same sig-cache release
    "q_minhash_calibration", // same sig-cache release
    "q_contrastive_pairs",   // same sig-cache release
    "q_dedup_clusters",  // ngram checkpoint released; CC round stays
    "q_dedup_survivors", // chain: only the CC round stays
    "q_cc_size_hist",    // chain: only the CC round stays
    "q_curation_e2e",    // chain: only the CC round stays
    // pair-support core (r16 re-tier): items persisted at EVERY SF,
    // plus smallCounts/cands (join tier) or mask (bitmap tier) —
    // tier-specific paths additionally leak-tested on big-basket
    // fixtures in PairCoreSpec
    "q_itemset_pairs",
    "q_item_lift")

  for (name <- covered)
    test(s"$name leaves at most its final result persisted") {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val res = SparkEntry.queries(name)(spark, sf)
      assert(res.count() >= 0)
      val leaked = sc.getPersistentRDDs.keySet -- before
      assert(leaked.size <= 1,
        s"$name left ${leaked.size} persisted RDDs registered " +
          "(expected at most the eager final result); a cache or " +
          "checkpointed round is not being released")
      // the one allowed survivor must be the RESULT's own blocks —
      // its eager final or a round its plan reads — not a stray cache
      val ownIds =
        res.queryExecution.analyzed.collectWithSubqueries {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
        }.toSet ++
        res.queryExecution.optimizedPlan.collectWithSubqueries {
          case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
            imr.cacheBuilder.cachedColumnBuffers.id
        }.toSet
      val foreign = leaked.filterNot(ownIds)
      assert(foreign.isEmpty,
        s"$name's surviving persisted RDD(s) $foreign are not blocks " +
          "its own result reads — a leaked intermediate, not the allowance")
    }
}
