package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Soak

/** Concurrent multi-query streaming soak (VERDICT r13/r15 brief #6):
  * A25's effectively-once claim, proven per-component by
  * CrashRecoverySpec / StreamOpsSpec, exercised here under the
  * reference's actual deployment shape — SIX streaming queries
  * (pipeline, CMS, drift, join-MV, session windows, stateful LSH)
  * running concurrently on one session over one sustained ingest,
  * with a mid-soak whole-driver crash/restart that interrupts every
  * query at a different arbitrary offset. Pass = every maintained
  * state equals a from-scratch batch recompute exactly (the
  * converged-state-equality criterion; assertions live in
  * [[Soak.run]]). */
class ConcurrentSoakSpec extends AnyFunSuite with SparkTestBase {

  test("6 concurrent streams + mid-soak crash/restart converge to batch state") {
    val r = Soak.run(spark, sf, nEventFiles = 8, nDocFiles = 3)
    assert(r.events > 0 && r.docs > 0)
    assert(r.pipelineSinkCommits >= r.events,
      "pipeline sink saw fewer docs than staged (lost data)")
    assert(r.hashStoreOk, "pipeline hash store != batch recompute")
    assert(r.cmsOk, "maintained CMS != batch sketch")
    assert(r.driftOk, "maintained drift histogram != batch histogram")
    assert(r.joinMvOk, "maintained join-MV != batch join")
    assert(r.sessionsOk, "emitted session windows != batch sessions " +
      "closed by the final watermark")
    assert(r.lshOk, "streamed LSH band state != batch banding structure")
  }

  test("crash INSIDE the join-MV merge: replay absorbed by the batch-id gate") {
    // injected failure after the MV partition write + maintainer state
    // update but before the stream checkpoint commit; the restart
    // reuses the maintainer, so the replayed batch must hit the
    // batch-id no-op gate (not double-merge) and every equality gate
    // must still hold
    val r = Soak.run(spark, sf, nEventFiles = 8, nDocFiles = 3,
      crashPoint = "mv-merge")
    assert(r.crashPoint == "mv-merge")
    assert(r.mvNoopReplays >= 1L,
      "the injected mid-merge crash never exercised the no-op gate")
    assert(r.hashStoreOk && r.cmsOk && r.driftOk && r.joinMvOk &&
      r.sessionsOk && r.lshOk, "a state gate failed under the mv-merge crash")
  }

  test("mid-soak Avro schema evolution: re-plan + crash, states stay batch-equal") {
    // writer schema evolves (added defaulted column + float→double
    // widening) at chunk 2 of 8, crash at ~4 — the decode re-plans
    // mid-stream (A17), stragglers decode via their writer
    // fingerprint, and every maintained state must still equal the
    // batch recompute across BOTH lifecycle events
    val r = Soak.run(spark, sf, nEventFiles = 8, nDocFiles = 3,
      schemaEvolve = true)
    assert(r.schemaChanges >= 1L,
      "the evolution was never observed by the decoder")
    assert(r.evolveAtChunk == 2L)
    assert(r.pipelineSinkCommits >= r.events,
      "pipeline sink saw fewer docs than staged (lost data)")
    assert(r.hashStoreOk,
      "pipeline hash store != batch recompute across the schema change")
    assert(r.cmsOk && r.driftOk && r.joinMvOk && r.sessionsOk && r.lshOk,
      "a state gate failed under schema evolution")
  }
}
