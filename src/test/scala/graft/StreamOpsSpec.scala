package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

class StreamOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("watermarked windowed agg over event-time (batch-equivalence check)") {
    // batch semantics of the same window expression must match the
    // q_event_window bucketing on hour boundaries
    val ev = Tables.events(spark, sf)
    val windowed = StreamOps.eventTime(ev, "ts")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val total = windowed.agg(sum("n")).head().getLong(0)
    assert(total == ev.count())
  }

  test("sessionize accumulates per-user state across micro-batches") {
    val input = Files.createTempDirectory("sess-in").toString
    val b1 = Seq((1L, 10.0), (1L, 5.0), (2L, 1.0)).toDF("user_id", "value")
    b1.coalesce(1).write.mode("append").parquet(input)
    val stream = spark.readStream.schema(b1.schema).parquet(input)
    val q = StreamOps.startSessionQuery(spark, stream, "sessions_test")
    try {
      q.processAllAvailable()
      val after1 = spark.table("sessions_test").as[StreamOps.SessionUpdate]
        .collect().map(u => u.user_id -> u).toMap
      assert(after1(1L).n_events == 2 && after1(1L).total_value == 15.0)
      assert(after1(2L).n_events == 1)

      Seq((1L, 2.0), (3L, 7.0)).toDF("user_id", "value")
        .coalesce(1).write.mode("append").parquet(input)
      q.processAllAvailable()
      val after2 = spark.table("sessions_test").as[StreamOps.SessionUpdate]
        .collect().groupBy(_.user_id).map { case (k, v) =>
          k -> v.maxBy(_.n_events) }
      assert(after2(1L).n_events == 3 && after2(1L).total_value == 17.0)
      assert(after2(3L).n_events == 1 && after2(3L).total_value == 7.0)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment joins every micro-batch against the dimension") {
    // the most common streaming join at scale: the static dim is
    // broadcast once and re-probed per micro-batch — no stream-side
    // state, no watermark needed, unmatched rows drop (inner)
    val input = Files.createTempDirectory("enrich-in").toString
    val dim = Seq((0L, "gold"), (1L, "silver"), (2L, "bronze")).toDF("k", "tier")
    val b1 = Seq((100L, 0L), (101L, 1L), (102L, 9L)).toDF("event_id", "k")
    b1.coalesce(1).write.mode("append").parquet(input)
    val stream = spark.readStream.schema(b1.schema).parquet(input)
    val q = stream.join(broadcast(dim), Seq("k"))
      .writeStream.format("memory").queryName("enriched_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("enriched_test")
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      // k=9 has no dim row: dropped, not nulled
      assert(after1 == Map(100L -> "gold", 101L -> "silver"))
      // the broadcast re-probes on the NEXT batch too
      Seq((103L, 2L)).toDF("event_id", "k")
        .coalesce(1).write.mode("append").parquet(input)
      q.processAllAvailable()
      val after2 = spark.table("enriched_test").collect()
        .map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(after2 == Map(100L -> "gold", 101L -> "silver", 103L -> "bronze"))
    } finally q.stop()
  }

  test("streaming dedup drops watermark-window repeats across micro-batches") {
    val input = Files.createTempDirectory("dedup-in").toString
    val hourNs = 3600L * 1000 * 1000 * 1000
    // batch 1: two copies of doc 1 (one replayed), doc 2 once
    val b1 = Seq((1L, 1L * hourNs), (1L, 1L * hourNs + 1), (2L, 1L * hourNs))
      .toDF("doc_id", "ts")
    b1.coalesce(1).write.mode("append").parquet(input)
    val stream = spark.readStream.schema(b1.schema).parquet(input)
    val q = StreamOps.dedupStream(stream, "ts", "1 hour", Seq("doc_id"))
      .select("doc_id").writeStream
      .outputMode("append").format("memory").queryName("dedup_test").start()
    try {
      q.processAllAvailable()
      // batch 2: doc 1 replayed again (same window), doc 3 new
      Seq((1L, 1L * hourNs + 2), (3L, 1L * hourNs)).toDF("doc_id", "ts")
        .coalesce(1).write.mode("append").parquet(input)
      q.processAllAvailable()
      val ids = spark.table("dedup_test").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("stream-stream interval join matches within the bound, state is watermarked") {
    val inL = Files.createTempDirectory("ssj-l").toString
    val inR = Files.createTempDirectory("ssj-r").toString
    val hourNs = 3600L * 1000 * 1000 * 1000
    val l1 = Seq((1L, 10L * hourNs), (2L, 10L * hourNs)).toDF("user_id", "ts")
    val r1 = Seq((1L, 10L * hourNs + hourNs / 2), // in window for user 1
                 (2L, 13L * hourNs))              // outside 1h for user 2
      .toDF("user_id", "ts")
    l1.coalesce(1).write.mode("append").parquet(inL)
    r1.coalesce(1).write.mode("append").parquet(inR)
    val sl = spark.readStream.schema(l1.schema).parquet(inL)
    val sr = spark.readStream.schema(r1.schema).parquet(inR)
    val q = StreamOps.intervalJoin(sl, sr, "user_id", "ts", "2 hours", "1 hour")
      .select("user_id").writeStream
      .outputMode("append").format("memory").queryName("ssj_test").start()
    try {
      q.processAllAvailable()
      val matched = spark.table("ssj_test").as[Long].collect().toSeq
      assert(matched == Seq(1L), s"got $matched")
      // the join is stateful on BOTH sides: late-but-in-window right
      // rows arriving in a later batch still match
      Seq((2L, 10L * hourNs + hourNs / 4)).toDF("user_id", "ts")
        .coalesce(1).write.mode("append").parquet(inR)
      q.processAllAvailable()
      val after2 = spark.table("ssj_test").as[Long].collect().sorted.toSeq
      assert(after2 == Seq(1L, 2L), s"got $after2")
    } finally q.stop()
  }

  test("session_window filter pushdown: naive form yields a phantom partial; sessionWindowAgg is immune") {
    val minNs = 60L * 1000 * 1000 * 1000
    // user 1: events at 0, 50, 100 min with a 1-hour gap — ONE merged
    // session [0, 160min); it STRADDLES a 120-min cutoff, so filtering
    // closed sessions by session_end <= cut must return nothing
    val df = Seq(0L, 50L, 100L).map(m => (1L, m * minNs, 1.0))
      .toDF("user_id", "ts", "value")
    val cut = timestamp_micros(lit(120L * 60L * 1000000L))
    // the naive shape (sessionWindowAgg before the barrier): Catalyst
    // pushes the session_end filter through the merging aggregate as a
    // per-row event-time prune, truncating the straddling session to a
    // phantom partial (the 0- and 50-min events) that passes the
    // filter — the r15 soak finding. If THIS assertion ever fails,
    // Spark fixed the pushdown and the barrier can be retired.
    val naive = StreamOps.eventTime(df, "ts")
      .groupBy(session_window(col("event_time"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.end").as("session_end"),
        col("n_events"))
      .filter(col("session_end") <= cut)
      .collect()
    assert(naive.length == 1 && naive(0).getLong(2) == 2L,
      "expected the phantom truncated session the raw pushdown produces")
    // the API form: the barrier pins the filter to the aggregate's
    // true output — the straddling session is filtered whole
    val api = StreamOps
      .sessionWindowAgg(df, "ts", "10 seconds", "1 hour", "user_id")
      .filter(col("session_end") <= cut)
      .collect()
    assert(api.isEmpty, "sessionWindowAgg leaked a phantom truncated session")
    // and without the filter the API emits the one true merged session
    val full = StreamOps
      .sessionWindowAgg(df, "ts", "10 seconds", "1 hour", "user_id")
      .collect()
    assert(full.length == 1 &&
      full(0).getLong(full(0).fieldIndex("n_events")) == 3L)
  }

  test("streaming session windows: gap-split sessions emit on watermark, late data is evicted") {
    val input = Files.createTempDirectory("sesswin-in").toString
    val secNs = 1000L * 1000 * 1000
    // user 7: two events 5s apart (one session, gap 30s);
    // user 8: a lone event far later that will advance the watermark
    val b1 = Seq((7L, 100L * secNs, 1.0), (7L, 105L * secNs, 2.0))
      .toDF("user_id", "ts", "value")
    b1.coalesce(1).write.mode("append").parquet(input)
    val stream = spark.readStream.schema(b1.schema).parquet(input)
    val q = StreamOps.sessionWindowAgg(stream, "ts", "10 seconds", "30 seconds", "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("sesswin_test").start()
    try {
      q.processAllAvailable()
      // watermark still at 105s-10s: the open session must NOT emit yet
      assert(spark.table("sesswin_test").count() == 0,
        "open session emitted before the watermark closed it")

      // advance event time far past session end (135s) + lateness
      Seq((8L, 1000L * secNs, 9.0)).toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(input)
      q.processAllAvailable()
      val closed = spark.table("sesswin_test")
        .select("user_id", "n_events", "sum_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(closed == Set((7L, 2L, 3.0)),
        s"expected user 7's merged 2-event session, got $closed")

      // a late event INSIDE the closed session (behind the watermark)
      // must be dropped, not reopen/duplicate the session
      Seq((7L, 106L * secNs, 100.0)).toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(input)
      // and another watermark push so any wrongly-opened session would flush
      Seq((8L, 2000L * secNs, 9.0)).toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(input)
      q.processAllAvailable()
      val after = spark.table("sesswin_test")
        .filter($"user_id" === 7L)
        .select("user_id", "n_events", "sum_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(after == Set((7L, 2L, 3.0)),
        s"late event must be evicted, got $after")
    } finally q.stop()
  }

  test("streaming near-dup flags cross-batch LSH collisions against first-seen reps") {
    val input = Files.createTempDirectory("neardup-in").toString
    val textA = (1 to 40).map(i => s"token$i").mkString(" ")
    val textB = (1 to 40).map(i => s"other$i").mkString(" ")
    val b1 = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    b1.coalesce(1).write.mode("append").parquet(input)
    val stream = spark.readStream.schema(b1.schema).parquet(input)
    val q = StreamOps.nearDupStream(spark, stream).writeStream
      .outputMode("append").format("memory").queryName("neardup_test").start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("neardup_test").as[StreamOps.BandHit].collect()
      assert(after1.forall(_.is_first), "batch 1 docs are all new buckets")
      assert(after1.count(_.doc_id == 1L) == graft.operators.Dedup.LshBands)

      // batch 2: doc 11 is an exact copy of doc 1's text (collides in
      // all 16 bands), doc 12 is fresh
      Seq((11L, textA), (12L, (1 to 40).map(i => s"fresh$i").mkString(" ")))
        .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(input)
      q.processAllAvailable()
      val hits = spark.table("neardup_test").as[StreamOps.BandHit].collect()
      val doc11 = hits.filter(_.doc_id == 11L)
      assert(doc11.length == graft.operators.Dedup.LshBands)
      assert(doc11.forall(h => !h.is_first && h.rep_id == 1L),
        "replayed text must hit doc 1's buckets in every band")
      val doc12 = hits.filter(_.doc_id == 12L)
      assert(doc12.forall(_.is_first), "fresh text opens fresh buckets")
    } finally q.stop()
  }

  test("streaming drift maintenance: histogram == batch histogram, exact KS readout, replays no-op") {
    val input = Files.createTempDirectory("drift-in").toString
    val ckpt = Files.createTempDirectory("drift-ckpt").toString
    val store = new StreamOps.DriftMaintainer(spark, buckets = 10,
      lo = 0.0, hi = 100.0)
    val b1 = Seq(5.0, 15.0, 15.0, 25.0, 99.0, 150.0) // 150 clamps to bucket 9
    b1.toDF("v").coalesce(1).write.mode("append").parquet(input)
    val stream = spark.readStream.schema("v DOUBLE").parquet(input)
    val q = StreamOps.maintainDrift(stream, "v", store, ckpt)
    try {
      q.processAllAvailable()
      val b2 = Seq(-3.0, 35.0, 45.0, 45.0) // -3 clamps to bucket 0
      b2.toDF("v").coalesce(1).write.mode("append").parquet(input)
      q.processAllAvailable()
      def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val all = (b1 ++ b2).toDF("v")
      // micro-batch boundaries are invisible: maintained == batch
      assert(cells(store.histogram) == cells(store.bucketed(all, "v")))
      // KS vs a fully-shifted baseline: live mass is all <= bucket 4
      // plus 2@9, base all in 5..8 -> max gap at bucket 4:
      // |8*5 - 0*10| / 50 = 0.8 exactly
      val base = Seq(55.0, 65.0, 65.0, 75.0, 85.0).toDF("v")
      val drift = store.driftVs(store.bucketed(base, "v")).head()
      assert((drift.getLong(0), drift.getLong(1), drift.getLong(2)) ==
        ((10L, 5L, 800000L)))
      // identical distributions read 0 drift
      val self = store.driftVs(store.bucketed(all, "v")).head()
      assert(self.getLong(2) == 0L)
      // a replayed micro-batch id must not double-count
      val before = cells(store.histogram)
      store.merge(store.bucketed(b1.toDF("v"), "v"), 0L)
      assert(cells(store.histogram) == before, "replayed batch merged twice")
    } finally q.stop()
  }

  test("join-MV maintenance: delta-only enrichment equals batch join, as-of-ingest dims, replay no-op") {
    val input = Files.createTempDirectory("jmv-in").toString
    val ckpt = Files.createTempDirectory("jmv-ckpt").toString
    val out = Files.createTempDirectory("jmv-out").toString
    val store = new StreamOps.JoinMvMaintainer(spark, out, Seq("k"))
    val dimV1 = Seq((1L, "red"), (2L, "blue")).toDF("k", "color")
    store.setDim(broadcast(dimV1))
    val b1 = Seq((10L, 1L), (11L, 2L)).toDF("id", "k")
    b1.coalesce(1).write.mode("append").parquet(input)
    val stream = spark.readStream.schema(b1.schema).parquet(input)
    val q = StreamOps.maintainJoinMv(stream, store, ckpt)
    try {
      q.processAllAvailable()
      def rows() = store.view.select("id", "k", "color").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(rows() == Set((10L, 1L, "red"), (11L, 2L, "blue")))
      // dim swap between batches: later facts see the NEW snapshot,
      // earlier output is untouched (as-of-ingest)
      store.setDim(broadcast(Seq((1L, "crimson"), (2L, "blue"))
        .toDF("k", "color")))
      Seq((12L, 1L)).toDF("id", "k").coalesce(1)
        .write.mode("append").parquet(input)
      q.processAllAvailable()
      assert(rows() == Set((10L, 1L, "red"), (11L, 2L, "blue"),
        (12L, 1L, "crimson")))
      // replayed batch id: no duplicate rows, view unchanged
      store.merge(b1, 0L)
      assert(rows().size == 3, "replayed batch enriched twice")
      // provenance: the batch partition column is readable
      val batches = store.view.select("batch").distinct().count()
      assert(batches == 2L)
    } finally q.stop()
  }

  test("streaming CMS maintenance: merged sketch == batch sketch, replays no-op") {
    val input = Files.createTempDirectory("cms-in").toString
    val ckpt = Files.createTempDirectory("cms-ckpt").toString
    val store = new StreamOps.CmsMaintainer(spark)
    val b1 = Seq.fill(30)("hot") ++ Seq("a", "b", "c")
    b1.toDF("item").coalesce(1).write.mode("append").parquet(input)
    val stream = spark.readStream.schema("item STRING").parquet(input)
    val q = StreamOps.maintainCms(stream, "item", store, ckpt)
    try {
      q.processAllAvailable()
      val b2 = Seq.fill(20)("hot") ++ Seq.fill(10)("warm") ++ Seq("d")
      b2.toDF("item").coalesce(1).write.mode("append").parquet(input)
      q.processAllAvailable()
      // cell-exact: the maintained sketch equals the batch sketch over
      // the full history (CMS merge is exact addition)
      def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val all = (b1 ++ b2).toDF("item")
      assert(cells(store.counterTable) ==
        cells(operators.Sketches.cmsCounters(all, "item")))
      // point estimates: never undercount, and the hot item reads exact
      val est = store.estimates(all.distinct(), "item").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = (b1 ++ b2).groupBy(identity).view.mapValues(_.size.toLong)
      exact.foreach { case (it, n) => assert(est(it) >= n, s"$it undercounted") }
      assert(est("hot") == 50L || est("hot") >= 50L)
      // a replayed micro-batch id must not double-count
      val before = cells(store.counterTable)
      store.merge(operators.Sketches.cmsCounters(b1.toDF("item"), "item"), 0L)
      assert(cells(store.counterTable) == before, "replayed batch merged twice")
    } finally q.stop()
  }

  test("nested path get/replace") {
    val df = Seq((1L, ("a", 2))).toDF("id", "s")
      .select($"id", struct($"s._1".as("x"), struct($"s._2".as("y")).as("inner")).as("s"))
    val replaced = df.select(
      graft.operators.Nested.withPath($"s", "inner.y", lit(99)).as("s"))
    assert(replaced.select("s.inner.y").head().getInt(0) == 99)
    assert(replaced.select("s.x").head().getString(0) == "a")
  }

  test("config loader precedence and aliasing") {
    val cfg = GraftConfig(
      defaults = Map("kafka.url" -> "default:9092", "other" -> "d"),
      env = Map("KAFKA_URL" -> "env:9092"),
      overrides = Map.empty)
    assert(cfg.get("bootstrap.servers").contains("env:9092")) // alias + env wins
    assert(cfg.get("OTHER").contains("d"))
    val cfg2 = cfg.copy(overrides = Map("kafka.url" -> "override:9092"))
    assert(cfg2.get("BOOTSTRAP_SERVERS").contains("override:9092"))
  }

  test("sink connection test surfaces failures") {
    val ok = new graft.sources.JsonFileSink(
      Files.createTempDirectory("sink-ok").toString)
    assert(ok.testConnection().isRight)
    val bad = new graft.sources.JsonFileSink("/proc/definitely/not/writable")
    assert(bad.testConnection().isLeft)
  }
}
