package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sketches, TextPrep}

class TextPrepSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("chunking: overlapped windows reconstruct the original token stream") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").limit(50)
    val chunks = TextPrep.withChunks(docs, "text", 64, 16)
      .select($"doc_id", $"chunk_idx", $"chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val originals = docs.as[(Long, String)].collect().toMap
    val stride = 48
    originals.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val cs = chunks(id)
      // stitch: every chunk contributes its first `stride` tokens, the
      // last chunk contributes everything
      val stitched = cs.dropRight(1).flatMap(_.split(" ", -1).take(stride)) ++
        cs.last.split(" ", -1)
      assert(stitched.toSeq == toks.toSeq, s"doc $id does not reconstruct")
      cs.foreach(c => assert(c.split(" ", -1).length <= 64))
    }
  }

  test("chunking is a pure projection: no shuffle in the plan") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val plan = TextPrep.withChunks(docs, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("packing: offsets stay inside the budget and shards are consistent") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", expr("size(split(text, ' '))").cast("long").as("n_tokens"))
    val packed = TextPrep.withPacks(docs, "doc_id", "n_tokens", 256, 8)
      .select($"doc_id", $"shard", $"pack_idx", $"pack_offset", $"n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(packed.length == 500)
    packed.foreach { case (_, shard, packIdx, off, _) =>
      assert(shard >= 0 && shard < 8)
      assert(off >= 0 && off < 256)
      assert(packIdx >= 0)
    }
    // within a shard, pack start positions are the running token sum
    packed.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, packIdx, off, n) =>
        assert(packIdx == cum / 256 && off == cum % 256)
        cum += n
      }
    }
  }

  test("quota sampling caps every group, ranks densely, and is reproducible") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"source")
    def run() = TextPrep.quotaSample(docs, "source", "doc_id", 40)
      .select($"doc_id", $"source", $"rk").as[(Long, String, Long)].collect().toSeq
    val kept = run()
    kept.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.length <= 40, s"source $src over quota")
      assert(rows.map(_._3).sorted == (1L to rows.length).toSeq, s"ranks not dense for $src")
    }
    assert(run() == kept) // hash-ranked: identical on re-run
  }

  test("tf-idf: rare terms outrank ubiquitous ones at equal term frequency") {
    val docs = Seq(
      (1L, "common rare1 filler1"),
      (2L, "common rare2 filler2"),
      (3L, "common rare3 filler3"))
      .toDF("doc_id", "text")
    val rows = TextPrep.topTfIdf(docs, "doc_id", "text", 3)
      .select($"doc_id", $"term", $"tfidf", $"rk")
      .as[(Long, String, Double, Long)].collect()
    // 'common' has df=3, every other term df=1 with the same tf=1:
    // common must rank LAST in every doc
    rows.groupBy(_._1).foreach { case (d, ts) =>
      assert(ts.maxBy(_._4)._2 == "common", s"doc $d: ${ts.toSeq}")
      assert(ts.map(_._4).sorted.toSeq == Seq(1L, 2L, 3L))
    }
  }

  test("boilerplate: planted near-dup phrases are detected; fractions in (0,1]") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val phrases = Queries.qBoilerplateNgrams(spark, sf)
      .as[(String, Long)].collect()
    assert(phrases.nonEmpty) // planted dup clusters share 5-grams
    phrases.foreach { case (p, n) => assert(n >= 3 && p.split(" ").length == 5) }
    val fracs = Queries.qBoilerplateFraction(spark, sf)
      .select($"boiler_frac").as[Double].collect()
    assert(fracs.nonEmpty)
    fracs.foreach(f => assert(f > 0.0 && f <= 1.0))
    // the planted full-document duplicates must sit at fraction ~1
    assert(fracs.exists(_ > 0.9), "planted near-identical docs should be ~all boilerplate")
  }

  test("pii redaction scrubs emails and phones, leaves clean text alone") {
    val df = Seq(
      (1L, "reach me at jane.doe+x@corp.example.com today"),
      (2L, "call 555-1234 now"),
      (3L, "nothing sensitive here"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextPrep.redactPii(df, "text")
      .select($"doc_id", $"redacted").as[(Long, String)].collect().toMap
    assert(out(1L) == "reach me at [EMAIL] today")
    assert(out(2L) == "call [PHONE] now")
    assert(out(3L) == "nothing sensitive here")
    // the catalog query's synthetic augmentation is fully caught
    val tails = Queries.qRedactPii(spark, sf).select($"tail").as[String].collect()
    assert(tails.nonEmpty)
    tails.foreach { t =>
      assert(t.contains("[EMAIL]") && t.contains("[PHONE]"), t)
      assert(!t.contains("@"), t)
    }
  }

  test("repetition metrics: closed-form on a hand-built doc; clean doc near zero") {
    val df = Seq(
      // "a b a b a b" -> 6 tokens; bigrams: "a b"x3, "b a"x2 -> top = 3
      // 5-grams: "a b a b a", "b a b a b" -> distinct 2 of 2 -> dup 0
      (1L, "a b a b a b"),
      // 8 tokens all "x": bigram "x x"x7 -> top_frac = 14/8 capped? no cap:
      // fraction can exceed 1 on degenerate runs (7*2/8) — documents
      // the Gopher-metric convention of token-coverage counting
      (2L, "x x x x x x x x"),
      (3L, "the quick brown fox jumps over lazy dogs"))
      .toDF("doc_id", "text")
    val m = graft.operators.TextAnalysis.repetitionMetrics(df, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"ttr", $"top_bigram_frac", $"dup_5gram_frac")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(m(1L) == ((1L, 6L, 2.0 / 6, 6.0 / 6, 0.0)))
    assert(m(2L) == ((2L, 8L, 1.0 / 8, 14.0 / 8, 3.0 / 4)))
    assert(m(3L) == ((3L, 8L, 1.0, 2.0 / 8, 0.0)))
    // short doc: no 5-grams, no bigrams -> fractions 0, not null
    val short = graft.operators.TextAnalysis.repetitionMetrics(
        Seq((9L, "solo")).toDF("doc_id", "text"), "doc_id", "text")
      .select($"top_bigram_frac", $"dup_5gram_frac").as[(Double, Double)].head()
    assert(short == ((0.0, 0.0)))
  }

  test("decontamination flags exactly the planted n-gram overlap") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),   // shares 4-gram with eval 10
      (2L, "one two three four five six"),      // no overlap
      (3L, "alpha beta gamma delta zeta"))      // same leading 4-gram
      .toDF("doc_id", "text")
    val eval = Seq(
      (10L, "alpha beta gamma delta others here"),
      (11L, "nothing shared at all whatsoever"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextPrep.decontaminate(train, eval, "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 3L))
    // doc 1 shares "alpha beta gamma delta" AND "beta gamma delta epsilon"? no —
    // eval 10 has "beta gamma delta others", so only the leading 4-gram
    assert(out(1L) == ((1L, 1L)))
    assert(out(3L) == ((1L, 1L)))
    // catalog query: contaminated rows exist and counts are positive
    val rows = Queries.qDecontaminate(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, ng, ne) => assert(ng >= 1 && ne >= 1) }
  }

  test("cms: estimate never undercounts, is within eps·N, state is bounded") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("tok")).filter($"tok" =!= "")
    val counters = Sketches.cmsCounters(toks, "tok")
    // bounded state: at most d×w cells regardless of stream length
    assert(counters.count() <= Sketches.CmsD.toLong * Sketches.CmsW)
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("exact_cnt"))
    val est = Sketches.cmsEstimate(exact, "tok", counters)
      .join(exact, "tok")
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    val n = toks.count()
    val epsN = math.E / Sketches.CmsW * n // CMS guarantee at 1-δ
    est.foreach { case (tok, cms, ex) =>
      assert(cms >= ex, s"$tok: CMS undercounted $cms < $ex")
      assert(cms - ex <= epsN, s"$tok: overcount ${cms - ex} > εN $epsN")
    }
  }

  test("cms: weighted counters over distinct items equal raw-stream counters") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("tok")).filter($"tok" =!= "")
    val raw = Sketches.cmsCounters(toks, "tok")
      .as[(Int, Long, Long)].collect().toSet
    val weighted = Sketches.cmsCountersWeighted(
        toks.groupBy($"tok").agg(count(lit(1)).as("c")), "tok", "c")
      .as[(Int, Long, Long)].collect().toSet
    assert(raw == weighted)
  }

  test("weighted systematic sample equals the single-window reference; ~k rows") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf).select($"doc_id", $"n_chars")
    val k = 50
    val got = TextPrep.systematicWeightedSample(docs, "doc_id", "n_chars", k)
      .select("doc_id").as[Long].collect().toSet
    // reference: one global running-sum window (fine at test scale)
    val wAll = Window.orderBy(md5($"doc_id".cast("string")), $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = docs.agg(sum($"n_chars")).head().getLong(0)
    val ref = docs.withColumn("cum", sum($"n_chars").over(wAll))
      .filter(expr(s"(cum * $k) div $tot > ((cum - n_chars) * $k) div $tot"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == ref)
    assert(math.abs(got.size - k) <= 2, s"got ${got.size} rows, wanted ~$k")
    // PPS property: the sample's mean weight exceeds the corpus mean
    val meanAll = tot.toDouble / docs.count()
    val meanSample = docs.filter($"doc_id".isin(got.toSeq: _*))
      .agg(avg($"n_chars")).head().getDouble(0)
    assert(meanSample > meanAll)
  }

  test("stratified split: exact per-stratum proportions, reproducible") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"source")
    val split = TextPrep.stratifiedSplit(docs, "source", "doc_id", 80, 10)
    val counts = split.groupBy($"source", $"split").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val totals = docs.groupBy($"source").count().as[(String, Long)].collect().toMap
    totals.foreach { case (src, n) =>
      val c = counts(src)
      // exact integer-boundary proportions: floor semantics of rk*100 <= n*pct
      assert(c.getOrElse("train", 0L) == n * 80 / 100, s"$src train")
      assert(c.getOrElse("train", 0L) + c.getOrElse("val", 0L) == n * 90 / 100, s"$src val")
      assert(c.values.sum == n, s"$src total")
    }
    // reproducible: same assignment on re-run, membership disjoint by construction
    val a = split.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val b = TextPrep.stratifiedSplit(docs, "source", "doc_id", 80, 10)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("hll: estimate lands near the exact distinct count; state is bounded") {
    val events = Tables.events(spark, sf).select($"event_type", $"user_id")
    val est = Sketches.hllDistinct(events, Seq("event_type"), $"user_id")
      .as[(String, Long, Double)].collect()
      .map { case (t, nb, e) => t -> ((nb, e)) }.toMap
    val exact = events.distinct().groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, n) =>
      val (nb, e) = est(t)
      assert(nb <= 256)
      // p=8: ~6.5% standard error (linear counting kicks in for the
      // small groups); allow 4 sigma
      assert(math.abs(e - n) / n < 0.26, s"$t: est $e vs exact $n")
    }
  }
}
