package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every catalog query end-to-end at the
  * given scale factor and prints ONE JSON line.
  *
  * Methodology: each query is fully materialized through the `noop`
  * sink (count() would let Catalyst prune expensive projections away).
  * Every query first runs ONCE unmeasured — warming JVM/JIT profiles,
  * classloading, codegen, and every table's parquet footers — then
  * TWO measured passes run and the per-query MIN is reported. One
  * pass cannot defend against a contended host: a roaming stall
  * (historically 5-30 s, landing on random queries) inflates whatever
  * it hits, but it cannot hit the same query in both passes — the min
  * self-certifies. Both pass totals are emitted so a disagreement
  * (>±1 s) flags a noisy window instead of silently shipping it.
  *
  * Min-of-2 is blind to a window that is UNIFORMLY slow (both passes
  * agree, both contended — the r5 failure mode: every number 1.6-9×
  * inflated yet `noisy_host:false`). Defense: an absolute calibration
  * probe — a fixed-work, IO-free query (`bit_xor(xxhash64)` over
  * `spark.range`, deterministic plan, whole-stage codegen) timed at
  * the start and end of each measured pass and compared against a
  * COMMITTED idle-host reference time. Any probe >1.5× reference ⇒
  * `contended_window:true`: the artifact self-certifies instead of
  * needing an out-of-band re-run. Recalibrate with
  * `runMain graft.Bench --probe-cal` on a quiet host.
  */
object Bench {
  /** Fixed probe work: 500M-row hash-reduce, zero IO, one stage —
    * big enough (~1 s idle) that scheduler jitter amortizes. */
  private val ProbeRows = 500000000L
  /** Idle-host reference seconds for the probe (min of 6, this repo's
    * sandbox host, local[32]; see BASELINE.md "bench calibration"). */
  val ProbeRefSec = 0.25 // re-verified 2026-08-16 (r18): the shallow-warmup probe-cal read ~0.31 but that was JIT residue — after the warmup fix below, three fresh-JVM runs read mins 0.262/0.282/0.276 and r17's own driver window probed 0.215-0.236 warm. Floor unchanged within noise; see BASELINE.md "bench calibration".

  def probeOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, ProbeRows, 1, 32)
      .selectExpr("bit_xor(xxhash64(id, id * 2654435761)) AS h").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** One calibration point = min of 2 back-to-back probes: a stray
    * scheduling hiccup on one probe must not fake a contended window. */
  def probePoint(spark: SparkSession): Double =
    math.min(probeOnce(spark), probeOnce(spark))

  /** Committed per-query reference mins from the last CLEAN round
    * (judge-corrected where a stall was caught); drives the
    * stall-suspect re-time pass. Flat `{"name": seconds, ...}` JSON;
    * parsed with a regex so Bench stays dependency-free. Missing file
    * (or a query absent from it — e.g. new this round) simply disables
    * re-timing for those queries. */
  def loadRef(): Map[String, Double] = {
    val p = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "bench_ref.json"))
    if (!java.nio.file.Files.exists(p)) Map.empty
    else
      """"([^"]+)"\s*:\s*(-?[0-9.eE+]+)""".r
        .findAllMatchIn(java.nio.file.Files.readString(p))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tuning.engineDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.contains("--probe-cal")) {
      // calibration must measure the same regime real bench probes run
      // in — a fully JIT-warm JVM. 3 warmups read ~0.31 where a warm
      // bench JVM reads ~0.25 (r18 measurement); 12 warmups converge.
      (1 to 12).foreach(_ => probeOnce(spark))
      val ts = Seq.fill(8)(probeOnce(spark))
      println("probe_cal_times=" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
        + f" min=${ts.min}%.3f")
      spark.stop(); return
    }

    def run(name: String): Double = {
      spark.catalog.clearCache() // query-local caches must not leak across measurements
      val t0 = System.nanoTime()
      try Queries.all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // optional args: bench only the named queries (repeated per arg)
    val names = if (args.nonEmpty) args.toSeq else Queries.all.keys.toSeq.sorted
    // full unmeasured pass: every query (hence every table) once.
    // NonFatal only — an OOM/linkage error must abort the bench here,
    // not resurface confusingly inside a measured pass
    names.foreach { n =>
      spark.catalog.clearCache()
      try Queries.all(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => }
    }
    // warm the probe to JIT steady state (first runs are ~1.6× slower
    // while C2 compiles the hash loop — measured in --probe-cal)
    (1 to 3).foreach(_ => probeOnce(spark))
    val probeTimes = scala.collection.mutable.ArrayBuffer[Double]()
    val passes = Seq.fill(2) {
      probeTimes += probePoint(spark) // start-of-pass calibration
      val p = names.map(n => n -> run(n)).toMap
      probeTimes += probePoint(spark) // end-of-pass calibration
      p
    }
    val twoPassBest = names.map { n =>
      val valid = passes.map(_(n)).filter(_ >= 0)
      n -> (if (valid.isEmpty) -1.0 else valid.min)
    }
    // Stall defense beyond min-of-2: a roaming stall CAN land on the
    // same query in both passes (r7: q_pagerank read 3.53 s while a
    // judge re-time got 1.70 s). Against the committed last-clean-round
    // reference (bench_ref.json), any query whose min exceeds its
    // reference by >1.5× AND >0.3 s absolute gets ONE probe-bracketed
    // re-time; the reported value is the min of all three runs and the
    // query is flagged in `requeried` so a reader can tell a re-timed
    // stall from a genuine regression.
    val refAll = loadRef()
    // `_probe_ref_sec` records the probe floor measured when the refs
    // were certified (ADVICE r17): scaling refs by the CURRENT window's
    // probe median ties the suspect gate to measured host speed — a
    // faster host tightens the gate proportionally instead of silently
    // weakening it. Scale clamped DOWNWARD ONLY, [0.7, 1.0] (ADVICE
    // r18): an upward clamp of 1.5 made the effective gate v > ref*2.25
    // on a mildly-contended window, shipping a genuine ~2× regression
    // without a re-time; contention must never loosen the gate — on a
    // slow window suspects simply requery at the unscaled threshold and
    // the min-of-3 stays sound.
    val refProbe = refAll.getOrElse("_probe_ref_sec", ProbeRefSec)
    val ref = refAll - "_probe_ref_sec"
    val probesSoFar = probeTimes.sorted
    val probeMedSoFar =
      if (probesSoFar.isEmpty) refProbe
      else (probesSoFar((probesSoFar.size - 1) / 2) +
        probesSoFar(probesSoFar.size / 2)) / 2.0
    val hostScale = math.min(1.0, math.max(0.7, probeMedSoFar / refProbe))
    val suspectsAll = twoPassBest.collect {
      case (n, v) if v >= 0 && ref.get(n).exists(r =>
          v > r * hostScale * 1.5 && v - r * hostScale > 0.3) =>
        (n, v / (ref(n) * hostScale))
    }.sortBy(-_._2)
    val suspects = suspectsAll.take(12).map(_._1)
    // the cap exists so a catastrophically contended window can't turn
    // the bench into a 3rd full pass — but a truncated list must SAY so
    val suspectsDropped = suspectsAll.drop(12).map(_._1)
    val requeried: Map[String, Double] =
      if (suspects.isEmpty) Map.empty
      else {
        probeTimes += probePoint(spark)
        val r = suspects.map(n => n -> run(n)).toMap
        probeTimes += probePoint(spark)
        r
      }
    val prelim = twoPassBest.map { case (n, v) =>
      n -> requeried.get(n).filter(_ >= 0).map(math.min(v, _)).getOrElse(v)
    }
    // Per-query variance for the top-3 cost centers: they dominate the
    // total and are where a roaming stall distorts the round-over-round
    // signal most (pagerank read 3.2-3.5 s for two rounds while
    // re-times said 1.7-2.2). Run each a THIRD measured time and emit
    // every observation — spread across the runs exposes a stall that
    // landed on the same query in both passes; the extra run also
    // tightens the reported min.
    val top3 = prelim.filter(_._2 >= 0).sortBy(-_._2).take(3).map(_._1)
    // Probe-bracketed like the passes and the requeried run: a contended
    // window landing exactly on the third run must show in probe_times,
    // or the emitted top3_runs spread could be stall-inflated without the
    // self-certification flag.
    val top3Extra: Map[String, Double] =
      if (top3.isEmpty) Map.empty
      else {
        probeTimes += probePoint(spark)
        val r = top3.map(n => n -> run(n)).toMap
        probeTimes += probePoint(spark)
        r
      }
    val top3Obs: Map[String, Seq[Double]] = top3.map { n =>
      n -> (passes.map(_(n)) ++ requeried.get(n) :+ top3Extra(n)).filter(_ >= 0)
    }.toMap
    val best = prelim.map { case (n, v) =>
      n -> top3Extra.get(n).filter(_ >= 0).map(math.min(v, _)).getOrElse(v)
    }
    // The harness retains only the last ~2000 chars of stdout. Two
    // lines, cheap-to-expensive ordering everywhere:
    //  1. the COMPLETE per-query map sorted ASCENDING by cost (head may
    //     be clipped — by construction the retained tail holds the top
    //     cost centers). Failure sentinels (-1.0) sort last of all: a
    //     broken query must never be hidden by truncation.
    //  2. a FINAL compact metric line sized to fit the 2000-char window
    //     whole (3-decimal timings, top-30 query map) so the driver's
    //     JSON parse succeeds instead of landing mid-line.
    def jnum(v: Double): String = if (v < 0) "-1.0" else f"$v%.3f"
    val asc = best.sortBy { case (_, v) => if (v < 0) Double.MaxValue else v }
    println(asc.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{\"all_queries_asc\":{", ",", "}}"))
    val total = best.map(_._2).filter(_ >= 0).sum
    val totals = passes.map(_.values.filter(_ >= 0).sum)
    val passTotals = totals.map(t => f"$t%.1f").mkString("[", ",", "]")
    // >1.5× disagreement between the two measured passes = a contended
    // host window; the per-query min is still sound, but flag it so a
    // reader never mistakes contamination for regression (or vice versa)
    val noisy = totals.max > totals.min * 1.5
    // absolute check: any calibration probe >1.5× the committed idle-host
    // reference means the WHOLE window (not just one pass) was contended
    val contended = probeTimes.exists(_ > ProbeRefSec * 1.5)
    // the point check misses UNIFORM mild slowness (r16: probes ran a
    // steady 1.32× ref on a ~10% hot host and contended_window stayed
    // false — BASELINE.md calibration history shows uniform slowness
    // is the recurring failure mode). The median over all calibration
    // points is robust to the occasional clean probe AND to the
    // occasional stalled one; >1.15× ref flags a window whose every
    // number likely carries a constant factor.
    val sortedProbes = probeTimes.sorted
    val probeMedian =
      if (sortedProbes.isEmpty) 0.0
      else (sortedProbes((sortedProbes.size - 1) / 2) +
        sortedProbes(sortedProbes.size / 2)) / 2.0
    val contendedMedian = probeMedian > ProbeRefSec * 1.15
    val probeJson = probeTimes.map(t => f"$t%.3f").mkString("[", ",", "]")
    val top30 = best.sortBy { case (_, v) => if (v < 0) Double.MinValue else -v }
      .take(30).map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val bestMap = best.toMap
    val reqJson = suspects.map(n => "\"" + n + "\":" + jnum(bestMap(n)))
      .mkString("{", ",", "}")
    // names capped at 8: the final line must stay inside the driver's
    // 2000-char stdout window; `suspects_dropped_n` carries the true count
    val droppedJson = suspectsDropped.take(8).map(n => "\"" + n + "\"")
      .mkString("[", ",", "]")
    val top3Json = top3.map { n =>
      "\"" + n + "\":" + top3Obs(n).map(jnum).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f"$total%.1f"},"unit":"sec","queries":$top30,"queries_shown":${math.min(30, names.size)},"n_queries":${names.size},"requeried":$reqJson,"suspects_dropped":$droppedJson,"suspects_dropped_n":${suspectsDropped.size},"ref_probe_sec":$refProbe,"host_scale":${f"$hostScale%.3f"},"top3_runs":$top3Json,"pass_totals":$passTotals,"noisy_host":$noisy,"probe_ref_sec":$ProbeRefSec,"probe_times":$probeJson,"contended_window":$contended,"probe_median":${f"$probeMedian%.3f"},"contended_median":$contendedMedian,"sf":"$sfDir"}""")
    spark.stop()
  }
}
