package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MaterializedViewSpec extends AnyFunSuite with SparkTestBase
    with org.scalatest.BeforeAndAfterEach {
  import graft.plans.MaterializedView

  // per-test sweep of the session-keyed registry: the weak key cannot
  // free entries on its own (documented lifecycle contract), so tests
  // that register MVs on throwaway child sessions must not leak them
  // into later tests
  override def afterEach(): Unit = {
    MaterializedView.clearAllRegistrations()
    super.afterEach()
  }

  private def rollup(ss: SparkSession): DataFrame =
    Tables.lineitem(ss, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("n"))

  private def relationPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          f.location.rootPaths.map(_.toString).mkString(",")
        case other => other.toString
      }
    }

  test("exact-match aggregate is rewritten to scan the MV, values unchanged") {
    val mvs = MaterializedView.sessionWith(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    MaterializedView.register(mvs, "mv_rollup", rollup(mvs), path)

    val q = rollup(mvs).orderBy(col("l_returnflag"), col("l_linestatus"))
    val optimized = q.queryExecution.optimizedPlan
    assert(optimized.collect { case a: Aggregate => a }.isEmpty,
      s"aggregate survived the rewrite:\n$optimized")
    assert(relationPaths(q).exists(_.contains(path)),
      s"plan does not scan the MV at $path:\n$optimized")

    val viaMv = q.collect()
    val base = rollup(spark).orderBy(col("l_returnflag"), col("l_linestatus")).collect()
    assert(viaMv.toSeq == base.toSeq)
  }

  test("operators above the aggregate keep working over the substituted scan") {
    val mvs = MaterializedView.sessionWith(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    MaterializedView.register(mvs, "mv_rollup", rollup(mvs), path)

    val filtered = rollup(mvs).filter(col("n") > 100).orderBy(col("sq"))
    assert(relationPaths(filtered).exists(_.contains(path)))
    val expected = rollup(spark).filter(col("n") > 100).orderBy(col("sq")).collect()
    assert(filtered.collect().toSeq == expected.toSeq)
  }

  private def fineCube(ss: SparkSession): DataFrame =
    Tables.lineitem(ss, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("mn"), max(col("l_extendedprice")).as("mx"))

  test("roll-up: coarser grouping re-aggregates the MV instead of the fact table") {
    val mvs = MaterializedView.sessionWith(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    MaterializedView.register(mvs, "mv_cube", fineCube(mvs), path)

    def coarse(ss: SparkSession): DataFrame = Tables.lineitem(ss, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("mn"), max(col("l_extendedprice")).as("mx"))

    val q = coarse(mvs).orderBy(col("l_returnflag"))
    assert(relationPaths(q).exists(_.contains(path)),
      s"roll-up did not target the MV:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect().toSeq == coarse(spark).orderBy(col("l_returnflag")).collect().toSeq)

    // global roll-up (no grouping) over the same MV
    def global(ss: SparkSession): DataFrame = Tables.lineitem(ss, sf)
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("n"))
    val g = global(mvs)
    assert(relationPaths(g).exists(_.contains(path)))
    assert(g.collect().toSeq == global(spark).collect().toSeq)
  }

  test("roll-up refuses what partials cannot answer: double avg and distinct") {
    val mvs = MaterializedView.sessionWith(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    MaterializedView.register(mvs, "mv_cube", fineCube(mvs), path)

    // l_quantity is DOUBLE: its sum partials are partition-order
    // sensitive, so the avg derivation must refuse even though the
    // cube carries both sum(l_quantity) and count
    val avgQ = Tables.lineitem(mvs, sf)
      .groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("aq"))
    assert(!relationPaths(avgQ).exists(_.contains(path)),
      "double-typed avg must not roll up")

    val distinctQ = Tables.lineitem(mvs, sf)
      .groupBy(col("l_returnflag")).agg(countDistinct(col("l_partkey")).as("nd"))
    assert(!relationPaths(distinctQ).exists(_.contains(path)),
      "count distinct must not roll up")

    // grouping by a non-MV column must not roll up either
    val otherGroup = Tables.lineitem(mvs, sf)
      .groupBy(col("l_shipdate")).agg(sum(col("l_quantity")).as("sq"))
    assert(!relationPaths(otherGroup).exists(_.contains(path)))
  }

  test("avg roll-up: decimal avg derives from (sum, count) partials, bit-exact") {
    val mvs = MaterializedView.sessionWith(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    def pc = col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
    def fine(ss: SparkSession): DataFrame = Tables.lineitem(ss, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(pc).as("sp"), count(pc).as("np"))
    MaterializedView.register(mvs, "mv_avg_cube", fine(mvs), path)

    def coarse(ss: SparkSession): DataFrame = Tables.lineitem(ss, sf)
      .groupBy(col("l_returnflag"))
      .agg(avg(pc).as("ap"), sum(pc).as("sp"))
      .orderBy(col("l_returnflag"))
    val q = coarse(mvs)
    assert(relationPaths(q).exists(_.contains(path)),
      s"decimal avg did not roll up:\n${q.queryExecution.optimizedPlan}")
    // decimal equality is exact: the derived sum(sum)/sum(n) must
    // round once at Average's own result scale and agree bit-for-bit
    assert(q.collect().toSeq == coarse(spark).collect().toSeq)

    // Half-boundary rounding pin: avg = 0.50/1000001 sits within
    // 5e-13 BELOW a half-microunit. A single rounding at the scale-6
    // result gives 0.000000 (what native Average produces — measured),
    // while any chain that first rounds at an intermediate scale
    // (e.g. a (38,12) divide) and then casts to scale 6 double-rounds
    // UP to 0.000001. The rewrite must agree with native bit-for-bit
    // on exactly this data — it catches a double-rounding rewrite
    // red-handed.
    val hbPath = java.nio.file.Files.createTempDirectory("graft-mv-hb").toString
    val hbTbl = s"$hbPath/t"
    spark.range(1000001).select(
        lit("a").as("g"), (col("id") % 4).as("h"),
        when(col("id") === 0, lit("0.50")).otherwise(lit("0.00"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
      .write.mode("overwrite").parquet(hbTbl)
    val mvsHb = MaterializedView.sessionWith(spark)
    def hbFine(ss: SparkSession): DataFrame = ss.read.parquet(hbTbl)
      .groupBy(col("g"), col("h"))
      .agg(sum(col("v")).as("sp"), count(col("v")).as("np"))
    MaterializedView.register(mvsHb, "mv_avg_hb", hbFine(mvsHb),
      java.nio.file.Files.createTempDirectory("graft-mv-hb-mv").toString)
    def hbCoarse(ss: SparkSession): DataFrame = ss.read.parquet(hbTbl)
      .groupBy(col("g")).agg(avg(col("v")).as("av"))
    val hbQ = hbCoarse(mvsHb)
    assert(relationPaths(hbQ).exists(_.contains("graft-mv-hb-mv")),
      "half-boundary query must roll up through the MV")
    val (got, want) = (hbQ.head().getDecimal(1), hbCoarse(spark).head().getDecimal(1))
    assert(got == want && got.toPlainString == "0.000000",
      s"half-boundary rounding mismatch: mv=$got native=$want")

    // a cube WITHOUT the count column cannot answer avg
    val path2 = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    def sumOnly(ss: SparkSession): DataFrame = Tables.lineitem(ss, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus")).agg(sum(pc).as("sp"))
    val mvs2 = MaterializedView.sessionWith(spark)
    MaterializedView.register(mvs2, "mv_sum_only", sumOnly(mvs2), path2)
    val q2 = Tables.lineitem(mvs2, sf)
      .groupBy(col("l_returnflag")).agg(avg(pc).as("ap"))
    assert(!relationPaths(q2).exists(_.contains(path2)),
      "avg must not roll up without a count partial")
  }

  test("registry stays bounded across a 100-iteration register/drop loop") {
    // The weak session key alone cannot free an entry (the MV's plans
    // reference the owning session) — the documented contract is that
    // register/unregister pairs bound growth. Drive it 100 times and
    // watch the registry's session count.
    val before = MaterializedView.registrySessionCount
    val root = java.nio.file.Files.createTempDirectory("graft-mv-loop").toString
    def tiny(ss: SparkSession): DataFrame =
      ss.range(10).select((col("id") % 2).as("g"), col("id").as("v"))
        .groupBy(col("g")).agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
    (1 to 100).foreach { i =>
      val s = MaterializedView.sessionWith(spark)
      MaterializedView.register(s, "mv_loop", tiny(s), s"$root/$i")
      MaterializedView.unregister(s, "mv_loop")
    }
    assert(MaterializedView.registrySessionCount <= before,
      s"registry grew: before=$before after=${MaterializedView.registrySessionCount}")
  }

  test("catalog q_mv_rewrite and q_mv_rollup actually plan over the summary") {
    val exact = Queries.qMvRewrite(spark, sf)
    val exactPaths = relationPaths(exact)
    assert(exactPaths.nonEmpty && !exactPaths.exists(_.contains("lineitem")),
      s"q_mv_rewrite still scans the fact table: $exactPaths")
    val roll = Queries.qMvRollup(spark, sf)
    val rollPaths = relationPaths(roll)
    assert(rollPaths.nonEmpty && !rollPaths.exists(_.contains("lineitem")),
      s"q_mv_rollup still scans the fact table: $rollPaths")
    val rollAvg = Queries.qMvRollupAvg(spark, sf)
    val rollAvgPaths = relationPaths(rollAvg)
    assert(rollAvgPaths.nonEmpty && !rollAvgPaths.exists(_.contains("lineitem")),
      s"q_mv_rollup_avg still scans the fact table: $rollAvgPaths")
  }

  test("incremental refresh: delta merge equals recompute over the appended fact") {
    val mvs = MaterializedView.sessionWith(spark)
    val factDir = java.nio.file.Files.createTempDirectory("graft-mv-fact").toString
    val mvPath = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString

    val all = Tables.lineitem(spark, sf)
    all.filter(col("l_orderkey") % 3 =!= 0).write.mode("overwrite").parquet(factDir)

    def cube(ss: SparkSession): DataFrame = ss.read.parquet(factDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_linenumber").cast("long")).as("sl"), count(lit(1)).as("n"),
        min(col("l_orderkey")).as("mn"), max(col("l_orderkey")).as("mx"))
    MaterializedView.register(mvs, "mv_inc", cube(mvs), mvPath)

    // new fact rows arrive (append-only ingest); summarize ONLY them
    val delta = all.filter(col("l_orderkey") % 3 === 0)
    delta.write.mode("append").parquet(factDir)
    val deltaSummary = delta
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_linenumber").cast("long")).as("sl"), count(lit(1)).as("n"),
        min(col("l_orderkey")).as("mn"), max(col("l_orderkey")).as("mx"))
    MaterializedView.refresh(mvs, "mv_inc", deltaSummary)

    // a coarser roll-up over the appended fact table must hit the MV
    // generation v1 and agree with a from-scratch recompute
    def coarse(ss: SparkSession): DataFrame = ss.read.parquet(factDir)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_linenumber").cast("long")).as("sl"), count(lit(1)).as("n"),
        min(col("l_orderkey")).as("mn"), max(col("l_orderkey")).as("mx"))
      .orderBy(col("l_returnflag"))
    val q = coarse(mvs)
    assert(relationPaths(q).exists(_.contains("_v1")),
      s"query does not read the refreshed generation:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect().toSeq == coarse(spark).collect().toSeq)
  }

  test("streaming maintenance: per-batch refresh keeps the MV current") {
    val mvs = MaterializedView.sessionWith(spark)
    val factDir = java.nio.file.Files.createTempDirectory("graft-mv-sfact").toString
    val mvPath = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mv-ckpt").toString

    val all = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_returnflag"), col("l_linenumber"))
    // schema-only snapshot: the stream accounts for every actual row
    all.limit(0).write.mode("overwrite").parquet(factDir)

    def summarize(df: DataFrame): DataFrame = df
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_linenumber").cast("long")).as("sl"), count(lit(1)).as("n"))
    MaterializedView.register(mvs, "mv_stream",
      summarize(mvs.read.parquet(factDir)), mvPath)

    val stream = spark.readStream.schema(all.schema).parquet(factDir)
    val q = graft.streaming.StreamOps.maintainMv(
      stream, mvs, "mv_stream", summarize, ckpt)
    try {
      all.filter(col("l_orderkey") % 2 === 0).coalesce(1)
        .write.mode("append").parquet(factDir)
      q.processAllAvailable()
      all.filter(col("l_orderkey") % 2 =!= 0).coalesce(1)
        .write.mode("append").parquet(factDir)
      q.processAllAvailable()
    } finally q.stop()

    // batch query over the fact dir rolls up to the maintained MV and
    // equals a from-scratch recompute over everything streamed in
    val viaMv = summarize(mvs.read.parquet(factDir)).orderBy(col("l_returnflag"))
    assert(relationPaths(viaMv).exists(p => p.contains(mvPath) || p.contains("_v")),
      s"query not served by the maintained MV:\n${viaMv.queryExecution.optimizedPlan}")
    val expected = summarize(spark.read.parquet(factDir))
      .orderBy(col("l_returnflag")).collect()
    assert(viaMv.collect().toSeq == expected.toSeq)
  }

  test("refresh generations are bounded on disk; version-like user paths are not mangled") {
    val mvs = MaterializedView.sessionWith(spark)
    val parent = java.nio.file.Files.createTempDirectory("graft-mv-gen").toString
    // a user path that itself ends version-like: the generation suffix
    // must derive from the stored base, never regex-strip this
    val path = s"$parent/user_mv_v3"
    def summarize(df: DataFrame): DataFrame = df
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_linenumber").cast("long")).as("sl"), count(lit(1)).as("n"))
    val base = Tables.lineitem(spark, sf).filter(col("l_orderkey") % 4 === 0)
    MaterializedView.register(mvs, "mv_gen", summarize(base), path)

    (1 to 3).foreach { k =>
      val delta = Tables.lineitem(spark, sf).filter(col("l_orderkey") % 4 === k)
      MaterializedView.refresh(mvs, "mv_gen", summarize(delta))
    }
    val cur = MaterializedView.currentPath(mvs, "mv_gen").get
    assert(cur == s"$parent/user_mv_v3_v3", s"generation path derived wrong: $cur")
    // merged content equals a from-scratch recompute
    val expect = summarize(Tables.lineitem(spark, sf))
      .orderBy(col("l_returnflag")).collect()
    assert(mvs.read.parquet(cur).orderBy(col("l_returnflag")).collect().toSeq
      == expect.toSeq)
    // bounded storage: original + current only — superseded refresh
    // generations (_v1, _v2) are deleted after each swap
    val dirs = new java.io.File(parent).list().sorted.toSeq
    assert(dirs == Seq("user_mv_v3", "user_mv_v3_v3"),
      s"stale generations left on disk: $dirs")

    // unregister drops the rewrite and the refresh-created generation,
    // keeping the caller's registration dir
    MaterializedView.unregister(mvs, "mv_gen")
    assert(MaterializedView.currentPath(mvs, "mv_gen").isEmpty)
    val after = new java.io.File(parent).list().sorted.toSeq
    assert(after == Seq("user_mv_v3"), s"unregister left: $after")
  }

  test("a replayed batch id is a no-op: merge is effectively-once") {
    val mvs = MaterializedView.sessionWith(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    def summarize(df: DataFrame): DataFrame = df
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_linenumber").cast("long")).as("sl"), count(lit(1)).as("n"))
    val base = Tables.lineitem(spark, sf).filter(col("l_orderkey") % 2 === 0)
    val baseDir = java.nio.file.Files.createTempDirectory("graft-mv-rfact").toString
    base.write.mode("overwrite").parquet(baseDir)
    MaterializedView.register(mvs, "mv_replay",
      summarize(mvs.read.parquet(baseDir)), path)

    val delta = Tables.lineitem(spark, sf).filter(col("l_orderkey") % 2 =!= 0)
    MaterializedView.refresh(mvs, "mv_replay", summarize(delta), Some(7L))
    // the at-least-once replay: same batch id again must change nothing
    MaterializedView.refresh(mvs, "mv_replay", summarize(delta), Some(7L))

    val expect = summarize(Tables.lineitem(spark, sf))
      .orderBy(col("l_returnflag")).collect()
    // the current generation must equal base+delta merged exactly once
    val cur = mvs.read.parquet(
      MaterializedView.currentPath(mvs, "mv_replay").get)
      .orderBy(col("l_returnflag")).collect()
    assert(cur.toSeq == expect.toSeq,
      s"replayed batch double-merged: ${cur.toSeq} vs ${expect.toSeq}")
  }

  test("a different aggregate is not rewritten; parent session never rewrites") {
    val mvs = MaterializedView.sessionWith(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-mv-spec").toString
    MaterializedView.register(mvs, "mv_rollup", rollup(mvs), path)

    // a grouping the MV can't answer (l_partkey is not an MV dimension)
    // must keep its Aggregate and scan the fact table; note the
    // coarser (l_returnflag)-only rollup DOES rewrite — that's the
    // roll-up path, exercised in its own test above
    val other = Tables.lineitem(mvs, sf)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
    assert(other.queryExecution.optimizedPlan
      .collect { case a: Aggregate => a }.nonEmpty)
    assert(!relationPaths(other).exists(_.contains(path)))

    // the parent session has no rule registered: same query, no rewrite
    val parent = rollup(spark)
    assert(parent.queryExecution.optimizedPlan
      .collect { case a: Aggregate => a }.nonEmpty)
    assert(!relationPaths(parent).exists(_.contains(path)))
  }
}
