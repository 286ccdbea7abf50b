package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Queries, SparkEntry}
import graft.operators.TierProbe

/** Adaptive-gate correctness sweep (judge brief r19 #1).
  *
  * Runs the gate-bearing catalog queries at a given SF, dumps each
  * result parquet (Verify's shape, so the standard DuckDB compare
  * scripts work unchanged), and — the part Verify cannot do — PINS
  * which tier each adaptive gate actually selected during the run,
  * via [[graft.operators.TierProbe]]. One JSON line per query:
  *
  * {"query":"q_triangle_count","tiers":{"graph.triangles":["dense"]}}
  *
  * Forcing a non-default tier on the same data = re-run with the
  * [[graft.operators.GateKnobs]] env knob moved (e.g.
  * SPARK_GRAFT_TRI_DENSE_MAX_NODES=1 selects the sparse tier at any
  * SF); the dumped parquet must stay oracle-exact, and the emitted
  * tier line proves the forced tier really ran.
  *
  * Usage: runMain graft.tools.GateSweep <sfDir> <outDir> [q1,q2,...]
  * (default query set = every gate-bearing catalog query).
  */
object GateSweep {
  /** Catalog queries that exercise at least one adaptive gate. */
  val GateQueries: Seq[String] = Seq(
    "q_triangle_count", "q_local_clustering", // graph.triangles
    "q_dedup_clusters", "q_cc_size_hist", // dedup.cc
    "q_sim_join_exact", // dedup.exactSimJoin
    "q_containment_join", // dedup.containmentJoin
    "q_itemset_pairs", "q_item_lift", // paircore
    "q_quantile_global", "q_winsorized", // quantiles.rank
    "q_weighted_quantiles") // quantiles.weightedRank

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val names =
      if (args.length > 2) args(2).split(",").toSeq else GateQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.Tuning.engineDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    System.err.println(
      s"[gatesweep] datagen_id=${DataGenId.of(sfDir)} dir=$sfDir")
    new java.io.File(outDir).mkdirs()
    val knobs = sys.env.keys.filter(_.startsWith("SPARK_GRAFT")).toSeq.sorted
      .map(k => s""""$k":"${sys.env(k)}"""").mkString("{", ",", "}")
    names.foreach { name =>
      TierProbe.clear()
      val t0 = System.nanoTime()
      val err =
        try {
          Queries.all(name)(spark, sfDir).coalesce(1).write
            .mode("overwrite").parquet(s"$outDir/$name")
          null
        } catch { case e: Throwable => e.toString.takeWhile(_ != '\n') }
      spark.catalog.clearCache()
      val sec = (System.nanoTime() - t0) / 1e9
      val tiers = TierProbe.byOp.toSeq.sortBy(_._1)
        .map { case (op, ts) =>
          s""""$op":${ts.map(t => s""""$t"""").mkString("[", ",", "]")}"""
        }
        .mkString("{", ",", "}")
      println(s"""{"query":"$name","sec":${f"$sec%.1f"},"tiers":$tiers""" +
        s""","err":${if (err == null) "null" else s""""$err""""}""" +
        s""","knobs":$knobs}""")
    }
    // the oracle map, so the standard compare scripts run on this dump
    val q = (s: String) => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.view
      .filterKeys(names.contains).toMap
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
