package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.Queries

/** Formatted-plan dumper that sees THROUGH eager materializations:
  * enables [[graft.operators.PlanProbe]], runs each named catalog
  * query once (noop sink, so AQE finalizes), then prints the
  * formatted plan of the query's own DataFrame plus every plan the
  * probe recorded under the query's name or a `helper:` key — the
  * real join/exchange shapes that `df.explain` on a
  * localCheckpoint-returning query cannot show (it sees only the
  * post-checkpoint `Scan ExistingRDD`).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <query> [query...]
  * Env: SPARK_GRAFT_CPUS (default 32). Output goes to stdout between
  * `===== PLAN <key> =====` markers; redirect and split per query for
  * the plans/ evidence files.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [query...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tuning.engineDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.PlanProbe.enabled = true
    for (name <- names) {
      graft.operators.PlanProbe.clear()
      spark.catalog.clearCache()
      val df = Queries.all(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== PLAN $name (query result) =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      graft.operators.PlanProbe.executions.toSeq.sortBy(_._1).foreach {
        case (key, qe) =>
          println(s"===== PLAN $name [$key] =====")
          println(qe.explainString(ExplainMode.fromString("formatted")))
      }
    }
    spark.stop()
  }
}
