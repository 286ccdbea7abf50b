package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints the formatted physical plan (and
  * optionally times one execution) of any catalog query, at any SF —
  * `runMain graft.Explain <sfDir> <queryName> [--run]`. This is how
  * the "is the join broadcast? did the filter push down?" questions
  * get answered during development without waiting for a full bench
  * pass.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <queryName>... [--run]")
    val sfDir = args(0)
    val run = args.contains("--run")
    val names = args.drop(1).filterNot(_ == "--run")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tuning.engineDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val df = Queries.all(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      if (run) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[explain] $name ran in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
