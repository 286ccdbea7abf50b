package graft

import org.apache.spark.sql.SparkSession

/** Local-iteration timing harness for individual catalog queries:
  * one unmeasured warm-up execution (JIT/codegen/IO cache), then two
  * measured runs printing the per-run and min time — the same
  * discipline Bench applies to the full catalog, for one query at a
  * time. Usage: runMain graft.TimeQuery <sfDir> <query> [query...] */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tuning.engineDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = Queries.all(n)
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try { once() } catch { case scala.util.control.NonFatal(e) =>
        println(s"$n FAILED: ${e.getMessage}"); spark.stop(); sys.exit(1) }
      val (a, b) = (once(), once())
      println(f"$n%-28s min=${math.min(a, b)}%.2f s  (runs: $a%.2f, $b%.2f)")
    }
    spark.stop()
  }
}
