package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every catalog query end-to-end at the
  * given scale factor and prints ONE JSON line.
  *
  * Methodology: each query is fully materialized through the `noop`
  * sink (count() would let Catalyst prune expensive projections away);
  * the session is warmed once so JVM/classloading/parquet-footer costs
  * don't land on the first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Double = {
      spark.catalog.clearCache() // query-local caches must not leak across measurements
      val t0 = System.nanoTime()
      try Queries.all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: touch every table + run the flagship once, unmeasured
    Queries.q1Agg(spark, sfDir).write.format("noop").mode("overwrite").save()
    // optional args: bench only the named queries (repeated per arg)
    val names = if (args.nonEmpty) args.toSeq else Queries.all.keys.toSeq.sorted
    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
