package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every catalog query end-to-end at the
  * given scale factor and prints ONE JSON line.
  *
  * Methodology: each query is fully materialized through the `noop`
  * sink (count() would let Catalyst prune expensive projections away).
  * Every query first runs ONCE unmeasured — warming JVM/JIT profiles,
  * classloading, codegen, and every table's parquet footers — because
  * a single roaming GC/JIT stall (historically 5-14 s, landing on a
  * random query) otherwise contaminates one measured number per
  * round. The measured pass then reflects steady-state latency.
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

    // optional args: bench only the named queries (repeated per arg)
    val names = if (args.nonEmpty) args.toSeq else Queries.all.keys.toSeq.sorted
    // full unmeasured pass: every query (hence every table) once
    names.foreach { n =>
      spark.catalog.clearCache()
      try Queries.all(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
