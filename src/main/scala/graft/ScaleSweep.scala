package graft

import org.apache.spark.sql.SparkSession

/** Scale-step sweep: run every catalog query ONCE at a given SF dir
  * and print one JSON line per query as it completes (so a hang or
  * OOM still leaves the partial record), then a summary line. Unlike
  * Bench (warm-up + two measured passes + stall defense) this is a
  * single cold-ish pass — the goal is "does every operator complete,
  * and does anything scale super-linearly", not a tight minimum.
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tuning.engineDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Queries.all.keys.toSeq.sorted
    var failed = 0
    val times = names.map { n =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val t = try {
        Queries.all(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[sweep] $n FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
        -1.0
      }
      println(f"""{"q":"$n","sec":${if (t < 0) "-1.0" else f"$t%.2f"}}""")
      t
    }
    val total = times.filter(_ >= 0).sum
    println(f"""{"metric":"sweep_total","value":$total%.1f,"unit":"sec","n_queries":${names.size},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
