package graft

import org.apache.spark.sql.SparkSession

/** Catalog-wide cache-release audit (VERDICT r13 #3's catalog-wide
  * form): run every catalog query, materialize its result, and report
  * any persisted RDDs left registered beyond the one allowance — the
  * eagerly-materialized final (or final iterative round) that the
  * ContextCleaner reclaims when the caller drops the reference (the
  * [[operators.Rounds]] contract). Anything more is a leak the
  * session cache would hold until `clearCache()`: rounds× executor
  * block copies at cluster scale. Prints one line per offender and a
  * summary; exit 1 on any offender (CI-shaped). */
object CacheAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    var offenders = 0
    Queries.all.keys.toSeq.sorted.foreach { name =>
      spark.catalog.clearCache()
      val before = sc.getPersistentRDDs.keySet
      try {
        Queries.all(name)(spark, sfDir).write.format("noop")
          .mode("overwrite").save()
        val leaked = sc.getPersistentRDDs.keySet -- before
        if (leaked.size > 1) {
          offenders += 1
          println(s"""{"q":"$name","leaked_rdds":${leaked.size}}""")
        }
      } catch { case scala.util.control.NonFatal(e) =>
        offenders += 1
        println(s"""{"q":"$name","error":"${e.getClass.getSimpleName}"}""")
      }
    }
    println(s"""{"metric":"cache_audit_offenders","value":$offenders,"n_queries":${Queries.all.size},"sf":"$sfDir"}""")
    spark.stop()
    if (offenders > 0) sys.exit(1)
  }
}
