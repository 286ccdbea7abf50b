package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Gate-calibration harness for the adaptive sim-join: runs
  * exactSimJoin and containmentJoin over the documents shingle
  * relation at a given SF dir with the direct-plan gate FORCED each
  * way, printing wall time + verified-pair count per path. The counts
  * must agree (both plans are exact); the timings are the data behind
  * the `DirectSimJoinMaxPairs` constant and the grouped-array prefix
  * verification (see the sf10 record in FIXTURES.md).
  *
  * Usage: runMain graft.tools.SimJoinPath <sfDir> */
object SimJoinPath {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tuning.engineDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tokens = Dedup.withShingles(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), "text")
      .select(col("doc_id"), explode(col("sh")).as("tok"))

    def run(name: String, force: Long)(
        mk: Long => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = mk(force).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","gate":${force},"pairs":$n,"sec":$sec%.1f}""")
    }

    // gate=MaxValue forces direct; gate=0 forces the prefix plan
    Seq(Long.MaxValue, 0L).foreach { g =>
      run("exactSimJoin", g)(f =>
        Dedup.exactSimJoin(tokens, "doc_id", 1, 2, maxDirectPairs = f))
      run("containmentJoin", g)(f =>
        Dedup.containmentJoin(tokens, "doc_id", 1, 2, maxDirectPairs = f)
          .filter(col("n_a") >= 10))
    }
    spark.stop()
  }
}
