package graft

import org.apache.spark.sql.SparkSession

/** Engine-level Spark conf defaults shared by every session-building
  * main (Bench, Verify, the measurement tools, the streaming soaks),
  * so a tuning decision is made once and every surface measures the
  * same engine.
  *
  * `spark.shuffle.sort.bypassMergeThreshold = 0` (r19 optimization,
  * guide §2.2): with the default threshold (200), every shuffle whose
  * reduce-partition count R is ≤ 200 uses the bypass-merge writer,
  * which opens R files PER MAP TASK, writes each partition to its own
  * file, then concatenates them — O(M·R) file opens/writes/mmaps per
  * shuffle. Thread dumps of the sf0.1 bench showed executor task
  * threads dominated by FileChannel map0/unmap0/write0 from exactly
  * this path; forcing the serialized (Unsafe) writer — one sorted
  * file + index per map task — cut the iterative-query family 35-55%
  * (q_pagerank 5.25→2.90 s, q_hits 8.64→3.87 s, q_sssp_bounded
  * 4.51→2.70 s, fresh-JVM min-of-2 at sf0.1/32 cores). The setting is
  * scale-neutral, not a local-mode tune: on a production cluster every
  * data-bearing shuffle has R > 200, so the bypass path never engages
  * there and threshold 0 changes nothing; it only removes the
  * small-R pathology that local/bench scale exposes. Env-overridable
  * for A/B (`SPARK_GRAFT_BYPASS_MERGE_THRESHOLD`).
  */
object Tuning {
  def engineDefaults(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.shuffle.sort.bypassMergeThreshold",
      sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE_THRESHOLD", "0"))
}
