package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Registry of the REAL physical plans behind eager materializations.
  *
  * The cache-release contract makes several operators return an eager
  * `localCheckpoint` — a bare LogicalRDD scan — which removes their
  * actual join/window shapes from anything a caller (or PlanGuardSpec)
  * can inspect after the fact. Every such site records the plan it is
  * about to execute here, keyed by catalog query name (via
  * `Queries.materializeFinal`) or `helper:<name>` for operator-level
  * internals, so the plan guard keeps Cartesian/BNLJ/global-window
  * coverage over the plans that really run (review finding r15).
  * Driver-side only; entries are overwritten per invocation. */
private[graft] object PlanProbe {
  val executions = new scala.collection.concurrent.TrieMap[
    String, org.apache.spark.sql.execution.QueryExecution]

  /** The captured physical plans (the guard's view). */
  def plans: scala.collection.Map[String, SparkPlan] =
    executions.map { case (k, qe) => k -> qe.executedPlan }

  /** Record `df`'s query execution under `key`, hand `df` back. */
  def record(key: String, df: DataFrame): DataFrame = {
    executions(key) = df.queryExecution
    df
  }
}
