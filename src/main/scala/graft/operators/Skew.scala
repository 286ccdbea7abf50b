package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation operators for hot keys at scale.
  *
  * A 100 TB shuffle with a power-law key (one tenant, one topic, one
  * document id dominating) funnels the hot key's rows into a single
  * reducer regardless of cluster size. Salting splits each key into
  * `buckets` synthetic sub-keys so the heavy key spreads over
  * `buckets` reducers, at the cost of a cheap second combine (for
  * aggregation) or a small-side replication (for joins). AQE's skew
  * handling covers sort-merge joins adaptively; these operators cover
  * the aggregation case and broadcast-averse joins AQE cannot split.
  *
  * Results are salt-invariant by construction: the salt only changes
  * WHERE partial work runs, never the final grouping — both operators
  * are oracle-checked against their unsalted equivalents.
  */
object Skew {

  /** Deterministic per-row salt in [0, buckets): hashed from `from`
    * (any dense row attribute — a value column, not the hot key). */
  def saltCol(from: Column, buckets: Int): Column =
    pmod(hash(from), lit(buckets))

  /** Two-phase salted aggregation: partial-aggregate on (keys, salt)
    * — the skew-spreading shuffle — then combine on keys alone. The
    * second shuffle sees at most `buckets` rows per key, so the hot
    * key's reduce cost drops from O(rows) to O(buckets).
    *
    * `aggs` lists output column name → (partialAgg, finalCombine),
    * e.g. "n" -> (count(...), sum(...)); sums/counts/min/max combine
    * losslessly. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Column, buckets: Int,
      aggs: Seq[(String, (Column, Column => Column))]): DataFrame = {
    val partial = df.withColumn("_salt", salt)
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(aggs.head._2._1.as(s"_p_${aggs.head._1}"),
        aggs.tail.map { case (n, (p, _)) => p.as(s"_p_$n") }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(col(s"_p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, (_, f)) => f(col(s"_p_$n")).as(n) }: _*)
  }

  /** Salted equi-join for a skewed big side against a small side too
    * large (or a planner unwilling) to broadcast: the big side gets a
    * deterministic salt, the small side is replicated across all
    * `buckets` salt values (explode of a literal range), and the join
    * key becomes (keys..., salt) — the hot key's rows spread over
    * `buckets` reducers instead of one. Replication cost =
    * |small| × buckets rows, the standard trade. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Column, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt)
    val replicated = small.withColumn("_salt",
      explode(array((0 until buckets).map(i => lit(i)): _*)))
    saltedBig.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
