package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming extensions beyond the reference's processing-time loop
  * (SURVEY Table B [ext] rows): event-time windows with watermarks and
  * custom keyed state via mapGroupsWithState. The reference has no
  * event-time concept (artifacts.py:263-285 polls in processing time);
  * these are the operators a Spark-native deployment adds for late
  * data and sessionization at scale.
  */
object StreamOps {

  /** Epoch-ns long → event-time column usable by watermarks. */
  def eventTime(df: DataFrame, nsCol: String): DataFrame =
    df.withColumn("event_time", timestamp_micros(expr(s"$nsCol div 1000")))

  /** Watermarked tumbling-window counts/sums per event type. State is
    * bounded by the watermark — late rows beyond `lateness` are
    * dropped, so executor state can't grow unboundedly. */
  def windowedAgg(df: DataFrame, lateness: String, window: String): DataFrame =
    eventTime(df, "ts")
      .withWatermark("event_time", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  final case class SessionState(nEvents: Long, totalValue: Double)
  final case class SessionUpdate(user_id: Long, n_events: Long, total_value: Double)

  /** Running per-user session aggregates via mapGroupsWithState —
    * the keyed-state primitive backing custom streaming state
    * (hash stores, session windows, dedup-within-key). */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[SessionUpdate] = {
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0))
          var n = prev.nEvents
          var total = prev.totalValue
          rows.foreach { case (_, v) => n += 1; total += v }
          state.update(SessionState(n, total))
          SessionUpdate(user, n, total)
      }
  }

  /** Streaming exact dedup: drop repeats of `idCols` arriving within
    * the watermark bound — the streaming analog of the batch dedup
    * family, and the idiom for at-least-once sources whose replays
    * land close together in event time. State is keyed by `idCols`
    * and EVICTED once the watermark passes (unbounded
    * `dropDuplicates` state is the classic streaming OOM at scale;
    * the watermark bound is what makes this 100 TB-safe). */
  def dedupStream(df: DataFrame, nsCol: String, lateness: String,
      idCols: Seq[String]): DataFrame =
    eventTime(df, nsCol)
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark(idCols)

  /** Convenience: run sessionize as an update-mode memory-sink query
    * (used by tests and demos). */
  def startSessionQuery(spark: SparkSession, events: DataFrame, name: String) =
    sessionize(spark, events).writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName(name)
      .start()
}
