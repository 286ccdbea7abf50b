package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata tables
  * (see /root/repo/TESTDATA.md). All queries take the scale-factor
  * directory as a parameter so the same plan runs at any SF.
  *
  * At cluster scale these would be partitioned/bucketed tables in a
  * catalog; filters and column pruning still push into the parquet
  * scan because every reader below is a plain declarative scan.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts has shipped as both TIMESTAMP(NANOS) and timestamp[us]
    // parquet across testdata generations; read NANOS as epoch-nanos
    // LongType and widen a µs timestamp to the same epoch-nanos Long,
    // so every downstream query sees one stable `ts: LONG` contract
    // (DuckDB oracle side uses epoch_ns(ts), which yields the identical
    // value for either physical type).
    // nanosAsLong has no per-read data source option, so it must stay a
    // session conf; it only affects TIMESTAMP(NANOS) physical columns,
    // which nothing outside the events table ships.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // µs-precision parquet timestamps carry isAdjustedToUTC=false, which
    // the reader would surface as TIMESTAMP_NTZ; with NTZ inference off
    // the stored int64 micros read as UTC instants, so unix_micros below
    // recovers exactly the stored value independent of session timezone.
    // Spark 4.1 has no per-read option for this (verified: the
    // "inferTimestampNTZ" reader option is ignored), so scope the session
    // conf with save/restore around the eager footer read: the catalyst
    // schema is fixed at read time and execution honors the requested
    // type, so other parquet readers sharing the SparkSession keep their
    // TIMESTAMP_NTZ semantics.
    val ntzKey  = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val ntzPrev = spark.conf.getOption(ntzKey)
    spark.conf.set(ntzKey, "false")
    val df =
      try spark.read.parquet(s"$sfDir/$name.parquet")
      finally ntzPrev match {
        case Some(v) => spark.conf.set(ntzKey, v)
        case None    => spark.conf.unset(ntzKey)
      }
    // The epoch-nanos ts contract is specific to the events table; do not
    // rewrite a TimestampType `ts` on any other (future) table.
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if name == "events" &&
          f.dataType == org.apache.spark.sql.types.TimestampType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts")) * 1000L)
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
