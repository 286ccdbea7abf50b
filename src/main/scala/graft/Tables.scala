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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // µs-precision parquet timestamps carry isAdjustedToUTC=false, which
    // the reader would surface as TIMESTAMP_NTZ; with NTZ inference off
    // the stored int64 micros read as UTC instants, so unix_micros below
    // recovers exactly the stored value independent of session timezone.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.TimestampType =>
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
