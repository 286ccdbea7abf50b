package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model._
import graft.sources.DocumentSink

/** Counting sink: measures pipeline throughput without filesystem
  * overhead per document (the real Firestore sink is network-bound
  * anyway; this isolates the engine's share). */
final class CountingSink extends DocumentSink {
  override def commitBatch(docs: Seq[DocumentSink.Doc]): Unit = {
    CountingSink.docs.add(docs.size)
    CountingSink.commits.add(1)
  }
}
object CountingSink {
  val docs = new LongAdder
  val commits = new LongAdder
}

/** End-to-end streaming throughput of the subscription pipeline
  * (route → filter-off → hash → SYNC gate → 50-doc batched sink +
  * hash-store merge) over the sf events table via a file-stream
  * source. Prints one JSON line with docs/sec — the reference's
  * implied ceiling is ~2 msg/s (BASELINE.md). */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val input = Files.createTempDirectory("sbench-in").toString
    val work = Files.createTempDirectory("sbench-work").toString

    // stage the events as the stream input (one payload per event)
    val ev = Tables.events(spark, sfDir)
      .withColumn("kafka_topic", concat(lit("tnt."), col("event_type")))
      .withColumnRenamed("event_id", "id")
      .drop("props")
    ev.write.mode("overwrite").parquet(input)
    val n = ev.count()

    val sub = Subscription("bench", "bench", "*",
      FbOptions(syncMode = "sync", targetPath = "_aether/entities/{topic}"))
    val job = new StreamingJob(spark, Seq(sub), "tnt", () => new CountingSink,
      s"$work/hashes", s"$work/ckpt",
      // no idle wait between micro-batches: measure the engine, not
      // the trigger cadence
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))

    val schema = spark.read.parquet(input).schema
    val t0 = System.nanoTime()
    val q = job.start(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input))
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()

    val written = CountingSink.docs.sum()
    val commits = CountingSink.commits.sum()
    println(s"""{"metric":"stream_docs_per_sec","value":${written / secs},"unit":"docs/sec","docs":$written,"rows":$n,"commits":$commits,"seconds":$secs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
