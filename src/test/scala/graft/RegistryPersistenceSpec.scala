package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{FbOptions, FirebaseInstance, FirebaseJob, Subscription}
import graft.sources.JsonTreeRtdb
import graft.streaming.{JobRegistry, JobStartSpec, JsonFileSinkSpec, StreamSourceSpec}

/** The reference keeps every resource definition per-tenant in Redis,
  * so definitions and jobs survive a consumer restart
  * (firebase/app/consumer.py:9-18, docker-compose.yml:27-33). This
  * spec drives the analogous kill-and-rebuild path: a registry backed
  * by the RTDB tree store is shut down, a fresh registry over the
  * same store sees every definition, and `resume` continues the job
  * from its persisted start spec + checkpoint. */
class RegistryPersistenceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-reg").toString

  private def eventually(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(100)
    }
    cond
  }

  test("job start spec round-trips through JSON") {
    val spec = JobStartSpec(
      StreamSourceSpec("parquet", "/data/in", "id BIGINT, name STRING",
        Map("maxFilesPerTrigger" -> "1")),
      JsonFileSinkSpec("/data/sink"), "/data/work")
    assert(JobStartSpec.fromJson(spec.toJson) == spec)
  }

  test("definitions and a started job survive a registry rebuild; resume continues from checkpoint") {
    val input = tmp(); val sinkRoot = tmp(); val work = tmp()
    val storeFile = s"${tmp()}/registry.json"

    val reg1 = new JobRegistry(spark, "tnt", store = Some(new JsonTreeRtdb(storeFile)))
    assert(reg1.addFirebase(FirebaseInstance("fbp", "fbp", "http://emulator")).isRight)
    assert(reg1.addSubscription(Subscription("sp", "sp", "t?",
      FbOptions(targetPath = "_aether/entities/{topic}"))).isRight)
    assert(reg1.addJob(FirebaseJob("jp", "jp", "fbp", Seq("sp"))).isRight)

    val batch1 = Seq(("tnt.t1", 1L, "a"), ("tnt.t1", 2L, "b"))
      .toDF("kafka_topic", "id", "name")
    batch1.coalesce(1).write.mode("append").parquet(input)
    val spec = JobStartSpec(
      StreamSourceSpec("parquet", input, batch1.schema.toDDL),
      JsonFileSinkSpec(sinkRoot), work)
    val started = reg1.startJob("jp", spec)
    assert(started.isRight, started)
    started.toOption.get.processAllAvailable()
    val dir = new java.io.File(s"$sinkRoot/_aether/entities/t1")
    assert(dir.list().count(_.endsWith(".json")) == 2)

    // "kill the JVM": stop queries, drop the listener, lose all memory
    reg1.shutdown()

    // a fresh registry over the same store sees every definition...
    val reg2 = new JobRegistry(spark, "tnt", store = Some(new JsonTreeRtdb(storeFile)))
    assert(reg2.getFirebase("fbp").map(_.url) == Some("http://emulator"))
    assert(reg2.getSubscription("sp").map(_.topicPattern) == Some("t?"))
    assert(reg2.getJob("jp").map(_.subscriptions) == Some(Seq("sp")))
    assert(reg2.getStatus("jp") == "PAUSED") // defined, not running

    // ...and resume rebuilds the query from the persisted spec
    val resumed = reg2.resumeJob("jp")
    assert(resumed.isRight, resumed)
    try {
      // the checkpoint carries over: only NEW rows flow, and new data
      // keeps landing in the same sink
      val batch2 = Seq(("tnt.t1", 3L, "c"), ("tnt.t1", 4L, "d"))
        .toDF("kafka_topic", "id", "name")
      batch2.coalesce(1).write.mode("append").parquet(input)
      resumed.toOption.get.processAllAvailable()
      assert(eventually(10000)(dir.list().count(_.endsWith(".json")) == 4),
        s"resumed job never caught up: ${dir.list().mkString(",")}")
    } finally reg2.pauseJob("jp")
    reg2.shutdown()
  }

  test("removing resources scrubs the durable mirror") {
    val storeFile = s"${tmp()}/registry.json"
    val store = new JsonTreeRtdb(storeFile)
    val reg = new JobRegistry(spark, "tnt", store = Some(store))
    assert(reg.addFirebase(FirebaseInstance("fbr", "fbr", "http://emulator")).isRight)
    assert(reg.addSubscription(Subscription("sr", "sr", "t?")).isRight)
    assert(reg.addJob(FirebaseJob("jr", "jr", "fbr", Seq("sr"))).isRight)
    reg.removeJob("jr")
    reg.removeSubscription("sr")
    reg.removeFirebase("fbr")
    val reborn = new JobRegistry(spark, "tnt", store = Some(new JsonTreeRtdb(storeFile)))
    assert(reborn.listFirebases().isEmpty && reborn.listSubscriptions().isEmpty &&
      reborn.listJobs().isEmpty)
    reg.shutdown(); reborn.shutdown()
  }

  test("in-memory registry (no store) still refuses resume of a never-started job") {
    val reg = new JobRegistry(spark, "tnt")
    assert(reg.resumeJob("ghost") == Left(Seq("job: 'ghost' was never started")))
    reg.shutdown()
  }
}
