package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KafkaSourceBuilder

class KafkaConfigSpec extends AnyFunSuite {

  test("kafka source options mirror the reference consumer tuning") {
    val cfg = GraftConfig(
      defaults = Map("heartbeat.interval.ms" -> "2500"),
      env = Map("KAFKA_URL" -> "broker:9092"),
      overrides = Map.empty)
    val opts = KafkaSourceBuilder.build(cfg, "acme", "job-1", "fhir-.*")
    assert(opts("kafka.bootstrap.servers") == "broker:9092") // aliased env
    assert(opts("kafka.group.id") == "acme.firebaseconsumer.job-1")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("subscribePattern").startsWith("^\\Qacme.\\E"))
    assert(opts("kafka.heartbeat.interval.ms") == "2500")
    assert(opts("kafka.session.timeout.ms") == "18000")
  }

  test("weighted-avg aggregator is associative across merge orders") {
    val rows = Seq((10.0, 2.0), (20.0, 1.0), (30.0, 3.0))
    val whole = rows.foldLeft(graft.functions.WeightedAvg.zero)(graft.functions.WeightedAvg.reduce)
    val (l, r) = rows.splitAt(1)
    val split = graft.functions.WeightedAvg.merge(
      l.foldLeft(graft.functions.WeightedAvg.zero)(graft.functions.WeightedAvg.reduce),
      r.foldLeft(graft.functions.WeightedAvg.zero)(graft.functions.WeightedAvg.reduce))
    assert(whole == split)
    assert(graft.functions.WeightedAvg.finish(whole) == (10 * 2 + 20 * 1 + 30 * 3) / 6.0)
  }
}
