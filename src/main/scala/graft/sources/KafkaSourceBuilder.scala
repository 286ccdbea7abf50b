package graft.sources

import graft.GraftConfig

/** Builds the Structured Streaming Kafka source options from layered
  * config, mirroring the reference's consumer tuning
  * (firebase/conf/consumer/kafka.json:3-12 and group naming
  * artifacts.py:226-232):
  *  - earliest offset reset → `startingOffsets=earliest`;
  *  - manual commit (at-least-once) → checkpoint-tracked offsets
  *    (`enable.auto.commit` is ignored by Spark's source by design);
  *  - per-tenant/job group id;
  *  - heartbeat/session/request timeouts passed through with the
  *    `kafka.` option prefix.
  *
  * The kafka connector jar is not present in this environment, so the
  * builder is exercised by asserting the produced option map; at
  * deploy time: `spark.readStream.format("kafka").options(build(...))`.
  */
object KafkaSourceBuilder {
  def groupName(tenant: String, jobId: String): String =
    s"$tenant.firebaseconsumer.$jobId" // artifacts.py:226

  def build(cfg: GraftConfig, tenant: String, jobId: String,
            topicPattern: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> cfg.getOrElse("bootstrap.servers", "localhost:9092"),
    "subscribePattern" ->
      ("^" + java.util.regex.Pattern.quote(tenant + ".") +
        graft.operators.Routing.globToRegexBody(topicPattern) + "$"),
    "startingOffsets" -> cfg.getOrElse("auto.offset.reset", "earliest"),
    "kafka.group.id" -> groupName(tenant, jobId),
    "kafka.heartbeat.interval.ms" -> cfg.getOrElse("heartbeat.interval.ms", "2500"),
    "kafka.session.timeout.ms" -> cfg.getOrElse("session.timeout.ms", "18000"),
    "kafka.request.timeout.ms" -> cfg.getOrElse("request.timeout.ms", "20000"),
    "maxOffsetsPerTrigger" -> cfg.getOrElse("max.offsets.per.trigger", "100000"),
    "failOnDataLoss" -> "false")
}
