package graft.sources

import scala.jdk.CollectionConverters._

/** Broker topic discovery (reference A20: `list_topics`,
  * firebase/app/artifacts.py:409-424 — broker metadata filtered to the
  * tenant's topics, tenant prefix stripped, broker failure surfaced as
  * an HTTP-500-style error).
  *
  * The catalog is a trait so the contract stays testable without a
  * running broker: [[StaticTopicCatalog]] fakes the metadata;
  * [[AdminTopicCatalog]] is the deploy-time implementation, bound to
  * Kafka's AdminClient reflectively because the kafka-clients jar is
  * not on this build's classpath (same env constraint as
  * [[KafkaSourceBuilder]] — options-only wiring, no compile-time
  * dependency).
  */
trait TopicCatalog {
  /** All broker topic names, unfiltered. Throws on broker failure. */
  def allTopics(): Seq[String]
}

/** Fixed topic list — the test/offline fake. */
final class StaticTopicCatalog(topics: Seq[String]) extends TopicCatalog {
  def allTopics(): Seq[String] = topics
}

object TopicCatalog {
  val empty: TopicCatalog = new StaticTopicCatalog(Nil)

  /** Tenant filter + prefix strip (artifacts.py:420-423). The
    * reference filters `startswith(tenant)` then takes the text after
    * the first `"{tenant}."` — which throws on a topic like
    * `{tenant}x` that matches the filter but not the separator. We
    * implement the intended semantics (filter on `"{tenant}."`, strip
    * that prefix once), the same documented deviation as the A7
    * lstrip quirk. */
  def tenantTopics(all: Seq[String], tenant: String): Seq[String] = {
    val prefix = s"$tenant."
    all.filter(_.startsWith(prefix)).map(_.substring(prefix.length))
  }
}

/** Deploy-time catalog over `org.apache.kafka.clients.admin
  * .AdminClient#listTopics` (the API Spark itself has no public
  * surface for). Reflective: resolves the AdminClient class at first
  * use so this library compiles and tests without the kafka-clients
  * jar; calling it without the jar on the runtime classpath fails
  * with a clear error, mirroring the reference's KafkaException →
  * HTTP 500 wrap (artifacts.py:416-418). */
final class AdminTopicCatalog(bootstrapServers: String,
    timeoutMs: Int = 5000) extends TopicCatalog {
  def allTopics(): Seq[String] = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrapServers)
    props.put("request.timeout.ms", Integer.valueOf(timeoutMs))
    val cls =
      try Class.forName("org.apache.kafka.clients.admin.AdminClient")
      catch {
        case _: ClassNotFoundException => throw new IllegalStateException(
          "kafka-clients is not on the classpath; AdminTopicCatalog needs it at deploy time")
      }
    val admin = cls.getMethod("create", classOf[java.util.Properties])
      .invoke(null, props)
    try {
      val result = cls.getMethod("listTopics").invoke(admin)
      val namesFuture = result.getClass.getMethod("names").invoke(result)
      val names = namesFuture.getClass.getMethod("get").invoke(namesFuture)
        .asInstanceOf[java.util.Set[String]]
      names.asScala.toSeq.sorted
    } finally {
      admin.getClass.getMethod("close").invoke(admin): Unit
    }
  }
}
