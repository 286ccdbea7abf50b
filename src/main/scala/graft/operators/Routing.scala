package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A declarative subscription: topic glob → destination path template.
  * (reference: Subscription class firebase/app/artifacts.py:127-192;
  * example firebase/app/fixtures/examples.py:35-51). */
case class SubscriptionRoute(
    id: String,
    topicPattern: String,
    targetPath: String = "_aether/entities/{topic}")

/** Topic routing operators (reference A2/A3/A7/A8):
  *  - tenant prefix strip (artifacts.py:375-376 — we implement the
  *    *intended* prefix semantics, not the `str.lstrip` char-set quirk;
  *    documented deviation per SURVEY §7.4);
  *  - glob topic→subscription match, first match after id sort
  *    (artifacts.py:250-256);
  *  - target-path templating with `{topic}` substitution
  *    (artifacts.py:180-186).
  *
  * The subscription list is driver-side config (tiny); it compiles into
  * a chain of `when` expressions — a broadcast-free, codegen'd lookup
  * evaluated per row with zero shuffle.
  */
object Routing {

  /** fnmatch-style glob → unanchored Java regex body (supports * and ?). */
  def globToRegexBody(glob: String): String = {
    val sb = new StringBuilder
    glob.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c   => sb.append(Pattern.quote(c.toString))
    }
    sb.toString
  }

  /** fnmatch-style glob → anchored Java regex. */
  def globToRegex(glob: String): String = "^" + globToRegexBody(glob) + "$"

  /** Intended tenant prefix strip of `{tenant}.` from a topic name. */
  def stripTenant(topic: Column, tenant: String): Column =
    regexp_replace(topic, "^" + Pattern.quote(tenant + "."), "")

  /** Substitute `{topic}` in a path template. */
  def pathForTopic(template: String, topic: Column): Column = {
    val parts = template.split(java.util.regex.Pattern.quote("{topic}"), -1)
    if (parts.length == 1) lit(template)
    else {
      val pieces = parts.toIndexedSeq.map(lit).flatMap(p => Seq(p, topic)).dropRight(1)
      concat(pieces: _*)
    }
  }

  /** Adds `topic` (tenant-stripped), `sub_id` and `target_path` columns;
    * rows matching no subscription get nulls (caller filters). First
    * match wins after sort by subscription id (artifacts.py:250-256). */
  def route(df: DataFrame, topicCol: Column, tenant: String,
            subs: Seq[SubscriptionRoute]): DataFrame = {
    val logical = stripTenant(topicCol, tenant)
    val ordered = subs.sortBy(_.id)
    val (subId, path) =
      if (ordered.isEmpty) // no subscriptions ⇒ nothing routes
        (lit(null).cast("string"), lit(null).cast("string"))
      else (
        coalesce(ordered.map(s =>
          when(logical.rlike(globToRegex(s.topicPattern)), lit(s.id))): _*),
        coalesce(ordered.map(s =>
          when(logical.rlike(globToRegex(s.topicPattern)),
            pathForTopic(s.targetPath, logical))): _*))
    df.withColumn("topic", logical)
      .withColumn("sub_id", subId)
      .withColumn("target_path", path)
  }
}
