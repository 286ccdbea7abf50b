package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry
  * (Spark plan) and, where deterministically SQL-expressible, an
  * `oracleSql` entry (DuckDB SQL over the same parquet tables).
  *
  * Determinism rules used throughout so the driver's hash-compare is
  * stable across engines and partition orders:
  *  - monetary/double aggregates are computed in DECIMAL(18,2) (exact,
  *    associative) and cast to DOUBLE only for the final representation;
  *  - every query ends in an ORDER BY over a unique key;
  *  - column names are aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}

/** The query catalog. Kept separate from the driver contract so
  * operators/ sources/ functions/ modules can register here without
  * touching the entry point. */
object Queries {
  import graft.functions.GraftFunctions._
  import graft.operators._

  private val dec = DecimalType(18, 2)

  /** TPC-H Q1-style pricing summary: hash aggregate with map-side
    * partial aggregation; no shuffle beyond the single groupBy. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** A4/A6 — JSONPath membership filter over the events stream table:
    * props is a raw JSON string; get_json_object stays in codegen and
    * the event_type predicate pushes into the parquet scan. */
  def qFilterJsonpath(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    Filters.jsonPathFilter(
        Filters.fieldPathFilter(ev, "event_type", Seq("purchase", "click")),
        col("props"), "$.k", Seq("1", "2", "3"))
      .select(col("event_id"), col("event_type"),
              get_json_object(col("props"), "$.k").as("k"))
      .orderBy(col("event_id"))
  }

  /** A5 — classification masking: source=confidential, n_chars=secret;
    * emit level public ⇒ both pruned out of the scan entirely. */
  def qMaskProject(s: SparkSession, dir: String): DataFrame = {
    val annotated = Masking.annotate(Tables.documents(s, dir),
      Map("source" -> "confidential", "n_chars" -> "secret",
          "text" -> "public", "lang" -> "public"))
    Masking.maskColumns(annotated, emitLevel = "public")
      .orderBy(col("doc_id"))
  }

  /** A2/A3/A7/A8 — topic routing: tenant strip, first-match glob
    * routing (sorted by sub id), target-path templating. */
  def qRouteTopics(s: SparkSession, dir: String): DataFrame = {
    val subs = Seq(
      SubscriptionRoute("sub-01", "purchase", "_aether/entities/{topic}"),
      SubscriptionRoute("sub-02", "click", "_aether/clicks/{topic}"),
      SubscriptionRoute("sub-03", "*", "_aether/all/{topic}"))
    val ev = Tables.events(s, dir)
      .withColumn("kafka_topic", concat(lit("tnant."), col("event_type")))
    Routing.route(ev, col("kafka_topic"), "tnant", subs)
      .select(col("event_id"), col("topic"), col("sub_id"), col("target_path"))
      .orderBy(col("event_id"))
  }

  /** A11 — canonical-hash (Python json.dumps(sort_keys=True) → md5[:16])
    * of each document's JSON-shaped fields. */
  def qHashCanonical(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        canonical_hash(struct(col("doc_id"), col("lang"), col("source")))
          .as("doc_hash"))
      .orderBy(col("doc_id"))

  /** A10–A13 — SYNC-mode change detection: left-anti join of the
    * incoming batch against the hash store on (id, hash). Store rows:
    * doc_id%3==0 current hash (unchanged ⇒ dropped), %3==1 stale hash
    * (changed ⇒ kept), %3==2 absent (new ⇒ kept). */
  def qSyncAntijoin(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val hashed = docs.select(col("doc_id"),
      canonical_hash(struct(col("doc_id"), col("lang"), col("source"))).as("doc_hash"))
    val store = hashed.filter(col("doc_id") % 3 < 2)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, col("doc_hash"))
          .otherwise(substring(md5(concat(lit("stale-"), col("doc_id").cast("string"))), 1, 16))
          .as("doc_hash"))
    SyncGate.needsUpdate(hashed, store, "doc_id", "doc_hash")
      .orderBy(col("doc_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q_filter_jsonpath" -> (qFilterJsonpath _),
    "q_mask_project" -> (qMaskProject _),
    "q_route_topics" -> (qRouteTopics _),
    "q_hash_canonical" -> (qHashCanonical _),
    "q_sync_antijoin" -> (qSyncAntijoin _)
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_jsonpath" ->
      """SELECT event_id, event_type, json_extract_string(props, '$.k') AS k
        |FROM events
        |WHERE event_type IN ('purchase','click')
        |  AND json_extract_string(props, '$.k') IN ('1','2','3')
        |ORDER BY event_id""".stripMargin,

    "q_mask_project" ->
      "SELECT doc_id, text, lang FROM documents ORDER BY doc_id",

    "q_route_topics" ->
      """SELECT event_id, event_type AS topic,
        |  CASE WHEN event_type = 'purchase' THEN 'sub-01'
        |       WHEN event_type = 'click' THEN 'sub-02'
        |       ELSE 'sub-03' END AS sub_id,
        |  CASE WHEN event_type = 'purchase' THEN '_aether/entities/' || event_type
        |       WHEN event_type = 'click' THEN '_aether/clicks/' || event_type
        |       ELSE '_aether/all/' || event_type END AS target_path
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q_hash_canonical" ->
      """SELECT doc_id,
        |  substr(md5('{"doc_id": ' || doc_id || ', "lang": "' || lang ||
        |             '", "source": "' || source || '"}'), 1, 16) AS doc_hash
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_sync_antijoin" ->
      """WITH incoming AS (
        |  SELECT doc_id,
        |    substr(md5('{"doc_id": ' || doc_id || ', "lang": "' || lang ||
        |               '", "source": "' || source || '"}'), 1, 16) AS doc_hash
        |  FROM documents
        |), store AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN doc_hash
        |         ELSE substr(md5('stale-' || doc_id), 1, 16) END AS doc_hash
        |  FROM incoming WHERE doc_id % 3 < 2
        |)
        |SELECT i.doc_id, i.doc_hash FROM incoming i
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM store s
        |  WHERE s.doc_id = i.doc_id AND s.doc_hash = i.doc_hash)
        |ORDER BY i.doc_id""".stripMargin
  )
}
