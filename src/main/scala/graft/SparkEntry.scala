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

  /** Multi-way join: orders⨝customer shuffle on custkey (both sides
    * large at scale), nation/region broadcast (small dims). */
  def qJoinBroadcast(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Large-large shuffle join lineitem⨝orders with pre-join filter
    * pushed to both scans. */
  def qJoinShuffle(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).filter(col("l_discount") > 0.02)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") =!= "F")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum((col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec))))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** Left-semi join: orders having at least one heavy lineitem. */
  def qJoinSemi(s: SparkSession, dir: String): DataFrame = {
    val heavy = Tables.lineitem(s, dir).filter(col("l_quantity") > 45)
    Tables.orders(s, dir)
      .join(heavy, col("o_orderkey") === heavy("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Left-anti join: orders with no discounted lineitem. */
  def qJoinAnti(s: SparkSession, dir: String): DataFrame = {
    val disc = Tables.lineitem(s, dir).filter(col("l_discount") > 0.05)
    Tables.orders(s, dir)
      .join(disc, col("o_orderkey") === disc("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  /** Window functions over the events stream table: row_number, lag,
    * and a running decimal sum per user ordered by event time. */
  def qWindowFuncs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("value"), 1).over(w).as("prev_value"),
        sum(col("value").cast(dec)).over(wRun).cast("double").as("running_value"))
      .orderBy(col("event_id"))
  }

  /** Top-k: TakeOrderedAndProject, no full sort at scale. */
  def qTopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(10)

  /** Distinct pairs (shuffle dedup). */
  def qDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .orderBy(col("user_id"), col("event_type"))

  /** Set ops: (purchasers ∩ clickers) ∖ error-reporters. */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def users(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
    val bigErrors = ev.filter(col("event_type") === "error" && col("value") > 190)
      .select(col("user_id"))
    users("purchase").intersect(users("click")).except(bigErrors)
      .orderBy(col("user_id"))
  }

  /** Scalar function parity: string/math/date kernels. */
  def qScalarFns(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        (col("p_size") % 7).cast("long").as("size_mod"),
        abs(col("p_size") - 25).cast("long").as("size_dist"),
        floor(col("p_retailprice")).as("price_floor"),
        ceil(col("p_retailprice")).as("price_ceil"))
      .orderBy(col("p_partkey"))

  /** Rollup (grouping sets) over region/nation customer counts. */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
           sum(col("c_acctbal").cast(dec)).cast("double").as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Event-time tumbling window (1h) aggregation — the batch analog of
    * the streaming windowed agg; ts is epoch-nanos. */
  def qEventWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(expr("ts div 3600000000000").as("hour_bucket"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(dec)).cast("double").as("sum_value"))
      .orderBy(col("hour_bucket"), col("event_type"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q_filter_jsonpath" -> (qFilterJsonpath _),
    "q_mask_project" -> (qMaskProject _),
    "q_route_topics" -> (qRouteTopics _),
    "q_hash_canonical" -> (qHashCanonical _),
    "q_sync_antijoin" -> (qSyncAntijoin _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q_join_shuffle" -> (qJoinShuffle _),
    "q_join_semi" -> (qJoinSemi _),
    "q_join_anti" -> (qJoinAnti _),
    "q_window_funcs" -> (qWindowFuncs _),
    "q_topk" -> (qTopK _),
    "q_distinct" -> (qDistinct _),
    "q_setops" -> (qSetOps _),
    "q_scalar_fns" -> (qScalarFns _),
    "q_rollup" -> (qRollup _),
    "q_event_window" -> (qEventWindow _)
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
        |ORDER BY i.doc_id""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q_join_shuffle" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_discount > 0.02 AND o_orderstatus <> 'F'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_anti" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        |ORDER BY o_orderkey""".stripMargin,

    "q_window_funcs" ->
      """SELECT event_id, user_id,
        |  ROW_NUMBER() OVER w AS rn,
        |  LAG(value, 1) OVER w AS prev_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "q_setops" ->
      """(SELECT user_id FROM events WHERE event_type = 'purchase'
        | INTERSECT
        | SELECT user_id FROM events WHERE event_type = 'click')
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'error' AND value > 190
        |ORDER BY user_id""".stripMargin,

    "q_scalar_fns" ->
      """SELECT p_partkey,
        |  UPPER(p_brand) AS brand_u,
        |  SUBSTR(p_name, 1, 8) AS name8,
        |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        |  p_brand || '|' || p_type AS brand_type,
        |  CAST(p_size % 7 AS BIGINT) AS size_mod,
        |  CAST(ABS(p_size - 25) AS BIGINT) AS size_dist,
        |  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q_event_window" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY hour_bucket, event_type
        |ORDER BY hour_bucket, event_type""".stripMargin
  )
}
