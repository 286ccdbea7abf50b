package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.functions.GraftFunctions.canonical_hash
import graft.model.Subscription
import graft.operators.{Filters, Masking, Routing, SubscriptionRoute, SyncGate}
import graft.sources.DocumentSink

/** The reference's steady-state data path (SURVEY §3.2) as one
  * Structured Streaming pipeline:
  *
  *   source → route(topic glob, tenant strip) → filter(field path ∈
  *   pass values) → mask(classification ≤ emit level) → target-path
  *   template → canonical hash → sync gate (hash anti-join) →
  *   batched idempotent upsert sink + hash-store merge.
  *
  * The same `compile` chain serves batch (oracle-verified, see
  * Queries.qPipelineE2e) and streaming (`start`) — classic
  * batch/streaming unification, replacing the reference's
  * 1-message-per-0.5 s poll loop (artifacts.py:263-285) with
  * micro-batches; offsets live in the checkpoint instead of Kafka
  * group commits (A25 ⇒ effectively-once with the idempotent sink).
  *
  * Scale notes: every stage is a narrow projection except the sync
  * anti-join (shuffle on id, broadcastable store) and the sink
  * (foreachPartition, executor-side connections, ≤50-doc commits per
  * the reference's WriteBatch limit).
  */
object Pipeline {

  /** Decode stage for a binary-Avro source (the reference's actual
    * input: every Kafka message value is an Avro datum,
    * artifacts.py:270-272). `(kafka_topic, value binary, …)` →
    * `(kafka_topic, …, <decoded payload columns>)`, with the schema's
    * `@aether_*` annotations attached so downstream masking applies to
    * decoded payloads. Heterogeneous topics carry different schemas —
    * branch per topic upstream (the same per-topic split compileMulti
    * already does), one decode schema per branch. */
  def decodeAvro(df: DataFrame, avroSchemaJson: String,
                 valueCol: String = "value"): DataFrame = {
    val struct = graft.sources.AvroSchemaBridge.parse(avroSchemaJson)
    val others = df.columns.filterNot(_ == valueCol).toIndexedSeq
    // fail fast on name collisions — downstream compile/masking would
    // otherwise hit ambiguous-reference errors far from the cause
    val collisions = struct.fields.map(_.name).toSet
      .intersect(others.toSet + "_payload")
    require(collisions.isEmpty,
      s"decoded Avro field(s) ${collisions.mkString(", ")} collide with " +
        "carried-through column(s); rename or drop them upstream of decodeAvro")
    val decoded = graft.functions.AvroColumns.avro_decode(col(valueCol), avroSchemaJson)
    // two projections on purpose: CollapseProject refuses to merge them
    // because merging would duplicate the non-cheap decode expression —
    // guaranteeing exactly ONE Avro decode per row even on interpreted /
    // subexpression-elimination-disabled paths
    df.select(others.map(col) :+ decoded.as("_payload"): _*)
      .select(others.map(col) ++ struct.fields.map(f =>
        col("_payload").getField(f.name).as(f.name, f.metadata)): _*)
  }

  /** Mid-stream schema evolution for the decode stage — the consumer
    * of [[graft.sources.SchemaRegistry]]'s change surface (reference:
    * the poll loop checks each message's schema against the topic
    * cache and carries on — detect, never reject —
    * artifacts.py:314-318,378-380). `generations()` is re-read every
    * micro-batch, newest LAST (= the reader contract); when the newest
    * schema's fingerprint differs from the registry's cached one, the
    * decode projection is rebuilt on that very batch — no restart, no
    * rejection, and `onChange` fires once per evolution (wired to the
    * job log by the registry layer).
    *
    * Rows are decoded by their WRITER generation: a `schema_fp` column
    * (the stand-in for the reference's per-message schema) selects the
    * generation via a CaseWhen over [[graft.functions.AvroColumns
    * .avro_decode_evolved]] branches, all resolving to the newest
    * reader schema — so one batch straddling the evolution decodes
    * both generations into the SAME evolved shape. Rows with an
    * unknown fingerprint (or streams without the column) decode
    * optimistically with the newest schema, mirroring the reference's
    * cached-schema fallback. */
  final class SchemaAwareDecoder(
      registry: graft.sources.SchemaRegistry,
      topic: String,
      generations: () => Seq[String],
      valueCol: String = "value",
      fpCol: String = "schema_fp",
      onChange: (StructType, StructType) => Unit = (_, _) => ())
    extends (DataFrame => DataFrame) {

    def apply(batch: DataFrame): DataFrame = {
      val gens = generations()
      require(gens.nonEmpty, "schema generations must be non-empty")
      val reader = gens.last
      val readerStruct = graft.sources.AvroSchemaBridge.parse(reader)
      registry.observe(topic, reader) match {
        case registry.Changed(previous) => onChange(previous, readerStruct)
        case _ =>
      }
      val hasFp = batch.columns.contains(fpCol)
      val decoded: Column =
        if (hasFp) {
          val branches = gens.map { g =>
            (col(fpCol) === lit(graft.sources.AvroSchemaBridge.fingerprint(g).toString),
              graft.functions.AvroColumns.avro_decode_evolved(col(valueCol), reader, g))
          }
          branches.foldRight(
              graft.functions.AvroColumns.avro_decode(col(valueCol), reader): Column) {
            case ((cond, dec), acc) => when(cond, dec).otherwise(acc)
          }
        } else graft.functions.AvroColumns.avro_decode(col(valueCol), reader)
      val others = batch.columns
        .filterNot(c => c == valueCol || (hasFp && c == fpCol)).toIndexedSeq
      val collisions = readerStruct.fields.map(_.name).toSet
        .intersect(others.toSet + "_payload")
      require(collisions.isEmpty,
        s"decoded Avro field(s) ${collisions.mkString(", ")} collide with " +
          "carried-through column(s)")
      batch.select(others.map(col) :+ decoded.as("_payload"): _*)
        .select(others.map(col) ++ readerStruct.fields.map(f =>
          col("_payload").getField(f.name).as(f.name, f.metadata)): _*)
    }
  }

  /** Input contract: `kafka_topic` string column + an `id` column +
    * payload columns. Output: surviving rows with `doc_id`,
    * `target_path`, `doc_json`, `doc_hash`. */
  def compile(sub: Subscription, tenant: String, df: DataFrame): DataFrame = {
    val payloadCols = df.columns.filterNot(_ == "kafka_topic").toIndexedSeq
    val routed = Routing.route(df, col("kafka_topic"), tenant,
        Seq(SubscriptionRoute(sub.id, sub.topicPattern, sub.fbOptions.targetPath)))
      .filter(col("sub_id").isNotNull)
    compileBranch(sub, routed, payloadCols)
  }

  /** Per-subscription filter → mask → doc projection over an already-
    * routed branch. `extraCols` are carried alongside (never hashed or
    * serialized into the document). */
  private def compileBranch(sub: Subscription, routed: DataFrame,
                            payloadCols: IndexedSeq[String],
                            extraCols: Seq[String] = Nil): DataFrame = {
    val filtered =
      if (sub.fbOptions.filterRequired)
        Filters.fieldPathFilter(routed, sub.fbOptions.filterFieldPath,
          sub.fbOptions.filterPassValues)
      else routed

    val masked =
      if (sub.fbOptions.maskingEmitLevel.nonEmpty && sub.fbOptions.maskingLevels.nonEmpty) {
        // Select the pruned EXPRESSIONS maskProjection builds (nested
        // structs rebuilt without masked subfields) — selecting kept
        // column NAMES from `filtered` would resurrect masked nested
        // fields into doc_json/doc_hash.
        val payloadSchema = StructType(
          filtered.schema.fields.filter(f => payloadCols.contains(f.name)))
        val pruned = Masking.maskProjection(payloadSchema,
          sub.fbOptions.maskingEmitLevel, sub.fbOptions.maskingLevels,
          sub.fbOptions.maskingAnnotation)
        // the id is the document key — masking may never drop it, or the
        // sink loses its upsert identity (and col("id") below would fail)
        val keep = if (pruned.exists(_._1 == "id")) pruned.map(_._2)
                   else {
                     val byName = pruned.toMap
                     payloadCols.flatMap(c =>
                       if (c == "id") Some(col("id")) else byName.get(c))
                   }
        filtered.select(keep ++ (Seq("topic", "sub_id", "target_path") ++ extraCols).map(col): _*)
      } else filtered

    val docCols = masked.columns
      .filterNot((Set("topic", "sub_id", "target_path", "kafka_topic") ++ extraCols)).toIndexedSeq
    masked
      .withColumn("doc_id", col("id").cast("string"))
      .withColumn("doc_json", to_json(struct(docCols.map(col): _*)))
      .withColumn("doc_hash", canonical_hash(struct(docCols.map(col): _*)))
  }

  /** Multi-subscription compile (reference: one consumer serves N
    * subscriptions, first glob match after id sort wins —
    * artifacts.py:250-256): route once against ALL subscriptions,
    * then evaluate every per-subscription filter/mask as ONE
    * conditional projection keyed by `sub_id` — a single scan of the
    * micro-batch regardless of fan-out (no per-branch union, which
    * Catalyst would not share, re-reading the batch once per
    * subscription). CaseWhen evaluates only the matched branch, so a
    * row pays exactly its own subscription's mask/hash cost.
    * `extraCols` (e.g. a source offset column) are carried through for
    * downstream ordering. */
  def compileMulti(subs: Seq[Subscription], tenant: String, df: DataFrame,
                   extraCols: Seq[String] = Nil): DataFrame = {
    require(subs.nonEmpty, "at least one subscription")
    val routes = subs.map(s =>
      SubscriptionRoute(s.id, s.topicPattern, s.fbOptions.targetPath))
    val routed = Routing.route(df, col("kafka_topic"), tenant, routes)
      .filter(col("sub_id").isNotNull)
    val payloadCols = df.columns
      .filterNot(c => c == "kafka_topic" || extraCols.contains(c)).toIndexedSeq
    val payloadSchema = StructType(
      routed.schema.fields.filter(f => payloadCols.contains(f.name)))

    // row passes iff ITS subscription's filter passes (rows are owned
    // by exactly one sub_id after first-match-wins routing)
    val pass = subs.map { sub =>
      val o = sub.fbOptions
      // compile against the payload-only schema: wildcard/recursive
      // paths ($.*, $..id) must see message fields, never the engine's
      // routing metadata (sub_id/topic/target_path) — the reference
      // filters the message dict alone
      val cond =
        if (o.filterRequired)
          Filters.fieldPathCondition(payloadSchema, o.filterFieldPath, o.filterPassValues)
        else lit(true)
      (col("sub_id") === sub.id) && cond
    }.reduce(_ || _)

    // the subscription's masked document as a struct expression (same
    // pruned expressions compileBranch selects — nested masked fields
    // stay pruned; the id is the upsert key and always survives)
    def docStruct(sub: Subscription): Column = {
      val o = sub.fbOptions
      val kept: Seq[Column] =
        if (o.maskingEmitLevel.nonEmpty && o.maskingLevels.nonEmpty) {
          val pruned = Masking.maskProjection(payloadSchema,
            o.maskingEmitLevel, o.maskingLevels, o.maskingAnnotation)
          if (pruned.exists(_._1 == "id")) pruned.map(_._2)
          else {
            val byName = pruned.toMap
            payloadCols.flatMap(c =>
              if (c == "id") Some(col("id").as("id")) else byName.get(c))
          }
        } else payloadCols.map(col)
      struct(kept: _*)
    }

    def perSub(f: Subscription => Column): Column =
      subs.tail.foldLeft(when(col("sub_id") === subs.head.id, f(subs.head))) {
        (acc, s) => acc.when(col("sub_id") === s.id, f(s))
      }

    routed.filter(pass)
      .withColumn("doc_id", col("id").cast("string"))
      .withColumn("doc_json", perSub(s => to_json(docStruct(s))))
      .withColumn("doc_hash", perSub(s => canonical_hash(docStruct(s))))
      .select((Seq("doc_id", "topic", "sub_id", "target_path",
        "doc_json", "doc_hash") ++ extraCols).map(col): _*)
  }

  /** One surviving row per doc_id within a micro-batch. A batch can
    * legitimately carry several versions of the same document; the
    * sink writes in partition order (nondeterministic) and the hash
    * store must record exactly the version the sink kept, so both
    * consume this deterministic selection. With a Kafka source the
    * caller should pass the offset column as `orderCol` so the LAST
    * message wins (the reference's sequential semantics); without one,
    * the max canonical hash is used as a stable tie-break. */
  def dedupeBatch(prepared: DataFrame, orderCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = orderCol.map(c => col(c).desc).getOrElse(col("doc_hash").desc)
    // the sink's upsert key is (target_path, doc_id) — the same id on
    // two topics/subscriptions is two distinct documents
    val w = Window.partitionBy(col("target_path"), col("doc_id")).orderBy(ord)
    prepared.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Rows needing a write under the subscription's sync mode. The
    * change-detection key is (target_path, doc_id, doc_hash) — a
    * deliberate refinement of the reference's global-by-id RTDB store
    * (config.py:37), which cannot distinguish destinations. */
  def gate(prepared: DataFrame, sub: Subscription, hashStore: => DataFrame): DataFrame =
    SyncGate.parseMode(sub.fbOptions.syncMode) match {
      case SyncGate.Forward => prepared
      case SyncGate.Sync =>
        prepared.join(hashStore.select("target_path", "doc_id", "doc_hash"),
          Seq("target_path", "doc_id", "doc_hash"), "left_anti")
      case _ => prepared.limit(0)
    }

  /** Per-subscription sync-mode gate over a multi-subscription batch:
    * FORWARD branches pass, NONE/CONSUME branches drop, SYNC branches
    * anti-join the hash store — one partitioned pass, not one job per
    * subscription. */
  def gateMulti(prepared: DataFrame, subs: Seq[Subscription],
                hashStore: => DataFrame): DataFrame = {
    def ids(m: SyncGate.SyncMode) =
      subs.filter(s => SyncGate.parseMode(s.fbOptions.syncMode) == m).map(_.id)
    val fwd = ids(SyncGate.Forward)
    val sync = ids(SyncGate.Sync)
    val forwarded = prepared.filter(col("sub_id").isin(fwd: _*))
    if (sync.isEmpty) forwarded
    else forwarded.unionByName(
      prepared.filter(col("sub_id").isin(sync: _*))
        .join(hashStore.select("target_path", "doc_id", "doc_hash"),
          Seq("target_path", "doc_id", "doc_hash"), "left_anti"))
  }

  /** Executor-side batched upsert of the gated rows. NB: the count is
    * an at-least-once metric — Spark task retries re-run the whole
    * partition (the writes themselves are idempotent upserts). */
  def upsert(gated: DataFrame, mkSink: () => DocumentSink): Long = {
    val acc = gated.sparkSession.sparkContext.longAccumulator("docs_written")
    gated.select(col("target_path"), col("doc_id"), col("doc_json"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val sink = mkSink()
        val n = sink.upsertAll(rows.map(r =>
          DocumentSink.Doc(r.getString(0), r.getString(1), r.getString(2))))
        acc.add(n)
      }
    acc.value
  }
}

/** Durable (target_path, doc_id) → doc_hash table backing SYNC-mode
  * change detection — the Spark-side equivalent of the reference's RTDB
  * `_aether/entityHash/{id}` store (config.py:37, helpers.py:51-67),
  * maintained as parquet merged per micro-batch (no driver state).
  *
  * Scale design: the store is hash-partitioned into `numBuckets`
  * directories keyed by `pmod(hash(target_path, doc_id), numBuckets)`;
  * a merge rewrites ONLY the buckets containing batch keys, so per-batch
  * I/O is O(|store|/numBuckets × touched buckets), not O(|store|). At
  * billions of ids raise numBuckets so a bucket stays executor-sized —
  * the merge plan is a bucket-pruned scan + anti-join, unchanged.
  *
  * Commit protocol (object-store-safe, no directory renames on the
  * read path): bucket data lives in immutable uniquely-named dirs; the
  * single `_manifest` file maps bucket → (current dir, previous dir)
  * and is swapped atomically (FileContext rename with OVERWRITE —
  * atomic on HDFS and local FS; a single small PUT on object stores).
  * Readers resolve the manifest first, so they see the old or the new
  * store, never a mix. Each bucket's PREVIOUS generation is kept until
  * the bucket's next merge (GC is N-2), so a `load()` DataFrame that
  * was planned before a merge can still materialize afterwards; a
  * crash mid-merge leaves only orphan dirs, garbage-collected later.
  * The manifest also records the store's bucket count: reopening an
  * existing store derives the modulus from the manifest, so a caller
  * passing a different `numBuckets` cannot split a key across two
  * bucket dirs. All I/O goes through the Hadoop FileSystem API — no
  * java.io.File local-FS assumptions.
  *
  * Concurrency: `merge` is synchronized per instance, and a store path
  * must have a SINGLE writer (one StreamingJob — the registry enforces
  * one query per job). Two concurrent writers on one path would race
  * the last-writer-wins manifest flip and drop each other's updates;
  * readers are safe at any concurrency. */
final class HashStore(spark: SparkSession, path: String, numBuckets: Int = 16) {
  import org.apache.hadoop.fs.{FileContext, Options, Path => HPath}
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("target_path", StringType),
    StructField("doc_id", StringType), StructField("doc_hash", StringType)))
  private val keys = Seq("target_path", "doc_id")

  private val root = new HPath(path)
  private val manifestFile = new HPath(root, "_manifest")
  private lazy val hadoopConf = spark.sessionState.newHadoopConf()
  private def fs = root.getFileSystem(hadoopConf)

  private def bucketCol(buckets: Int): Column =
    pmod(hash(col("target_path"), col("doc_id")), lit(buckets))

  /** Manifest snapshot: recorded bucket count + per-bucket current and
    * previous (pending-GC) dir names, all relative to root. */
  private case class Manifest(buckets: Int, cur: Map[Int, String],
                              prev: Map[Int, String])

  private def readManifest(): Manifest = {
    if (!fs.exists(manifestFile)) return Manifest(numBuckets, Map.empty, Map.empty)
    val in = fs.open(manifestFile)
    try {
      val lines = scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      val header = lines.headOption.filter(_.startsWith("#buckets="))
        .map(_.stripPrefix("#buckets=").toInt)
      val entries = lines.filterNot(_.startsWith("#")).map { line =>
        line.split('\t') match {
          case Array(b, dir)       => (b.toInt, dir, "")
          case Array(b, dir, prev) => (b.toInt, dir, prev)
        }
      }
      // headerless (pre-pinning) manifest: the constructor value is a
      // guess. If an entry's bucket index disproves it, refuse rather
      // than split keys across two moduli and then pin the wrong one.
      if (header.isEmpty && entries.exists(_._1 >= numBuckets))
        throw new IllegalStateException(
          s"legacy manifest at $manifestFile has bucket indexes >= numBuckets=$numBuckets; " +
            "reopen the store with its original bucket count to migrate the header")
      Manifest(header.getOrElse(numBuckets),
        entries.map(e => e._1 -> e._2).toMap,
        entries.collect { case (b, _, p) if p.nonEmpty => b -> p }.toMap)
    } finally in.close()
  }

  private def writeManifest(m: Manifest): Unit = {
    val tmp = new HPath(root, s"_manifest.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try {
      val body = m.cur.toSeq.sorted
        .map { case (b, d) => s"$b\t$d\t${m.prev.getOrElse(b, "")}" }
      out.write((s"#buckets=${m.buckets}" +: body).mkString("\n").getBytes("UTF-8"))
    } finally out.close()
    FileContext.getFileContext(root.toUri, hadoopConf)
      .rename(tmp, manifestFile, Options.Rename.OVERWRITE)
  }

  private def emptyDf =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def readDirs(dirs: Seq[String]): DataFrame =
    if (dirs.isEmpty) emptyDf
    else spark.read.schema(schema)
      .parquet(dirs.map(d => new HPath(root, d).toString): _*)

  def load(): DataFrame = readDirs(readManifest().cur.values.toSeq)

  /** Upsert new hashes: new rows win over stored rows per
    * (target_path, doc_id). Callers must pass at most one row per key
    * (Pipeline.dedupeBatch) — enforced here with a distinct as a last
    * line of defense, since a key with TWO stored hashes would
    * permanently suppress legitimate future writes. */
  def merge(updates: DataFrame): Unit = synchronized {
    val manifest = readManifest()
    val buckets = manifest.buckets // existing store's modulus wins
    val deduped = updates.select(col("target_path"),
        col("doc_id").cast("string"), col("doc_hash"))
      .dropDuplicates(keys)
      .withColumn("bucket", bucketCol(buckets))
      .cache()
    try {
      val touched = deduped.select("bucket").distinct()
        .collect().map(_.getInt(0)).toSet
      if (touched.isEmpty) return

      // current rows of ONLY the touched buckets, keys beaten by updates
      val survivors = readDirs(
          touched.toSeq.sorted.flatMap(manifest.cur.get))
        .join(deduped.select(keys.map(col): _*), keys, "left_anti")
        .withColumn("bucket", bucketCol(buckets))
      val next = deduped.unionByName(survivors)

      // stage the new bucket data, then publish each bucket dir under a
      // fresh immutable name and flip the manifest in one rename
      val stamp = java.util.UUID.randomUUID().toString.take(8)
      val staging = new HPath(root, s".stage-$stamp")
      next.write.partitionBy("bucket").parquet(staging.toString)
      val replaced = touched.toSeq.sorted.map { b =>
        val dir = s"b$b-$stamp"
        if (!fs.rename(new HPath(staging, s"bucket=$b"), new HPath(root, dir)))
          throw new java.io.IOException(s"cannot publish bucket $b of $root")
        b -> dir
      }.toMap
      // replaced buckets retire their current dir to prev (kept one more
      // generation); untouched buckets keep both entries as-is
      val nextManifest = Manifest(buckets,
        manifest.cur ++ replaced,
        manifest.prev ++ replaced.keys.map(b =>
          b -> manifest.cur.getOrElse(b, "")).filter(_._2.nonEmpty))
      writeManifest(nextManifest)

      // GC: anything unreferenced by the new manifest (incl. its prev
      // generation), stage leftovers, and manifest temp files
      val live = nextManifest.cur.values.toSet ++ nextManifest.prev.values.toSet
      fs.listStatus(root).foreach { st =>
        val name = st.getPath.getName
        val dead = (st.isDirectory && !live.contains(name)) ||
          (!st.isDirectory && name.startsWith("_manifest.tmp-"))
        if (dead && name != "_manifest") { fs.delete(st.getPath, true): Unit }
      }
    } finally { deduped.unpersist(): Unit }
  }
}

/** One running job = one StreamingQuery serving N subscriptions
  * (SURVEY §1: Job ⇄ query; reference: one consumer × N subscriptions,
  * first match wins). */
final class StreamingJob(
    spark: SparkSession,
    subs: Seq[Subscription],
    tenant: String,
    mkSink: () => DocumentSink,
    hashStorePath: String,
    checkpoint: String,
    trigger: Trigger = Trigger.ProcessingTime("1 second"),
    /** Source-order column (e.g. the Kafka offset) so the LAST message
      * for a document wins within a micro-batch; without it the
      * deterministic max-hash tie-break applies. */
    orderCol: Option[String] = None,
    /** Per-micro-batch pre-stage, re-evaluated every batch — the hook
      * a [[Pipeline.SchemaAwareDecoder]] plugs into so a schema change
      * re-plans the decode projection mid-stream instead of freezing
      * the projection at start time. */
    preBatch: Option[DataFrame => DataFrame] = None) {

  def this(spark: SparkSession, sub: Subscription, tenant: String,
           mkSink: () => DocumentSink, hashStorePath: String, checkpoint: String) =
    this(spark, Seq(sub), tenant, mkSink, hashStorePath, checkpoint,
      Trigger.ProcessingTime("1 second"), None)

  val hashStore = new HashStore(spark, hashStorePath)

  private val syncIds =
    subs.filter(s => SyncGate.parseMode(s.fbOptions.syncMode) == SyncGate.Sync).map(_.id)

  /** Start the pipeline over any streaming DataFrame honoring the
    * input contract (kafka stream, file stream, or MemoryStream).
    * `queryName` (optional) names the StreamingQuery so listeners can
    * attribute lifecycle events that fire before the query handle is
    * registered (the registry's consumer-group-style name,
    * artifacts.py:226). */
  def start(stream: DataFrame, queryName: Option[String] = None): StreamingQuery = {
    val base = stream.writeStream
    queryName.foreach(n => base.queryName(n))
    base
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val inBatch = preBatch.map(_(batch)).getOrElse(batch)
        val prepared = Pipeline.dedupeBatch(
          Pipeline.compileMulti(subs, tenant, inBatch, orderCol.toSeq), orderCol).cache()
        try {
          val gated = Pipeline.gateMulti(prepared, subs, hashStore.load()).cache()
          try {
            Pipeline.upsert(gated, mkSink)
            if (syncIds.nonEmpty)
              hashStore.merge(gated.filter(col("sub_id").isin(syncIds: _*))
                .select("target_path", "doc_id", "doc_hash"))
          } finally { gated.unpersist(): Unit }
        } finally { prepared.unpersist(): Unit }
      }
      .start()
  }
}
