package graft.streaming

import java.util.UUID
import java.util.concurrent.{Executors, ThreadFactory, TimeUnit}

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

import graft.model.{FirebaseInstance, FirebaseJob, Subscription, Validation}
import graft.sources.DocumentSink

/** Control plane: resource registry + job lifecycle
  * (reference A18-A23: REST resource CRUD with schema validation,
  * job pause/resume/status, last-100 log ring — artifacts.py:132-157,
  * 195-256, 409-443; README.md:138-189).
  *
  * Resources are validated on add (errors returned, not thrown — the
  * validate_pretty contract) and jobs map 1:1 to StreamingQueries;
  * status comes from the live query, logs from a bounded ring fed by
  * a [[StreamingQueryListener]] plus lifecycle events. Tenancy: every
  * job's topics/checkpoints are prefixed with the tenant
  * (artifacts.py:226,293-295).
  *
  * Error recovery mirrors the reference's poll loop
  * (artifacts.py:263-285): a failure flips the job to RECONFIGURE and
  * the supervisor retries after a backoff (the reference sleeps
  * 10×sleep_delay = 5 s and polls again, forever; here the backoff
  * doubles per consecutive failure up to [[maxBackoffMs]], and resets
  * once a restarted query makes progress). Intentional stop
  * (pause/remove) never triggers a restart.
  */
final class JobRegistry(spark: SparkSession, tenant: String,
    /** Sync modes accepted on addSubscription. Defaults to the modes
      * this engine implements; pass [[Validation.SchemaSyncModes]] for
      * the reference's strict schema contract (schemas.py:284). */
    allowedSyncModes: Set[String] = Validation.EngineSyncModes,
    /** First-retry delay after a query failure; doubles per
      * consecutive failure. Reference: sleep(self.sleep_delay * 10)
      * = 5 s, artifacts.py:281. */
    restartBackoffMs: Long = 5000,
    /** Backoff ceiling (the "bounded" in bounded backoff). */
    maxBackoffMs: Long = 60000,
    /** Give up after this many consecutive failed restarts (the
      * reference retries forever; Int.MaxValue reproduces that). */
    maxRestarts: Int = Int.MaxValue,
    /** Broker topic discovery (A20) — a fake in tests, an
      * [[graft.sources.AdminTopicCatalog]] at deploy time. */
    topicCatalog: graft.sources.TopicCatalog = graft.sources.TopicCatalog.empty,
    /** Durable registry state (the reference persists every resource
      * per-tenant in Redis via the consumer SDK, consumer.py:9-18,
      * docker-compose.yml:27-33). When set, resource definitions and
      * job start specs are mirrored into this store on every mutation
      * and re-read on construction, so a new registry over the same
      * store sees every definition — and `resume` can rebuild a job's
      * query from its persisted [[JobStartSpec]] + checkpoint after a
      * JVM restart. None = in-memory only (tests, throwaway runs). */
    store: Option[graft.sources.RtdbStore] = None) {
  private val firebases = mutable.Map[String, FirebaseInstance]()
  private val subscriptions = mutable.Map[String, Subscription]()
  // TrieMap: read by the listener without the registry monitor
  private val jobs = scala.collection.concurrent.TrieMap[String, FirebaseJob]()
  private val queries = mutable.Map[String, StreamingQuery]()
  private val logRing = mutable.Map[String, mutable.ArrayDeque[String]]()
  private val MaxLogs = 100 // callback_logger('JOB', stack, 100), artifacts.py:225

  // ---- supervisor state --------------------------------------------------
  // CONCURRENT, not monitor-guarded: Spark delivers QueryStartedEvent
  // to listeners SYNCHRONOUSLY on the thread inside
  // DataStreamWriter.start — while startJob/doRestart hold this
  // registry's monitor awaiting the startup latch. A listener that
  // takes the monitor would deadlock the start; lock-free reads keep
  // the listener safe from any delivery context.
  private final class Runtime(val restart: () => StreamingQuery) {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0) // consecutive failures; reset on progress
  }
  private val runtimes = scala.collection.concurrent.TrieMap[String, Runtime]()
  /** Last successful start's arguments, kept across pause so `resume`
    * (the reference's job action, README.md:151-160) can rebuild the
    * query from its checkpoint without the caller re-supplying them. */
  private val lastStart =
    mutable.Map[String, (DataFrame, () => DocumentSink, String)]()
  private val queryToJob = scala.collection.concurrent.TrieMap[UUID, String]()
  /** Non-query-derived status (RECONFIGURE while awaiting restart,
    * STOPPED after giving up). */
  private val statusOverride = scala.collection.concurrent.TrieMap[String, String]()

  private lazy val scheduler = Executors.newSingleThreadScheduledExecutor(
    new ThreadFactory {
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-job-supervisor-$tenant")
        t.setDaemon(true); t
      }
    })

  /** Listener feeding the per-job log ring and driving crash
    * recovery (reference: the job thread's own poll-loop logging +
    * RECONFIGURE handling, artifacts.py:263-285,434-443). */
  /** Reference-style consumer-group name for a job's query
    * (group_name = f'{tenant}.firebaseconsumer.{id}',
    * artifacts.py:226) — also how started/progress events (which fire
    * before/without the query-id registration) resolve their job. */
  private def queryNameOf(jobId: String) = s"$tenant.firebaseconsumer.$jobId"
  private def jobOfName(name: String): Option[String] = {
    val prefix = s"$tenant.firebaseconsumer."
    Option(name).filter(_.startsWith(prefix)).map(_.substring(prefix.length))
      .filter(jobs.contains)
  }

  private val listener: StreamingQueryListener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      jobOfName(e.name).orElse(jobFor(e.id))
        .foreach(j => log(j, s"query started (run ${e.runId})"))
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      jobOfName(e.progress.name).orElse(jobFor(e.progress.id)).foreach { j =>
        // reset backoff only past batch 0: a crash-looping job that
        // always squeezes one batch in before failing must still see
        // the exponential delay engage
        if (e.progress.batchId > 0) runtimes.get(j).foreach(_.attempts.set(0))
        log(j, s"progress: batch ${e.progress.batchId}, ${e.progress.numInputRows} rows")
      }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      jobFor(e.id).foreach { j =>
        e.exception match {
          case Some(err) =>
            log(j, s"query failed: ${err.linesIterator.nextOption().getOrElse(err)}")
            scheduleRestart(j)
          case None => log(j, "query terminated")
        }
      }
      // the run is dead: drop its id mapping so supervised restarts
      // don't accumulate one stale entry per replaced query
      queryToJob.remove(e.id): Unit
    }
  }
  spark.streams.addListener(listener)

  private def jobFor(queryId: UUID): Option[String] = queryToJob.get(queryId)

  /** Live query-id→job entries (test observability): must stay bounded
    * at O(active queries) under a restart storm — onQueryTerminated
    * drops the dead run's mapping, so supervised restarts cannot
    * accumulate one stale entry per replaced query. */
  private[graft] def trackedQueryCount: Int = queryToJob.size

  private def scheduleRestart(jobId: String): Unit = synchronized {
    runtimes.get(jobId) match {
      case Some(rt) if jobs.contains(jobId) =>
        if (rt.attempts.get() >= maxRestarts) {
          statusOverride(jobId) = "STOPPED"
          log(jobId, s"giving up after ${rt.attempts.get()} failed restarts")
        } else {
          val attempt = rt.attempts.incrementAndGet()
          // status RECONFIGURE + delayed retry (artifacts.py:278-281)
          statusOverride(jobId) = "RECONFIGURE"
          val delay = math.min(
            restartBackoffMs * (1L << math.min(attempt - 1, 16)), maxBackoffMs)
          log(jobId, s"status RECONFIGURE; restart #$attempt in $delay ms")
          scheduler.schedule(new Runnable { def run(): Unit = doRestart(jobId) },
            delay, TimeUnit.MILLISECONDS): Unit
        }
      case _ => // paused/removed meanwhile: no restart
    }
  }

  private def doRestart(jobId: String): Unit = synchronized {
    val rt = runtimes.get(jobId)
    if (rt.nonEmpty && jobs.contains(jobId) && !queries.get(jobId).exists(_.isActive)) {
      try {
        val q = rt.get.restart()
        queries(jobId) = q
        queryToJob(q.id) = jobId
        statusOverride.remove(jobId): Unit
        log(jobId, s"job $jobId restarted")
      } catch {
        case NonFatal(err) =>
          log(jobId, s"restart failed: ${err.getMessage}")
          scheduleRestart(jobId)
      }
    }
  }

  // The ring has its own lock: the listener appends from the STREAM
  // thread during the synchronous QueryStartedEvent — while startJob
  // holds the registry monitor awaiting the start latch. Logging
  // through the registry monitor would deadlock every start.
  private val logLock = new Object

  def log(jobId: String, msg: String): Unit = logLock.synchronized {
    val ring = logRing.getOrElseUpdate(jobId, mutable.ArrayDeque.empty[String])
    ring.append(msg)
    while (ring.size > MaxLogs) { ring.removeHead(): Unit }
  }

  def getLogs(jobId: String): Seq[String] = logLock.synchronized {
    logRing.get(jobId).map(_.toSeq).getOrElse(Nil)
  }

  // ---- durable state -----------------------------------------------------
  // Mirrors every resource definition + job start spec into the
  // attached RtdbStore tree under registry/{tenant}/{kind}/{id}; the
  // constructor tail re-reads them so a registry rebuilt after a JVM
  // restart starts with every definition (jobs come back PAUSED —
  // their checkpoints and specs make `resume` continue where the old
  // process stopped).
  import org.json4s.{JValue, JNothing, JObject}
  private def rpath(kind: String, id: String) = s"registry/$tenant/$kind/$id"
  private def persist(kind: String, id: String, defn: => JValue): Unit =
    store.foreach(_.set(rpath(kind, id), defn))
  private def unpersist(kind: String, id: String): Unit =
    store.foreach(_.set(rpath(kind, id), JNothing))

  /** add → Right(id) or Left(validation errors). */
  def addFirebase(fb: FirebaseInstance): Either[Seq[String], String] = synchronized {
    val errs = Validation.validateFirebase(fb)
    if (errs.nonEmpty) Left(errs)
    else {
      firebases(fb.id) = fb
      persist("firebase", fb.id, Validation.firebaseDefinition(fb))
      Right(fb.id)
    }
  }

  def addSubscription(sub: Subscription): Either[Seq[String], String] = synchronized {
    val errs = Validation.validateSubscription(sub, allowedSyncModes)
    if (errs.nonEmpty) Left(errs)
    else {
      subscriptions(sub.id) = sub
      persist("subscription", sub.id, Validation.subscriptionDefinition(sub))
      Right(sub.id)
    }
  }

  def addJob(job: FirebaseJob): Either[Seq[String], String] = synchronized {
    val errs = Validation.validateJob(job) ++
      (if (!firebases.contains(job.firebase)) Seq(s"firebase: unknown '${job.firebase}'") else Nil) ++
      job.subscriptions.filterNot(subscriptions.contains).map(s => s"subscriptions: unknown '$s'")
    if (errs.nonEmpty) Left(errs)
    else {
      jobs(job.id) = job
      persist("job", job.id, Validation.jobDefinition(job))
      Right(job.id)
    }
  }

  // resource accessors for the REST control plane (A28)
  def getFirebase(id: String): Option[FirebaseInstance] = synchronized(firebases.get(id))
  def getSubscription(id: String): Option[Subscription] = synchronized(subscriptions.get(id))
  def getJob(id: String): Option[FirebaseJob] = jobs.get(id)
  def listFirebases(): Seq[String] = synchronized(firebases.keys.toSeq.sorted)
  def listSubscriptions(): Seq[String] = synchronized(subscriptions.keys.toSeq.sorted)
  def listJobs(): Seq[String] = jobs.keys.toSeq.sorted
  def removeFirebase(id: String): Unit = synchronized {
    firebases.remove(id): Unit
    unpersist("firebase", id)
  }
  def removeSubscription(id: String): Unit = synchronized {
    subscriptions.remove(id): Unit
    unpersist("subscription", id)
  }

  /** Topics this tenant could subscribe to: broker metadata filtered
    * to the tenant prefix, prefix stripped (list_topics,
    * artifacts.py:409-424). Broker failure → Left (the reference
    * wraps KafkaException into an HTTP 500). */
  def listTopics(): Either[String, Seq[String]] =
    try Right(graft.sources.TopicCatalog.tenantTopics(topicCatalog.allTopics(), tenant))
    catch { case NonFatal(e) => Left(s"$e @timeout: 5") }

  def listSubscribedTopics(jobId: String): Seq[String] = synchronized {
    jobs.get(jobId).toSeq.flatMap(_.subscriptions)
      .flatMap(subscriptions.get).map(s => s"$tenant.${s.topicPattern}")
  }

  /** Start a job over the given stream (test/file/kafka source built
    * by the caller); all of the job's subscriptions run in one query,
    * first glob match winning (reference consumer semantics). The
    * supervisor restarts the query from its checkpoint on failure. */
  def startJob(jobId: String, stream: DataFrame, mkSink: () => DocumentSink,
               workDir: String): Either[Seq[String], StreamingQuery] = synchronized {
    jobs.get(jobId) match {
      case None => Left(Seq(s"job: unknown '$jobId'"))
      // a second start would silently orphan the running query's handle,
      // leaving two queries contending on one checkpoint/hash-store dir
      case Some(_) if queries.get(jobId).exists(_.isActive) =>
        Left(Seq(s"job: '$jobId' already running"))
      case Some(job) =>
        val subsForJob = job.subscriptions.map(subscriptions)
        val sj = new StreamingJob(spark, subsForJob, tenant, mkSink,
          s"$workDir/hashstore-$tenant-$jobId", s"$workDir/checkpoint-$tenant-$jobId")
        val q = sj.start(stream, Some(queryNameOf(jobId)))
        queries(jobId) = q
        queryToJob(q.id) = jobId
        runtimes(jobId) = new Runtime(() => sj.start(stream, Some(queryNameOf(jobId))))
        lastStart(jobId) = (stream, mkSink, workDir)
        statusOverride.remove(jobId): Unit
        log(jobId, s"job $jobId started")
        Right(q)
    }
  }

  /** Start a job from a persistable spec: stream and sink are built
    * from config, and (when a store is attached) the spec is recorded
    * durably so `resume` still works after a JVM restart. */
  def startJob(jobId: String, spec: JobStartSpec): Either[Seq[String], StreamingQuery] =
    synchronized {
      startJob(jobId, spec.source.build(spark), () => spec.sink.build(), spec.workDir) match {
        case r @ Right(_) => persist("jobspec", jobId, spec.toJson); r
        case l => l
      }
    }

  /** Resume a paused job from its checkpoint using the in-memory
    * start arguments (the SDK's `resume` action) — or, after a JVM
    * restart, the persisted [[JobStartSpec]]. */
  def resumeJob(jobId: String): Either[Seq[String], StreamingQuery] = synchronized {
    lastStart.get(jobId) match {
      case Some((stream, mkSink, workDir)) => startJob(jobId, stream, mkSink, workDir)
      case None =>
        store.map(_.get(rpath("jobspec", jobId))).filter(_ != JNothing) match {
          case Some(specJson) => startJob(jobId, JobStartSpec.fromJson(specJson))
          case _ => Left(Seq(s"job: '$jobId' was never started"))
        }
    }
  }

  /** Status surface (get_status, artifacts.py / README.md:151-160).
    * RECONFIGURE = failed and awaiting supervised restart
    * (JobStatus.RECONFIGURE, artifacts.py:280). */
  def getStatus(jobId: String): String = synchronized {
    statusOverride.get(jobId) match {
      case Some(s) => s
      case None => queries.get(jobId) match {
        case Some(q) if q.isActive => "NORMAL"
        case Some(_) => "STOPPED"
        case None if jobs.contains(jobId) => "PAUSED"
        case None => "UNKNOWN"
      }
    }
  }

  /** pause = stop the query, keep the definition (resume restarts). */
  def pauseJob(jobId: String): Unit = synchronized {
    runtimes.remove(jobId): Unit // intentional stop: no supervised restart
    statusOverride.remove(jobId): Unit
    queries.remove(jobId).foreach { q =>
      queryToJob.remove(q.id): Unit
      q.stop()
      log(jobId, s"job $jobId paused")
    }
  }

  def removeJob(jobId: String): Unit = synchronized {
    pauseJob(jobId)
    jobs.remove(jobId): Unit
    lastStart.remove(jobId): Unit
    unpersist("job", jobId)
    unpersist("jobspec", jobId)
    log(jobId, s"job $jobId removed")
  }

  /** Detach this registry from the shared SparkSession: stop active
    * queries (checkpoints stay intact), cancel pending supervised
    * restarts, and remove the streaming listener — so a later registry
    * over the same store is the only supervisor. Definitions, the
    * durable store, and every checkpoint are untouched: this is the
    * clean half of the kill-and-rebuild path ([[resumeJob]] continues
    * from the persisted spec + checkpoint). */
  def shutdown(): Unit = synchronized {
    runtimes.clear()
    statusOverride.clear()
    queries.values.foreach(q => if (q.isActive) q.stop())
    queries.clear()
    queryToJob.clear()
    scheduler.shutdownNow(): Unit
    spark.streams.removeListener(listener)
  }

  // ---- rehydration (constructor tail: all maps above are initialized) ----
  store.foreach { st =>
    def each(kind: String)(f: JValue => Unit): Unit =
      st.get(s"registry/$tenant/$kind") match {
        case JObject(entries) => entries.foreach { case (_, defn) => f(defn) }
        case _ =>
      }
    // definitions were validated when first added; trust the mirror so
    // a schema-contract tweak can never strand persisted state
    each("firebase") { d => val fb = Validation.firebaseFromJson(d); firebases(fb.id) = fb }
    each("subscription") { d => val s = Validation.subscriptionFromJson(d); subscriptions(s.id) = s }
    each("job") { d => val j = Validation.jobFromJson(d); jobs(j.id) = j }
  }
}
