package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

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
  * lifecycle events. Tenancy: every job's topics/checkpoints are
  * prefixed with the tenant (artifacts.py:226,293-295).
  */
final class JobRegistry(spark: SparkSession, tenant: String,
    /** Sync modes accepted on addSubscription. Defaults to the modes
      * this engine implements; pass [[Validation.SchemaSyncModes]] for
      * the reference's strict schema contract (schemas.py:284). */
    allowedSyncModes: Set[String] = Validation.EngineSyncModes) {
  private val firebases = mutable.Map[String, FirebaseInstance]()
  private val subscriptions = mutable.Map[String, Subscription]()
  private val jobs = mutable.Map[String, FirebaseJob]()
  private val queries = mutable.Map[String, StreamingQuery]()
  private val logRing = mutable.Map[String, mutable.ArrayDeque[String]]()
  private val MaxLogs = 100 // callback_logger('JOB', stack, 100), artifacts.py:225

  def log(jobId: String, msg: String): Unit = synchronized {
    val ring = logRing.getOrElseUpdate(jobId, mutable.ArrayDeque.empty[String])
    ring.append(msg)
    while (ring.size > MaxLogs) { ring.removeHead(): Unit }
  }

  def getLogs(jobId: String): Seq[String] = synchronized {
    logRing.get(jobId).map(_.toSeq).getOrElse(Nil)
  }

  /** add → Right(id) or Left(validation errors). */
  def addFirebase(fb: FirebaseInstance): Either[Seq[String], String] = synchronized {
    val errs = Validation.validateFirebase(fb)
    if (errs.nonEmpty) Left(errs) else { firebases(fb.id) = fb; Right(fb.id) }
  }

  def addSubscription(sub: Subscription): Either[Seq[String], String] = synchronized {
    val errs = Validation.validateSubscription(sub, allowedSyncModes)
    if (errs.nonEmpty) Left(errs) else { subscriptions(sub.id) = sub; Right(sub.id) }
  }

  def addJob(job: FirebaseJob): Either[Seq[String], String] = synchronized {
    val errs = Validation.validateJob(job) ++
      (if (!firebases.contains(job.firebase)) Seq(s"firebase: unknown '${job.firebase}'") else Nil) ++
      job.subscriptions.filterNot(subscriptions.contains).map(s => s"subscriptions: unknown '$s'")
    if (errs.nonEmpty) Left(errs) else { jobs(job.id) = job; Right(job.id) }
  }

  def listSubscribedTopics(jobId: String): Seq[String] = synchronized {
    jobs.get(jobId).toSeq.flatMap(_.subscriptions)
      .flatMap(subscriptions.get).map(s => s"$tenant.${s.topicPattern}")
  }

  /** Start a job over the given stream (test/file/kafka source built
    * by the caller); all of the job's subscriptions run in one query,
    * first glob match winning (reference consumer semantics). */
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
        val q = sj.start(stream)
        queries(jobId) = q
        log(jobId, s"job $jobId started")
        Right(q)
    }
  }

  /** Status surface (get_status, artifacts.py / README.md:151-160). */
  def getStatus(jobId: String): String = synchronized {
    queries.get(jobId) match {
      case Some(q) if q.isActive => "NORMAL"
      case Some(_) => "STOPPED"
      case None if jobs.contains(jobId) => "PAUSED"
      case None => "UNKNOWN"
    }
  }

  /** pause = stop the query, keep the definition (resume restarts). */
  def pauseJob(jobId: String): Unit = synchronized {
    queries.remove(jobId).foreach { q => q.stop(); log(jobId, s"job $jobId paused") }
  }

  def removeJob(jobId: String): Unit = synchronized {
    pauseJob(jobId)
    jobs.remove(jobId): Unit
    log(jobId, s"job $jobId removed")
  }
}
