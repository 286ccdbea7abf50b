package graft.model

/** Control-plane resources mirroring the reference's JSON-schema
  * contracts (reference: firebase/app/fixtures/schemas.py — Firebase
  * 21-126, Subscription 128-296, Job 298-358; examples
  * fixtures/examples.py:1-57). Strongly-typed here; validation errors
  * are returned as messages like the SDK's validate_pretty
  * (artifacts.py:141-157).
  */
final case class FirebaseInstance(
    id: String,
    name: String,
    url: String,
    credentialJson: String = "{}",
    rootPath: String = "/")

/** fb_options block (schemas.py:198-296). The shipped schema only
  * allows "forward" for sync_mode (schemas.py:284) while the engine
  * handles sync/forward/consume/none (helpers.py:42-46) — we keep the
  * schema strict and the engine capable, as the reference does. */
final case class FbOptions(
    syncMode: String = "forward",
    targetPath: String = "_aether/entities/{topic}",
    filterRequired: Boolean = false,
    filterFieldPath: String = "",
    filterPassValues: Seq[String] = Nil,
    maskingAnnotation: String = "aether_masking",
    maskingLevels: Seq[String] = Nil,
    maskingEmitLevel: String = "")

final case class Subscription(
    id: String,
    name: String,
    topicPattern: String,
    fbOptions: FbOptions = FbOptions())

final case class FirebaseJob(
    id: String,
    name: String,
    firebase: String,
    subscriptions: Seq[String])

object Validation {
  /** The reference's shipped JSON schema allows only "forward"
    * (schemas.py:284) even though its engine handles four modes
    * (helpers.py:42-46). [[SchemaSyncModes]] mirrors that strict
    * contract; [[EngineSyncModes]] — the default — unlocks what this
    * engine actually implements, so the flagship SYNC path is
    * reachable through the registry. */
  val SchemaSyncModes: Set[String] = Set("forward") // schemas.py:284
  val EngineSyncModes: Set[String] = Set("forward", "sync", "consume", "none")

  /** JSON-schema-equivalent checks + the secondary path rule
    * (artifacts.py:159-172): target path must have an odd number of
    * '/'-separated segments (collection-rooted CFS path) and no
    * placeholder other than {topic}. */
  def validateSubscription(sub: Subscription,
      allowedSyncModes: Set[String] = EngineSyncModes): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (sub.id.isEmpty) errs += "id: must be non-empty"
    if (sub.name.isEmpty) errs += "name: must be non-empty"
    if (sub.topicPattern.isEmpty) errs += "topic_pattern: must be non-empty"
    val o = sub.fbOptions
    if (!allowedSyncModes.contains(o.syncMode))
      errs += s"fb_options.sync_mode: '${o.syncMode}' not in ${allowedSyncModes.mkString(",")}"
    if (o.filterRequired) {
      if (o.filterFieldPath.isEmpty)
        errs += "fb_options.filter_field_path: required when filter_required"
      if (o.filterPassValues.isEmpty)
        errs += "fb_options.filter_pass_values: required when filter_required"
    }
    if (o.maskingEmitLevel.nonEmpty && o.maskingLevels.nonEmpty &&
        !o.maskingLevels.contains(o.maskingEmitLevel))
      errs += "fb_options.masking_emit_level: must be one of masking_levels"
    // secondary validation (artifacts.py:159-172)
    val placeholders = "\\{([^}]*)\\}".r.findAllMatchIn(o.targetPath).map(_.group(1)).toSeq
    placeholders.filterNot(_ == "topic").foreach { p =>
      errs += s"fb_options.target_path: illegal placeholder {$p}"
    }
    val segments = o.targetPath.stripPrefix("/").stripSuffix("/").split("/")
    if (segments.length % 2 == 0)
      errs += s"fb_options.target_path: must have an odd number of segments, got ${segments.length}"
    errs.result()
  }

  def validateFirebase(fb: FirebaseInstance): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (fb.id.isEmpty) errs += "id: must be non-empty"
    if (fb.url.isEmpty) errs += "url: must be non-empty"
    errs.result()
  }

  def validateJob(job: FirebaseJob): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (job.id.isEmpty) errs += "id: must be non-empty"
    if (job.firebase.isEmpty) errs += "firebase: must reference a firebase resource"
    if (job.subscriptions.isEmpty) errs += "subscriptions: must be non-empty"
    errs.result()
  }
}
