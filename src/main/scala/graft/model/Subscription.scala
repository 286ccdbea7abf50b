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
    rootPath: String = "/",
    // remaining FB_INSTANCE contract keys (schemas.py:29-37; example
    // values fixtures/examples.py:22-32)
    aetherServerAlias: String = "aether",
    firebaseConfigPath: String = "_aether/rules",
    hashPath: String = "_aether/hashes")

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

  import org.json4s._

  /** The reference-shaped JSON definition of a Subscription (the dict
    * examples.py:35-51 validates): empty optional settings are absent
    * keys, so the ported schema's presence-based `dependencies`
    * blocks fire exactly as they do in the SDK. `topic_options` is
    * emitted only when a filter or mask is configured (an empty
    * topic_options object violates its anyOf, as in the reference). */
  def subscriptionDefinition(sub: Subscription): JValue = {
    val o = sub.fbOptions
    val filterConfigured =
      o.filterRequired || o.filterFieldPath.nonEmpty || o.filterPassValues.nonEmpty
    val maskConfigured = o.maskingLevels.nonEmpty || o.maskingEmitLevel.nonEmpty
    val topicOpts: List[(String, JValue)] =
      (if (maskConfigured)
        List("masking_annotation" -> JString(o.maskingAnnotation): (String, JValue)) ++
          (if (o.maskingLevels.nonEmpty)
            List("masking_levels" -> JArray(o.maskingLevels.map(JString(_)).toList): (String, JValue))
          else Nil) ++
          (if (o.maskingEmitLevel.nonEmpty)
            List("masking_emit_level" -> JString(o.maskingEmitLevel): (String, JValue))
          else Nil)
      else Nil) ++
      (if (filterConfigured)
        List("filter_required" -> JBool(o.filterRequired): (String, JValue)) ++
          (if (o.filterFieldPath.nonEmpty)
            List("filter_field_path" -> JString(o.filterFieldPath): (String, JValue))
          else Nil) ++
          (if (o.filterPassValues.nonEmpty)
            List("filter_pass_values" -> JArray(o.filterPassValues.map(JString(_)).toList): (String, JValue))
          else Nil)
      else Nil)
    JObject(List[(String, JValue)](
      "id" -> JString(sub.id),
      "name" -> JString(sub.name),
      "topic_pattern" -> JString(sub.topicPattern)) ++
      (if (topicOpts.nonEmpty) List("topic_options" -> JObject(topicOpts): (String, JValue)) else Nil) ++
      List("fb_options" -> JObject(List(
        "sync_mode" -> JString(o.syncMode),
        "target_path" -> JString(o.targetPath))): (String, JValue)))
  }

  def firebaseDefinition(fb: FirebaseInstance): JValue = JObject(List[(String, JValue)](
    "id" -> JString(fb.id),
    "name" -> JString(fb.name),
    "url" -> JString(fb.url),
    "credential" -> JsonSchema.parse(if (fb.credentialJson.trim.nonEmpty) fb.credentialJson else "null"),
    "aether_server_alias" -> JString(fb.aetherServerAlias),
    "firebase_config_path" -> JString(fb.firebaseConfigPath),
    "hash_path" -> JString(fb.hashPath)))

  def jobDefinition(job: FirebaseJob): JValue = JObject(List[(String, JValue)](
    "id" -> JString(job.id),
    "name" -> JString(job.name),
    "firebase" -> JString(job.firebase),
    "subscription" -> JArray(job.subscriptions.map(JString(_)).toList)))

  // ---- reference-shaped definition JSON → case classes (the REST
  // add/validate bodies, examples.py:22-56). Lenient: absent keys take
  // the case-class defaults; schema validation decides acceptance.
  private def str(j: JValue, key: String, dflt: String = ""): String =
    j \ key match { case JString(s) => s; case _ => dflt }
  private def strs(j: JValue, key: String): Seq[String] =
    j \ key match { case JArray(xs) => xs.collect { case JString(s) => s }; case _ => Nil }

  def subscriptionFromJson(j: JValue): Subscription = {
    val to = j \ "topic_options"
    val fo = j \ "fb_options"
    Subscription(
      id = str(j, "id"),
      name = str(j, "name"),
      topicPattern = str(j, "topic_pattern"),
      fbOptions = FbOptions(
        syncMode = str(fo, "sync_mode", "forward"),
        targetPath = str(fo, "target_path", "_aether/entities/{topic}"),
        filterRequired = (to \ "filter_required") match {
          case JBool(b) => b; case _ => false
        },
        filterFieldPath = str(to, "filter_field_path"),
        filterPassValues = strs(to, "filter_pass_values"),
        maskingAnnotation = str(to, "masking_annotation", "aether_masking").stripPrefix("@"),
        maskingLevels = strs(to, "masking_levels"),
        maskingEmitLevel = str(to, "masking_emit_level")))
  }

  def firebaseFromJson(j: JValue): FirebaseInstance = FirebaseInstance(
    id = str(j, "id"),
    name = str(j, "name"),
    url = str(j, "url"),
    credentialJson = (j \ "credential") match {
      case JNothing => ""
      case c => org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(c))
    },
    aetherServerAlias = str(j, "aether_server_alias", "aether"),
    firebaseConfigPath = str(j, "firebase_config_path", "_aether/rules"),
    hashPath = str(j, "hash_path", "_aether/hashes"))

  def jobFromJson(j: JValue): FirebaseJob = FirebaseJob(
    id = str(j, "id"),
    name = str(j, "name"),
    firebase = str(j, "firebase"),
    subscriptions = strs(j, "subscription"))

  /** Full ported-schema validation (schemas.py:128-296) + the
    * secondary path rule (artifacts.py:159-172): target path must
    * have an odd number of '/'-separated segments (collection-rooted
    * CFS path) and no placeholder other than {topic}. The shipped
    * schema's sync_mode enum (["forward"]) is widened to
    * `allowedSyncModes` — the engine-capability deviation documented
    * on [[EngineSyncModes]]. */
  def validateSubscription(sub: Subscription,
      allowedSyncModes: Set[String] = EngineSyncModes): Seq[String] = {
    val o = sub.fbOptions
    val schemaErrs = JsonSchema.validate(ResourceSchemas.Subscription,
        subscriptionDefinition(sub))
      .filterNot(e => e.startsWith("$.fb_options.sync_mode") && e.contains("enum") &&
        allowedSyncModes.contains(o.syncMode))
    val errs = Seq.newBuilder[String]
    errs ++= schemaErrs
    if (sub.id.isEmpty) errs += "id: must be non-empty"
    if (sub.name.isEmpty) errs += "name: must be non-empty"
    if (sub.topicPattern.isEmpty) errs += "topic_pattern: must be non-empty"
    if (!allowedSyncModes.contains(o.syncMode))
      errs += s"fb_options.sync_mode: '${o.syncMode}' not in ${allowedSyncModes.mkString(",")}"
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

  /** Ported-schema validation (schemas.py:21-126): requires the
    * credential object and the server-alias/config/hash paths, as the
    * SDK does. */
  def validateFirebase(fb: FirebaseInstance): Seq[String] = {
    val errs = Seq.newBuilder[String]
    errs ++= JsonSchema.validate(ResourceSchemas.FbInstance, firebaseDefinition(fb))
    if (fb.id.isEmpty) errs += "id: must be non-empty"
    if (fb.url.isEmpty) errs += "url: must be non-empty"
    errs.result()
  }

  /** Ported-schema validation (schemas.py:298-358) + referential
    * emptiness checks. */
  def validateJob(job: FirebaseJob): Seq[String] = {
    val errs = Seq.newBuilder[String]
    errs ++= JsonSchema.validate(ResourceSchemas.FbJob, jobDefinition(job))
    if (job.id.isEmpty) errs += "id: must be non-empty"
    if (job.firebase.isEmpty) errs += "firebase: must reference a firebase resource"
    if (job.subscriptions.isEmpty) errs += "subscriptions: must be non-empty"
    errs.result()
  }
}
