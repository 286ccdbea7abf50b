package graft.streaming

import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model._

/** REST control plane (reference A28: the aet.consumer SDK's API
  * server the consumer boots through FirebaseConsumer,
  * firebase/app/consumer.py:9-18; endpoint surface documented in
  * README.md:138-189 — per-resource add/get/list/delete/
  * validate_pretty/get_schema, plus job pause/resume/get_status/
  * get_logs/list_topics/list_subscribed_topics).
  *
  * Built on the JDK's HttpServer — driver-side control traffic only
  * (a few requests/sec), never on the data path, so no framework
  * dependency is warranted. Definitions are the reference's JSON
  * shapes (fixtures/examples.py:22-56); `add` validates the RAW body
  * against the verbatim-ported draft-07 schemas so presence-based
  * `dependencies` blocks behave exactly as in the SDK.
  *
  * `resume` rebuilds the query from the registry's stored start
  * arguments (checkpoint-recovered); inject `resumeJob` to override
  * how a job's stream is rebuilt.
  *
  * Tenancy: every request is dispatched by its `x-oauth-realm` header
  * to that tenant's registry (the reference fronts the SDK server
  * with a realm-dispatching gateway — docker-compose.yml:13, test
  * clients always send the header, tests/__init__.py:131-134). A
  * request without the header lands on the default registry; an
  * unknown realm is a 404, so tenants cannot see — or guess at —
  * each other's resources.
  */
final class ControlPlane(reg: JobRegistry,
    allowedSyncModes: Set[String] = Validation.EngineSyncModes,
    resumeJob: Option[String => Either[Seq[String], Unit]] = None,
    /** Builds the sink a Firebase instance's `test_connection` pings
      * (reference: lazily builds the app + RTDB/CFS clients and maps
      * failure to HTTP 500, artifacts.py:112-124). */
    sinkFor: FirebaseInstance => graft.sources.DocumentSink =
      fb => new graft.sources.JsonFileSink(fb.rootPath),
    port: Int = 0,
    /** realm → tenant registry. The default `reg` serves requests
      * without a realm header (and may also be listed here under its
      * own realm name). */
    realms: Map[String, JobRegistry] = Map.empty) {

  private def doResume(r: JobRegistry, id: String): Either[Seq[String], Unit] =
    resumeJob.map(f => f(id)).getOrElse(r.resumeJob(id).map(_ => ()))

  private val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)

  def address: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  private def respond(ex: HttpExchange, code: Int, body: JValue): Unit = {
    val bytes = JsonMethods.compact(JsonMethods.render(body)).getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def param(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&").toSeq)
      .map(_.split("=", 2))
      .collectFirst { case Array(k, v) if k == name =>
        java.net.URLDecoder.decode(v, "UTF-8") }

  private def body(ex: HttpExchange): JValue =
    JsonMethods.parse(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))

  private def errs(messages: Seq[String]): JValue =
    JObject("valid" -> JBool(false),
      "validation_errors" -> JArray(messages.map(JString(_)).toList))

  /** Raw-body schema validation + engine secondary checks — the
    * validate_pretty contract (artifacts.py:141-157). */
  private def validate(kind: String, definition: JValue): Seq[String] = kind match {
    case "subscription" =>
      val sub = Validation.subscriptionFromJson(definition)
      val schemaErrs = JsonSchema.validate(ResourceSchemas.Subscription, definition)
        .filterNot(e => e.startsWith("$.fb_options.sync_mode") && e.contains("enum") &&
          allowedSyncModes.contains(sub.fbOptions.syncMode))
      (schemaErrs ++ Validation.validateSubscription(sub, allowedSyncModes)).distinct
    case "firebase" =>
      (JsonSchema.validate(ResourceSchemas.FbInstance, definition) ++
        Validation.validateFirebase(Validation.firebaseFromJson(definition))).distinct
    case "job" =>
      (JsonSchema.validate(ResourceSchemas.FbJob, definition) ++
        Validation.validateJob(Validation.jobFromJson(definition))).distinct
  }

  private def schemaOf(kind: String): String = kind match {
    case "subscription" => ResourceSchemas.Subscription
    case "firebase" => ResourceSchemas.FbInstance
    case "job" => ResourceSchemas.FbJob
  }

  private def getDefinition(reg: JobRegistry, kind: String, id: String): Option[JValue] =
    kind match {
      case "subscription" => reg.getSubscription(id).map(Validation.subscriptionDefinition)
      case "firebase" => reg.getFirebase(id).map(Validation.firebaseDefinition)
      case "job" => reg.getJob(id).map(Validation.jobDefinition)
    }

  /** Tenant dispatch (docker-compose.yml:13): realm header → that
    * tenant's registry; no header → the default; unknown → None. */
  private def registryFor(ex: HttpExchange): Option[JobRegistry] =
    Option(ex.getRequestHeaders.getFirst("x-oauth-realm")) match {
      case None => Some(reg)
      case Some(realm) => realms.get(realm)
    }

  private def handle(reg: JobRegistry, kind: String, action: String,
      ex: HttpExchange): Unit = action match {
    case "add" =>
      val defn = body(ex)
      val schemaErrs = validate(kind, defn)
      if (schemaErrs.nonEmpty) respond(ex, 400, errs(schemaErrs))
      else {
        val result = kind match {
          case "subscription" => reg.addSubscription(Validation.subscriptionFromJson(defn))
          case "firebase" => reg.addFirebase(Validation.firebaseFromJson(defn))
          case "job" => reg.addJob(Validation.jobFromJson(defn))
        }
        result match {
          case Right(id) => respond(ex, 200, JObject("id" -> JString(id)))
          case Left(es) => respond(ex, 400, errs(es))
        }
      }
    case "validate_pretty" =>
      validate(kind, body(ex)) match {
        case Nil => respond(ex, 200, JObject("valid" -> JBool(true)))
        case es => respond(ex, 200, errs(es))
      }
    case "get_schema" => respond(ex, 200, JsonMethods.parse(schemaOf(kind)))
    case "get" =>
      param(ex, "id").flatMap(getDefinition(reg, kind, _)) match {
        case Some(d) => respond(ex, 200, d)
        case None => respond(ex, 404, JObject("error" -> JString("not found")))
      }
    case "list" =>
      val ids = kind match {
        case "subscription" => reg.listSubscriptions()
        case "firebase" => reg.listFirebases()
        case "job" => reg.listJobs()
      }
      respond(ex, 200, JArray(ids.map(JString(_)).toList))
    case "delete" =>
      param(ex, "id") match {
        case None => respond(ex, 400, JObject("error" -> JString("id required")))
        case Some(id) =>
          kind match {
            case "subscription" => reg.removeSubscription(id)
            case "firebase" => reg.removeFirebase(id)
            case "job" => reg.removeJob(id)
          }
          respond(ex, 200, JBool(true))
      }
    // job-only actions (README.md:151-189)
    case "get_status" if kind == "job" =>
      respond(ex, 200, JString(param(ex, "id").map(reg.getStatus).getOrElse("UNKNOWN")))
    case "get_logs" if kind == "job" =>
      respond(ex, 200,
        JArray(param(ex, "id").toSeq.flatMap(reg.getLogs).map(JString(_)).toList))
    case "pause" if kind == "job" =>
      param(ex, "id").foreach(reg.pauseJob); respond(ex, 200, JBool(true))
    case "resume" if kind == "job" =>
      param(ex, "id") match {
        case Some(id) => doResume(reg, id) match {
          case Right(_) => respond(ex, 200, JBool(true))
          case Left(es) => respond(ex, 400, errs(es))
        }
        case None => respond(ex, 400, JObject("error" -> JString("id required")))
      }
    case "test_connection" if kind == "firebase" =>
      param(ex, "id").flatMap(reg.getFirebase) match {
        case None => respond(ex, 404, JObject("error" -> JString("not found")))
        case Some(fb) =>
          (try sinkFor(fb).testConnection()
          catch { case scala.util.control.NonFatal(e) => Left(String.valueOf(e.getMessage)) }) match {
            case Right(_) => respond(ex, 200, JBool(true))
            case Left(msg) => respond(ex, 500, JObject("error" -> JString(msg)))
          }
      }
    case "describe" =>
      // self-documenting action list (README.md:36-59)
      val common = Seq("describe", "get_schema", "validate_pretty",
        "add", "get", "list", "delete")
      val extra = kind match {
        case "job" => Seq("pause", "resume", "get_status", "get_logs",
          "list_topics", "list_subscribed_topics")
        case "firebase" => Seq("test_connection")
        case _ => Nil
      }
      respond(ex, 200, JArray((common ++ extra).map(m =>
        JObject("method" -> JString(m))).toList))
    case "list_topics" if kind == "job" =>
      reg.listTopics() match {
        case Right(ts) => respond(ex, 200, JArray(ts.map(JString(_)).toList))
        case Left(e) => respond(ex, 500, JObject("error" -> JString(e)))
      }
    case "list_subscribed_topics" if kind == "job" =>
      respond(ex, 200, JArray(param(ex, "id").toSeq
        .flatMap(reg.listSubscribedTopics).map(JString(_)).toList))
    case other =>
      respond(ex, 404, JObject("error" -> JString(s"unknown action $other")))
  }

  Seq("firebase", "subscription", "job").foreach { kind =>
    server.createContext(s"/$kind", (ex: HttpExchange) => {
      try {
        val action = ex.getRequestURI.getPath.stripPrefix(s"/$kind").stripPrefix("/")
        registryFor(ex) match {
          case Some(tenantReg) => handle(tenantReg, kind, action, ex)
          case None => respond(ex, 404, JObject("error" -> JString(
            s"unknown realm '${ex.getRequestHeaders.getFirst("x-oauth-realm")}'")))
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          respond(ex, 500, JObject("error" -> JString(String.valueOf(e.getMessage))))
      } finally ex.close()
    })
  }
  server.createContext("/health", (ex: HttpExchange) => {
    try respond(ex, 200, JObject("healthy" -> JBool(true))) finally ex.close()
  })

  def start(): ControlPlane = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
