package graft.model

import java.util.regex.Pattern

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Minimal JSON-Schema draft-07 validator covering exactly the keyword
  * set the reference's three resource schemas use (reference:
  * firebase/app/fixtures/schemas.py:21-358): `type`, `required`,
  * `properties`, `enum`, `pattern`, `items`, `anyOf`, and
  * property-`dependencies` arrays (schemas.py:187-196). Errors are
  * returned as human-readable strings like the SDK's
  * `validate_pretty` (artifacts.py:141-157).
  *
  * Semantics follow the spec: `required`/`dependencies` test key
  * PRESENCE (an empty string satisfies them), `pattern` is an
  * unanchored regex search, `anyOf` passes iff at least one subschema
  * validates, and every keyword is ignored for values of a
  * non-matching shape except `type` itself, which reports.
  */
object JsonSchema {

  def parse(json: String): JValue = JsonMethods.parse(json)

  /** All validation errors of `definition` against `schemaJson`
    * (empty = valid). */
  def validate(schemaJson: String, definition: JValue): Seq[String] =
    validateValue(parse(schemaJson), definition, "$")

  def validateValue(schema: JValue, v: JValue, at: String): Seq[String] = {
    schema \ "type" match {
      case JString(t) if !typeMatches(t, v) =>
        // wrong shape: report once, skip the shape-specific keywords
        return Seq(s"$at: expected type $t")
      case _ =>
    }
    val errs = Seq.newBuilder[String]

    schema \ "enum" match {
      case JArray(allowed) if !allowed.contains(v) =>
        errs += s"$at: value not in enum ${JsonMethods.compact(JArray(allowed))}"
      case _ =>
    }

    (schema \ "pattern", v) match {
      case (JString(p), JString(s)) if !Pattern.compile(p).matcher(s).find() =>
        errs += s"$at: '$s' does not match pattern $p"
      case _ =>
    }

    v match {
      case JObject(fields) =>
        val keys = fields.map(_._1).toSet
        schema \ "required" match {
          case JArray(req) => req.collect {
            case JString(r) if !keys.contains(r) => errs += s"$at: '$r' is a required property"
          }
          case _ =>
        }
        schema \ "dependencies" match {
          case JObject(deps) => deps.foreach {
            case (trigger, JArray(needed)) if keys.contains(trigger) =>
              needed.collect {
                case JString(n) if !keys.contains(n) =>
                  errs += s"$at: '$n' is required when '$trigger' is present"
              }
            case _ =>
          }
          case _ =>
        }
        schema \ "properties" match {
          case JObject(props) => props.foreach { case (name, sub) =>
            fields.find(_._1 == name).foreach { case (_, fv) =>
              errs ++= validateValue(sub, fv, s"$at.$name")
            }
          }
          case _ =>
        }
      case JArray(items) =>
        schema \ "items" match {
          case JNothing =>
          case itemSchema => items.zipWithIndex.foreach { case (it, i) =>
            errs ++= validateValue(itemSchema, it, s"$at[$i]")
          }
        }
      case _ =>
    }

    schema \ "anyOf" match {
      case JArray(subs) if subs.nonEmpty =>
        val results = subs.map(s => validateValue(s, v, at))
        if (!results.exists(_.isEmpty))
          errs += s"$at: does not match any allowed variant (${results.flatten.mkString("; ")})"
      case _ =>
    }

    errs.result()
  }

  private def typeMatches(t: String, v: JValue): Boolean = (t, v) match {
    case ("object", _: JObject)   => true
    case ("array", _: JArray)     => true
    case ("string", _: JString)   => true
    case ("boolean", _: JBool)    => true
    case ("null", JNull)          => true
    case ("integer", _: JInt | _: JLong) => true
    case ("number", _: JInt | _: JLong | _: JDouble | _: JDecimal) => true
    case _ => false
  }
}
