package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Control-plane validation against the verbatim-ported draft-07
  * schemas (reference: firebase/app/fixtures/schemas.py:21-358).
  * Accept/reject cases mirror firebase/tests/test_unit.py:37-50 and
  * the fixtures/examples.py:22-56 documents; dependencies-block cases
  * exercise schemas.py:187-196. */
class ValidationSpec extends AnyFunSuite {

  private val goodSub = Subscription("sub-test", "Test Subscription", "*",
    FbOptions(
      syncMode = "forward",
      targetPath = "_aether/entities/{topic}",
      filterRequired = false,
      filterFieldPath = "operational_status",
      filterPassValues = Seq("operational"),
      maskingAnnotation = "@aether_masking",
      maskingLevels = Seq("public", "private"),
      maskingEmitLevel = "public"))

  test("the reference example subscription validates (test_unit.py:38-40)") {
    assert(Validation.validateSubscription(goodSub).isEmpty)
  }

  test("bad target paths rejected (test_unit.py:41-50)") {
    val badPaths = Seq("{illegal}/sub/stitution", "too/short")
    badPaths.foreach { p =>
      val sub = goodSub.copy(fbOptions = goodSub.fbOptions.copy(targetPath = p))
      assert(Validation.validateSubscription(sub).nonEmpty, p)
    }
  }

  test("dependencies: filter_required present requires path and pass values (schemas.py:187-190)") {
    // presence-based: filter_required=false with no path/values still
    // violates the dependencies block once the key is emitted
    val sub = goodSub.copy(fbOptions = FbOptions(
      filterRequired = true, filterFieldPath = "", filterPassValues = Nil))
    val errs = Validation.validateSubscription(sub)
    assert(errs.exists(_.contains("filter_field_path")))
    assert(errs.exists(_.contains("filter_pass_values")))
    // configured properly: no errors
    val ok = goodSub.copy(fbOptions = FbOptions(
      filterRequired = true, filterFieldPath = "a.b", filterPassValues = Seq("x")))
    assert(Validation.validateSubscription(ok).isEmpty)
  }

  test("dependencies: masking_annotation present requires levels and emit level (schemas.py:191-196)") {
    val sub = goodSub.copy(fbOptions = FbOptions(maskingEmitLevel = "public"))
    val errs = Validation.validateSubscription(sub)
    assert(errs.exists(_.contains("masking_levels")))
  }

  test("sync_mode enum: shipped schema allows only forward; engine modes widen it") {
    val sub = goodSub.copy(fbOptions = goodSub.fbOptions.copy(syncMode = "sync"))
    // strict schema contract (schemas.py:284)
    assert(Validation.validateSubscription(sub, Validation.SchemaSyncModes).nonEmpty)
    // engine default unlocks the implemented modes
    assert(Validation.validateSubscription(sub).isEmpty)
    // garbage mode rejected by both
    val bad = goodSub.copy(fbOptions = goodSub.fbOptions.copy(syncMode = "sideways"))
    assert(Validation.validateSubscription(bad).nonEmpty)
  }

  test("firebase instance: example accepted; credential must be an object (schemas.py:106-111)") {
    val fb = FirebaseInstance("default", "the default instance", "local-test",
      credentialJson = """{"json": "doc"}""")
    assert(Validation.validateFirebase(fb).isEmpty)
    val noCred = fb.copy(credentialJson = "")
    assert(Validation.validateFirebase(noCred).exists(_.contains("credential")))
  }

  test("job: example accepted; firebase key required (schemas.py:305-309)") {
    assert(Validation.validateJob(
      FirebaseJob("default", "Default Firebase Consumer Job", "default", Seq("sub-test"))).isEmpty)
    assert(Validation.validateJob(FirebaseJob("j", "j", "", Nil)).nonEmpty)
  }

  test("draft-07 validator semantics: type, enum, anyOf, items") {
    import org.json4s._
    val schema = """{"type":"object","required":["a"],"properties":{
      "a":{"type":"string","enum":["x","y"]},
      "b":{"type":"array","items":{"type":"integer"}},
      "c":{"anyOf":[{"type":"string"},{"type":"boolean"}]}}}"""
    def v(json: String): Seq[String] = JsonSchema.validate(schema, JsonSchema.parse(json))
    assert(v("""{"a":"x","b":[1,2],"c":true}""").isEmpty)
    assert(v("""{"b":[]}""").exists(_.contains("required")))
    assert(v("""{"a":"z"}""").exists(_.contains("enum")))
    assert(v("""{"a":"x","b":[1,"no"]}""").exists(_.contains("b[1]")))
    assert(v("""{"a":"x","c":3}""").exists(_.contains("variant")))
    assert(v("""[1]""").exists(_.contains("expected type object")))
  }
}
